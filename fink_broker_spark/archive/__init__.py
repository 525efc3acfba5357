from fink_broker_spark.archive.index_tables import build_index_table
from fink_broker_spark.archive.statistics import nightly_statistics

__all__ = ["build_index_table", "nightly_statistics"]
