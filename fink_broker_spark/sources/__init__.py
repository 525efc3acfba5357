from fink_broker_spark.sources.parquet import (
    file_stream,
    load_table,
    scan_parquet,
    wait_for_path,
)

__all__ = ["file_stream", "load_table", "scan_parquet", "wait_for_path"]
