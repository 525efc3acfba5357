from fink_broker_spark.core.session import configure_session, get_session
from fink_broker_spark.core.time import (
    jd_expr,
    jd_to_mjd,
    mjd_expr,
    nanos_to_timestamp,
    night_partition_cols,
    timestamp_to_jd,
)

__all__ = [
    "configure_session",
    "get_session",
    "jd_expr",
    "jd_to_mjd",
    "mjd_expr",
    "nanos_to_timestamp",
    "night_partition_cols",
    "timestamp_to_jd",
]
