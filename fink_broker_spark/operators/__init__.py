from fink_broker_spark.operators.relational import (
    broadcast_equi_join,
    dedup_exact,
    last_per_key,
    top_k,
    top_k_per_group,
)
from fink_broker_spark.operators.salting import salt_expr, salted_row_key
from fink_broker_spark.operators.arrays import concat_col, explode_history

__all__ = [
    "broadcast_equi_join",
    "concat_col",
    "dedup_exact",
    "explode_history",
    "last_per_key",
    "salt_expr",
    "salted_row_key",
    "top_k",
    "top_k_per_group",
]
