from fink_broker_spark.functions.vector import cosine_expr, dot_expr, norm2_expr
from fink_broker_spark.functions.text import (
    fingerprint_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_hits_expr,
    token_count_expr,
    tokens_expr,
)

__all__ = [
    "cosine_expr",
    "dot_expr",
    "fingerprint_expr",
    "norm2_expr",
    "punct_ratio_expr",
    "quality_score_expr",
    "stopword_hits_expr",
    "token_count_expr",
    "tokens_expr",
]
