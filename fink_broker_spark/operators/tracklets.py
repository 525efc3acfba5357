"""Grouped-map clustering: per-group imperative analysis in pandas.

Re-expresses the reference's tracklet identification
(``fink_broker/ztf/tracklet_identification.py:123-334``): alerts are
grouped by exposure time (``groupBy("jd")``), each group clustered in
NumPy (great-circle geometry + line fitting), and a tracklet id assigned
per cluster — the canonical ``applyInPandas`` shape (SURVEY.md §2.6
"grouped-map aggregation").

The clustering here is a deterministic 1-D single-linkage (sorted gap
split): domain-neutral, same operator skeleton. The astronomy-specific
polyfit logic would drop into ``_cluster_block`` unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _cluster_block(
    pdf: pd.DataFrame, value_col: str, gap: float, min_size: int, key_fmt: str
) -> pd.DataFrame:
    """Sort by value; split where consecutive gap > ``gap``; keep clusters
    with ≥ ``min_size`` members; label ``key_fmt.format(group, idx)``
    (mirrors the reference's ``TRCK_<jd>_<idx>`` ids,
    ``tracklet_identification.py:300-320``)."""
    pdf = pdf.sort_values(value_col, kind="mergesort").reset_index(drop=True)
    vals = pdf[value_col].to_numpy()
    labels = np.full(len(pdf), "", dtype=object)
    if len(vals):
        # fully vectorized: cluster id = running count of over-gap breaks;
        # sizes via bincount; surviving clusters renumbered densely
        cluster_of = np.concatenate(
            ([0], np.cumsum(np.diff(vals) > gap))
        ).astype(np.int64)
        sizes = np.bincount(cluster_of)
        kept = np.flatnonzero(sizes >= min_size)
        group_key = str(pdf["__group"].iloc[0])
        names = np.full(len(sizes), "", dtype=object)
        names[kept] = [
            key_fmt.format(group_key, i) for i in range(len(kept))
        ]
        labels = names[cluster_of]
    pdf = pdf.assign(cluster_id=labels)
    return pdf.drop(columns="__group")


def grouped_clusters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    gap: float,
    min_size: int = 2,
    key_fmt: str = "TRCK_{}_{:02d}",
) -> DataFrame:
    """``groupBy(group_col).applyInPandas`` clustering.

    Output = input columns + ``cluster_id`` (empty string = unclustered).
    One shuffle on the group key; each group is processed in a single
    Arrow batch, so groups must fit in worker memory — the reference has
    the same constraint (one exposure's alerts per group).
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    staged = df.withColumn("__group", F.col(group_col))
    schema = StructType(
        [f for f in staged.schema.fields if f.name != "__group"]
        + [StructField("cluster_id", StringType(), True)]
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _cluster_block(pdf, value_col, gap, min_size, key_fmt)

    return staged.groupBy("__group").applyInPandas(apply_fn, schema)
