"""Nightly statistics: one-row-per-night multi-aggregate summary.

Re-expresses ``bin/ztf/archive_statistics.py:93-141`` / ``bin/rubin/
archive_statistics.py:69-111``. The reference issues one Spark action per
counter (`.count()` per filter, `.distinct().count()` per column) — a
full scan each. Here all counters are conditional aggregates in a single
``agg``: ONE scan, one reduce, however many counters (at 100 TB the
difference is the job)."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nightly_statistics(
    df: DataFrame,
    filtered_counts: Mapping[str, Column] | None = None,
    distinct_counts: Sequence[str] = (),
    sums: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Single-pass statistics row.

    - ``filtered_counts``: name → boolean Column (``count_if``)
    - ``distinct_counts``: exact distincts per listed column
    - ``sums``: name → numeric Column
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_total")]
    for name, cond in (filtered_counts or {}).items():
        aggs.append(F.count_if(cond).alias(name))
    for col in distinct_counts:
        aggs.append(F.countDistinct(col).alias(f"n_distinct_{col}"))
    for name, col in (sums or {}).items():
        aggs.append(F.sum(col).alias(name))
    return df.agg(*aggs)
