"""Nightly statistics: one-row-per-night multi-aggregate summary.

Re-expresses ``bin/ztf/archive_statistics.py:93-141`` / ``bin/rubin/
archive_statistics.py:69-111``. The reference issues one Spark action per
counter (`.count()` per filter, `.distinct().count()` per column) — a
full scan each. Here all counters are conditional aggregates in a single
``agg``: ONE scan, one reduce, however many counters (at 100 TB the
difference is the job)."""

from __future__ import annotations

import logging

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


#: above this Catalyst size estimate the exact percentile is unsafe:
#: with a low-cardinality group key every value funnels into a handful
#: of unbounded aggregation buffers (the 100 TB scale-killer shape)
EXACT_PERCENTILE_MAX_BYTES = 1 << 30


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (optimizer statistics — a
    driver-side metadata lookup, never a scan; at 100 TB this is the
    only affordable gate). Reliable for a plain scan+filter input like
    the percentile source (footer totals × selectivity); do NOT gate
    aggregated/joined relations on it (see ``ext/graph.py``)."""
    from fink_broker_spark.plans.partitioning import plan_size_bytes

    try:
        return plan_size_bytes(df)
    except Exception:
        return -1


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    specs: Mapping[str, tuple[str, float]],
    mode: str = "auto",
    exact_max_bytes: int = EXACT_PERCENTILE_MAX_BYTES,
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped percentiles with a size-gated exact/approx swap.

    ``specs``: out_name → (value_col, fraction). ``mode``:

    - ``"exact"`` — Spark's ``percentile`` (interpolated, matches
      DuckDB ``quantile_cont`` bit-for-bit). Per-group state is ALL
      values: only sane when the input is small.
    - ``"approx"`` — ``percentile_approx`` (Greenwald–Khanna, bounded
      ~``accuracy`` samples per group state, mergeable map-side): the
      100 TB path. Error ≤ 1/accuracy rank fraction.
    - ``"auto"`` — exact below ``exact_max_bytes`` of Catalyst-estimated
      input, approx above. Unknown stats (-1) fall back to approx —
      at scale, unknown means "assume big".

    An ``auto`` resolution is LOGGED (INFO): near the gate, a drifting
    Catalyst estimate would otherwise silently flip an
    oracle-hash-checked query from exact ``percentile`` to
    ``percentile_approx``, which no longer matches DuckDB
    ``quantile_cont``. Oracle-checked callers at a pinned scale should
    pass ``mode="exact"`` explicitly; ``auto`` is for production jobs
    where the flip is the intended protection.
    """
    if mode == "auto":
        size = _plan_size_bytes(df)
        mode = "exact" if 0 <= size <= exact_max_bytes else "approx"
        logging.getLogger(__name__).info(
            "grouped_percentiles auto-resolved to %r "
            "(estimate=%d bytes, gate=%d)",
            mode, size, exact_max_bytes,
        )
    # the value column is pinned to DOUBLE before the percentile: on a
    # physically DECIMAL-typed lake (the decimalprice driftlab layout)
    # Spark's `percentile` interpolates in double while DuckDB's
    # `quantile_cont` interpolates IN DECIMAL and rounds the midpoint
    # to the column scale — a value split, not just a type split.  The
    # decimal→double conversion itself is correctly rounded on both
    # engines; oracles mirror the cast.
    if mode == "exact":
        aggs = [
            F.expr(f"percentile(CAST({col} AS DOUBLE), {frac!r})").alias(
                name
            )
            for name, (col, frac) in specs.items()
        ]
    elif mode == "approx":
        aggs = [
            F.expr(
                f"percentile_approx(CAST({col} AS DOUBLE),"
                f" {frac!r}, {accuracy})"
            ).cast("double").alias(name)
            for name, (col, frac) in specs.items()
        ]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.groupBy(*group_cols).agg(*aggs)
