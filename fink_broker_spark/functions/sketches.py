"""Cardinality sketches: HyperLogLog reports and mergeable partials.

At 100 TB, exact ``countDistinct`` is a full shuffle of the distinct
keys; nightly cardinality reporting (the reference's statistics job
counts distinct objects per night, ``bin/ztf/archive_statistics.py``)
wants the sketch path instead: fixed-size HLL partials aggregated
map-side, merged associatively across partitions, nights, or tables.
Spark 4 ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — everything here is JVM
aggregate expressions; no UDF, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_report(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 14,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group distinct-count three ways: exact (the shuffle-heavy
    baseline), ``approx_count_distinct`` (HLL++, scalar), and a
    DataSketches HLL estimate (mergeable). Exact is kept so callers can
    audit sketch error at test scale and drop it in production.

    The exact count runs as its own two-level aggregate and joins back
    on the (tiny) group key: mixing ``countDistinct`` with the sketch
    aggregates in one ``agg`` makes Catalyst plan an Expand (every
    input row replicated per distinct-aggregate), tripling the scan's
    row volume for no benefit."""
    sketches = df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(key_col, F.lit(lgk))
        ).alias("hll_estimate"),
    )
    exact = (
        df.select(*group_cols, key_col)
        # countDistinct semantics: NULL keys are not a distinct value
        # (the sketch aggregates skip them too)
        .where(F.col(key_col).isNotNull())
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    # left join from the sketch side: a group whose keys are ALL NULL has
    # no exact row (NULLs filtered above) but must still be reported, with
    # exact = 0 — an inner join would silently drop the whole group.
    return (
        sketches.join(exact, on=list(group_cols), how="left")
        .select(
            *group_cols,
            F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
            "approx",
            "hll_estimate",
        )
    )


def hll_partials(
    df: DataFrame, group_cols: list[str], key_col: str, lgk: int = 14
) -> DataFrame:
    """Mergeable per-group sketch column — the materialized partial you
    persist per night/partition and union later (sketch size is fixed
    by ``lgk``, independent of cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("hll_sketch")
    )


def hll_merged_estimate(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge sketch partials (optionally re-grouped coarser) into
    estimates — associative, so nights merge into months without
    touching raw data."""
    grouped = (
        partials.groupBy(*group_cols) if group_cols else partials.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("estimate")
    )
