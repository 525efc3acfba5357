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


# --------------------------------------------------------------------------
# Count-min sketch (deterministic, ANSI-expressible)
# --------------------------------------------------------------------------
#
# HLL answers "how many distinct"; the count-min sketch answers "how often
# does THIS key occur" in fixed memory — the heavy-hitters / frequent-items
# primitive a corpus pipeline uses to spot dominating URLs, boilerplate
# fingerprints, or hot users without shuffling every distinct key.  The
# sketch here is a (depth × width) counter grid held as ROWS
# ``(r, pos, counter)``: building it is one group-aggregate (map-side
# partials combine, shuffle volume ≤ depth·width rows per partition —
# constant, not ∝ keys), merging two sketches is union + sum (associative,
# so nightly sketches roll up to monthly ones), and estimation is a
# broadcast join of the probe keys against depth·width rows.
#
# The row hashes are Knuth multiplicative mixes on a bounded residue of
# the key — NOT xxhash/murmur — precisely so the construction is plain
# 64-bit-safe integer arithmetic any ANSI engine reproduces bit-for-bit:
# the DuckDB oracle builds the *same* sketch and the estimates compare
# exactly.  (residue < 1e6+3 and primes < 2^31 keep every product below
# 2^62: no overflow under Spark's ANSI mode.)

_CMS_MOD = 1_000_003
_CMS_PRIMES = (2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263)
_CMS_SEEDS = (0, 40_503, 88_057, 126_611)


def cms_position(key, row: int, width: int):
    """Column: the row-``row`` counter index for an integral key."""
    k = (F.col(key) if isinstance(key, str) else key).cast("bigint")
    residue = F.pmod(k, F.lit(_CMS_MOD))
    mixed = residue * F.lit(_CMS_PRIMES[row]) + F.lit(_CMS_SEEDS[row])
    return F.pmod(mixed, F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 512
) -> DataFrame:
    """Build the sketch: rows ``(r, pos, counter)``.

    One scan, one aggregate; each input row contributes ``depth``
    (r, pos) increments via an inline-array explode (row expansion is
    depth×, but partial aggregation collapses it map-side to ≤
    depth·width rows per partition before the shuffle)."""
    assert depth <= len(_CMS_PRIMES), "depth exceeds available hash rows"
    positions = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                cms_position(key_col, r, width).alias("pos"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(positions).alias("rp"))
        .groupBy(F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): union + sum."""
    return (
        a.unionByName(b)
        .groupBy("r", "pos")
        .agg(F.sum("counter").alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each probe key: min over rows of its counters.

    The sketch is ≤ depth·width rows — broadcast it; probes stream
    through a hash join and a per-key min aggregate.  Estimates are
    biased UP only (collisions add), so ``est >= true`` always."""
    probe_pos = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_position(key_col, r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rp"),
    ).select(key_col, F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
    return (
        probe_pos.join(F.broadcast(sketch), on=["r", "pos"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("cms_count"))
    )
