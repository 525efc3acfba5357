"""HLL cardinality sketches: error bounds and merge associativity."""

from __future__ import annotations

import pyspark.sql.functions as F

from fink_broker_spark.functions.sketches import (
    cardinality_report,
    hll_merged_estimate,
    hll_partials,
)
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


def test_hll_error_bounds(spark):
    df = spark.range(50000).select(
        (F.col("id") % 9973).alias("k"), (F.col("id") % 5).alias("g")
    )
    rep = cardinality_report(df, ["g"], "k", lgk=14, rsd=0.02)
    for r in rep.collect():
        assert abs(r.hll_estimate - r.exact) / r.exact < 0.03
        assert abs(r.approx - r.exact) / r.exact < 0.05


def test_all_null_group_reported_with_exact_zero(spark):
    """A group whose key values are ALL NULL must still appear in the
    report (exact = 0), not vanish through the exact-side join."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None), ("b", None)],
        "g string, k int",
    )
    rows = {r.g: r for r in cardinality_report(df, ["g"], "k").collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].exact == 2
    assert rows["b"].exact == 0
    assert rows["b"].approx == 0


def test_hll_merge_associativity(spark):
    """Union of per-group sketches must estimate the SAME cardinality
    as one global sketch — the property that lets nightly partials roll
    up into monthly reports without re-reading raw data."""
    ev = load_table(spark, SF0001, "events")
    per_type = hll_partials(ev, ["event_type"], "user_id")
    merged = hll_merged_estimate(per_type).collect()[0].estimate
    direct = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.03


def test_partials_are_fixed_size(spark):
    """Sketch bytes are bounded by lgk, independent of input size —
    the reason partials can persist per night."""
    small = spark.range(100).select((F.col("id")).alias("k"), F.lit(1).alias("g"))
    big = spark.range(100000).select((F.col("id")).alias("k"), F.lit(1).alias("g"))
    s_len = len(hll_partials(small, ["g"], "k").collect()[0].hll_sketch)
    b_len = len(hll_partials(big, ["g"], "k").collect()[0].hll_sketch)
    assert b_len <= 2 ** 14 * 2  # bounded by register budget, not input
    assert s_len <= b_len


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------

def test_cms_overestimates_and_is_tight_when_sparse(spark):
    """est >= true always; with keys ≪ width the min over rows is exact."""
    from fink_broker_spark.functions.sketches import cms_build, cms_estimate

    df = spark.range(3000).select((F.col("id") % 60).alias("k"))
    sketch = cms_build(df, "k", depth=3, width=512)
    probes = df.select("k").distinct()
    est = {r.k: r.cms_count for r in
           cms_estimate(sketch, probes, "k", depth=3, width=512).collect()}
    exact = {r.k: r.cnt for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c
    # 60 keys in 512 slots x 3 rows: at least the vast majority exact
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits >= 55


def test_cms_merge_equals_build_on_union(spark):
    """Sketches are mergeable: build(A) ⊕ build(B) == build(A ∪ B) —
    the property that lets nightly sketches roll up to monthly ones
    without rescanning."""
    from fink_broker_spark.functions.sketches import cms_build, cms_merge

    a = spark.range(0, 1000).select((F.col("id") % 37).alias("k"))
    b = spark.range(1000, 2500).select((F.col("id") % 53).alias("k"))
    merged = {
        (r.r, r.pos): r.counter
        for r in cms_merge(
            cms_build(a, "k"), cms_build(b, "k")
        ).collect()
    }
    direct = {
        (r.r, r.pos): r.counter
        for r in cms_build(a.unionByName(b), "k").collect()
    }
    assert merged == direct


def test_cms_sketch_size_is_bounded(spark):
    """The sketch never exceeds depth*width rows regardless of input
    cardinality — the whole point of the fixed-memory summary."""
    from fink_broker_spark.functions.sketches import cms_build

    df = spark.range(20000).select(F.col("id").alias("k"))  # all distinct
    assert cms_build(df, "k", depth=3, width=128).count() <= 3 * 128


def test_cms_null_keys_ignored(spark):
    from fink_broker_spark.functions.sketches import cms_build

    df = spark.createDataFrame([(1,), (None,), (1,)], "k bigint")
    total = (
        cms_build(df, "k", depth=2, width=16)
        .filter(F.col("r") == 0)
        .agg(F.sum("counter").alias("s"))
        .collect()[0].s
    )
    assert total == 2  # the NULL row contributes nothing


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from fink_broker_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    build = spark.range(0, 1000).select((F.col("id") * 3).alias("key"))
    bf = bloom_build(build, "key", num_bits=1 << 14, k=5)
    probe = spark.range(0, 6000).select(F.col("id").alias("key"))
    kept = bloom_might_contain(probe, bf, "key", num_bits=1 << 14, k=5)
    # every true member survives (Bloom filters have no false negatives)
    assert build.join(kept, "key", "left_anti").count() == 0
    # ~16 bits/key, k=5 -> fp well under 1%; allow 2% slack on 5000
    # non-members
    n_kept = kept.count()
    assert 1000 <= n_kept <= 1000 + int(5000 * 0.02)


def test_bloom_prefilter_join_equals_plain_semi_join(spark):
    """BF pre-filter + exact semi join == plain semi join, bit for bit
    (the oracle contract of q_bloom_prefilter_join)."""
    from fink_broker_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    fact = spark.range(0, 5000).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("grp")
    )
    bf = bloom_build(dim, "key", num_bits=1 << 15, k=5)
    pre = bloom_might_contain(fact, bf, "key", num_bits=1 << 15, k=5)
    via_bf = sorted(
        (r.key, r.grp)
        for r in pre.join(dim, "key", "left_semi").collect()
    )
    plain = sorted(
        (r.key, r.grp)
        for r in fact.join(dim, "key", "left_semi").collect()
    )
    assert via_bf == plain


def test_bloom_filter_is_distributed_one_row(spark):
    """The built filter is a single row holding the dense word array —
    broadcastable, never driver-collected during the build."""
    from fink_broker_spark.functions.sketches import bloom_build

    bf = bloom_build(
        spark.range(100).select(F.col("id").alias("key")),
        "key",
        num_bits=1 << 10,
        k=3,
    )
    rows = bf.collect()
    assert len(rows) == 1
    assert len(rows[0]["bloom"]) == (1 << 10) // 64


def test_bloom_sharded_equals_monolithic_semantics(spark):
    """nshards>1 keeps Bloom semantics: no false negatives, bounded fp,
    and BF-prefilter + exact join == plain semi join. num_bits is the
    TOTAL budget, so per-key fp matches the monolithic build."""
    from fink_broker_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    fact = spark.range(0, 5000).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("grp")
    )
    bf = bloom_build(dim, "key", num_bits=1 << 15, k=5, nshards=8)
    assert bf.count() <= 8  # one row per non-empty shard
    assert len(bf.first()["bloom"]) == (1 << 15) // 8 // 64
    pre = bloom_might_contain(
        fact, bf, "key", num_bits=1 << 15, k=5, nshards=8
    )
    # no false negatives
    assert dim.join(pre, "key", "left_anti").count() == 0
    # fp bounded: ~64 bits/key total, k=5
    assert pre.count() <= dim.count() + int(5000 * 0.02)
    via_bf = sorted(
        (r.key, r.grp) for r in pre.join(dim, "key", "left_semi").collect()
    )
    plain = sorted(
        (r.key, r.grp) for r in fact.join(dim, "key", "left_semi").collect()
    )
    assert via_bf == plain


def test_bloom_sharded_probe_is_equi_join_not_cross(spark):
    """The sharded probe must plan as a hash equi-join on shard id —
    never a BroadcastNestedLoopJoin/cartesian against a monolithic
    bitset row (the whole point of sharding: each shard stays
    join-able when the total bitset exceeds broadcast comfort)."""
    from fink_broker_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    fact = spark.range(0, 5000).select(F.col("id").alias("key"))
    bf = bloom_build(dim, "key", num_bits=1 << 15, k=5, nshards=8)
    pre = bloom_might_contain(
        fact, bf, "key", num_bits=1 << 15, k=5, nshards=8
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "HashJoin" in plan, plan[:2000]  # broadcast- or shuffled-


def test_bloom_prefilter_runs_before_shuffle_when_pushdown_excluded(spark):
    """The 100 TB posture: with PushLeftSemiLeftAntiThroughJoin
    excluded (one conf), the BF probe executes inside the broadcast
    cross join — map-side, BEFORE the fact-side Exchange — and the
    exact semi join runs on the pre-filtered stream. Default Catalyst
    pushes the semi join below the probe instead (correct, but the
    filter then saves nothing); this pins the documented workaround."""
    from fink_broker_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer."
        "PushLeftSemiLeftAntiThroughJoin",
    )
    try:
        dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
        fact = spark.range(0, 5000).select(
            F.col("id").alias("key"), (F.col("id") % 13).alias("grp")
        )
        bf = bloom_build(dim, "key", num_bits=1 << 15, k=5)
        pre = bloom_might_contain(fact, bf, "key", num_bits=1 << 15, k=5)
        joined = pre.join(
            dim.hint("merge"), pre.key == dim.key, "left_semi"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        semi_at = plan.index("LeftSemi")
        probe_at = plan.index("shiftrightunsigned")
        # tree prints top-down: the semi join must sit ABOVE the probe
        assert semi_at < probe_at, plan[:2000]
        # and the result is still exactly the plain semi join
        expect = sorted(
            (r.key, r.grp)
            for r in fact.join(dim, "key", "left_semi").collect()
        )
        got = sorted((r.key, r.grp) for r in joined.collect())
        assert got == expect
    finally:
        spark.conf.unset("spark.sql.optimizer.excludedRules")


def test_cardinality_report_keeps_all_null_groups(spark):
    """A group whose key values are ALL NULL has no exact-count row;
    the report must still list it with exact = 0 (left join +
    coalesce), not silently drop it."""
    from fink_broker_spark.functions.sketches import cardinality_report

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None), ("b", None), ("c", 3)],
        "grp string, key int",
    )
    rep = {
        r.grp: (r.exact, r.approx)
        for r in cardinality_report(df, ["grp"], "key").collect()
    }
    assert set(rep) == {"a", "b", "c"}
    assert rep["b"][0] == 0
    assert rep["a"][0] == 2
