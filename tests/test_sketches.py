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
