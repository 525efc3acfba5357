"""Round-10 optimization regression tests.

Pins the operator internals the optimization round changed:
- ``interval_event_counts`` (merge-sweep counting twin of interval_join)
  against the naive non-equi join, including NULL keys/instants,
  inclusive bounds, boundary ties, and start > end;
- ``khop_reach``'s bitmap distinct-count against a brute-force distinct
  (including negative node ids — the exact floor-div word split);
- the ``ensure_scan_parallelism`` / ``ensure_keyed_parallelism`` guards
  (no-op on wide inputs; keyed variant adds no second exchange for a
  downstream keyed aggregate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def spark():
    from fink_broker_spark.core.session import get_session

    return get_session(
        app_name="test-opt-r10", master="local[4]", shuffle_partitions=4
    )


def _naive_interval_counts(points, intervals):
    """Reference semantics: per-interval count via the plain non-equi
    join (NULL never matches a key or a BETWEEN bound)."""
    out = {}
    for key, lo, hi, iid in intervals:
        cnt = 0
        if key is not None and lo is not None and hi is not None:
            for pk, t in points:
                if pk == key and t is not None and lo <= t <= hi:
                    cnt += 1
        if key is not None:
            out[iid] = cnt
    return out


def test_interval_event_counts_duplicate_interval_rows(spark):
    """A re-ingested duplicate interval ROW joins independently in the
    pair-join formulation — the sweep must weight by multiplicity."""
    from fink_broker_spark.operators.relational import interval_event_counts

    p = spark.createDataFrame([(1, 10), (1, 20)], "k int, t long")
    iv = spark.createDataFrame(
        [(1, 5, 15, 7), (1, 5, 15, 7), (1, 5, 25, 7)],
        "k int, lo long, hi long, iid int",
    )
    rows = interval_event_counts(
        p, iv, "t", "lo", "hi", id_cols=["iid"], on=["k"]
    ).collect()
    # two output rows (distinct definitions), duplicate counted twice
    got = sorted((r.iid, r.n_points) for r in rows)
    assert got == [(7, 2), (7, 2)]
    assert sum(n for _, n in got) == 4  # = the pair join's total


def test_interval_event_counts_vs_naive(spark):
    from fink_broker_spark.operators.relational import interval_event_counts

    points = [
        (1, 10), (1, 10), (1, 20), (1, 30), (2, 10), (2, 15),
        (1, None), (None, 10),
    ]
    intervals = [
        (1, 10, 20, 100),   # inclusive both ends: counts both t=10 rows + 20
        (1, 21, 29, 101),   # empty interior
        (1, 30, 30, 102),   # point interval on a boundary
        (1, 25, 5, 103),    # start > end -> 0
        (2, 0, 100, 104),
        (3, 0, 100, 105),   # key with no points -> 0
        (None, 0, 100, 106),  # NULL key: never matches (absent)
        (1, None, 20, 107),  # NULL bound -> 0
    ]
    p = spark.createDataFrame(points, "k int, t long")
    iv = spark.createDataFrame(intervals, "k int, lo long, hi long, iid int")
    got = {
        r.iid: r.n_points
        for r in interval_event_counts(
            p, iv, "t", "lo", "hi", id_cols=["iid"], on=["k"]
        ).collect()
    }
    want = _naive_interval_counts(
        [(r[0], r[1]) for r in points], intervals
    )
    # NULL-key intervals are absent from the sweep output by contract
    assert got == want


def test_interval_event_counts_matches_interval_join_counts(spark):
    """Cross-check the sweep against the bucketed pair join on a
    pseudo-random layout (the range_join_windows shape in miniature)."""
    import random

    from fink_broker_spark.operators.relational import (
        interval_event_counts,
        interval_join,
    )

    rng = random.Random(7)
    pts = [(rng.randrange(5), rng.randrange(1000)) for _ in range(400)]
    ivs = []
    for i in range(60):
        s = rng.randrange(900)
        ivs.append((rng.randrange(5), s, s + rng.randrange(150), i))
    p = spark.createDataFrame(pts, "k int, t long")
    iv = spark.createDataFrame(ivs, "k int, lo long, hi long, iid int")
    swept = {
        r.iid: r.n_points
        for r in interval_event_counts(
            p, iv, "t", "lo", "hi", id_cols=["iid"], on=["k"]
        ).collect()
        if r.n_points > 0
    }
    joined = (
        interval_join(p, iv, "t", "lo", "hi", on=["k"], bucket=100)
        .groupBy("r_iid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r.r_iid: r.n for r in joined.collect()}
    assert swept == want


def test_khop_bitmap_equals_bruteforce(spark):
    from fink_broker_spark.ext.graph import khop_reach, symmetrize

    # negative ids exercise the exact floor-div word split
    raw = [(-130, -1), (-1, 2), (2, 65), (65, 66), (2, 3), (3, 65), (-130, 66)]
    edges = spark.createDataFrame(raw, "u long, v long")
    got = {
        r.node: (r.n_1hop, r.n_2hop) for r in khop_reach(edges).collect()
    }
    sym = {}
    for u, v in raw:
        sym.setdefault(u, set()).add(v)
        sym.setdefault(v, set()).add(u)
    want = {}
    for node, nbs in sym.items():
        reach2 = set(nbs)
        for nb in nbs:
            reach2 |= {x for x in sym[nb] if x != node}
        want[node] = (len(nbs), len(reach2))
    assert got == want


def test_khop_single_pass_plan(spark):
    """The fused bitmap aggregation computes n_1hop and n_2hop in ONE
    pass: the only join left in the plan is the wedge self-join — the
    former n1 ⋈ n2 sort-merge join must stay gone (r10 fusion)."""
    import re

    from fink_broker_spark.ext.graph import khop_reach

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    out = khop_reach(edges)
    assert out.columns == ["node", "n_1hop", "n_2hop"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(
        r"(?:SortMerge|ShuffledHash|BroadcastHash|"
        r"BroadcastNestedLoop|CartesianProduct)Join",
        plan,
    )
    assert len(joins) == 1, plan


def test_ensure_scan_parallelism_guard(spark):
    from fink_broker_spark.plans.partitioning import (
        ensure_keyed_parallelism,
        ensure_scan_parallelism,
    )

    # the SparkSession is a JVM singleton: a full-suite run inherits
    # whatever master an earlier module created, so derive the expected
    # width from the LIVE session instead of the fixture's local[4]
    dp = spark.sparkContext.defaultParallelism
    wide = spark.range(100).repartition(dp)
    # already >= defaultParallelism: returned unchanged, no new node
    assert ensure_scan_parallelism(wide) is wide
    assert ensure_keyed_parallelism(wide, "id") is wide

    narrow = spark.range(100).coalesce(1)
    spread = ensure_scan_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == dp
    assert sorted(r.id for r in spread.collect()) == list(range(100))


def test_ensure_keyed_parallelism_single_exchange(spark):
    """HashPartitioning(key) must satisfy a downstream groupBy(key):
    exactly ONE exchange in the whole plan."""
    from fink_broker_spark.plans.partitioning import ensure_keyed_parallelism

    df = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    ).coalesce(1)
    agg = ensure_keyed_parallelism(df, "k").groupBy("k").agg(F.sum("v"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        "Exchange" in line and "Broadcast" not in line
        for line in plan.splitlines()
    )
    assert n_exchanges == 1, plan
    got = {r.k: r["sum(v)"] for r in agg.collect()}
    want = {}
    for i in range(1000):
        want[i % 50] = want.get(i % 50, 0) + i
    assert got == want


def test_double_matrix_lit_bit_exact(spark):
    """The SQL-parsed matrix literal must be bit-identical to the
    Python floats, including -0.0, denormals, and extreme exponents —
    it replaces element-wise F.lit conversion in the centroid/plane
    expressions (r10 literal compaction)."""
    import struct

    from fink_broker_spark.functions.vector import double_matrix_lit

    rows = [
        [0.1, -0.0, 1e-300, 4.9e-324],
        [-1.7976931348623157e308, 123456789.123456789, 2.5, -3.0],
    ]
    got = (
        spark.range(1)
        .select(double_matrix_lit(rows).alias("m"))
        .collect()[0]["m"]
    )
    for want_row, got_row in zip(rows, got):
        for a, b in zip(want_row, got_row):
            assert struct.pack("<d", a) == struct.pack("<d", b)


def test_cell_ranking_compact_matches_unrolled(spark):
    """The compact transform-over-matrix-literal ranking must equal the
    old unrolled per-centroid form bit-for-bit (same (x-y)^2 doubles,
    same aggregate order, same struct tie-break on cell index)."""
    from fink_broker_spark.ext.ann import _cell_ranking_expr

    cents = [[1.5, 2.5], [0.25, -1.0], [3.0, 0.5], [1.5, 2.5]]
    df = spark.createDataFrame(
        [([2.0, 1.0],), ([0.25, -1.0],), ([-5.5, 4.25],)],
        "embedding array<double>",
    )

    def unrolled(vec_col):
        v = F.col(vec_col).cast("array<double>")
        return F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(
                                v,
                                F.array(*[F.lit(float(x)) for x in c]),
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("dist"),
                        F.lit(i).alias("cell"),
                    )
                    for i, c in enumerate(cents)
                ]
            )
        )

    got = df.select(
        _cell_ranking_expr("embedding", cents).alias("r")
    ).collect()
    want = df.select(unrolled("embedding").alias("r")).collect()
    assert [r["r"] for r in got] == [r["r"] for r in want]


def test_signature_expr_compact_matches_unrolled(spark):
    """Hyperplane sign bits from the compact plane-matrix literal must
    equal the old per-plane unrolled construction."""
    from fink_broker_spark.ext.ann import hyperplanes, signature_expr

    planes = hyperplanes(4, 8, seed=7)
    df = spark.createDataFrame(
        [([0.5, -1.0, 2.0, 0.0],), ([-0.1, -0.2, 0.3, 0.4],)],
        "embedding array<double>",
    )

    def unrolled(vec_col):
        v = F.col(vec_col).cast("array<double>")
        bits = []
        for plane in planes:
            dot = F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
        return F.array(*bits)

    got = df.select(signature_expr("embedding", planes).alias("s")).collect()
    want = df.select(unrolled("embedding").alias("s")).collect()
    assert [r["s"] for r in got] == [r["s"] for r in want]
