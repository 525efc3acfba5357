"""Property-based checks (hypothesis) for the custom algorithms: the
Spark implementations must agree with trivially-correct Python oracles
on arbitrary inputs — the reference has no property tests (SURVEY §5.7);
these guard the operators whose SQL oracles can't vary their inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

EPOCH = datetime(2024, 1, 1)

pair_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=40,
)

events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)),  # (key, minute)
    min_size=0,
    max_size=25,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=pair_lists)
def test_dedup_groups_matches_union_find(spark, edges):
    from fink_broker_spark.ext.dedup import dedup_groups

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in dedup_groups(pairs).collect()}
    want = _union_find(edges)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events, right=events)
def test_asof_join_matches_naive(spark, left, right):
    from fink_broker_spark.operators.relational import asof_join

    lrows = [
        (i, k, EPOCH + timedelta(minutes=m)) for i, (k, m) in enumerate(left)
    ]
    rrows = [
        (k, EPOCH + timedelta(minutes=m), i * 10)
        for i, (k, m) in enumerate(right)
    ]
    # asof semantics need a deterministic right side: one row per (key, t)
    best = {}
    for k, t, v in rrows:
        best[(k, t)] = max(best.get((k, t), -1), v)
    rrows = [(k, t, v) for (k, t), v in best.items()]

    ldf = spark.createDataFrame(lrows, "id long, k long, t timestamp")
    rdf = spark.createDataFrame(rrows, "k long, t timestamp, v long")
    out = asof_join(
        ldf, rdf, left_on="k", right_on="k",
        left_time="t", right_time="t", right_values=["v"],
    )
    got = {r.id: r.v for r in out.collect()}

    want = {}
    for i, k, t in lrows:
        cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want
