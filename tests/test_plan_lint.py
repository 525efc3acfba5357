"""Mechanized plan audit: every registered query's physical plan is
free of 100 TB scale smells — or carries an explicit, justified
allowance below. A new query that cartesians, nested-loops, pickles
rows through Python, or globally sorts without a limit fails CI
instead of waiting for a review round."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fink_broker_spark.plans.lint import lint_plan
from tests.conftest import SF0001

#: query -> (smells allowed, why that plan is the honest one)
ALLOWED: dict[str, tuple[set[str], str]] = {
    "fuzzy_name_match": (
        {"broadcast_nested_loop_join"},
        "4-row literal probe side broadcast against the corpus: edit "
        "distance has no equi-key, linear scan IS the honest plan",
    ),
    "bloom_prefilter_join": (
        {"broadcast_nested_loop_join"},
        "the 1-row bitset broadcasts through a cross join by design "
        "(the sharded regime q_bloom_prefilter_sharded equi-joins)",
    ),
    "unigram_lm_scores": (
        {"broadcast_nested_loop_join"},
        "1-row corpus-total aggregate broadcast into the scorer",
    ),
    "bm25_topk": (
        {"broadcast_nested_loop_join"},
        "1-row (N, avgdl) corpus-stats aggregate broadcast",
    ),
    "dsir_importance": (
        {"broadcast_nested_loop_join"},
        "1-row smoothing-totals aggregate broadcast",
    ),
    "ann_cosine_topk": (
        {"broadcast_nested_loop_join"},
        "bounded query-matrix broadcast against the corpus scan: "
        "brute-force cosine has no join key by construction",
    ),
    "sky_knn": (
        {"broadcast_nested_loop_join"},
        "32-row TakeOrdered query set broadcast against the event scan: "
        "exact kNN for a bounded query side IS one linear scan",
    ),
    "mutual_information": (
        {"broadcast_nested_loop_join"},
        "1-row grand-total aggregate broadcast into the contingency cells",
    ),
    "hll_cardinality_portable": (
        {"broadcast_nested_loop_join"},
        "1-row true-cardinality aggregate broadcast next to the 1-row "
        "estimate for the comparison column",
    ),
    "lsh_param_recall": (
        {"broadcast_nested_loop_join"},
        "1-row truth-count scalar aggregate cross-broadcast into the "
        "4-row (bands, rows) sweep grid — both sides bounded constants",
    ),
    "surprise_drift_series": (
        {"broadcast_nested_loop_join"},
        "1-row (min, max) doc-id-bounds aggregate broadcast into the "
        "token explode (the vocab_growth decile rule)",
    ),
    "vocab_growth": (
        {"broadcast_nested_loop_join"},
        "1-row (min, max) doc-id-bounds aggregate broadcast into the "
        "decile assignment — the value-range bucketing that replaces a "
        "global ntile sort",
    ),
    "eval_contamination": (
        {"broadcast_nested_loop_join"},
        "1-row min-source scalar broadcast splits the corpus into the "
        "eval slice and the training side (same shape as ks_two_sample)",
    ),
    "ks_two_sample": (
        {"broadcast_nested_loop_join"},
        "1-row min-source scalar broadcast labels the A sample",
    ),
    "ivf_ann_portable": (
        {"broadcast_nested_loop_join"},
        "8-row centroid model broadcast for cell assignment — the IVF "
        "coarse-quantizer shape (candidates themselves equi-join on cell)",
    ),
    "pq_ann_portable": (
        {"broadcast_nested_loop_join"},
        "16-row codebook model broadcast for subspace encoding + the "
        "ADC table build — the PQ shape (approx distances themselves "
        "equi-join on (sub, code))",
    ),
    "semantic_dedup_portable": (
        {"broadcast_nested_loop_join"},
        "8-row cell-seed model broadcast for assignment (ivf twin's "
        "coarse quantizer); the pair join itself equi-joins on cid",
    ),
    "scatter_power_iteration": (
        {"broadcast_nested_loop_join"},
        "1-row n / rescale scalars broadcast into the d- and d²-row "
        "matrix tables",
    ),
    "kruskal_wallis": (
        {"broadcast_nested_loop_join"},
        "1-row (N, k) totals aggregate broadcast into the k group terms",
    ),
    "idle_customers": (
        {"broadcast_nested_loop_join"},
        "TPC-H Q22 scalar subquery (global avg acctbal) is a 1-row "
        "broadcast",
    ),
    "freshness_slo": (
        {"broadcast_nested_loop_join"},
        "1-row lake-wide high-water-mark aggregate broadcast back into "
        "the per-type lag projection",
    ),
    "relational_division": (
        {"broadcast_nested_loop_join"},
        "1-row divisor-cardinality aggregate broadcast twice: into the "
        "HAVING filter and into the final projection (the r7 fix — it "
        "must survive an empty full-coverage set)",
    ),
    "collocation_lift": (
        {"broadcast_nested_loop_join"},
        "1-row (n_tokens, n_bigrams) corpus-totals aggregates broadcast "
        "into the lift scorer",
    ),
    "pagerank": (
        {"broadcast_nested_loop_join"},
        "1-row node-count aggregate broadcast into every iteration's "
        "teleport term",
    ),
    "sparse_cosine_pairs": (
        {"broadcast_nested_loop_join"},
        "1-row doc-count aggregate broadcast into the relative "
        "document-frequency cut",
    ),
    "abc_classification": (
        {"broadcast_nested_loop_join"},
        "1-row revenue-total aggregate broadcast into the class-cut "
        "condition",
    ),
    "event_cooccurrence": (
        {"broadcast_nested_loop_join"},
        "1-row window-count aggregate broadcast into the lift tree",
    ),
    "peak_detection": (
        {"broadcast_nested_loop_join"},
        "1-row (dmin, dmax) span aggregate broadcast into the "
        "per-type day spine",
    ),
    "decayed_revenue": (
        {"broadcast_nested_loop_join"},
        "1-row (ymin, ymax) span aggregate broadcast into the "
        "decay-weight expression",
    ),
    "top_decile_share": (
        {"broadcast_nested_loop_join"},
        "1-row customer-count aggregate broadcast into the decile "
        "cut condition",
    ),
    "basket_size_dist": (
        {"broadcast_nested_loop_join"},
        "1-row distribution-total aggregate broadcast into the "
        "~20-row size table",
    ),
    "region_share_rollup": (
        {"broadcast_nested_loop_join"},
        "1-row world-total aggregate broadcast into the 25-row "
        "nation table",
    ),
    "seasonality_index": (
        {"broadcast_nested_loop_join"},
        "1-row annual-total aggregate broadcast into the 12-row "
        "monthly table",
    ),
    "corr_matrix": (
        {"broadcast_nested_loop_join"},
        "1-row count/sum moment aggregate broadcast into the "
        "centered second pass",
    ),
    "benford_digits": (
        {"broadcast_nested_loop_join"},
        "1-row observed-total aggregate broadcast into the 9-row "
        "digit grid",
    ),
    "rfm_segments": (
        {"broadcast_nested_loop_join"},
        "1-row corpus-max-day aggregate broadcast into the recency "
        "metric; the ntile itself is the distributed bucket-offset "
        "ranking, not a global window",
    ),
    "rolling_median": (
        {"broadcast_nested_loop_join"},
        "trailing-28-day range self-join of the DAY SPINE — a "
        "calendar-bounded (~|days|-row) relation, never the fact "
        "table; the window blow-up is spine x 28",
    ),
    "assoc_rules": (
        {"broadcast_nested_loop_join"},
        "1-row basket-count aggregate broadcast into the lift tree",
    ),
    "qgram_match": (
        {"broadcast_nested_loop_join"},
        "1-row distinct-name-count aggregate broadcast into the "
        "trigram df cut",
    ),
    "skew_report": (
        {"broadcast_nested_loop_join"},
        "three 1-row max-count aggregates broadcast back for the "
        "deterministic hottest-key argmin",
    ),
    "grid_smooth": (
        {"broadcast_nested_loop_join"},
        "9-row stencil-offset relation broadcast into the occupied "
        "cell list (the sparse 3x3 convolution fan-out)",
    ),
    "distinctive_terms": (
        {"broadcast_nested_loop_join"},
        "1-row corpus-token-total aggregate broadcast into the "
        "integer lift cross product",
    ),
    "kl_divergence_sources": (
        {"broadcast_nested_loop_join"},
        "1-row corpus-token-total aggregate broadcast into the "
        "per-term probability ratio",
    ),
    "graph_modularity": (
        {"broadcast_nested_loop_join"},
        "three 1-row aggregates (edge count, intra count, Σd_c²) "
        "cross-joined into the final fixed double tree",
    ),
    "seat_apportionment": (
        {"broadcast_nested_loop_join"},
        "1-row total-cents and used-seats aggregates broadcast into "
        "the 25-row nation quota table",
    ),
    "chisq_independence": (
        {"broadcast_nested_loop_join"},
        "contingency grid = cross of the two margin aggregates "
        "(|event_type| x |arm| x 1-row total, a handful of rows) — the "
        "fact table itself is scanned once, never cross-joined",
    ),
    "survival_counts": (
        {"broadcast_nested_loop_join"},
        "1-row corpus-max-date aggregate broadcast into the censoring "
        "cut over the per-customer lifespan relation",
    ),
}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_plan_is_smell_free(spark, name):
    allow, _why = ALLOWED.get(name, (set(), ""))
    df = entrymod.queries()[name](spark, SF0001)
    findings = lint_plan(df, allow=frozenset(allow))
    assert not findings, (
        f"{name}: " + "; ".join(map(str, findings))
        + " — fix the plan or add a justified ALLOWED entry"
    )


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_plan_is_smell_free_with_lineage_uncut(
    spark, monkeypatch, name
):
    """Re-lint every query with ``localCheckpoint`` disabled (identity
    monkeypatch): a checkpoint truncates the plan the gate above sees,
    so a smell INSIDE a materialized subtree would otherwise escape
    review forever (the r9 §8 limitation, closed here).  This pass is
    also cheaper per query than the checkpointed one — eager
    checkpoints execute real jobs at plan-construction time, the
    identity stub doesn't."""
    fired = []

    def _identity(self, eager=True):
        fired.append(True)
        return self

    # patch the CONCRETE class: in Spark 4 `pyspark.sql.DataFrame` is
    # the abstract parent and `classic.dataframe.DataFrame` overrides
    # localCheckpoint — patching the parent silently misses every call
    monkeypatch.setattr(
        type(spark.range(1)), "localCheckpoint", _identity
    )
    allow, _why = ALLOWED.get(name, (set(), ""))
    df = entrymod.queries()[name](spark, SF0001)
    if not fired:
        # plan identical to the one the base test already linted —
        # re-linting ~290 uncheckpointed queries is pure duplicate work
        pytest.skip("query never checkpoints; base lint covers it")
    findings = lint_plan(df, allow=frozenset(allow))
    assert not findings, (
        f"{name} (lineage uncut): " + "; ".join(map(str, findings))
        + " — fix the plan or add a justified ALLOWED entry"
    )


def test_linter_catches_each_smell(spark):
    """The linter itself must fire on known-bad plans (otherwise the
    suite above proves nothing)."""
    big_a = spark.range(1000).selectExpr("id AS a")
    big_b = spark.range(1000).selectExpr("id AS b")
    cart = big_a.crossJoin(big_b)
    assert {f.smell for f in lint_plan(cart)} & {
        "cartesian_product",
        "broadcast_nested_loop_join",
    }

    nlj = big_a.join(big_b, big_a.a < big_b.b)
    assert any(
        f.smell == "broadcast_nested_loop_join" for f in lint_plan(nlj)
    )

    from pyspark.sql.functions import col, udf

    slow = big_a.withColumn("u", udf(lambda x: x + 1, "long")(col("a")))
    assert any(
        f.smell == "python_udf_row_at_a_time" for f in lint_plan(slow)
    )

    gsort = big_a.orderBy("a")
    assert any(
        f.smell == "global_sort_without_limit" for f in lint_plan(gsort)
    )
    # sanctioned forms do NOT fire
    topk = big_a.orderBy("a").limit(5)
    assert not lint_plan(topk)
    local_sorted = big_a.repartitionByRange(4, "a").sortWithinPartitions("a")
    assert not lint_plan(local_sorted)


#: raw timestamp columns of the lake: ordering on these in an oracle is
#: a latent red once the driver regenerates TIMESTAMP(NANOS) parquet —
#: DuckDB would order by nanoseconds while the Spark side orders by the
#: load_table-normalized microseconds. Order by epoch_us(col) instead.
_RAW_TS_COLS = (
    "ts",
    "o_orderdate",
    "l_shipdate",
    "l_commitdate",
    "l_receiptdate",
)


def test_oracles_never_order_by_raw_timestamps():
    """Every ORDER BY in every oracle (window or terminal) must use
    epoch_us(<ts>) — never the bare timestamp column. r04's
    event_transitions red was exactly this asymmetry; this lint makes
    the sweep permanent."""
    import re

    bad: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        for m in re.finditer(r"ORDER\s+BY", sql, re.IGNORECASE):
            clause = sql[m.end() : m.end() + 200]
            # epoch_us(ts) etc. vanish with their parens; what remains
            # exposes any BARE timestamp column in the ordering
            flat = re.sub(r"\w+\s*\([^()]*\)", "", clause)
            # stop at clause terminators so trailing SELECT text in the
            # 200-char window cannot false-positive
            flat = re.split(
                r"\bROWS\b|\bRANGE\b|\bLIMIT\b|\)|\n\s*\n", flat
            )[0]
            for col in _RAW_TS_COLS:
                if re.search(rf"(^|[\s,(.]){col}\b", flat):
                    bad.append(f"{name}: ORDER BY …{clause[:60]!r}")
                    break
    assert not bad, (
        "oracles ordering by a raw timestamp column (use epoch_us): "
        + "; ".join(bad)
    )
