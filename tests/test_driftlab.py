"""Driver-drift harness: adversarial physical-layout variants must not
split the engines.

Round 4's five driver value-mismatches all passed the committed-data
parity suite — the failures lived in regenerated testdata layouts the
local loop never exercised. These tests pin the reproduction fixtures:

- seed1/``nanos``  — TIMESTAMP(NANOS) with sub-µs jitter: reproduced the
  ``max_concurrency`` bigint-cast-as-seconds red (pre-fix code MISMATCHes
  on this fixture; the fix is load_table's footer-driven normalization).
- seed1-3/``boundary`` — half-boundary-rich doubles: reproduced latent
  reds in ``phase_fold``/``data_quality_report`` (scale-6 summand
  rounds), ``grouped_agg_udaf``/``product_profit`` (rint vs round on .5
  ties), and ``promo_revenue`` (wide-decimal → double double-rounding).
"""

from __future__ import annotations

import pytest

from fink_broker_spark.admin.driftlab import generate_variant, run_parity

#: the queries each layout historically broke (regression subset — the
#: full cross-product runs via the CLI in the per-round verify loop)
NANOS_REGRESSIONS = [
    "max_concurrency",
    "event_transitions",
    "phase_fold",
    "autocorrelation",
    "fading_trend",
    "resample_fill",
    "history_arrays",
    "interpolate_ephemeris",
]
BOUNDARY_REGRESSIONS = [
    "phase_fold",
    "data_quality_report",
    "grouped_agg_udaf",
    "product_profit",
    "promo_revenue",
    "market_share",
    "small_quantity_revenue",
    "cusum_changepoint",
    "event_type_stats",
    "pricing_summary",
]


@pytest.fixture(scope="module")
def entry_module():
    import importlib
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    return importlib.import_module("__spark_entry__")


#: round-6 layouts: key-width narrowing and injected NULL FKs — the
#: judge's remaining data-layout hypotheses for the r5 integer-output
#: reds (ruled out: the cause was HUGEINT result typing, but the
#: layouts stay as standing coverage).  Subsets exercise the FK joins,
#: flag sums, and user_id grouping those layouts stress.
INT32KEYS_REGRESSIONS = [
    "fk_orphans",
    "rank_delta",
    "rfm_segments",
    "semi_anti_join",
    "local_supplier_volume",
    "last_event_per_user",
]
NULLFK_REGRESSIONS = [
    "fk_orphans",
    "weighted_median",
    "modal_event_type",
    "basket_novelty",
    "grid_quantiles",
    "semi_anti_join",
]
#: the 5 queries the first decimalprice sweep split (quantile_cont's
#: in-decimal interpolation, stack's same-type requirement, and
#: decimal×double promotion-tree ulp drift) plus the two percentile
#: siblings sharing the fixed operator
DECIMALPRICE_REGRESSIONS = [
    "percentiles",
    "unpivot_stack",
    "schema_defaults",
    "ewma_smooth",
    "tracklet_candidates",
    "anomaly_scores",
    "mad_scores",
]
#: the 3 queries the first sparse (empty-intermediate-set) sweep split
#: in round 7: ANSI divide-by-zero on an empty graph's 2m total, and
#: Spark rollup-over-empty emitting zero rows where the oracle's
#: unconditional UNION ALL grand total emitted (NULL, 0); plus the two
#: r6-era empty-input fixes the layout exists to guard
SPARSE_REGRESSIONS = [
    "graph_modularity",
    "triangle_count",
    "triangle_count_merge",
    "autocorrelation",
    "relational_division",
    "set_ops_all",
]
#: the 7 queries the first nullmeasure (~2 % NULLs in value / c_acctbal
#: / n_chars / text) sweep split in round 7: ASC orderings over NULLable
#: expressions (Spark NULLS FIRST vs DuckDB NULLS LAST shifting ntile
#: buckets / rank fractions / cumulative grids), a UDTF coercing NULL
#: text to '' where substr/md5 propagate NULL, pandas NaN sort order in
#: the grouped-map clusterer, max_by over a NULL-quality struct, and a
#: numpy crash on NULL shingle arrays
NULLMEASURE_REGRESSIONS = [
    "equidepth_histogram",
    "distribution_ranks",
    "length_caps",
    "dedup_keep_best",
    "doc_chunks_udtf",
    "tracklet_clusters",
    "simhash_neardup",
    # second wave (layout extended to lineitem/orders money columns):
    # NULL cents/rev reaching grid orderings, min_by/max_by NULL
    # payloads, and NaN poisoning in the GROUPED_AGG UDAF's int casts
    "weighted_median",
    "rank_delta",
    "mannwhitney_u",
    "winsorized_stats",
    "quartile_skewness",
    "rolling_median",
    "ohlc_weekly",
    "grouped_agg_udaf",
]


#: the 5 queries the first emptystream ("first night" zero-row
#: events/documents/embeddings) sweep broke in round 7: model fits
#: crashing on an empty corpus instead of returning the empty answer
#: (now EmptyCorpusError → empty-schema fast path) and a KS statistic
#: dividing by a zero event total under ANSI
EMPTYSTREAM_REGRESSIONS = [
    "pq_ann_topk",
    "semantic_dedup",
    "ivf_ann_topk",
    "embedding_pca",
    "ks_uniformity",
]

#: round-8 ``dupdrift`` layout (ADVICE r7 #3): re-ingested doc_ids with
#: REVISED bodies / re-detected langs split any dedup that keeps an
#: arbitrary row on one engine and a different (or every distinct) row
#: on the other — fixed by min(text) survivor picks and same-tuple
#: DISTINCT on both sides; these five are the queries the advisory
#: named (plus the governance readout of the drift state itself)
DUPDRIFT_REGRESSIONS = [
    "repetition_rules",
    "dedup_keep_best",
    "exact_substring_remove",
    "ppjoin_neardup",
    "reingest_drift_audit",
]

#: round-9 ``nullemb`` layout (NULL embedding arrays + NULL elements —
#: the failed-encoder state ADVICE r8 predicted): the first sweep
#: split 8 queries — numpy kernels crashing on None/ragged input
#: where DuckDB answers (crash-vs-answer asymmetry), and the subtler
#: argmin flip: a NULL-element SEED vector turns every d2 NULL, where
#: Spark ASC ranks NULLS FIRST and DuckDB NULLS LAST, silently
#: reassigning cells/codes (the two portable-twin hash mismatches).
#: Fixed by the shared well_formed_vectors domain at every embedding
#: operator entry, mirrored in the portable oracles' iv CTEs.
NULLEMB_REGRESSIONS = [
    "ivf_ann_portable",
    "pq_ann_portable",
    "semantic_dedup_portable",
    "ann_kernel_portable",
    "embedding_neardup",
    "ann_kernel_topk",
    "pq_ann_topk",
    "ivf_ann_topk",
    "semantic_dedup",
    "embedding_pca",
]

#: round-10 ``nanemb`` layout (NaN/±Inf embedding elements + NaN/Inf
#: in events.value — the OTHER failed-encoder state): the first sweep
#: split 36 queries across two families.  (A) embedding ops: numpy
#: propagates NaN silently (np.argmin returns the NaN position where
#: SQL windows rank NaN greatest) and the ANSI integerization tree
#: hard-errors on BOTH engines — fixed by extending the shared
#: well_formed_vectors domain to FINITE elements, mirrored in every
#: embedding oracle.  (B) events.value consumers: Spark's
#: double→DECIMAL cast NULLs non-finite where DuckDB hard-errors
#: (oracle-side isfinite CASE mirrors), and Spark's floor(double)
#: returns a LONG with floor(NaN)=0 / floor(±Inf)=±Long.MAX — SILENT
#: corruption — where DuckDB's BIGINT cast errors (fixed by the
#: NULL-preserving finite-value domain filter on both sides, or a
#: sentinel fold for integrity audits like table_checksum).
NANEMB_REGRESSIONS = [
    # family A: embedding operators
    "ann_cosine_topk",
    "embedding_neardup",
    "embedding_quantize",
    "embedding_quant_audit",
    "label_centroids",
    "centroid_distances",
    "scatter_power_iteration",
    "ivf_ann_portable",
    "pq_ann_portable",
    "ann_kernel_portable",
    "semantic_dedup_portable",
    "ivf_ann_topk",
    "pq_ann_topk",
    "semantic_dedup",
    "embedding_pca",
    # family B: events.value consumers (one per fix pattern)
    "nightly_stats",       # decimal-cast sum → oracle isfinite CASE
    "regression_trend",    # floor-integerization → finite row domain
    "psi_drift",           # floor bin key → finite row domain
    "healpix_pixelization",  # coordinate from value → finite domain
    "merge_upsert",        # cents inside CASE → NULL fold
    "table_checksum",      # checksum covers rows → sentinel fold
    "cogroup_asof",        # pandas cogroup staging → finite domain
    "periodogram_power",   # trig term decimal cast → isfinite CASE
]


@pytest.mark.parametrize(
    ("layout", "subset"),
    [
        ("nanos", NANOS_REGRESSIONS),
        ("boundary", BOUNDARY_REGRESSIONS),
        ("int32keys", INT32KEYS_REGRESSIONS),
        ("nullfk", NULLFK_REGRESSIONS),
        ("decimalprice", DECIMALPRICE_REGRESSIONS),
        ("sparse", SPARSE_REGRESSIONS),
        ("nullmeasure", NULLMEASURE_REGRESSIONS),
        ("emptystream", EMPTYSTREAM_REGRESSIONS),
        ("dupdrift", DUPDRIFT_REGRESSIONS),
        ("nullemb", NULLEMB_REGRESSIONS),
        ("nanemb", NANEMB_REGRESSIONS),
    ],
)
def test_layout_variants_keep_parity(
    spark, tmp_path_factory, entry_module, layout, subset
):
    out = str(tmp_path_factory.mktemp("driftlab"))
    dest = generate_variant("/root/testdata/sf0.001", out, 1, layout)
    res = run_parity(dest, subset, spark=spark, entry_module=entry_module)
    # rows-only means the (oracle-less) query RAN and produced a count —
    # exactly what the simhash nullmeasure regression pins (its failure
    # mode was a numpy crash, not a hash split)
    bad = {
        k: v
        for k, v in res.items()
        if v != "ok" and not v.startswith("rows-only")
    }
    assert not bad, f"{layout} variant split the engines: {bad}"


def test_variant_generation_is_deterministic(tmp_path_factory):
    import hashlib

    out1 = str(tmp_path_factory.mktemp("a"))
    out2 = str(tmp_path_factory.mktemp("b"))
    d1 = generate_variant("/root/testdata/sf0.001", out1, 7, "boundary")
    d2 = generate_variant("/root/testdata/sf0.001", out2, 7, "boundary")

    import pyarrow.parquet as pq

    for t in ("events", "lineitem"):
        a = pq.read_table(f"{d1}/{t}.parquet")
        b = pq.read_table(f"{d2}/{t}.parquet")
        assert a.equals(b)
    # different seed → different content
    d3 = generate_variant("/root/testdata/sf0.001", out1, 8, "boundary")
    a = pq.read_table(f"{d1}/events.parquet")
    c = pq.read_table(f"{d3}/events.parquet")
    assert not a.equals(c)


def test_arrow_gate_catches_hugeint_class(spark, tmp_path_factory):
    """The r5 red class: oracle values that fetchall() launders into
    plain ints but an Arrow fetch types as HUGEINT→Decimal.  The
    run_parity arrow gate must flag a deliberately-uncast SUM while the
    plain-fetch hash passes it — proving the gate sees what the
    external driver sees."""
    from pyspark.sql import functions as F

    class _Entry:
        @staticmethod
        def queries():
            return {
                "hug": lambda s, sf: s.range(3).agg(
                    F.sum("id").cast("long").alias("v")
                )
            }

        @staticmethod
        def oracle_sql():
            # SUM over BIGINT → HUGEINT, uncast: the exact defect shape
            return {"hug": "SELECT SUM(i) AS v FROM range(0, 3) t(i)"}

    res = run_parity(
        "/root/testdata/sf0.001", spark=spark, entry_module=_Entry
    )
    assert res == {"hug": "MISMATCH-typed"}


def test_int32keys_variant_narrows_and_roundtrips(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("i32"))
    dest = generate_variant("/root/testdata/sf0.001", out, 2, "int32keys")
    src = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    var = pq.read_table(f"{dest}/orders.parquet")
    assert var.schema.field("o_orderkey").type == pa.int32()
    assert (
        var.column("o_orderkey").cast(pa.int64()).combine_chunks()
        .equals(src.column("o_orderkey").combine_chunks())
    )


def test_nullfk_variant_injects_nulls_deterministically(tmp_path_factory):
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("nf"))
    dest = generate_variant("/root/testdata/sf0.001", out, 2, "nullfk")
    var = pq.read_table(f"{dest}/orders.parquet")
    n_null = var.column("o_custkey").null_count
    assert n_null > 0  # ~1 % of rows
    dest2 = generate_variant(
        "/root/testdata/sf0.001",
        str(tmp_path_factory.mktemp("nf2")),
        2,
        "nullfk",
    )
    var2 = pq.read_table(f"{dest2}/orders.parquet")
    assert var.column("o_custkey").combine_chunks().equals(
        var2.column("o_custkey").combine_chunks()
    )


def test_nanos_variant_preserves_micros_truncation(tmp_path_factory):
    """The ns jitter is sub-µs only: a normalizing reader must see the
    identical microsecond timeline as the committed layout."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("n"))
    dest = generate_variant("/root/testdata/sf0.001", out, 3, "nanos")
    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    var = pq.read_table(f"{dest}/events.parquet")
    import pyarrow as pa

    src_us = src.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    var_us = pc.divide(var.column("ts").cast(pa.int64()), pa.scalar(1000))
    assert src_us.combine_chunks().equals(var_us.combine_chunks())


def test_decimalprice_variant_types_and_values(tmp_path_factory):
    """The decimalprice layout must store money columns as physical
    DECIMAL(15,2) whose values are the half-up 2-decimal quantization
    of the originals (the engines' own floor(x*100+0.5) cents tree)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("dp"))
    dest = generate_variant(
        "/root/testdata/sf0.001", out, 2, "decimalprice"
    )
    src = pq.read_table("/root/testdata/sf0.001/customer.parquet")
    var = pq.read_table(f"{dest}/customer.parquet")
    assert var.schema.field("c_acctbal").type == pa.decimal128(15, 2)
    orig = src.column("c_acctbal").to_pylist()
    got = var.column("c_acctbal").to_pylist()
    for o, g in zip(orig[:500], got[:500]):
        if o is None:
            assert g is None
            continue
        assert int(g.scaleb(2)) == math.floor(o * 100 + 0.5)
