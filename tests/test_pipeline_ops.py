"""Training-pipeline operators: packing, sampling, PII, repetition."""

from __future__ import annotations

import pyspark.sql.functions as F

from fink_broker_spark.ext.pipeline import (
    hash_keep_expr,
    pack_by_prefix_sum,
    pii_counts,
    pii_scrub_expr,
    repetition_metrics,
    stratified_keep_expr,
)


def test_pack_by_prefix_sum_semantics(spark):
    # one shard, budget 10: docs of 4,4,4,4 tokens -> excl sums 0,4,8,12
    # -> bins 0,0,0,1
    df = spark.createDataFrame(
        [(i * 4, 4) for i in range(4)], "doc_id bigint, n_tokens int"
    )
    packed = pack_by_prefix_sum(df, "n_tokens", budget=10, id_col="doc_id", nshards=1)
    got = {r.doc_id: (r.shard, r.bin) for r in packed.collect()}
    assert got == {0: (0, 0), 4: (0, 0), 8: (0, 0), 12: (0, 1)}


def test_pack_sharding_is_parallel_and_exhaustive(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(100)], "doc_id bigint, n_tokens int"
    )
    packed = pack_by_prefix_sum(df, "n_tokens", budget=21, id_col="doc_id", nshards=8)
    assert packed.count() == 100  # no doc lost
    assert packed.select("shard").distinct().count() == 8
    # the window must hash-partition on shard — a SinglePartition
    # exchange would mean a global sort through one task
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan
    shards = {r.shard for r in packed.collect()}
    assert shards == set(range(8))
    # bins fill to ~budget within a shard: 13 docs x 7 tokens, budget 21
    # -> 3 docs per bin
    one = [
        (r.bin, r.doc_id)
        for r in packed.filter(F.col("shard") == 0).collect()
    ]
    from collections import Counter

    sizes = Counter(b for b, _ in one)
    assert all(v <= 3 for v in sizes.values())


def test_stratified_and_hash_sampling_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(10000)],
        "doc_id bigint, lang string",
    )
    mod_keep = df.filter(
        stratified_keep_expr("lang", {"en": 30, "de": 90}, "doc_id")
    )
    by_lang = {
        r.lang: r["count"]
        for r in mod_keep.groupBy("lang").count().collect()
    }
    # even ids 0..9998: kept when id%100<30 -> 15 per 100 even ids
    assert by_lang["en"] == 1500
    assert by_lang["de"] == 4500
    # hash twin: same rates within statistical tolerance
    hash_keep = df.filter(
        hash_keep_expr("lang", {"en": 30, "de": 90}, "doc_id")
    )
    hl = {
        r.lang: r["count"]
        for r in hash_keep.groupBy("lang").count().collect()
    }
    assert abs(hl["en"] - 1500) < 150
    assert abs(hl["de"] - 4500) < 250


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or 123456789 now"),
            (2, "clean text 12345 short digits stay"),
        ],
        "id int, text string",
    )
    counts = pii_counts("text")
    out = df.select(
        "id",
        pii_scrub_expr("text").alias("clean"),
        counts["n_emails"].alias("ne"),
        counts["n_digit_runs"].alias("nd"),
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[1].clean == "mail me at <EMAIL> or <NUM> now"
    assert rows[1].ne == 1 and rows[1].nd == 1
    # 5-digit run is below the threshold and survives
    assert rows[2].clean == "clean text 12345 short digits stay"
    assert rows[2].ne == 0 and rows[2].nd == 0


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "a", "a", "b"]),  # top=3/4, distinct=2/4
            (2, ["x", "y", "z"]),  # top=1/3, distinct=3/3
        ],
        "doc_id bigint, toks array<string>",
    )
    met = {r.doc_id: r for r in repetition_metrics(df, "doc_id", "toks").collect()}
    assert (met[1].n_tokens, met[1].distinct_tokens, met[1].top_token_count) == (4, 2, 3)
    assert (met[2].n_tokens, met[2].distinct_tokens, met[2].top_token_count) == (3, 3, 1)


def test_decontaminate_drops_only_overlapping_docs(spark):
    from fink_broker_spark.ext.pipeline import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id bigint, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "a quick brown fox ran away"),  # shares "quick brown fox"
            (2, "a slow brown fox ran away"),  # no shared 3-gram
            (3, "the quick red fox jumps high"),  # bigrams overlap, no 3-gram
        ],
        "doc_id bigint, text string",
    )
    clean = decontaminate(docs, bench, n=3)
    assert {r.doc_id for r in clean.collect()} == {2, 3}
    # schema passes through untouched
    assert clean.columns == docs.columns


def test_approx_quantiles_error_bound(spark):
    """approx_percentile sketch estimates must sit within the accuracy
    bound of the exact quantiles (the 100 TB posture's contract)."""
    import __spark_entry__ as em
    from tests.conftest import SF001

    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in em.queries()["approx_quantiles"](spark, SF001).collect()
    }
    from fink_broker_spark.sources.parquet import load_table
    import pyspark.sql.functions as F

    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in load_table(spark, SF001, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in approx:
        spread = max(abs(v) for v in exact[k]) + 1.0
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / spread < 0.05, (k, a, e)


def test_temperature_shares_sum_to_one_and_damp_dominance(spark):
    from fink_broker_spark.ext.pipeline import temperature_shares

    df = spark.createDataFrame(
        [("big",)] * 900 + [("mid",)] * 90 + [("small",)] * 10,
        "source string",
    )
    rows = {r.source: r for r in
            temperature_shares(df, "source", alpha=0.5).collect()}
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-12
    # raw share of 'big' is 0.9; sqrt-damping must pull it down and
    # lift the tail
    assert rows["big"].share < 0.9
    assert rows["small"].share > 0.01
    # quotas are floor(share * corpus) — never exceed the corpus
    assert sum(r.quota for r in rows.values()) <= 1000


def test_temperature_alpha_zero_is_uniform(spark):
    from fink_broker_spark.ext.pipeline import temperature_shares

    df = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 30, "source string"
    )
    rows = temperature_shares(df, "source", alpha=0.0).collect()
    for r in rows:
        assert abs(r.share - 0.5) < 1e-12


def test_epoch_shuffle_is_a_sharded_permutation(spark):
    from fink_broker_spark.ext.pipeline import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = epoch_shuffle(df, "doc_id", epoch=1, n_shards=8)
    rows = out.collect()
    # permutation: every doc exactly once
    assert sorted(r.doc_id for r in rows) == list(range(500))
    # positions within a shard are 1..n contiguous
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.position)
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(1, len(pos) + 1))
    # deterministic: same epoch -> identical order
    again = epoch_shuffle(df, "doc_id", epoch=1, n_shards=8).collect()
    assert {(r.doc_id, r.shard, r.position) for r in again} == {
        (r.doc_id, r.shard, r.position) for r in rows
    }


def test_epoch_shuffle_varies_by_epoch(spark):
    from fink_broker_spark.ext.pipeline import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    e1 = {(r.doc_id, r.shard, r.position)
          for r in epoch_shuffle(df, "doc_id", 1, 8).collect()}
    e2 = {(r.doc_id, r.shard, r.position)
          for r in epoch_shuffle(df, "doc_id", 2, 8).collect()}
    assert e1 != e2


def test_epoch_shuffle_window_is_sharded_not_global(spark):
    """The row_number window must partition on shard — a global ORDER BY
    would serialize the corpus through a single task at 100 TB."""
    from fink_broker_spark.ext.pipeline import epoch_shuffle

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = (
        epoch_shuffle(df, "doc_id", 1, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_weighted_sample_key_biases_by_weight(spark):
    """max-of-w-uniforms priority: items with weight 4 should win top-k
    slots ~4x as often as weight-1 items (statistical check), and the
    key must be deterministic across evaluations."""
    import pyspark.sql.functions as F

    from fink_broker_spark.ext.pipeline import weighted_sample_key_expr

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 4).otherwise(1).alias("w"),
    )
    keyed = df.withColumn(
        "p", weighted_sample_key_expr("id", "w", max_weight=8)
    )
    top = keyed.orderBy(F.col("p").desc(), "id").limit(400)
    heavy = top.filter(F.col("w") == 4).count()
    # expected heavy share = 4/5 = 320 of 400; allow generous noise
    assert 270 <= heavy <= 370, heavy
    # deterministic: second evaluation identical
    again = {
        r.id: r.p
        for r in df.withColumn(
            "p", weighted_sample_key_expr("id", "w", max_weight=8)
        ).collect()
    }
    first = {r.id: r.p for r in keyed.collect()}
    assert first == again
