"""BM25 retrieval + DSIR importance: semantics on tiny hand-built
corpora (the oracle parity suite covers the real tables).

Round 6: both scorers became transcendental-free (exact integer
fixed-point, ``score × 10^9`` as BIGINT) after the ln()-based forms
hash-split on the external driver two rounds running — the hand
computations below pin the exact rational trees."""

import pytest
from pyspark.sql import functions as F

from fink_broker_spark.ext.retrieval import bm25_topk, dsir_importance


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bm25_ranks_tf_and_rarity(spark):
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog", "en"),
            (2, "cat dog", "en"),
            (3, "dog dog dog dog", "en"),
            (4, "bird bird bird", "en"),
        ],
    )
    out = bm25_topk(docs, ["cat"], k=10).collect()
    # only docs containing 'cat' score; higher tf ranks first
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].bm25_scaled9 > out[1].bm25_scaled9 > 0


def test_bm25_hand_computed_score(spark):
    """One-doc-one-term case pinned against the closed-form rational.

    N=2 docs, T=4 tokens, df=1, dl=2, tf=1, k1=1.2, b=0.75:
    idf_ratio = (2N+2)/(2df+1) = 6/3 = 2
    tf_norm   = 2.2·1 / (1 + 1.2·(0.25 + 0.75·(2 / (4/2)))) = 2.2/2.2 = 1
    score     = 2.0 exactly → 2_000_000_000 at scale 9.
    """
    docs = _docs(spark, [(1, "x y", "en"), (2, "y y", "en")])
    out = {
        r.doc_id: r.bm25_scaled9
        for r in bm25_topk(docs, ["x"], k=10).collect()
    }
    assert out[1] == 2_000_000_000
    assert 2 not in out


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (b=0.75 length penalty)."""
    docs = _docs(
        spark,
        [(1, "cat " + "filler " * 40, "en"), (2, "cat pad", "en")],
    )
    out = {
        r.doc_id: r.bm25_scaled9
        for r in bm25_topk(docs, ["cat"], k=10).collect()
    }
    assert out[2] > out[1]


def test_bm25_integer_output_types(spark):
    """The scaled score and its companions are plain BIGINTs — the
    whole point of the round-6 rewrite (no doubles in the hashed
    output, no HUGEINT on the oracle side)."""
    docs = _docs(spark, [(1, "cat dog", "en")])
    schema = {
        f.name: f.dataType.simpleString()
        for f in bm25_topk(docs, ["cat"], k=5).schema.fields
    }
    assert schema == {
        "doc_id": "bigint",
        "bm25_scaled9": "bigint",
        "n_matched_terms": "bigint",
    }


def test_bm25_plan_shape(spark):
    """Top-k compiles to TakeOrderedAndProject; the corpus-stats and
    df relations broadcast — the corpus-side relation never sorts
    globally."""
    docs = _docs(spark, [(i, f"w{i} cat", "en") for i in range(100)])
    plan = (
        bm25_topk(docs, ["cat"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_dsir_prefers_target_like_documents(spark):
    """Non-target docs sharing the target's vocabulary outrank docs
    with out-of-target vocabulary."""
    docs = _docs(
        spark,
        [
            # target corpus: talks about cats
            (1, "cat cat feline cat", "en"),
            (2, "cat feline purr", "en"),
            # non-target: doc 10 target-like, doc 11 not
            (10, "cat feline", "fr"),
            (11, "voiture route", "fr"),
        ],
    )
    out = dsir_importance(docs, F.col("lang") == "en", k=10).collect()
    ids = [r.doc_id for r in out]
    assert set(ids) == {10, 11}  # only non-target docs are candidates
    w = {r.doc_id: r.importance_scaled9 for r in out}
    assert w[10] > w[11]


def test_dsir_importance_is_per_token_sum(spark):
    """Weights are per-token-occurrence sums: doubling a doc's tokens
    doubles its importance EXACTLY (integer arithmetic — no approx)."""
    docs = _docs(
        spark,
        [
            (1, "cat cat cat cat", "en"),
            (10, "cat", "fr"),
            (11, "cat cat", "fr"),
        ],
    )
    out = {
        r.doc_id: (r.importance_scaled9, r.n_tokens)
        for r in dsir_importance(docs, F.col("lang") == "en", k=10).collect()
    }
    (w1, n1), (w2, n2) = out[10], out[11]
    assert n1 == 1 and n2 == 2
    assert w2 == 2 * w1


def test_dsir_hand_computed_ratio(spark):
    """Single shared token, alpha=1/2: r = (2·n_tgt+1)(2·t_raw+V)
    / ((2·n_raw+1)(2·t_tgt+V)).  Corpus: target 'cat cat', non-target
    'cat' → V=1, t_raw=3, t_tgt=2, n_raw=3, n_tgt=2.
    r = (5·7)/(7·5) = 1 exactly → 10^9."""
    docs = _docs(spark, [(1, "cat cat", "en"), (10, "cat", "fr")])
    out = {
        r.doc_id: r.importance_scaled9
        for r in dsir_importance(docs, F.col("lang") == "en", k=10).collect()
    }
    assert out[10] == 1_000_000_000
