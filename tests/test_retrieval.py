"""BM25 retrieval + DSIR importance: semantics on tiny hand-built
corpora (the oracle parity suite covers the real tables)."""

import math

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
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_hand_computed_score(spark):
    """One-doc-one-term case pinned against the closed-form formula."""
    docs = _docs(spark, [(1, "x y", "en"), (2, "y y", "en")])
    out = {r.doc_id: float(r.bm25) for r in bm25_topk(docs, ["x"], k=10).collect()}
    # N=2, df=1, dl=2, avgdl=2, tf=1, k1=1.2, b=0.75
    idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    tf_term = 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 2 / 2))
    # scores quantize to scale 5 terminally (cross-engine ln defense)
    assert out[1] == pytest.approx(idf * tf_term, abs=1e-5)
    assert 2 not in out


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (b=0.75 length penalty)."""
    docs = _docs(
        spark,
        [(1, "cat " + "filler " * 40, "en"), (2, "cat pad", "en")],
    )
    out = {r.doc_id: float(r.bm25) for r in bm25_topk(docs, ["cat"], k=10).collect()}
    assert out[2] > out[1]


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
    w = {r.doc_id: float(r.importance) for r in out}
    assert w[10] > w[11]


def test_dsir_importance_is_mean_invariant_check(spark):
    """Weights are per-token sums: a doc repeated-token variant scores
    proportionally (2× tokens → 2× importance for identical tokens)."""
    docs = _docs(
        spark,
        [
            (1, "cat cat cat cat", "en"),
            (10, "cat", "fr"),
            (11, "cat cat", "fr"),
        ],
    )
    out = {
        r.doc_id: (float(r.importance), r.n_tokens)
        for r in dsir_importance(docs, F.col("lang") == "en", k=10).collect()
    }
    (w1, n1), (w2, n2) = out[10], out[11]
    assert n1 == 1 and n2 == 2
    assert w2 == pytest.approx(2 * w1, rel=1e-9)
