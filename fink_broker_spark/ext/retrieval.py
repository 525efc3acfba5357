"""Sparse retrieval and data-selection operators over the documents table.

Training-data pipelines need more than dedup: they *select* — retrieve
the documents most relevant to a probe query (BM25, the lexical
workhorse behind RAG corpus construction) and resample a raw crawl
toward a target domain (DSIR-style importance weighting, Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").
Both are expressed as pure DataFrame plans: one tokenize+explode pass,
vocabulary-bounded aggregates, broadcast 1-row corpus statistics, and
TakeOrdered top-k — no UDFs, no driver-side state.

FP discipline (the oracle contract of this repo): every per-token
floating-point term is ``round(..., 9)``-ed and cast to
``decimal(18,9)`` BEFORE any sum, so aggregation is exact and
order-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_broker_spark.functions.text import tokens_expr

#: round scale applied to per-token log/score terms before decimal sums
_TERM_SCALE = 9
#: terminal output scale: coarse enough that a 1-ulp cross-engine ln()
#: divergence in one summand (≤1e-9 after the scale-9 round) cannot
#: move the quantized sum except within 1e-9 of a 0.5e-5 boundary
_OUT_SCALE = 5


def _dec(col):
    """Order-independent summand: round then fix the type."""
    return F.round(col, _TERM_SCALE).cast(f"decimal(18,{_TERM_SCALE})")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` retrieval for a literal term query.

    Plan shape (and why it scales):

    - ``tok`` — one LOGICAL tokenize+explode relation feeds both the
      length stats and the term frequencies. Physically Spark
      recomputes an uncached subtree per consuming branch (two scans /
      two tokenizes here); the production posture at 100 TB is to
      MATERIALIZE the tokenized relation once (write it, or persist
      within the job) and hang every consumer off it — the logical
      shape below is unchanged by that choice;
    - doc lengths + corpus stats — one groupBy(doc) aggregate, then a
      1-row global aggregate (``N``, ``avgdl``) that stays in the DAG
      and broadcasts (never ``.count()`` on the driver);
    - term frequencies — ``tok`` filtered to the query terms *before*
      its shuffle (an ``isin`` literal filter the scanner can push), so
      the tf aggregate only moves matching tokens;
    - document frequencies — bounded by ``len(query_terms)`` rows,
      broadcast back into the scorer;
    - final ``orderBy().limit(k)`` compiles to TakeOrderedAndProject.

    IDF uses the Robertson–Lucene form ``ln(1 + (N - n + 0.5)/(n + 0.5))``
    (always positive). Per-(doc, term) scores round to decimal before
    the per-doc sum — exact, order-independent, oracle-matchable.
    """
    terms = [t.lower() for t in query_terms]
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_expr(text_col)).alias("token")
    )
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = doclen.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tf = (
        tok.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            _dec(
                F.log(
                    F.lit(1.0)
                    + (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    F.col("tf").cast("double")
                    * F.lit(k1 + 1.0)
                    / (
                        F.col("tf").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b)
                            * F.col("dl").cast("double")
                            / (
                                F.col("total_len").cast("double")
                                / F.col("n_docs").cast("double")
                            )
                        )
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").cast("decimal(28,9)").alias("bm25_exact"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        # terminal coarse quantization: a 1-ulp JVM-vs-libm ln()
        # difference can straddle a 0.5e-9 boundary in ONE summand; the
        # scale-9 sums then differ by 1e-9. Rounding the exact decimal
        # sum to scale 5 absorbs that (decimal→decimal rounding is
        # half-away-from-zero in both engines — probe-verified), and
        # the top-k ranks by the coarse score with doc_id tiebreak.
        .select(
            "doc_id",
            F.round("bm25_exact", _OUT_SCALE)
            .cast(f"decimal(28,{_OUT_SCALE})")
            .alias("bm25"),
            "n_matched_terms",
        )
    )
    return scored.orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    ).limit(k)


def bm25_topk_oracle_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same op tree, same rounding)."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
  WHERE length(trim(lower(text))) > 0
),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM doclen),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
df_t AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         CAST(round(CAST(SUM(CAST(round(
             ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5))
             * (CAST(tf AS DOUBLE) * {k1 + 1.0}
                / (CAST(tf AS DOUBLE)
                   + {k1} * ({1.0 - b} + {b} * CAST(dl AS DOUBLE)
                             / (CAST(total_len AS DOUBLE)
                                / CAST(n_docs AS DOUBLE))))),
             9) AS DECIMAL(18,9))) AS DECIMAL(28,9)), {_OUT_SCALE})
           AS DECIMAL(28,{_OUT_SCALE})) AS bm25,
         count(*) AS n_matched_terms
  FROM tf JOIN df_t USING (token) JOIN doclen USING (doc_id), corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, bm25, n_matched_terms FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


def dsir_importance(
    docs: DataFrame,
    target_pred,
    k: int = 50,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights: rank out-of-target documents by
    how target-like their unigram distribution is.

    ``w(doc) = Σ_tokens log( p_target(tok) / p_raw(tok) )`` with
    add-``alpha`` smoothing over the shared vocabulary (the hashed
    n-gram buckets of the published method collapse to exact unigrams
    here so both engines agree bit-for-bit; the bucketing is a memory
    optimization, not a semantic one). High weight = looks like the
    target corpus ⇒ keep for resampling.

    Plan shape: one logical tokenize+explode relation feeds the counts
    aggregate and the scoring join; target and raw counts ride a SINGLE
    shuffle via ``count_if`` (vocabulary-bounded), corpus totals are a
    1-row broadcast, and the result is a TakeOrdered top-``k`` over
    out-of-target docs. As with BM25 above, Spark physically
    recomputes the uncached tok subtree per branch — materialize the
    tokenized relation once when the corpus is the cost. Per-token log
    ratios round to decimal before the per-doc sum (exact,
    order-independent).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(tokens_expr(text_col)).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if("is_target").alias("n_tgt"),
    )
    totals = counts.groupBy().agg(
        F.sum("n_raw").alias("t_raw"),
        F.sum("n_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    logratio = F.log(
        (F.col("n_tgt").cast("double") + F.lit(alpha))
        / (
            F.col("t_tgt").cast("double")
            + F.lit(alpha) * F.col("vocab").cast("double")
        )
    ) - F.log(
        (F.col("n_raw").cast("double") + F.lit(alpha))
        / (
            F.col("t_raw").cast("double")
            + F.lit(alpha) * F.col("vocab").cast("double")
        )
    )
    scored = (
        tok.filter(~F.col("is_target"))
        .join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", _dec(logratio).alias("lr"))
        .groupBy("doc_id")
        .agg(
            F.sum("lr").cast("decimal(28,9)").alias("imp_exact"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        # terminal coarse quantization against 1-ulp ln() divergence —
        # same defense as bm25_topk above
        .select(
            "doc_id",
            F.round("imp_exact", _OUT_SCALE)
            .cast(f"decimal(28,{_OUT_SCALE})")
            .alias("importance"),
            "n_tokens",
        )
    )
    return scored.orderBy(
        F.col("importance").desc(), F.col("doc_id")
    ).limit(k)


def dsir_importance_oracle_sql(
    target_sql_pred: str, k: int = 50, alpha: float = 0.5
) -> str:
    """DuckDB twin of :func:`dsir_importance`."""
    return rf"""
WITH tok AS (
  SELECT doc_id, ({target_sql_pred}) AS is_target,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
  WHERE length(trim(lower(text))) > 0
),
counts AS (
  SELECT token, count(*) AS n_raw,
         count(*) FILTER (is_target) AS n_tgt
  FROM tok GROUP BY token
),
totals AS (
  SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt, count(*) AS vocab
  FROM counts
),
scored AS (
  SELECT tok.doc_id,
         CAST(round(CAST(SUM(CAST(round(
             ln((CAST(n_tgt AS DOUBLE) + {alpha})
                / (CAST(t_tgt AS DOUBLE) + {alpha} * CAST(vocab AS DOUBLE)))
             - ln((CAST(n_raw AS DOUBLE) + {alpha})
                  / (CAST(t_raw AS DOUBLE) + {alpha} * CAST(vocab AS DOUBLE))),
             9) AS DECIMAL(18,9))) AS DECIMAL(28,9)), {_OUT_SCALE})
           AS DECIMAL(28,{_OUT_SCALE})) AS importance,
         count(*) AS n_tokens
  FROM tok JOIN counts USING (token), totals
  WHERE NOT is_target
  GROUP BY tok.doc_id
)
SELECT doc_id, importance, n_tokens FROM scored
ORDER BY importance DESC, doc_id
LIMIT {k}
"""
