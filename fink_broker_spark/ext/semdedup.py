"""SemDeDup-style semantic deduplication over an embedding column.

Method (public: Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
k-means partition the embedding space, then *within each cluster* drop
every item whose cosine similarity to an already-kept item exceeds a
threshold. Unlike exact/MinHash dedup (``ext/dedup.py``), this removes
*semantic* duplicates — paraphrases, re-encodings, templated variants —
that share no tokens.

Engine shape (100 TB posture):

- centroids are a driver-side **model** fit on a bounded sample
  (:func:`fink_broker_spark.ext.ann.kmeans_centroids` — deterministic
  TakeOrderedAndProject draw, Lloyd in numpy; same class of driver
  state as a broadcast dim table);
- cluster assignment is a pure **column expression** over the scan
  (centroid literals compiled into the plan — no shuffle, no Python);
- the ONLY shuffle is the ``groupBy(cluster, chunk)`` that co-locates
  each cluster for the greedy pass;
- per-cluster work is O(|c|² · d) BLAS. Memory and quadratic blow-up
  are bounded by ``chunks``: with ``chunks > 1`` each cluster splits
  into deterministic id-hash chunks deduplicated independently — the
  same locality restriction SemDeDup itself makes at the cluster
  level (cross-chunk near-dup pairs are missed; the paper's point is
  that k-means makes cross-boundary pairs rare). Size ``chunks`` so
  ``|cluster| / chunks × dim × 8 B`` fits an executor task.

Greedy keep rule (deterministic): scan cluster members in ascending
id order; keep a member iff its cosine similarity to every
previously-KEPT member is below ``threshold``. First occurrence (by
id) of any duplicate set is always kept, so re-runs are bit-stable —
the property the oracle discipline needs. ``tests/test_ext.py``
asserts exact equivalence against an independent brute-force of the
same rule, plus the two structural invariants (every dropped item has
a kept witness ≥ threshold; kept items are pairwise < threshold
within a chunk).

The reference has no semantic-dedup counterpart; this is
training-data-pipeline surface (SURVEY.md §2.13).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from fink_broker_spark.ext.ann import _cell_ranking_expr, kmeans_centroids

_OUT_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("cluster", IntegerType()),
        StructField("keep", BooleanType()),
    ]
)


def _leader_dedup(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Greedy leader pass over ONE (cluster, chunk) group, ascending id.

    Incremental BLAS: the kept set lives in a preallocated (n, d)
    matrix; each candidate costs one matvec against the kept prefix —
    O(k·d) — so the whole group is O(n·k·d) with k = kept count, never
    a materialized n×n similarity matrix.
    """
    pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    xn = x / norms[:, None]
    n = len(xn)
    kept = np.empty_like(xn)
    nkept = 0
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        if nkept == 0 or float(np.max(kept[:nkept] @ xn[i])) < threshold:
            kept[nkept] = xn[i]
            nkept += 1
            keep[i] = True
    return pd.DataFrame(
        {
            "vec_id": pdf["vec_id"].astype("int64"),
            "cluster": pdf["cluster"].astype("int32"),
            "keep": keep,
        }
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    chunks: int = 1,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Per-item keep/drop decisions: ``(vec_id, cluster, keep)``.

    ``centroids`` may be passed to reuse a prefit model across corpora
    (fit once, dedup many — the production pattern shared with
    :func:`~fink_broker_spark.ext.ann.ivf_topk`).
    """
    if centroids is None:
        centroids = kmeans_centroids(
            corpus,
            nlist,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
            seed=seed,
        )
    assigned = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _cell_ranking_expr(vec_col, centroids)[0]["cell"]
        .cast("int")
        .alias("cluster"),
    )
    if chunks > 1:
        # deterministic id-hash sub-chunks bound per-task memory; the
        # salt decorrelates from upstream xxhash64 id assignment
        assigned = assigned.withColumn(
            "chunk",
            F.pmod(
                F.xxhash64(
                    F.concat(F.col("vec_id").cast("string"),
                             F.lit("#semdedup"))
                ),
                F.lit(chunks),
            ).cast("int"),
        )
        keys = ["cluster", "chunk"]
    else:
        assigned = assigned.withColumn("chunk", F.lit(0))
        keys = ["cluster"]
    thr = float(threshold)
    return assigned.groupBy(*keys).applyInPandas(
        lambda pdf: _leader_dedup(pdf, thr), schema=_OUT_SCHEMA
    )
