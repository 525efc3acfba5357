"""Distributed PCA over an embedding column.

Dimensionality reduction before similarity search — whitening 768-dim
embeddings down to 64 keeps ANN recall while cutting index size and
dot-product cost ~10×. The 100 TB shape is the classic two-phase
moment aggregation:

1. one ``mapInPandas`` pass emits per-batch moment partials
   ``(count, sum-vector, Gram matrix)`` — each partial is a fixed
   ``O(d²)`` payload (64 KB at d=64) regardless of row count, so the
   driver reduce touches megabytes, never the corpus;
2. the covariance eigendecomposition runs on the driver (a ``d×d``
   problem — a *model* fit, same class as the IVF k-means centroids);
3. projection back over the corpus is a vectorized pandas UDF matmul —
   one scan, no shuffle.

No counterpart in the reference (its embeddings live downstream in
fink-science); this is part of the engine's training-data extension
surface next to ``ext/ann.py``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from fink_broker_spark.ext.ann import EmptyCorpusError
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def fit_pca_model(
    corpus: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit the PCA model: mean vector + top-``k`` components.

    Returns ``{"mean": (d,), "components": (k, d), "explained": (k,)}``
    with components ordered by decreasing variance and a deterministic
    sign convention (largest-|coefficient| entry positive), so repeated
    fits over the same data are identical.
    """

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if not len(x):
                continue
            n += len(x)
            s = x.sum(axis=0) + (s if s is not None else 0.0)
            g = x.T @ x + (g if g is not None else 0.0)
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.ravel().tolist()],
                }
            )

    from fink_broker_spark.ext.ann import well_formed_vectors

    # the moment kernel's np.array crashes on NULL arrays / NULL
    # elements (nullemb driftlab layout) — fit over the well-formed
    # domain, like every other embedding model fit
    partials = (
        well_formed_vectors(corpus, vec_col)
        .select(vec_col)
        .mapInPandas(
            moments, "n bigint, s array<double>, g array<double>"
        )
        .collect()
    )
    if not partials:
        raise EmptyCorpusError("fit_pca_model: empty corpus")
    n = sum(p["n"] for p in partials)
    s = np.sum([np.asarray(p["s"]) for p in partials], axis=0)
    d = len(s)
    if not 1 <= k <= d:
        raise ValueError(
            f"fit_pca_model: k={k} out of range for {d}-dim embeddings"
        )
    g = np.sum(
        [np.asarray(p["g"]).reshape(d, d) for p in partials], axis=0
    )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    components = eigvec[:, order].T  # (k, d)
    # deterministic sign: make each component's largest-|coeff| positive
    for i in range(len(components)):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    return {
        "mean": mean,
        "components": components,
        "explained": np.maximum(eigval[order], 0.0),
    }


def project_expr(model: dict, vec_col: str = "embedding") -> Column:
    """Vectorized projection UDF call: ``array<double>`` of length k.

    The model rides into executors via closure capture (a few KB) and
    each Arrow batch is one ``(rows × d) @ (d × k)`` BLAS matmul.
    """
    mean = model["mean"]
    comps = model["components"].T  # (d, k)

    @pandas_udf("array<double>")
    def _project(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        out = (x - mean) @ comps
        return pd.Series(out.tolist())

    return _project(F.col(vec_col))


def pca_project(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
    model: dict | None = None,
) -> DataFrame:
    """Corpus + a ``out_col`` array column of top-``k`` PCA coordinates.
    Pass a prefit ``model`` to reuse across batches (fit once, project
    many — the same pattern as the IVF centroids)."""
    from fink_broker_spark.ext.ann import well_formed_vectors

    if model is None:
        model = fit_pca_model(corpus, k, vec_col)
    # projection shares the fit's well-formed domain: the pandas-UDF
    # np.array would crash on a NULL array / NULL element row
    return well_formed_vectors(corpus, vec_col).withColumn(
        out_col, project_expr(model, vec_col)
    )
