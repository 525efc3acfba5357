"""Document deduplication families for training-data curation.

Extends the reference's two in-repo dedup idioms — exact
``dropDuplicates`` (``ztf/tracklet_identification.py:329``) and window
last-per-key (``rubin/hbase_utils.py:677-691``) — with the standard
web-corpus near-dup stack:

- exact (content-hash groupBy)
- n-gram Jaccard (shingle self-join)
- MinHash + LSH banding (shingle → minhash signature → band bucket join)
- SimHash (hamming-ball pairs via band join + ``bit_count``)
- embedding-cosine near-dup (see :mod:`fink_broker_spark.ext.ann`)

All are pure DataFrame compositions: signatures are per-row HOF
expressions in codegen; candidate generation is an equi-join on bucket
keys, so shuffle volume scales with collisions, never |docs|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_broker_spark.functions.text import fingerprint_expr, shingles_expr
from fink_broker_spark.functions.vector import cosine_expr


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content fingerprint; deterministic keep-min-id.

    Returns (fingerprint, keep_id, dup_count). One hash shuffle on the
    16-byte fingerprint — at 100 TB this is the cheapest possible dedup
    (map-side partial min/count, no text moves through the shuffle).
    """
    return (
        docs.select(fingerprint_expr(text_col).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingle_table(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by word-``n``-shingle Jaccard similarity ≥ threshold.

    shingle → explode → self-equi-join on shingle (id_a < id_b) →
    intersection counts → ``|A∩B| / (|A| + |B| − |A∩B|)``. The join is a
    hash join on the shingle string; a hot shingle (stopword run) fans out
    quadratically, so production runs should drop top-frequency shingles
    first (df-style pruning) — at test scale the vocabulary is selective.
    """
    sh = _shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("nsh_a")),
            on="id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nsh_b")),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("nsh_a") + F.col("nsh_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "nsh_a", "nsh_b", "jaccard")


def minhash_signature_expr(shingle_col, num_hashes: int = 32):
    """MinHash signature as ``array<bigint>`` — per-row, no explode.

    ``sig[i] = min over shingles of xxhash64(i, shingle)``; the hash family
    is indexed by a literal seed column, the min is an ``array_min`` over a
    ``transform`` — everything stays in codegen.

    Takes a *materialized* shingle-array column (not the raw text): HOF
    lambdas defeat common-subexpression elimination, so inlining the
    shingle expression ``num_hashes`` times would re-tokenize the document
    per hash function.
    """
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    nbands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs.

    Signature rows are split into ``nbands`` bands of ``num_hashes/nbands``
    values; documents colliding in ≥1 band are candidates (MMDS ch.3
    banding: P[candidate] = 1 − (1 − j^r)^b for Jaccard j). With
    ``verify=True`` candidates are confirmed with the exact shingle
    Jaccard, so the output equals :func:`jaccard_pairs` minus LSH misses.

    Scale shape: |docs| × nbands rows shuffle on (band, band-hash) — linear
    in corpus size; only colliding buckets pay a pairwise cost.
    """
    rows_per_band = num_hashes // nbands
    # Signature via explode + groupBy-min: the shingle set is computed ONCE
    # (Catalyst's projection collapse would re-inline a shingle expression
    # into every per-row HOF hash, re-tokenizing the document num_hashes
    # times); the min-hash aggregation is map-side partial, so the shuffle
    # carries ≤ num_hashes longs per (partition, doc).
    sh = _shingle_table(docs, id_col, text_col, n)
    sig = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"__h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
            ).alias("bhash"),
        )
        for b in range(nbands)
    ]
    bt = sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )
    cands = (
        bt.alias("x")
        .join(bt.alias("y"), on=["band", "bhash"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cands
    exact = jaccard_pairs(docs, threshold, n, id_col, text_col)
    return cands.join(exact, on=["id_a", "id_b"]).select(
        "id_a", "id_b", "jaccard"
    )


def simhash_expr(hash_col, nbits: int = 64):
    """SimHash from a *materialized* feature-hash array column → signed long.

    Classic Charikar construction: per bit b, sum ±1 over feature hashes'
    bit b; bit set iff the sum is positive. Bit positions are Python-level
    literals (``shiftright`` requires a static shift), so the expression is
    a flat OR of 64 per-bit aggregates over the named hash column — all
    per-row, in codegen, no shuffle.
    """
    hashes = F.col(hash_col) if isinstance(hash_col, str) else hash_col

    def _vote(bit: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    out = F.lit(0).cast("bigint")
    for b in range(nbits):
        vote = _vote(b)
        out = out.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return out


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    nbits: int = 64,
    n: int = 2,
    nbands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit simhash into ``nbands`` bit
    bands; by pigeonhole, any pair within hamming ≤ nbands−1 collides in
    ≥1 band (exact recall for max_hamming < nbands). Verification:
    ``bit_count(a XOR b)``.
    """
    rows_per_band = nbits // nbands
    base = (
        docs.select(F.col(id_col), shingles_expr(text_col, n).alias("__sh"))
        .withColumn("__h", F.transform("__sh", lambda s: F.xxhash64(s)))
        .select(F.col(id_col), simhash_expr("__h", nbits).alias("simhash"))
    )
    # static shifts per band (shiftright needs a literal shift amount)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * rows_per_band)
                .bitwiseAND(F.lit((1 << rows_per_band) - 1))
                .alias("bkey"),
            )
            for b in range(nbands)
        ]
    )
    bt = base.select(id_col, "simhash", F.explode(bands).alias("bb")).select(
        id_col,
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.bkey").alias("bkey"),
    )
    x, y = bt.alias("x"), bt.alias("y")
    return (
        x.join(y, on=["band", "bkey"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, pairwise).

    Quadratic — correctness baseline for small corpora. The scale path is
    :func:`fink_broker_spark.ext.ann.lsh_topk`-style bucketing before
    scoring.
    """
    from fink_broker_spark.functions.vector import dot_expr, norm2_expr

    # norms are per-vector: compute them BELOW the join (n + m sqrt's), so
    # each of the O(n·m) pair rows pays only one dot product
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.sqrt(norm2_expr(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.sqrt(norm2_expr(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot_expr("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
