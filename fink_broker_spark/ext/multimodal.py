"""Multimodal (binary) columns: cutout/image/audio plumbing.

The reference carries image cutouts as binary-bearing structs
(``cutoutScience/Template/Difference`` with ``stampData: binary``,
``bin/ztf/distribute.py:89-95``, ``bin/ztf/archive_hostless.py:116-118``)
and runs per-stamp analysis in pandas UDFs. Generalized here to opaque
``binary`` payload columns + typed metadata, with feature extraction via
``mapInPandas`` (Arrow-batched, schema-stable).

The actual decoders (PIL/ffmpeg/…) are NOT available in this container:
``decode_stub`` is a clearly-marked deterministic fake so the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested;
swap ``_extract_features`` for a real decoder in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature extractor — stable regardless of decoder.
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def pack_media(df: DataFrame, id_col: str, payload: Column, kind: str) -> DataFrame:
    """Wrap a binary payload with typed metadata — the engine's multimodal
    column convention (mirrors the cutout struct shape)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.struct(
            payload.alias("data"),
            F.length(payload).alias("n_bytes"),
            F.lit(kind).alias("kind"),
        ).alias("media"),
    )


def _extract_features(data: bytes, dim: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the payload hash.

    Replace with a real decode (image resize / audio frames / video
    sampling) in production — the surrounding plumbing is unchanged.
    """
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def extract_features(media_df: DataFrame, dim: int = 8) -> DataFrame:
    """``mapInPandas`` feature extraction over packed media rows.

    Batch shape: the iterator yields Arrow batches; binary payloads stay
    off the driver and are decoded worker-side, one batch at a time —
    the pattern that holds at 100 TB of image bytes (payloads never
    concentrate; partition count follows the scan).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = pdf["media"].map(lambda m: bytes(m["data"]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": datas.map(len).astype("int32"),
                    "content_sha256": datas.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": datas.map(
                        lambda b: _extract_features(b, dim).tolist()
                    ),
                }
            )

    return media_df.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", StructType([
            StructField("data", StringType(), False),
            StructField("n_bytes", IntegerType()),
            StructField("kind", StringType()),
        ])),
    ]
)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one packed media row → ``n_frames`` evenly-spaced
    frame rows (video → stills; audio → windows).

    STUB decoder: frames are equal byte-slices of the payload (a real
    container parser drops in at ``_slice``); the row-explosion shape —
    output rows = input × n_frames, payload bytes split worker-side,
    never collected — is the real 100 TB contract.
    """

    def _slice(data: bytes, i: int) -> bytes:
        step = max(1, len(data) // n_frames)
        return data[i * step : (i + 1) * step] or data[-step:]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame": []}
            for mid, media in zip(pdf["media_id"], pdf["media"]):
                data = bytes(media["data"])
                for i in range(n_frames):
                    piece = _slice(data, i)
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame"].append(
                        {
                            "data": piece.hex(),
                            "n_bytes": len(piece),
                            "kind": f"{media['kind']}:frame",
                        }
                    )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(fn, FRAME_SCHEMA)


def resize_stub(media_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize/transcode plumbing: payload → smaller payload, metadata
    updated, schema stable. STUB: deterministic byte-decimation (a real
    image resize drops in unchanged)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(m):
                data = bytes(m["data"])
                step = max(1, len(data) // target_bytes)
                small = data[::step][:target_bytes]
                return {
                    "data": small.hex(),
                    "n_bytes": len(small),
                    "kind": f"{m['kind']}:resized",
                }

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_index": np.zeros(len(pdf), dtype="int32"),
                    "frame": pdf["media"].map(shrink),
                }
            )

    return media_df.mapInPandas(fn, FRAME_SCHEMA)


def extract_features_arrow(media_df: DataFrame, dim: int = 8) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: identical output
    (same stub decoder), but the batch iterator yields
    ``pyarrow.RecordBatch`` directly — binary payloads arrive as Arrow
    buffers without the pandas object-boxing round trip (each payload
    byte-string materialized as a Python object in a pandas column).

    For wide binary columns this is the faster Python boundary: the
    payload bytes are sliced straight out of the Arrow buffer. Measured
    against the pandas path in SCALING.md ("Arrow vs pandas boundary for
    binary payloads")."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            media = batch.column(batch.schema.get_field_index("media"))
            datas = [
                m["data"].as_py() for m in media
            ]
            ids = batch.column(
                batch.schema.get_field_index("media_id")
            ).to_pylist()
            feats = [
                _extract_features(b, dim).tolist() for b in datas
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([len(b) for b in datas], type=pa.int32()),
                    pa.array(
                        [hashlib.sha256(b).hexdigest() for b in datas],
                        type=pa.string(),
                    ),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["media_id", "n_bytes", "content_sha256", "features"],
            )

    return media_df.mapInArrow(fn, FEATURE_SCHEMA)
