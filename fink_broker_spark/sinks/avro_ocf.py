"""Avro Object Container Files, jar-free — the Avro *file* path.

The reference extracts schemas by writing 1-row Avro files through the
spark-avro datasource (``bin/ztf/save_distribution_schema.py:76-89``)
and scans Avro datasets with ``spark.read.format("avro")``
(``common/spark_utils.py:449-487``); both need the jar. With the binary
codec (:mod:`fink_broker_spark.schema.avro_codec`) in hand, the file
container itself is small public spec (Apache Avro 1.11.x, "Object
Container Files"):

    magic ``Obj\\x01`` · file-metadata map (``avro.schema`` JSON,
    ``avro.codec``) · 16-byte sync marker · blocks of
    (row-count, byte-length, payload, sync marker)

Writing is partition-parallel: each task encodes its rows into ONE
``part-N.avro`` under the target directory via ``mapInPandas`` (bytes
never leave the executor; the driver only collects one (file, rows)
row per task — same bounded-egress shape as the DataSource writer's
commit messages). Reading lists files driver-side (header is ~100
bytes: schema only), then decodes blocks executor-side with one
``binaryFile``-scan ``mapInPandas``. Files produced here open in any
conformant Avro tool, and the jar-gated test in
``tests/test_avro_wire.py`` proves native interop automatically when
spark-avro is on the classpath.

100 TB note: one block per 4,096 rows keeps per-batch memory flat;
sync markers are deterministic (xxhash-style mix of the partition id)
so re-runs are byte-identical — the property every artifact in this
engine keeps for the oracle discipline.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fink_broker_spark.schema.avro_codec import (
    _pythonize,
    _read_long,
    _write_long,
    decode,
    encode,
)

MAGIC = b"Obj\x01"
_BLOCK_ROWS = 4096


def _sync_marker(pid: int) -> bytes:
    x = (pid * 0x9E3779B97F4A7C15 + 0xC2B2AE3D27D4EB4F) & (2**64 - 1)
    return struct.pack("<QQ", x, x ^ 0xA5A5A5A5A5A5A5A5)


def _write_header(out: bytearray, avsc: dict, sync: bytes) -> None:
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(avsc).encode(),
        "avro.codec": b"null",
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync


def read_header(blob: bytes) -> tuple[dict, bytes, int]:
    """(avsc, sync_marker, payload_offset) from an OCF prefix."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(blob, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(blob, pos)
            n = -n
        for _ in range(n):
            klen, pos = _read_long(blob, pos)
            k = blob[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _read_long(blob, pos)
            meta[k] = blob[pos : pos + vlen]
            pos += vlen
    sync = blob[pos : pos + 16]
    return json.loads(meta["avro.schema"]), sync, pos + 16


def write_avro_ocf(df: DataFrame, path: str) -> list[tuple[str, int]]:
    """Write ``df`` as one ``part-N.avro`` OCF per partition.

    Returns the bounded (filename, rows) manifest (one row per task).
    """
    from fink_broker_spark.schema.avro_schema import spark_schema_to_avsc

    avsc = spark_schema_to_avsc(df.schema)
    cols = df.columns
    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = _sync_marker(pid)
        out = bytearray()
        _write_header(out, avsc, sync)
        n_total = 0
        block: list[bytes] = []

        def _flush():
            nonlocal block
            if not block:
                return
            _write_long(out, len(block))
            payload = b"".join(block)
            _write_long(out, len(payload))
            out.extend(payload)
            out.extend(sync)
            block = []

        for pdf in batches:
            for row in pdf[cols].itertuples(index=False, name=None):
                block.append(
                    encode(avsc, _pythonize(dict(zip(cols, row))))
                )
                n_total += 1
                if len(block) >= _BLOCK_ROWS:
                    _flush()
        _flush()
        fname = f"part-{pid:05d}.avro"
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(bytes(out))
        yield pd.DataFrame({"file": [fname], "rows": [n_total]})

    manifest = df.mapInPandas(_write, "file string, rows long").collect()
    return sorted((r.file, r.rows) for r in manifest)


def read_avro_ocf(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of OCF files back into a DataFrame.

    Schema comes from ONE file header read driver-side (~100 bytes);
    block decode runs executor-side over a ``binaryFile`` scan, one
    task per file.
    """
    from fink_broker_spark.schema.avro_schema import avsc_to_spark_schema

    files = sorted(
        f for f in os.listdir(path) if f.endswith(".avro")
    )
    if not files:
        raise ValueError(f"no .avro files under {path}")
    with open(os.path.join(path, files[0]), "rb") as fh:
        head = fh.read(1 << 20)
    avsc, _, _ = read_header(head)
    schema = avsc_to_spark_schema(avsc)
    names = [f.name for f in schema.fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                blob = bytes(blob)
                favsc, sync, pos = read_header(blob)
                rows = []
                while pos < len(blob):
                    cnt, pos = _read_long(blob, pos)
                    if cnt < 0:
                        cnt = -cnt
                    blen, pos = _read_long(blob, pos)
                    end = pos + blen
                    for _ in range(cnt):
                        rec, pos = decode(favsc, blob, pos)
                        rows.append(rec)
                    assert pos == end, "corrupt block"
                    assert blob[pos : pos + 16] == sync, "bad sync marker"
                    pos += 16
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                )

    scan = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    )
    return scan.select("content").mapInPandas(_decode, schema)
