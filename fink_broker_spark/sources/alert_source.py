"""Custom alert source as a Spark 4 Python DataSource.

The reference's ingest front door is a bespoke packet stream consumed by
a dedicated service (``bin/ztf/stream2raw.py:48-184``); its test rig
replays canned packets from disk. The modern Spark-first expression of
"my telescope's packet format" is the Python DataSource API: the format
plugs into ``spark.read.format(...)`` like parquet or kafka, planning
returns one ``InputPartition`` per requested split so generation runs
executor-side and partition-parallel — the driver never materializes a
row — and options carry the knobs a reader service would expose.

This implementation is a deterministic alert replay generator (same
schema as the synthetic events lake): seed + row id fully determine
every field, so tests can assert exact content, and two reads of the
same options are bit-identical — the property the oracle discipline
needs from any source.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EVENT_TYPES = ("click", "signup", "purchase", "error", "view")
#: 2024-01-01T00:00:00Z in epoch seconds.
_EPOCH_2024_S = 1_704_067_200


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic, seedable, executor-safe
    (no RNG object state to serialize)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class AlertReplayReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = max(1, -(-self.rows // self.nparts))  # ceil division
        return [
            _Slice(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        import datetime

        for i in range(partition.start, partition.end):
            h = _mix(i ^ (partition.seed << 32))
            ts = datetime.datetime.fromtimestamp(
                _EPOCH_2024_S + (h % 2_592_000), tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            yield (
                i,
                ts,
                h % 1000,
                _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
                ((h >> 16) % 1_000_000) / 1000.0,
                '{"replay":true}',
            )


class AlertReplayStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch replay: offsets are plain row indices, each trigger
    serves up to ``rows_per_batch`` rows, exhausting at ``rows`` — the
    bounded-drain analog of the reference's ``maxOffsetsPerTrigger``
    backpressure on its Kafka consumer. Offsets are a dict (checkpoint-
    JSON-serializable) so restart-from-checkpoint resumes mid-replay."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 250))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"idx": 0}

    def _gen(self, start: int, end: int) -> list:
        # materialized: Spark's prefetch cache copy.copy()s the returned
        # iterator, which works for list iterators but not generators
        part = _Slice(start, end, self.seed)
        return list(AlertReplayReader({"seed": str(self.seed)}).read(part))

    def read(self, start):
        lo = int(start["idx"])
        hi = min(lo + self.per_batch, self.rows)
        return iter(self._gen(lo, hi)), {"idx": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._gen(int(start["idx"]), int(end["idx"])))


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: which file this task produced (picklable)."""

    def __init__(self, filename: str, count: int):
        self.filename = filename
        self.count = count


MANIFEST_NAME = "_MANIFEST.json"


def _write_jsonl_task(path: str, iterator) -> _FileCommit:
    """Shared per-task body for both writer halves: one
    attempt-id-unique JSONL file per task, rows ISO-8601-normalized."""
    import json
    import os

    from pyspark import TaskContext

    ctx = TaskContext.get()
    fname = f"part-r{ctx.partitionId():05d}-t{ctx.taskAttemptId()}.jsonl"
    os.makedirs(path, exist_ok=True)
    n = 0
    with open(os.path.join(path, fname), "w") as fh:
        for row in iterator:
            d = row.asDict()
            for k, v in d.items():
                if hasattr(v, "isoformat"):
                    d[k] = v.isoformat()
            fh.write(json.dumps(d, sort_keys=True) + "\n")
            n += 1
    return _FileCommit(fname, n)


def _publish_manifest(path: str, manifest_name: str, messages) -> None:
    """Atomic driver-side manifest publish (old-or-new, never torn)."""
    import json
    import os

    committed = sorted((m.filename, m.count) for m in messages if m is not None)
    doc = {
        "files": [{"file": f, "rows": n} for f, n in committed],
        "total_rows": sum(n for _, n in committed),
    }
    tmp = os.path.join(path, manifest_name + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh, sort_keys=True)
    os.replace(tmp, os.path.join(path, manifest_name))


class AlertArchiveWriter(DataSourceWriter):
    """Manifest-committed JSON-lines archive writer — the write half of
    the custom format, exactly-once via the classic manifest protocol:

    - each task writes ``part-r<partition>-t<taskAttempt>.jsonl`` (the
      attempt id makes speculative/retried attempts collide-free);
    - ``commit`` (driver, only if ALL tasks succeeded) atomically
      publishes ``_MANIFEST.json`` naming exactly the committed files —
      readers that go through the manifest never observe files from
      failed/speculative attempts (orphans are invisible, not deleted);
    - ``abort`` best-effort deletes the named files and never writes a
      manifest, so a failed job leaves the previous archive state
      readable.

    This mirrors the reference's chunked-ingest contract (partial night
    directories must never be picked up by downstream,
    ``bin/ztf/stream2raw.py`` wait-for-complete-night) expressed as a
    Spark 4 Python DataSource writer. Timestamps serialize as ISO-8601;
    the manifest carries per-file row counts so downstream sizing
    (stats-driven compaction, ``sinks/parquet.py``) reads one small
    JSON instead of listing+footers.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("alert_replay writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        return _write_jsonl_task(self.path, iterator)

    def commit(self, messages):
        _publish_manifest(self.path, MANIFEST_NAME, messages)

    def abort(self, messages):
        import contextlib
        import os

        for m in messages:
            if m is not None:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.path, m.filename))


class AlertArchiveStreamWriter(DataSourceStreamWriter):
    """Streaming half of the archive writer: one manifest PER
    MICROBATCH (``_MANIFEST-batch-<id>.json``).

    Exactly-once across restarts comes from idempotent re-commit: when
    a batch replays after a checkpoint-recovered restart, ``commit``
    for the same ``batchId`` atomically *replaces* that batch's
    manifest with the replay's file list — the first attempt's files
    become invisible orphans, and manifest-scoped readers
    (:func:`read_stream_archive`) never double-count. This is the same
    idempotent-sink contract as the ``foreachBatch`` parquet sink
    (``sinks/parquet.py``: batch_id dynamic-partition overwrite),
    expressed through the Python DataSource API so
    ``df.writeStream.format("alert_replay")`` works end to end.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("alert_replay stream writer requires a path")

    def write(self, iterator):
        return _write_jsonl_task(self.path, iterator)

    def commit(self, messages, batchId):
        _publish_manifest(
            self.path, f"_MANIFEST-batch-{batchId:05d}.json", messages
        )

    def abort(self, messages, batchId):
        import contextlib
        import os

        for m in messages:
            if m is not None:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.path, m.filename))


def read_stream_archive(spark, path: str, schema=None, upto_batch=None):
    """Union of all committed microbatch manifests (exactly-once view:
    one manifest per batch id, orphans from failed/replayed attempts
    excluded). ``schema`` defaults to the raw alert schema; pass the
    enriched schema when the archived stream carried derived columns.

    ``upto_batch`` is batch-granular TIME TRAVEL: only manifests with
    ``batchId <= upto_batch`` contribute, reconstructing the archive
    exactly as a reader saw it after that batch committed — each batch
    manifest is an immutable generation marker, so historical snapshots
    cost a glob, not a table format."""
    import glob
    import json
    import os
    import re

    files: list[str] = []
    for mf in sorted(glob.glob(os.path.join(path, "_MANIFEST-batch-*.json"))):
        m = re.search(r"_MANIFEST-batch-(\d+)\.json$", mf)
        if upto_batch is not None and m and int(m.group(1)) > upto_batch:
            continue
        with open(mf) as fh:
            files.extend(
                os.path.join(path, f["file"]) for f in json.load(fh)["files"]
            )
    schema = schema or AlertReplaySource({}).schema()
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def read_archive(spark, path: str, schema=None):
    """Read back ONLY manifest-committed files (exactly-once view)."""
    import json
    import os

    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        doc = json.load(fh)
    files = [os.path.join(path, f["file"]) for f in doc["files"]]
    schema = schema or AlertReplaySource({}).schema()
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class AlertReplaySource(DataSource):
    """``spark.read.format("alert_replay").option("rows", N).load()``
    and ``spark.readStream.format("alert_replay")...`` (micro-batch
    replay with per-trigger backpressure)."""

    @classmethod
    def name(cls):
        return "alert_replay"

    def schema(self):
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )

    def reader(self, schema):
        return AlertReplayReader(self.options)

    def simpleStreamReader(self, schema):
        return AlertReplayStreamReader(self.options)

    def writer(self, schema, overwrite):
        return AlertArchiveWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return AlertArchiveStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the format on a session."""
    spark.dataSource.register(AlertReplaySource)
