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
    InputPartition,
    SimpleDataSourceStreamReader,
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


def register(spark) -> None:
    """Idempotently register the format on a session."""
    spark.dataSource.register(AlertReplaySource)
