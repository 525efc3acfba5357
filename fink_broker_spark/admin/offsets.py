"""Kafka consumer-group offset admin (driver-side, no Spark job).

Re-expresses the Rubin offset utilities
(``fink_broker/rubin/decoding_utils.py:140-382``): seek a consumer
group to the offsets matching a date, count messages between two dates,
and report committed-offset / lag totals per partition.

The reference binds directly to ``confluent_kafka``; that package is
not in this container, so every function here takes a duck-typed
``consumer`` exposing the same surface (``list_topics``,
``offsets_for_times``, ``committed``, ``get_watermark_offsets``,
``assign``, ``commit``) plus a ``TopicPartition``-like factory. A real
``confluent_kafka.Consumer`` satisfies it unchanged
(``partition_factory=confluent_kafka.TopicPartition``); tests use an
in-memory fake. These are small admin operations over partition
metadata — driver-side by design, never a data-plane path.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from time import mktime

#: confluent_kafka.OFFSET_INVALID
OFFSET_INVALID = -1001


@dataclass
class PartitionOffset:
    """Minimal TopicPartition stand-in (topic, partition, offset)."""

    topic: str
    partition: int
    offset: int = OFFSET_INVALID


def date_to_ms(date: str) -> int:
    """``YYYY-MM-DD`` (local time, reference convention) → epoch ms."""
    return int(mktime(datetime.strptime(date, "%Y-%m-%d").timetuple()) * 1000)


def _topic_partitions(consumer, topic: str, timeout: float):
    metadata = consumer.list_topics(topic, timeout=timeout)
    meta = metadata.topics[topic]
    err = getattr(meta, "error", None)
    if err is not None:
        raise RuntimeError(f"metadata error for topic {topic}: {err}")
    return sorted(meta.partitions)


def partitions_for_date(
    consumer,
    topic: str,
    date_ms: int,
    timeout: float = 10.0,
    partition_factory=PartitionOffset,
):
    """Offsets of the first message at/after ``date_ms``, per partition
    (``get_partitions_by_date``, ``decoding_utils.py:140-187``).

    ``offsets_for_times`` returns a negative sentinel for a partition
    with no message at/after the date (quiet partition, or a date in
    the future); those are resolved to the partition's high watermark —
    "start at the end" — so callers never sum or commit sentinels.
    """
    wanted = [
        partition_factory(topic, p, date_ms)
        for p in _topic_partitions(consumer, topic, timeout)
    ]
    resolved = []
    for part in consumer.offsets_for_times(wanted):
        if part.offset < 0:
            _lo, hi = consumer.get_watermark_offsets(part, timeout=timeout)
            if hi < 0:
                # invalid watermark is an ERROR, not "start at 0" — a
                # silent 0 would rewind the group to the beginning
                raise RuntimeError(
                    f"invalid high watermark for {part.topic}"
                    f"[{part.partition}]: {hi}"
                )
            part = partition_factory(part.topic, part.partition, hi)
        resolved.append(part)
    return resolved


def count_between_dates(
    consumer,
    topic: str,
    startdate: str,
    stopdate: str,
    timeout: float = 10.0,
    partition_factory=PartitionOffset,
) -> int:
    """Messages produced in ``[startdate, stopdate)`` summed over
    partitions (``compute_offsets_between_date``,
    ``decoding_utils.py:190-236``)."""
    start = partitions_for_date(
        consumer, topic, date_to_ms(startdate), timeout, partition_factory
    )
    stop = partitions_for_date(
        consumer, topic, date_to_ms(stopdate), timeout, partition_factory
    )
    return sum(p.offset for p in stop) - sum(p.offset for p in start)


def reset_to_date(
    consumer,
    topic: str,
    date: str,
    timeout: float = 10.0,
    partition_factory=PartitionOffset,
):
    """Seek the consumer group back to ``date`` — assign + commit the
    per-partition offsets (``reset_offsets``,
    ``decoding_utils.py:239-280``). Takes effect at the next poll."""
    at_date = partitions_for_date(
        consumer, topic, date_to_ms(date), timeout, partition_factory
    )
    consumer.assign(at_date)
    consumer.commit(offsets=at_date)
    return at_date


def offsets_report(
    consumer,
    topic: str,
    timeout: float = 10.0,
    partition_factory=PartitionOffset,
) -> dict:
    """Committed totals and lag per partition (``return_offsets``,
    ``decoding_utils.py:283-382``).

    Returns ``{"total_committed": int, "total_lag": int,
    "partitions": [{partition, committed, lag}, ...]}``. A partition
    with no committed offset reports its full retained message count as
    lag (the reference's compaction caveat applies).
    """
    partitions = [
        partition_factory(topic, p)
        for p in _topic_partitions(consumer, topic, timeout)
    ]
    committed = consumer.committed(partitions, timeout=timeout)
    rows = []
    total_committed = 0
    total_lag = 0
    for part in committed:
        lo, hi = consumer.get_watermark_offsets(part, timeout=timeout)
        if hi < 0:
            lag = 0
            offset = 0 if part.offset < 0 else part.offset
        elif part.offset < 0 or part.offset == OFFSET_INVALID:
            lag = hi - lo
            offset = 0
        else:
            lag = hi - part.offset
            offset = part.offset
        total_committed += offset
        total_lag += int(lag)
        rows.append(
            {"partition": part.partition, "committed": offset, "lag": int(lag)}
        )
    return {
        "total_committed": total_committed,
        "total_lag": total_lag,
        "partitions": rows,
    }
