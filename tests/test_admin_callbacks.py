"""Post-collect callbacks and Kafka offset-admin utilities."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fink_broker_spark.admin.offsets import (
    OFFSET_INVALID,
    PartitionOffset,
    count_between_dates,
    date_to_ms,
    offsets_report,
    partitions_for_date,
    reset_to_date,
)
from fink_broker_spark.distribute.callbacks import (
    Channel,
    collect_bounded,
    post_collect_notify,
)
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


# --------------------------- callbacks ------------------------------------


def test_post_collect_notify_bounded_and_gated(spark, tmp_path, monkeypatch):
    ev = load_table(spark, SF0001, "events")
    sent = {}

    def recorder(name):
        def _send(messages, init_msg):
            sent[name] = (list(messages), init_msg)

        return _send

    monkeypatch.setenv("FAKE_TOKEN_SET", "tok")
    monkeypatch.delenv("FAKE_TOKEN_UNSET", raising=False)
    ids_csv = str(tmp_path / "night" / "20240101.csv")
    summary = post_collect_notify(
        ev.filter(F.col("value") > 0),
        format_row=lambda row: f"event {row.event_id}: {row.value:.2f}",
        channels=[
            Channel("slack", recorder("slack"), token_env="FAKE_TOKEN_SET"),
            Channel("tg", recorder("tg"), token_env="FAKE_TOKEN_UNSET"),
            Channel("stdout", recorder("stdout")),  # ungated
        ],
        init_msg="{n} candidates found",
        max_rows=7,
        order_by=[F.desc("value"), F.asc("event_id")],
        id_col="event_id",
        ids_csv=ids_csv,
    )
    assert summary["n_candidates"] == 7  # bound respected
    assert summary["channels"] == {
        "slack": "sent",
        "tg": "skipped_no_token",
        "stdout": "sent",
    }
    assert summary["ids_csv"] == ids_csv
    msgs, header = sent["slack"]
    assert len(msgs) == 7 and header == "7 candidates found"
    assert "tg" not in sent
    # messages ordered by the ranking pushed into the plan
    top = (
        ev.filter(F.col("value") > 0)
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(1)
        .collect()[0]
    )
    assert msgs[0] == f"event {top.event_id}: {top.value:.2f}"
    with open(ids_csv) as fh:
        assert len(fh.read().strip().splitlines()) == 8  # header + 7 ids


def test_post_collect_notify_empty_fallback(spark):
    ev = load_table(spark, SF0001, "events").filter(F.lit(False))
    got = {}
    summary = post_collect_notify(
        ev,
        format_row=lambda row: "x",
        channels=[Channel("c", lambda m, h: got.update(m=m, h=h))],
        empty_msg="No candidates found on 20240101",
    )
    assert summary["n_candidates"] == 0
    assert got == {"m": [], "h": "No candidates found on 20240101"}
    assert summary["ids_csv"] is None


def test_collect_bounded_plan_is_topk(spark):
    """With an ordering, the bound must compile to TakeOrderedAndProject
    (per-partition top-k), not a global sort."""
    ev = load_table(spark, SF0001, "events")
    plan = (
        ev.orderBy(F.desc("value"))
        .limit(5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert len(collect_bounded(ev, 5, order_by=[F.desc("value")])) == 5


# --------------------------- offset admin ---------------------------------


class _FakeMeta:
    def __init__(self, partitions, error=None):
        self.partitions = partitions
        self.error = error


class _FakeMetadata:
    def __init__(self, topics):
        self.topics = topics


class _FakeConsumer:
    """In-memory stand-in for confluent_kafka.Consumer: three partitions
    with a per-day message ramp and committed offsets."""

    def __init__(self):
        # offset of first message at/after date, per partition
        self.by_date = {
            date_to_ms("2026-01-01"): [0, 0, 0],
            date_to_ms("2026-01-02"): [100, 50, 0],
            date_to_ms("2026-01-03"): [250, 90, 10],
        }
        self.watermarks = {0: (0, 300), 1: (0, 120), 2: (0, 10)}
        self.committed_offsets = {0: 260, 1: OFFSET_INVALID, 2: 10}
        self.assigned = None
        self.committed_calls = []

    def list_topics(self, topic, timeout=None):
        return _FakeMetadata({topic: _FakeMeta({0: None, 1: None, 2: None})})

    def offsets_for_times(self, partitions):
        return [
            PartitionOffset(p.topic, p.partition, self.by_date[p.offset][p.partition])
            for p in partitions
        ]

    def committed(self, partitions, timeout=None):
        return [
            PartitionOffset(p.topic, p.partition, self.committed_offsets[p.partition])
            for p in partitions
        ]

    def get_watermark_offsets(self, partition, timeout=None, cached=False):
        return self.watermarks[partition.partition]

    def assign(self, partitions):
        self.assigned = partitions

    def commit(self, offsets=None):
        self.committed_calls.append(offsets)


def test_partitions_for_date_maps_each_partition():
    c = _FakeConsumer()
    got = partitions_for_date(c, "alerts", date_to_ms("2026-01-02"))
    assert [(p.partition, p.offset) for p in got] == [(0, 100), (1, 50), (2, 0)]


def test_count_between_dates_sums_partitions():
    c = _FakeConsumer()
    # (250+90+10) - (100+50+0) = 200
    assert count_between_dates(c, "alerts", "2026-01-02", "2026-01-03") == 200


def test_reset_to_date_assigns_and_commits():
    c = _FakeConsumer()
    out = reset_to_date(c, "alerts", "2026-01-02")
    assert [(p.partition, p.offset) for p in out] == [(0, 100), (1, 50), (2, 0)]
    assert c.assigned == out
    assert c.committed_calls == [out]


def test_offsets_report_lag_and_uncommitted():
    c = _FakeConsumer()
    rep = offsets_report(c, "alerts")
    # p0: committed 260, lag 40; p1: uncommitted -> lag = hi-lo = 120;
    # p2: committed 10, lag 0
    assert rep["partitions"] == [
        {"partition": 0, "committed": 260, "lag": 40},
        {"partition": 1, "committed": 0, "lag": 120},
        {"partition": 2, "committed": 10, "lag": 0},
    ]
    assert rep["total_committed"] == 270
    assert rep["total_lag"] == 160


def test_future_date_resolves_sentinels_to_watermarks():
    """A date past the newest message returns the high watermark, never
    the confluent -1 sentinel — counting to 'now' stays non-negative
    and reset-to-future seeks to the end instead of committing -1."""

    class _QuietConsumer(_FakeConsumer):
        def offsets_for_times(self, partitions):
            return [
                PartitionOffset(p.topic, p.partition, -1) for p in partitions
            ]

    c = _QuietConsumer()
    got = partitions_for_date(c, "alerts", date_to_ms("2026-01-03"))
    # watermark his: 300, 120, 10
    assert [(p.partition, p.offset) for p in got] == [(0, 300), (1, 120), (2, 10)]
    out = reset_to_date(c, "alerts", "2026-01-03")
    assert all(p.offset >= 0 for p in out)
    assert c.committed_calls == [out]


def test_metadata_error_raises():
    class _ErrConsumer(_FakeConsumer):
        def list_topics(self, topic, timeout=None):
            return _FakeMetadata({topic: _FakeMeta({}, error="UNKNOWN_TOPIC")})

    with pytest.raises(RuntimeError, match="UNKNOWN_TOPIC"):
        partitions_for_date(_ErrConsumer(), "alerts", 0)
