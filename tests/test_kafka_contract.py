"""Kafka reader/writer contract tests.

No broker (or spark-sql-kafka jar) exists in this container, so the
integration path can't run; these tests pin the *structural* contract
instead — that every tunable the reference sets
(``common/spark_utils.py:225-308``, ``common/distribution_utils.py:
92-140``) actually reaches the Spark reader/writer builders, via
recording fakes, plus the documented failure mode when the datasource
is absent.
"""

from __future__ import annotations

import pytest

from fink_broker_spark.sinks.kafka import push_to_kafka, serialize_payload
from fink_broker_spark.sources.kafka import KafkaSourceConfig, kafka_stream
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


class _RecordingReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return self


class _FakeSparkForRead:
    def __init__(self, reader):
        self._reader = reader

    @property
    def readStream(self):
        return self._reader


def test_reader_contract_full_option_surface():
    cfg = KafkaSourceConfig(
        servers="b1:9092,b2:9092",
        topic_pattern="ztf_2026.*",
        max_offsets_per_trigger=5000,
        starting_offsets="latest",
        fail_on_data_loss=True,
        security_options={
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.kerberos.service.name": "kafka",
        },
    )
    rec = _RecordingReader()
    out = kafka_stream(_FakeSparkForRead(rec), cfg)
    assert out is rec and rec.loaded
    assert rec.fmt == "kafka"
    assert rec.opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribePattern": "ztf_2026.*",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "5000",
        "failOnDataLoss": "true",
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.kerberos.service.name": "kafka",
    }


class _RecordingWriter:
    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.mode = None
        self.started = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def outputMode(self, mode):
        self.mode = mode
        return self

    def start(self):
        self.started = True
        return self


def test_writer_contract_topic_and_checkpoint(spark, monkeypatch):
    ev = load_table(spark, SF0001, "events").limit(3)
    rec = _RecordingWriter()

    real_serialize = serialize_payload

    def fake_serialize(df, columns=None, use_avro=False):
        payload = real_serialize(df, columns, use_avro)

        class _Wrapped:
            writeStream = rec

        return _Wrapped()

    monkeypatch.setattr(
        "fink_broker_spark.sinks.kafka.serialize_payload", fake_serialize
    )
    q = push_to_kafka(
        ev,
        topic="fink_sso_candidates",
        servers="b1:9092",
        checkpoint_dir="/tmp/ckpt/fink_sso_candidates",
        columns=["event_id", "event_type"],
    )
    assert q is rec and rec.started
    assert rec.fmt == "kafka"
    assert rec.mode == "append"
    assert rec.opts == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "fink_sso_candidates",
        "checkpointLocation": "/tmp/ckpt/fink_sso_candidates",
    }


def test_wire_schema_is_spark_kafka_shape(spark):
    """The serialized frame must match the Kafka sink's expected columns
    (binary/string key + binary value) so it would bind to the real
    datasource unchanged."""
    ev = load_table(spark, SF0001, "events").limit(2)
    wire = serialize_payload(ev, columns=["event_id", "value"])
    kinds = {f.name: f.dataType.simpleString() for f in wire.schema.fields}
    assert set(kinds) == {"key", "value"}
    assert kinds["value"] == "binary"
    assert kinds["key"] == "string"


def test_missing_datasource_error_is_actionable(spark):
    """Without the spark-sql-kafka jar, the real reader must fail with
    Spark's standard deploy-guide message (the gap the docs point at),
    not a silent no-op."""
    cfg = KafkaSourceConfig(servers="x:9092", topic_pattern="t.*")
    with pytest.raises(Exception, match="kafka"):
        kafka_stream(spark, cfg)
