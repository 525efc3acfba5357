"""Kafka streaming source builder.

Re-expresses ``connect_to_kafka`` (``fink_broker/common/spark_utils.py:
225-308``): subscribe-pattern source with backpressure, starting offsets,
and optional SASL/Kerberos auth. Requires the ``spark-sql-kafka`` package
on the cluster classpath (``--packages org.apache.spark:
spark-sql-kafka-0-10_2.13:<spark-version>``); the builder itself is
classpath-independent and unit-testable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class KafkaSourceConfig:
    """Mirrors the reference's Kafka tunables (``common/parser.py:75-83``,
    ``conf/ztf/fink.conf.prod:54-55``)."""

    servers: str
    topic_pattern: str
    max_offsets_per_trigger: int = 5000  # reference default
    starting_offsets: str = "earliest"
    fail_on_data_loss: bool = False
    #: SASL/GSSAPI extras (``common/spark_utils.py:252-268``)
    security_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.servers,
            "subscribePattern": self.topic_pattern,
            "startingOffsets": self.starting_offsets,
            "maxOffsetsPerTrigger": str(self.max_offsets_per_trigger),
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        opts.update(self.security_options)
        return opts


def kafka_stream(spark: SparkSession, config: KafkaSourceConfig) -> DataFrame:
    """Build the streaming DataFrame (schema: key/value binary + topic/
    partition/offset/timestamp — Spark's fixed Kafka source schema)."""
    reader = spark.readStream.format("kafka")
    for key, value in config.options().items():
        reader = reader.option(key, value)
    return reader.load()
