"""Avro schema conversion and Confluent wire framing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from fink_broker_spark.schema.avro_schema import (
    save_avsc,
    spark_schema_to_avsc,
)
from fink_broker_spark.sources.registry_wire import (
    registry_magic_ok,
    registry_payload,
    registry_schema_id,
    with_registry_header,
)
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


def test_avsc_nullable_unions_and_logical_types():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("day", T.DateType(), False),
            T.StructField(
                "meta",
                T.StructType([T.StructField("score", T.DoubleType(), True)]),
                True,
            ),
            T.StructField("hist", T.ArrayType(T.FloatType(), True), True),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    doc = spark_schema_to_avsc(schema, name="alert", namespace="fink")
    assert doc["type"] == "record" and doc["name"] == "alert"
    assert doc["namespace"] == "fink"
    by_name = {f["name"]: f for f in doc["fields"]}
    assert by_name["id"]["type"] == "long" and "default" not in by_name["id"]
    assert by_name["name"]["type"] == ["null", "string"]
    assert by_name["name"]["default"] is None
    assert by_name["ts"]["type"] == [
        "null",
        {"type": "long", "logicalType": "timestamp-micros"},
    ]
    assert by_name["day"]["type"] == {"type": "int", "logicalType": "date"}
    meta = by_name["meta"]["type"][1]
    assert meta["type"] == "record"
    assert meta["fields"][0]["type"] == ["null", "double"]
    assert by_name["hist"]["type"][1] == {
        "type": "array",
        "items": ["null", "float"],
    }
    assert by_name["tags"]["type"][1] == {
        "type": "map",
        "values": ["null", "string"],
    }


def test_avsc_nested_record_names_unique():
    inner = T.StructType([T.StructField("x", T.LongType(), True)])
    schema = T.StructType(
        [
            T.StructField("a", inner, True),
            T.StructField("b", T.ArrayType(inner), True),
        ]
    )
    doc = spark_schema_to_avsc(schema)
    names = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "record":
                names.append(node["name"])
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(doc)
    assert len(names) == len(set(names)) == 3


def test_avsc_dump_roundtrips_json(tmp_path, spark):
    import json

    ev = load_table(spark, SF0001, "events")
    path = save_avsc(ev.schema, str(tmp_path / "events.avsc"), name="events")
    with open(path) as fh:
        doc = json.load(fh)
    assert {f["name"] for f in doc["fields"]} >= {"event_id", "ts", "value"}


def test_avsc_rejects_non_string_map_keys():
    schema = T.StructType(
        [T.StructField("m", T.MapType(T.LongType(), T.StringType()), True)]
    )
    with pytest.raises(ValueError, match="string keys"):
        spark_schema_to_avsc(schema)


def test_registry_wire_roundtrip(spark):
    ev = load_table(spark, SF0001, "events").limit(50)
    payload = ev.select(
        "event_id", F.to_json(F.struct("event_id", "value")).cast("binary").alias("body")
    )
    framed = payload.select(
        "event_id",
        with_registry_header("body", schema_id=1042).alias("value"),
        F.col("body"),
    )
    decoded = framed.select(
        "event_id",
        registry_magic_ok("value").alias("ok"),
        registry_schema_id("value").alias("sid"),
        registry_payload("value").alias("payload"),
        "body",
    ).collect()
    assert all(r.ok for r in decoded)
    assert all(r.sid == 1042 for r in decoded)
    assert all(bytes(r.payload) == bytes(r.body) for r in decoded)


def test_registry_wire_detects_bad_magic(spark):
    df = spark.range(1).select(
        F.concat(F.unhex(F.lit("01")), F.lit("x").cast("binary")).alias("value")
    )
    assert df.select(registry_magic_ok("value").alias("ok")).collect()[0].ok is False
