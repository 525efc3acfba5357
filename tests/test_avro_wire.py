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
    # spark-avro serialization: type-FIRST unions, no "default" anywhere
    assert by_name["id"]["type"] == "long" and "default" not in by_name["id"]
    assert by_name["name"]["type"] == ["string", "null"]
    assert "default" not in by_name["name"]
    assert by_name["ts"]["type"] == [
        {"type": "long", "logicalType": "timestamp-micros"},
        "null",
    ]
    assert by_name["day"]["type"] == {"type": "int", "logicalType": "date"}
    meta = by_name["meta"]["type"][0]
    assert meta["type"] == "record"
    assert meta["name"] == "fink.alert.meta"  # dotted fullname nesting
    assert meta["fields"][0]["type"] == ["double", "null"]
    assert by_name["hist"]["type"][0] == {
        "type": "array",
        "items": ["float", "null"],
    }
    assert by_name["tags"]["type"][0] == {
        "type": "map",
        "values": ["string", "null"],
    }


def test_avsc_nested_record_names_are_dotted_fullnames():
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
    assert names == ["topLevelRecord", "topLevelRecord.a", "topLevelRecord.b"]


def test_avsc_matches_reference_jar_output():
    """The emitted serialization must byte-match what the spark-avro jar
    produced for the reference's distribution schema
    (``/root/reference/utest/datasets/schemas/schema_20190903.avsc``) —
    checked on the ``cutoutScience`` subtree, whose Spark source type is
    known exactly (nullable struct of two nullable fields)."""
    import json

    with open(
        "/root/reference/utest/datasets/schemas/schema_20190903.avsc"
    ) as fh:
        ref = json.load(fh)
    ref_cutout = next(
        f for f in ref["fields"] if f["name"] == "cutoutScience"
    )
    schema = T.StructType(
        [
            T.StructField(
                "cutoutScience",
                T.StructType(
                    [
                        T.StructField("fileName", T.StringType(), True),
                        T.StructField("stampData", T.BinaryType(), True),
                    ]
                ),
                False,  # the reference field is non-union (non-nullable)
            )
        ]
    )
    doc = spark_schema_to_avsc(schema)  # root name topLevelRecord
    assert json.dumps(doc["fields"][0], sort_keys=True) == json.dumps(
        ref_cutout, sort_keys=True
    )


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


def test_avsc_spark_schema_round_trip():
    from fink_broker_spark.schema.avro_schema import avsc_to_spark_schema

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField(
                "meta",
                T.StructType([T.StructField("score", T.DoubleType(), True)]),
                True,
            ),
            T.StructField("hist", T.ArrayType(T.FloatType(), True), True),
            T.StructField(
                "tags", T.MapType(T.StringType(), T.StringType()), True
            ),
        ]
    )
    assert avsc_to_spark_schema(spark_schema_to_avsc(schema)) == schema


def test_registry_client_decodes_two_schema_ids(spark):
    """The id→schema resolver behind the wire framing: two schema ids in
    one batch decode through version-correct cast/default plans in a
    single pass, and the fetch function is called once per id (cached)."""
    from fink_broker_spark.schema.registry_client import (
        ConfluentRegistryClient,
    )
    from fink_broker_spark.sources.registry_wire import decode_framed

    v1 = {
        "type": "record",
        "name": "alert",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "value", "type": ["double", "null"]},
        ],
    }
    v2 = {
        "type": "record",
        "name": "alert",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "value", "type": ["double", "null"], "default": -1.0},
            {"name": "tag", "type": ["string", "null"]},
        ],
    }
    calls: list[int] = []

    def fetch(i: int) -> dict:
        calls.append(i)
        return {7: v1, 9: v2}[i]

    client = ConfluentRegistryClient(fetch)

    def framed(body: str, sid: int):
        return spark.createDataFrame([(body,)], "body string").select(
            with_registry_header(F.col("body").cast("binary"), sid).alias(
                "value"
            )
        )

    df = (
        framed('{"event_id": 1, "value": 1.5}', 7)
        .union(framed('{"event_id": 2, "value": 2.5, "tag": "x"}', 9))
        .union(framed('{"event_id": 3, "tag": "y"}', 9))  # value → default
    )
    out = {r.event_id: r for r in decode_framed(df, "value", client).collect()}
    assert sorted(calls) == [7, 9]  # one fetch per id despite reuse
    assert set(out) == {1, 2, 3}
    assert out[1].value == 1.5 and out[1].tag is None  # v1 has no tag
    assert out[2].value == 2.5 and out[2].tag == "x"
    assert out[3].value == -1.0  # v2's plan default fills the miss
    assert out[1].schema_id == "7" and out[3].schema_id == "9"


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


def test_avro_binary_roundtrip_when_jar_present(spark):
    """Real ``to_avro``/``from_avro`` byte path, including the
    distribute-stage cast plan (timestamps→string, struct re-wrap,
    nullable-array explode-wrap). Runs whenever the spark-avro
    datasource is on the classpath; skipped with a reason otherwise so
    coverage turns on automatically the day the jar appears."""
    from fink_broker_spark.sinks.kafka import (
        avro_available,
        distribution_cast_plan,
        serialize_payload,
    )

    if not avro_available(spark):
        pytest.skip(
            "spark-avro datasource jar not on the JVM classpath in this "
            "container; JSON twin carries the protocol (see "
            "test_kafka_contract.py)"
        )

    import json

    from pyspark.sql.avro.functions import from_avro

    ev = (
        load_table(spark, SF0001, "events")
        .select("event_id", "ts", F.struct("user_id", "value").alias("meta"),
                "history")
        .limit(100)
    )
    plan = distribution_cast_plan(ev)
    wire = serialize_payload(plan, key_format="avsc", use_avro=True)
    avsc = json.loads(wire.select("key").first().key)
    decoded = wire.select(
        from_avro(F.col("value"), json.dumps(avsc)).alias("r")
    ).select("r.*")
    left = sorted(map(tuple, plan.collect()))
    right = sorted(map(tuple, decoded.collect()))
    assert left == right
