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


def test_avro_binary_golden_bytes():
    """Spec-pinned encodings (Avro 1.11 'Binary encoding'): zigzag
    varints, length-prefixed strings, union index prefix, LE doubles,
    block-terminated arrays."""
    from fink_broker_spark.schema.avro_codec import decode, encode

    rec = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["double", "null"]},
        ],
    }
    assert encode(rec, {"a": 1, "b": "hi", "c": None}) == bytes.fromhex(
        "02" "046869" "02"
    )
    assert encode(rec, {"a": -1, "b": "", "c": 2.5}) == bytes.fromhex(
        "01" "00" "00" "0000000000000440"
    )
    arr = {"type": "array", "items": "long"}
    assert encode(arr, [3, -3]) == bytes.fromhex("04" "06" "05" "00")
    for v in (
        {"a": 0, "b": "é", "c": None},
        {"a": 2**62, "b": "x" * 200, "c": -1e-300},
        {"a": -(2**62), "b": "", "c": 0.0},
    ):
        blob = encode(rec, v)
        back, pos = decode(rec, blob)
        assert pos == len(blob)
        assert back == v


def test_avro_binary_spark_roundtrip(spark):
    """Real Avro bytes through Spark: struct → avro binary → struct,
    under the SAME .avsc the schema-as-key protocol emits, including a
    nested record, an array, and nullable fields."""
    import pyspark.sql.functions as F

    from fink_broker_spark.schema.avro_codec import (
        avro_decode_udf,
        avro_encode_udf,
    )
    from fink_broker_spark.schema.avro_schema import spark_schema_to_avsc

    df = spark.createDataFrame(
        [
            (1, "x", [1.5, 2.5], ("n1", 10)),
            (2, None, [], ("n2", 20)),
            (3, "z", [0.25], ("n3", None)),
        ],
        "id long, tag string, vals array<double>, sub struct<s:string,k:long>",
    )
    avsc = spark_schema_to_avsc(df.schema)
    payload = F.struct(*[F.col(c) for c in df.columns])
    enc = df.select(avro_encode_udf(avsc)(payload).alias("value"))
    assert dict(enc.dtypes)["value"] == "binary"
    dec = enc.select(
        avro_decode_udf(avsc, df.schema)(F.col("value")).alias("r")
    ).select("r.*")
    assert sorted(map(tuple, dec.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_avro_binary_through_registry_framing(spark):
    """End-to-end wire: python-avro bytes wrapped in the Confluent
    header, schema id recovered, payload decoded back to rows — the
    Rubin stream2raw decode chain with REAL Avro binary, no jar."""
    import pyspark.sql.functions as F

    from fink_broker_spark.schema.avro_codec import (
        avro_decode_udf,
        avro_encode_udf,
    )
    from fink_broker_spark.schema.avro_schema import spark_schema_to_avsc
    from fink_broker_spark.sources.registry_wire import (
        registry_payload,
        registry_schema_id,
        with_registry_header,
    )

    df = spark.createDataFrame(
        [(i, f"u{i}", float(i) / 8) for i in range(50)],
        "event_id long, user string, score double",
    )
    avsc = spark_schema_to_avsc(df.schema)
    payload = F.struct(*[F.col(c) for c in df.columns])
    framed = df.select(
        with_registry_header(
            avro_encode_udf(avsc)(payload), schema_id=7
        ).alias("value")
    )
    back = framed.select(
        registry_schema_id("value").alias("sid"),
        avro_decode_udf(avsc, df.schema)(registry_payload("value")).alias(
            "r"
        ),
    )
    assert back.filter(F.col("sid") != 7).count() == 0
    got = sorted(map(tuple, back.select("r.*").collect()))
    assert got == sorted(map(tuple, df.collect()))


def test_avro_binary_vs_native_jar(spark):
    """When the spark-avro jar is present, our bytes must decode with
    native from_avro and native to_avro bytes with our decoder —
    automatic interop coverage the day the jar appears."""
    import json

    import pytest

    from fink_broker_spark.sinks.kafka import avro_available

    if not avro_available(spark):
        pytest.skip("spark-avro jar not on classpath")
    import pyspark.sql.functions as F
    from pyspark.sql.avro.functions import from_avro, to_avro

    from fink_broker_spark.schema.avro_codec import (
        avro_decode_udf,
        avro_encode_udf,
    )
    from fink_broker_spark.schema.avro_schema import spark_schema_to_avsc

    df = spark.createDataFrame(
        [(1, "x", 0.5), (2, None, -3.0)],
        "id long, tag string, v double",
    )
    avsc = spark_schema_to_avsc(df.schema)
    payload = F.struct(*[F.col(c) for c in df.columns])
    ours = df.select(avro_encode_udf(avsc)(payload).alias("value"))
    native_back = ours.select(
        from_avro("value", json.dumps(avsc)).alias("r")
    ).select("r.*")
    assert sorted(map(tuple, native_back.collect())) == sorted(
        map(tuple, df.collect())
    )
    native = df.select(to_avro(payload, json.dumps(avsc)).alias("value"))
    our_back = native.select(
        avro_decode_udf(avsc, df.schema)(F.col("value")).alias("r")
    ).select("r.*")
    assert sorted(map(tuple, our_back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_serialize_payload_python_avro(spark):
    """The distribute-stage serializer in python-avro mode: value is
    real Avro binary decodable under the avsc key; the full
    distribution cast plan feeds it (the reference's Avro chain with
    zero jars)."""
    import json

    import pyspark.sql.functions as F

    from fink_broker_spark.schema.avro_codec import decode
    from fink_broker_spark.sinks.kafka import (
        distribution_cast_plan,
        serialize_payload,
    )
    from fink_broker_spark.sources.parquet import load_table
    from tests.conftest import SF0001

    ev = load_table(spark, SF0001, "events").limit(20).select(
        "event_id", "ts", "event_type", "value"
    )
    out = serialize_payload(
        distribution_cast_plan(ev),
        use_avro="python",
        key_format="avsc",
    )
    rows = out.collect()
    assert len(rows) == 20
    avsc = json.loads(rows[0].key)
    decoded = [decode(avsc, bytes(r.value))[0] for r in rows]
    expected = {
        (r.event_id, r.event_type)
        for r in ev.select("event_id", "event_type").collect()
    }
    assert {(d["event_id"], d["event_type"]) for d in decoded} == expected


def test_avro_ocf_roundtrip(spark, tmp_path):
    """Object Container Files end to end, jar-free: partition-parallel
    write (one part-N.avro per task), driver reads one header for the
    schema, executor-side block decode over a binaryFile scan. Spec
    structure pinned: magic, metadata map, sync-marker-delimited
    blocks."""
    import os

    import pyspark.sql.functions as F

    from fink_broker_spark.sinks.avro_ocf import (
        MAGIC,
        read_avro_ocf,
        read_header,
        write_avro_ocf,
    )

    df = (
        spark.range(10_000)
        .repartition(4)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).cast("double").alias("score"),
            F.concat(F.lit("u"), (F.col("id") % 13).cast("string")).alias(
                "user"
            ),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.col("id") % 3)
            .alias("bucket"),
        )
    )
    out = str(tmp_path / "ocf")
    manifest = write_avro_ocf(df, out)
    assert len(manifest) == 4
    assert sum(n for _, n in manifest) == 10_000

    # spec pin: magic + metadata keys
    with open(os.path.join(out, manifest[0][0]), "rb") as fh:
        head = fh.read(4096)
    assert head[:4] == MAGIC
    avsc, sync, _ = read_header(head)
    assert avsc["type"] == "record"
    assert len(sync) == 16

    back = read_avro_ocf(spark, out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_avro_ocf_native_interop(spark, tmp_path):
    """When spark-avro is present, natively read our OCF files and
    natively write files our reader consumes — auto-armed interop."""
    import pytest

    from fink_broker_spark.sinks.kafka import avro_available

    if not avro_available(spark):
        pytest.skip("spark-avro jar not on classpath")
    import pyspark.sql.functions as F

    from fink_broker_spark.sinks.avro_ocf import (
        read_avro_ocf,
        write_avro_ocf,
    )

    df = spark.range(100).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    ours = str(tmp_path / "ours")
    write_avro_ocf(df, ours)
    native_read = spark.read.format("avro").load(ours)
    assert sorted(map(tuple, native_read.collect())) == sorted(
        map(tuple, df.collect())
    )
    theirs = str(tmp_path / "theirs")
    df.write.format("avro").save(theirs)
    our_read = read_avro_ocf(spark, theirs)
    assert sorted(map(tuple, our_read.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_avro_ocf_timestamp_roundtrip(spark, tmp_path):
    """Logical-type coverage: timestamp-micros encodes exact integer
    micros (ns//1000 — never a float .timestamp()) and decodes back to
    identical timestamps through both the OCF path and the UDF pair."""
    import pyspark.sql.functions as F

    from fink_broker_spark.sinks.avro_ocf import (
        read_avro_ocf,
        write_avro_ocf,
    )
    from fink_broker_spark.sources.parquet import load_table
    from tests.conftest import SF0001

    ev = (
        load_table(spark, SF0001, "events")
        .select("event_id", "ts", "event_type")
        .limit(500)
    )
    out = str(tmp_path / "ts_ocf")
    write_avro_ocf(ev.repartition(2), out)
    back = read_avro_ocf(spark, out)
    assert dict(back.dtypes)["ts"].startswith("timestamp")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )


def test_avro_ocf_vs_fastavro(spark, tmp_path):
    """Third-party interop for the jar-free OCF path: when ``fastavro``
    is importable, files we write must read back with fastavro, and a
    fastavro-written file must read back with ``read_avro_ocf`` — the
    same auto-arming gating discipline as the spark-avro jar probe.
    Skips with a reason where fastavro is absent (this container)."""
    import pytest

    fastavro = pytest.importorskip(
        "fastavro", reason="fastavro not installed in this container"
    )
    import os

    import pyspark.sql.functions as F

    from fink_broker_spark.sinks.avro_ocf import (
        read_avro_ocf,
        write_avro_ocf,
    )

    df = spark.range(2_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 9).cast("double").alias("score"),
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("user"),
    )

    # ours -> fastavro
    out = str(tmp_path / "ours")
    manifest = write_avro_ocf(df.repartition(2), out)
    via_fastavro = []
    for fname, _ in manifest:
        with open(os.path.join(out, fname), "rb") as fh:
            via_fastavro.extend(
                (r["event_id"], r["score"], r["user"])
                for r in fastavro.reader(fh)
            )
    assert sorted(via_fastavro) == sorted(map(tuple, df.collect()))

    # fastavro -> ours
    theirs = str(tmp_path / "theirs")
    os.makedirs(theirs)
    schema = {
        "type": "record",
        "name": "evt",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "score", "type": "double"},
            {"name": "user", "type": ["null", "string"]},
        ],
    }
    rows = [
        {"event_id": i, "score": float(i % 9),
         "user": None if i % 4 == 0 else f"u{i}"}
        for i in range(500)
    ]
    with open(os.path.join(theirs, "part-0.avro"), "wb") as fh:
        fastavro.writer(fh, schema, rows)
    back = read_avro_ocf(spark, theirs)
    assert sorted(map(tuple, back.collect())) == sorted(
        (r["event_id"], r["score"], r["user"]) for r in rows
    )
