"""Confluent Schema-Registry wire format as binary column expressions.

The Rubin stream carries Confluent-framed Avro: a 0x00 magic byte, a
4-byte big-endian schema id, then the payload. The reference
deserializes it driver-side with ``confluent_kafka``'s
``AvroDeserializer`` (``bin/rubin/stream2raw.py:35-36,310-311``) — a
per-message Python path. Here the framing is pure Spark column algebra
(hex/unhex/conv/substring run in whole-stage codegen over the scan), so
the id extraction and payload split scale with the executors; only the
schema *lookup* (id → schema, a tiny registry call) stays driver-side,
exactly like any other broadcast model.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_registry_header(value: Column | str, schema_id: int) -> Column:
    """Frame a binary payload: ``0x00 + int32_be(schema_id) + payload``."""
    v = F.col(value) if isinstance(value, str) else value
    header = F.unhex(F.lit(f"00{schema_id:08x}"))
    return F.concat(header, v)


def registry_schema_id(value: Column | str) -> Column:
    """Schema id from a framed message (bytes 2–5, big-endian)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.conv(F.hex(F.substring(v, 2, 4)), 16, 10).cast("int")


def registry_payload(value: Column | str) -> Column:
    """Payload after the 5-byte header."""
    v = F.col(value) if isinstance(value, str) else value
    return F.substring(v, 6, F.length(v) - F.lit(5))


def registry_magic_ok(value: Column | str) -> Column:
    """True when the magic byte is 0x00 (malformed frames filterable
    before decode instead of throwing in a UDF)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.hex(F.substring(v, 1, 1)) == F.lit("00")


def decode_framed(
    df,
    value_col: str,
    client,
    codec: str = "json",
):
    """Decode Confluent-framed messages into version-correct columns.

    The full Rubin ``stream2raw`` decode path jar-free: extract schema
    ids and payloads as column algebra, resolve the batch's distinct ids
    through the registry ``client`` (a bounded driver collect — the id
    set is the registry's version count, not the row count), merge the
    per-id Spark schemas into one parse superschema, and apply each id's
    cast/default plan through ``versioned_select`` as one CASE-per-column
    projection. Mixed-id batches are a single scan, no per-version
    filter/union (contrast ``bin/rubin/stream2raw.py:354-358``, which
    deserializes per message in Python).

    ``codec='json'`` carries the protocol without the spark-avro jar
    (same framing, JSON payload); ``codec='avro'`` uses ``from_avro``
    per id and requires the jar on the classpath.
    """
    from pyspark.sql.types import StructType

    from fink_broker_spark.schema.registry import versioned_select

    framed = df.select(
        registry_schema_id(value_col).alias("schema_id"),
        registry_payload(value_col).alias("__payload"),
    ).filter(registry_magic_ok(value_col))
    ids = sorted(
        r.schema_id for r in framed.select("schema_id").distinct().collect()
    )
    plans = {str(i): client.plan(i) for i in ids}
    if codec == "json":
        # one parse with the merged superschema: fields a version lacks
        # parse as NULL and the version plan supplies the default
        merged: dict[str, object] = {}
        for i in ids:
            for f in client.spark_schema(i).fields:
                merged.setdefault(f.name, f)
        superschema = StructType([merged[k] for k in sorted(merged)])
        parsed = framed.select(
            "schema_id",
            F.from_json(
                F.col("__payload").cast("string"), superschema
            ).alias("__r"),
        )
        flat = parsed.select("schema_id", "__r.*")
    elif codec == "avro":
        from pyspark.sql.avro.functions import from_avro

        parts = []
        for i in ids:
            schema_str = __import__("json").dumps(client.schema(i))
            parts.append(
                framed.filter(F.col("schema_id") == i).select(
                    "schema_id",
                    from_avro(F.col("__payload"), schema_str).alias("__r"),
                ).select("schema_id", "__r.*")
            )
        flat = parts[0]
        for p in parts[1:]:
            flat = flat.unionByName(p, allowMissingColumns=True)
    else:
        raise ValueError(f"unknown codec: {codec}")
    return versioned_select(
        flat.withColumn("schema_id", F.col("schema_id").cast("string")),
        plans,
        version_col="schema_id",
    )
