"""Kafka sink: struct-wrap → serialize → per-topic publish.

Re-expresses ``get_kafka_df`` + ``push_to_kafka``
(``fink_broker/common/distribution_utils.py:33-140``): wrap the selected
columns into one struct, serialize to the message ``value``, attach the
outgoing schema as the message ``key`` (the reference's schema-as-key
protocol, ``:118-124``), and write one streaming query per topic.

Serialization: Avro via ``pyspark.sql.avro.functions.to_avro`` when the
``spark-avro`` package is on the classpath (native in Spark ≥3 — the
reference's py4j wrapper ``common/spark_utils.py:82-123`` is a pre-3.0
relic); JSON otherwise, so the fan-out topology is testable without the
external jar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def avro_available(spark) -> bool:
    """True if the spark-avro datasource is on the JVM classpath."""
    try:
        spark.range(1).select(
            __import__(
                "pyspark.sql.avro.functions", fromlist=["to_avro"]
            ).to_avro(F.struct(F.col("id")))
        ).collect()
        return True
    except Exception:
        return False


def distribution_cast_plan(df: DataFrame) -> DataFrame:
    """The distribute-stage serialization plan
    (``bin/ztf/distribute.py:76-99`` + the nullability workaround for
    spark-avro's non-nullable inference, ``common/distribution_utils.py:
    118-124`` / fink-broker bug #852), derived from the schema instead of
    hand-listed column names:

    - ``timestamp`` columns → ISO strings (Avro has no logical-type
      guarantee across consumer languages; the reference casts its three
      broker timestamps the same way)
    - ``struct`` columns → re-built with ``struct(col.*)`` so every
      nested field is re-marked nullable (the codegen-only rewrap the
      reference does for candidate/cutout/lc_features)
    - ``array`` columns → ``explode(array(col))``: wrap into a 1-element
      outer array and explode it back. Row-count-neutral, but the
      round-trip launders the element nullability the same way the
      reference treats ``prv_candidates``
    - everything else passes through untouched

    Pure projections (one generator per step), so Catalyst collapses the
    chain into the serializing select — zero extra shuffles or scans.
    """
    from pyspark.sql.types import ArrayType, StructType, TimestampType

    plain = []
    arrays = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, TimestampType):
            plain.append(c.cast("string").alias(f.name))
        elif isinstance(f.dataType, StructType):
            plain.append(
                F.struct(
                    *[c[s.name].alias(s.name) for s in f.dataType.fields]
                ).alias(f.name)
            )
        elif isinstance(f.dataType, ArrayType):
            plain.append(c)  # placeholder ordering; rewrapped below
            arrays.append(f.name)
        else:
            plain.append(c)
    out = df.select(*plain)
    for name in arrays:  # one generator per projection is a Spark rule
        out = out.withColumn(name, F.explode(F.array(F.col(name))))
    return out


def serialize_payload(
    df: DataFrame,
    columns: list[str] | None = None,
    use_avro: bool | str = False,
    key_format: str = "spark_json",
) -> DataFrame:
    """Columns → single binary/string ``value`` + schema-string ``key``.

    The key carries the payload schema derived from the DataFrame itself,
    exactly the reference's idempotent-key protocol
    (``common/distribution_utils.py:36-39,87,118-124``).
    ``key_format="avsc"`` emits the Avro schema document instead of the
    Spark JSON schema — the reference's actual key content
    (``schema_converter.to_avro``), available jar-free via
    :mod:`fink_broker_spark.schema.avro_schema`.

    ``use_avro``: ``True``/"jvm" → native ``to_avro`` (needs the
    spark-avro jar); ``"python"`` → REAL Avro binary via the jar-free
    codec (:mod:`fink_broker_spark.schema.avro_codec`, Arrow-batched
    pandas UDF — interop-conformant bytes, the fallback when the jar is
    absent); ``False`` → JSON twin (codegen, cheapest for tests).
    """
    cols = columns or df.columns
    payload: Column = F.struct(*[F.col(c) for c in cols])
    if key_format == "avsc" or use_avro == "python":
        import json as _json

        from fink_broker_spark.schema.avro_schema import spark_schema_to_avsc

        avsc = spark_schema_to_avsc(df.select(*cols).schema)
        schema_key = F.lit(_json.dumps(avsc))
        if key_format != "avsc":
            schema_key = F.lit(df.select(*cols).schema.json())
    else:
        schema_key = F.lit(df.select(*cols).schema.json())
    if use_avro == "python":
        from fink_broker_spark.schema.avro_codec import avro_encode_udf

        value = avro_encode_udf(avsc)(payload)
    elif use_avro:
        from pyspark.sql.avro.functions import to_avro

        value = to_avro(payload)
    else:
        value = F.to_json(payload).cast("binary")
    return df.select(
        schema_key.alias("key"), value.alias("value")
    )


def push_to_kafka(
    df: DataFrame,
    topic: str,
    servers: str,
    checkpoint_dir: str,
    columns: list[str] | None = None,
    use_avro: bool = False,
):
    """One streaming query publishing ``df`` to ``topic``.

    The reference starts one such query per user filter
    (``bin/ztf/distribute.py:167-200``); callers hold the returned query
    handles and ``spark.streams.awaitAnyTermination()``.
    """
    payload = serialize_payload(df, columns, use_avro)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
