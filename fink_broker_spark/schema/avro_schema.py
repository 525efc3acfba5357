"""Spark StructType → Avro schema (.avsc) conversion, jar-free.

The reference derives its outgoing Avro schema by writing one row with
the spark-avro datasource and re-reading the file header
(``bin/ztf/save_distribution_schema.py:76-89``), and fetches
``schema_converter.to_avro`` through py4j for the schema-as-key
protocol (``common/distribution_utils.py:36-39``). Both need the
spark-avro jar on the classpath. This module converts the Spark schema
directly in Python with the same mapping spark-avro's
``SchemaConverters`` applies (nullable → ``["null", T]`` union with
``"default": null``, timestamps → ``long/timestamp-micros``, dates →
``int/date``), so the .avsc dump and the schema-as-key string work in
any environment — and bit-match what the jar would emit for the
supported type surface.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[type, Any] = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(
    dt: T.DataType, name: str, namespace: str, seen: set[str]
) -> Any:
    kind = type(dt)
    if kind in _PRIMITIVES:
        return _PRIMITIVES[kind]
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        item = _avro_type(dt.elementType, name + "_item", namespace, seen)
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        value = _avro_type(dt.valueType, name + "_value", namespace, seen)
        if dt.valueContainsNull:
            value = ["null", value]
        return {"type": "map", "values": value}
    if isinstance(dt, T.StructType):
        return _record(dt, name, namespace, seen)
    raise ValueError(f"unsupported Spark type for Avro: {dt.simpleString()}")


def _record(
    st: T.StructType, name: str, namespace: str, seen: set[str]
) -> dict:
    # Avro record names must be unique within a schema document
    base, rec_name, i = name, name, 0
    while rec_name in seen:
        i += 1
        rec_name = f"{base}_{i}"
    seen.add(rec_name)
    fields = []
    for f in st.fields:
        ftype = _avro_type(f.dataType, f.name, namespace, seen)
        entry: dict[str, Any] = {"name": f.name}
        if f.nullable:
            entry["type"] = ["null", ftype]
            entry["default"] = None
        else:
            entry["type"] = ftype
        fields.append(entry)
    rec = {"type": "record", "name": rec_name, "fields": fields}
    if namespace:
        rec["namespace"] = namespace
    return rec


def spark_schema_to_avsc(
    schema: T.StructType,
    name: str = "topLevelRecord",
    namespace: str = "",
) -> dict:
    """Avro schema document (dict) for a Spark ``StructType``."""
    return _record(schema, name, namespace, set())


def save_avsc(
    schema: T.StructType, path: str, name: str = "topLevelRecord",
    namespace: str = "",
) -> str:
    """Dump the .avsc file the reference saves for consumers
    (``save_distribution_schema.py:87-89``)."""
    doc = spark_schema_to_avsc(schema, name, namespace)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)
    return path
