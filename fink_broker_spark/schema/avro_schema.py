"""Spark StructType → Avro schema (.avsc) conversion, jar-free.

The reference derives its outgoing Avro schema by writing one row with
the spark-avro datasource and re-reading the file header
(``bin/ztf/save_distribution_schema.py:76-89``), and fetches
``schema_converter.to_avro`` through py4j for the schema-as-key
protocol (``common/distribution_utils.py:36-39``). Both need the
spark-avro jar on the classpath. This module converts the Spark schema
directly in Python with the exact serialization spark-avro's
``SchemaConverters.toAvroType`` produces, pinned against the reference's
own jar-emitted schema (``utest/datasets/schemas/schema_20190903.avsc``):

- nullable fields are **type-first** unions ``[T, "null"]`` with NO
  ``"default"`` entry (Avro permits either order; byte-level equality of
  the schema-as-key string requires matching the jar's choice),
- nested records carry the **dotted fullname** of their field path
  (``topLevelRecord.candidate``) in ``"name"`` with no separate
  ``"namespace"`` key — array/map element records take the field's own
  name under the parent record's fullname,
- timestamps → ``long/timestamp-micros``, dates → ``int/date``,
  decimals → ``bytes/decimal``.

So the .avsc dump and the schema-as-key string byte-match what the jar
would emit for this type surface, in any environment.
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


def _avro_type(dt: T.DataType, name: str, parent: str) -> Any:
    """Avro type for ``dt``; ``name`` is the enclosing field's name and
    ``parent`` the fullname of the enclosing record (nested records are
    named ``{parent}.{name}``, matching spark-avro's namespacing)."""
    kind = type(dt)
    if kind in _PRIMITIVES:
        return _PRIMITIVES[kind]
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        # spark-avro SchemaConverters.toAvroType: TimestampNTZType →
        # LocalTimestamps.timestampMicros
        return {"type": "long", "logicalType": "local-timestamp-micros"}
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
        item = _avro_type(dt.elementType, name, parent)
        if dt.containsNull:
            item = [item, "null"]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        value = _avro_type(dt.valueType, name, parent)
        if dt.valueContainsNull:
            value = [value, "null"]
        return {"type": "map", "values": value}
    if isinstance(dt, T.StructType):
        return _record(dt, name, parent)
    raise ValueError(f"unsupported Spark type for Avro: {dt.simpleString()}")


def _record(st: T.StructType, name: str, parent: str) -> dict:
    fullname = f"{parent}.{name}" if parent else name
    fields = []
    for f in st.fields:
        ftype = _avro_type(f.dataType, f.name, fullname)
        entry: dict[str, Any] = {"name": f.name}
        # spark-avro: type-first union, no "default" — byte-matching the
        # jar output matters because the schema travels as the message
        # key and consumers compare it as a string
        entry["type"] = [ftype, "null"] if f.nullable else ftype
        fields.append(entry)
    return {"type": "record", "name": fullname, "fields": fields}


def spark_schema_to_avsc(
    schema: T.StructType,
    name: str = "topLevelRecord",
    namespace: str = "",
) -> dict:
    """Avro schema document (dict) for a Spark ``StructType``.

    ``namespace`` mirrors spark-avro's ``recordNamespace`` option: it is
    emitted as a separate ``"namespace"`` key on the root record and
    prefixes the dotted fullnames of nested records."""
    doc = _record(schema, name, namespace)
    if namespace:
        # root keeps short name + explicit namespace (children inline
        # their dotted fullname, as the jar serializes them)
        doc["name"] = name
        doc["namespace"] = namespace
    return doc


def _spark_type(avro: Any) -> tuple[T.DataType, bool]:
    """(Spark type, nullable) for an Avro type node — the inverse mapping
    of :func:`_avro_type`, for consuming registry/.avsc schemas."""
    if isinstance(avro, list):  # union; only [T, "null"] / ["null", T]
        branches = [b for b in avro if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported Avro union: {avro}")
        dt, _ = _spark_type(branches[0])
        return dt, True
    if isinstance(avro, str):
        simple = {
            "long": T.LongType(),
            "int": T.IntegerType(),
            "double": T.DoubleType(),
            "float": T.FloatType(),
            "string": T.StringType(),
            "boolean": T.BooleanType(),
            "bytes": T.BinaryType(),
            "null": T.NullType(),
        }
        if avro not in simple:
            raise ValueError(f"unsupported Avro primitive: {avro}")
        return simple[avro], False
    logical = avro.get("logicalType")
    if logical == "timestamp-micros":
        return T.TimestampType(), False
    if logical == "local-timestamp-micros":
        return T.TimestampNTZType(), False
    if logical == "date":
        return T.DateType(), False
    if logical == "decimal":
        return T.DecimalType(avro["precision"], avro["scale"]), False
    kind = avro["type"]
    if kind == "record":
        fields = []
        for f in avro["fields"]:
            dt, nullable = _spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if kind == "array":
        dt, nullable = _spark_type(avro["items"])
        return T.ArrayType(dt, containsNull=nullable), False
    if kind == "map":
        dt, nullable = _spark_type(avro["values"])
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    if isinstance(kind, (str, list, dict)) and kind != avro:
        return _spark_type(kind)  # {"type": "long", ...} wrapper form
    raise ValueError(f"unsupported Avro type: {avro!r}")


def avsc_to_spark_schema(doc: dict) -> T.StructType:
    """Spark ``StructType`` for an Avro record document — consuming the
    registry's ``/schemas/ids/{id}`` payloads or saved ``.avsc`` files
    (the reference goes the other way through the jar; this closes the
    round trip jar-free)."""
    if doc.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    dt, _ = _spark_type(doc)
    return dt


def plan_from_avsc(doc: dict) -> dict[str, tuple[str, object]]:
    """Column plan ``{col: (sql_type, default)}`` for a record schema —
    the registry-fed input to ``schema.registry.versioned_select`` (the
    reference's ``extract_avsc_schema`` dictionaries,
    ``rubin/hbase_utils.py:170-230``)."""
    plan: dict[str, tuple[str, object]] = {}
    for f in doc["fields"]:
        dt, _ = _spark_type(f["type"])
        default = f.get("default")
        plan[f["name"]] = (dt.simpleString(), default)
    return plan


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
