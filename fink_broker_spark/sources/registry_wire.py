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
