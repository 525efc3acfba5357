"""Confluent Schema-Registry client: id → schema, cached, pluggable.

The reference resolves Rubin alert schemas through ``confluent_kafka``'s
``SchemaRegistryClient`` + ``AvroDeserializer`` per message, driver-side
(``bin/rubin/stream2raw.py:310-311, 354-358``). Here the resolution is a
*model fit*: the tiny set of distinct schema ids in a batch is looked up
once on the driver (cached — registry ids are immutable by protocol),
converted to Spark types jar-free, and the resulting column plans run as
ordinary projections on the executors. The fetch function is injected so
tests (and air-gapped deployments) supply schemas without a registry;
the HTTP fetch is a thin optional default built on urllib.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql.types import StructType

from fink_broker_spark.schema.avro_schema import (
    avsc_to_spark_schema,
    plan_from_avsc,
)


def http_fetch(base_url: str, timeout: float = 10.0) -> Callable[[int], dict]:
    """Fetch function for a real registry: GET
    ``{base_url}/schemas/ids/{id}`` and parse the ``schema`` field
    (the Confluent REST protocol). Import-light: urllib only, touched
    only when a lookup actually happens."""

    def _fetch(schema_id: int) -> dict:
        from urllib.request import urlopen

        with urlopen(
            f"{base_url.rstrip('/')}/schemas/ids/{schema_id}", timeout=timeout
        ) as resp:
            body = json.load(resp)
        return json.loads(body["schema"])

    return _fetch


class ConfluentRegistryClient:
    """id → Avro schema resolver with a permanent cache.

    ``fetch_fn(schema_id) -> avsc dict`` supplies misses; ``preload``
    seeds the cache (schemas pinned from files — the reference's
    template discipline, ``common/spark_utils.py:449-487``)."""

    def __init__(
        self,
        fetch_fn: Callable[[int], dict] | None = None,
        preload: dict[int, dict] | None = None,
    ):
        self._fetch = fetch_fn
        self._cache: dict[int, dict] = dict(preload or {})

    def schema(self, schema_id: int) -> dict:
        """Avro schema document for ``schema_id`` (cached)."""
        if schema_id not in self._cache:
            if self._fetch is None:
                raise KeyError(
                    f"schema id {schema_id} not preloaded and no fetch_fn"
                )
            self._cache[schema_id] = self._fetch(schema_id)
        return self._cache[schema_id]

    def spark_schema(self, schema_id: int) -> StructType:
        return avsc_to_spark_schema(self.schema(schema_id))

    def plan(self, schema_id: int) -> dict[str, tuple[str, Any]]:
        """Column plan for ``versioned_select`` keyed by this id."""
        return plan_from_avsc(self.schema(schema_id))
