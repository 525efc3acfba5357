"""Schema registry: versioned, external, never inferred.

The reference's schema discipline (SURVEY.md §1.3): schemas are pinned
from template files at startup (``common/spark_utils.py:449-487``),
versions are stamped into every row (``rubin/decoding_utils.py:118-126``)
and re-read to drive downstream column plans (``rubin/spark_utils.py:
27-52``); outgoing schemas are derived from the DataFrame and saved
(``bin/ztf/save_distribution_schema.py:76-89``).

This registry stores Spark schemas as JSON documents keyed by
``(name, version)``, with helpers to pin file-stream schemas and to
stamp/read version columns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaRegistry:
    """Directory-backed registry of versioned Spark schemas."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str, version: str) -> str:
        return os.path.join(self.root, f"{name}__{version}.json")

    def save(self, name: str, version: str, schema: StructType) -> str:
        """Persist a schema (e.g. derived from a template read — the
        outgoing-schema protocol of ``save_distribution_schema``)."""
        path = self._path(name, version)
        with open(path, "w") as fh:
            json.dump(json.loads(schema.json()), fh, indent=2, sort_keys=True)
        return path

    def load(self, name: str, version: str) -> StructType:
        with open(self._path(name, version)) as fh:
            return StructType.fromJson(json.load(fh))

    def versions(self, name: str) -> list[str]:
        prefix = f"{name}__"
        return sorted(
            f[len(prefix):-5]
            for f in os.listdir(self.root)
            if f.startswith(prefix) and f.endswith(".json")
        )

    def save_from_dataframe(
        self, name: str, version: str, df: DataFrame
    ) -> str:
        return self.save(name, version, df.schema)

    @staticmethod
    def stamp_version(df: DataFrame, version: str, col: str = "schema_version") -> DataFrame:
        """Version column stamped into every row
        (``rubin/decoding_utils.py:118-126``)."""
        return df.withColumn(col, F.lit(version))

    @staticmethod
    def read_version(df: DataFrame, col: str = "schema_version") -> str | None:
        """Probe the version of a batch (``rubin/spark_utils.py:44-50``
        ``limit(1).collect()`` idiom)."""
        row = df.select(col).limit(1).collect()
        return row[0][0] if row else None
