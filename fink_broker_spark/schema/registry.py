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

    # -- version-keyed column plans (``rubin/hbase_utils.py:170-230``) --

    def save_plan(
        self, name: str, version: str, plan: dict[str, tuple[str, object]]
    ) -> str:
        """Persist a column plan ``{col: (sql_type, default)}`` for one
        schema version — the registry analog of the reference's
        avsc-derived column dictionaries."""
        path = os.path.join(self.root, f"{name}__{version}.plan.json")
        with open(path, "w") as fh:
            json.dump(
                {c: [t, d] for c, (t, d) in plan.items()},
                fh,
                indent=2,
                sort_keys=True,
            )
        return path

    def load_plan(
        self, name: str, version: str
    ) -> dict[str, tuple[str, object]]:
        with open(os.path.join(self.root, f"{name}__{version}.plan.json")) as fh:
            raw = json.load(fh)
        return {c: (t, d) for c, (t, d) in raw.items()}

    def plan_versions(self, name: str) -> list[str]:
        prefix, suffix = f"{name}__", ".plan.json"
        return sorted(
            f[len(prefix) : -len(suffix)]
            for f in os.listdir(self.root)
            if f.startswith(prefix) and f.endswith(suffix)
        )


def versioned_select(
    df: DataFrame,
    plans: dict[str, dict[str, tuple[str, object]]],
    version_col: str = "schema_version",
) -> DataFrame:
    """Apply per-version cast/default column plans in ONE projection.

    ``plans`` maps a stamped schema version to its column dictionary
    ``{col: (sql_type, default)}`` — the registry form of the
    reference's per-version avsc dictionaries
    (``rubin/hbase_utils.py:170-230``, ``extract_avsc_schema``). The
    reference loops versions and processes each batch separately; here a
    mixed-version night is a single scan: every output column is one
    ``CASE`` over the row-stamped version — present columns are cast
    with NULLs defaulted, absent-at-that-version columns get that
    version's default (or typed NULL). No per-version filter/union, so
    one job, one pass, full codegen, and partition pruning untouched.

    Output = union of all plan columns (sorted) + the version column.
    """
    targets: dict[str, str] = {}
    for plan in plans.values():
        for col, (sql_type, _default) in plan.items():
            targets.setdefault(col, sql_type)
    present = set(df.columns)
    out_cols = []
    for col in sorted(targets):
        expr = F.lit(None).cast(targets[col])
        for version, plan in plans.items():
            if col in plan:
                sql_type, default = plan[col]
                if col in present:
                    branch = F.coalesce(
                        F.col(col).cast(sql_type), F.lit(default).cast(sql_type)
                    )
                else:
                    branch = F.lit(default).cast(sql_type)
                expr = F.when(
                    F.col(version_col) == F.lit(version), branch
                ).otherwise(expr)
        out_cols.append(expr.alias(col))
    return df.select(*out_cols, F.col(version_col))
