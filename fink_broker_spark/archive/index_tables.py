"""Serving-layer index tables: flatten + composite row key + salt + sort.

The reference bulk-loads a main table and ~8 index tables into HBase
(``bin/ztf/archive_science.py:34-82``, ``bin/ztf/archive_index.py:47-296``),
each a flattened, cast, row-keyed projection (pixel/class/ssnamenr/
tracklet/upper-limit variants). HBase itself is out of scope
(SURVEY.md §1.1): the same computation lands in **sorted, salted,
partitioned Parquet** — Parquet min/max page statistics over the sorted
row key replace HBase's prefix scans, and the salt bucket column replaces
region balancing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_broker_spark.operators.relational import flatten_cast
from fink_broker_spark.operators.salting import salt_expr, salted_row_key


def build_index_table(
    df: DataFrame,
    flatten_plan: dict[str, tuple[str, str]],
    key_cols: Sequence[str],
    salt_source: str | None = None,
    salt_digits: int = 3,
) -> DataFrame:
    """Flatten/cast per plan, add ``rowkey`` (= salt_part1_part2…) and
    ``salt_bucket``, sort within partitions by rowkey.

    ``repartition(salt_bucket)`` + ``sortWithinPartitions(rowkey)`` gives
    each output file a tight min/max rowkey range per bucket → point and
    prefix lookups prune to one file, the Parquet analog of an HBase
    region scan (``common/hbase_utils.py:485-526`` salting +
    ``bin/ztf/archive_index.py:194,250`` key layout).
    """
    flat = flatten_cast(df, flatten_plan)
    first_key = key_cols[0] if salt_source is None else salt_source
    salt = salt_expr(F.col(first_key), salt_digits)
    keyed = flat.withColumn("salt_bucket", salt).withColumn(
        "rowkey", salted_row_key(F.col("salt_bucket"), *key_cols)
    )
    return keyed.repartition("salt_bucket").sortWithinPartitions("rowkey")


def write_index_table(
    df: DataFrame, path: str, partition_by: Sequence[str] = ("salt_bucket",)
) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
