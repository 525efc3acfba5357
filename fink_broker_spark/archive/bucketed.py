"""Bucketed serving tables: shuffle-free co-located joins.

The reference pre-shards its serving layer by composite row key into
HBase regions (``common/hbase_utils.py:421,485-526``). The Parquet-native
analog is Spark table bucketing: both fact tables are written
``bucketBy(N, key)``; any later equi-join on that key reads matching
buckets pairwise and skips the shuffle entirely — at 100 TB this removes
the single largest cost of the nightly archive joins (the re-attach of
tracklet ids on ``candid``, ``bin/ztf/merge.py:81-83``, is exactly this
shape when the per-night "small" side grows).

Bucketing beats a runtime ``repartition`` because the co-location is
*persisted*: every downstream job gets the free join, not just the one
that paid the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    nbuckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` matching the bucket columns additionally removes the
    per-partition Sort from later sort-merge joins. ``path`` makes the
    table external (data at ``path``, metadata in the session catalog).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(nbuckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    """Equi-join two identically-bucketed tables (no shuffle when bucket
    specs match and ``spark.sql.sources.bucketing.enabled`` is on)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
