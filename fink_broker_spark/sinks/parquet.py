"""Parquet sinks: streaming append + nightly compaction.

Re-expresses the reference's lake writers:
- checkpointed streaming append partitioned by night
  (``bin/ztf/stream2raw.py:136-167``)
- small-file compaction with statistics-driven coalesce
  (``bin/ztf/merge.py:52-91`` + ``common/partitioning.py:108-152``)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_broker_spark.plans.partitioning import estimate_coalesce_partitions


def stream_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    processing_time: str | None = None,
    available_now: bool = False,
):
    """Streaming parquet append sink, checkpointed, night-partitioned."""
    writer = (
        sdf.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", path)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def compact_night(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    target_partition_mb: float = 128.0,
    mode: str = "append",
    dynamic_overwrite: bool = False,
) -> int:
    """Rewrite a night's many small streaming files as ~128 MB files.

    Returns the partition count used. ``coalesce`` (not ``repartition``)
    on purpose: no shuffle — tasks merge co-located input splits, which is
    exactly what small-file compaction wants.
    """
    n = estimate_coalesce_partitions(df, target_partition_mb)
    writer = df.coalesce(n).write.mode(mode)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return n


def overwrite_night(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    target_partition_mb: float = 128.0,
) -> int:
    """Reprocess-one-night upsert: DYNAMIC partition overwrite.

    ``mode("overwrite")`` with ``partitionOverwriteMode=dynamic``
    replaces ONLY the partitions present in ``df`` (the night being
    re-run) and leaves every other night's directory untouched — the
    lake-level correction path when a night must be rebuilt after a
    science-module fix, without a table format and without rewriting
    history. Static overwrite (the Spark default) would silently drop
    every other partition under ``path``, which is why the mode is set
    explicitly on the writer rather than trusted to session config —
    and why empty ``partition_cols`` (which would make the overwrite
    unscoped) is refused outright.
    """
    if not partition_cols:
        raise ValueError(
            "overwrite_night without partition columns would statically "
            "overwrite the whole path; use compact_night(mode='overwrite') "
            "if that is really intended"
        )
    return compact_night(
        df,
        path,
        partition_cols,
        target_partition_mb,
        mode="overwrite",
        dynamic_overwrite=True,
    )


def idempotent_foreach_batch(
    path: str, partition_cols: tuple[str, ...] = ()
) -> Callable[[DataFrame, int], None]:
    """Exactly-once ``foreachBatch`` parquet writer.

    Structured Streaming guarantees at-least-once delivery to
    ``foreachBatch``: after a crash the last unacknowledged micro-batch is
    REPLAYED with the same ``batch_id``. The reference's external-store
    callbacks lean on store-side upserts for this (HBase puts,
    ``common/hbase_utils.py:363-482``); a parquet lake has no upsert, so
    idempotence comes from layout: every batch writes its own
    ``batch_id=N`` partition with DYNAMIC partition overwrite — a replayed
    batch overwrites exactly its own directory and nothing else. Works on
    any Hadoop filesystem (no driver-local renames).
    """

    def write(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", *partition_cols)
            .parquet(path)
        )

    return write
