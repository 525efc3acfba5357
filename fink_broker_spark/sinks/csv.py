"""CSV sink — the reference's Complete-output-mode workaround.

Structured Streaming's file sinks only support ``append``; the reference
dumps complete-mode aggregates to CSV by collecting each micro-batch to
pandas inside ``foreachBatch`` (``common/spark_utils.py:126-155``,
``to_csv_per_batch``). Same shape here: the per-batch table is a small
*aggregate* (nightly statistics), so the driver-side collect is bounded
by the aggregate's cardinality, never by the stream volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_csv_snapshot(df: DataFrame, path: str, batch_id: int | None = None) -> str:
    """Write one complete snapshot of (small, aggregated) ``df`` to CSV.

    Returns the file path; ``batch_id`` stamps streaming micro-batches
    so snapshots are totally ordered and idempotent on retry.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    target = path if batch_id is None else f"{path}.{batch_id:08d}"
    df.toPandas().to_csv(target, index=False)
    return target


def stream_complete_to_csv(sdf: DataFrame, path: str, **run_kwargs):
    """Run a complete-mode streaming aggregate into per-batch CSV
    snapshots via ``foreachBatch`` (the append-only-sink escape hatch,
    SURVEY.md §2.11)."""
    from fink_broker_spark.streaming.replay import run_stream

    return run_stream(
        sdf,
        output_mode="complete",
        fmt=None,
        foreach_batch=lambda bdf, bid: write_csv_snapshot(bdf, path, bid),
        **run_kwargs,
    )
