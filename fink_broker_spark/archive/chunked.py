"""Chunked batch ingest: process a night's files in bounded groups.

The reference's archival loaders walk the night directory and ingest 10
files (ZTF) / 100 files (Rubin) at a time (``bin/ztf/archive_science.py:
60-66``, ``bin/rubin/archive_science.py:84``), so one failed or skewed
chunk never takes down the whole night and the serving-store bulk load
stays bounded. Listing uses the file-index Spark already builds
(``DataFrame.inputFiles``) — no separate filesystem walker needed
(replaces the py4j HDFS listing, ``common/spark_utils.py:490-516``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def list_night_files(spark: SparkSession, path: str) -> list[str]:
    """Deterministically ordered data files under ``path``."""
    return sorted(spark.read.parquet(path).inputFiles())


def ingest_chunks(
    spark: SparkSession,
    path: str,
    process: Callable[[DataFrame, int], object],
    chunk_files: int = 10,
) -> list[object]:
    """Apply ``process(chunk_df, chunk_index)`` to successive groups of
    ``chunk_files`` files from ``path``; returns the per-chunk results.

    Each chunk is an independent Spark job over an explicit file list —
    retryable in isolation, bounded memory at the sink, and the scan
    still prunes columns/predicates per chunk.
    """
    files = list_night_files(spark, path)
    results: list[object] = []
    for i in range(0, len(files), chunk_files):
        chunk = spark.read.parquet(*files[i : i + chunk_files])
        results.append(process(chunk, i // chunk_files))
    return results
