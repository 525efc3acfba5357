"""Filesystem operations through the Hadoop FileSystem API.

Spark writes through Hadoop's ``FileSystem`` abstraction, so any
directory management around those writes (staging swaps, cleanup) must
go through the same layer: driver-local ``shutil``/``os.rename`` only
works when the warehouse happens to be on the driver's local disk, and
silently breaks the crash-safety story on HDFS/S3 (reference keeps its
night directories on HDFS — ``fink_broker/common/spark_utils.py`` path
handling assumes a Hadoop-visible FS throughout).

Each helper resolves the ``FileSystem`` for the *path's own scheme*
(``Path.getFileSystem``), so ``file:``, ``hdfs:`` and ``s3a:`` prefixes
all route correctly from one code path.

Caveat for object stores: S3A "rename" is copy+delete, i.e. not atomic.
The staging-swap idiom (build → delete old → rename) is crash-safe on
HDFS and local FS where rename is atomic; on S3A it narrows but does not
close the window. That is a property of the store, not of this wrapper.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; returns False if the path did not exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory rename via the FS layer (atomic on HDFS/local FS).

    Hadoop's ``rename(src, dst)`` moves *into* ``dst`` when ``dst`` is an
    existing directory; the staging-swap contract wants replace-at-path,
    so the destination must not exist — callers delete it first.
    """
    fs, hsrc = _fs_and_path(spark, src)
    _, hdst = _fs_and_path(spark, dst)
    if fs.exists(hdst):
        raise FileExistsError(
            f"rename target exists: {dst} (delete it first for a swap)"
        )
    if not fs.rename(hsrc, hdst):
        raise OSError(f"hadoop rename failed: {src} -> {dst}")
