"""CLI service parity: the four services drive a full night end-to-end
(the reference's ``fink start <service>`` surface, ``bin/fink:31-160``)."""

from __future__ import annotations

import os

from tests.conftest import SF0001


def test_cli_four_services(spark, tmp_path):
    from fink_broker_spark.cli import main

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    os.symlink(
        os.path.join(SF0001, "events.parquet"),
        os.path.join(incoming, "events.parquet"),
    )
    raw = str(tmp_path / "raw")
    sci = str(tmp_path / "science")
    topics = str(tmp_path / "topics")
    arch = str(tmp_path / "archive")
    night = "20240101"

    main([
        "stream2raw", "-incoming", incoming, "-rawdata_prefix", raw,
        "-night", night, "-available_now", "-cpus", "8",
    ])
    assert os.path.isdir(os.path.join(raw, f"night={night}"))

    main([
        "raw2science", "-rawdata_prefix", raw, "-science_prefix", sci,
        "-night", night, "-available_now", "-cpus", "8",
        "-quality_cut", "value >= 0",
    ])
    sci_df = spark.read.parquet(os.path.join(sci, f"night={night}"))
    assert sci_df.count() == 1000
    assert "score" in sci_df.columns

    outs = main([
        "distribute", "-science_prefix", sci, "-out_prefix", topics,
        "-night", night, "-cpus", "8",
        "-filter", "purchases:event_type = 'purchase'",
        "-filter", "high:score >= 0.99",
    ])
    assert set(outs) == {"purchases", "high"}
    n_purch = spark.read.parquet(outs["purchases"]).count()
    assert n_purch == sci_df.filter("event_type = 'purchase'").count() > 0

    index = str(tmp_path / "index")
    stats = main([
        "archive", "-science_prefix", sci, "-archive_prefix", arch,
        "-night", night, "-cpus", "8",
        "-index_prefix", index, "-chunk_files", "1",
    ])
    assert stats["n_total"] == 1000
    assert stats["compaction_partitions"] >= 1
    # stepped index build: one chunk per compacted file, all rows indexed
    assert stats["index_chunks"] >= 1
    assert stats["index_rows"] == 1000
    idx = spark.read.parquet(os.path.join(index, f"night={night}"))
    assert idx.count() == 1000
    assert {"rowkey", "salt_bucket"} <= set(idx.columns)

    # rerunning the archive must be idempotent: the night's index is
    # rebuilt, not appended to
    main([
        "archive", "-science_prefix", sci, "-archive_prefix", arch,
        "-night", night, "-cpus", "8",
        "-index_prefix", index, "-chunk_files", "1",
    ])
    idx2 = spark.read.parquet(os.path.join(index, f"night={night}"))
    assert idx2.count() == 1000


def test_hadoop_fs_swap_helpers(spark, tmp_path):
    """The staging swap goes through the Hadoop FileSystem layer: delete
    is recursive and idempotent, rename is replace-at-path (target must
    not exist), and both see directories Spark wrote."""
    from fink_broker_spark.core import fs as hfs

    src = str(tmp_path / "build")
    dst = str(tmp_path / "serve")
    spark.range(10).write.parquet(src)
    spark.range(5).write.parquet(dst)
    assert hfs.exists(spark, src) and hfs.exists(spark, dst)
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        hfs.rename(spark, src, dst)
    assert hfs.delete(spark, dst) is True
    assert hfs.delete(spark, dst) is False  # idempotent
    hfs.rename(spark, src, dst)
    assert not hfs.exists(spark, src)
    assert spark.read.parquet(dst).count() == 10


def test_cli_archive_zorder(spark, tmp_path):
    """-zorder rewrites the compacted night clustered on the Morton key:
    same rows, and per-file (user_id, event_id) min/max ranges tighten
    versus the unclustered write."""
    import pyspark.sql.functions as F

    from fink_broker_spark.cli import main
    from fink_broker_spark.core.time import ensure_event_ts, with_night_partitions
    from fink_broker_spark.sources.parquet import load_table
    from tests.conftest import SF0001

    night = "20240101"
    sci = str(tmp_path / "science")
    arch = str(tmp_path / "arch")
    ev = with_night_partitions(load_table(spark, SF0001, "events"), "ts")
    ev.limit(1000).drop("ts").write.partitionBy("year", "month", "day").parquet(
        os.path.join(sci, f"night={night}")
    )
    stats = main([
        "archive", "-science_prefix", sci, "-archive_prefix", arch,
        "-night", night, "-cpus", "8", "-zorder", "user_id,event_id",
    ])
    out = spark.read.parquet(os.path.join(arch, f"night={night}"))
    assert out.count() == 1000
    assert stats["n_total"] == 1000


def test_cli_distribute_single_pass(spark, tmp_path):
    """-single_pass routes every topic in one scan, partitioned by
    topic, with per-topic contents identical to the per-query path."""
    from fink_broker_spark.cli import main

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    os.symlink(
        os.path.join(SF0001, "events.parquet"),
        os.path.join(incoming, "events.parquet"),
    )
    raw = str(tmp_path / "raw")
    sci = str(tmp_path / "science")
    night = "20240101"
    main([
        "stream2raw", "-incoming", incoming, "-rawdata_prefix", raw,
        "-night", night, "-available_now", "-cpus", "8",
    ])
    main([
        "raw2science", "-rawdata_prefix", raw, "-science_prefix", sci,
        "-night", night, "-available_now", "-cpus", "8",
    ])
    filters = [
        "-filter", "purchases:event_type = 'purchase'",
        "-filter", "errors:event_type = 'error'",
    ]
    multi = main([
        "distribute", "-science_prefix", sci,
        "-out_prefix", str(tmp_path / "multi"), "-night", night,
        "-cpus", "8", *filters,
    ])
    single = main([
        "distribute", "-science_prefix", sci,
        "-out_prefix", str(tmp_path / "single"), "-night", night,
        "-cpus", "8", "-single_pass", *filters,
    ])
    assert set(single) == set(multi) == {"purchases", "errors"}
    routed = spark.read.parquet(single["purchases"])
    for topic in ("purchases", "errors"):
        got = sorted(
            r.event_id
            for r in routed.filter(f"__topic = '{topic}'").collect()
        )
        want = sorted(
            r.event_id for r in spark.read.parquet(multi[topic]).collect()
        )
        assert got == want and got
