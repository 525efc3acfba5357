"""Spark 4 Python DataSource: the custom alert-replay format."""

from __future__ import annotations

import pyspark.sql.functions as F

from fink_broker_spark.sources.alert_source import (
    _EVENT_TYPES,
    _mix,
    register,
)


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("alert_replay")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_alert_source_partition_parallel_and_deterministic(spark):
    df = _read(spark, rows=500, partitions=5, seed=7)
    assert df.count() == 500
    # generation really fans out: one task slice per requested partition
    assert df.select(F.spark_partition_id()).distinct().count() == 5
    # bit-identical across reads (the property oracle checks rely on)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, rows=500, partitions=5, seed=7).collect()))
    assert a == b
    # a different seed produces different content, same shape
    c = sorted(map(tuple, _read(spark, rows=500, partitions=5, seed=8).collect()))
    assert c != a and len(c) == 500


def test_alert_source_content_matches_reference_mix(spark):
    """Executor-side generation == the same splitmix64 recipe run on the
    driver: the format is a contract, not a black box."""
    rows = 50
    df = _read(spark, rows=rows, partitions=3, seed=42).orderBy("event_id")
    got = [(r.event_id, r.user_id, r.event_type, r.value) for r in df.collect()]
    expected = []
    for i in range(rows):
        h = _mix(i ^ (42 << 32))
        expected.append(
            (
                i,
                h % 1000,
                _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
                ((h >> 16) % 1_000_000) / 1000.0,
            )
        )
    assert got == expected


def test_alert_source_composes_with_engine_operators(spark):
    """The format is a first-class scan: grouped aggregates and filters
    compose like any other source."""
    df = _read(spark, rows=2000, partitions=8)
    agg = df.filter(F.col("value") >= 0).groupBy("event_type").count()
    rows = {r.event_type: r["count"] for r in agg.collect()}
    assert set(rows) <= set(_EVENT_TYPES)
    assert sum(rows.values()) == 2000


def test_alert_source_streaming_microbatch_replay(spark):
    """The streaming face of the format: micro-batch replay with
    per-trigger backpressure drains the identical rows the batch scan
    produces, across multiple triggers."""
    import time

    register(spark)
    sdf = (
        spark.readStream.format("alert_replay")
        .option("rows", 600)
        .option("rows_per_batch", 200)
        .option("seed", 3)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("alert_stream")
        .outputMode("append")
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if spark.table("alert_stream").count() >= 600:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)

    streamed = sorted(map(tuple, spark.table("alert_stream").collect()))
    batch = sorted(
        map(tuple, _read(spark, rows=600, partitions=4, seed=3).collect())
    )
    assert streamed == batch
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3


def test_alert_writer_manifest_roundtrip(spark, tmp_path):
    """Write half of the custom format: per-task files + driver-side
    atomic manifest; reading through the manifest returns exactly the
    written rows and ignores orphan (uncommitted-attempt) files."""
    import json
    import os

    from fink_broker_spark.sources.alert_source import (
        MANIFEST_NAME,
        read_archive,
        register,
    )

    register(spark)
    df = (
        spark.read.format("alert_replay")
        .option("rows", 200)
        .option("partitions", 4)
        .load()
    )
    out = str(tmp_path / "archive")
    df.write.format("alert_replay").option("path", out).mode("append").save()

    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        doc = json.load(fh)
    assert doc["total_rows"] == 200
    assert len(doc["files"]) == 4
    assert sum(f["rows"] for f in doc["files"]) == 200

    # plant an orphan: a speculative/failed attempt's file — the
    # manifest-scoped reader must not see it
    with open(os.path.join(out, "part-r99999-t999.jsonl"), "w") as fh:
        fh.write('{"event_id": 999999}\n')

    back = read_archive(spark, out)
    assert back.count() == 200
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_alert_writer_abort_removes_files(spark, tmp_path):
    """abort() deletes the named task files and leaves no manifest, so
    a failed job is invisible to manifest readers."""
    import os

    from fink_broker_spark.sources.alert_source import (
        MANIFEST_NAME,
        AlertArchiveWriter,
        _FileCommit,
    )

    out = str(tmp_path / "aborted")
    os.makedirs(out)
    for fname in ("part-r00000-t1.jsonl", "part-r00001-t2.jsonl"):
        with open(os.path.join(out, fname), "w") as fh:
            fh.write("{}\n")
    w = AlertArchiveWriter({"path": out}, overwrite=False)
    w.abort(
        [_FileCommit("part-r00000-t1.jsonl", 1), None,
         _FileCommit("part-r00001-t2.jsonl", 1)]
    )
    assert os.listdir(out) == []
    assert not os.path.exists(os.path.join(out, MANIFEST_NAME))


def test_alert_stream_writer_per_batch_manifests(spark, tmp_path):
    """writeStream through the custom format: one manifest per
    microbatch; the manifest-union reader recovers exactly the streamed
    rows; idempotent re-commit of a batch id replaces (not appends) that
    batch's file list."""
    import glob
    import json
    import os

    from fink_broker_spark.sources.alert_source import (
        AlertArchiveStreamWriter,
        _FileCommit,
        read_stream_archive,
        register,
    )

    register(spark)
    out = str(tmp_path / "stream_archive")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("alert_replay")
        .option("rows", 100)
        .option("rows_per_batch", 40)
        .load()
    )
    # default trigger: availableNow computes one catch-all batch for the
    # simple stream reader, so drive normal micro-batches and stop once
    # everything committed (same idiom as the replay test above)
    import time

    q = (
        stream.writeStream.format("alert_replay")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        mfs = glob.glob(os.path.join(out, "_MANIFEST-batch-*.json"))
        done = 0
        for mf in mfs:
            try:
                with open(mf) as fh:
                    done += json.load(fh)["total_rows"]
            except (OSError, json.JSONDecodeError):
                pass
        if done >= 100:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)

    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST-batch-*.json")))
    assert len(manifests) >= 3  # 40 + 40 + 20 (+ possible empty batches)
    totals = []
    for mf in manifests:
        with open(mf) as fh:
            totals.append(json.load(fh)["total_rows"])
    assert sum(totals) == 100

    back = read_stream_archive(spark, out)
    batch = (
        spark.read.format("alert_replay").option("rows", 100).load()
    )
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in batch.collect()
    }

    # replayed batch: re-commit of batchId 1 with a different file list
    # must REPLACE the manifest — the union reader sees no duplicates
    w = AlertArchiveStreamWriter({"path": out}, overwrite=False)
    with open(os.path.join(out, "_MANIFEST-batch-00001.json")) as fh:
        batch1_rows = json.load(fh)["total_rows"]
    with open(os.path.join(out, "replay-file.jsonl"), "w") as fh:
        fh.write('{"event_id": 0, "ts": "2024-01-01T00:00:00", '
                 '"user_id": 0, "event_type": "click", "value": 0.0, '
                 '"props": "{}"}\n')
    w.commit([_FileCommit("replay-file.jsonl", 1)], batchId=1)
    with open(os.path.join(out, "_MANIFEST-batch-00001.json")) as fh:
        doc = json.load(fh)
    assert [f["file"] for f in doc["files"]] == ["replay-file.jsonl"]
    assert read_stream_archive(spark, out).count() == 100 - batch1_rows + 1


def test_alert_stream_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Kill the stream mid-replay, restart on the SAME checkpoint: the
    resumed query continues from the recorded offset (no re-read of
    served rows) and the manifest-union view ends bit-identical to the
    batch read — exactly-once across a real restart, not just an
    idempotent re-commit call."""
    import glob
    import json
    import os
    import time

    from fink_broker_spark.sources.alert_source import (
        read_stream_archive,
        register,
    )

    register(spark)
    out = str(tmp_path / "restart_archive")
    ckpt = str(tmp_path / "restart_ckpt")

    def start():
        return (
            spark.readStream.format("alert_replay")
            .option("rows", 600)
            .option("rows_per_batch", 150)
            .option("seed", 11)
            .load()
            .writeStream.format("alert_replay")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def committed():
        total = 0
        for mf in glob.glob(os.path.join(out, "_MANIFEST-batch-*.json")):
            try:
                with open(mf) as fh:
                    total += json.load(fh)["total_rows"]
            except (OSError, json.JSONDecodeError):
                pass
        return total

    q = start()
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline and committed() < 150:
        time.sleep(0.2)
    q.stop()  # hard stop mid-replay
    q.awaitTermination(30)
    mid = committed()
    assert 150 <= mid < 600

    q2 = start()
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline and committed() < 600:
        time.sleep(0.2)
    q2.stop()
    q2.awaitTermination(30)
    assert committed() == 600

    back = read_stream_archive(spark, out)
    batch = (
        spark.read.format("alert_replay")
        .option("rows", 600)
        .option("seed", 11)
        .load()
    )
    streamed = sorted(map(tuple, back.collect()))
    expected = sorted(map(tuple, batch.collect()))
    assert streamed == expected  # no loss, no duplicates


def test_read_stream_archive_time_travel(spark, tmp_path):
    """upto_batch reconstructs the archive as of an earlier batch: each
    per-batch manifest is an immutable generation marker."""
    import os

    from fink_broker_spark.sources.alert_source import (
        AlertArchiveStreamWriter,
        _FileCommit,
        read_stream_archive,
    )

    out = str(tmp_path / "tt")
    os.makedirs(out)
    w = AlertArchiveStreamWriter({"path": out}, overwrite=False)
    for batch in range(3):
        fname = f"part-b{batch}.jsonl"
        with open(os.path.join(out, fname), "w") as fh:
            fh.write(
                f'{{"event_id": {batch}, "ts": "2024-01-01T00:00:0{batch}", '
                f'"user_id": {batch}, "event_type": "click", '
                f'"value": 1.0, "props": "{{}}"}}\n'
            )
        w.commit([_FileCommit(fname, 1)], batchId=batch)

    assert read_stream_archive(spark, out).count() == 3
    snap = read_stream_archive(spark, out, upto_batch=1)
    assert sorted(r.event_id for r in snap.collect()) == [0, 1]
    assert read_stream_archive(spark, out, upto_batch=0).count() == 1
    assert read_stream_archive(spark, out, upto_batch=-1).count() == 0
