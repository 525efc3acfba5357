"""End-to-end night replay: the reference's four-stage topology on the
synthetic lake (SURVEY.md §3; mirrors the CI pipeline
``bin/fink_test_ztf:100-148``).

stream2raw (file stream → partitioned raw lake) → raw2science (stream the
raw lake, quality cuts + enrichment, science lake) → distribute (named
boolean filters → per-topic substreams) → archive (compaction-sized
write, salted index table, nightly statistics) — with the batch answer as
the oracle at each stage.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from fink_broker_spark.archive.index_tables import (
    build_index_table,
    write_index_table,
)
from fink_broker_spark.archive.statistics import nightly_statistics
from fink_broker_spark.core.time import ensure_event_ts, with_night_partitions
from fink_broker_spark.distribute.fanout import FilterRegistry, fan_out
from fink_broker_spark.enrich.pipeline import EnrichmentPipeline, Processor
from fink_broker_spark.sinks.parquet import stream_to_parquet
from fink_broker_spark.sources.parquet import file_stream, wait_for_path
from fink_broker_spark.streaming.replay import run_stream
from tests.conftest import SF0001


def test_four_stage_night(spark, tmp_path):
    stage = str(tmp_path / "incoming")
    os.makedirs(stage)
    os.symlink(
        os.path.join(SF0001, "events.parquet"),
        os.path.join(stage, "events.parquet"),
    )
    raw = str(tmp_path / "raw")
    science = str(tmp_path / "science")

    # -- stage 1: stream2raw — decode-equivalent + night partitioning
    sdf = file_stream(spark, stage)
    enriched = with_night_partitions(
        ensure_event_ts(sdf), "ts"
    ).withColumn("publisher", F.lit("fbs"))
    q1 = stream_to_parquet(enriched, raw, str(tmp_path / "c1"), available_now=True)
    q1.awaitTermination(120)
    assert wait_for_path(raw, 10)

    # -- stage 2: raw2science — stream the raw lake, cuts + enrichment
    pipeline = (
        EnrichmentPipeline()
        .add(
            Processor(
                name="value_score",
                inputs=["value"],
                output="score",
                fn=lambda v: F.least(F.lit(1.0), F.col(v) / F.lit(100.0)),
            )
        )
        .add(
            Processor(
                name="is_transient",
                inputs=["score", "event_type"],
                output="is_transient",
                fn=lambda s, t: (F.col(s) > 0.5) & (F.col(t) != "error"),
            )
        )
    )
    raw_stream = file_stream(spark, raw)
    sci = pipeline.apply(raw_stream.filter(F.col("value") >= 0))
    q2 = stream_to_parquet(sci, science, str(tmp_path / "c2"), available_now=True)
    q2.awaitTermination(120)
    assert wait_for_path(science, 10)

    sci_batch = spark.read.parquet(science)
    n_raw = spark.read.parquet(raw).count()
    assert sci_batch.count() == n_raw == 1000
    assert {"score", "is_transient", "publisher"} <= set(sci_batch.columns)

    # -- stage 3: distribute — filter registry fan-out, one sink per topic
    reg = (
        FilterRegistry()
        .register("transients", lambda df: F.col("is_transient"))
        .register("high_score", lambda df: F.col("score") >= 0.99)
    )
    counts = fan_out(
        spark.read.parquet(science), reg, sink=lambda t, fdf: fdf.count()
    )
    expect_transients = sci_batch.filter(
        (F.col("score") > 0.5) & (F.col("event_type") != "error")
    ).count()
    assert counts["transients"] == expect_transients > 0
    assert counts["high_score"] > 0

    # -- stage 4: archive — salted index table + nightly statistics
    idx = build_index_table(
        sci_batch,
        flatten_plan={
            "objectId": ("user_id", "string"),
            "jd": ("event_id", "double"),
            "score": ("score", "double"),
        },
        key_cols=["objectId", "jd"],
    )
    out = str(tmp_path / "index_user")
    write_index_table(idx, out)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select("rowkey").distinct().count() == 1000

    stats = nightly_statistics(
        sci_batch,
        filtered_counts={"n_transient": F.col("is_transient")},
        distinct_counts=["user_id", "event_type"],
        sums={"sum_score": F.col("score")},
    ).collect()[0]
    assert stats.n_total == 1000
    assert stats.n_transient == expect_transients
    assert stats.n_distinct_event_type == 5


def test_datasource_front_full_topology(spark, tmp_path):
    """The composed replay with the Python DataSource at the FRONT
    (reference topology ``bin/ztf/stream2raw.py:48-184`` →
    ``raw2science.py:40-146`` → ``distribute.py:53-223`` →
    ``merge.py:29-91``): ``readStream.format("alert_replay")`` →
    fused enrichment (one Arrow boundary for the pandas chain) →
    filter-registry fan-out, ONE streaming query per topic, each
    writing through the manifest-committed custom-format stream sink →
    stats-driven compaction of a topic archive — asserting batch ≡
    stream at every stage (the reference CI's implicit invariant,
    SURVEY.md §7.2.3)."""
    import glob
    import json
    import time

    from fink_broker_spark.sinks.parquet import compact_night
    from fink_broker_spark.sources.alert_source import (
        read_stream_archive,
        register,
    )

    register(spark)
    OPTS = {"rows": "800", "rows_per_batch": "300", "seed": "7"}

    pipe = (
        EnrichmentPipeline()
        .add(
            Processor(
                name="score",
                inputs=["value"],
                output="score",
                pandas_fn=lambda v: v / 1000.0,
                dtype="double",
            )
        )
        .add(
            Processor(
                name="transient_flag",
                inputs=["score", "event_type"],
                output="transient_flag",
                pandas_fn=lambda s, t: (s > 0.25) & (t != "error"),
                dtype="boolean",
            )
        )
        .add(
            Processor(
                name="topic_key",
                inputs=["user_id"],
                output="topic_key",
                fn=lambda u: F.pmod(F.col(u), F.lit(10)),
            )
        )
    )

    # batch oracle: same options through the batch face of the format
    batch = spark.read.format("alert_replay").options(**OPTS).load()
    sci_batch = pipe.apply(batch)
    # the dependent pandas chain fused to ONE Arrow boundary
    plan = sci_batch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1

    reg = (
        FilterRegistry()
        .register("transients", lambda df: F.col("transient_flag"))
        .register("clicks", lambda df: F.col("event_type") == "click")
    )
    expect = {
        name: sci_batch.filter(reg.filters[name](sci_batch)).count()
        for name in reg.names()
    }
    assert min(expect.values()) > 0

    # streaming face: enrich the stream, fan out one query per topic
    sdf = spark.readStream.format("alert_replay").options(**OPTS).load()
    sci_stream = pipe.apply(sdf)

    def topic_sink(name, fdf):
        return (
            fdf.writeStream.format("alert_replay")
            .option("path", str(tmp_path / name))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )

    handles = fan_out(sci_stream, reg, sink=topic_sink)

    def committed(name):
        total = 0
        for mf in glob.glob(str(tmp_path / name / "_MANIFEST-batch-*.json")):
            try:
                with open(mf) as fh:
                    total += json.load(fh)["total_rows"]
            except (OSError, json.JSONDecodeError):
                pass
        return total

    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        if all(committed(n) >= expect[n] for n in reg.names()):
            break
        time.sleep(0.3)
    for q in handles.values():
        q.stop()
        q.awaitTermination(30)

    # batch ≡ stream, full enriched rows, through the manifest view only
    for name in reg.names():
        got = read_stream_archive(
            spark, str(tmp_path / name), schema=sci_batch.schema
        )
        want = sci_batch.filter(reg.filters[name](sci_batch))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), name

    # merge stage: compact the transients archive into night partitions
    arch = read_stream_archive(
        spark, str(tmp_path / "transients"), schema=sci_batch.schema
    )
    nightly = with_night_partitions(ensure_event_ts(arch), "ts")
    compacted = str(tmp_path / "compacted")
    compact_night(nightly, compacted)
    back = spark.read.parquet(compacted)
    assert back.count() == expect["transients"]
    assert {"year", "month", "day"} <= set(back.columns)
