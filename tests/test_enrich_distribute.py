"""Enrichment pipeline, classification cascade, distribution fan-out,
schema registry, spatial pixelization, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row

from fink_broker_spark.distribute.fanout import FilterRegistry, fan_out
from fink_broker_spark.enrich.pipeline import EnrichmentPipeline, Processor
from fink_broker_spark.ext.multimodal import extract_features, pack_media
from fink_broker_spark.functions.spatial import (
    ang2pix_ring_np,
    ang2pix_udf,
    grid_pixel_expr,
    neighbor_pixels_expr,
)
from fink_broker_spark.operators.classify import classification_cascade, ztf_like_rules
from fink_broker_spark.operators.tracklets import grouped_clusters
from fink_broker_spark.schema.registry import SchemaRegistry
from fink_broker_spark.sinks.kafka import serialize_payload
from fink_broker_spark.sources.kafka import KafkaSourceConfig
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


def test_pipeline_history_expansion_and_temp_cleanup(spark):
    df = spark.createDataFrame(
        [
            Row(
                objectId="a",
                candidate=Row(magpsf=17.0, rb=0.9),
                prv_candidates=[Row(magpsf=18.0, rb=0.8), Row(magpsf=19.0, rb=0.7)],
            )
        ]
    )
    pipe = EnrichmentPipeline(
        history_fields=["magpsf"],
        processors=[
            Processor("nhist", ["cmagpsf"], "nhist", lambda c: F.size(c)),
            Processor("tmp", ["rb_missing"], "tmp", lambda c: F.lit(1)),
            Processor(
                "t2", ["objectId"], "t2", lambda c: F.lit("x"), temporary=True
            ),
        ],
    )
    out = pipe.apply(df)
    assert "cmagpsf" in out.columns
    assert "t2" not in out.columns  # temporary dropped
    assert "tmp" not in out.columns  # missing-input processor skipped
    assert out.first().nhist == 3


def test_ztf_cascade_priority(spark):
    df = spark.createDataFrame(
        [
            Row(candidate=Row(ssnamenr="1234", nbad=0, rb=0.9, ndethist=1)),
            Row(candidate=Row(ssnamenr="null", nbad=3, rb=0.9, ndethist=1)),
            Row(candidate=Row(ssnamenr="null", nbad=0, rb=0.9, ndethist=1)),
            Row(candidate=Row(ssnamenr="null", nbad=0, rb=0.9, ndethist=9)),
            Row(candidate=Row(ssnamenr="null", nbad=0, rb=0.1, ndethist=9)),
        ]
    )
    out = df.select(classification_cascade(ztf_like_rules()).alias("c"))
    assert [r.c for r in out.collect()] == [
        "Solar System Object",
        "Artefact",
        "Transient Candidate",
        "Variable Candidate",
        "Unknown",
    ]


def test_fan_out_topics(spark):
    ev = load_table(spark, SF0001, "events")
    reg = (
        FilterRegistry()
        .register("purchases", lambda df: F.col("event_type") == "purchase")
        .register("high_value", lambda df: F.col("value") >= 900)
    )
    counts = fan_out(ev, reg, lambda name, df: df.count())
    assert set(counts) == {"purchases", "high_value"}
    assert counts["purchases"] == ev.filter("event_type = 'purchase'").count()


def test_serialize_payload_schema_as_key(spark):
    ev = load_table(spark, SF0001, "events").limit(5)
    payload = serialize_payload(ev, columns=["event_id", "event_type"])
    rows = payload.collect()
    assert set(payload.columns) == {"key", "value"}
    import json

    key_schema = json.loads(rows[0].key)
    assert [f["name"] for f in key_schema["fields"]] == ["event_id", "event_type"]
    body = json.loads(bytes(rows[0].value))
    assert set(body) == {"event_id", "event_type"}


def test_distribution_cast_plan(spark):
    """Schema-driven distribute-stage casts: timestamps become strings,
    structs are re-wrapped with all-nullable fields, arrays survive the
    explode(array(col)) nullability laundering row-for-row."""
    from pyspark.sql.types import ArrayType, StringType, StructType

    from fink_broker_spark.sinks.kafka import distribution_cast_plan

    df = spark.createDataFrame(
        [(1, "2024-01-02 03:04:05.123456", (7, "a"), [1.5, 2.5])],
        "id bigint, ts string, meta struct<n:int,s:string>, hist array<double>",
    ).withColumn("ts", F.to_timestamp("ts"))
    # make the struct fields non-nullable to prove the rewrap relaxes them
    planned = distribution_cast_plan(df)
    fields = {f.name: f for f in planned.schema.fields}
    assert isinstance(fields["ts"].dataType, StringType)
    assert isinstance(fields["meta"].dataType, StructType)
    assert all(sub.nullable for sub in fields["meta"].dataType.fields)
    assert isinstance(fields["hist"].dataType, ArrayType)
    rows = planned.collect()
    assert len(rows) == 1
    assert rows[0].hist == [1.5, 2.5]
    assert rows[0].meta.n == 7 and rows[0].meta.s == "a"
    assert rows[0].ts.startswith("2024-01-02 03:04:05")
    assert rows[0].id == 1


def test_kafka_source_config_options():
    cfg = KafkaSourceConfig(
        servers="broker:9092",
        topic_pattern="ztf_.*",
        max_offsets_per_trigger=10000,
        security_options={"kafka.security.protocol": "SASL_PLAINTEXT"},
    )
    opts = cfg.options()
    assert opts["subscribePattern"] == "ztf_.*"
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"


def test_schema_registry_roundtrip(spark, tmp_path):
    reg = SchemaRegistry(str(tmp_path / "schemas"))
    ev = load_table(spark, SF0001, "events")
    reg.save_from_dataframe("events", "v1", ev)
    loaded = reg.load("events", "v1")
    assert loaded == ev.schema
    assert reg.versions("events") == ["v1"]
    stamped = SchemaRegistry.stamp_version(ev, "v1")
    assert SchemaRegistry.read_version(stamped) == "v1"


def test_versioned_select_mixed_version_night(spark, tmp_path):
    """Two schema versions written into one night directory load back in
    a single pass with per-version casts and defaults applied — the
    mixed-version night the reference handles with per-version column
    dictionaries (``rubin/hbase_utils.py:170-230``)."""
    from fink_broker_spark.schema.registry import versioned_select

    night = str(tmp_path / "night")
    # v1 has (id, flux); v2 adds snr and widens flux semantics
    spark.createDataFrame(
        [(1, 10.0, "v1"), (2, None, "v1")],
        "id bigint, flux double, schema_version string",
    ).write.parquet(night + "/a.parquet")
    spark.createDataFrame(
        [(3, 30.0, 5.5, "v2"), (4, 40.0, None, "v2")],
        "id bigint, flux double, snr double, schema_version string",
    ).write.parquet(night + "/b.parquet")

    reg = SchemaRegistry(str(tmp_path / "schemas"))
    reg.save_plan("alerts", "v1", {"id": ("bigint", -1), "flux": ("double", 0.0)})
    reg.save_plan(
        "alerts",
        "v2",
        {"id": ("bigint", -1), "flux": ("double", 0.0), "snr": ("double", -9.0)},
    )
    assert reg.plan_versions("alerts") == ["v1", "v2"]

    mixed = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(night)
    )
    plans = {v: reg.load_plan("alerts", v) for v in reg.plan_versions("alerts")}
    out = versioned_select(mixed, plans)
    got = {r.id: (r.flux, r.snr, r.schema_version) for r in out.collect()}
    assert got == {
        1: (10.0, None, "v1"),  # snr absent from v1's plan -> typed NULL
        2: (0.0, None, "v1"),  # NULL flux defaulted per v1's plan
        3: (30.0, 5.5, "v2"),
        4: (40.0, -9.0, "v2"),  # NULL snr defaulted per v2's plan
    }
    assert [f.name for f in out.schema.fields] == [
        "flux",
        "id",
        "snr",
        "schema_version",
    ]


def test_healpix_invariants():
    nside = 16
    npix = 12 * nside * nside
    rng = np.random.default_rng(7)
    ra = rng.uniform(0, 360, 5000)
    dec = np.rad2deg(np.arcsin(rng.uniform(-1, 1, 5000)))  # uniform on sphere
    pix = ang2pix_ring_np(ra, dec, nside)
    assert pix.min() >= 0 and pix.max() < npix
    # equal-area property: uniform sky → roughly uniform pixel occupancy
    counts = np.bincount(pix, minlength=npix)
    assert counts.max() <= 5000 / npix * 6
    # poles land in the first / last pixels' rings
    assert ang2pix_ring_np(np.array([0.0]), np.array([89.999]), nside)[0] < 4
    assert ang2pix_ring_np(np.array([0.0]), np.array([-89.999]), nside)[0] >= npix - 4
    # nearby points share or neighbor pixels: same point → same pixel
    p1 = ang2pix_ring_np(np.array([120.0]), np.array([30.0]), nside)
    p2 = ang2pix_ring_np(np.array([120.0]), np.array([30.0]), nside)
    assert p1[0] == p2[0]


def test_healpix_udf_matches_numpy(spark):
    df = spark.createDataFrame(
        [Row(ra=float(r), dec=float(d)) for r, d in [(0, 0), (120, 45), (359, -89), (180, 89)]]
    )
    out = df.withColumn("pix", ang2pix_udf(64)("ra", "dec")).collect()
    for row in out:
        expected = ang2pix_ring_np(np.array([row.ra]), np.array([row.dec]), 64)[0]
        assert row.pix == expected


def test_grid_neighbor_join_crossmatch(spark):
    """Cone-search-style bucket join: points within one cell collide."""
    pts = spark.createDataFrame(
        [Row(pid=1, ra=10.2, dec=0.1), Row(pid=2, ra=200.0, dec=-45.0)]
    )
    cat = spark.createDataFrame(
        [Row(cid=100, ra=10.5, dec=0.3), Row(cid=200, ra=210.0, dec=-45.0)]
    )
    cat_b = cat.select(
        "cid", grid_pixel_expr("ra", "dec", 1.0).alias("pix")
    )
    pts_b = pts.select(
        "pid", F.explode(neighbor_pixels_expr("ra", "dec", 1.0)).alias("pix")
    )
    matches = pts_b.join(cat_b, on="pix").select("pid", "cid").collect()
    assert (1, 100) in [tuple(r) for r in matches]
    assert (2, 200) not in [tuple(r) for r in matches]  # 10° apart


def test_multimodal_feature_stub(spark):
    ev = load_table(spark, SF0001, "events").limit(20)
    media = pack_media(ev, "event_id", F.col("props").cast("binary"), "blob")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 20
    for row in feats:
        assert len(row.features) == 8
        assert len(row.content_sha256) == 64
    # determinism: same payload → same features
    again = extract_features(media, dim=8).collect()
    assert sorted(r.features[0] for r in feats) == sorted(
        r.features[0] for r in again
    )


def test_grouped_clusters_labels(spark):
    df = spark.createDataFrame(
        [Row(g=1, event_id=i, value=v) for i, v in enumerate([1.0, 1.5, 2.0, 50.0, 50.2, 99.0])]
    )
    out = grouped_clusters(
        df.withColumnRenamed("g", "jd"), "jd", "value", gap=5.0, min_size=2
    ).collect()
    by_val = {r.value: r.cluster_id for r in out}
    assert by_val[1.0] == by_val[1.5] == by_val[2.0] != ""
    assert by_val[50.0] == by_val[50.2] != ""
    assert by_val[50.0] != by_val[1.0]
    assert by_val[99.0] == ""  # singleton below min_size


def test_pandas_udf_chain_fuses_to_one_arrow_pass(spark):
    """SURVEY §7.3 hard part 4 (UDF throughput): pandas-UDF processors
    applied as a withColumn chain — the enrichment pipeline's shape —
    collapse into a SINGLE ArrowEvalPython node (one JVM↔Python
    round-trip per batch), even when one UDF consumes another's output
    (Spark 4 chains them inside the same Python worker pass). The ~20
    Arrow boundaries the reference pays per batch are one here."""
    from pyspark.sql.functions import pandas_udf

    from tests.conftest import SF0001

    @pandas_udf("double")
    def f1(v: pd.Series) -> pd.Series:
        return v * 2.0

    @pandas_udf("double")
    def f2(v: pd.Series) -> pd.Series:
        return v + 1.0

    ev = load_table(spark, SF0001, "events")

    def n_arrow_nodes(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("ArrowEvalPython")

    independent = ev.withColumn("a", f1("value")).withColumn("b", f2("value"))
    assert n_arrow_nodes(independent) == 1

    dependent = ev.withColumn("a", f1("value")).withColumn("b", f2("a"))
    assert n_arrow_nodes(dependent) == 1


def test_multimodal_frame_sampling_and_resize(spark):
    """Frame-sample / resize plumbing: row explosion shape, byte
    conservation, schema stability (decode itself is a marked stub)."""
    from fink_broker_spark.ext.multimodal import resize_stub, sample_frames
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents").limit(20)
    media = pack_media(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), kind="doc"
    )
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == 80
    assert frames.groupBy("media_id").count().filter("count != 4").count() == 0
    row = frames.filter("frame_index = 0").first()
    assert row.frame.kind == "doc:frame"
    assert row.frame.n_bytes > 0

    small = resize_stub(media, target_bytes=16)
    assert small.count() == 20
    sizes = [r.frame.n_bytes for r in small.collect()]
    assert all(s <= 16 for s in sizes)


def test_fan_out_single_pass_equals_per_filter(spark):
    """One-pass routing == N separate filtered scans, and the plan has
    no join/shuffle before the explode (pure codegen routing)."""
    import pyspark.sql.functions as F

    from fink_broker_spark.distribute.fanout import (
        FilterRegistry,
        fan_out_single_pass,
    )

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 3).alias("b"),
    )
    reg = (
        FilterRegistry()
        .register("t_a", lambda d: F.col("a") == 0)
        .register("t_b", lambda d: F.col("b") == 1)
        .register("t_none", lambda d: F.col("a") < 0)  # matches nothing
    )
    routed = fan_out_single_pass(df, reg, topic_col="t")
    got = {
        r.t: r.n
        for r in routed.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        name: df.filter(reg.filters[name](df)).count()
        for name in reg.names()
    }
    assert got == {k: v for k, v in want.items() if v > 0}
    # a row matching both topics appears once per topic
    both = routed.filter((F.col("a") == 0) & (F.col("b") == 1))
    assert both.count() == df.filter((F.col("a") == 0) & (F.col("b") == 1)).count() * 2
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "Generate explode" in plan


def test_fan_out_single_pass_streaming_one_sink(spark, tmp_path):
    """The streaming production shape: ONE streaming query routes every
    topic through a single topic-partitioned sink (vs one query per
    topic) and the per-topic directories hold exactly the batch
    answer."""
    import os

    import pyspark.sql.functions as F

    from fink_broker_spark.distribute.fanout import (
        FilterRegistry,
        fan_out_single_pass,
    )
    from fink_broker_spark.sinks.parquet import stream_to_parquet
    from fink_broker_spark.sources.parquet import file_stream, load_table
    from tests.conftest import SF0001

    stage = str(tmp_path / "in")
    os.makedirs(stage)
    os.symlink(
        os.path.join(SF0001, "events.parquet"),
        os.path.join(stage, "events.parquet"),
    )
    reg = (
        FilterRegistry()
        .register("purchases", lambda d: F.col("event_type") == "purchase")
        .register("errors", lambda d: F.col("event_type") == "error")
    )
    sdf = file_stream(spark, stage)
    routed = fan_out_single_pass(sdf, reg, topic_col="topic")
    out = str(tmp_path / "topics")
    q = stream_to_parquet(
        routed,
        out,
        str(tmp_path / "ckpt"),
        partition_cols=("topic",),
        available_now=True,
    )
    q.awaitTermination(120)

    ev = load_table(spark, SF0001, "events")
    back = spark.read.parquet(out)
    for name in reg.names():
        want = ev.filter(reg.filters[name](ev)).count()
        got = back.filter(F.col("topic") == name).count()
        assert got == want > 0, name
