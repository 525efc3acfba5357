"""Pandas-UDF fusion in the enrichment pipeline: one Arrow boundary per
run of consecutive pandas processors, identical results to unfused."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from fink_broker_spark.enrich.pipeline import EnrichmentPipeline, Processor
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


def _chain() -> EnrichmentPipeline:
    """Three DEPENDENT pandas steps (each consumes the previous output —
    the shape Spark cannot co-batch by itself) plus a codegen step."""
    return (
        EnrichmentPipeline()
        .add(
            Processor(
                name="mag",
                inputs=["value"],
                output="mag",
                pandas_fn=lambda v: -2.5 * np.log10(np.abs(v) + 1.0),
                dtype="double",
            )
        )
        .add(
            Processor(
                name="mag_norm",
                inputs=["mag", "user_id"],
                output="mag_norm",
                pandas_fn=lambda m, u: m / (u.astype("float64") + 1.0),
                dtype="double",
            )
        )
        .add(
            Processor(
                name="mag_flag",
                inputs=["mag_norm"],
                output="mag_flag",
                pandas_fn=lambda mn: (mn < 0).astype("int32"),
                dtype="int",
            )
        )
        .add(
            Processor(
                name="tag",
                inputs=["event_type"],
                output="tag",
                fn=lambda c: F.upper(F.col(c)),
            )
        )
    )


def _arrow_nodes(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("ArrowEvalPython")


def test_fused_chain_single_arrow_boundary(spark):
    ev = load_table(spark, SF0001, "events").limit(500)
    fused = _chain().apply(ev, fuse=True)
    unfused = _chain().apply(ev, fuse=False)
    assert _arrow_nodes(fused) == 1  # three UDF steps, one boundary
    assert _arrow_nodes(unfused) >= 3


def test_fused_equals_unfused(spark):
    ev = load_table(spark, SF0001, "events").limit(1000)
    cols = ["event_id", "mag", "mag_norm", "mag_flag", "tag"]
    a = sorted(
        map(tuple, _chain().apply(ev, fuse=True).select(cols).collect())
    )
    b = sorted(
        map(tuple, _chain().apply(ev, fuse=False).select(cols).collect())
    )
    assert a == b and len(a) == 1000


def test_column_step_splits_the_run(spark):
    """A pure-Column processor in the middle ends a fusion run — two
    pandas runs around it become two boundaries, not one."""
    ev = load_table(spark, SF0001, "events").limit(200)
    pipe = (
        EnrichmentPipeline()
        .add(
            Processor(
                name="a",
                inputs=["value"],
                output="a",
                pandas_fn=lambda v: v * 2.0,
                dtype="double",
            )
        )
        .add(
            Processor(
                name="mid",
                inputs=["a"],
                output="mid",
                fn=lambda c: F.col(c) + F.lit(1.0),
            )
        )
        .add(
            Processor(
                name="b",
                inputs=["mid"],
                output="b",
                pandas_fn=lambda m: m * 3.0,
                dtype="double",
            )
        )
    )
    out = pipe.apply(ev, fuse=True)
    assert _arrow_nodes(out) == 2
    row = out.select("value", "a", "mid", "b").first()
    assert abs(row.a - row.value * 2.0) < 1e-12
    assert abs(row.b - (row.a + 1.0) * 3.0) < 1e-12


def test_fused_temporaries_dropped_and_skip_logged(spark):
    ev = load_table(spark, SF0001, "events").limit(100)
    pipe = (
        EnrichmentPipeline()
        .add(
            Processor(
                name="tmp",
                inputs=["value"],
                output="tmp",
                pandas_fn=lambda v: v + 1.0,
                dtype="double",
                temporary=True,
            )
        )
        .add(
            Processor(
                name="keep",
                inputs=["tmp"],
                output="keep",
                pandas_fn=lambda t: t * 2.0,
                dtype="double",
            )
        )
        .add(
            Processor(
                name="skipped",
                inputs=["no_such_col"],
                output="never",
                pandas_fn=lambda x: x,
                dtype="double",
            )
        )
    )
    out = pipe.apply(ev, fuse=True)
    assert "tmp" not in out.columns and "never" not in out.columns
    row = out.select("value", "keep").first()
    assert abs(row.keep - (row.value + 1.0) * 2.0) < 1e-12
