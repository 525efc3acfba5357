"""Driver-drift harness: adversarial physical-layout variants must not
split the engines.

Round 4's five driver value-mismatches all passed the committed-data
parity suite — the failures lived in regenerated testdata layouts the
local loop never exercised. These tests pin the reproduction fixtures:

- seed1/``nanos``  — TIMESTAMP(NANOS) with sub-µs jitter: reproduced the
  ``max_concurrency`` bigint-cast-as-seconds red (pre-fix code MISMATCHes
  on this fixture; the fix is load_table's footer-driven normalization).
- seed1-3/``boundary`` — half-boundary-rich doubles: reproduced latent
  reds in ``phase_fold``/``data_quality_report`` (scale-6 summand
  rounds), ``grouped_agg_udaf``/``product_profit`` (rint vs round on .5
  ties), and ``promo_revenue`` (wide-decimal → double double-rounding).
"""

from __future__ import annotations

import pytest

from fink_broker_spark.admin.driftlab import generate_variant, run_parity

#: the queries each layout historically broke (regression subset — the
#: full cross-product runs via the CLI in the per-round verify loop)
NANOS_REGRESSIONS = [
    "max_concurrency",
    "event_transitions",
    "phase_fold",
    "autocorrelation",
    "fading_trend",
    "resample_fill",
    "history_arrays",
    "interpolate_ephemeris",
]
BOUNDARY_REGRESSIONS = [
    "phase_fold",
    "data_quality_report",
    "grouped_agg_udaf",
    "product_profit",
    "promo_revenue",
    "market_share",
    "small_quantity_revenue",
    "cusum_changepoint",
    "event_type_stats",
    "pricing_summary",
]


@pytest.fixture(scope="module")
def entry_module():
    import importlib
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    return importlib.import_module("__spark_entry__")


@pytest.mark.parametrize(
    ("layout", "subset"),
    [("nanos", NANOS_REGRESSIONS), ("boundary", BOUNDARY_REGRESSIONS)],
)
def test_layout_variants_keep_parity(
    spark, tmp_path_factory, entry_module, layout, subset
):
    out = str(tmp_path_factory.mktemp("driftlab"))
    dest = generate_variant("/root/testdata/sf0.001", out, 1, layout)
    res = run_parity(dest, subset, spark=spark, entry_module=entry_module)
    bad = {k: v for k, v in res.items() if v != "ok"}
    assert not bad, f"{layout} variant split the engines: {bad}"


def test_variant_generation_is_deterministic(tmp_path_factory):
    import hashlib

    out1 = str(tmp_path_factory.mktemp("a"))
    out2 = str(tmp_path_factory.mktemp("b"))
    d1 = generate_variant("/root/testdata/sf0.001", out1, 7, "boundary")
    d2 = generate_variant("/root/testdata/sf0.001", out2, 7, "boundary")

    import pyarrow.parquet as pq

    for t in ("events", "lineitem"):
        a = pq.read_table(f"{d1}/{t}.parquet")
        b = pq.read_table(f"{d2}/{t}.parquet")
        assert a.equals(b)
    # different seed → different content
    d3 = generate_variant("/root/testdata/sf0.001", out1, 8, "boundary")
    a = pq.read_table(f"{d1}/events.parquet")
    c = pq.read_table(f"{d3}/events.parquet")
    assert not a.equals(c)


def test_nanos_variant_preserves_micros_truncation(tmp_path_factory):
    """The ns jitter is sub-µs only: a normalizing reader must see the
    identical microsecond timeline as the committed layout."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("n"))
    dest = generate_variant("/root/testdata/sf0.001", out, 3, "nanos")
    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    var = pq.read_table(f"{dest}/events.parquet")
    import pyarrow as pa

    src_us = src.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    var_us = pc.divide(var.column("ts").cast(pa.int64()), pa.scalar(1000))
    assert src_us.combine_chunks().equals(var_us.combine_chunks())
