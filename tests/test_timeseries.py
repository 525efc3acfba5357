"""Phase folding + as-of linear interpolation: hand-built edge cases
(the oracle parity suite covers the real tables)."""

import datetime

import pytest
from pyspark.sql import functions as F

from fink_broker_spark.operators.timeseries import interpolate_at, phase_fold


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_phase_fold_bins_exact(spark):
    period = 100  # seconds, 4 bins of 25 s
    rows = [(i, _ts(t)) for i, t in enumerate([0, 24, 25, 99, 100, 250])]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    t0 = int(_ts(0).replace(tzinfo=datetime.timezone.utc).timestamp())
    out = {
        r.id: (r.phase_us, r.phase_bin)
        for r in phase_fold(df, "ts", period, nbins=4, t0_epoch_s=t0).collect()
    }
    assert out[0] == (0, 0)
    assert out[1] == (24_000_000, 0)
    assert out[2] == (25_000_000, 1)  # exact boundary goes UP a bin
    assert out[3] == (99_000_000, 3)
    assert out[4] == (0, 0)  # wraps
    assert out[5] == (50_000_000, 2)


def test_interpolate_midpoint_and_exact_hit(spark):
    obs = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(10)), (3, "a", _ts(7))],
        "event_id long, k string, ts timestamp",
    )
    ref = spark.createDataFrame(
        [("a", _ts(0), 10.0), ("a", _ts(10), 30.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r.event_id: r.iv
        for r in interpolate_at(obs, ref, "k", "ts", "v", "iv").collect()
    }
    assert out[1] == pytest.approx(20.0)  # midpoint
    assert out[2] == pytest.approx(30.0)  # exact sample hit
    assert out[3] == pytest.approx(10.0 + 20.0 * 0.7)


def test_interpolate_clamps_not_extrapolates(spark):
    obs = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "a", _ts(100)), (3, "b", _ts(50))],
        "event_id long, k string, ts timestamp",
    )
    ref = spark.createDataFrame(
        [("a", _ts(10), 5.0), ("a", _ts(20), 7.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r.event_id: r.iv
        for r in interpolate_at(obs, ref, "k", "ts", "v", "iv").collect()
    }
    assert out[1] == pytest.approx(5.0)  # before range -> first sample
    assert out[2] == pytest.approx(7.0)  # after range -> last sample
    assert out[3] is None  # key with no reference series


def test_interpolate_single_shuffle_no_join(spark):
    """The union+window plan shuffles once on the key and contains no
    join operator at all."""
    obs = spark.createDataFrame(
        [(1, "a", _ts(5))], "event_id long, k string, ts timestamp"
    )
    ref = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "k string, ts timestamp, v double"
    )
    plan = (
        interpolate_at(obs, ref, "k", "ts", "v", "iv")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interpolate_preserves_obs_columns(spark):
    obs = spark.createDataFrame(
        [(1, "a", _ts(5), "extra")],
        "event_id long, k string, ts timestamp, tag string",
    )
    ref = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(10), 3.0)],
        "k string, ts timestamp, v double",
    )
    row = interpolate_at(obs, ref, "k", "ts", "v", "iv").collect()[0]
    assert row.tag == "extra" and row.event_id == 1
    assert row.iv == pytest.approx(2.0)


def test_periodogram_detects_true_period(spark):
    """A pure sinusoid sampled at 1 Hz for 2 h: power at the true
    600 s period dominates the off-grid trial periods."""
    import math

    from fink_broker_spark.operators.timeseries import periodogram

    rows = [
        ("a", _ts(t), math.sin(2 * math.pi * t / 600.0))
        for t in range(0, 7200, 5)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r.period_s: r.power
        for r in periodogram(df, "k", "ts", "v", [600, 353, 1021]).collect()
    }
    assert out[600] > 50 * out[353]
    assert out[600] > 50 * out[1021]


def test_periodogram_one_row_per_key_and_period(spark):
    from fink_broker_spark.operators.timeseries import periodogram

    rows = [(k, _ts(t), 1.0) for k in ("a", "b") for t in range(10)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = periodogram(df, "k", "ts", "v", [60, 120]).collect()
    assert len(out) == 4
    assert all(r.n == 10 for r in out)


def test_interpolate_skips_null_valued_reference_samples(spark):
    """A NULL-valued reference sample must not contribute its TIMESTAMP
    as a bracket: obs at t=5 between (0, 10.0) and (20, 30.0) with a
    NULL sample at t=10 interpolates along 0→20 (15.0), not 0→10."""
    obs = spark.createDataFrame(
        [(1, "a", _ts(5))], "event_id long, k string, ts timestamp"
    )
    ref = spark.createDataFrame(
        [("a", _ts(0), 10.0), ("a", _ts(10), None), ("a", _ts(20), 30.0)],
        "k string, ts timestamp, v double",
    )
    out = interpolate_at(obs, ref, "k", "ts", "v", "iv").collect()
    assert out[0].iv == pytest.approx(15.0)
