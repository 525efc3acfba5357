"""Great-circle tracklet geometry: recovery, refinement, merge, cut."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from fink_broker_spark.operators.tracklets import (
    find_sky_tracklets,
    great_circle_tracklets,
    tracklet_candidate_cut,
)


def _track(ra0, dec0, slope, npts=8, step_arcsec=10.0, curve=0.0):
    """Collinear (optionally curved) points in the tangent plane."""
    ras, decs = [], []
    for i in range(npts):
        dt = (i - (npts - 1) / 2) * step_arcsec / 3600.0
        ras.append(ra0 + dt)
        decs.append(dec0 + dt * slope + curve * dt * dt)
    return ras, decs


def test_recovers_tracks_amid_background():
    rng = np.random.default_rng(42)
    ras, decs, expected = [], [], []
    for t in range(6):
        r, d = _track(10.0 + 5 * t, ((t * 37) % 121) - 60, ((t % 5) - 2) / 4)
        ras += r
        decs += d
        expected += [t] * len(r)
    for _ in range(300):
        ras.append(rng.uniform(0, 360))
        decs.append(np.rad2deg(np.arcsin(rng.uniform(-1, 1))))
        expected.append(-1)
    labels = find_sky_tracklets(
        np.array(ras), np.array(decs), max_pair_sep_deg=0.1
    )
    expected = np.array(expected)
    for t in range(6):
        got = set(labels[expected == t])
        assert len(got) == 1 and -1 not in got, f"track {t}: {got}"
    assert (labels[expected == -1] >= 0).sum() == 0
    # distinct tracks got distinct labels
    assert len({labels[expected == t][0] for t in range(6)}) == 6


def test_curved_trail_quadratic_fit():
    """The quadratic refinement must keep a curved trail intact (the
    reference's polynomial-correction rationale,
    ``tracklet_identification.py:246-252``)."""
    # curvature bends the trail ~3 arcsec off its chord great circle:
    # inside the 5-arcsec candidate tol, but outside the 1-arcsec refine
    # tol — only the quadratic trail correction keeps all 8 points
    ras, decs = _track(100.0, 10.0, 0.3, npts=8, curve=10.0)
    labels = find_sky_tracklets(np.array(ras), np.array(decs))
    assert (labels == labels[0]).all() and labels[0] >= 0


def test_too_few_points_no_tracklet():
    ras, decs = _track(50.0, 0.0, 0.0, npts=4)
    labels = find_sky_tracklets(np.array(ras), np.array(decs))
    assert (labels == -1).all()


def test_crossing_tracks_stay_distinct():
    """Two tracks sharing one crossing region (≤2 common points) must
    not merge."""
    r1, d1 = _track(200.0, -5.0, 1.0, npts=8)
    r2, d2 = _track(200.0, -5.0, -1.0, npts=8)
    ras = np.array(r1 + r2)
    decs = np.array(d1 + d2)
    labels = find_sky_tracklets(ras, decs)
    l1 = set(labels[:8])
    l2 = set(labels[8:])
    assert len(l1) == 1 and len(l2) == 1
    assert -1 not in l1 | l2
    assert l1 != l2


def test_spark_grouped_tracklets(spark):
    rows = []
    for expo in range(2):
        for t in range(3):
            r, d = _track(20.0 * (3 * expo + t) + 5.0, 10.0 * t - 10.0, 0.5)
            rows += [(expo, float(a), float(b)) for a, b in zip(r, d)]
    df = spark.createDataFrame(rows, "expo int, ra double, dec double")
    out = great_circle_tracklets(df, "expo", max_pair_sep_deg=0.1)
    got = out.groupBy("expo", "tracklet").count().collect()
    named = [r for r in got if r.tracklet != ""]
    assert len(named) == 6
    assert all(r["count"] == 8 for r in named)
    assert all(r.tracklet.startswith(f"TRCK_{r.expo}_") for r in named)


def test_candidate_cut_locus(spark):
    df = spark.createDataFrame(
        [
            # (distnr, magnr, magpsf) — inside the variability locus
            (0.3, 18.0, 18.5),
            # bright outlier: dmag >= 1 escapes the locus
            (0.3, 18.0, 15.0),
            # far from template: distnr >= 2 escapes
            (2.5, 18.0, 18.5),
            # distnr == 0: log10(0) = -inf in the reference's numpy, so
            # the shift envelope always holds -> in locus (dmag < 1)
            (0.0, 18.0, 18.5),
            # distnr == 0 but bright outlier -> kept
            (0.0, 18.0, 15.0),
            # negative distnr: NaN comparisons are all false -> kept
            (-1.0, 18.0, 18.5),
        ],
        "distnr double, magnr double, magpsf double",
    )
    keep = tracklet_candidate_cut(
        F.col("distnr"), F.col("magnr"), F.col("magpsf")
    )
    got = [r.k for r in df.select(keep.alias("k")).collect()]
    assert got == [False, True, True, False, True, True]
