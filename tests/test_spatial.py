"""HEALPix pixelization invariants and the healpix-bucketed crossmatch."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from fink_broker_spark.functions.spatial import (
    ang2pix_multires_udf,
    ang2pix_nest_np,
    ang2pix_ring_np,
    ang2pix_udf,
    angular_sep_deg_expr,
    healpix_crossmatch,
    healpix_ring_expr,
)
from fink_broker_spark.sources.parquet import load_table
from tests.conftest import SF0001


def _random_sky(n, seed=11):
    rng = np.random.default_rng(seed)
    ra = rng.uniform(0.0, 360.0, n)
    dec = np.rad2deg(np.arcsin(rng.uniform(-1.0, 1.0, n)))  # uniform on sphere
    return ra, dec


def test_ring_known_values_nside1():
    # nside=1 has 12 pixels: ring ids 0-3 north cap, 4-7 equator, 8-11 south
    ra = np.array([45.0, 50.0, 140.0, 45.0])
    dec = np.array([80.0, 0.0, 0.0, -80.0])
    pix = ang2pix_ring_np(ra, dec, 1)
    assert pix[0] == 0  # north cap, first quadrant
    assert 4 <= pix[1] <= 7 and 4 <= pix[2] <= 7 and pix[1] != pix[2]
    assert 8 <= pix[3] <= 11


def test_pixel_ranges_and_totals():
    ra, dec = _random_sky(20000)
    for nside in (1, 2, 16, 64):
        for fn in (ang2pix_ring_np, ang2pix_nest_np):
            pix = fn(ra, dec, nside)
            assert pix.min() >= 0 and pix.max() < 12 * nside * nside


def test_nest_and_ring_define_identical_cells():
    """NEST is a renumbering of the same cells: grouping points by nest
    pixel and by ring pixel must produce the identical partition."""
    ra, dec = _random_sky(5000)
    ring = ang2pix_ring_np(ra, dec, 8)
    nest = ang2pix_nest_np(ra, dec, 8)
    by_ring = {}
    by_nest = {}
    for i, (r, n) in enumerate(zip(ring, nest)):
        by_ring.setdefault(r, set()).add(i)
        by_nest.setdefault(n, set()).add(i)
    assert sorted(map(frozenset, by_ring.values())) == sorted(
        map(frozenset, by_nest.values())
    )
    # and the mapping ring<->nest is a bijection on occupied cells
    assert len(by_ring) == len(by_nest)


def test_nest_hierarchical_prefix():
    """pix@2k >> 2 == pix@k — the nested-scheme parent property that
    multi-resolution index keys rely on."""
    ra, dec = _random_sky(5000, seed=3)
    for k in (4, 32):
        child = ang2pix_nest_np(ra, dec, 2 * k)
        parent = ang2pix_nest_np(ra, dec, k)
        assert np.array_equal(child >> 2, parent)


def test_equal_area_occupancy():
    """HEALPix cells are equal-area: uniform sky -> near-uniform counts.
    (The lat/lon grid fails this badly at the poles.)"""
    ra, dec = _random_sky(60000, seed=5)
    pix = ang2pix_ring_np(ra, dec, 4)  # 192 cells, ~312 each
    counts = np.bincount(pix, minlength=192)
    assert counts.min() > 0
    assert counts.max() / counts.min() < 1.6


def test_expr_matches_numpy_udf(spark):
    """The pure-Column RING expression and the numpy pandas UDF must
    agree pixel-for-pixel on real data (shared op tree)."""
    ev = load_table(spark, SF0001, "events").limit(2000)
    ra = F.col("value") - F.floor(F.col("value") / 360.0) * 360.0
    dec = (F.col("user_id") % 181 - 90).cast("double")
    out = ev.select(
        healpix_ring_expr(ra, dec, 32).alias("expr_pix"),
        ang2pix_udf(32)(ra, dec).alias("udf_pix"),
    )
    bad = out.filter(F.col("expr_pix") != F.col("udf_pix")).count()
    assert bad == 0


def test_multires_string_matches_parts(spark):
    ev = load_table(spark, SF0001, "events").limit(500)
    ra = F.col("value") - F.floor(F.col("value") / 360.0) * 360.0
    dec = (F.col("user_id") % 181 - 90).cast("double")
    out = ev.select(
        ang2pix_multires_udf([16, 64, 256])(ra, dec).alias("mr"),
        ang2pix_udf(16)(ra, dec).alias("p16"),
        ang2pix_udf(256)(ra, dec).alias("p256"),
    ).collect()
    for r in out:
        parts = r.mr.split("_")
        assert len(parts) == 3
        assert int(parts[0]) == r.p16 and int(parts[2]) == r.p256


def test_crossmatch_radius_above_pixel_scale(spark):
    """The interior-ring disc cover must keep the match complete when
    the radius exceeds the pixel scale (nside=32 ⇒ ~1.8°, radius 2°)."""
    ra_c, dec_c = _random_sky(300, seed=31)
    ra_q, dec_q = _random_sky(40, seed=32)
    catalog = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_c, dec_c))],
        "cat_id bigint, ra double, dec double",
    )
    queries = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_q, dec_q))],
        "q_id bigint, ra double, dec double",
    )
    radius = 2.0
    got = {
        (r.cat_id, r.r_q_id)
        for r in healpix_crossmatch(
            catalog, queries, radius_deg=radius, nside=32
        ).collect()
    }
    brute = {
        (r.cat_id, r.q_id)
        for r in catalog.crossJoin(
            queries.select(
                F.col("q_id"),
                F.col("ra").alias("qra"),
                F.col("dec").alias("qdec"),
            )
        )
        .filter(
            angular_sep_deg_expr("ra", "dec", "qra", "qdec") <= F.lit(radius)
        )
        .collect()
    }
    assert brute and got == brute


def _pair_fixture(spark, n_cat=300, n_q=40, seed=41):
    ra_c, dec_c = _random_sky(n_cat, seed=seed)
    ra_q, dec_q = _random_sky(n_q, seed=seed + 1)
    catalog = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_c, dec_c))],
        "cat_id bigint, ra double, dec double",
    )
    queries = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_q, dec_q))],
        "q_id bigint, ra double, dec double",
    )
    return catalog, queries


def _brute_pairs(catalog, queries, radius):
    return {
        (r.cat_id, r.q_id)
        for r in catalog.crossJoin(
            queries.select(
                F.col("q_id"),
                F.col("ra").alias("qra"),
                F.col("dec").alias("qdec"),
            )
        )
        .filter(
            angular_sep_deg_expr("ra", "dec", "qra", "qdec") <= F.lit(radius)
        )
        .collect()
    }


def test_too_fine_nside_auto_coarsens(spark):
    """The completeness contract is ENFORCED: a caller passing an nside
    whose pixel scale (58.6/nside deg) is far below the radius gets a
    warning and auto-coarsened bucketing — and still recovers 100% of
    the brute-force pair set (before the guard this silently dropped
    corner-sliver pixels from the sampled cone cover)."""
    import warnings as _warnings

    catalog, queries = _pair_fixture(spark)
    radius = 2.0  # nside=256 scale ~0.23 deg — way too fine
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        df = healpix_crossmatch(catalog, queries, radius_deg=radius, nside=256)
        got = {(r.cat_id, r.r_q_id) for r in df.collect()}
    assert any("coarsening" in str(w.message) for w in caught)
    brute = _brute_pairs(catalog, queries, radius)
    assert brute and got == brute


def test_crossmatch_shuffle_join_path(spark):
    """broadcast=False plans the pixel equi-join as a shuffle join
    (SortMergeJoin/ShuffledHashJoin) — the Gaia-scale catalog path where
    broadcasting the right side would OOM the driver — and returns the
    identical pair set."""
    catalog, queries = _pair_fixture(spark, seed=51)
    radius = 2.0
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = healpix_crossmatch(
            catalog, queries, radius_deg=radius, nside=16, broadcast=False
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan
        got = {(r.cat_id, r.r_q_id) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == _brute_pairs(catalog, queries, radius)
    # and the default path (broadcast hint) agrees
    bc = {
        (r.cat_id, r.r_q_id)
        for r in healpix_crossmatch(
            catalog, queries, radius_deg=radius, nside=16
        ).collect()
    }
    assert got == bc


def test_crossmatch_enrich_nearest_and_unknown(spark):
    from fink_broker_spark.enrich.xmatch import crossmatch_enrich

    alerts = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 10.4, 0.0), (3, 200.0, -40.0)],
        "event_id bigint, ra double, dec double",
    )
    catalog = spark.createDataFrame(
        [(7, 10.1, 0.0, "Star"), (8, 10.45, 0.0, "QSO")],
        "cat_id bigint, ra double, dec double, main_type string",
    )
    out = {
        r.event_id: r.cdsxmatch
        for r in crossmatch_enrich(alerts, catalog, radius_deg=1.0).collect()
    }
    # alert 1 nearer to Star(0.1°) than QSO(0.45°); alert 2 nearer QSO
    assert out == {1: "Star", 2: "QSO", 3: "Unknown"}


def test_healpix_crossmatch_equals_brute_force(spark):
    """Pixel-bucketed cone search must return exactly the brute-force
    pair set — the disc-cover explode guarantees no boundary loss at
    radius below the pixel scale."""
    ra_c, dec_c = _random_sky(400, seed=21)
    ra_q, dec_q = _random_sky(60, seed=22)
    catalog = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_c, dec_c))],
        "cat_id bigint, ra double, dec double",
    )
    queries = spark.createDataFrame(
        [(i, float(r), float(d)) for i, (r, d) in enumerate(zip(ra_q, dec_q))],
        "q_id bigint, ra double, dec double",
    )
    radius = 2.0  # deg; nside=16 pixel scale ~3.7 deg
    got = {
        (r.cat_id, r.r_q_id)
        for r in healpix_crossmatch(
            catalog, queries, radius_deg=radius, nside=16
        ).collect()
    }
    brute = {
        (r.cat_id, r.q_id)
        for r in catalog.crossJoin(
            queries.select(
                F.col("q_id"),
                F.col("ra").alias("qra"),
                F.col("dec").alias("qdec"),
            )
        )
        .filter(
            angular_sep_deg_expr("ra", "dec", "qra", "qdec") <= F.lit(radius)
        )
        .collect()
    }
    assert brute, "test fixture should produce at least one match"
    assert got == brute


def test_nest_expr_matches_numpy_and_sql(spark):
    """healpix_nest_expr == ang2pix_nest_np bit-for-bit on random and
    lattice points; the generated SQL twin (DuckDB) == the expr; the
    hierarchical prefix pix@64 >> 6 == pix@8 holds on the expr."""
    import duckdb

    from fink_broker_spark.functions.spatial import (
        ang2pix_nest_np,
        healpix_nest_expr,
        healpix_nest_sql,
    )

    rng = np.random.RandomState(11)
    ra = np.concatenate(
        [rng.uniform(0, 360, 400), (np.arange(0, 3600, 7) / 10.0)]
    )
    dec = np.concatenate(
        [
            np.degrees(np.arcsin(rng.uniform(-1, 1, 400))),
            (np.arange(0, 515, 1) % 1200) / 10.0 - 60.0,
        ]
    )
    df = spark.createDataFrame(
        [(float(r), float(d)) for r, d in zip(ra, dec)],
        "ra double, dec double",
    )
    for nside in (8, 64):
        expected = ang2pix_nest_np(ra, dec, nside).tolist()
        got = [
            r.p
            for r in df.select(
                healpix_nest_expr("ra", "dec", nside).alias("p")
            ).collect()
        ]
        assert got == expected, f"expr != numpy at nside={nside}"
        con = duckdb.connect()
        con.execute("CREATE TABLE pts (ra DOUBLE, dec DOUBLE)")
        con.executemany(
            "INSERT INTO pts VALUES (?, ?)",
            [(float(r), float(d)) for r, d in zip(ra, dec)],
        )
        sql_pix = [
            r[0]
            for r in con.execute(
                f"SELECT {healpix_nest_sql('ra', 'dec', nside)} FROM pts"
            ).fetchall()
        ]
        assert sql_pix == expected, f"sql != numpy at nside={nside}"

    fine = np.asarray(ang2pix_nest_np(ra, dec, 64))
    coarse = np.asarray(ang2pix_nest_np(ra, dec, 8))
    assert (fine >> 6 == coarse).all()


def test_staged_nest_equals_inline_and_numpy(spark):
    """with_healpix_nest (projection-staged) must produce bit-identical
    pixels to the inline Column expression and the numpy reference —
    the staging is a plan-size optimization, never a semantic change."""
    import numpy as np
    import pandas as pd

    from fink_broker_spark.functions.spatial import (
        ang2pix_nest_np,
        healpix_nest_expr,
        with_healpix_nest,
    )

    ra = np.linspace(0.0, 359.99, 1500)
    dec = np.linspace(-89.9, 89.9, 1500)
    df = spark.createDataFrame(pd.DataFrame({"ra": ra, "dec": dec}))
    inline = [
        r.p
        for r in df.select(
            healpix_nest_expr("ra", "dec", 64).alias("p")
        ).collect()
    ]
    staged = [
        r.hpx_nest
        for r in with_healpix_nest(df, "ra", "dec", 64)
        .select("hpx_nest")
        .collect()
    ]
    assert inline == staged == list(ang2pix_nest_np(ra, dec, 64))


def test_staged_nest_drops_intermediates_and_keeps_plan_linear(spark):
    import pandas as pd

    from fink_broker_spark.functions.spatial import with_healpix_nest

    df = spark.createDataFrame(
        pd.DataFrame({"ra": [10.0, 20.0], "dec": [-5.0, 5.0]})
    )
    out = with_healpix_nest(df, "ra", "dec", 256, out="px")
    assert set(out.columns) == {"ra", "dec", "px"}
    # the analyzed plan must stay well below the inline form's ~2^5
    # expression blowup (inline tops 100k chars at nside 256)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20000
