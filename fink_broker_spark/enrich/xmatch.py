"""Catalog crossmatch enrichment — the engine's ``cdsxmatch`` analog.

The reference's first science processor labels every alert with the
class of its nearest CDS/SIMBAD counterpart within a cone, defaulting
to ``Unknown`` (``ztf/science.py:84-197``; downstream classifiers key
on the column, e.g. ``:277,284``). The reference calls an external HTTP
service; here the catalog is a DataFrame and the match is the engine's
healpix-bucketed crossmatch:

1. candidates: one scan-side pixel per alert, catalog cones exploded to
   their covering pixels, **broadcast** equi-join on pixel (the catalog
   is the small side, as in the reference's xmatch batching);
2. exact haversine refine at ``radius_deg``;
3. nearest match per alert via ``min_by`` keyed on the
   ``(separation, catalog id)`` struct — a hash aggregate with map-side
   partials and a deterministic tie-break, cheaper than a
   ``row_number`` window (no sort);
4. left join back onto the alerts so unmatched rows keep ``Unknown`` —
   the nearest table holds one row per *matched* alert, so with AQE it
   broadcasts whenever matches are sparse (the common sky case) and the
   full alert table never shuffles.

Shuffle cost: one aggregation over candidate pairs (∝ matches, not
corpus) — no all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fink_broker_spark.functions.spatial import healpix_crossmatch

UNKNOWN = "Unknown"


def crossmatch_enrich(
    alerts: DataFrame,
    catalog: DataFrame,
    radius_deg: float,
    alert_id: str = "event_id",
    catalog_id: str = "cat_id",
    class_col: str = "main_type",
    out_col: str = "cdsxmatch",
    # default pixel scale (~3.7 deg at nside=16) comfortably above the
    # typical arcsec-to-degree match radii, so the disc cover is exact
    nside: int = 16,
    alert_ra: str = "ra",
    alert_dec: str = "dec",
    catalog_ra: str = "ra",
    catalog_dec: str = "dec",
) -> DataFrame:
    """``alerts`` + a new ``out_col`` column: nearest catalog class
    within ``radius_deg``, else ``Unknown``."""
    cat = catalog.select(catalog_id, catalog_ra, catalog_dec, class_col)
    matched = healpix_crossmatch(
        alerts,
        cat,
        radius_deg,
        nside=nside,
        left_ra=alert_ra,
        left_dec=alert_dec,
        right_ra=catalog_ra,
        right_dec=catalog_dec,
        keep_sep="__sep",
    )
    nearest = matched.groupBy(alert_id).agg(
        F.min_by(
            F.col(f"r_{class_col}"),
            F.struct(F.col("__sep"), F.col(f"r_{catalog_id}")),
        ).alias(out_col)
    )
    return alerts.join(nearest, on=alert_id, how="left").fillna(
        {out_col: UNKNOWN}
    )
