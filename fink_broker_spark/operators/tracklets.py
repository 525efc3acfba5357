"""Grouped-map clustering: per-group imperative analysis in pandas.

Re-expresses the reference's tracklet identification
(``fink_broker/ztf/tracklet_identification.py:123-334``): alerts are
grouped by exposure time (``groupBy("jd")``), each group clustered in
NumPy (great-circle geometry + line fitting), and a tracklet id assigned
per cluster — the canonical ``applyInPandas`` shape (SURVEY.md §2.6
"grouped-map aggregation").

The clustering here is a deterministic 1-D single-linkage (sorted gap
split): domain-neutral, same operator skeleton. The astronomy-specific
polyfit logic would drop into ``_cluster_block`` unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame

ARCSEC_RAD = np.pi / (180.0 * 3600.0)


def _cluster_block(
    pdf: pd.DataFrame, value_col: str, gap: float, min_size: int, key_fmt: str
) -> pd.DataFrame:
    """Sort by value; split where consecutive gap > ``gap``; keep clusters
    with ≥ ``min_size`` members; label ``key_fmt.format(group, idx)``
    (mirrors the reference's ``TRCK_<jd>_<idx>`` ids,
    ``tracklet_identification.py:300-320``)."""
    pdf = pdf.sort_values(value_col, kind="mergesort").reset_index(drop=True)
    vals = pdf[value_col].to_numpy()
    labels = np.full(len(pdf), "", dtype=object)
    if len(vals):
        # fully vectorized: cluster id = running count of over-gap breaks;
        # sizes via bincount; surviving clusters renumbered densely
        cluster_of = np.concatenate(
            ([0], np.cumsum(np.diff(vals) > gap))
        ).astype(np.int64)
        sizes = np.bincount(cluster_of)
        kept = np.flatnonzero(sizes >= min_size)
        group_key = str(pdf["__group"].iloc[0])
        names = np.full(len(sizes), "", dtype=object)
        names[kept] = [
            key_fmt.format(group_key, i) for i in range(len(kept))
        ]
        labels = names[cluster_of]
    pdf = pdf.assign(cluster_id=labels)
    return pdf.drop(columns="__group")


def grouped_clusters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    gap: float,
    min_size: int = 2,
    key_fmt: str = "TRCK_{}_{:02d}",
) -> DataFrame:
    """``groupBy(group_col).applyInPandas`` clustering.

    Output = input columns + ``cluster_id`` (empty string = unclustered).
    One shuffle on the group key; each group is processed in a single
    Arrow batch, so groups must fit in worker memory — the reference has
    the same constraint (one exposure's alerts per group).
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    staged = df.withColumn("__group", F.col(group_col))
    schema = StructType(
        [f for f in staged.schema.fields if f.name != "__group"]
        + [StructField("cluster_id", StringType(), True)]
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _cluster_block(pdf, value_col, gap, min_size, key_fmt)

    # keyed spread (guide §2.5/§4): the grouped-map exchange is sized
    # by BYTES under AQE and coalesces to one post-shuffle task at
    # small byte volumes, but this stage's cost is per-row Python/Arrow
    # work — pin it at core width; HashPartitioning(__group) satisfies
    # the grouped-map clustering, so no second exchange is added
    # (no-op when the input already has >= cores partitions)
    from fink_broker_spark.plans.partitioning import ensure_keyed_parallelism

    staged = ensure_keyed_parallelism(staged, "__group")
    return staged.groupBy("__group").applyInPandas(apply_fn, schema)


# --------------------------------------------------------------------------
# Great-circle tracklet geometry (reference semantics:
# ``ztf/tracklet_identification.py:123-334``) — fresh implementation:
# SVD best-fit circle + atan2 along-track parametrization instead of the
# reference's Levi-Civita einsum / circle-dot ordering.
# --------------------------------------------------------------------------


def tracklet_candidate_cut(
    distnr: Column,
    magnr: Column,
    magpsf: Column,
    ssnamenr: Column | None = None,
    ndethist: Column | None = None,
    isdiffpos: Column | None = None,
) -> Column:
    """The reference's tracklet candidate predicate
    (``ztf/tracklet_identification.py:30-82``) as one Column expression.

    Keep alerts with no MPC counterpart, a single detection, and a
    positive difference — then drop the variable-star / bad-subtraction
    locus: sources fainter than their template (``magnr - magpsf < 1``)
    that also sit within the FWHM-scaled shift envelope
    (``magnr - magpsf < -4 * (log10(distnr) + 0.2)``) at ``distnr < 2``.
    Pure column algebra → ANSI-transcribable and pushed to the scan.

    Edge semantics match the reference's numpy arithmetic rather than
    SQL NULL propagation: ``distnr == 0`` makes the shift term
    ``log10(0) = -inf`` (envelope always satisfied → in the locus iff
    ``dmag < 1``), and a negative ``distnr`` yields NaN comparisons that
    are all false (row kept). Spark's ``log10`` returns NULL for both —
    which would NULL the whole predicate and silently drop kept rows —
    so the zero case is branched explicitly.
    """
    from pyspark.sql import functions as F

    dmag = magnr - magpsf
    in_locus = (
        (dmag < F.lit(1.0))
        & (distnr < F.lit(2.0))
        & (
            F.when(distnr == 0, F.lit(True)).otherwise(
                dmag < F.lit(-4.0) * (F.log10(distnr) + F.lit(0.2))
            )
        )
    )
    keep = ~F.coalesce(in_locus, F.lit(False))
    if ssnamenr is not None:
        keep = (ssnamenr == F.lit("null")) & keep
    if ndethist is not None:
        keep = (ndethist == F.lit(1)) & keep
    if isdiffpos is not None:
        keep = (isdiffpos == F.lit("t")) & keep
    return keep


def radec_to_xyz(ra_deg: np.ndarray, dec_deg: np.ndarray) -> np.ndarray:
    """Unit vectors (n, 3) from degrees."""
    ra = np.deg2rad(np.asarray(ra_deg, dtype=np.float64))
    dec = np.deg2rad(np.asarray(dec_deg, dtype=np.float64))
    cd = np.cos(dec)
    return np.stack([cd * np.cos(ra), cd * np.sin(ra), np.sin(dec)], axis=1)


def _circle_candidates(
    xyz: np.ndarray,
    min_pair_sep: float,
    tol: float,
    min_pts: int,
    max_pair_sep: float | None,
) -> list[np.ndarray]:
    """Boolean membership masks for every great circle (through a point
    pair separated by > ``min_pair_sep``) that passes within ``tol`` of
    at least ``min_pts`` points. One anchor loop, vectorized over the
    pair partner and the membership test; ``max_pair_sep`` prunes the
    pair set to the physical tracklet length (the O(n^2·n) term only
    pays for plausible pairs)."""
    n = len(xyz)
    lo = np.sin(min_pair_sep)
    hi = np.sin(max_pair_sep) if max_pair_sep is not None else None
    masks: list[np.ndarray] = []
    for i in range(n - 1):
        normals = np.cross(xyz[i], xyz[i + 1 :])
        sep = np.sqrt((normals * normals).sum(axis=1))  # |cross| = sin(sep)
        ok = sep > lo
        if hi is not None:
            # max_pair_sep below 90 deg: sin is monotone there
            ok &= sep < hi
        if not ok.any():
            continue
        unit = normals[ok] / sep[ok, None]
        near = np.abs(unit @ xyz.T) < tol  # (pairs, n) sine distances
        for hit in near[near.sum(axis=1) >= min_pts]:
            masks.append(hit)
    return masks


def _trim_stray_endpoint(
    t: np.ndarray, mask: np.ndarray, edge_frac: float
) -> np.ndarray:
    """Drop the first/last along-track point when its gap to the rest
    exceeds ``edge_frac`` of the total span (the reference's 10/11
    endpoint-isolation rule, ``tracklet_identification.py:262-276``)."""
    ids = np.flatnonzero(mask)
    if len(ids) < 3:
        return mask
    order = np.argsort(t[ids], kind="stable")
    gaps = np.diff(t[ids][order])
    total = gaps.sum()
    if total <= 0:
        return mask
    out = mask.copy()
    if gaps[0] > edge_frac * total:
        out[ids[order[0]]] = False
    elif gaps[-1] > edge_frac * total:
        out[ids[order[-1]]] = False
    return out


def _refine_track(
    xyz: np.ndarray,
    mask: np.ndarray,
    refine_tol: float,
    min_keep: int = 3,
    max_iters: int = 10,
    edge_frac: float = 10.0 / 11.0,
) -> np.ndarray | None:
    """Iteratively re-fit the track and re-select members.

    Each pass: (1) best-fit great-circle normal = smallest principal
    axis of the member cloud (SVD); (2) along-track angle t via atan2 in
    the circle plane, signed off-circle sine distance s; (3) quadratic
    fit s ~ poly(t) — the curved-trail correction — and re-admit every
    point within ``refine_tol`` of the model; (4) stray-endpoint trim.
    Converged when membership is a fixed point; None when the fit
    collapses below ``min_keep`` members."""
    for _ in range(max_iters):
        pts = xyz[mask]
        _, _, vt = np.linalg.svd(pts, full_matrices=False)
        normal = vt[-1]
        e1 = pts[0] - np.dot(pts[0], normal) * normal
        nrm = np.sqrt(np.dot(e1, e1))
        if nrm == 0.0:
            return None
        e1 /= nrm
        e2 = np.cross(normal, e1)
        t = np.arctan2(xyz @ e2, xyz @ e1)
        s = xyz @ normal
        deg = min(2, int(mask.sum()) - 1)
        coeffs = np.polyfit(t[mask], s[mask], deg)
        new = np.abs(s - np.polyval(coeffs, t)) < refine_tol
        if new.sum() > 1:
            new = _trim_stray_endpoint(t, new, edge_frac)
        if np.array_equal(new, mask):
            return new
        mask = new
        if mask.sum() < min_keep:
            return None
    return mask


def find_sky_tracklets(
    ra_deg: np.ndarray,
    dec_deg: np.ndarray,
    min_pts: int = 5,
    pair_sep_arcsec: float = 10.0,
    circle_tol_arcsec: float = 5.0,
    refine_tol_arcsec: float = 1.0,
    max_pair_sep_deg: float | None = None,
    merge_overlap: int = 2,
) -> np.ndarray:
    """Label collinear-on-the-sphere point sets; -1 = not in a tracklet.

    Same semantics as the reference extractor
    (``tracklet_identification.py:123-334``): candidate circles from
    point pairs > ``pair_sep_arcsec`` apart with ≥ ``min_pts`` members
    within ``circle_tol_arcsec``; deduplicated candidates claimed
    greedily longest-first; each claim refined by the quadratic-trail
    fit at ``refine_tol_arcsec`` with endpoint trimming; a refined claim
    sharing more than ``merge_overlap`` points with an earlier tracklet
    merges into it, smaller overlaps are treated as crossing tracks."""
    n = len(ra_deg)
    labels = np.full(n, -1, dtype=np.int64)
    if n < min_pts:
        return labels
    xyz = radec_to_xyz(ra_deg, dec_deg)
    masks = _circle_candidates(
        xyz,
        pair_sep_arcsec * ARCSEC_RAD,
        circle_tol_arcsec * ARCSEC_RAD,
        min_pts,
        np.deg2rad(max_pair_sep_deg) if max_pair_sep_deg else None,
    )
    if not masks:
        return labels
    cand = np.unique(np.asarray(masks, dtype=bool), axis=0)
    order = np.argsort(-cand.sum(axis=1), kind="stable")
    used = np.zeros(n, dtype=bool)
    next_id = 0
    for mask in cand[order]:
        if int((mask & ~used).sum()) < min_pts:
            continue  # superseded by a longer tracklet already claimed
        refined = _refine_track(xyz, mask.copy(), refine_tol_arcsec * ARCSEC_RAD)
        if refined is None or int(refined.sum()) < min_pts:
            continue
        overlap = refined & used
        prior = labels[overlap]
        prior = prior[prior >= 0]
        if int(overlap.sum()) > merge_overlap and len(prior):
            tid = int(np.bincount(prior).argmax())
        else:
            tid = next_id
            next_id += 1
        used |= refined
        labels[refined] = tid
    return labels


def great_circle_tracklets(
    df: DataFrame,
    group_col: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    label_fmt: str = "TRCK_{}_{:02d}",
    **kwargs,
) -> DataFrame:
    """Per-exposure grouped-map tracklet extraction.

    ``groupBy(group_col).applyInPandas`` — one shuffle on the exposure
    key, each exposure one Arrow batch (the reference's constraint too).
    Adds ``tracklet`` (empty string = unassigned). ``kwargs`` pass
    through to :func:`find_sky_tracklets`.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    staged = df.withColumn("__group", F.col(group_col))
    schema = StructType(
        [f for f in staged.schema.fields if f.name != "__group"]
        + [StructField("tracklet", StringType(), True)]
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        labels = find_sky_tracklets(
            pdf[ra_col].to_numpy(), pdf[dec_col].to_numpy(), **kwargs
        )
        key = str(pdf["__group"].iloc[0])
        names = np.where(
            labels >= 0,
            [label_fmt.format(key, int(x)) if x >= 0 else "" for x in labels],
            "",
        )
        return pdf.assign(tracklet=names).drop(columns="__group")

    # same keyed spread rationale as tracklet_clustering above
    from fink_broker_spark.plans.partitioning import ensure_keyed_parallelism

    staged = ensure_keyed_parallelism(staged, "__group")
    return staged.groupBy("__group").applyInPandas(apply_fn, schema)
