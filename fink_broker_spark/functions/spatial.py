"""Sky pixelization: HEALPix ang2pix (RING) and an equirectangular grid.

The reference pixelizes alert coordinates with healpy inside pandas UDFs
(``ang2pix`` at ``common/spark_utils.py:529-564``, multi-resolution
variant at ``:567-609``) to drive crossmatch bucketing and index-table row
keys. healpy is not a dependency here: :func:`ang2pix_ring` implements the
public RING-scheme algorithm (Górski et al. 2005, ApJ 622:759) directly in
vectorized NumPy behind a pandas UDF, and :func:`grid_pixel_expr` offers a
pure-Column equirectangular alternative that stays in codegen (and is
expressible in ANSI SQL for the oracle harness).

Both are *bucketing* functions: equal pixel ⇒ nearby on the sky, which
turns a cone-search crossmatch into an equi-join on pixel id
(SURVEY.md §2.5 "healpix-bucketed broadcast range join").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def ang2pix_ring_np(
    ra_deg: np.ndarray, dec_deg: np.ndarray, nside: int
) -> np.ndarray:
    """Vectorized HEALPix RING-scheme ang2pix (Górski et al. 2005).

    Accepts degrees (astronomy convention: ra ∈ [0, 360), dec ∈ [-90, 90]).
    """
    theta = np.deg2rad(90.0 - np.asarray(dec_deg, dtype=np.float64))
    phi = np.deg2rad(np.mod(np.asarray(ra_deg, dtype=np.float64), 360.0))
    z = np.cos(theta)
    tt = np.mod(phi / (0.5 * np.pi), 4.0)

    pix = np.empty(z.shape, dtype=np.int64)
    equa = np.abs(z) <= 2.0 / 3.0

    # equatorial belt
    temp1 = nside * (0.5 + tt[equa])
    temp2 = nside * z[equa] * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)  # ascending edge line
    jm = np.floor(temp1 + temp2).astype(np.int64)  # descending edge line
    ir = nside + 1 + jp - jm  # ring number counted from z = 2/3
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) // 2
    ip = np.mod(ip, 4 * nside)
    ncap = 2 * nside * (nside - 1)
    pix[equa] = ncap + (ir - 1) * 4 * nside + ip

    # polar caps
    pol = ~equa
    tp = tt[pol] - np.floor(tt[pol])
    tmp = nside * np.sqrt(3.0 * (1.0 - np.abs(z[pol])))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir = jp + jm + 1
    ip = np.mod(np.floor(tt[pol] * ir).astype(np.int64), 4 * ir)
    north = z[pol] > 0
    pix_pol = np.where(
        north,
        2 * ir * (ir - 1) + ip,
        12 * nside * nside - 2 * ir * (ir + 1) + ip,
    )
    pix[pol] = pix_pol
    return pix


def ang2pix_udf(nside: int = 256):
    """Pandas-UDF wrapper (Arrow-vectorized), mirroring the reference's
    ``ang2pix`` operator signature (``common/spark_utils.py:529-564``)."""

    @pandas_udf("long")
    def _ang2pix(ra: pd.Series, dec: pd.Series) -> pd.Series:
        return pd.Series(
            ang2pix_ring_np(ra.to_numpy(), dec.to_numpy(), nside)
        )

    return _ang2pix


def grid_pixel_expr(
    ra: Column | str, dec: Column | str, cell_deg: float = 1.0
) -> Column:
    """Equirectangular grid cell id as a pure Column expression.

    ``pix = floor((dec+90)/cell) * ceil(360/cell) + floor(ra/cell)`` —
    codegen-friendly, ANSI-SQL-mirrorable, good enough for bucketed
    crossmatch joins when HEALPix's equal-area property is not required.
    """
    r = F.col(ra) if isinstance(ra, str) else ra
    d = F.col(dec) if isinstance(dec, str) else dec
    ncols = int(np.ceil(360.0 / cell_deg))
    return (
        F.floor((d + F.lit(90.0)) / F.lit(cell_deg)) * F.lit(ncols)
        + F.floor(r / F.lit(cell_deg))
    ).cast("long")


def neighbor_pixels_expr(
    ra: Column | str, dec: Column | str, cell_deg: float = 1.0
) -> Column:
    """The 3×3 neighborhood of grid cells around a point (array<long>).

    Crossmatch pattern: explode the query side over its neighborhood and
    equi-join on pixel id — candidates within one cell of the true
    position are guaranteed to collide, after which an exact angular
    distance filter applies (cone search radius ≤ cell size).
    """
    r = F.col(ra) if isinstance(ra, str) else ra
    d = F.col(dec) if isinstance(dec, str) else dec
    ncols = int(np.ceil(360.0 / cell_deg))
    row = F.floor((d + F.lit(90.0)) / F.lit(cell_deg))
    col = F.floor(r / F.lit(cell_deg))
    cells = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            cells.append(
                ((row + F.lit(dr)) * F.lit(ncols)
                 + F.pmod(col + F.lit(dc), F.lit(ncols))).cast("long")
            )
    return F.array_distinct(F.array(*cells))
