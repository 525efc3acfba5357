"""Grouped-aggregate pandas UDFs — the UDAF quadrant of the UDF surface.

SURVEY.md §2.12 covers scalar pandas UDFs, grouped-map
(``applyInPandas``), and Python UDTFs; this module adds the fourth
Spark UDF shape: ``GROUPED_AGG`` pandas UDFs, which act as first-class
aggregate *expressions* — usable inside ``groupBy().agg(...)``
alongside built-ins AND over an unbounded ``Window`` — with Arrow
batch transfer. (The reference's custom aggregations are all
grouped-map style, e.g. ``fink_broker/science.py``'s per-object
pandas blocks; the GROUPED_AGG form is the idiomatic Spark expression
when the result is one scalar per group.)

Scale note: unlike built-in aggregates, GROUPED_AGG UDFs have **no
map-side partial** — every group's full column slice crosses the
shuffle. Use them for genuinely-custom math on moderate-cardinality
groups; anything expressible as SUM/COUNT algebra should stay
declarative (the oracled query twins both forms to make the
equivalence auditable).

Determinism contract: float summation order inside a group depends on
Arrow batch order, so these UDAFs do **exact integer arithmetic**
(cents × integer quantity) and defer the single IEEE division to the
end — bit-stable under any row order and equal to the ANSI oracle
expression (one float division is exactly specified by IEEE 754).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted mean price, exact-integer inside.

    ``price`` carries 2-decimal currency values; ``floor(x + 0.5)``
    recovers the cent integer through the SAME IEEE tree the oracle
    uses — convention-free on .5 ties, unlike rint (half-even) vs
    DuckDB round (half-away), which split engines when a value sits
    exactly on a half (driftlab 'boundary' layout regression).

    NON-NEGATIVE-INPUT assumption: ``floor(x + 0.5)`` is half-UP, not
    half-away-from-zero — a NEGATIVE value on an exact .5 tie maps to
    the higher integer (-2.5 → -2), one cent off currency convention.
    Engine parity holds regardless (the oracle mirrors the identical
    tree); the convention only matters for the absolute result, and
    prices/quantities here are non-negative by data contract. For
    signed inputs use ``sign(x) * floor(abs(x) + 0.5)`` on BOTH sides.
    """
    p = price.to_numpy(dtype="float64")
    q_raw = qty.to_numpy(dtype="float64")
    # pairwise NULL exclusion (SQL SUM(cents*qty) semantics): a NULL
    # price or quantity arrives as NaN and would poison the int casts
    # (driftlab nullmeasure)
    keep = ~(np.isnan(p) | np.isnan(q_raw))
    cents = np.floor(p[keep] * 100.0 + 0.5).astype("int64")
    q = np.floor(q_raw[keep] + 0.5).astype("int64")
    den = int(q.sum()) * 100
    if den == 0:
        return float("nan")
    return float(int((cents * q).sum())) / float(den)


@pandas_udf("long")
def span_days(ts: pd.Series) -> int:
    """Group time span in whole days (max − min), exact int64 math."""
    v = ts.dropna()
    if v.empty:
        return 0
    # normalize the Arrow-side unit (ns vs us varies by version) before
    # viewing as int64
    ns = v.to_numpy().astype("datetime64[ns]").astype("int64")
    return int((ns.max() - ns.min()) // 86_400_000_000_000)
