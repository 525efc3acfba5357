"""Array / nested-history operators: concat_col, explode+zip, HOF reductions.

The reference's central nested idiom is the per-row history array
(``prv_candidates: array<struct>``). These operators re-express its three
manipulation patterns as native Column expressions (no UDFs):

1. ``concat_col`` — current value prepended/appended to history
2. ``explode(arrays_zip(...))`` — history arrays → long-format rows
3. higher-order ``aggregate``/``filter`` — per-row reductions
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_col(
    df: DataFrame,
    name: str,
    current_prefix: str = "candidate.",
    history_col: str = "prv_candidates",
    prefix: str = "c",
    position: str = "append",
) -> DataFrame:
    """Build ``<prefix><name>`` = history array ++ current scalar.

    Native re-expression of ``fink_utils.spark.utils.concat_col`` as used
    at ``ztf/science.py:251-255`` and ``rubin/science.py:272-282``: science
    processors consume full light curves, so each batch row carries
    ``c<field> = prv_candidates.<field> ++ [candidate.<field>]``.
    Invariant (FIXTURES.md §2): ``size(c<name>) == 1 + size(history)``.
    """
    cur = F.array(F.col(f"{current_prefix}{name}"))
    hist = F.col(f"{history_col}.{name}")
    merged = (
        F.concat(cur, hist) if position == "prepend" else F.concat(hist, cur)
    )
    return df.withColumn(f"{prefix}{name}", merged)


def explode_history(
    df: DataFrame,
    history_col: str,
    fields: Sequence[str],
    keep: Sequence[str] = (),
    exploded_name: str = "h",
) -> DataFrame:
    """History arrays → one row per history element (long format).

    Reference: the upper-limit index table explodes
    ``arrays_zip(prv_candidates.{jd,fid,magpsf,...})``
    (``bin/ztf/archive_index.py:186-205``). Row count invariant:
    ``sum(size(history_col))``.
    """
    zipped = F.arrays_zip(
        *[F.col(f"{history_col}.{f}").alias(f) for f in fields]
    )
    out = df.select(*keep, F.explode(zipped).alias(exploded_name))
    return out.select(
        *keep, *[F.col(f"{exploded_name}.{f}").alias(f) for f in fields]
    )


def array_reduce_max(arr: Column | str, field: str | None = None) -> Column:
    """HOF reduction: max over an array (optionally of a struct field).

    Reference: newest forced-photometry epoch via
    ``aggregate(prvDiaSources, -1.0, (acc, x) -> greatest(acc,
    x.midpointMjdTai))`` (``rubin/hbase_utils.py:1124-1134``). Runs per-row
    inside codegen — no explode, no shuffle.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    init = F.lit(float("-inf"))
    if field is None:
        return F.aggregate(c, init, lambda acc, x: F.greatest(acc, x))
    return F.aggregate(c, init, lambda acc, x: F.greatest(acc, x[field]))


def array_filter_since(
    arr: Column | str, field: str, threshold: Column
) -> Column:
    """HOF filter: keep array elements with ``elem[field] >= threshold``.

    Reference: ``filter(prvDiaForcedSources, x -> x.midpointMjdTai >=
    maxMidpointMjdTai)`` (``rubin/hbase_utils.py:1137-1142``).
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.filter(c, lambda x: x[field] >= threshold)
