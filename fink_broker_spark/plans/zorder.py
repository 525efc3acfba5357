"""Z-order (Morton) interleaved sort keys as pure Column expressions.

The reference clusters its serving tables one-dimensionally: every HBase
index table sorts on a single composite row key built by string
concatenation (``bin/ztf/archive_index.py:47-296``), so a query that
constrains the *second* dimension (e.g. time for a pixel-keyed table)
still scans the whole key range. A Morton key interleaves the bits of two
dimensions so that rows close in BOTH dimensions land in the same file /
row-group — the standard multi-dimensional layout technique for columnar
lakes (Z-ordering), expressed here with JVM-side shift/mask arithmetic
(whole-stage codegen, no UDF).

Scale posture: compute the key scan-side, then
``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)`` before the
parquet write. Min/max column statistics per file then prune on *both*
dimensions for range predicates, which one-dimensional sorting cannot do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Magic-number bit-spreading masks for 16→32-bit interleave (the public
#: "Interleave bits by Binary Magic Numbers" technique). Applied on longs
#: so no stage overflows.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits_expr(col: Column | str, bits: int = 16) -> Column:
    """Spread the low ``bits`` bits of an integer column so consecutive
    source bits occupy even positions (0, 2, 4, …) of the result."""
    if bits > 16:
        raise ValueError("spread_bits_expr supports at most 16 bits")
    c = F.col(col) if isinstance(col, str) else col
    x = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
    for shift, mask in _SPREAD_STEPS:
        x = (
            x.bitwiseOR(F.shiftleft(x, shift))
            .bitwiseAND(F.lit(mask).cast("long"))
        )
    return x


def compact_bits_expr(col: Column | str, bits: int = 16) -> Column:
    """Inverse of :func:`spread_bits_expr`: collect the even-position
    bits back into a dense integer (the decode path when a stored
    Morton key must be split back into its dimensions, e.g. reading a
    serving table's key range back as per-dimension bounds)."""
    if bits > 16:
        raise ValueError("compact_bits_expr supports at most 16 bits")
    c = F.col(col) if isinstance(col, str) else col
    x = c.cast("long").bitwiseAND(F.lit(0x55555555).cast("long"))
    for shift, mask in reversed(_SPREAD_STEPS):
        # undo each spreading step: fold the bit pairs back together
        prev_mask = {8: 0x0000FFFF, 4: 0x00FF00FF, 2: 0x0F0F0F0F,
                     1: 0x33333333}[shift]
        x = (
            x.bitwiseOR(F.shiftrightunsigned(x, shift))
            .bitwiseAND(F.lit(prev_mask).cast("long"))
        )
    return x


def zorder_decode_exprs(
    zcol: Column | str, bits: int = 16
) -> tuple[Column, Column]:
    """(x, y) back from a Morton key — x from even bit positions, y
    from odd."""
    z = F.col(zcol) if isinstance(zcol, str) else zcol
    return (
        compact_bits_expr(z, bits),
        compact_bits_expr(F.shiftrightunsigned(z.cast("long"), 1), bits),
    )


def zorder_key_expr(
    xcol: Column | str, ycol: Column | str, bits: int = 16
) -> Column:
    """Morton key of two integer columns: x bits at even positions, y bits
    at odd positions. Monotone in neither input alone, but locality-
    preserving in both jointly — the property range-partitioned writes
    need."""
    return spread_bits_expr(xcol, bits).bitwiseOR(
        F.shiftleft(spread_bits_expr(ycol, bits), 1)
    )


def zorder_sql(xexpr: str, yexpr: str, bits: int = 16) -> str:
    """The identical arithmetic as ANSI SQL (DuckDB-executable) — the
    oracle twin of :func:`zorder_key_expr`, built from the same masks so
    the two can never drift."""
    if bits > 16:
        raise ValueError("zorder_sql supports at most 16 bits")

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})"
        for shift, mask in _SPREAD_STEPS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(xexpr)} | ({spread(yexpr)} << 1))"


def normalized_zorder_expr(
    df: DataFrame, xcol: str, ycol: str, bits: int = 16
) -> Column:
    """Morton key with each dimension min-max scaled to the full
    ``bits`` width first.

    Raw interleaving only balances pruning when both dimensions span
    comparable bit widths: a 7-bit dimension interleaved against an
    11-bit one contributes nothing to the key's high bits, so files
    cluster on the wide dimension alone (measured: 0/16 files prunable
    on the narrow dimension without normalization, 12/16 with — see
    SCALING.md "Z-order layout"). The min/max pair is one bounded
    1-row aggregate — a model fit, not data motion, same posture as the
    IVF centroid sample (``ext/ann.py``).
    """
    row = df.agg(
        F.min(xcol).alias("xlo"),
        F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"),
        F.max(ycol).alias("yhi"),
    ).collect()[0]
    top = (1 << bits) - 1

    def scale(col: str, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        return (
            (F.col(col).cast("long") - F.lit(int(lo)))
            * F.lit(top)
            / F.lit(span)
        ).cast("long")

    return zorder_key_expr(
        scale(xcol, row.xlo, row.xhi), scale(ycol, row.ylo, row.yhi), bits
    )


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    num_partitions: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the normalized Morton key of
    two columns.

    ``repartitionByRange`` samples the key distribution (one extra pass,
    same mechanism the reference's sorted HBase loads rely on implicitly)
    and produces non-overlapping key ranges per file, so per-file min/max
    stats prune on both source dimensions.
    """
    keyed = df.withColumn(
        "__zkey", normalized_zorder_expr(df, xcol, ycol, bits)
    )
    (
        keyed.repartitionByRange(num_partitions, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
