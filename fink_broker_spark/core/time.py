"""Time semantics: Julian/Modified-Julian date ⇄ timestamp, night partitions.

The reference carries event time as Julian dates (``candidate.jd``) or MJD
(``diaSource.midpointMjdTai``) and converts to wall-clock with *pandas
UDFs* (``fink_broker/common/partitioning.py:26-105``). Here the same
conversions are pure JVM Column expressions — no Arrow boundary, fully
inside whole-stage codegen, and usable in partition pruning.

Conventions (public astronomy definitions):
- ``jd  = unix_seconds / 86400 + 2440587.5``
- ``mjd = jd - 2400000.5``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Julian date of the Unix epoch (1970-01-01T00:00:00Z).
JD_UNIX_EPOCH = 2440587.5
#: Offset between Julian and Modified Julian date.
MJD_OFFSET = 2400000.5
MICROS_PER_DAY = 86400000000.0


def nanos_to_timestamp(col: Column | str) -> Column:
    """Long nanoseconds-since-epoch → TimestampType (microsecond).

    Companion to ``spark.sql.legacy.parquet.nanosAsLong``: parquet
    TIMESTAMP(NANOS) columns arrive as longs; truncate to micros (toward
    zero — post-1970 data only in this domain).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(nanos_to_micros(c))


def nanos_to_micros(col: Column | str) -> Column:
    """Exact integer ns → µs truncation.

    NOT ``(ns / 1000).cast("long")``: ``/`` is double division and a
    ~1.7e18 nanosecond count exceeds double's 53-bit integer range, so the
    quotient can be off by ±1 µs. Exact decimal division instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(38,0)") / F.lit(1000)).cast("long")


def ensure_event_ts(df, col: str = "ts"):
    """Normalize an event-time column to ``TimestampType`` whatever the
    lake stored: parquet TIMESTAMP(NANOS) read as long (``nanosAsLong``),
    TIMESTAMP(MICROS) read as ``timestamp_ntz``, or an already-correct
    timestamp. The session pins UTC (``core/session.py``), so the
    ntz→timestamp cast is an identity on the stored micros value.

    The reference hard-codes one wire type per survey; a general engine
    meets the lake as it finds it (schema-evolution posture, SURVEY §2.4
    select-with-defaults).
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, nanos_to_timestamp(col))
    if dt != "timestamp":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_micros(ts: Column | str) -> Column:
    """TimestampType → long microseconds since epoch (exact)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c)


def timestamp_to_jd(ts: Column | str) -> Column:
    """TimestampType → Julian date (double).

    Replaces the reference's ``convert_to_jd`` pandas-UDF path
    (``common/partitioning.py:26-62``) with a native expression.
    """
    return epoch_micros(ts) / F.lit(MICROS_PER_DAY) + F.lit(JD_UNIX_EPOCH)


def jd_expr(us: Column | str) -> Column:
    """Long epoch-microseconds → Julian date (double)."""
    c = F.col(us) if isinstance(us, str) else us
    return c / F.lit(MICROS_PER_DAY) + F.lit(JD_UNIX_EPOCH)


def jd_to_mjd(jd: Column | str) -> Column:
    c = F.col(jd) if isinstance(jd, str) else jd
    return c - F.lit(MJD_OFFSET)


def mjd_expr(us: Column | str) -> Column:
    """Long epoch-microseconds → Modified Julian date (double)."""
    return jd_to_mjd(jd_expr(us))


def jd_to_timestamp(jd: Column | str) -> Column:
    """Julian date (double) → TimestampType.

    Native replacement for ``convert_to_datetime``
    (``common/partitioning.py:65-105``).
    """
    c = F.col(jd) if isinstance(jd, str) else jd
    return F.timestamp_micros(((c - F.lit(JD_UNIX_EPOCH)) * F.lit(MICROS_PER_DAY)).cast("long"))


def night_partition_cols(ts: Column | str) -> dict[str, Column]:
    """Hive-style ``year=/month=/day=`` partition columns from a timestamp.

    Mirrors the raw-lake layout written by the reference's ingest sink
    (``bin/ztf/stream2raw.py:154-158``: ``date_format(ts,'yyyy'/'MM'/'dd')``)
    but keeps integers so partition pruning compares numerically.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "year": F.year(c).cast("int"),
        "month": F.month(c).cast("int"),
        "day": F.dayofmonth(c).cast("int"),
    }


def with_night_partitions(df, ts_col: str):
    """Attach year/month/day partition columns to ``df``."""
    out = df
    for name, col in night_partition_cols(ts_col).items():
        out = out.withColumn(name, col)
    return out
