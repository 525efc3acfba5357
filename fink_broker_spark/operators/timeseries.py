"""Time-series operators: phase folding and as-of linear interpolation.

Astronomy shapes from the reference's downstream science: variable-star
work folds a light curve on a trial period and bins the phases
(the classifier features fink's CBPF/SuperNNova modules consume are
built from exactly such folded curves), and solar-system matching
evaluates an ephemeris *between* its tabulated samples — an as-of join
is the nearest sample; interpolation is the correct value
(reference context: ``fink_broker/science.py`` SSO enrichment passes
observation epochs to ephemeris services).

Both are single-shuffle declarative plans:

- :func:`phase_fold` — pure Column math (integer-microsecond modular
  arithmetic — exact on both engines) + one groupBy on (series, bin);
- :func:`interpolate_at` — the union+window trick: observations and
  reference samples merge into ONE relation, a per-key ordered window
  carries the bracketing sample values/timestamps to each observation
  (``last(..., ignorenulls)`` backward + ``first(..., ignorenulls)``
  forward), and the interpolation itself is per-row expression math.
  One shuffle on the key — no join, no second scan of either side,
  and at 100 TB the window state per task is one row (the running
  last/first), never the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: microseconds — all phase arithmetic is exact integer math until the
#: final (per-row, order-free) double division
US_PER_S = 1_000_000


def phase_fold(
    df: DataFrame,
    ts_col: str,
    period_s: int,
    nbins: int = 8,
    t0_epoch_s: int = 0,
) -> DataFrame:
    """Add exact integer ``phase_us`` (microseconds into the period,
    from reference epoch ``t0``) and its ``phase_bin`` in ``[0, nbins)``.

    Integer-first: ``pmod(epoch_us - t0_us, period_us)`` never touches
    floating point, so bin assignment is bit-identical across engines;
    the fractional phase (if wanted) is a single per-row division."""
    period_us = period_s * US_PER_S
    t0_us = t0_epoch_s * US_PER_S
    epoch_us = F.unix_micros(F.col(ts_col))
    phase_us = F.pmod(epoch_us - F.lit(t0_us), F.lit(period_us))
    # integral DIV, not double division: a float quotient at a bin
    # boundary could round across it on one engine and not the other
    return df.withColumn("phase_us", phase_us).withColumn(
        "phase_bin",
        F.expr(f"CAST((phase_us * {nbins}) DIV {period_us} AS INT)"),
    )


def periodogram(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    periods_s: list[int],
    round_scale: int = 7,
) -> DataFrame:
    """Classical (Schuster) periodogram power at literal trial periods,
    per key — the period-search primitive behind variable-star work
    (Lomb–Scargle's uneven-sampling refinement shares this exact plan
    shape; the classical form keeps the math oracle-checkable).

    ``P(f) = (Σ v·cos ωt)² + (Σ v·sin ωt)²`` per (key, period).

    Distribution shape: each row explodes into ``len(periods_s)``
    (period, phase) rows — fan-out is the trial-grid size, a constant —
    then ONE groupBy((key, period)) shuffle computes the sin/cos sums.
    At 100 TB with a K-point frequency grid this is the honest K×
    work; nothing is quadratic and no state exceeds the aggregate row.

    FP discipline: the phase angle is reduced by exact integer
    ``pmod(epoch_us, period_us)`` BEFORE the trig call (sin/cos of a
    small argument, never of a 1e9-second epoch — large-argument trig
    is where libm implementations drift apart), and each sin/cos term
    rounds to ``decimal`` before the sum, so the aggregation is exact
    and order-independent across engines.
    """
    two_pi = 6.283185307179586
    epoch_us = F.unix_micros(F.col(ts_col))
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("period_s"),
                    (
                        F.pmod(epoch_us, F.lit(p * US_PER_S)).cast("double")
                        / F.lit(float(p * US_PER_S))
                        * F.lit(two_pi)
                    ).alias("angle"),
                )
                for p in periods_s
            ]
        )
    ).alias("pf")
    dec_t = f"decimal(18,{round_scale})"
    v = F.col(value_col).cast("double")
    # two-phase select: the generator gets its own projection, then the
    # struct fields are unpacked, then the rounded trig terms
    terms = (
        df.select(F.col(key_col).alias("k"), v.alias("v"), pairs)
        .select(
            "k",
            "v",
            F.col("pf.period_s").alias("period_s"),
            F.col("pf.angle").alias("angle"),
        )
        .select(
            "k",
            "period_s",
            F.round(F.col("v") * F.cos("angle"), round_scale)
            .cast(dec_t)
            .alias("c"),
            F.round(F.col("v") * F.sin("angle"), round_scale)
            .cast(dec_t)
            .alias("s"),
        )
    )
    sums = terms.groupBy("k", "period_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast(f"decimal(28,{round_scale})").alias("sc"),
        F.sum("s").cast(f"decimal(28,{round_scale})").alias("ss"),
    )
    # NO terminal round: at power ~1e9 the double's ulp reaches the 1e-6
    # rounding unit, and Spark (BigDecimal-of-double) and C libm float
    # rounding split exactly at half-boundaries. The raw double is
    # already deterministic — it derives from EXACT decimal sums through
    # an identical cast-multiply-add tree on both engines.
    power = (
        F.col("sc").cast("double") * F.col("sc").cast("double")
        + F.col("ss").cast("double") * F.col("ss").cast("double")
    )
    return sums.select(
        F.col("k"),
        "period_s",
        "n",
        power.alias("power"),
    )


def interpolate_at(
    obs: DataFrame,
    ref: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "interp_value",
) -> DataFrame:
    """Linearly interpolate ``ref``'s ``value_col`` at each ``obs``
    timestamp, per ``key_col`` — clamped to the nearest sample beyond
    the reference range (no extrapolation).

    Union-window plan: tag the two sides, union them, and per key
    (ordered by time, reference rows sorting BEFORE a same-timestamp
    observation so an exactly-hit sample is its own bracket) carry

    - ``prev_val``/``prev_ts``: last reference row at-or-before, via
      ``last(..., ignorenulls=True)`` over unbounded-preceding;
    - ``next_val``/``next_ts``: first reference row at-or-after, via
      ``first(..., ignorenulls=True)`` over unbounded-following;

    then compute ``prev + (next - prev) * (t - t_prev)/(t_next - t_prev)``
    as per-row double math (oracle-hashing callers emit the RAW
    double — both ``round(double, N)`` and a terminal DECIMAL cast
    split engines at half-boundaries; the identical IEEE op tree over
    exact integer-µs operands is bit-equal on both). Timestamps
    difference in exact integer microseconds.
    """
    o = obs.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("t"),
        F.lit(1).alias("is_obs"),
        F.lit(None).cast("double").alias("rv"),
        F.struct(*[F.col(c) for c in obs.columns]).alias("row"),
    )
    r = ref.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("t"),
        F.lit(0).alias("is_obs"),
        F.col(value_col).cast("double").alias("rv"),
        F.lit(None).cast(o.schema["row"].dataType).alias("row"),
    )
    u = o.unionByName(r)
    # "rv" breaks ties between reference rows sharing a timestamp, so
    # the ROWS frames see a deterministic order on every engine
    w_back = (
        Window.partitionBy("k")
        .orderBy("t", "is_obs", "rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("k")
        .orderBy("t", "is_obs", "rv")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # a reference sample only brackets if its VALUE is present — gating
    # ref_t on rv too keeps (prev_val, prev_ts) a pair from the SAME
    # sample; an ungated ref_t would borrow the timestamp of a
    # NULL-valued sample and interpolate along the wrong span
    ref_t = F.when(
        (F.col("is_obs") == 0) & F.col("rv").isNotNull(), F.col("t")
    )
    annotated = (
        u.withColumn("prev_val", F.last("rv", ignorenulls=True).over(w_back))
        .withColumn("prev_ts", F.last(ref_t, ignorenulls=True).over(w_back))
        .withColumn("next_val", F.first("rv", ignorenulls=True).over(w_fwd))
        .withColumn("next_ts", F.first(ref_t, ignorenulls=True).over(w_fwd))
        .filter(F.col("is_obs") == 1)
    )
    frac = (F.col("t") - F.col("prev_ts")).cast("double") / (
        F.col("next_ts") - F.col("prev_ts")
    ).cast("double")
    interp = F.when(
        F.col("prev_ts").isNull(), F.col("next_val")
    ).when(
        F.col("next_ts").isNull() | (F.col("next_ts") == F.col("prev_ts")),
        F.col("prev_val"),
    ).otherwise(
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    )
    return annotated.select("row.*", interp.alias(out_col))
