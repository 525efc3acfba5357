"""Watermarked stream-stream join.

Re-expresses the reference's GCN × ZTF multi-messenger join
(``fink_broker/ztf/mm_utils.py:154-235``): two live streams matched by a
sky-region equi-key (healpix pixel) plus a time-window predicate. The
reference delegates to an external package; here it is the native
Structured Streaming form — both sides watermarked so the join state is
bounded, the equi-key carried explicitly so the shuffle is a hash
partition on it, and the time tolerance expressed as a range predicate
the state manager uses to evict rows.

State sizing at 100 TB: each side retains only rows inside
``watermark + tolerance``; with per-night volumes of ~10⁷ events and a
1-hour tolerance the state is minutes of stream, hash-partitioned — the
same bound the streaming-dedup operator documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    tolerance: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streaming DataFrames on equi-keys within a time window.

    Matches rows where all ``on`` columns are equal and
    ``right_time ∈ [left_time − tolerance, left_time + tolerance]``.
    Column name collisions outside ``on`` must be resolved by the caller
    (Spark requirement for self-joins).
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    keys = [lw[k] == rw[k] for k in on]
    window = (
        rw[right_time]
        >= lw[left_time] - F.expr(f"INTERVAL {tolerance}")
    ) & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {tolerance}"))
    cond = keys[0]
    for k in keys[1:]:
        cond = cond & k
    return lw.join(rw, cond & window, how)
