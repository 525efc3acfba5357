"""Concurrent streaming-query lifecycle management.

The reference runs one streaming query per output topic/table inside a
single session and blocks on ``spark.streams.awaitAnyTermination()``
(``bin/ztf/raw2science.py:144``, ``bin/rubin/distribute.py:192``), with a
``-exit_after`` mode that sleeps then stops every query for bounded CI
runs (``bin/ztf/stream2raw.py:179-184``). This module is that control
surface as a small class.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession


class QueryManager:
    """Track a set of streaming queries; wait / bounded-run / stop all."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.queries = []

    def add(self, query):
        self.queries.append(query)
        return query

    def await_any_termination(self, timeout_s: float | None = None):
        """Block until any tracked query terminates (the reference's
        steady-state serve loop)."""
        if timeout_s is None:
            return self.spark.streams.awaitAnyTermination()
        return self.spark.streams.awaitAnyTermination(int(timeout_s * 1000))

    def exit_after(self, seconds: float, poll_s: float = 0.5):
        """Bounded run: let the queries process for ``seconds``, then stop
        them all (``-exit_after``; returns once every query is inactive).
        Returns the total rows processed per query name as a dict."""
        deadline = time.monotonic() + seconds
        while time.monotonic() < deadline and any(
            q.isActive for q in self.queries
        ):
            time.sleep(min(poll_s, max(0.0, deadline - time.monotonic())))
        return self.stop_all()

    def stop_all(self) -> dict[str, int]:
        """Stop every tracked query; report rows seen per query."""
        counts: dict[str, int] = {}
        for q in self.queries:
            name = q.name or q.id
            total = 0
            for p in q.recentProgress:
                total += int(p["numInputRows"])
            counts[str(name)] = total
            if q.isActive:
                q.stop()
        return counts


def with_observed_metrics(df, name: str, *metric_cols):
    """Attach named observable metrics to a (batch or streaming) plan.

    The reference monitors per-batch input counts by scraping
    ``lastProgress`` (the dashboard path behind ``bin/fink:215-228``);
    ``Dataset.observe`` is the engine-native version — aggregates
    computed INSIDE the running plan (no second scan, no extra action)
    and surfaced per micro-batch in ``StreamingQueryProgress
    .observedMetrics`` or, for batch, via QueryExecutionListener. Use
    counting/sum/min/max expressions only (must be aggregates)."""
    return df.observe(name, *metric_cols)


def pop_observed_metrics(query, name: str) -> list[dict]:
    """Collect the observed-metrics rows named ``name`` from every
    recorded micro-batch progress of ``query`` (oldest first)."""
    out: list[dict] = []
    for p in query.recentProgress:
        om = p.get("observedMetrics") if isinstance(p, dict) else None
        if om is None and hasattr(p, "observedMetrics"):
            om = p.observedMetrics
        if om and name in om:
            row = om[name]
            out.append(row.asDict() if hasattr(row, "asDict") else dict(row))
    return out
