"""Distribution layer: named boolean filters → per-topic substreams.

Re-expresses the reference's distribute service (``bin/ztf/distribute.py:
47-50,167-200``; Rubin variant ``bin/rubin/distribute.py:118-160``): user
filters are discovered as named predicates, each spawning one output
substream (Kafka topic in production; any sink callable in tests via the
``foreachBatch``-style capture).

A filter is any callable ``DataFrame -> Column`` returning a boolean
Column — covering both the reference's pure-expression filters and its
pandas-UDF predicates (``FinkUDF`` wrapping at
``bin/rubin/distribute.py:118-136``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

FilterFn = Callable[[DataFrame], Column]


@dataclass
class FilterRegistry:
    """Named predicate registry (the reference auto-discovers these from a
    package namespace, ``bin/ztf/distribute.py:47-50``; here registration
    is explicit)."""

    filters: dict[str, FilterFn] = field(default_factory=dict)

    def register(self, name: str, fn: FilterFn) -> "FilterRegistry":
        self.filters[name] = fn
        return self

    def names(self) -> list[str]:
        return sorted(self.filters)


def fan_out(
    df: DataFrame,
    registry: FilterRegistry,
    sink: Callable[[str, DataFrame], object],
) -> dict[str, object]:
    """Apply every registered filter and hand each substream to ``sink``.

    ``sink(topic_name, filtered_df)`` returns a handle (a streaming query
    in production, a materialized result in tests). One substream per
    filter, all sharing the single upstream scan — Spark runs them as
    independent queries against the same source (the reference's
    one-query-per-topic model, ``bin/ztf/raw2science.py:144``).
    """
    handles: dict[str, object] = {}
    for name in registry.names():
        pred = registry.filters[name](df)
        handles[name] = sink(name, df.filter(pred))
    return handles
