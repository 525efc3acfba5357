"""Oracle-diff harness: every declared query hash-matches DuckDB at sf0.01.

This IS the correctness gate (SURVEY.md §5 implication): exact value
equality, order-insensitive, column-name-keyed — stricter than the
driver's value-hash, on the very same scale factor the driver uses.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF001, run_oracle_compare

ORACLE_NAMES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity_sf001(spark, name):
    run_oracle_compare(spark, name, SF001)


def test_all_queries_have_oracle_or_reason():
    queries = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= queries
    # engine-hash-specific / stateful-streaming ops are the only
    # permitted oracle-less entries
    assert queries - oracles <= {
        "minhash_lsh_neardup",
        "simhash_neardup",
        "stream_dedup_watermark",
        "ivf_ann_topk",
        "pq_ann_topk",  # codebook fit is engine-specific
        "ann_kernel_topk",
        "approx_cardinality",  # sketch estimates are engine-specific
        "embedding_pca",  # eigendecomposition is not ANSI-expressible
        "approx_quantiles",  # sketch estimates are engine-specific
        "semantic_dedup",  # k-means model fit is not ANSI-expressible
    }


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_driver_priority_names_resolve():
    """A typo in _DRIVER_PRIORITY silently drops a query from the
    driver's 50-row sample window (the ordering filters unknown names);
    every entry must be a real query and unique."""
    priority = entrymod._DRIVER_PRIORITY
    queries = set(entrymod.queries())
    unknown = [n for n in priority if n not in queries]
    assert not unknown, f"priority names not in queries(): {unknown}"
    assert len(priority) == len(set(priority))
    assert len(priority) <= 50  # the driver's per-round sample size
    # priority names must actually come FIRST in iteration order
    assert list(entrymod.queries())[: len(priority)] == priority
