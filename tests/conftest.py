"""Shared fixtures: one local SparkSession per test run + DuckDB oracle.

Mirrors the reference's tester harness (``fink_broker/common/tester.py``:
a ``local[2]`` session injected into every doctest) — here a pytest
session fixture on ``local[8]`` with the engine's conf policy.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fink_broker_spark.core.session import get_session  # noqa: E402
from fink_broker_spark.sources.parquet import LAKE_TABLES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        app_name="fbs-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the lake tables registered as views — the
    same contract the correctness driver provides."""
    con = duckdb.connect()
    for table in LAKE_TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(value):
    if isinstance(value, float) and math.isnan(value):
        return "NaN"
    return value


def assert_frames_equal(spark_df, duck_rows, duck_cols):
    """Order-insensitive, column-name-keyed exact comparison.

    Stricter than the driver's value-hash: exact python-value equality
    after sorting columns by name and rows by their full tuple.
    """
    s_cols = sorted(spark_df.columns)
    assert sorted(duck_cols) == s_cols, (
        f"column sets differ: spark={s_cols} duck={sorted(duck_cols)}"
    )
    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [list(duck_cols).index(c) for c in s_cols]
    def sort_key(row):
        # rollup/grouping-set rows carry NULL keys: make None orderable
        return tuple((value is None, repr(value)) for value in row)

    s_rows = sorted(
        (
            tuple(_normalize(row[i]) for i in s_idx)
            for row in spark_df.collect()
        ),
        key=sort_key,
    )
    d_rows = sorted(
        (tuple(_normalize(row[i]) for i in d_idx) for row in duck_rows),
        key=sort_key,
    )
    assert len(s_rows) == len(d_rows), (
        f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, f"row {i} differs:\n  spark={sr}\n  duck ={dr}"


def run_oracle_compare(spark, name: str, sf_dir: str):
    """Run queries()[name] and oracle_sql()[name] side-by-side, compare."""
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, sf_dir)
    con = duck_connection(sf_dir)
    cur = con.execute(entrymod.oracle_sql()[name])
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    assert_frames_equal(sdf, rows, cols)
