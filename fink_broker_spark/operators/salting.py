"""Key-salting expressions for skew spreading and serving-table row keys.

The reference salts HBase row keys so lexicographic regions receive uniform
write load: last-N-digits salt (``common/hbase_utils.py:485-526``) and
year-digit salt (``:529-564``). The same expressions serve as generic
shuffle-skew salts: prepend a low-cardinality uniform prefix to a hot key,
aggregate in two phases, strip the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(key: Column | str, ndigits: int = 3) -> Column:
    """Uniform salt from the *last* ``ndigits`` decimal digits of a key.

    Mirrors ``salting_partitioner`` (``common/hbase_utils.py:485-526``):
    trailing digits of a dense id are uniformly distributed, so
    ``lpad(right(key, n), n, '0')`` yields 10^n even buckets. Implemented
    with ``right`` (not negative-index substring) so the identical
    expression is valid ANSI SQL for the oracle.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.lpad(F.right(c.cast("string"), F.lit(ndigits)), ndigits, "0")


def salted_row_key(
    salt: Column, *parts: Column | str, sep: str = "_"
) -> Column:
    """Composite serving-table row key: ``salt_part1_part2_...``.

    Reference: ``concat_ws('_', salt, objectId, jd)`` row keys
    (``common/hbase_utils.py:339``, ``bin/ztf/archive_index.py:194,250``).
    """
    cols = [salt] + [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws(sep, *[c.cast("string") for c in cols])


def with_salted_repartition(
    df: DataFrame, key: str, nbuckets: int = 32, salt_col: str = "__salt"
) -> DataFrame:
    """Spread a skewed key across ``nbuckets`` sub-keys for two-phase
    aggregation. Caller aggregates on ``(key, salt_col)`` first, then on
    ``key``. With AQE skew-join enabled this is rarely needed for joins,
    but two-phase aggregation over a hot group key still benefits.

    ``pmod`` (not ``%``) keeps salts in [0, nbuckets) — Spark's ``%``
    follows the dividend's sign, which would double the bucket range and
    emit negatives. The salt hashes the key plus every other column, so
    it is deterministic across task retries (unlike
    ``monotonically_increasing_id``). Rows of a hot key spread as far
    as their non-key columns differ; byte-identical duplicate rows
    share a salt by construction — which is fine for the two-phase
    aggregation this feeds, because identical rows land in the same
    ``(key, salt)`` group and map-side partial aggregation collapses
    them to one row per input partition before the shuffle.
    """
    others = [c for c in df.columns if c != key]
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.col(key), *[F.col(c) for c in others]),
            F.lit(nbuckets),
        ),
    )
