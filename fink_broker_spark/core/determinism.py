"""Injectable determinism for otherwise non-reproducible sources.

SURVEY §7.3 hard part 5: the reference sprinkles wall-clock stamps
(``common/partitioning.py:56-58``), ``F.rand`` Kafka partition spread
(``common/distribution_utils.py:127-129``) and ``uuid()`` ephemeris ids
(``bin/ztf/compute_ephemerides.py:89``) through its pipelines, which
makes oracle-diff testing impossible. This module provides the
deterministic stand-ins the engine uses everywhere:

- content-derived UUIDs (stable across runs, clusters, and engines),
- seeded ``rand`` with the caveat that Spark's per-partition streams tie
  values to the physical partitioning (pin partitioning to pin values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_uuid(*cols: Column | str, sep: str = "|") -> Column:
    """UUID-shaped id derived from the row content (md5 of the joined
    key columns): same row → same id, on any engine. Replaces ``uuid()``
    (``bin/ztf/compute_ephemerides.py:89``) wherever the id must be
    reproducible."""
    h = F.md5(F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols]))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def seeded_rand(seed: int) -> Column:
    """``F.rand(seed)`` — reproducible ONLY for a fixed physical
    partitioning (Spark seeds one stream per partition). Use for the
    Kafka partition-spread idiom; never for oracle-checked results."""
    return F.rand(seed)
