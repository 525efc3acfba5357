"""Physical-plan linter: the 100 TB smell test as a tool.

Every round's manual plan audit checks the same things — does anything
cartesian, nested-loop, row-at-a-time, or globally-sort without a
limit? This module mechanizes that checklist over Spark's physical plan
string so the audit is a regression test (``tests/test_plan_lint.py``
runs it over EVERY registered query), not a review-time ritual.

Smells and why they kill at scale:

- ``CartesianProduct`` — O(|L|·|R|) rows; only ever acceptable when one
  side is a literal handful of rows (e.g. a broadcast 1-row sketch).
- ``BroadcastNestedLoopJoin`` — per-row scan of the broadcast side; the
  honest plan for non-equi predicates against a TINY side, a disaster
  against anything else.
- ``BatchEvalPython`` — row-at-a-time (pickled) Python UDF; the 10-100×
  slow path vs Arrow. ``ArrowEvalPython``/``MapInPandas``/
  ``FlatMapGroupsInPandas`` are the sanctioned vectorized boundaries
  and are NOT flagged.
- global ``Sort`` (``Sort [...], true``) not absorbed into
  ``TakeOrderedAndProject`` — a full-data range-exchange sort whose
  output order a hash-compared result doesn't even need. Top-k must
  compile to TakeOrdered; writers wanting clustering should
  ``repartitionByRange`` + ``sortWithinPartitions`` (local sorts,
  flagged never).

The linter reads the PRE-EXECUTION physical plan (AQE may later improve
it at runtime, but a smell that is absent before AQE cannot appear
afterwards, and lint must not require executing the query).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

#: smell name -> regex over physical-plan lines
_SMELLS: dict[str, re.Pattern] = {
    "cartesian_product": re.compile(r"\bCartesianProduct\b"),
    "broadcast_nested_loop_join": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "python_udf_row_at_a_time": re.compile(r"\bBatchEvalPython\b"),
    # Sort [...], true  == global (range-exchange) sort
    "global_sort_without_limit": re.compile(r"\bSort \[[^\]]*\], true\b"),
}


@dataclass
class PlanFinding:
    smell: str
    evidence: str  # the offending plan line, truncated

    def __str__(self) -> str:  # readable pytest output
        return f"{self.smell}: {self.evidence}"


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(
    df_or_plan: DataFrame | str, allow: set[str] | frozenset[str] = frozenset()
) -> list[PlanFinding]:
    """Return the smells present in the plan, minus the ``allow``-ed
    ones. ``TakeOrderedAndProject`` is recognized as the sanctioned
    top-k form; a global Sort feeding a ``GlobalLimit`` directly is
    tolerated too (Spark >=3.4 usually fuses it, but a wide limit can
    keep them separate).

    Given a DataFrame, the join/UDF smells are read from the physical
    plan and the global-sort smell from the OPTIMIZED LOGICAL plan —
    under AQE a terminal sort is planned lazily and never prints in the
    pre-execution physical plan, so the physical text alone would miss
    exactly the most common offender (a trailing ``orderBy``). Given a
    plain string, all patterns run against it as-is."""
    if isinstance(df_or_plan, str):
        sources = {smell: df_or_plan for smell in _SMELLS}
    else:
        qe = df_or_plan._jdf.queryExecution()
        physical = qe.executedPlan().toString()
        logical = qe.optimizedPlan().toString()
        sources = {
            smell: (logical if smell == "global_sort_without_limit" else physical)
            for smell in _SMELLS
        }
    findings: list[PlanFinding] = []
    for smell, pat in _SMELLS.items():
        if smell in allow:
            continue
        lines = sources[smell].splitlines()
        for i, line in enumerate(lines):
            if not pat.search(line):
                continue
            if smell == "global_sort_without_limit" and _limit_above(
                lines, i
            ):
                continue
            findings.append(PlanFinding(smell, line.strip()[:160]))
            break  # one finding per smell is enough signal
    return findings


def _limit_above(lines: list[str], sort_idx: int) -> bool:
    """True when a GlobalLimit sits directly above the Sort (the
    sort+limit pair Spark sometimes keeps unfused for large k)."""
    for j in range(sort_idx - 1, max(-1, sort_idx - 4), -1):
        if "GlobalLimit" in lines[j] or "CollectLimit" in lines[j]:
            return True
        if re.search(r"\b(Join|Aggregate|Exchange|Scan)\b", lines[j]):
            return False
    return False
