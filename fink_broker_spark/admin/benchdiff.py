"""Cross-round benchmark regression triage.

Every round produces a ``BENCH_r{N}.json`` and the same questions get
asked by hand: which queries got slower, is it noise or a plan change,
what's new? This mechanizes the triage the same way ``rotation.py``
mechanized the sampling order — artifacts in, ranked diff out.

The noise model follows SCALING.md "Bench-environment variance":
per-query single-run timings on a shared host swing up to ~5× on
sub-second queries, so a regression is only *reportable* when the
query is both slow in absolute terms (``min_abs`` seconds — spikes on
trivial queries are scheduler noise by observation) and slower by more
than ``min_ratio``×.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


@dataclass
class BenchDelta:
    name: str
    before: float | None  # None = new query this round
    after: float
    ratio: float | None

    def __str__(self) -> str:
        if self.before is None:
            return f"{self.name}: NEW at {self.after:.2f}s"
        return (
            f"{self.name}: {self.before:.2f}s -> {self.after:.2f}s"
            f" ({self.ratio:.1f}x)"
        )


def load_bench(path: str) -> dict[str, float]:
    """Per-query seconds from either bench artifact shape:

    - ``BENCH_FULL_LOCAL.json`` — the full object with ``queries``;
    - the driver's ``BENCH_r{N}.json`` — ``{"tail": "<last 2000 chars
      of stdout>"}`` holding a TRUNCATED JSON line, from which the
      intact ``"name":float`` pairs are regex-recovered (the leading
      pair may be cut mid-name; it is dropped).
    """
    import re

    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return {k: float(v) for k, v in doc["queries"].items()}
    tail = doc.get("tail", "")
    pairs = re.findall(
        r'"([A-Za-z_][A-Za-z0-9_]*)":\s*([0-9]+(?:\.[0-9]+)?)', tail
    )
    skip = {"value", "sf", "queries_total", "queries_shown"}
    return {k: float(v) for k, v in pairs if k not in skip}


def bench_diff(
    before_path: str,
    after_path: str,
    min_ratio: float = 3.0,
    min_abs: float = 2.0,
) -> dict[str, list[BenchDelta]]:
    """Compare two bench artifacts.

    Returns ``{"regressions": [...], "improvements": [...], "new":
    [...]}`` — regressions ranked worst-first, improvements
    best-first, new queries slowest-first. A query missing from
    ``after`` is ignored (renames/removals are visible in git)."""
    before = load_bench(before_path)
    after = load_bench(after_path)
    regressions, improvements, new = [], [], []
    for name, t_after in after.items():
        t_before = before.get(name)
        if t_before is None:
            new.append(BenchDelta(name, None, t_after, None))
            continue
        if t_before <= 0:
            continue
        ratio = t_after / t_before
        if t_after >= min_abs and ratio >= min_ratio:
            regressions.append(BenchDelta(name, t_before, t_after, ratio))
        elif t_before >= min_abs and 1 / ratio >= min_ratio:
            improvements.append(BenchDelta(name, t_before, t_after, ratio))
    regressions.sort(key=lambda d: -(d.ratio or 0))
    improvements.sort(key=lambda d: d.ratio or 0)
    new.sort(key=lambda d: -d.after)
    return {
        "regressions": regressions,
        "improvements": improvements,
        "new": new,
    }


def latest_rounds(artifact_dir: str) -> tuple[str, str] | None:
    """The two most recent ``BENCH_r*.json`` files, (older, newer)."""
    import glob
    import re

    numbered = []
    for path in glob.glob(os.path.join(artifact_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            numbered.append((int(m.group(1)), path))
    if len(numbered) < 2:
        return None
    numbered.sort()
    return numbered[-2][1], numbered[-1][1]
