"""Driver-sampling rotation ledger.

The correctness driver samples the FIRST ~50 entries of
``__spark_entry__.queries()`` each round, so dict order decides which
queries earn a hard CORRECTNESS row.  Rounds 1-3 managed that order by
hand and it went stale twice.  This module derives the order from the
recorded ``CORRECTNESS_r*.json`` artifacts themselves, so the list can
never go stale again:

1. queries whose most recent driver row FAILED (hash mismatch, or a
   harness error other than the documented ``no_oracle``) come first —
   a fix needs re-verification before anything else;
2. then queries NEVER driver-checked in any recorded round, ordered
   by FIRST-REGISTRATION ROUND (oldest backlog first — the round-7
   verdict caught 16 brand-new queries jumping a 2-round-old backlog
   because this tier used to sort by dict position, which the
   builder's literal-insert order controls, not age).  The
   registration round per query persists in ``registry_rounds.json``
   next to this module; names missing from that ledger sort LAST
   within the tier, so an unsynced new query can never jump the queue;
3. then previously-green queries, oldest round first (stalest green
   gets refreshed before a twice-confirmed one).

A ``no_oracle`` row with a non-null ``spark_rows`` counts as checked:
it is the strongest signal a rows-only query can ever earn, and
re-sampling it adds nothing.  Ties inside each tier keep registration
order, which is deterministic (dict insertion order).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Iterable, Mapping

#: Persistent name -> first-registration-round ledger.  Seeded at
#: round 8 from the first CORRECTNESS_r*.json appearance per name
#: (never-sampled round-7 survivors seeded as round 7); every later
#: round appends its new registry names via ``sync_add_rounds``.
LEDGER_FILE = os.path.join(os.path.dirname(__file__), "registry_rounds.json")

#: Sort key for tier-1 names absent from the ledger: strictly after
#: every ledgered round, so an unsynced addition cannot jump the queue.
UNSYNCED_ROUND = 10**9


def load_add_rounds(path: str = LEDGER_FILE) -> dict[str, int]:
    """Read the name -> first-registration-round ledger ({} if absent)."""
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return {}
    return {str(k): int(v) for k, v in data.items()} if isinstance(data, dict) else {}


def sync_add_rounds(
    names: Iterable[str], current_round: int, path: str = LEDGER_FILE
) -> dict[str, int]:
    """Append any *names* missing from the ledger with *current_round*.

    Existing entries are never modified (first registration wins).
    Returns the merged ledger after writing it back sorted by name."""
    ledger = load_add_rounds(path)
    for n in names:
        ledger.setdefault(n, current_round)
    with open(path, "w") as fh:
        json.dump(dict(sorted(ledger.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    return ledger


def read_ledger(artifact_dir: str) -> tuple[dict[str, int], set[str]]:
    """Scan ``CORRECTNESS_r*.json`` under *artifact_dir*.

    Returns ``(last_green, failed)`` where ``last_green`` maps query
    name -> most recent round with a passing (or rows-only-attested)
    row, and ``failed`` is the set whose MOST RECENT row was a failure
    (later green rows clear earlier failures).
    """
    last_green: dict[str, int] = {}
    failed: dict[str, int] = {}
    # sort by PARSED round number: lexicographic filename order breaks
    # for unpadded names (r10 < r4) and at round 100 even when padded,
    # and a stale green processed after a newer failure would wrongly
    # clear the failure tier
    numbered = []
    for path in glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            numbered.append((int(m.group(1)), path))
    for rnd, path in sorted(numbered):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, Mapping):
            continue
        for name, row in rows.items():
            if not isinstance(row, Mapping):
                continue
            err = row.get("err")
            if err is None:
                ok = bool(row.get("hash_match")) or (
                    # oracle-less rows recorded without the sentinel:
                    # rows-only check ran and produced a count
                    row.get("hash_match") is None
                    and row.get("spark_rows") is not None
                )
            elif err == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = False
            if ok:
                if last_green.get(name, -1) < rnd:
                    last_green[name] = rnd
                if failed.get(name, -1) <= rnd:
                    failed.pop(name, None)
            else:
                if last_green.get(name, -1) <= rnd:
                    failed[name] = max(failed.get(name, -1), rnd)
    return last_green, set(failed)


def driver_priority(
    names: Iterable[str],
    artifact_dir: str,
    pinned: Iterable[str] = (),
    add_rounds: Mapping[str, int] | None = None,
) -> list[str]:
    """Order *names* for driver sampling: pinned probes, then failed,
    never-checked (oldest first-registration round first), and
    stalest-green.  Registration order breaks ties.

    ``pinned`` names (the admin/probes.py fingerprint tier) always lead:
    their row counts ARE the driver-environment telemetry, so they must
    land inside the ~50-row sample window every round regardless of the
    failure backlog.

    ``add_rounds`` maps name -> first-registration round for the
    never-checked tier (default: the persistent ``LEDGER_FILE``).
    Names absent from the map sort after all present ones."""
    names = list(names)
    order = {n: i for i, n in enumerate(names)}
    pinned_set = set(pinned)
    last_green, failed = read_ledger(artifact_dir)
    if add_rounds is None:
        add_rounds = load_add_rounds()

    def key(n: str) -> tuple[int, int, int]:
        if n in pinned_set:
            # registration order ONLY: probes are designed to go red
            # (that is the telemetry) — ledger state must never
            # reshuffle the pinned tier
            return (-1, 0, order[n])
        if n in failed:
            tier = 0
        elif n not in last_green:
            # oldest backlog first: a brand-new query must wait behind
            # every never-sampled survivor from earlier rounds
            return (1, add_rounds.get(n, UNSYNCED_ROUND), order[n])
        else:
            tier = 2
        return (tier, last_green.get(n, 0), order[n])

    return sorted(names, key=key)
