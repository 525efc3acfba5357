"""Rule-based classification cascade.

Re-expresses ``extract_fink_classification`` (external ``fink_filters``
package, invoked at ``bin/ztf/archive_index.py:100-116`` and
``bin/ztf/archive_statistics.py:67-84``): an ordered priority list of
boolean rules over ~13 columns producing a single label column. Built as
one chained ``when`` expression — pure JVM, no UDF, usable in both batch
and streaming plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def classification_cascade(
    rules: Sequence[tuple[Column, str]], default: str = "Unknown"
) -> Column:
    """First-match-wins label: ``rules`` is an ordered list of
    (boolean Column, label). Earlier rules take priority — exactly the
    reference's cascade semantics (solar-system object beats SN candidate
    beats ambiguous, etc.)."""
    chain = None
    for cond, label in rules:
        chain = F.when(cond, F.lit(label)) if chain is None else chain.when(
            cond, F.lit(label)
        )
    if chain is None:
        return F.lit(default)
    return chain.otherwise(F.lit(default))


def ztf_like_rules(prefix: str = "") -> list[tuple[Column, str]]:
    """A reference-faithful example cascade on the ZTF fixture schema
    (FIXTURES.md §2): SSO → known-variable → high-rb transient → ambiguous.

    Thresholds follow the reference's quality-cut values
    (``bin/ztf/raw2science.py:92-95``: ``rb >= 0.55``); the rule *shapes*
    mirror the published Fink classification logic (priority cascade over
    crossmatch + score columns).
    """
    c = lambda name: F.col(f"{prefix}{name}")  # noqa: E731
    return [
        (c("candidate.ssnamenr").isNotNull() & (c("candidate.ssnamenr") != "null"),
         "Solar System Object"),
        (c("candidate.nbad") > 0, "Artefact"),
        ((c("candidate.rb") >= 0.55) & (c("candidate.ndethist") <= 2),
         "Transient Candidate"),
        (c("candidate.rb") >= 0.55, "Variable Candidate"),
    ]
