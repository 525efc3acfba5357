"""Side-channel post-collect callbacks: bounded driver-side egress.

Re-expresses the reference's notify-after-archive pattern
(``bin/ztf/archive_hostless.py:129-188``,
``bin/ztf/archive_slsn_candidates.py:253-278``): a heavily filtered
candidate set is pulled to the driver (``toPandas``), formatted row by
row, and dispatched to one or more messaging channels (Slack/Telegram
in the reference), each gated on its own token env var, with a fallback
"nothing found" message and the new candidate ids persisted to a per-
night CSV.

Spark-first discipline: ALL filtering/ranking happens in the engine;
the collect is clamped by an explicit LIMIT pushed into the plan
(TakeOrderedAndProject when sorted), so driver egress is bounded no
matter how large the night is. Transports are injected callables, so
the dispatch logic is unit-testable without any network or token.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame


@dataclass
class Channel:
    """One outbound channel.

    ``token_env`` gates dispatch exactly like the reference's
    ``FINK_TG_TOKEN`` / ``*_SLACK_TOKEN`` checks: unset or empty → the
    channel is skipped (recorded in the summary, never an error).
    ``send(messages, init_msg)`` is the transport — Slack webhook,
    Telegram bot, stdout, a test recorder.
    """

    name: str
    send: Callable[[list[str], str], None]
    token_env: str | None = None

    def enabled(self) -> bool:
        if self.token_env is None:
            return True
        return bool(os.environ.get(self.token_env))


def collect_bounded(
    df: DataFrame,
    max_rows: int,
    order_by: list[Column] | None = None,
) -> pd.DataFrame:
    """``toPandas`` with the bound IN the plan.

    With ``order_by`` the limit compiles to TakeOrderedAndProject (a
    per-partition top-k + single merge — no global sort); without, a
    plain LIMIT short-circuits the scan. Either way the driver never
    holds more than ``max_rows``.
    """
    if order_by is not None:
        df = df.orderBy(*order_by)
    return df.limit(max_rows).toPandas()


def post_collect_notify(
    candidates: DataFrame,
    format_row: Callable[[pd.Series], str],
    channels: list[Channel],
    init_msg: str = "{n} candidates found",
    empty_msg: str = "No candidates found",
    max_rows: int = 1000,
    order_by: list[Column] | None = None,
    id_col: str | None = None,
    ids_csv: str | None = None,
) -> dict:
    """Collect a bounded candidate set and fan it out to channels.

    Returns a summary dict: rows collected, per-channel dispatch status,
    and the ids file written (if any). Mirrors the reference flow: empty
    result → ``empty_msg`` alone; otherwise one formatted message per
    row behind ``init_msg`` (``{n}`` interpolated); candidate ids saved
    to ``ids_csv`` for cross-night dedup (``read_past_ids`` pattern).
    """
    pdf = collect_bounded(candidates, max_rows, order_by)
    messages = [format_row(row) for _, row in pdf.iterrows()]
    header = (
        init_msg.format(n=len(messages)) if len(messages) else empty_msg
    )
    dispatched: dict[str, str] = {}
    for ch in channels:
        if not ch.enabled():
            dispatched[ch.name] = "skipped_no_token"
            continue
        ch.send(messages, header)
        dispatched[ch.name] = "sent"
    ids_path = None
    if ids_csv and id_col and len(pdf):
        os.makedirs(os.path.dirname(ids_csv) or ".", exist_ok=True)
        pdf[[id_col]].to_csv(ids_csv, index=False)
        ids_path = ids_csv
    return {
        "n_candidates": len(pdf),
        "channels": dispatched,
        "ids_csv": ids_path,
    }
