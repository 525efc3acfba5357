"""Graph operators over relational edge sets.

Triangle counting via compact-forward wedge closure (Schank & Wagner
2005; the standard distributed formulation, e.g. Suri & Vassilvitskii
2011 "Counting Triangles and the Curse of the Last Reducer"): orient
every edge low→high so each triangle is enumerated exactly once and
wedge fan-out is bounded by forward out-degree.

Three physical regimes:

- **broadcast** — the oriented edge set ships to every task for both
  the wedge join and the closure semi-join. Right while the
  support-cut edge set is small; breaks when the graph densifies
  (its own 10× probe grows ~6×).
- **merge** — both joins run as shuffled sort-merge on their keys
  (wedge on ``e1.v = e2.u``; closure on ``(a, c)``): no single-task
  memory ceiling, the 100 TB path.
- **auto** (default) — NO hints: AQE re-plans at runtime from the TRUE
  post-shuffle sizes, converting sort-merge to broadcast when the
  built edge relation is under the broadcast threshold. A static
  Catalyst-stats gate is WRONG here — the pre-execution estimate for
  an aggregated self-join relation is join-product-derived and wildly
  pessimistic (353 MB for a few-KB edge set at sf0.001), so it would
  never pick broadcast; only the runtime sizes know the truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(
    li: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """Oriented (u < v) co-occurrence edges with a support cut.

    The self-join fans out per order as |order|²/2 — bounded by basket
    size, not table size; the support HAVING-cut then bounds the edge
    set that the closure joins consume.
    """
    base = li.select(order_col, item_col)
    return (
        base.alias("a")
        .join(base.alias("b"), on=order_col)
        .filter(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .select(
            F.col(f"a.{item_col}").alias("u"),
            F.col(f"b.{item_col}").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .select("u", "v")
    )


def triangle_closure(edges: DataFrame, regime: str = "auto") -> DataFrame:
    """All triangles (a < b < c) of an oriented ``(u, v)`` edge set.

    ``regime``: ``"auto"`` (no hints — AQE picks broadcast vs
    sort-merge from runtime shuffle sizes; the production default) |
    ``"broadcast"`` | ``"merge"`` (forced, for plan tests and for
    pinning the no-memory-ceiling path). All regimes produce identical
    rows — only the physical join strategy differs (plan-asserted in
    tests).
    """
    if regime not in ("auto", "broadcast", "merge"):
        raise ValueError(f"unknown regime {regime!r}")
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    ac = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    if regime == "broadcast":
        e2 = F.broadcast(e2)
        ac = F.broadcast(ac)
    elif regime == "merge":
        e2 = e2.hint("shuffle_merge")
        ac = ac.hint("shuffle_merge")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("a"),
        F.col("e1.v").alias("b"),
        F.col("e2.v").alias("c"),
    )
    # the key-list join puts join keys first (a, c, b) — pin the order
    return wedges.join(ac, on=["a", "c"], how="left_semi").select(
        "a", "b", "c"
    )


def triangle_counts(edges: DataFrame, regime: str = "auto") -> DataFrame:
    """Per-anchor triangle counts plus the NULL-anchor grand total.

    The rollup gives both groupings in ONE aggregation — a union of two
    groupBys would re-execute the whole wedge/closure pipeline twice
    (anchor ids are never null, so the NULL row is unambiguous).
    """
    closed = triangle_closure(edges, regime)
    return closed.rollup("a").agg(F.count(F.lit(1)).alias("n_triangles"))
