"""Graph operators for corpus curation: PageRank and degree stats.

No reference analog (eland has no graph layer); PageRank (Page et al.
1999, "The PageRank citation ranking") is the canonical web-crawl
quality prior — CommonCrawl-derived corpora routinely carry a
host-graph centrality signal next to the text-quality gates in
``operators/text.py``. Connected components (the other graph primitive
a dedup pipeline needs) already lives in ``operators/dedup.py``
(large-star/small-star contraction).

Scale shape: a fixed-K power iteration is K rounds of
(ranks join edges on src) -> (sum contributions by dst). The rank
frame is node-sized, the edge frame is edge-sized; edges are hashed by
``src`` once and the partitioning is reused every round (one
``repartition`` up front, no per-round edge shuffle), while the
node-sized rank updates are the only thing that moves. Dangling mass
is folded back uniformly via a single scalar aggregate per round —
never a driver collect of node data. Each round lazily checkpoints the
node-sized rank frame: the round's two consumers (contribution join +
dangling scalar) share one computation instead of re-executing the
prior lineage per branch, and lineage depth stays O(1) for any K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degrees", "pagerank"]


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree in one pass: explode each edge into two
    (node, role) rows, then a single hash aggregation."""
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("node"), F.lit(1).alias("is_out")),
                F.struct(F.col(dst).alias("node"), F.lit(0).alias("is_out")),
            )
        ).alias("r")
    ).select("r.node", "r.is_out")
    return both.groupBy("node").agg(
        F.sum(F.col("is_out")).cast("bigint").alias("out_degree"),
        F.sum(1 - F.col("is_out")).cast("bigint").alias("in_degree"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    dangling: str = "redistribute",
) -> DataFrame:
    """Fixed-K unweighted PageRank power iteration.

    ``rank_v = (1-d)/N + d * (sum_{u->v} rank_u / outdeg_u + D/N)``
    where ``D`` is the total rank mass sitting on dangling nodes
    (out-degree 0) — redistributed uniformly per the original
    formulation, or dropped with ``dangling="ignore"`` (the textbook
    simplification; documents which one an oracle must replay).

    Returns ``(node, rank)`` with ranks summing to ~1. Multi-edges
    count once (edges are distinct-ed); self-loops participate like
    any edge.

    Plan shape: edges are deduplicated and hash-partitioned by ``src``
    once up front; each round joins the node-sized rank frame against
    that fixed partitioning and reduces contributions by ``dst`` —
    so per-round shuffle volume is O(nodes + contributions), never a
    re-shuffle of the raw edge table, and the dangling term is one
    scalar aggregate folded in as a literal-free broadcast (no driver
    value, no collect). Rank lineage truncates every round (see module
    docstring), so K can grow without plan-depth or recompute blowup.
    """
    if dangling not in ("redistribute", "ignore"):
        raise ValueError(f"dangling must be redistribute|ignore, got {dangling!r}")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    e = edges.select(F.col(src).alias("__src__"), F.col(dst).alias("__dst__")).distinct()
    # reuse one src-hashed partitioning across all K rounds; the
    # localCheckpoint barrier makes the dedup+repartition subtree
    # compute ONCE instead of being re-inlined into every round's join
    # (at a real deployment this is a persisted/bucketed edge table)
    e = e.repartition("__src__").localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("__src__").alias("node"))
        .unionByName(e.select(F.col("__dst__").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("__src__").alias("node")).agg(
        F.count(F.lit(1)).alias("__outdeg__")
    )
    # node-sized; computed once, reused every round
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce(F.col("__outdeg__"), F.lit(0)).alias("__outdeg__")
    )
    n_nodes = base.select(
        F.count(F.lit(1)).cast("double").alias("__n__")
    )

    ranks = base.crossJoin(F.broadcast(n_nodes)).select(
        "node", "__outdeg__", (F.lit(1.0) / F.col("__n__")).alias("rank"),
        "__n__",
    )

    d = float(damping)
    for i in range(int(iterations)):
        # ranks branches twice per round (contribution join + dangling
        # scalar); without a barrier the previous round's subtree would
        # re-execute per branch — 2^K blowup. One lazy checkpoint per
        # round keeps it linear (the Pregel/GraphX iteration pattern)
        # and doubles as the lineage truncation for large K.
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            ranks.where(F.col("__outdeg__") > 0)
            .join(e, ranks["node"] == e["__src__"])
            .select(
                F.col("__dst__").alias("node"),
                (F.col("rank") / F.col("__outdeg__")).alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__in__"))
        )
        if dangling == "redistribute":
            dang = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("__outdeg__") == 0, F.col("rank"))),
                    F.lit(0.0),
                ).alias("__dang__")
            )
            joined = ranks.join(contrib, "node", "left").crossJoin(
                F.broadcast(dang)
            )
        else:
            # no dangling term: skip the per-round scalar aggregate and
            # its broadcast entirely (one fewer job per round)
            joined = ranks.join(contrib, "node", "left").withColumn(
                "__dang__", F.lit(0.0)
            )
        ranks = (
            joined
            .select(
                "node", "__outdeg__", "__n__",
                (
                    (F.lit(1.0) - F.lit(d)) / F.col("__n__")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__in__"), F.lit(0.0))
                        + F.col("__dang__") / F.col("__n__")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")
