"""Hybrid-search rank fusion.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) is how
Elasticsearch 8.8+ combines lexical and vector retrieval — the
``rank: {rrf: ...}`` section fusing a ``query`` (BM25) leg with one or
more ``knn`` legs. The reference eland exposes neither leg's scores;
this module completes the repo's hybrid story on top of its own
``text.bm25_topk`` and ``similarity.cosine_topk``.

``score(d) = sum over lists of 1 / (rank_k + rank_list(d))`` with
1-based ranks and absent documents contributing nothing. Inputs are
per-query TOP-K lists — bounded by construction (tens to hundreds of
rows, never corpus-sized) — so fusion cost is trivial at any corpus
scale; the expensive part stays in the legs, which carry their own
plan contracts. Ranks are computed with the windowless range-sort
operator (``ranking.with_global_rank``) so even this bounded step
never plans the single-partition global-window exchange the repo's
lint forbids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 10,
    rank_k: int = 60,
    id_col: str = "id",
) -> DataFrame:
    """Fuse top-k result lists by Reciprocal Rank Fusion.

    Each input frame carries ``id_col`` plus exactly one score column
    (any name); ranks are 1-based by (score desc, id asc) within each
    list — computed on the list's OWN scores, so pre-rounded scores
    rank identically on any engine. Returns (id, rrf double rounded
    6dp, n_lists long) top-``k``, ties broken on id.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    from .ranking import with_global_rank

    parts = []
    for r in rankings:
        extra = [c for c in r.columns if c != id_col]
        if len(extra) != 1:
            raise ValueError(
                f"rrf_fuse: each ranking needs id + ONE score column, "
                f"got {r.columns}"
            )
        ranked = with_global_rank(
            r.select(F.col(id_col).alias("id"), F.col(extra[0]).alias("__s__")),
            order_by=[F.col("__s__") * -1, F.col("id")],
            rank_col="__r__",
        )
        parts.append(
            ranked.select(
                "id", (F.lit(1.0) / (F.lit(rank_k) + F.col("__r__"))).alias("__c__")
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    return (
        fused.groupBy("id")
        .agg(
            F.round(F.sum("__c__"), 6).alias("rrf"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(k)
    )
