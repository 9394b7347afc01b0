"""Binary-classifier evaluation: exact AUC and threshold metrics.

No reference analog; these close the loop on the quality-classifier
gates in ``operators/classifier.py``/``operators/text.py`` — before a
trained gate filters a 100 TB corpus, its ranking power (AUC) and the
precision/recall at the chosen threshold get measured on a labeled
holdout.

AUC computes exactly via the Mann-Whitney rank-sum identity
``AUC = (R_pos - P(P+1)/2) / (P*N)`` with midrank tie correction —
never a sampled approximation and never a single-partition sort:
scores reduce to a distinct-score frame (one hash aggregation), the
cumulative position runs through the windowless bucket prefix-sum
plan (operators/ranking), and the rank-sum is one scalar aggregate.
The confusion matrix is a single full-scan aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "auc",
    "confusion_at",
    "ranking_metrics",
    "calibration_bins",
    "cohens_kappa",
]


def auc(sdf: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC as a 1-row frame ``(auc, n_pos, n_neg)``.

    ``label_col`` must be 0/1 (or boolean); null scores/labels are
    dropped. Ties receive midranks (the standard Mann-Whitney
    correction), so AUC == probability a random positive outranks a
    random negative with ties counting half. Degenerate inputs (no
    positives or no negatives) yield a null AUC.
    """
    from .ranking import with_global_cumsum

    base = sdf.select(
        F.col(score_col).cast("double").alias("__s__"),
        F.col(label_col).cast("int").alias("__y__"),
    ).where(F.col("__s__").isNotNull() & F.col("__y__").isNotNull())
    per_score = base.groupBy("__s__").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__y__").alias("__np__"),
    )
    cum = with_global_cumsum(per_score, ["__s__"], "__n__", out_col="__cum__")
    # midrank of every row tied at this score: rows before + (n+1)/2
    midrank = (F.col("__cum__") - F.col("__n__")) + (F.col("__n__") + 1) / 2.0
    agg = cum.agg(
        F.sum(F.col("__np__") * midrank).alias("__rpos__"),
        F.sum("__np__").alias("__p__"),
        F.sum(F.col("__n__") - F.col("__np__")).alias("__nn__"),
    )
    p, n = F.col("__p__").cast("double"), F.col("__nn__").cast("double")
    return agg.select(
        F.round(
            F.when(
                (p > 0) & (n > 0),
                (F.col("__rpos__") - p * (p + 1) / 2.0) / (p * n),
            ),
            6,
        ).alias("auc"),
        F.col("__p__").cast("bigint").alias("n_pos"),
        F.col("__nn__").cast("bigint").alias("n_neg"),
    )


def ranking_metrics(
    sdf: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval quality at cutoff ``k`` from a rankings
    frame ``(query, rank, relevance)``: ``(query_col, ndcg, mrr,
    precision_k, recall_k, n_rel)`` — the offline scorecard for the
    BM25 / ANN / MaxSim retrieval operators in this package.

    ``rank_col`` is the system's 1-based rank; ``rel_col`` is a graded
    relevance (0 = irrelevant; gains are the standard ``2^rel - 1``,
    so binary 0/1 labels degrade to plain DCG). nDCG divides by the
    ideal DCG of the query's OWN judged items (0 when the query has no
    relevant items); MRR is the reciprocal rank of the first relevant
    item at or above ``k`` (0 when none); precision@k divides by ``k``,
    recall@k by the query's total relevant count. Null ranks /
    relevances are dropped.

    Scale shape: ONE window keyed by query (ideal-rank assignment) and
    one groupBy on the same key — the aggregation reuses the window's
    hash partitioning, so the whole scorecard costs a single shuffle
    of the judged rows (a per-query-bounded frame, not the corpus).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = sdf.select(
        F.col(query_col).alias("__q__"),
        F.col(rank_col).cast("bigint").alias("__r__"),
        F.col(rel_col).cast("double").alias("__rel__"),
    ).where(F.col("__r__").isNotNull() & F.col("__rel__").isNotNull())
    iw = Window.partitionBy("__q__").orderBy(
        F.col("__rel__").desc(), F.col("__r__").asc()
    )
    ideal = base.withColumn("__ir__", F.row_number().over(iw))
    gain = F.pow(F.lit(2.0), F.col("__rel__")) - 1.0
    in_k = F.col("__r__") <= k
    rel_pos = F.col("__rel__") > 0
    agg = ideal.groupBy("__q__").agg(
        F.sum(
            F.when(in_k, gain / F.log2(F.col("__r__") + 1)).otherwise(0.0)
        ).alias("__dcg__"),
        F.sum(
            F.when(
                (F.col("__ir__") <= k) & rel_pos,
                gain / F.log2(F.col("__ir__") + 1),
            ).otherwise(0.0)
        ).alias("__idcg__"),
        F.min(F.when(in_k & rel_pos, F.col("__r__"))).alias("__first__"),
        F.sum(F.when(in_k & rel_pos, 1).otherwise(0)).alias("__relk__"),
        F.sum(rel_pos.cast("int")).alias("__nrel__"),
    )
    return agg.select(
        F.col("__q__").alias(query_col),
        F.round(
            F.when(
                F.col("__idcg__") > 0, F.col("__dcg__") / F.col("__idcg__")
            ).otherwise(0.0),
            6,
        ).alias("ndcg"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__first__"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(F.col("__relk__") / F.lit(float(k)), 6).alias("precision_k"),
        F.round(
            F.when(
                F.col("__nrel__") > 0,
                F.col("__relk__") / F.col("__nrel__").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("recall_k"),
        F.col("__nrel__").cast("bigint").alias("n_rel"),
    )


def calibration_bins(
    sdf: DataFrame, score_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Reliability table for a probabilistic classifier: scores in
    [0, 1] bucket into ``bins`` equal-width bins and each bin reports
    ``(bin, n, confidence, accuracy, gap, weight, ece_term)`` —
    ``sum(ece_term)`` is the Expected Calibration Error (Naeini 2015).
    A well-calibrated gate has accuracy ~= confidence per bin; a
    miscalibrated one silently over/under-filters at its threshold.

    ``bin`` is ``floor(score * bins)`` with score 1.0 folded into the
    top bin; scores outside [0, 1] or null score/label rows are
    dropped. Scale shape: ONE full-scan hash aggregation to
    bin-cardinality rows; the total for the weights is a 1-row
    broadcast scalar join.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    base = sdf.select(
        F.col(score_col).cast("double").alias("__s__"),
        F.col(label_col).cast("int").alias("__y__"),
    ).where(
        F.col("__s__").between(0.0, 1.0) & F.col("__y__").isNotNull()
    )
    b = F.least(
        F.floor(F.col("__s__") * bins).cast("int"), F.lit(bins - 1)
    )
    per = (
        base.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s__").alias("__conf__"),
            F.avg(F.col("__y__").cast("double")).alias("__acc__"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per.agg(F.sum("n").alias("__N__"))
    j = per.crossJoin(F.broadcast(tot))
    gap = F.abs(F.col("__acc__") - F.col("__conf__"))
    weight = F.col("n").cast("double") / F.col("__N__")
    return j.select(
        "bin",
        "n",
        F.round("__conf__", 6).alias("confidence"),
        F.round("__acc__", 6).alias("accuracy"),
        F.round(gap, 6).alias("gap"),
        F.round(weight, 6).alias("weight"),
        F.round(weight * gap, 6).alias("ece_term"),
    )


def cohens_kappa(sdf: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two categorical label columns as a 1-row
    frame ``(kappa, po, pe, n)`` — the chance-corrected agreement
    score for double-annotated data (two labelers, or a model vs a
    gold set) before the labels gate a corpus.

    ``po`` is observed agreement, ``pe`` the expected agreement of the
    two marginal distributions; ``kappa = (po - pe) / (1 - pe)``, null
    when ``pe == 1`` (both raters constant — agreement is undefined).
    Rows with a null on either side are dropped.

    Scale shape: ONE full-scan hash aggregation to the observed
    contingency cells (class^2-sized), lazily checkpointed so the raw
    table streams through exactly once — n/po and both marginals are
    cell-sized re-aggs of it, the pe numerator a class-sized join, the
    assembly a 1-row scalar join. Nothing row-sized collects.
    """
    base = sdf.select(
        F.col(col_a).cast("string").alias("__a__"),
        F.col(col_b).cast("string").alias("__b__"),
    ).where(F.col("__a__").isNotNull() & F.col("__b__").isNotNull())
    cont = (
        base.groupBy("__a__", "__b__")
        .agg(F.count(F.lit(1)).alias("__o__"))
        .localCheckpoint(eager=False)
    )
    obs = cont.agg(
        F.sum("__o__").alias("__n__"),
        (
            F.sum(
                F.when(F.col("__a__") == F.col("__b__"), F.col("__o__"))
                .otherwise(F.lit(0))
                .cast("double")
            )
            / F.sum("__o__")
        ).alias("__po__"),
    )
    pa = cont.groupBy("__a__").agg(F.sum("__o__").alias("__ca__"))
    pb = cont.groupBy("__b__").agg(F.sum("__o__").alias("__cb__"))
    pe_num = pa.join(
        F.broadcast(pb), pa["__a__"] == pb["__b__"], "inner"
    ).agg(
        F.coalesce(
            F.sum(F.col("__ca__").cast("double") * F.col("__cb__")),
            F.lit(0.0),
        ).alias("__pe_num__")
    )
    j = obs.crossJoin(F.broadcast(pe_num))
    n = F.col("__n__").cast("double")
    pe = F.col("__pe_num__") / (n * n)
    return j.select(
        F.round(
            F.when(pe < 1.0, (F.col("__po__") - pe) / (1.0 - pe)), 6
        ).alias("kappa"),
        F.round("__po__", 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.col("__n__").cast("bigint").alias("n"),
    )


def confusion_at(
    sdf: DataFrame, score_col: str, label_col: str, threshold: float = 0.5
) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at ``score >= threshold``
    as a 1-row frame — ONE full-scan aggregation, mergeable partials.
    Null scores/labels are dropped; zero denominators yield null
    metrics rather than division errors."""
    base = sdf.select(
        F.col(score_col).cast("double").alias("__s__"),
        F.col(label_col).cast("int").alias("__y__"),
    ).where(F.col("__s__").isNotNull() & F.col("__y__").isNotNull())
    pred = (F.col("__s__") >= F.lit(float(threshold))).cast("int")
    y = F.col("__y__")
    agg = base.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
        F.sum((1 - pred) * y).alias("fn"),
    )
    tp, fp, fn = [F.col(c).cast("double") for c in ("tp", "fp", "fn")]
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    return agg.select(
        "tp", "fp", "tn", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
