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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["auc", "confusion_at"]


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
