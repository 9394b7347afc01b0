"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023). No reference analog (eland has no curation surface);
this is the published raw->target domain-selection method for
pretraining data, end to end in DataFrame ops.

Pipeline: hashed n-gram (unigram+bigram) bucket features -> two
bag-of-ngrams generative models (target corpus vs raw corpus, add-α
smoothed) -> per-document importance log-weight
``sum_b count_b * log(p_target(b) / p_raw(b))`` -> Gumbel top-k
resampling (without replacement, ∝ exp(weight)).

Scale shape, stage by stage, for 100 TB raw + small target:
- feature rows: one explode + one (doc, bucket) hash aggregation;
- corpus bucket counts: map-side-combinable agg -> at most
  ``n_buckets`` rows per corpus (model-sized, NOT data-sized);
- the log-ratio table is <= n_buckets rows -> broadcast to the
  scoring join, so scoring is one broadcast join + one per-doc agg;
- resampling is TakeOrdered on score+Gumbel (per-partition heaps,
  no global sort, nothing data-sized near the driver).

``portable=True`` buckets with md5 (instead of xxhash64) so a SQL
oracle replays features, models, scores, and the Gumbel draw
bit-for-bit — the differential-oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F

from .classifier import _bucket

__all__ = [
    "dsir_select",
    "hashed_ngram_rows",
    "dsir_bucket_logratio",
    "dsir_scores",
    "dsir_resample",
]


def _word_ngrams(text, max_n: int = 2):
    """unigrams + bigrams of the normalized tokens -> array<string>."""
    from .dedup import normalized_tokens

    toks = normalized_tokens(text)
    if max_n < 2:
        return toks
    n = F.size(toks)
    heads = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    bigrams = F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))
    return F.concat(toks, bigrams)


def hashed_ngram_rows(
    sdf: SparkDataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1 << 13,
    max_n: int = 2,
    portable: bool = False,
) -> SparkDataFrame:
    """(id, bucket, cnt) sparse hashed-ngram counts per document —
    one explode + one (doc, bucket) hash aggregation. Empty docs
    yield no rows (their importance weight is 0)."""
    grams = sdf.select(
        F.col(id_col).alias("id"),
        F.explode(_word_ngrams(F.col(text_col), max_n)).alias("__g__"),
    )
    return (
        grams.groupBy("id", _bucket(F.col("__g__"), n_buckets, portable).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_logratio(
    target_rows: SparkDataFrame,
    raw_rows: SparkDataFrame,
    n_buckets: int = 1 << 13,
    alpha: float = 1.0,
) -> SparkDataFrame:
    """Per-bucket ``log(p_target / p_raw)`` with add-α smoothing:
    p(b) = (count_b + α) / (total + α·B). Input: feature rows from
    :func:`hashed_ngram_rows`; output: <= ``n_buckets`` rows
    (bucket, logratio) — model-sized, broadcastable."""
    tc = target_rows.groupBy("bucket").agg(F.sum("cnt").alias("tcnt"))
    rc = raw_rows.groupBy("bucket").agg(F.sum("cnt").alias("rcnt"))
    joined = tc.join(rc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("tcnt", F.lit(0)).alias("tcnt"),
        F.coalesce("rcnt", F.lit(0)).alias("rcnt"),
    )
    # totals are two scalars; crossJoin of a 1-row aggregate is the
    # broadcast-literal pattern (no data-sized shuffle)
    totals = joined.agg(
        F.sum("tcnt").alias("ttot"), F.sum("rcnt").alias("rtot")
    )
    b = float(n_buckets)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tcnt") + alpha) / (F.col("ttot") + alpha * b))
            - F.log((F.col("rcnt") + alpha) / (F.col("rtot") + alpha * b))
        ).alias("logratio"),
    )


def dsir_scores(
    feature_rows: SparkDataFrame,
    logratio: SparkDataFrame,
) -> SparkDataFrame:
    """Per-document importance log-weight: sum of cnt·logratio over
    the doc's buckets. One broadcast join + one per-doc hash agg."""
    return (
        feature_rows.join(F.broadcast(logratio), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("logratio")).alias("log_weight"))
    )


def dsir_resample(
    scored: SparkDataFrame,
    n: int,
    seed: int = 42,
    score_col: str = "log_weight",
    id_col: str = "id",
) -> SparkDataFrame:
    """Gumbel top-k: sampling n docs WITHOUT replacement with
    probability ∝ exp(score) is exactly taking the top n of
    ``score + Gumbel(0,1)`` (Vieira 2014). The Gumbel draw is
    hash-derived from md5(id, seed) — deterministic across runs,
    partitionings, and engines. TakeOrdered; no global sort."""
    if n <= 0:
        raise ValueError("n must be positive")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    u = F.greatest(h.cast("double") / F.lit(float(2**52)), F.lit(1e-15))
    gumbel = -F.log(-F.log(u))
    tmp = "__gkey__"
    return (
        scored.withColumn(tmp, F.col(score_col) + gumbel)
        .orderBy(F.col(tmp).desc(), F.col(id_col).asc())
        .limit(n)
        .drop(tmp)
    )


def dsir_select(
    target_sdf: SparkDataFrame,
    raw_sdf: SparkDataFrame,
    text_col: str,
    id_col: str,
    n: int,
    n_buckets: int = 1 << 13,
    alpha: float = 1.0,
    seed: int = 42,
    max_n: int = 2,
    portable: bool = False,
) -> SparkDataFrame:
    """The full DSIR pipeline with the raw-corpus feature rows
    materialized ONCE (localCheckpoint, the classifier-training
    pattern): at 100 TB the raw corpus is the expensive scan, and it
    feeds both the raw bucket model and the per-doc scoring — without
    materialization Catalyst evaluates that explode+agg subtree twice.
    Returns the selected ``(id, log_weight)`` rows."""
    tf = hashed_ngram_rows(target_sdf, text_col, id_col,
                           n_buckets=n_buckets, max_n=max_n, portable=portable)
    rf = hashed_ngram_rows(raw_sdf, text_col, id_col,
                           n_buckets=n_buckets, max_n=max_n, portable=portable
                           ).localCheckpoint(eager=False)
    lr = dsir_bucket_logratio(tf, rf, n_buckets=n_buckets, alpha=alpha)
    return dsir_resample(dsir_scores(rf, lr), n, seed=seed, id_col="id")
