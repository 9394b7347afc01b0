"""Bigram language model: distributed training + perplexity scoring.

The CCNet-style LM quality filter one step up from the unigram
``operators/text.unigram_logppl``: train an interpolated bigram model
on a reference corpus, score candidate documents by mean negative
log-probability — low perplexity ≈ fluent, high ≈ boilerplate/garbled.
(CCNet uses a 5-gram KenLM; an interpolated bigram is the same filter
shape with an exactly-replayable arithmetic contract.)

Determinism contract (mirrors ``operators/unigram.py``): the per-token
probability is ONE fixed float expression over integer counts —
``lam * (c(vw) / c(v)) + (1 - lam) * (c(w) / T)`` with an OOV floor —
written identically in the SQL oracle so both engines execute the same
IEEE sequence; its negative log is immediately quantized to an INTEGER
nano-log cost ``round(-ln(p) * 1e9)``, so per-document totals are
exact integer sums (no float accumulation order), and only the final
``total / n / 1e9`` is rounded to 6dp.

Scale shape: training is ONE hash aggregation over exploded token
pairs (map-side combinable, gram-keyed — no skew pole beyond the
natural Zipf head, which combiners absorb); the unigram and context
count tables are both vocab-sized re-aggregations of the bigram table
(c(w) = sum_v c(v,w) exactly — bos only ever appears as context), so
the training corpus is tokenized once. Scoring explodes candidate bigrams once and takes
THREE left hash joins against the count tables (kept distributed —
bigram vocabularies are corpus-sized, never broadcast by assumption)
plus one per-document aggregation. No windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_lm_counts", "bigram_logppl", "BOS"]

BOS = "<s>"
NANO = 1_000_000_000.0


def _doc_bigrams(sdf: DataFrame, text: Column, normalized: bool, bos: str):
    """One row per token occurrence: (__v__ context, __w__ token),
    with ``bos`` as the first token's context. Pure array expressions
    — prepend bos to the shifted token array and zip."""
    from .dedup import normalized_tokens
    from .text import tokens as raw_tokens

    toks = normalized_tokens(text) if normalized else raw_tokens(text)
    prev = F.concat(
        F.array(F.lit(bos)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    pairs = F.arrays_zip(prev.alias("v"), toks.alias("w"))
    return (
        sdf.select(F.explode(pairs).alias("p"))
        .select(F.col("p.v").alias("__v__"), F.col("p.w").alias("__w__"))
        .where(F.col("__w__").isNotNull())
    )


def bigram_lm_counts(
    sdf: DataFrame,
    text: Column,
    normalized: bool = True,
    bos: str = BOS,
) -> "tuple[DataFrame, DataFrame]":
    """Train the count model: returns ``(unigrams, bigrams)`` —
    ``unigrams``: (token, n) over real tokens (no bos; its total is the
    denominator T), ``bigrams``: (v, w, n) with bos contexts included.
    Context counts c(v) are derived from the bigram table at scoring
    time (``sum_w c(v, w)``), keeping the two tables consistent by
    construction."""
    rows = _doc_bigrams(sdf, text, normalized, bos)
    bigrams = rows.groupBy(
        F.col("__v__").alias("v"), F.col("__w__").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    # c(w) = sum_v c(v, w) EXACTLY — every token occurrence is one
    # pair's w (bos only ever appears as v), so the unigram table is a
    # vocab-sized re-aggregation of the bigram table: the training
    # corpus is tokenized+exploded ONCE, not once per count table
    unigrams = bigrams.groupBy(F.col("w").alias("token")).agg(
        F.sum("n").alias("n")
    )
    return unigrams, bigrams


def bigram_logppl(
    sdf: DataFrame,
    text: Column,
    id_alias: Column,
    unigrams: DataFrame,
    bigrams: DataFrame,
    lam: float = 0.7,
    floor_count: float = 0.5,
    normalized: bool = True,
    bos: str = BOS,
) -> DataFrame:
    """Score documents under the interpolated bigram model: returns
    (id, n_tokens, logppl) where ``logppl`` = mean over tokens of
    ``-ln(lam * c(vw)/c(v) + (1-lam) * max(c(w), floor)/T)`` rounded
    to 6dp (null for empty documents). An unseen context contributes 0
    to the bigram term; an unseen token falls to the ``floor_count``
    unigram floor, so probabilities stay positive for any input.

    Exactness: the per-token cost is an integer nano-log (see module
    docstring), so the document total is an exact integer sum — safe
    for cross-engine hash comparison."""
    if not 0.0 <= lam < 1.0:
        raise ValueError(
            "lam must be in [0, 1) — at lam == 1.0 an unseen context "
            "yields p == 0 and the log-cost is undefined"
        )
    if floor_count <= 0.0:
        raise ValueError("floor_count must be > 0")
    from .dedup import normalized_tokens
    from .text import tokens as raw_tokens

    ids = sdf.select(id_alias.alias("__id__"), text.alias("__text__"))

    toks = (
        normalized_tokens(F.col("__text__"))
        if normalized
        else raw_tokens(F.col("__text__"))
    )
    prev = F.concat(
        F.array(F.lit(bos)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    # explode_OUTER: an empty/null token array emits one null-struct
    # sentinel row (__v__/__w__ null), so token-less docs ride the
    # same joins+aggregation — no second tokenize pass and no
    # anti-join union branch (sentinels match nothing in the left
    # joins, their cost is null-guarded, and count(__w__) reads 0)
    pairs = F.arrays_zip(prev.alias("v"), toks.alias("w"))
    rows = (
        ids.select("__id__", F.explode_outer(pairs).alias("p"))
        .select(
            "__id__",
            F.col("p.v").alias("__v__"),
            F.col("p.w").alias("__w__"),
        )
    )
    ctx = bigrams.groupBy("v").agg(F.sum("n").alias("cv"))
    total = unigrams.agg(F.sum("n").alias("t")).select(
        F.col("t").cast("double").alias("__t__")
    )
    scored = (
        rows.join(
            bigrams.select(
                F.col("v").alias("__v__"),
                F.col("w").alias("__w__"),
                F.col("n").alias("cvw"),
            ),
            ["__v__", "__w__"],
            "left",
        )
        .join(ctx.select(F.col("v").alias("__v__"), "cv"), "__v__", "left")
        .join(
            unigrams.select(F.col("token").alias("__w__"), F.col("n").alias("cw")),
            "__w__",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    # ONE fixed float expression over integer counts — the SQL oracle
    # writes the identical sequence; 1 - lam is precomputed in Python
    # so both engines see the same literal
    one_minus_lam = 1.0 - lam
    p_bi = F.when(
        F.col("cv").isNotNull(),
        F.coalesce(F.col("cvw"), F.lit(0)).cast("double") / F.col("cv"),
    ).otherwise(F.lit(0.0))
    p_uni = (
        F.greatest(
            F.coalesce(F.col("cw").cast("double"), F.lit(0.0)),
            F.lit(float(floor_count)),
        )
        / F.col("__t__")
    )
    p = F.lit(lam) * p_bi + F.lit(one_minus_lam) * p_uni
    cost = F.when(
        F.col("__w__").isNotNull(),
        F.round(-F.log(p) * F.lit(NANO)).cast("bigint"),
    )
    per_doc = scored.groupBy("__id__").agg(
        F.count("__w__").cast("long").alias("n_tokens"),
        F.sum(cost).alias("__total__"),
    )
    return per_doc.select(
        F.col("__id__").alias("id"),
        "n_tokens",
        F.round(
            F.col("__total__").cast("double") / F.col("n_tokens") / F.lit(NANO),
            6,
        ).alias("logppl"),
    )
