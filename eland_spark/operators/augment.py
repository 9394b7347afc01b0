"""Training-objective materialization: deterministic T5-style span
corruption.

No reference analog; this is the step that turns a curated corpus into
(input, target) pretraining pairs for a span-corruption objective
(Raffel et al. 2020, T5): ~``mask_rate`` of tokens are removed in
spans of mean length ``mean_span``, each span replaced by a sentinel
``<extra_id_k>`` in the input, and the target lists each sentinel
followed by the tokens it hides (plus a closing sentinel — the T5
convention).

Unlike the reference implementations' RNG-driven masking, span starts
and lengths here are md5-hash functions of (doc id, position, seed) —
the same expected statistics, but byte-reproducible on any engine,
independent of partition order, and exactly replayable in SQL (the
``sampling._md5_rank_key`` portability contract). Overlapping spans
merge into one (gaps-and-islands collapse), so realized mask rates
sit slightly below nominal at high rates — the standard behavior of
merged-span samplers.

Scale shape: one posexplode to (doc, pos, token) rows, then ALL the
masking logic — span coverage (a BOUNDED window of ``2 * mean_span``
preceding rows), run starts, sentinel numbering — rides doc-keyed
windows sharing ONE exchange, and the final assembly is one hash agg
per doc with an in-array sort (no global ordering). Skew bounded by
the longest document, like every per-doc text operator here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["span_corrupt"]


def span_corrupt(
    sdf: DataFrame,
    text: Column,
    id_alias: Column,
    mask_rate: float = 0.15,
    mean_span: int = 3,
    seed: int = 42,
    normalized: bool = True,
) -> DataFrame:
    """Returns (id, input_text, target_text, n_tokens, n_masked,
    n_spans). Token ``pos`` STARTS a span when
    ``hash(id|pos|seed) % 1e6 < mask_rate / mean_span * 1e6``; the
    span covers ``1 + hash(id|pos|L|seed) % (2 * mean_span - 1)``
    tokens (uniform on [1, 2*mean_span-1], mean ``mean_span``).
    Overlapping/adjacent spans merge. Empty docs yield empty strings;
    a fully-masked doc yields a bare sentinel input. The closing
    sentinel is always appended to the target."""
    from .dedup import normalized_tokens
    from .sampling import _md5_rank_key
    from .text import tokens as raw_tokens

    if not 0.0 < mask_rate < 1.0:
        raise ValueError("mask_rate must be in (0, 1)")
    if mean_span < 1:
        raise ValueError("mean_span must be >= 1")
    toks = normalized_tokens(text) if normalized else raw_tokens(text)
    ids = sdf.select(id_alias.alias("__id__"), toks.alias("__toks__"))
    # posexplode_OUTER: an empty/null token array emits ONE
    # (null, null) sentinel row, so token-less docs flow through the
    # same windows+aggregation as everything else — no second
    # tokenize pass and no anti-join union branch for the empties
    # (the sentinel can never be masked: its reach/pos comparisons
    # are null -> coalesce(false), and the null token drops out of
    # both assemblies while count(__tok__) reads 0)
    rows = ids.select(
        "__id__", F.posexplode_outer("__toks__").alias("__pos__", "__tok__")
    )
    p_start = int(round(mask_rate / mean_span * 1_000_000))
    span_mod = 2 * mean_span - 1
    h_start = _md5_rank_key(
        F.concat_ws(
            "|", F.col("__id__").cast("string"), F.col("__pos__").cast("string")
        ),
        seed,
    )
    h_len = _md5_rank_key(
        F.concat_ws(
            "|",
            F.col("__id__").cast("string"),
            F.col("__pos__").cast("string"),
            F.lit("L"),
        ),
        seed,
    )
    is_start = (h_start % 1_000_000) < p_start
    span_len = F.lit(1) + (h_len % span_mod)
    w = Window.partitionBy("__id__").orderBy(F.col("__pos__").asc())
    # coverage: pos is masked iff some span starting in the last
    # span_mod positions (bounded lookback) reaches past it
    reach = F.when(is_start, F.col("__pos__") + span_len)
    w_cov = w.rowsBetween(-(span_mod - 1), 0)
    staged = rows.select(
        "__id__",
        "__pos__",
        "__tok__",
        # no span start in the lookback -> max is NULL; that must read
        # as NOT masked, not as SQL-null (a null would silently drop
        # the token from the input assembly)
        F.coalesce(
            F.max(reach).over(w_cov) > F.col("__pos__"), F.lit(False)
        ).alias("__m__"),
    )
    prev_m = F.lag("__m__").over(w)
    run_start = F.col("__m__") & ~F.coalesce(prev_m, F.lit(False))
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged2 = staged.select(
        "__id__",
        "__pos__",
        "__tok__",
        "__m__",
        run_start.alias("__rs__"),
    ).select(
        "__id__",
        "__pos__",
        "__tok__",
        "__m__",
        "__rs__",
        (
            F.sum(F.when(F.col("__rs__"), 1).otherwise(0)).over(w_cum) - 1
        ).alias("__k__"),
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("__k__"), F.lit(">"))
    in_piece = F.when(~F.col("__m__"), F.col("__tok__")).when(
        F.col("__rs__"), sentinel
    )
    tgt_piece = F.when(
        F.col("__m__"),
        F.when(
            F.col("__rs__"), F.concat(sentinel, F.lit(" "), F.col("__tok__"))
        ).otherwise(F.col("__tok__")),
    )
    per_doc = staged2.groupBy("__id__").agg(
        F.count("__tok__").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__m__"), 1).otherwise(0))
        .cast("long")
        .alias("n_masked"),
        F.sum(F.when(F.col("__rs__"), 1).otherwise(0))
        .cast("long")
        .alias("n_spans"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            in_piece.isNotNull(),
                            F.struct(
                                F.col("__pos__").alias("p"),
                                in_piece.alias("s"),
                            ),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("input_text"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tgt_piece.isNotNull(),
                            F.struct(
                                F.col("__pos__").alias("p"),
                                tgt_piece.alias("s"),
                            ),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("__tgt__"),
    )
    closing = F.concat(F.lit("<extra_id_"), F.col("n_spans"), F.lit(">"))
    scored = per_doc.select(
        "__id__",
        "input_text",
        F.when(
            F.col("n_spans") > 0, F.concat(F.col("__tgt__"), F.lit(" "), closing)
        )
        .otherwise(closing)
        .alias("target_text"),
        "n_tokens",
        "n_masked",
        "n_spans",
    )
    return scored.select(
        F.col("__id__").alias("id"),
        "input_text",
        "target_text",
        "n_tokens",
        "n_masked",
        "n_spans",
    )
