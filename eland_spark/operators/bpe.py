"""In-engine BPE tokenizer training (byte-pair-encoding merge learning).

The tokenizer-building counterpart to ``text.vocabulary`` and
``text.wordpiece_tokenize``: learn the merge table itself from the
corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm), entirely with DataFrame
ops.

100-TB posture: the corpus is touched ONCE (the word-frequency
aggregation, map-side combined, shuffle bounded by |vocab| not token
count). Every merge iteration then runs on the word-frequency table —
vocabulary-sized (capped by ``max_words``), millions of rows at worst —
so per-iteration cost is a tiny shuffle regardless of corpus size, and
driver state is one (left, right) pair per iteration. The word table is
localCheckpointed per round to keep lineage flat across iterations
(same pattern as dedup.connected_components).

Merge application is a LEFT-TO-RIGHT NON-OVERLAPPING scan, expressed as
a plain string replace over the space-joined symbol string (symbols are
whitespace-free by construction). Both Spark (Java ``String.replace``)
and DuckDB (``replace``) scan the original string left to right over
non-overlapping occurrences, so doubling the separators first makes the
two engines bit-identical — which is what lets the whole training loop
be replayed as chained CTEs in the DuckDB oracle
(``__spark_entry__._bpe_oracle_sql``).

No reference analog (eland is text-only ES dataframes); net-new
LLM-pipeline surface per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["learn_bpe", "bpe_segment", "merge_apply_expr"]


def _initial_symbols(token: Column) -> Column:
    """Space-joined character symbols of a token ('abc' -> 'a b c')."""
    return F.concat_ws(
        " ", F.filter(F.split(token, ""), lambda x: x != "")
    )


def merge_apply_expr(syms: Column, left: Column, right: Column) -> Column:
    """Apply one merge (left, right) to a space-joined symbol string
    with left-to-right non-overlapping semantics.

    Doubling the separators first means adjacent matches never share a
    space character, so a plain all-occurrences replace IS the greedy
    left-to-right scan ('a a a' with merge (a,a) -> 'aa a', like the
    sequential fold). Engine-portable: Java String.replace and DuckDB
    replace() both scan the original left to right.
    """
    doubled = F.concat(
        F.lit(" "), F.replace(syms, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = F.concat(F.lit(" "), left, F.lit("  "), right, F.lit(" "))
    rep = F.concat(F.lit(" "), left, right, F.lit(" "))
    merged = F.replace(doubled, pat, rep)
    return F.trim(F.regexp_replace(merged, " +", " "))


def _pair_strings(syms: Column) -> Column:
    """Adjacent symbol pairs of a space-joined symbol string, each as
    'left right' (empty array for single-symbol words)."""
    arr = F.split(syms, " ")
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def learn_bpe(
    sdf: DataFrame,
    text: Column,
    n_merges: int,
    min_count: int = 1,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns the ordered
    merge list [(left, right), ...] (driver state: one tuple per
    merge — model-sized, never data-sized).

    One corpus pass builds the word-frequency table; iterations run on
    that table only. ``max_words`` caps it to the most frequent words
    (count desc, word asc — deterministic), bounding per-iteration cost;
    standard practice, since rare words barely move pair counts. Stops
    early if the vocabulary runs out of pairs.

    When ``max_words`` bounds the table (<= 100k), the merge loop runs
    driver-local on the collected word counts — the same
    distributed-heavy-pass / model-sized-driver-step split as PCA's
    eigh (operators/decomposition.py): the corpus pass is the only
    data-sized stage either way, and n_merges sequential jobs on a
    200-row table would be pure scheduler overhead. The distributed
    loop remains for uncapped vocabularies. Both paths are
    differential-tested against the sequential reference algorithm
    (tests/test_bpe.py) and produce identical merges.
    """
    from .text import vocabulary

    wf = vocabulary(sdf.select(text.alias("__t__")), F.col("__t__"),
                    min_count=min_count, top_k=max_words)
    if max_words is not None and max_words <= 100_000:
        vocab: dict[tuple[str, ...], int] = {}
        for r in wf.collect():
            key = tuple(r["token"])
            vocab[key] = vocab.get(key, 0) + r["count"]
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pairs: dict[tuple[str, str], int] = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pairs[p] = pairs.get(p, 0) + c
            if not pairs:
                break
            best = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
            )[0]
            merges.append(best)
            new: dict[tuple[str, ...], int] = {}
            for syms, c in vocab.items():
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                key = tuple(out)
                new[key] = new.get(key, 0) + c
            vocab = new
        return merges
    words = wf.select(
        _initial_symbols(F.col("token")).alias("syms"),
        F.col("count").alias("cnt"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            words.select(
                F.explode(_pair_strings(F.col("syms"))).alias("pair"), "cnt"
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(" ", 1)
        merges.append((left, right))
        words = words.select(
            merge_apply_expr(
                F.col("syms"), F.lit(left), F.lit(right)
            ).alias("syms"),
            "cnt",
        ).localCheckpoint()
    return merges


def bpe_segment(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment whitespace-separated text into BPE subword tokens by
    replaying the merge list in rank order — the encode counterpart of
    ``learn_bpe`` for modest merge lists (the expression nests one
    replace per merge; for production-sized merge tables, greedy
    longest-match against the final vocabulary — see
    ``text.wordpiece_tokenize`` — is the right encoder).

    Returns array<string> of subword symbols. Zero shuffle: one
    codegen'd column expression.
    """
    from .dedup import normalized_tokens

    def seg_word(word: Column) -> Column:
        s = _initial_symbols(word)
        for left, right in merges:
            s = merge_apply_expr(s, F.lit(left), F.lit(right))
        return F.split(s, " ")

    return F.flatten(F.transform(normalized_tokens(text), seg_word))
