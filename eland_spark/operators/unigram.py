"""Unigram language-model tokenizer (SentencePiece-style), hard-EM.

Completes the in-engine tokenizer-training triad next to BPE
(``operators/bpe.py``) and greedy WordPiece (``operators/text.py``):
a piece VOCABULARY with probabilities is learned by hard
(Viterbi) expectation-maximization — E-step segments every distinct
word into its maximum-probability piece sequence under the current
model, M-step re-estimates piece probabilities from the chosen
segmentations — and segmentation applies the same Viterbi to new text.

Determinism contract (what makes a SQL oracle possible):
- piece costs are INTEGER nano-logs ``round(-ln(count/total) * 1e9)``,
  so Viterbi DP sums/compares exact integers — no float accumulation
  order to diverge between engines (the residual risk is a 1-ulp ln()
  difference landing exactly on a .5 rounding boundary, measure-zero);
- DP ties prefer the LONGER piece, then the algorithm is fully
  deterministic;
- every single character stays in the vocabulary with a count floor of
  1 (the SentencePiece "required chars" rule), so any word over the
  training charset segments.

Scale shape: the corpus reduces to the distinct-word frequency table
in one hash aggregation (operators/text.vocabulary — map-side
combinable); seeding explodes bounded substrings of that table
(<= max_piece_len per position) into one piece-count aggregation; each
EM iteration is ONE Arrow mapInPandas pass over the distinct-word
table (model broadcast, per-word O(len * max_piece_len) DP) plus one
vocab-sized count aggregation. Driver state is the model (vocab_size
entries), never data-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_train", "unigram_segment_frame", "viterbi_segment"]

NANO = 1_000_000_000.0


def _cost_table(vocab: "dict[str, int]") -> "dict[str, int]":
    total = float(sum(vocab.values()))
    return {
        p: int(round(-math.log(c / total) * NANO))
        for p, c in vocab.items()
    }


def viterbi_segment(
    word: str, costs: "dict[str, int]", max_piece_len: int
) -> "list[str] | None":
    """Minimum-total-cost segmentation of ``word`` into vocab pieces
    (= maximum probability under the unigram model). Ties prefer the
    longer final piece at each position. None when unsegmentable
    (a character outside the vocab)."""
    n = len(word)
    dp: list = [0] + [None] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        best = None
        best_l = 0
        for l in range(1, min(max_piece_len, j) + 1):
            prev = dp[j - l]
            if prev is None:
                continue
            c = costs.get(word[j - l:j])
            if c is None:
                continue
            cand = prev + c
            if best is None or cand < best or (cand == best and l > best_l):
                best, best_l = cand, l
        dp[j], back[j] = best, best_l
    if dp[n] is None:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        l = back[j]
        out.append(word[j - l:j])
        j -= l
    out.reverse()
    return out


def _seed_vocab(
    wf: DataFrame,
    max_piece_len: int,
    seed_size: int,
) -> "dict[str, int]":
    """Candidate pieces: every substring (len <= max_piece_len) of the
    distinct-word table, weighted by word frequency — ALL single chars
    plus the top ``seed_size`` multi-char pieces (count desc, piece
    asc). One distributed explode + hash agg; collects are charset- and
    seed-sized."""
    w = F.col("token")
    ln = F.length(w)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), ln),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), ln - i + 1)
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    pieces = (
        wf.select(F.explode(subs).alias("piece"), F.col("count"))
        .groupBy("piece")
        .agg(F.sum("count").alias("n"))
        .localCheckpoint(eager=False)
    )
    chars = {
        r["piece"]: r["n"]
        for r in pieces.where(F.length("piece") == 1).collect()
    }
    multi = pieces.where(F.length("piece") > 1).orderBy(
        F.desc("n"), F.asc("piece")
    ).limit(seed_size).collect()
    vocab = dict(chars)
    for r in multi:
        vocab[r["piece"]] = r["n"]
    return vocab


def unigram_train(
    sdf: DataFrame,
    text: Column,
    vocab_size: int = 100,
    max_piece_len: int = 4,
    seed_size: int = 200,
    iters: int = 2,
    max_word_len: int = 12,
    max_words: "int | None" = None,
    normalized: bool = True,
) -> "list[tuple[str, int]]":
    """Learn a unigram-LM piece vocabulary by ``iters`` rounds of hard
    EM; returns the final model as ``[(piece, count), ...]`` sorted
    (count desc, piece asc) — all single characters (count-floored at
    1) plus the top multi-char pieces up to ``vocab_size`` total.
    Words longer than ``max_word_len`` are excluded from training
    (they would unboundedly widen the DP; standard practice).

    Driver state is the model only; see the module docstring for the
    per-stage scale shape and the integer-cost determinism contract.
    """
    from .text import vocabulary

    if iters < 0:
        raise ValueError("iters must be >= 0")
    if vocab_size < 1 or max_piece_len < 1:
        raise ValueError("vocab_size and max_piece_len must be >= 1")
    wf = vocabulary(
        sdf.select(text.alias("__t__")), F.col("__t__"),
        top_k=max_words, normalized=normalized,
    ).where(F.length("token") <= max_word_len).localCheckpoint(eager=False)
    vocab = _seed_vocab(wf, max_piece_len, seed_size)
    if not vocab:
        return []
    chars = {p for p in vocab if len(p) == 1}

    for _ in range(iters):
        costs = _cost_table(vocab)
        spark = sdf.sparkSession
        bc = spark.sparkContext.broadcast(costs)
        mpl = max_piece_len

        def _estep(batches):
            import pandas as pd

            table = bc.value
            for pdf in batches:
                agg: dict[str, int] = {}
                for word, cnt in zip(pdf["token"], pdf["count"]):
                    seg = viterbi_segment(word, table, mpl)
                    if seg is None:
                        continue
                    for p in seg:
                        agg[p] = agg.get(p, 0) + int(cnt)
                yield pd.DataFrame(
                    {"piece": list(agg), "n": list(agg.values())}
                )

        emitted = (
            wf.mapInPandas(_estep, schema="piece string, n long")
            .groupBy("piece")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        new = {r["piece"]: r["n"] for r in emitted}
        # required-chars floor keeps every word segmentable next round
        for c in chars:
            new[c] = max(new.get(c, 0), 1)
        vocab = new

    ordered = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    kept_chars = [(p, c) for p, c in ordered if len(p) == 1]
    kept_multi = [(p, c) for p, c in ordered if len(p) > 1]
    room = max(vocab_size - len(kept_chars), 0)
    model = kept_chars + kept_multi[:room]
    return sorted(model, key=lambda kv: (-kv[1], kv[0]))


def unigram_segment_frame(
    sdf: DataFrame,
    text: Column,
    model: "list[tuple[str, int]]",
    max_piece_len: int = 4,
    out_col: str = "pieces",
    unk: str = "<unk>",
    normalized: bool = True,
    max_word_len: "int | None" = 12,
) -> DataFrame:
    """Segment every row's text under a trained unigram model: adds
    ``out_col`` (array<string> of pieces, words concatenated in order;
    an unsegmentable word emits one ``unk``). Words longer than
    ``max_word_len`` also emit one ``unk`` — the segmentation twin of
    training's exclusion (the WordPiece max_input_chars_per_word
    convention), and an EXPLICIT semantic so the SQL oracle's bounded
    DP unroll and the engine agree on any corpus, not just ones whose
    max word length happens to fit the unroll; ``None`` disables the
    cap. Tokenization happens in Spark (the same normalized_tokens
    split training used); the per-word Viterbi is one Arrow
    mapInPandas stage with the model broadcast — zero shuffles."""
    from .dedup import normalized_tokens
    from .text import tokens as raw_tokens

    if not model:
        raise ValueError("empty model")
    costs = _cost_table(dict(model))
    spark = sdf.sparkSession
    bc = spark.sparkContext.broadcast(costs)
    mpl = max_piece_len
    toks = normalized_tokens(text) if normalized else raw_tokens(text)
    src = sdf.withColumn("__toks__", toks)
    fields = ", ".join(
        f"`{name}` {dtype}" for name, dtype in src.dtypes
        if name != "__toks__"
    )
    schema = f"{fields}, {out_col} array<string>"

    def _seg(batches):
        import pandas as pd

        table = bc.value
        memo: dict = {}
        for pdf in batches:
            out = []
            for ts in pdf["__toks__"]:
                pieces: list[str] = []
                for word in ts:
                    seg = memo.get(word)
                    if seg is None:
                        if max_word_len is not None and len(word) > max_word_len:
                            seg = [unk]
                        else:
                            seg = viterbi_segment(word, table, mpl) or [unk]
                        memo[word] = seg
                    pieces.extend(seg)
                out.append(pieces)
            pdf = pdf.drop(columns=["__toks__"])
            pdf[out_col] = out
            yield pdf

    return src.mapInPandas(_seg, schema=schema)
