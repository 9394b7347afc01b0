"""Unigram-LM tokenizer (operators/unigram.py) vs a sequential
pure-python hard-EM reference, plus Viterbi edge semantics."""

import math
import re
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.unigram import (
    unigram_segment_frame, unigram_train, viterbi_segment,
)


def _costs(vocab):
    T = sum(vocab.values())
    return {p: int(round(-math.log(c / T) * 1e9)) for p, c in vocab.items()}


def _ref_viterbi(word, costs, L):
    n = len(word)
    dp = [0] + [None] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        best, bl = None, 0
        for l in range(1, min(L, j) + 1):
            if dp[j - l] is None:
                continue
            c = costs.get(word[j - l:j])
            if c is None:
                continue
            cand = dp[j - l] + c
            if best is None or cand < best or (cand == best and l > bl):
                best, bl = cand, l
        dp[j], back[j] = best, bl
    if dp[n] is None:
        return None
    out, j = [], n
    while j > 0:
        out.append(word[j - back[j]:j])
        j -= back[j]
    return out[::-1]


def _ref_train(texts, vocab_size, L, seed_size, iters, M):
    words = Counter()
    for t in texts:
        cleaned = re.sub(r"[^a-z0-9\s]", " ", t.lower())
        for w in re.split(r"\s+", cleaned):
            if w and len(w) <= M:
                words[w] += 1
    pieces = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, min(L, len(w) - i) + 1):
                pieces[w[i:i + l]] += c
    chars = {p: c for p, c in pieces.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in pieces.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    vocab = dict(chars)
    vocab.update(dict(multi))
    for _ in range(iters):
        costs = _costs(vocab)
        emitted = Counter()
        for w, c in words.items():
            seg = _ref_viterbi(w, costs, L)
            if seg is None:
                continue
            for p in seg:
                emitted[p] += c
        new = dict(emitted)
        for ch in chars:
            new[ch] = max(new.get(ch, 0), 1)
        vocab = new
    ordered = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    kc = [(p, c) for p, c in ordered if len(p) == 1]
    km = [(p, c) for p, c in ordered if len(p) > 1]
    model = kc + km[:max(vocab_size - len(kc), 0)]
    return sorted(model, key=lambda kv: (-kv[1], kv[0]))


TEXTS = [
    "the cat sat on the mat", "the catnip cat", "sat sat the mat",
    "a cat, a mat!", "the the the cat", "mats and cats sat",
]


def test_viterbi_prefers_probable_and_longer(spark):
    vocab = {"a": 10, "b": 5, "ab": 8, "abc": 2, "c": 4}
    costs = _costs(vocab)
    # p(abc) > p(ab)p(c): single piece wins
    assert viterbi_segment("abc", costs, 3) == ["abc"]
    assert viterbi_segment("abab", costs, 3) == ["ab", "ab"]
    # unknown character -> unsegmentable
    assert viterbi_segment("axb", costs, 3) is None
    # exact cost tie between 1x2 and 2x1 splits -> longer piece wins
    tie = {"x": 4, "xx": 2}
    tc = _costs(tie)
    if 2 * tc["x"] == tc["xx"]:  # only assert when the tie is real
        assert viterbi_segment("xx", tc, 2) == ["xx"]


def test_unigram_train_matches_sequential_reference(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    got = unigram_train(
        docs, F.col("text"), vocab_size=25, max_piece_len=3,
        seed_size=40, iters=2, max_word_len=10,
    )
    want = _ref_train(TEXTS, 25, 3, 40, 2, 10)
    assert got == want
    # learned whole words dominate the multi-char vocabulary
    top_multi = [p for p, _ in got if len(p) > 1][:3]
    assert "the" in top_multi and "cat" in top_multi


def test_unigram_train_iters0_is_seed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    got = unigram_train(
        docs, F.col("text"), vocab_size=25, max_piece_len=3,
        seed_size=40, iters=0, max_word_len=10,
    )
    want = _ref_train(TEXTS, 25, 3, 40, 0, 10)
    assert got == want
    with pytest.raises(ValueError, match="iters"):
        unigram_train(docs, F.col("text"), iters=-1)


def test_unigram_segment_frame_roundtrip_and_unk(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    model = unigram_train(
        docs, F.col("text"), vocab_size=25, max_piece_len=3,
        seed_size=40, iters=1, max_word_len=10,
    )
    seg = unigram_segment_frame(
        docs, F.col("text"), model, max_piece_len=3
    )
    rows = {r["doc_id"]: r["pieces"] for r in seg.collect()}
    costs = _costs(dict(model))
    for i, t in enumerate(TEXTS):
        cleaned = re.sub(r"[^a-z0-9\s]", " ", t.lower())
        want = []
        for w in re.split(r"\s+", cleaned):
            if not w:
                continue
            want.extend(_ref_viterbi(w, costs, 3) or ["<unk>"])
        assert rows[i] == want
    # pieces reassemble the normalized text exactly (no unk in-model)
    joined = "".join(rows[0])
    assert joined == "thecatsatonthemat"
    # a charset miss emits <unk> for the whole word
    other = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["zzz the"]})
    )
    got = unigram_segment_frame(
        other, F.col("text"), model, max_piece_len=3
    ).collect()[0]["pieces"]
    assert got[0] == "<unk>" and "".join(got[1:]) == "the"


def test_unigram_segment_overlong_word_is_unk(spark):
    """Words past max_word_len emit ONE <unk> (the explicit semantic
    that keeps the bounded-unroll SQL oracle sound on any corpus);
    max_word_len=None disables the cap and segments normally."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    model = unigram_train(
        docs, F.col("text"), vocab_size=25, max_piece_len=3,
        seed_size=40, iters=0, max_word_len=10,
    )
    long_word = "thecatthecatthecat"  # 18 chars, all in-charset
    other = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [f"the {long_word} cat"]})
    )
    capped = unigram_segment_frame(
        other, F.col("text"), model, max_piece_len=3, max_word_len=10
    ).collect()[0]["pieces"]
    assert capped.count("<unk>") == 1
    assert "".join(p for p in capped if p != "<unk>") == "thecat"
    uncapped = unigram_segment_frame(
        other, F.col("text"), model, max_piece_len=3, max_word_len=None
    ).collect()[0]["pieces"]
    assert "<unk>" not in uncapped
    assert "".join(uncapped) == f"the{long_word}cat"
