"""BPE merge learning (operators/bpe.py) vs the classic dict-based
algorithm (Sennrich et al. 2016): same word-frequency input, same
greedy argmax with (count desc, pair asc) tie-break, same left-to-right
non-overlapping merge application — the distributed implementation must
reproduce the sequential one exactly."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.bpe import bpe_segment, learn_bpe, merge_apply_expr


def _ref_bpe(texts, n_merges, min_count=1, max_words=None):
    """Sequential reference: dict-of-tuples BPE training."""
    words = Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9\s]", " ", t.lower()).split():
            words[w] += 1
    items = [(w, c) for w, c in words.items() if c >= min_count]
    items.sort(key=lambda wc: (-wc[1], wc[0]))
    if max_words is not None:
        items = items[:max_words]
    vocab = {}
    for w, c in items:
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = sorted(
            [p for p, c in pairs.items() if c == top],
            key=lambda p: p[0] + " " + p[1],
        )[0]
        merges.append(best)
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
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


def _ref_apply(word, left, right):
    syms, out, i = list(word), [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


CORPORA = [
    ["the cat sat on the mat", "the cat ate the rat", "low lower lowest"],
    ["aaaa aaa aa a", "aa aaaa", "aaaaaa"],  # overlapping-run stress
    ["x y z", "x x y y", "zzz zz z"],
    ["banana bandana ananas", "banana banana", "nan nan na"],
]


@pytest.mark.parametrize("texts", CORPORA)
def test_learn_bpe_matches_sequential_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_bpe(df, F.col("text"), n_merges=6)
    assert got == _ref_bpe(texts, 6)


def test_learn_bpe_min_count_and_cap(spark):
    texts = ["the quick brown fox", "the lazy dog", "the the quick"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_bpe(df, F.col("text"), n_merges=4, min_count=2, max_words=2)
    assert got == _ref_bpe(texts, 4, min_count=2, max_words=2)


def test_learn_bpe_early_stop(spark):
    # single-char words only: no pairs ever -> zero merges
    df = spark.createDataFrame([("a b c",), ("a b",)], "text string")
    assert learn_bpe(df, F.col("text"), n_merges=5) == []


def test_merge_apply_expr_greedy_left_to_right(spark):
    """The separator-doubled replace must equal the sequential fold on
    overlapping runs — the subtle case that breaks naive replaces."""
    cases = ["a a a", "a a a a", "a a a a a", "b a a b", "a b a a"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r["m"]
        for r in df.select(
            merge_apply_expr(F.col("s"), F.lit("a"), F.lit("a")).alias("m")
        ).collect()
    ]
    exp = [" ".join(_ref_apply(c.split(" "), "a", "a")) for c in cases]
    assert got == exp


def test_bpe_segment_applies_merges_in_order(spark):
    df = spark.createDataFrame([("the theme anthem",)], "text string")
    merges = [("t", "h"), ("th", "e")]
    got = df.select(
        bpe_segment(F.col("text"), merges).alias("s")
    ).collect()[0]["s"]

    def encode(word):
        syms = list(word)
        for left, right in merges:
            syms = _ref_apply_list(syms, left, right)
        return syms

    def _ref_apply_list(syms, left, right):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    exp = []
    for w in "the theme anthem".split():
        exp.extend(encode(w))
    assert got == exp
