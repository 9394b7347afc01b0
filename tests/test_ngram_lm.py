"""Interpolated bigram LM: counts vs python Counter, per-doc logppl vs
a pure-python reference implementing the exact integer nano-log
contract, OOV/empty-doc/validation edges."""

import math
import re
from collections import Counter

import pandas as pd
import pytest

from eland_spark.operators.ngram_lm import (
    BOS,
    bigram_lm_counts,
    bigram_logppl,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "",
]
SCORE = [
    "the cat sat",          # fluent under the model
    "zebra quantum flux",   # all OOV
    "the the the",          # odd repeats
    "",                     # empty -> null
]


def _toks(t):
    cleaned = re.sub(r"[^a-z0-9\s]", " ", t.lower())
    return [w for w in re.split(r"\s+", cleaned) if w]


def _counts(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = _toks(t)
        prev = BOS
        for w in ws:
            uni[w] += 1
            bi[(prev, w)] += 1
            prev = w
    return uni, bi


def _ref_logppl(text, uni, bi, lam=0.7, floor=0.5):
    ctx = Counter()
    for (v, _), n in bi.items():
        ctx[v] += n
    t = float(sum(uni.values()))
    ws = _toks(text)
    if not ws:
        return 0, None
    total = 0
    prev = BOS
    for w in ws:
        if prev in ctx:
            p_bi = float(bi.get((prev, w), 0)) / ctx[prev]
        else:
            p_bi = 0.0
        p_uni = float(uni.get(w, floor)) / t
        p = lam * p_bi + (1.0 - lam) * p_uni
        total += int(round(-math.log(p) * 1e9))
        prev = w
    return len(ws), round(total / len(ws) / 1e9, 6)


def test_bigram_counts_match_counter(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": TRAIN}))
    from pyspark.sql import functions as F

    uni, bi = bigram_lm_counts(sdf, F.col("text"))
    got_uni = {r["token"]: r["n"] for r in uni.collect()}
    got_bi = {(r["v"], r["w"]): r["n"] for r in bi.collect()}
    want_uni, want_bi = _counts(TRAIN)
    assert got_uni == dict(want_uni)
    assert got_bi == dict(want_bi)
    # bos appears as a context exactly once per non-empty doc
    assert sum(n for (v, _), n in got_bi.items() if v == BOS) == 3


def test_bigram_logppl_matches_reference(spark):
    from pyspark.sql import functions as F

    train = spark.createDataFrame(pd.DataFrame({"text": TRAIN}))
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(SCORE)), "text": SCORE})
    )
    uni, bi = bigram_lm_counts(train, F.col("text"))
    out = bigram_logppl(
        score, F.col("text"), F.col("doc_id"), uni, bi
    ).toPandas().set_index("id").sort_index()
    want_uni, want_bi = _counts(TRAIN)
    for i, t in enumerate(SCORE):
        n, ppl = _ref_logppl(t, want_uni, want_bi)
        assert out.loc[i, "n_tokens"] == n, t
        if ppl is None:
            assert pd.isna(out.loc[i, "logppl"]), t
        else:
            assert out.loc[i, "logppl"] == pytest.approx(ppl, abs=2e-6), t
    # fluency ordering: in-domain text scores lower than OOV soup
    assert out.loc[0, "logppl"] < out.loc[1, "logppl"]


def test_bigram_logppl_lam_edges_and_validation(spark):
    from pyspark.sql import functions as F

    train = spark.createDataFrame(pd.DataFrame({"text": TRAIN}))
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["the cat"]})
    )
    uni, bi = bigram_lm_counts(train, F.col("text"))
    # lam=0 -> pure unigram model: matches unigram algebra
    out0 = bigram_logppl(
        score, F.col("text"), F.col("doc_id"), uni, bi, lam=0.0
    ).collect()[0]
    want_uni, want_bi = _counts(TRAIN)
    n, ppl = _ref_logppl("the cat", want_uni, want_bi, lam=0.0)
    assert out0["logppl"] == pytest.approx(ppl, abs=2e-6)
    with pytest.raises(ValueError, match="lam"):
        bigram_logppl(score, F.col("text"), F.col("doc_id"), uni, bi, lam=1.5)
    with pytest.raises(ValueError, match="floor"):
        bigram_logppl(
            score, F.col("text"), F.col("doc_id"), uni, bi, floor_count=0.0
        )
