"""T5 span corruption: python md5-replay differential, reassembly
invariant, empty/validation edges."""

import hashlib
import re

import pandas as pd
import pytest

from eland_spark.operators.augment import span_corrupt

SEED, RATE, SPAN = 5, 0.15, 3


def _key(s, seed=SEED):
    return int(hashlib.md5(f"{s}{seed}".encode()).hexdigest()[:15], 16)


def _ref(doc_id, text, rate=RATE, span=SPAN, seed=SEED):
    toks = [t for t in re.split(r"\s+", re.sub(r"[^a-z0-9\s]", " ", text.lower())) if t]
    n = len(toks)
    p_start = int(round(rate / span * 1_000_000))
    span_mod = 2 * span - 1
    masked = [False] * n
    for i in range(n):
        if _key(f"{doc_id}|{i}") % 1_000_000 < p_start:
            ln = 1 + _key(f"{doc_id}|{i}|L") % span_mod
            for j in range(i, min(n, i + ln)):
                masked[j] = True
    inp, tgt = [], []
    k = -1
    for i, t in enumerate(toks):
        rs = masked[i] and (i == 0 or not masked[i - 1])
        if rs:
            k += 1
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}>")
        if masked[i]:
            tgt.append(t)
        else:
            inp.append(t)
    tgt.append(f"<extra_id_{k + 1}>")
    return (
        " ".join(inp), " ".join(tgt), n, sum(masked), k + 1
    )


def test_span_corrupt_matches_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest while the morning light rises slowly "
        "over distant hills revealing a long winding river below",
        "short one",
        "",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from pyspark.sql import functions as F

    out = span_corrupt(
        sdf, F.col("text"), F.col("doc_id"),
        mask_rate=RATE, mean_span=SPAN, seed=SEED,
    ).toPandas().set_index("id").sort_index()
    for i, t in enumerate(texts):
        if not t:
            assert out.loc[i, "input_text"] == ""
            assert out.loc[i, "target_text"] == "<extra_id_0>"
            assert out.loc[i, "n_tokens"] == 0
            continue
        inp, tgt, n, nm, ns = _ref(i, t)
        assert out.loc[i, "input_text"] == inp, i
        assert out.loc[i, "target_text"] == tgt, i
        assert out.loc[i, "n_tokens"] == n
        assert out.loc[i, "n_masked"] == nm
        assert out.loc[i, "n_spans"] == ns


def test_span_corrupt_reassembly_invariant(spark):
    """Splicing each target span back over its sentinel reconstructs
    the normalized document exactly — on a larger randomized corpus
    with a high mask rate (exercises merged spans)."""
    import random

    rng = random.Random(2)
    words = ["data", "spark", "model", "token", "span", "mask", "text",
             "train", "corpus", "batch"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 60)))
        for _ in range(40)
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from pyspark.sql import functions as F

    out = span_corrupt(
        sdf, F.col("text"), F.col("doc_id"),
        mask_rate=0.4, mean_span=2, seed=9,
    ).toPandas().set_index("id")
    sent = re.compile(r"<extra_id_(\d+)>")
    for i, t in enumerate(texts):
        norm = " ".join(
            x for x in re.split(r"\s+", re.sub(r"[^a-z0-9\s]", " ", t.lower())) if x
        )
        inp, tgt = out.loc[i, "input_text"], out.loc[i, "target_text"]
        # parse target into {k: tokens}
        parts = sent.split(tgt)
        spans = {}
        for j in range(1, len(parts), 2):
            spans[int(parts[j])] = parts[j + 1].strip()
        closing = max(spans) if spans else None
        assert spans.get(closing, "") == ""  # closing sentinel is last
        rebuilt = sent.sub(lambda m: spans.get(int(m.group(1)), ""), inp)
        rebuilt = " ".join(rebuilt.split())
        assert rebuilt == norm, i
    # masking actually engaged somewhere
    assert (out["n_masked"] > 0).any()


def test_span_corrupt_validation(spark):
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError, match="mask_rate"):
        span_corrupt(sdf, F.col("text"), F.col("doc_id"), mask_rate=0.0)
    with pytest.raises(ValueError, match="mean_span"):
        span_corrupt(sdf, F.col("text"), F.col("doc_id"), mean_span=0)
