"""k-anonymity/l-diversity audits, shingle-containment near-dup, and
deterministic negative sampling — hand cases + pure-python
differentials."""

import re
from collections import Counter

import pandas as pd

from eland_spark.operators.dedup import containment_near_dup_pairs
from eland_spark.operators.privacy import (
    k_anonymity_audit,
    suppress_small_classes,
)
from eland_spark.operators.sampling import negative_sample


# --------------------------------------------------------------- privacy

def _people(spark):
    pdf = pd.DataFrame(
        {
            "zip": ["02139", "02139", "02139", "94110", "94110", None, None],
            "age": [30, 30, 30, 40, 40, 50, 50],
            "disease": ["flu", "flu", "cold", "flu", "flu", "flu", "cold"],
        }
    )
    return spark.createDataFrame(pdf)


def test_k_anonymity_audit_hand_case(spark):
    out = k_anonymity_audit(
        _people(spark), ["zip", "age"], "disease", k=3, l=2
    ).toPandas()
    idx = {
        (r["zip"], r["age"]): r for _, r in out.iterrows()
    }
    assert idx[("02139", 30)]["class_size"] == 3
    assert idx[("02139", 30)]["is_k_anonymous"]
    assert idx[("02139", 30)]["l_diversity"] == 2
    assert idx[("02139", 30)]["is_l_diverse"]
    assert idx[("94110", 40)]["class_size"] == 2
    assert not idx[("94110", 40)]["is_k_anonymous"]
    assert idx[("94110", 40)]["l_diversity"] == 1
    assert not idx[("94110", 40)]["is_l_diverse"]
    # null quasi values form their own (linkable) class
    assert idx[(None, 50)]["class_size"] == 2
    assert idx[(None, 50)]["l_diversity"] == 2


def test_suppress_small_classes(spark):
    kept = suppress_small_classes(
        _people(spark), ["zip", "age"], "disease", k=2, l=2
    ).toPandas()
    # (02139,30): size 3, 2 diseases -> kept; (94110,40): l=1 -> dropped;
    # (null,50): size 2, l=2 -> kept (null-safe semi join)
    got = Counter(zip(kept["zip"], kept["age"]))
    assert got == {("02139", 30): 3, (None, 50): 2}
    # k-only mode (no sensitive column)
    kept_k = suppress_small_classes(
        _people(spark), ["zip", "age"], k=3
    ).toPandas()
    assert Counter(zip(kept_k["zip"], kept_k["age"])) == {("02139", 30): 3}


# ----------------------------------------------------------- containment

def _shingles(text, k=3):
    cleaned = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    toks = [w for w in re.split(r"\s+", cleaned) if w]
    if len(toks) >= k:
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    if toks:
        return {" ".join(toks)}
    return set()


def _hand_containment(texts, k=3, max_df=20, threshold=0.5):
    sets = {i: _shingles(t, k) for i, t in enumerate(texts)}
    df = Counter(s for ss in sets.values() for s in ss)
    rare = {s for s, n in df.items() if 2 <= n <= max_df}
    out = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            if not (sets[a] & sets[b] & rare):
                continue
            inter = len(sets[a] & sets[b])
            ca = round(inter / len(sets[a]), 6)
            cb = round(inter / len(sets[b]), 6)
            if max(ca, cb) >= threshold:
                out[(a, b)] = (inter, ca, cb)
    return out


def test_containment_embedded_doc(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = (
        "intro words here first. "
        + short
        + " trailing content extends much further beyond the quote "
        "with many additional unrelated tokens"
    )
    texts = [short, long_doc, "totally different text about nothing"]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from pyspark.sql import functions as F

    out = containment_near_dup_pairs(
        sdf, F.col("text"), F.col("doc_id"), threshold=0.5, k=3, max_df=20
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    # every shingle of the short doc appears in the long one
    assert r["containment_a"] == 1.0
    assert r["containment_b"] < 0.5  # asymmetric: Jaccard would miss it


def test_containment_matches_python_reference(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [
        base,
        base + " with extra trailing words appended here",
        "the quick brown fox jumps over the lazy dog",  # prefix subset
        "completely unrelated document about spark planning internals",
        "spark planning internals are discussed in this other document",
        "",
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from pyspark.sql import functions as F

    out = containment_near_dup_pairs(
        sdf, F.col("text"), F.col("doc_id"), threshold=0.3, k=3, max_df=20
    ).toPandas()
    got = {
        (r["id_a"], r["id_b"]): (
            r["n_common"], r["containment_a"], r["containment_b"]
        )
        for _, r in out.iterrows()
    }
    assert got == _hand_containment(texts, threshold=0.3)
    assert len(got) >= 2  # the fixture exercises multiple pairs


# ------------------------------------------------------ negative sampling

def test_negative_sample_properties(spark):
    docs = spark.range(100).selectExpr("id AS doc_id")
    positives = spark.createDataFrame(
        pd.DataFrame({"anchor": [0, 0, 1, 2], "pos": [1, 2, 3, 4]})
    )
    out = negative_sample(
        positives, docs, "anchor", "pos", "doc_id", k=5, seed=7
    ).toPandas()
    # exactly k negatives per anchor on a dense corpus
    assert Counter(out["anchor"]) == {0: 5, 1: 5, 2: 5}
    # slots are 1..k per anchor
    for a, grp in out.groupby("anchor"):
        assert sorted(grp["slot"]) == [1, 2, 3, 4, 5]
    # negatives never collide with the anchor's positives or itself
    pos = {(0, 1), (0, 2), (1, 3), (2, 4), (0, 0), (1, 1), (2, 2)}
    assert not any((a, n) in pos for a, n in zip(out.anchor, out.neg_id))
    # deterministic across plans
    again = negative_sample(
        positives, docs, "anchor", "pos", "doc_id", k=5, seed=7
    ).toPandas()
    assert out.sort_values(["anchor", "slot"]).reset_index(drop=True).equals(
        again.sort_values(["anchor", "slot"]).reset_index(drop=True)
    )
    # a different seed draws a different sample
    other = negative_sample(
        positives, docs, "anchor", "pos", "doc_id", k=5, seed=8
    ).toPandas()
    assert set(zip(out.anchor, out.neg_id)) != set(
        zip(other.anchor, other.neg_id)
    )


def test_negative_sample_sparse_corpus_drops_gaps(spark):
    # corpus with only even ids: draws landing on odd ids vanish, the
    # oversample covers, and every sampled id exists in the corpus
    docs = spark.range(50).selectExpr("id * 2 AS doc_id")
    positives = spark.createDataFrame(
        pd.DataFrame({"anchor": [0], "pos": [2]})
    )
    out = negative_sample(
        positives, docs, "anchor", "pos", "doc_id", k=3, seed=1,
        oversample=8,
    ).toPandas()
    assert len(out) == 3
    assert all(n % 2 == 0 for n in out["neg_id"])
    assert not any(n in (0, 2) for n in out["neg_id"])
