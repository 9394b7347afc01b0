"""Unit tests for the mixture-assembly curation operators:
perplexity_buckets (CCNet quality tiers), cap_per_key (per-domain
cap), sample_to_token_budget (budgeted mixture sampling).

Differential strategy: pure-pandas replays of the same math (the
DuckDB twins live in tests/test_oracle.py via the driver queries).
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.sampling import cap_per_key, sample_to_token_budget
from eland_spark.operators.text import perplexity_buckets


def _md5_key(v, seed):
    return int(hashlib.md5(f"{v}{seed}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- cap_per_key


def test_cap_per_key_keeps_first_n(documents):
    sdf = documents.to_spark()
    out = cap_per_key(sdf, "source", 5, "doc_id").toPandas()
    pdf = sdf.toPandas()
    exp = (
        pdf.sort_values("doc_id")
        .groupby("source", group_keys=False)
        .head(5)
    )
    assert len(out) == len(exp)
    assert set(out["doc_id"]) == set(exp["doc_id"])
    # schema untouched
    assert list(out.columns) == list(pdf.columns)


def test_cap_per_key_descending_keeps_last(documents):
    sdf = documents.to_spark()
    out = cap_per_key(sdf, "source", 3, "doc_id", descending=True).toPandas()
    pdf = sdf.toPandas()
    exp = (
        pdf.sort_values("doc_id", ascending=False)
        .groupby("source", group_keys=False)
        .head(3)
    )
    assert set(out["doc_id"]) == set(exp["doc_id"])


def test_cap_per_key_larger_than_group_is_noop(documents):
    sdf = documents.to_spark()
    n_rows = sdf.count()
    assert cap_per_key(sdf, "source", 10**6, "doc_id").count() == n_rows


def test_cap_per_key_rejects_nonpositive(documents):
    with pytest.raises(ValueError):
        cap_per_key(documents.to_spark(), "source", 0, "doc_id")


# ------------------------------------------------- sample_to_token_budget


def test_token_budget_matches_pandas_replay(documents):
    sdf = documents.to_spark()
    out = sample_to_token_budget(
        sdf, "n_chars", 2000, id_col="doc_id", group_col="source", seed=7
    ).toPandas()
    pdf = sdf.toPandas()
    pdf["__k__"] = pdf["doc_id"].map(lambda v: _md5_key(v, 7))
    keep = []
    for _, g in pdf.sort_values(["__k__", "doc_id"]).groupby("source"):
        cum = g["n_chars"].clip(lower=0).cumsum()
        keep.extend(g.loc[cum <= 2000, "doc_id"])
    assert set(out["doc_id"]) == set(keep)
    # per-group inclusive totals honor the budget
    assert (out.groupby("source")["n_chars"].sum() <= 2000).all()


def test_token_budget_global_when_ungrouped(documents):
    sdf = documents.to_spark()
    out = sample_to_token_budget(
        sdf, "n_chars", 5000, id_col="doc_id", seed=42
    ).toPandas()
    assert out["n_chars"].sum() <= 5000
    assert len(out) > 0


def test_token_budget_seed_changes_sample(documents):
    sdf = documents.to_spark()
    a = sample_to_token_budget(sdf, "n_chars", 2000, id_col="doc_id",
                               group_col="source", seed=1).toPandas()
    b = sample_to_token_budget(sdf, "n_chars", 2000, id_col="doc_id",
                               group_col="source", seed=2).toPandas()
    assert set(a["doc_id"]) != set(b["doc_id"])


def test_token_budget_rejects_nonpositive(documents):
    with pytest.raises(ValueError):
        sample_to_token_budget(
            documents.to_spark(), "n_chars", 0, id_col="doc_id"
        )


# ---------------------------------------------------- perplexity_buckets


def test_ppl_buckets_tiers_partition_each_language(documents):
    sdf = documents.to_spark()
    out = perplexity_buckets(
        sdf, F.col("text"), F.col("doc_id"), F.col("lang"),
        n_buckets=3, top_v=50,
    ).toPandas()
    # every scored doc appears exactly once
    assert out["id"].is_unique
    # tiles are near-equal per language (ntile contract: sizes differ by <= 1)
    sizes = out.groupby(["lang", "bucket"]).size()
    for lang, g in sizes.groupby(level=0):
        assert g.max() - g.min() <= 1, f"{lang}: {dict(g)}"
    # tier labels line up with bucket ids
    assert (out.loc[out.bucket == 1, "tier"] == "head").all()
    assert (out.loc[out.bucket == 3, "tier"] == "tail").all()
    assert (out.loc[out.bucket == 2, "tier"] == "middle").all()
    # head of each language has lower mean perplexity than its tail
    m = out.pivot_table(index="lang", columns="tier", values="logppl", aggfunc="mean")
    assert (m["head"] < m["tail"]).all()


def test_ppl_buckets_two_tiers_no_middle(documents):
    sdf = documents.to_spark()
    out = perplexity_buckets(
        sdf, F.col("text"), F.col("doc_id"), F.col("lang"),
        n_buckets=2, top_v=50,
    ).toPandas()
    assert set(out["tier"]) == {"head", "tail"}


def test_ppl_buckets_excludes_empty_docs(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["hello world hello", "", "   "],
         "lang": ["en", "en", "en"]}
    )
    sdf = spark.createDataFrame(pdf)
    out = perplexity_buckets(
        sdf, F.col("text"), F.col("doc_id"), F.col("lang"), n_buckets=2
    ).toPandas()
    assert set(out["id"]) == {1}


def test_linear_classifier_score_semantics(spark):
    from pyspark.sql import functions as F
    from eland_spark.operators.text import (
        classifier_quality_gate, linear_classifier_score,
    )

    sdf = spark.createDataFrame(
        [
            (0, "good good good"),
            (1, "bad bad"),
            (2, "good bad"),
            (3, ""),
            (4, "unknown words only"),
        ],
        "doc_id long, text string",
    )
    w = {"good": 2.0, "bad": -2.0}
    import math

    rows = {
        r["doc_id"]: r["p"]
        for r in sdf.select(
            "doc_id", linear_classifier_score(F.col("text"), w).alias("p")
        ).collect()
    }
    sig = lambda z: 1.0 / (1.0 + math.exp(-z))
    assert rows[0] == pytest.approx(sig(2.0))
    assert rows[1] == pytest.approx(sig(-2.0))
    assert rows[2] == pytest.approx(sig(0.0))
    assert rows[3] == pytest.approx(sig(0.0))  # empty text -> bias only
    assert rows[4] == pytest.approx(sig(0.0))  # OOV weighs 0
    kept = classifier_quality_gate(sdf, F.col("text"), w, threshold=0.6)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0]
    # zero shuffle: the gate is a scan predicate
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_temperature_oversample(spark, sf_dir):
    from pyspark.sql import functions as F

    from eland_spark.operators.sampling import (
        sample_by_temperature, temperature_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    target = 3 * n
    out = sample_by_temperature(
        docs, "source", "doc_id", target_rows=target, alpha=0.3,
        allow_oversample=True,
    ).cache()
    try:
        total = out.count()
        # expected total = sum over sources of n_i * rate_i = target
        assert abs(total - target) / target < 0.15
        # (id, copy) is a key
        assert out.select("doc_id", "copy").distinct().count() == total
        # every source is oversampled at 3x natural target: copies > 0 exist
        assert out.agg(F.max("copy")).collect()[0][0] >= 1
        # without the flag, rates cap at 1 -> no copy column, <= n rows
        capped = sample_by_temperature(
            docs, "source", "doc_id", target_rows=target, alpha=0.3
        )
        assert "copy" not in capped.columns and capped.count() <= n
    finally:
        out.unpersist()
