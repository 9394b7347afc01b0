"""Training-data sampling operators + single-file CSV contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.sampling import mix_datasets, sample_exact_n, stratified_sample

SF = "/root/testdata/sf0.001"


def test_stratified_sample_fractions(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    totals = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    out = stratified_sample(docs, "source", {"src0": 1.0, "src1": 0.0})
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got.get("src0") == totals["src0"]   # fraction 1.0 keeps all
    assert "src1" not in got                    # fraction 0.0 drops all
    assert set(got) <= {"src0", "src1"}         # unlisted strata dropped
    # determinism
    a = stratified_sample(docs, "source", {"src0": 0.5}, seed=7).count()
    b = stratified_sample(docs, "source", {"src0": 0.5}, seed=7).count()
    assert a == b


def test_mix_datasets_weights_and_schema(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    a = docs.filter(F.col("source") == "src0")
    b = docs.filter(F.col("source") == "src1")
    mixed = mix_datasets([(a, 1.0), (b, 0.0)])
    assert mixed.count() == a.count()
    assert mixed.columns == docs.columns
    with pytest.raises(ValueError, match="weight"):
        mix_datasets([(a, 1.5)])
    with pytest.raises(ValueError, match="at least one"):
        mix_datasets([])


def test_sample_exact_n_deterministic(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    s1 = sample_exact_n(docs, 25, seed=3, order_col="doc_id")
    s2 = sample_exact_n(docs, 25, seed=3, order_col="doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert len(ids1) == 25 and ids1 == ids2
    ids3 = sorted(
        r["doc_id"]
        for r in sample_exact_n(docs, 25, seed=4, order_col="doc_id")
        .select("doc_id").collect()
    )
    assert ids1 != ids3  # different seed, different sample


def test_to_csv_single_file(spark, tmp_path):
    nat = es.read_parquet(spark, f"{SF}/nation.parquet", index_col="n_nationkey")
    p = str(tmp_path / "nation.csv")
    nat.to_csv(p, single_file=True)
    back = pd.read_csv(p)
    exp = nat.to_pandas()
    assert back.shape == exp.shape
    assert list(back["n_name"]) == list(exp["n_name"])  # index order preserved


def test_split_by_hash_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from eland_spark.operators.sampling import split_by_hash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_by_hash(docs, "doc_id", fr)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert set(counts) == set(fr)
    assert abs(counts["train"] / n - 0.8) < 0.06  # binomial noise at small n
    a = set(
        r["doc_id"]
        for r in split_by_hash(docs, "doc_id", fr).filter(F.col("split") == "val").collect()
    )
    b = set(
        r["doc_id"]
        for r in split_by_hash(docs, "doc_id", fr).filter(F.col("split") == "val").collect()
    )
    c = set(
        r["doc_id"]
        for r in split_by_hash(docs, "doc_id", fr, salt="v2")
        .filter(F.col("split") == "val")
        .collect()
    )
    assert a == b and a != c
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(docs, "doc_id", {"train": 0.5})


def test_pack_documents_invariants(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from eland_spark.operators.packing import pack_documents
    from eland_spark.operators.text import bpe_ish_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wt = docs.select(
        "doc_id", bpe_ish_token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    BUDGET = 2048
    packed = pack_documents(wt, "doc_id", "n_tokens", BUDGET)
    stats = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    row = stats.agg(
        F.max(F.when(F.col("n") > 1, F.col("tot"))).alias("max_multi"),
        F.count(F.lit(1)).alias("bins"),
        F.sum("tot").alias("total"),
    ).collect()[0]
    # no multi-doc bin exceeds the budget; oversized docs isolate
    assert row["max_multi"] <= BUDGET
    # within 2 bins per partition of the global lower bound
    nparts = wt.rdd.getNumPartitions()
    assert row["bins"] <= math.ceil(row["total"] / BUDGET) + 2 * nparts
    assert packed.count() == wt.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        pack_documents(wt, "doc_id", "n_tokens", 0)


def test_weighted_sample_n(spark, sf_dir):
    from pyspark.sql import functions as F

    from eland_spark.operators.sampling import weighted_sample_n
    from eland_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wdocs = docs.withColumn("wq", quality_score(F.col("text")) + 0.01)
    s1 = sorted(
        r["doc_id"] for r in weighted_sample_n(wdocs, "wq", 50).select("doc_id").collect()
    )
    s2 = sorted(
        r["doc_id"] for r in weighted_sample_n(wdocs, "wq", 50).select("doc_id").collect()
    )
    assert s1 == s2 and len(s1) == 50  # deterministic for a fixed seed
    s3 = sorted(
        r["doc_id"]
        for r in weighted_sample_n(wdocs, "wq", 50, seed=7).select("doc_id").collect()
    )
    assert s3 != s1  # re-seeding re-deals
    big = wdocs.withColumn(
        "wq", F.when(F.col("doc_id") == 42, 1e6).otherwise(F.col("wq"))
    )
    sb = [r["doc_id"] for r in weighted_sample_n(big, "wq", 10).select("doc_id").collect()]
    assert 42 in sb  # dominant weight always drawn
    z = wdocs.withColumn("wq", F.lit(0.0))
    assert weighted_sample_n(z, "wq", 5).count() == 0  # zero weights excluded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        weighted_sample_n(wdocs, "wq", 0)


def test_shard_by_budget_semantics_and_plan(spark, sf_dir):
    """Budget slicing of the running token total: shard ids are
    non-decreasing in corpus order, every shard's exclusive prefix
    starts inside its slice, totals are preserved, and (scale pin) the
    plan has no single-partition window."""
    from eland_spark.operators.packing import shard_by_budget

    docs = spark.createDataFrame(
        [(i, (i * 37) % 90 + 10) for i in range(500)], "doc_id long, w long"
    )
    out = shard_by_budget(docs, ["doc_id"], "w", budget=1000)
    rows = sorted(
        ((r["doc_id"], r["w"], r["shard"]) for r in out.collect())
    )
    # sequential reference: shard = exclusive-prefix DIV budget
    cum = 0
    for doc_id, w, shard in rows:
        assert shard == cum // 1000, (doc_id, cum, shard)
        cum += w
    shards = [s for _, _, s in rows]
    assert shards == sorted(shards)  # contiguous, order-preserving
    assert sum(w for _, w, _ in rows) == cum
    # every shard except possibly the last holds >= budget - max(w) + 1
    from collections import defaultdict

    tot = defaultdict(int)
    for _, w, s in rows:
        tot[s] += w
    for s in list(tot)[:-1]:
        assert tot[s] >= 1000 - 99, (s, tot[s])

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_shard_by_budget_quoting_and_weight_type(spark):
    """ADVICE r3: a weight column name needing backticks must work
    (it was interpolated unquoted into F.expr), and a fractional
    weight column must raise instead of silently truncating."""
    import pytest as _pytest

    from eland_spark.operators.packing import shard_by_budget

    docs = spark.createDataFrame(
        [(i, 100) for i in range(20)], "doc_id long, `token count` long"
    )
    out = shard_by_budget(docs, ["doc_id"], "token count", budget=500)
    rows = sorted((r["doc_id"], r["shard"]) for r in out.collect())
    assert [s for _, s in rows] == [i * 100 // 500 for i in range(20)]

    fdocs = spark.createDataFrame(
        [(i, 1.5) for i in range(5)], "doc_id long, w double"
    )
    with _pytest.raises(TypeError, match="integral"):
        shard_by_budget(fdocs, ["doc_id"], "w", budget=10)


def test_allocate_budget_matches_iterative_waterfill(spark):
    """Closed-form window allocation vs the textbook iterative
    water-filling loop, across regimes (no caps hit / some / all) and
    random instances."""
    import random

    from eland_spark.operators.sampling import allocate_budget

    def ref(rows, total):
        alloc = {d: 0.0 for d, _, _ in rows}
        rem = [(d, w, c) for d, w, c in rows if w > 0]
        rem_total = total
        while rem:
            lam = rem_total / sum(w for _, w, _ in rem)
            capped = [x for x in rem if x[2] < lam * x[1]]
            if not capped:
                for d, w, _ in rem:
                    alloc[d] = lam * w
                break
            for d, _, c in capped:
                alloc[d] = c
                rem_total -= c
            rem = [x for x in rem if x not in capped]
        return alloc

    rng = random.Random(11)
    for trial in range(4):
        rows = [
            (f"d{i}", round(rng.uniform(0, 3), 3), round(rng.uniform(0, 500), 2))
            for i in range(8)
        ]
        rows.append(("zero", 0.0, 100.0))
        caps = sum(c for _, _, c in rows)
        for total in (0.0, caps * 0.3, caps * 0.9, caps * 2):
            df = spark.createDataFrame(rows, "d string, w double, c double")
            got = {
                r["domain"]: round(r["alloc"], 6)
                for r in allocate_budget(df, "d", "w", "c", total).collect()
            }
            exp = {d: round(v, 6) for d, v in ref(rows, total).items()}
            assert got == exp, (trial, total, got, exp)
            assert got["zero"] == 0.0

    import pytest as _pytest

    df = spark.createDataFrame([("a", 1.0, 1.0)], "d string, w double, c double")
    with _pytest.raises(ValueError, match=">= 0"):
        allocate_budget(df, "d", "w", "c", -1.0)
