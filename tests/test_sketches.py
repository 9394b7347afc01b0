"""HLL sketch operators: per-group sketches, lossless rollup merge."""

from pyspark.sql import functions as F

from eland_spark.operators.sketches import hll_rollup_estimate, hll_sketches

SF = "/root/testdata/sf0.01"


def test_sketch_estimates_and_rollup(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sk = hll_sketches(li, "l_suppkey", ["l_returnflag", "l_linestatus"])
    per_group = {
        (r["l_returnflag"], r["l_linestatus"]): r["estimate"] for r in sk.collect()
    }
    exact = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    assert max(abs(per_group[k] - exact[k]) / exact[k] for k in exact) < 0.05
    # rollup from sketches == rebuild from raw (merge is lossless)
    g = hll_rollup_estimate(sk, []).collect()[0]["estimate"]
    g_exact = li.agg(F.countDistinct("l_suppkey").alias("n")).collect()[0]["n"]
    assert abs(g - g_exact) / g_exact < 0.05
    # sketches are small binary payloads
    row = sk.select(F.length("sketch").alias("b")).agg(F.max("b")).collect()[0]
    assert row[0] < 50_000


def test_kmv_sketch_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from eland_spark.operators.sketches import (
        kmv_estimate, kmv_rollup_estimate, kmv_sketches,
    )

    # 4500 % 3 == 0, so each group holds exactly 1500 distinct values
    sdf = spark.range(9000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 4500).alias("v")
    )
    sk = kmv_sketches(sdf, "v", ["g"], k=256)
    per = {
        r["g"]: r["e"]
        for r in sk.select("g", kmv_estimate(F.col("kmv"), 256).alias("e")).collect()
    }
    for g, est in per.items():
        assert abs(est - 1500) / 1500 < 0.2, (g, est)
    glob = kmv_rollup_estimate(sk, [], k=256).collect()[0]["estimate"]
    assert abs(glob - 4500) / 4500 < 0.2, glob
    # below-K cardinality is EXACT
    small = spark.range(100).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    sk2 = kmv_sketches(small, "v", ["g"], k=256)
    exact = sk2.select(kmv_estimate(F.col("kmv"), 256).alias("e")).collect()[0]["e"]
    assert exact == 100
    # merge is lossless vs from-scratch: same sketch of the union
    from_scratch = kmv_sketches(
        sdf.select(F.lit(0).alias("g"), "v"), "v", ["g"], k=256
    ).select(kmv_estimate(F.col("kmv"), 256).alias("e")).collect()[0]["e"]
    assert glob == from_scratch


def test_sample_sketch_quantiles_and_merge(spark):
    from pyspark.sql import functions as F

    from eland_spark.operators.sketches import (
        quantile_from_sample, sample_rollup, sample_sketches,
    )

    sdf = spark.range(20000).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    sk = sample_sketches(sdf, "v", "rid", ["g"], k=512)
    per = sk.select("g", quantile_from_sample(F.col("sample"), 0.5).alias("p50"))
    for r in per.collect():
        assert abs(r["p50"] - 500) < 80, r  # ~1/sqrt(512) sampling error
    # merged == from-scratch sample of the union (same keys)
    merged = sample_rollup(sk, [], k=512).select(
        quantile_from_sample(F.col("sample"), 0.5).alias("p50")
    ).collect()[0]["p50"]
    scratch = sample_sketches(
        sdf.select(F.lit(0).alias("g"), "rid", "v"), "v", "rid", ["g"], k=512
    ).select(quantile_from_sample(F.col("sample"), 0.5).alias("p50")).collect()[0]["p50"]
    assert merged == scratch
    # below-K group: the quantile is EXACT
    small = spark.range(101).select(
        F.lit(0).alias("g"), F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"),
    )
    sk2 = sample_sketches(small, "v", "rid", ["g"], k=512)
    got = sk2.select(quantile_from_sample(F.col("sample"), 0.5).alias("p")).collect()[0]["p"]
    assert got == 50.0  # nearest-rank p50 of 0..100


def test_bloom_no_false_negatives_and_rollup(spark):
    from eland_spark.operators.sketches import (
        bloom_contains,
        bloom_fill_ratio,
        bloom_rollup,
        bloom_sketches,
    )

    rows = [(f"g{i % 3}", f"key_{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k string")
    sk = bloom_sketches(df, "k", ["g"], m_bits=4096, n_hashes=4).cache()

    # every inserted key must test positive in its own group
    res = bloom_contains(sk, df, "k", ["g"], m_bits=4096, n_hashes=4)
    assert res.filter(~F.col("contained")).count() == 0

    # absent keys: fpp must stay near the design bound (~fill^k)
    absent = spark.createDataFrame(
        [(f"g{i % 3}", f"nope_{i}") for i in range(300)], "g string, k string"
    )
    fp = (
        bloom_contains(sk, absent, "k", ["g"], m_bits=4096, n_hashes=4)
        .filter(F.col("contained"))
        .count()
    )
    assert fp <= 5  # 100 keys/group in 4096 bits, k=4 -> fpp << 1%

    # ADVICE r2: a NULL probe must surface as an explicit
    # contained=false row, not vanish from the output
    with_null = spark.createDataFrame(
        [("g0", "key_0"), ("g0", None)], "g string, k string"
    )
    nres = {
        r["item"]: r["contained"]
        for r in bloom_contains(
            sk, with_null, "k", ["g"], m_bits=4096, n_hashes=4
        ).collect()
    }
    assert nres == {"key_0": True, None: False}

    # fill ratio is the fpp observable
    fills = {r["g"]: r["fill_ratio"] for r in bloom_fill_ratio(sk, ["g"], 4096).collect()}
    assert all(0 < v < 0.15 for v in fills.values())

    # rollup by OR == from-scratch sketch of the union (lossless merge)
    merged = {
        (r["word"], r["bits"]) for r in bloom_rollup(sk, []).collect()
    }
    scratch = {
        (r["word"], r["bits"])
        for r in bloom_sketches(df, "k", [], m_bits=4096, n_hashes=4).collect()
    }
    assert merged == scratch


def test_bloom_membership_is_group_scoped(spark):
    from eland_spark.operators.sketches import bloom_contains, bloom_sketches

    df = spark.createDataFrame(
        [("a", "only_in_a"), ("b", "only_in_b")], "g string, k string"
    )
    sk = bloom_sketches(df, "k", ["g"], m_bits=4096, n_hashes=4)
    cross = spark.createDataFrame(
        [("a", "only_in_b"), ("b", "only_in_a"), ("a", "only_in_a")],
        "g string, k string",
    )
    got = {
        (r["g"], r["item"]): r["contained"]
        for r in bloom_contains(sk, cross, "k", ["g"], m_bits=4096, n_hashes=4).collect()
    }
    assert got[("a", "only_in_a")] is True
    assert got[("a", "only_in_b")] is False
    assert got[("b", "only_in_a")] is False


def test_bloom_plan_single_aggregation(spark):
    from eland_spark.operators.sketches import bloom_sketches

    df = spark.createDataFrame([("a", "x")], "g string, k string")
    plan = (
        bloom_sketches(df, "k", ["g"], m_bits=1024, n_hashes=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash aggregation pair (partial + final), no window/cartesian
    assert "CartesianProduct" not in plan and "Window" not in plan


def test_cms_one_sided_error_and_rollup(spark):
    """Count-min invariants: estimate >= true count for EVERY key
    (one-sided error, never an undercount), overshoot bounded by the
    depth/width contract on this data, and rollup-by-addition equals
    a from-scratch sketch of the union."""
    from pyspark.sql import functions as F

    from eland_spark.operators.sketches import (
        cms_estimate, cms_rollup, cms_sketches,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")

    sk = cms_sketches(toks, "tok", by=["source"], depth=4, width=256)
    truth = {
        (r["source"], r["tok"]): r["n"]
        for r in toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    probes = toks.select("source", "tok").distinct()
    est = {
        (r["source"], r["item"]): r["est"]
        for r in cms_estimate(
            sk, probes, "tok", by=["source"], depth=4, width=256
        ).collect()
    }
    n_total = sum(truth.values())
    assert est.keys() == truth.keys()
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)  # never undercounts
        # e*N/width bound (loose check: 3x the expected overshoot)
        assert est[k] - t <= max(10, 3 * 2.72 * n_total / 256), (k, est[k], t)

    # absent key estimates are bounded too (may be > 0 by collision)
    absent = spark.createDataFrame(
        [("src0", "zzqx_never_seen")], "source string, tok string"
    )
    a = cms_estimate(sk, absent, "tok", by=["source"], depth=4, width=256)
    assert a.collect()[0]["est"] >= 0

    # lossless merge: rollup to global == from-scratch global sketch
    glob = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_rollup(sk, by=[]).collect()
    }
    scratch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketches(toks, "tok", by=[], depth=4, width=256).collect()
    }
    assert glob == scratch


def test_cms_plan_single_build_aggregation(spark):
    """Scale pin: the sketch build is ONE hash aggregation over the
    exploded coordinates (map-side combinable — shuffle bounded by
    groups x depth x width); no window, no cartesian."""
    from pyspark.sql import functions as F

    from eland_spark.operators.sketches import cms_sketches
    from eland_spark.plans import shuffle_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    sk = cms_sketches(toks, "tok", by=["source"], depth=4, width=256)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert shuffle_count(sk) == 1, plan
