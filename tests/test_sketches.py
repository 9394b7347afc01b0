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
