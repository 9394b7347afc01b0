"""Z-order clustering (operators/zorder.py): Morton interleave
exactness vs a Python bit-twiddling reference, degenerate/null/NaN
bucket edges, and the actual layout property — per-partition spans
shrink on EVERY clustered column (single-column layouts only shrink
the sort key's)."""

import statistics

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.zorder import _bucket, zorder_layout, zvalue


def _morton2(x, y, bits):
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_bit_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], 4).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y, 4), (x, y)


def test_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (None,), (float("nan",),),
         (float("inf"),), (-5.0,), (200.0,)],
        "v double",
    )
    got = [
        r["b"]
        for r in df.select(_bucket(F.col("v"), 0.0, 100.0, 4).alias("b")).collect()
    ]
    # 0 -> 0, 50 -> 8 (round(7.5) HALF_UP), 100 -> 15, null/NaN -> 0,
    # inf -> clamps to 15, out-of-range clamps
    assert got == [0, 8, 15, 0, 0, 15, 0, 15]
    # degenerate bounds: everything in bucket 0
    z = df.select(_bucket(F.col("v"), 7.0, 7.0, 4).alias("b")).collect()
    assert all(r["b"] == 0 for r in z)


def test_zorder_layout_shrinks_both_dims(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    out = zorder_layout(li, ["l_partkey", "l_suppkey"], bits=8, partitions=8)
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("ps"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("ss"),
        )
        .collect()
    )
    g = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("gp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("gs"),
    ).collect()[0]
    frac_p = statistics.mean(r["ps"] for r in spans) / g["gp"]
    frac_s = statistics.mean(r["ss"] for r in spans) / g["gs"]
    # both dims cluster (a single-column sort leaves the other at ~1.0)
    assert frac_p < 0.8 and frac_s < 0.8, (frac_p, frac_s)
    # zcol dropped by default
    assert "__z__" not in out.columns


def test_zorder_layout_keeps_all_rows(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = zorder_layout(li, ["l_partkey", "l_suppkey"], bits=6, partitions=4)
    assert out.count() == li.count()
    assert set(out.columns) == set(li.columns)
