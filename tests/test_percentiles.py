"""Sort-based distributed order statistics vs Spark's hash-map
percentile aggregate — must agree exactly (same linear interpolation)."""

import math

import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.percentiles import exact_percentiles

SF = "/root/testdata/sf0.001"


def test_matches_hash_agg_percentile(spark):
    li = es.read_parquet(spark, f"{SF}/lineitem.parquet").to_spark()
    ps = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    mine = exact_percentiles(li, "l_extendedprice", ps, partitions=8)
    ref = li.agg(
        F.percentile("l_extendedprice", F.array(*[F.lit(p) for p in ps]))
    ).collect()[0][0]
    assert all(abs(a - b) < 1e-9 for a, b in zip(mine, ref))


def test_empty_and_single_row(spark):
    li = es.read_parquet(spark, f"{SF}/lineitem.parquet").to_spark()
    empty = li.filter(F.col("l_quantity") > 1e12)
    out = exact_percentiles(empty, "l_quantity", [0.5], partitions=4)
    assert math.isnan(out[0])
    one = li.limit(1)
    v = one.collect()[0]["l_quantity"]
    out = exact_percentiles(one, "l_quantity", [0.0, 0.5, 1.0], partitions=4)
    assert out == [v, v, v]
