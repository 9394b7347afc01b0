"""Bucketized range join (operators/range_join): semantics vs a naive
cross-filter, plan shape (no nested-loop/cartesian), timestamp path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def orders(spark):
    return es.read_parquet(
        spark, "/root/testdata/sf0.001/orders.parquet", index_col="o_orderkey"
    )


def _bands(spark):
    return es.DataFrame(
        spark.range(20).select(
            F.col("id").alias("tier"),
            (F.col("id") * 25000.0).alias("lo"),
            (F.col("id") * 25000.0 + 30000.0).alias("hi"),
        ),
        index_cols=("tier",),
    )


def test_range_join_matches_naive(spark, orders):
    out = range_join(orders[["o_totalprice"]], _bands(spark), "o_totalprice", "lo", "hi")
    got = out.to_spark().groupBy("tier").count().orderBy("tier").toPandas()
    pdf = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    b = pd.DataFrame({"tier": range(20)})
    b["lo"] = b.tier * 25000.0
    b["hi"] = b.lo + 30000.0
    cross = pdf.assign(k=1).merge(b.assign(k=1), on="k")
    ref = (
        cross[(cross.o_totalprice >= cross.lo) & (cross.o_totalprice <= cross.hi)]
        .groupby("tier")
        .size()
    )
    assert (got.set_index("tier")["count"] == ref).all()


def test_range_join_is_equi_join(spark, orders):
    out = range_join(orders[["o_totalprice"]], _bands(spark), "o_totalprice", "lo", "hi")
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_range_join_timestamps_and_explicit_width(spark):
    ev = es.read_parquet(
        spark, "/root/testdata/sf0.001/events.parquet", index_col="event_id"
    )
    tw = es.DataFrame(
        spark.sql(
            "select id as win, "
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id*6 as int),0,0) as t0, "
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id*6+8 as int),0,0) as t1 "
            "from range(10)"
        ),
        index_cols=("win",),
    )
    auto = range_join(ev[["ts"]], tw, "ts", "t0", "t1").to_spark().count()
    tight = (
        range_join(ev[["ts"]], tw, "ts", "t0", "t1", bucket_width=3600.0)
        .to_spark()
        .count()
    )
    assert auto == tight > 0
