"""interval_overlap_join: correctness vs the naive theta-join and the
no-nested-loop plan contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.frame import DataFrame as EDF
from eland_spark.operators.range_join import interval_overlap_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    ev = es.read_parquet(spark, f"{SF}/events.parquet").to_spark()
    mk = lambda t: ev.where(F.col("event_type") == t).select(
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    return mk("click"), mk("view")


def test_matches_naive_join(spark, sides):
    lsdf, rsdf = sides
    l = EDF(lsdf, index_cols=("event_id",))
    r = EDF(rsdf, index_cols=("event_id",))
    got = interval_overlap_join(l, r, "s", "e", "s", "e")
    gotp = {
        (x.event_id, x.event_id_right)
        for x in got.to_spark().select("event_id", "event_id_right").collect()
    }
    naive = (
        lsdf.alias("l")
        .join(
            rsdf.alias("r"),
            (F.col("l.s") <= F.col("r.e")) & (F.col("r.s") <= F.col("l.e")),
        )
        .select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
        .collect()
    )
    exp = {(x.a, x.b) for x in naive}
    assert gotp == exp
    assert len(gotp) > 0
    # exactly-once: the bucketized join emits no duplicate pairs
    rows = got.to_spark().count()
    assert rows == len(gotp)


def test_degenerate_and_custom_width(spark, sides):
    lsdf, _ = sides
    # zero-span intervals (s == e): overlap means exact timestamp equality
    pts = lsdf.select("event_id", F.col("s"), F.col("s").alias("e"))
    l = EDF(pts, index_cols=("event_id",))
    out = interval_overlap_join(l, l, "s", "e", "s", "e", suffixes=("", "_r"))
    n_self = out.to_spark().where(
        F.col("event_id") == F.col("event_id_r")
    ).count()
    assert n_self == pts.count()
    # custom width gives the identical pair set
    r = EDF(lsdf, index_cols=("event_id",))
    a = interval_overlap_join(r, r, "s", "e", "s", "e", suffixes=("", "_r"))
    b = interval_overlap_join(
        r, r, "s", "e", "s", "e", bucket_width=600.0, suffixes=("", "_r")
    )
    pa = {(x.event_id, x.event_id_r) for x in a.to_spark().collect()}
    pb = {(x.event_id, x.event_id_r) for x in b.to_spark().collect()}
    assert pa == pb


def test_no_nested_loop_in_plan(spark, sides):
    lsdf, rsdf = sides
    l = EDF(lsdf, index_cols=("event_id",))
    r = EDF(rsdf, index_cols=("event_id",))
    plan = (
        interval_overlap_join(l, r, "s", "e", "s", "e")
        .to_spark()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
