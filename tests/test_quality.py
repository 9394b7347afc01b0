"""Data-quality verification (operators/quality.py) — Deequ-style
checks (Schelter et al., VLDB 2018). Correctness vs hand-computed
pandas, plan shape (ONE scan for all row-level metrics), and the
failure modes (dangling FKs, duplicate keys, null handling)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.quality import Check, profile, verify


@pytest.fixture(scope="module")
def toy(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "grp": ["a", "a", "b", "b", "c", None],
            "val": [1.0, 2.0, None, 4.0, 5.0, -1.0],
            "code": ["X1", "X2", "Y3", "X4", None, "X6"],
        }
    )
    return spark.createDataFrame(pdf)


def _as_dict(df):
    return {r["constraint"]: (r["metric"], r["passed"]) for r in df.collect()}


def test_row_level_metrics(toy):
    check = (
        Check("toy")
        .is_complete("grp", min_ratio=0.9)
        .is_complete("id")
        .has_min("val", 0.0)
        .has_max("val", 5.0)
        .has_mean("val", between=(2.0, 2.5))
        .has_size(between=(6, 6))
        .satisfies("val > 0", "positive_val", min_ratio=0.5)
        .has_pattern("code", "^X", min_ratio=0.6)
        .is_contained_in("grp", ["a", "b", "c"], min_ratio=0.8)
    )
    got = _as_dict(verify(toy, check))
    assert got["completeness(grp)"] == (round(5 / 6, 6), False)
    assert got["completeness(id)"] == (1.0, True)
    assert got["min(val)"] == (-1.0, False)
    assert got["max(val)"] == (5.0, True)
    # mean skips nulls: (1+2+4+5-1)/5 = 2.2
    assert got["mean(val)"] == (2.2, True)
    assert got["size()"] == (6.0, True)
    # val > 0 true for 4 of 6 (NULL and -1 count as non-compliant)
    assert got["compliance(positive_val)"] == (round(4 / 6, 6), True)
    # ^X matches 4 of 6 (NULL counts as non-matching)
    assert got["pattern(code)"] == (round(4 / 6, 6), True)
    # contained: 5 of 6 (the NULL grp is non-compliant)
    assert got["compliance(grp IN ('a', 'b', 'c'))"] == (round(5 / 6, 6), True)


def test_uniqueness_deequ_semantics(toy):
    # Deequ uniqueness = fraction of ROWS whose key occurs exactly once.
    # grp: a×2, b×2, c×1, NULL×1 → 2/6 unique rows.
    got = _as_dict(verify(toy, Check("u").is_unique("grp")))
    assert got["uniqueness(grp)"] == (round(2 / 6, 6), False)
    got = _as_dict(verify(toy, Check("u").is_unique("id")))
    assert got["uniqueness(id)"] == (1.0, True)


def test_referential_integrity(toy, spark):
    dim = spark.createDataFrame(pd.DataFrame({"g": ["a", "b"]}))
    got = _as_dict(
        verify(toy, Check("r").is_referenced_in("grp", dim, "g"))
    )
    # non-null FKs: a,a,b,b,c → 4/5 covered (NULL FK rows are excluded)
    assert got["referenced(grp -> g)"] == (0.8, False)
    got = _as_dict(
        verify(
            toy,
            Check("r").is_referenced_in("grp", dim, "g", min_ratio=0.75),
        )
    )
    assert got["referenced(grp -> g)"][1] is True


def test_all_null_column(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"x": [None, None]}), schema="x double"
    )
    got = _as_dict(
        verify(sdf, Check("n").is_complete("x").has_min("x", 0.0))
    )
    assert got["completeness(x)"] == (0.0, False)
    # min of an all-null column is NULL → metric NULL, passed False
    metric, passed = got["min(x)"]
    assert metric is None and passed is False


def test_empty_check_raises(toy):
    with pytest.raises(ValueError):
        verify(toy, Check("empty"))


def test_single_scan_for_row_level_metrics(toy):
    check = (
        Check("plan")
        .is_complete("grp")
        .has_min("val", 0.0)
        .has_max("val", 9.0)
        .has_size(between=(0, 10))
        .satisfies("val > 0", "p")
    )
    plan = verify(toy, check)._jdf.queryExecution().executedPlan().toString()
    # every row-level metric folds into ONE aggregation over ONE scan
    assert plan.count("HashAggregate") <= 2  # partial + final
    assert "Join" not in plan


def test_referential_is_broadcast(lineitem, orders):
    li = lineitem.to_spark()
    od = orders.to_spark()
    check = Check("ri").is_referenced_in("l_orderkey", od, "o_orderkey")
    plan = verify(li, check)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_profile_matches_pandas(toy):
    got = {r["column"]: r.asDict() for r in profile(toy, ["val", "code"]).collect()}
    v = got["val"]
    assert v["dtype"] == "double"
    assert v["completeness"] == round(5 / 6, 6)
    assert v["n_distinct"] == 5
    assert v["min_value"] == "-1.0" and v["max_value"] == "5.0"
    assert v["mean"] == 2.2 and v["avg_len"] is None
    c = got["code"]
    assert c["dtype"] == "string"
    assert c["n_distinct"] == 5
    assert c["mean"] is None and c["avg_len"] == 2.0


def test_profile_approx_variant(toy):
    got = {r["column"]: r.asDict()
           for r in profile(toy, ["grp"], approx_distinct=True).collect()}
    # HLL on 3 distinct values is exact at this cardinality
    assert got["grp"]["n_distinct"] == 3
