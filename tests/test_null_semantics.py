"""Null/NaN semantics parity — pandas AND the reference agree on these,
Spark's bare operators do not. Found by the composed-pipeline fuzzer.

- ``!=`` keeps null rows (pandas: NaN != x -> True; reference compiles
  to must_not term, and ES docs missing the field match a must_not —
  eland/series.py:541-552).
- sorts place nulls LAST by default (pandas na_position='last'; ES sort
  ``missing: _last``); Spark asc() is nulls-first.
- nlargest/nsmallest rank NaN rows last in both directions (fill-up
  only), never as extreme values.
- sort_values().head(n) selects the top-n of the USER sort, not the
  first-n by index (materialization still presents index order, the
  reference's SortIndexAction contract).
"""

import numpy as np
import pandas as pd
import pytest

from eland_spark.frame import DataFrame as EDF


@pytest.fixture(scope="module")
def frame(spark):
    pdf = pd.DataFrame(
        {
            "k": [0, 0, 1, 1, 2],
            "a": [5.0, None, 1.0, 3.0, None],
            "b": [1.0, 2.0, 3.0, 4.0, 5.0],
            "_id": [0, 1, 2, 3, 4],
        }
    )
    sdf = spark.createDataFrame(
        pdf, schema="k bigint, a double, b double, _id bigint"
    )
    return pdf.set_index("_id"), EDF(sdf, index_cols=("_id",))


def test_ne_keeps_null_rows(frame):
    pdf, edf = frame
    got = edf[edf["a"] != 3.0].to_pandas()
    exp = pdf[pdf["a"] != 3.0]
    # pandas: NaN != 3.0 -> True, so both null rows survive
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()) == [0, 1, 2, 4]


def test_ne_series_vs_series_null_rows(frame):
    pdf, edf = frame
    got = edf[edf["a"] != edf["b"]].to_pandas()
    exp = pdf[pdf["a"] != pdf["b"]]
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist())


def test_sort_values_nulls_last(frame):
    pdf, edf = frame
    got = edf.sort_values("a").to_spark().select("a").collect()
    vals = [r["a"] for r in got]
    assert vals[:3] == [1.0, 3.0, 5.0] and vals[3] is None and vals[4] is None
    desc = edf.sort_values("a", ascending=False).to_spark().select("a").collect()
    vals = [r["a"] for r in desc]
    assert vals[:3] == [5.0, 3.0, 1.0] and vals[3] is None
    first = (
        edf.sort_values("a", na_position="first").to_spark().select("a").collect()
    )
    assert first[0]["a"] is None and first[1]["a"] is None


def test_sorted_head_membership_follows_user_sort(frame):
    pdf, edf = frame
    got = edf.sort_values("a").head(2).to_pandas()
    exp = pdf.sort_values("a").head(2)
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()) == [2, 3]
    # tail = last-n of the user sort (the null rows)
    got = edf.sort_values("a").tail(2).to_pandas()
    exp = pdf.sort_values("a").tail(2)
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()) == [1, 4]
    # descending
    got = edf.sort_values("a", ascending=False).head(2).to_pandas()
    exp = pdf.sort_values("a", ascending=False).head(2)
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()) == [0, 3]
    # a later sort_index clears the user ordering
    got = edf.sort_values("a").sort_index().head(2).to_pandas()
    assert sorted(got["_id"].tolist()) == [0, 1]


def test_user_sort_survives_filter(frame):
    pdf, edf = frame
    got = edf.sort_values("a")[edf["b"] > 1.0].head(2).to_pandas()
    exp = pdf.sort_values("a")[pdf["b"] > 1.0].head(2)
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist())


def test_nlargest_nsmallest_nan_last(frame):
    pdf, edf = frame
    for fn in ("nlargest", "nsmallest"):
        got = getattr(edf, fn)(3, "a").to_pandas()
        exp = getattr(pdf, fn)(3, "a")
        assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()), fn
        # with n past the non-null count, NaN rows fill up — same sets
        got = getattr(edf, fn)(5, "a").to_pandas()
        exp = getattr(pdf, fn)(5, "a")
        assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist()), fn


def test_series_nlargest_nsmallest_nan_last(frame):
    pdf, edf = frame
    assert edf["a"].nsmallest(3).tolist()[:2] == [1.0, 3.0]
    assert edf["a"].nlargest(3).tolist()[:2] == [5.0, 3.0]
    # NaN only fills up; index labels match pandas
    assert list(edf["a"].nsmallest(5).index[:3]) == list(
        pdf["a"].nsmallest(5).index[:3]
    )


def test_series_sort_values_nulls_last(frame):
    pdf, edf = frame
    got = edf["a"].sort_values().to_pandas().tolist()
    assert got[:3] == [1.0, 3.0, 5.0] and all(np.isnan(x) for x in got[3:])


def test_invert_comparison_keeps_null_rows(frame):
    pdf, edf = frame
    got = edf[~(edf["a"] > 3.0)].to_pandas()
    exp = pdf[~(pdf["a"] > 3.0)]
    # pandas: (NaN > 3) is False, inverted True -> null rows kept
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist())
    assert 1 in got["_id"].tolist() and 4 in got["_id"].tolist()


def test_merge_matches_nan_keys_like_pandas(spark):
    left = pd.DataFrame({"k": [1.0, None], "x": [1, 2]})
    right = pd.DataFrame({"k": [None, 1.0], "y": [10, 20]})
    el = EDF(spark.createDataFrame(left, schema="k double, x bigint"))
    er = EDF(spark.createDataFrame(right, schema="k double, y bigint"))
    got = el.merge(er, on="k").to_pandas().sort_values("x")
    exp = left.merge(right, on="k").sort_values("x")
    assert len(got) == len(exp) == 2
    assert got["y"].tolist() == exp["y"].tolist() == [20, 10]
    # null-safe key still plans as an equi join, not a nested loop
    plan = (
        el.merge(er, on="k")
        .to_spark()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_merge_left_on_right_on_null_safe(spark):
    left = pd.DataFrame({"lk": [None, 2.0], "x": [1, 2]})
    right = pd.DataFrame({"rk": [None, 3.0], "y": [10, 20]})
    el = EDF(spark.createDataFrame(left, schema="lk double, x bigint"))
    er = EDF(spark.createDataFrame(right, schema="rk double, y bigint"))
    got = el.merge(er, left_on="lk", right_on="rk").to_pandas()
    exp = left.merge(right, left_on="lk", right_on="rk")
    assert len(got) == len(exp) == 1
    assert got["y"].tolist() == [10]


def test_merge_semi_anti_still_work(spark):
    left = pd.DataFrame({"k": [1.0, 2.0, None], "x": [1, 2, 3]})
    right = pd.DataFrame({"k": [2.0, None], "y": [10, 20]})
    el = EDF(spark.createDataFrame(left, schema="k double, x bigint"))
    er = EDF(spark.createDataFrame(right, schema="k double, y bigint"))
    semi = el.merge(er, on="k", how="left_semi").to_pandas()
    # null-safe: the NaN-keyed left row matches the NaN right row
    assert sorted(semi["x"].tolist()) == [2, 3]
    anti = el.merge(er, on="k", how="left_anti").to_pandas()
    assert anti["x"].tolist() == [1]
