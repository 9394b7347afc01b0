"""merge_asof (as-of join) vs pandas on the events table, plus the
plan contract: union + ONE hash shuffle + fill-forward window, no
join node, no range-join candidate explosion."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.plans.inspect import shuffle_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    return es.read_parquet(spark, f"{SF}/events.parquet", index_col="event_id")


@pytest.fixture(scope="module")
def sides(ev):
    clicks = ev[ev["event_type"] == "click"]
    purch = ev[ev["event_type"] == "purchase"][["user_id", "ts", "value"]]
    return clicks, purch


@pytest.fixture(scope="module")
def pd_sides(ev):
    pdf = ev.to_pandas()
    pl = pdf[pdf.event_type == "click"].sort_values("ts")
    pr = pdf[pdf.event_type == "purchase"][["user_id", "ts", "value"]].sort_values(
        "ts"
    )
    return pl, pr


def _got(m):
    return (
        m.to_spark()
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)["value_right"]
    )


def _exp(pl, pr, **kw):
    return (
        pd.merge_asof(pl, pr, on="ts", by="user_id", suffixes=("", "_right"), **kw)
        .sort_values("event_id")
        .reset_index(drop=True)["value_right"]
    )


def _same(a, b):
    assert (a.isna() == b.isna()).all()
    assert (abs(a.fillna(0) - b.fillna(0)) < 1e-9).all()


def test_backward_matches_pandas(sides, pd_sides):
    clicks, purch = sides
    pl, pr = pd_sides
    a = _got(clicks.merge_asof(purch, on="ts", by="user_id"))
    _same(a, _exp(pl, pr))
    assert a.notna().sum() > 0


def test_forward_and_tolerance_match_pandas(sides, pd_sides):
    clicks, purch = sides
    pl, pr = pd_sides
    tol = pd.Timedelta("2h")
    a = _got(
        clicks.merge_asof(
            purch, on="ts", by="user_id", direction="forward", tolerance=tol
        )
    )
    _same(a, _exp(pl, pr, direction="forward", tolerance=tol))


def test_no_exact_matches(sides, pd_sides):
    clicks, purch = sides
    pl, pr = pd_sides
    a = _got(clicks.merge_asof(purch, on="ts", by="user_id", allow_exact_matches=False))
    _same(a, _exp(pl, pr, allow_exact_matches=False))


def test_plan_one_shuffle_no_join(sides):
    clicks, purch = sides
    out = clicks.merge_asof(purch, on="ts", by="user_id").to_spark()
    assert shuffle_count(out) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_nearest_matches_pandas(sides, pd_sides):
    clicks, purch = sides
    pl, pr = pd_sides
    a = _got(clicks.merge_asof(purch, on="ts", by="user_id", direction="nearest"))
    _same(a, _exp(pl, pr, direction="nearest"))


def test_nearest_tolerance_matches_pandas(sides, pd_sides):
    clicks, purch = sides
    pl, pr = pd_sides
    tol = pd.Timedelta(seconds=1800)
    a = _got(
        clicks.merge_asof(
            purch, on="ts", by="user_id", direction="nearest", tolerance=tol
        )
    )
    _same(a, _exp(pl, pr, direction="nearest", tolerance=tol))


def test_nearest_one_shuffle(sides):
    clicks, purch = sides
    out = clicks.merge_asof(
        purch, on="ts", by="user_id", direction="nearest"
    ).to_spark()
    assert shuffle_count(out) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_errors(sides):
    clicks, purch = sides
    with pytest.raises(ValueError, match="direction"):
        clicks.merge_asof(purch, on="ts", by="user_id", direction="sideways")
    with pytest.raises(KeyError, match="both sides"):
        clicks.merge_asof(purch, on="nope", by="user_id")


def test_suffix_collision_raises(spark, sides):
    clicks, purch = sides
    # right 'value' suffixes to 'value_x'; a left col with that name collides
    left = clicks.to_spark().withColumn("value_x", F.lit(1))
    from eland_spark.operators.asof import merge_asof

    with pytest.raises(ValueError, match="collide"):
        merge_asof(left, purch.to_spark(), on="ts", by="user_id", suffixes=("", "_x"))


def test_asof_matched_row_nulls_come_through(spark):
    """pandas merge_asof matches ROWS: when the matched right row has
    NaN in a value column, the result is NaN — never an older row's
    non-null value (r5 fix: the fill carries the last right row as one
    struct instead of per-column last-non-null)."""
    import numpy as np
    import pandas as pd

    from eland_spark.operators.asof import merge_asof

    lp = pd.DataFrame({"t": [5.0, 10.0]})
    rp = pd.DataFrame({"t": [1.0, 4.0], "v": [7.0, np.nan],
                       "u": [np.nan, 8.0]})
    for direction in ("backward", "nearest"):
        got = (merge_asof(spark.createDataFrame(lp),
                          spark.createDataFrame(rp),
                          on="t", direction=direction)
               .toPandas().sort_values("t").reset_index(drop=True))
        want = pd.merge_asof(lp, rp, on="t", direction=direction)
        pd.testing.assert_frame_equal(
            got[["t", "v", "u"]], want, check_dtype=False
        )
    # forward: left 0.5 matches right t=1 (v=7, u=NaN)
    lp2 = pd.DataFrame({"t": [0.5, 2.0]})
    got = (merge_asof(spark.createDataFrame(lp2),
                      spark.createDataFrame(rp),
                      on="t", direction="forward")
           .toPandas().sort_values("t").reset_index(drop=True))
    want = pd.merge_asof(lp2, rp, on="t", direction="forward")
    pd.testing.assert_frame_equal(got[["t", "v", "u"]], want,
                                  check_dtype=False)
