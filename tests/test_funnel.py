"""Event-sequence analytics (operators/funnel.py): greedy-funnel
semantics on hand-crafted event logs, cohort retention vs hand counts."""

import datetime as dt

import pandas as pd
import pytest

from eland_spark.operators.funnel import cohort_retention, funnel


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def _summary(df):
    return {r["step"]: (r["n_users"], r["conversion"]) for r in df.collect()}


T0 = "2024-01-01 00:00:00"


def test_greedy_chain_order_matters(spark):
    ev = _ev(spark, [
        # u1 completes in order
        (1, "view", "2024-01-01 00:00"), (1, "click", "2024-01-01 01:00"),
        (1, "purchase", "2024-01-01 02:00"),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", "2024-01-01 00:00"), (2, "view", "2024-01-01 01:00"),
        # u3 never views: not in the funnel at all
        (3, "click", "2024-01-01 00:00"), (3, "purchase", "2024-01-01 01:00"),
    ])
    got = _summary(funnel(ev, ["view", "click", "purchase"]))
    assert got["view"] == (2, 1.0)
    assert got["click"] == (1, 0.5)
    assert got["purchase"] == (1, 0.5)


def test_tie_at_same_timestamp_counts(spark):
    # click at exactly the view's timestamp satisfies ts >= t1
    ev = _ev(spark, [
        (1, "view", T0), (1, "click", T0),
    ])
    got = _summary(funnel(ev, ["view", "click"]))
    assert got["click"] == (1, 1.0)


def test_earliest_first_event_is_the_anchor(spark):
    # u1 views at 00:00 and again at 10:00; click at 05:00 counts
    # against the EARLIEST view (min-chain), not the latest
    ev = _ev(spark, [
        (1, "view", "2024-01-01 00:00"), (1, "view", "2024-01-01 10:00"),
        (1, "click", "2024-01-01 05:00"),
    ])
    got = _summary(funnel(ev, ["view", "click"]))
    assert got["click"] == (1, 1.0)


def test_within_window(spark):
    ev = _ev(spark, [
        (1, "view", "2024-01-01 00:00"), (1, "click", "2024-01-01 01:00"),
        (2, "view", "2024-01-01 00:00"), (2, "click", "2024-01-03 00:00"),
    ])
    got = _summary(funnel(ev, ["view", "click"], within_seconds=86400))
    assert got["view"] == (2, 1.0)
    assert got["click"] == (1, 0.5)


def test_repeated_step_consumes_distinct_events(spark):
    ev = _ev(spark, [
        (1, "view", "2024-01-01 00:00"), (1, "view", "2024-01-01 01:00"),
        (2, "view", "2024-01-01 00:00"),
    ])
    got = {r["step_index"]: (r["n_users"], r["conversion"])
           for r in funnel(ev, ["view", "view"]).collect()}
    assert got == {1: (2, 1.0), 2: (1, 0.5)}


def test_empty_steps_raises(spark):
    ev = _ev(spark, [(1, "view", T0)])
    with pytest.raises(ValueError):
        funnel(ev, [])


def test_cohort_retention_hand_counts(spark):
    day = 24 * 3600
    ev = _ev(spark, [
        # u1 first on day 0, active day 0 and day 2
        (1, "view", "2024-01-01 05:00"), (1, "click", "2024-01-03 05:00"),
        # u2 first on day 0, active only day 0 (two events, one cell)
        (2, "view", "2024-01-01 01:00"), (2, "view", "2024-01-01 02:00"),
        # u3 first on day 1
        (3, "view", "2024-01-02 01:00"),
    ])
    got = {
        (r["cohort_start"], r["period_number"]): r["n_active"]
        for r in cohort_retention(ev, period_seconds=day).collect()
    }
    d0 = dt.datetime(2024, 1, 1)
    d1 = dt.datetime(2024, 1, 2)
    assert got == {(d0, 0): 2, (d0, 2): 1, (d1, 0): 1}
