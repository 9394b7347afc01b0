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


def test_skew_safe_matches_fold(spark):
    """skew_safe=True (k-chained-min-agg, bounded per-user state) must
    produce identical summaries and chains to the fold on logs with
    ties, out-of-order users, and within gates."""
    from eland_spark.operators.funnel import funnel_chains

    ev = _ev(spark, [
        (1, "view", "2024-01-01 00:00"), (1, "click", "2024-01-01 01:00"),
        (1, "purchase", "2024-01-01 02:00"),
        (2, "click", "2024-01-01 00:00"), (2, "view", "2024-01-01 01:00"),
        # tie: click at the SAME timestamp as the anchoring view
        (3, "view", "2024-01-01 00:00"), (3, "click", "2024-01-01 00:00"),
        (4, "view", "2024-01-01 00:00"),
        (4, "click", "2024-01-02 05:00"),  # outside a 24h window
        (5, "purchase", "2024-01-01 00:00"),
    ])
    steps = ["view", "click", "purchase"]
    for within in (None, 86400):
        a = _summary(funnel(ev, steps, within_seconds=within))
        b = _summary(funnel(ev, steps, within_seconds=within,
                            skew_safe=True))
        assert a == b, within
        ca = sorted(map(tuple, funnel_chains(
            ev, steps, within_seconds=within).collect()))
        cb = sorted(map(tuple, funnel_chains(
            ev, steps, within_seconds=within, skew_safe=True).collect()))
        assert ca == cb, within


def test_skew_safe_hot_user_stress(spark):
    """A bot-grade hot user (1e6 step-typed events) runs through the
    skew_safe plan with O(1) agg state and matches the fold's summary
    computed on the same log."""
    from pyspark.sql import functions as F

    from eland_spark.operators.funnel import funnel

    base = dt.datetime(2024, 1, 1)
    # hot user 0: 10^6 alternating view/click events, one purchase
    hot = spark.range(1_000_000).select(
        F.lit(0).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "view").otherwise("click")
        .alias("event_type"),
        (F.lit(base).cast("timestamp_ntz")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
    )
    purchase = spark.createDataFrame(
        [(0, "purchase", base + dt.timedelta(seconds=999_999))],
        schema="user_id bigint, event_type string, ts timestamp_ntz",
    )
    normal = _ev(spark, [
        (1, "view", "2024-01-01 00:00"), (1, "click", "2024-01-01 01:00"),
        (2, "view", "2024-01-01 00:00"),
    ]).select("user_id", "event_type", F.col("ts").cast("timestamp_ntz"))
    ev = hot.unionByName(purchase).unionByName(normal)
    got = _summary(funnel(ev, ["view", "click", "purchase"],
                          skew_safe=True))
    assert got["view"] == (3, 1.0)
    assert got["click"] == (2, round(2 / 3, 6))
    assert got["purchase"] == (1, round(1 / 3, 6))


def test_skew_safe_repeated_steps_raise(spark):
    from eland_spark.operators.funnel import funnel

    ev = _ev(spark, [(1, "view", T0)])
    with pytest.raises(ValueError, match="distinct step types"):
        funnel(ev, ["view", "view"], skew_safe=True)
