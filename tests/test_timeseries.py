"""time_bucket_gapfill differentials (vs pandas resample/reindex/ffill)
and plan-shape pins. Reference parity note: the reference only has
date_histogram-style downsampling (eland/query.py:195-211); the dense
calendar + fill is net-new (TimescaleDB time_bucket_gapfill
semantics)."""

import pandas as pd
import pytest

from eland_spark.operators.timeseries import time_bucket_gapfill


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _pandas_gapfill(pdf, step, fill):
    out = {}
    for key, g in pdf.groupby("event_type"):
        s = (
            g.set_index("ts")["value"]
            .resample(f"{step}s", origin="epoch")
            .mean()
        )
        # pandas resample already emits the dense range min..max
        if fill == "zero":
            s = s.fillna(0.0)
        elif fill == "locf":
            s = s.ffill()
        out[key] = s
    return out


@pytest.mark.parametrize("fill", ["null", "zero", "locf"])
def test_gapfill_matches_pandas_resample(spark, events, fill):
    pdf = events.select("ts", "event_type", "value").toPandas()
    exp = _pandas_gapfill(pdf, 3600, fill)

    got = time_bucket_gapfill(
        events, "ts", "value", 3600, by=["event_type"], agg="avg", fill=fill
    ).toPandas()
    for key, g in got.groupby("event_type"):
        e = exp[key]
        g = g.set_index("bucket")["value"].sort_index()
        assert list(g.index) == list(e.index), key
        for gv, ev in zip(g.tolist(), e.tolist()):
            if pd.isna(ev):
                assert gv is None or pd.isna(gv), (key, gv, ev)
            else:
                assert abs(gv - ev) < 1e-9, (key, gv, ev)


def test_gapfill_aggs_and_validation(spark, events):
    out = time_bucket_gapfill(
        events, "ts", "value", 7200, by=["event_type"], agg="count", fill="zero"
    ).toPandas()
    # count+zero: every bucket populated, totals preserved
    assert out["value"].notna().all()
    assert int(out["value"].sum()) == events.count()

    with pytest.raises(ValueError, match="fill"):
        time_bucket_gapfill(events, "ts", "value", 3600, fill="spline")
    with pytest.raises(ValueError, match="agg"):
        time_bucket_gapfill(events, "ts", "value", 3600, agg="median")


def test_gapfill_plan_shape(spark, events):
    """Scale pins: the raw table is scanned once; the LOCF window is
    keyed by the series (no SinglePartition window) and runs the
    unbounded-PRECEDING frame; no cartesian."""
    out = time_bucket_gapfill(
        events, "ts", "value", 3600, by=["event_type"], agg="avg", fill="locf"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, plan
    assert "unboundedpreceding" in plan.lower() and "following" not in plan.lower()
    from eland_spark.plans import shuffle_count

    assert shuffle_count(out) <= 4, plan


def test_gapfill_global_series(spark, events):
    """No by-columns: one global dense calendar."""
    out = time_bucket_gapfill(events, "ts", "value", 3600, fill="locf").toPandas()
    buckets = out["bucket"].sort_values().tolist()
    deltas = {(b - a).total_seconds() for a, b in zip(buckets, buckets[1:])}
    assert deltas == {3600.0}
    assert out["value"].notna().all()


def test_gapfill_interp_matches_pandas(spark, events):
    """fill='interp': linear interpolation between the surrounding
    observations, vs pandas resample().interpolate('linear')."""
    pdf = events.select("ts", "event_type", "value").toPandas()
    got = time_bucket_gapfill(
        events, "ts", "value", 3600, by=["event_type"], agg="avg",
        fill="interp",
    ).toPandas()
    for key, g in got.groupby("event_type"):
        e = (
            pdf[pdf["event_type"] == key]
            .set_index("ts")["value"]
            .resample("3600s", origin="epoch")
            .mean()
            .interpolate("linear")
        )
        g = g.set_index("bucket")["value"].sort_index()
        assert list(g.index) == list(e.index), key
        for gv, ev in zip(g.tolist(), e.tolist()):
            assert abs(gv - ev) < 1e-9, (key, gv, ev)


def test_gapfill_interp_plan_no_following_frame(spark, events):
    """Scale pin: the backward scan is a DESC running frame — the plan
    must contain NO unboundedfollowing frame (O(n^2)-per-partition in
    Spark) and no single-partition window."""
    out = time_bucket_gapfill(
        events, "ts", "value", 3600, by=["event_type"], agg="avg",
        fill="interp",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "unboundedfollowing" not in plan.lower(), plan
    assert "SinglePartition" not in plan, plan


def test_gapfill_fuzz_vs_pandas(spark):
    """Randomized gapfill differential: random (group, epoch, value)
    observations incl. null values and single-observation series, all
    three fills, vs pandas resample(origin='epoch')."""
    import random

    import numpy as np

    rng = random.Random(77)
    for trial in range(8):
        n = rng.randint(1, 60)
        rows = [
            (
                rng.choice(["g1", "g2", "g3"]),
                rng.randint(0, 3600 * 50),
                None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3),
            )
            for _ in range(n)
        ]
        pdf = pd.DataFrame(rows, columns=["g", "epoch", "v"])
        pdf["ts"] = pd.to_datetime(pdf["epoch"], unit="s")
        sdf = spark.createDataFrame(
            pdf[["g", "ts", "v"]], schema="g string, ts timestamp_ntz, v double"
        )
        for fill in ("null", "locf", "interp"):
            got = time_bucket_gapfill(
                sdf, "ts", "v", 3600, by=["g"], agg="avg", fill=fill
            ).toPandas()
            for key, gg in got.groupby("g"):
                sub = pdf[pdf["g"] == key]
                e = sub.set_index("ts")["v"].resample("3600s", origin="epoch").mean()
                # pandas resample spans min..max OBSERVATION buckets
                if fill == "locf":
                    e = e.ffill()
                elif fill == "interp":
                    e = e.interpolate("linear")
                    # pandas interpolate also extrapolates nothing but
                    # ffills trailing gaps after the last obs; gapfill
                    # falls back to the single surviving neighbor too
                gser = gg.set_index("bucket")["v"].sort_index()
                assert list(gser.index) == list(e.index), (trial, fill, key)
                for gv, ev in zip(gser.tolist(), e.tolist()):
                    if pd.isna(ev):
                        assert gv is None or pd.isna(gv), (trial, fill, key, gv, ev)
                    else:
                        assert abs(gv - ev) < 1e-9, (trial, fill, key, gv, ev)


def test_rolling_zscore_matches_pandas(spark):
    """rolling_zscore vs pandas: trailing frame of 20 excluding the
    current row == x.shift(1).rolling(20, min_periods).mean()/std()."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from eland_spark.operators.timeseries import rolling_zscore

    rng = np.random.RandomState(7)
    n = 300
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "grp": rng.randint(0, 3, n),
        "val": rng.randn(n).round(3),
    })
    # inject spikes and a null
    pdf.loc[50, "val"] = 40.0
    pdf.loc[123, "val"] = -35.0
    pdf.loc[60, "val"] = None

    sdf = spark.createDataFrame(pdf)
    got = (
        rolling_zscore(sdf, "val", ["id"], by="grp",
                       window=20, min_periods=5, threshold=3.0)
        .orderBy("id")
        .toPandas()
    )

    def ref(g):
        prev = g["val"].shift(1)
        mean = prev.rolling(20, min_periods=5).mean()
        std = prev.rolling(20, min_periods=5).std()
        cnt = prev.rolling(20, min_periods=1).count()
        z = (g["val"] - mean) / std
        z = z.where((cnt >= 5) & (std > 0)).round(6)
        return z

    want = (
        pdf.sort_values("id")
        .groupby("grp", group_keys=False)
        .apply(ref, include_groups=False)
        .sort_index()
    )
    got_z = got.sort_values("id")["zscore"].reset_index(drop=True)
    want_z = want.reset_index(drop=True)
    pd.testing.assert_series_equal(
        got_z, want_z, check_names=False, rtol=1e-6, atol=1e-9
    )
    flagged = set(got.loc[got["is_anomaly"], "id"])
    assert 50 in flagged and 123 in flagged
    # null value rows are never flagged
    assert 60 not in flagged


def test_time_weighted_avg_hand_case(spark):
    """LOCF weighting: v=10 holds for 30min, v=20 for 30min -> TWA 15
    regardless of the closing point's value; single-point bucket
    degenerates to the value."""
    import pandas as pd

    from eland_spark.operators.timeseries import time_weighted_avg

    pdf = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:30",
            "2024-01-01 01:00",  # closes the integral (weight 0)... but
            # lands in the NEXT 1h bucket, so in-bucket the closer is 00:30
            "2024-01-01 00:15",
        ]),
        "v": [10.0, 20.0, 99.0, 7.0],
    })
    sdf = spark.createDataFrame(pdf)
    got = {(r["k"], str(r["bucket"])): r["twa"]
           for r in time_weighted_avg(sdf, "v", "ts", by="k",
                                      bucket_seconds=3600).collect()}
    # bucket [00:00, 01:00): points 10@00:00 (weight 30min), 20@00:30
    # (weight 0, no successor in bucket) -> sum(vw)/sum(w) = 10
    assert got[("a", "2024-01-01 00:00:00")] == 10.0
    # the 01:00 point sits alone in its bucket -> plain value
    assert got[("a", "2024-01-01 01:00:00")] == 99.0
    assert got[("b", "2024-01-01 00:00:00")] == 7.0


def test_counter_rate_resets_and_bucket_crossing(spark):
    """Reset contributes the restarted value; the lag chain crosses
    bucket boundaries; a series' first point contributes nothing."""
    import pandas as pd

    from eland_spark.operators.timeseries import counter_rate

    pdf = pd.DataFrame({
        "k": ["a"] * 4,
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:30",
            "2024-01-01 01:10", "2024-01-01 01:40",
        ]),
        "v": [100.0, 150.0, 10.0, 40.0],  # 10.0 is a reset
    })
    sdf = spark.createDataFrame(pdf)
    got = {str(r["bucket"]): (r["increase"], r["rate_per_sec"])
           for r in counter_rate(sdf, "v", "ts", by="k",
                                 bucket_seconds=3600).collect()}
    # bucket 0: first point no delta, 150-100=50
    assert got["2024-01-01 00:00:00"][0] == 50.0
    # bucket 1: reset -> contributes v=10; then 40-10=30 -> 40
    assert got["2024-01-01 01:00:00"][0] == 40.0
    assert got["2024-01-01 01:00:00"][1] == round(40.0 / 3600, 6)


def test_rolling_zscore_global_no_single_partition_window(spark):
    """ADVICE r4: by=None must use the bucketed global-window plan —
    no SinglePartition exchange — and still match the keyed path's
    math (single constant key == global series)."""
    import pandas as pd

    from eland_spark.operators.timeseries import rolling_zscore

    rng_vals = [float(v) for v in range(1, 61)]
    rng_vals[40] = 500.0  # spike
    pdf = pd.DataFrame({"i": range(60), "v": rng_vals, "g": ["x"] * 60})
    sdf = spark.createDataFrame(pdf)

    glob = rolling_zscore(sdf, "v", ["i"], by=None, window=10,
                          min_periods=3).select("i", "zscore", "is_anomaly")
    keyed = rolling_zscore(sdf, "v", ["i"], by="g", window=10,
                           min_periods=3).select("i", "zscore", "is_anomaly")
    g = {r["i"]: (r["zscore"], r["is_anomaly"]) for r in glob.collect()}
    k = {r["i"]: (r["zscore"], r["is_anomaly"]) for r in keyed.collect()}
    assert g == k
    assert g[40][1] is True

    plan = glob._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_counter_rate_global_no_single_partition_window(spark):
    """counter_rate(by=None): bucketed global lag, no SinglePartition
    exchange, identical output to a single-key run."""
    import pandas as pd

    from eland_spark.operators.timeseries import counter_rate

    pdf = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:30",
            "2024-01-01 01:10", "2024-01-01 01:40",
            "2024-01-01 02:05",
        ]),
        "v": [100.0, 150.0, 10.0, 40.0, 90.0],
        "k": ["a"] * 5,
    })
    sdf = spark.createDataFrame(pdf)
    glob = counter_rate(sdf, "v", "ts", by=None, bucket_seconds=3600)
    got = {str(r["bucket"]): (r["increase"], r["rate_per_sec"])
           for r in glob.collect()}
    keyed = {str(r["bucket"]): (r["increase"], r["rate_per_sec"])
             for r in counter_rate(sdf, "v", "ts", by="k",
                                   bucket_seconds=3600).collect()}
    assert got == keyed
    assert got["2024-01-01 00:00:00"][0] == 50.0
    assert got["2024-01-01 01:00:00"][0] == 40.0
    assert got["2024-01-01 02:00:00"][0] == 50.0

    plan = glob._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
