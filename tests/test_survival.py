"""Kaplan-Meier product-limit estimator vs a pure-python reference
(lifelines semantics: at-risk counts include same-time leavers,
censor-only times keep their row, survival clamps to exactly 0 when
the at-risk set dies out)."""

import pandas as pd
import pytest

from eland_spark.operators.survival import kaplan_meier


def _hand_km(rows):
    """rows: (duration, observed). Returns {t: (n_risk, d, c, S)}."""
    from collections import Counter

    deaths = Counter()
    cens = Counter()
    for t, e in rows:
        (deaths if e else cens)[t] += 1
    times = sorted(set(deaths) | set(cens))
    n = len(rows)
    out = {}
    s = 1.0
    dead = False
    for t in times:
        d, c = deaths[t], cens[t]
        if d:
            if d == n:
                dead = True
            s *= 1.0 - d / n
        out[t] = (n, d, c, 0.0 if dead else round(s, 6))
        n -= d + c
    return out


def test_km_classic_example(spark):
    # the textbook 6-subject example: deaths at 1, 3, 5; censored 2, 4, 6
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1), (6, 0)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["t", "e"])
    )
    got = {
        r["t"]: (r["n_risk"], r["n_event"], r["n_censored"], r["survival"])
        for r in kaplan_meier(sdf, "t", "e").collect()
    }
    want = _hand_km(rows)
    assert got == want
    # spot-check against the analytic values
    assert got[1][3] == round(5 / 6, 6)
    assert got[3][3] == round((5 / 6) * (3 / 4), 6)
    assert got[5][3] == round((5 / 6) * (3 / 4) * (1 / 2), 6)


def test_km_ties_and_zero_clamp(spark):
    # everyone dies at t=2 after one censor at t=1: survival hits
    # exactly 0.0 (log-space pole guarded), and stays 0
    rows = [(1, 0), (2, 1), (2, 1), (2, 1)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["t", "e"]))
    got = {
        r["t"]: (r["n_risk"], r["n_event"], r["survival"])
        for r in kaplan_meier(sdf, "t", "e").collect()
    }
    assert got[1] == (4, 0, 1.0)
    assert got[2] == (3, 3, 0.0)


def test_km_groups_and_nulls(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", None],
            "t": [1.0, 2.0, None, 1.0, 2.0, 1.0],
            "e": [1, 0, 1, 1, 1, 1],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = kaplan_meier(sdf, "t", "e", ["g"]).toPandas()
    # null duration dropped; null group kept as its own group
    a = out[out.g == "a"].set_index("t")
    assert a.loc[1.0, "survival"] == 0.5
    assert a.loc[2.0, "n_risk"] == 1 and a.loc[2.0, "n_censored"] == 1
    assert a.loc[2.0, "survival"] == 0.5  # censoring doesn't move S
    b = out[out.g == "b"].set_index("t")
    assert b.loc[1.0, "survival"] == 0.5
    assert b.loc[2.0, "survival"] == 0.0
    null_g = out[out.g.isna()]
    assert len(null_g) == 1 and null_g.iloc[0]["survival"] == 0.0


def test_km_fuzz_vs_reference(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 8), rng.randint(0, 1)) for _ in range(200)
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["t", "e"]))
    got = {
        r["t"]: (r["n_risk"], r["n_event"], r["n_censored"], r["survival"])
        for r in kaplan_meier(sdf, "t", "e").collect()
    }
    want = _hand_km(rows)
    assert set(got) == set(want)
    for t in want:
        assert got[t][:3] == want[t][:3], t
        assert got[t][3] == pytest.approx(want[t][3], abs=1.5e-6), t
