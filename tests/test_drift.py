"""Distribution-drift metrics (operators/drift.py) vs hand/scipy-style
computations."""

import math

import pandas as pd
import pytest

from eland_spark.operators.drift import drift_bins, psi


def _mk(spark, vals, col="v"):
    return spark.createDataFrame(pd.DataFrame({col: vals}))


def test_identical_distributions_zero_psi(spark):
    a = _mk(spark, [1.0, 2.0, 3.0, 11.0, 12.0] * 4)
    assert psi(a, a, "v", edges=[0, 10, 20]) == pytest.approx(0.0)


def test_psi_hand_computed(spark):
    ref = _mk(spark, [1.0] * 8 + [15.0] * 2)   # p = [0.8, 0.2]
    cur = _mk(spark, [1.0] * 5 + [15.0] * 5)   # q = [0.5, 0.5]
    got = psi(ref, cur, "v", edges=[0, 10, 20])
    want = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(0.2 / 0.5)
    # per-bin terms round to 6 before summing -> up to 1e-6 per bin
    assert got == pytest.approx(want, abs=2e-6)


def test_underflow_overflow_and_empty_bins(spark):
    ref = _mk(spark, [-5.0, 1.0, 99.0])   # bins -1, 0, overflow(1)
    cur = _mk(spark, [1.0, 1.0])
    rows = {r["bin"]: r for r in drift_bins(ref, cur, "v",
                                            edges=[0, 10]).collect()}
    assert set(rows) == {-1, 0, 1}
    assert rows[-1]["cur_frac"] == 0.0           # absent in cur
    # clamped-eps term is finite, not null/inf
    assert rows[-1]["psi_term"] is not None
    assert rows[1]["ref_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_categorical_mode_counts_nulls(spark):
    ref = _mk(spark, ["a", "a", "b", None])
    cur = _mk(spark, ["a", "c", None, None])
    rows = {r["bin"]: (r["ref_frac"], r["cur_frac"])
            for r in drift_bins(ref, cur, "v").collect()}
    assert rows["a"] == (0.5, 0.25)
    assert rows["b"] == (0.25, 0.0)
    assert rows["c"] == (0.0, 0.25)
    assert rows[None] == (0.25, 0.5)


def test_bad_edges_raise(spark):
    a = _mk(spark, [1.0])
    with pytest.raises(ValueError):
        drift_bins(a, a, "v", edges=[1, 1, 2])
    with pytest.raises(ValueError):
        drift_bins(a, a, "v", edges=[2, 1])
