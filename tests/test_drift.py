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


# --- ks_statistic ----------------------------------------------------------

import numpy as np  # noqa: E402

from eland_spark.operators.drift import chi2_association, ks_statistic  # noqa: E402


def _ref_ks(a, b):
    a, b = np.sort(np.asarray(a, float)), np.sort(np.asarray(b, float))
    grid = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


def test_ks_matches_reference(spark):
    rng = np.random.RandomState(5)
    a = list(rng.normal(0, 1, 300).round(2))   # rounding -> value ties
    b = list(rng.normal(0.4, 1.3, 200).round(2))
    row = ks_statistic(_mk(spark, a), _mk(spark, b), "v").collect()[0]
    assert row["ks"] == pytest.approx(_ref_ks(a, b), abs=1e-6)
    assert row["n_ref"] == 300 and row["n_cur"] == 200


def test_ks_identical_zero_disjoint_one(spark):
    a = _mk(spark, [1.0, 2.0, 3.0] * 10)
    assert ks_statistic(a, a, "v").collect()[0]["ks"] == 0.0
    lo = _mk(spark, [1.0, 2.0, 3.0])
    hi = _mk(spark, [10.0, 11.0])
    assert ks_statistic(lo, hi, "v").collect()[0]["ks"] == 1.0


def test_ks_drops_nulls(spark):
    a = _mk(spark, [1.0, None, 2.0])
    b = _mk(spark, [1.0, 2.0, None, None])
    row = ks_statistic(a, b, "v").collect()[0]
    assert row["n_ref"] == 2 and row["n_cur"] == 2 and row["ks"] == 0.0


# --- chi2_association ------------------------------------------------------

def _ref_chi2(a, b):
    """Dense-contingency chi2/V/MI reference (includes zero cells)."""
    import math
    cats_a, cats_b = sorted(set(a)), sorted(set(b))
    n = len(a)
    obs = {(x, y): 0 for x in cats_a for y in cats_b}
    for x, y in zip(a, b):
        obs[(x, y)] += 1
    ra = {x: sum(obs[(x, y)] for y in cats_b) for x in cats_a}
    cb = {y: sum(obs[(x, y)] for x in cats_a) for y in cats_b}
    chi2 = sum(
        (obs[(x, y)] - ra[x] * cb[y] / n) ** 2 / (ra[x] * cb[y] / n)
        for x in cats_a for y in cats_b
    )
    mi = sum(
        (o / n) * math.log(o * n / (ra[x] * cb[y]))
        for (x, y), o in obs.items() if o > 0
    )
    mindim = min(len(cats_a) - 1, len(cats_b) - 1)
    v = math.sqrt(chi2 / (n * mindim)) if mindim > 0 else None
    return chi2, (len(cats_a) - 1) * (len(cats_b) - 1), v, mi


def test_chi2_matches_dense_reference(spark):
    rng = np.random.RandomState(9)
    a = [f"a{x}" for x in rng.randint(0, 5, 400)]
    # dependent: b often tracks a, creating real association + zero cells
    b = [
        f"b{x[1]}" if rng.rand() < 0.5 else f"b{rng.randint(0, 3)}"
        for x in a
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b}), schema="a string, b string"
    )
    row = chi2_association(sdf, "a", "b").collect()[0]
    chi2, dof, v, mi = _ref_chi2(a, b)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert row["dof"] == dof and row["n"] == 400
    assert row["cramers_v"] == pytest.approx(v, abs=1e-6)
    assert row["mutual_info"] == pytest.approx(mi, abs=1e-6)


def test_chi2_independent_uniformish(spark):
    # perfectly balanced independent columns -> chi2 == 0, MI == 0
    a = ["x", "x", "y", "y"] * 25
    b = ["u", "v", "u", "v"] * 25
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b}), schema="a string, b string"
    )
    row = chi2_association(sdf, "a", "b").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["mutual_info"] == pytest.approx(0.0, abs=1e-9)
    assert row["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_chi2_constant_column_null_v(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": ["x"] * 6, "b": ["u", "v"] * 3}),
        schema="a string, b string",
    )
    row = chi2_association(sdf, "a", "b").collect()[0]
    assert row["dof"] == 0 and row["cramers_v"] is None
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)


# --- welch_ttest -----------------------------------------------------------

from eland_spark.operators.drift import mann_whitney_u, welch_ttest  # noqa: E402


def test_welch_matches_reference(spark):
    rng = np.random.RandomState(13)
    a = list(rng.normal(10, 2, 250))
    b = list(rng.normal(10.5, 3, 180))
    row = welch_ttest(_mk(spark, a), _mk(spark, b), "v").collect()[0]
    v1, v2 = np.var(a, ddof=1), np.var(b, ddof=1)
    n1, n2 = len(a), len(b)
    se = v1 / n1 + v2 / n2
    want_t = (np.mean(a) - np.mean(b)) / np.sqrt(se)
    want_df = se ** 2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert row["t"] == pytest.approx(want_t, abs=1e-5)
    assert row["df"] == pytest.approx(want_df, rel=1e-6)
    assert row["mean_ref"] == pytest.approx(np.mean(a), abs=1e-5)
    assert row["n_ref"] == n1 and row["n_cur"] == n2


def test_welch_degenerate_null(spark):
    # single observation on one side, and both-constant inputs
    row = welch_ttest(_mk(spark, [1.0]), _mk(spark, [2.0, 3.0]),
                      "v").collect()[0]
    assert row["t"] is None and row["df"] is None
    row = welch_ttest(_mk(spark, [5.0] * 4), _mk(spark, [5.0] * 4),
                      "v").collect()[0]
    assert row["t"] is None  # zero pooled standard error


# --- mann_whitney_u --------------------------------------------------------

def _ref_mwu(a, b):
    """Midrank U + tie-corrected z, pure python."""
    vals = sorted(a + b)
    # midrank per distinct value
    mid, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid[vals[i]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = len(a), len(b)
    r1 = sum(mid[x] for x in a)
    u = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter
    ties = sum(t ** 3 - t for t in Counter(vals).values())
    nn = n1 + n2
    var = (n1 * n2 / 12.0) * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u - n1 * n2 / 2.0) / var ** 0.5 if var > 0 else None
    return u, z


def test_mwu_matches_reference_with_ties(spark):
    rng = np.random.RandomState(17)
    a = list(rng.randint(0, 12, 220).astype(float))  # heavy ties
    b = list((rng.randint(0, 12, 160) + rng.rand(160).round()).astype(float))
    row = mann_whitney_u(_mk(spark, a), _mk(spark, b), "v").collect()[0]
    want_u, want_z = _ref_mwu(a, b)
    assert row["u"] == pytest.approx(want_u, abs=1e-9)
    assert row["z"] == pytest.approx(want_z, abs=1e-6)
    assert row["n_ref"] == 220 and row["n_cur"] == 160


def test_mwu_edges(spark):
    # all values tied -> u defined, z null (zero variance)
    row = mann_whitney_u(_mk(spark, [3.0] * 5), _mk(spark, [3.0] * 7),
                         "v").collect()[0]
    assert row["u"] == pytest.approx(5 * 7 / 2.0) and row["z"] is None
    # disjoint, ref all larger: u = n1*n2
    row = mann_whitney_u(_mk(spark, [10.0, 11.0]), _mk(spark, [1.0, 2.0, 3.0]),
                         "v").collect()[0]
    assert row["u"] == 6.0 and row["z"] > 0


# --- linear_fit --------------------------------------------------------------

def test_linear_fit_matches_numpy(spark):
    from eland_spark.operators.timeseries import linear_fit

    rng = np.random.RandomState(41)
    x = rng.uniform(0, 100, 300)
    y = 3.5 * x - 12.0 + rng.normal(0, 5, 300)
    pdf = pd.DataFrame({"x": x, "y": y})
    row = linear_fit(spark.createDataFrame(pdf), "x", "y").collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    ss_res = np.sum((y - (slope * x + intercept)) ** 2)
    r2 = 1 - ss_res / np.sum((y - y.mean()) ** 2)
    assert row["slope"] == pytest.approx(slope, rel=1e-9)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert row["r2"] == pytest.approx(r2, rel=1e-9)
    assert row["n"] == 300


def test_linear_fit_groups_and_edges(spark):
    from eland_spark.operators.timeseries import linear_fit

    pdf = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "x": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0],  # b: constant x
        "y": [2.0, 4.0, 6.0, 8.0, 1.0, 2.0, 3.0],
    })
    rows = {r["g"]: r for r in
            linear_fit(spark.createDataFrame(pdf), "x", "y",
                       by=["g"]).collect()}
    assert rows["a"]["slope"] == pytest.approx(2.0)
    assert rows["a"]["intercept"] == pytest.approx(0.0, abs=1e-12)
    assert rows["a"]["r2"] == pytest.approx(1.0)
    assert rows["b"]["slope"] is None  # constant x: undefined
    # null pairs dropped
    pdf2 = pd.DataFrame({"x": [1.0, None, 3.0], "y": [1.0, 2.0, None]})
    row = linear_fit(
        spark.createDataFrame(pdf2, schema="x double, y double"), "x", "y"
    ).collect()[0]
    assert row["n"] == 1 and row["slope"] is None


def test_two_sample_tests_drop_nan_like_missing(spark):
    """NaN is missing, not a value: Spark normalizes NaN == NaN in
    grouping/joins, so without an explicit filter the two-sample tests
    and rank transforms would rank NaN as the largest value — pandas/
    scipy drop it. Pinned across ks/welch/mwu/spearman/rank_transform."""
    from eland_spark.operators.drift import (
        ks_statistic, mann_whitney_u, welch_ttest,
    )
    from eland_spark.operators.ranking import spearman_corr
    from eland_spark.operators.scaling import rank_transform

    nan = float("nan")
    a = _mk(spark, [1.0, 2.0, 3.0, nan, nan])
    b = _mk(spark, [1.0, 2.0, 3.0])
    assert ks_statistic(a, b, "v").collect()[0].asDict() == {
        "ks": 0.0, "n_ref": 3, "n_cur": 3,
    }
    row = welch_ttest(a, b, "v").collect()[0]
    assert row["n_ref"] == 3 and row["mean_ref"] == pytest.approx(2.0)
    row = mann_whitney_u(a, b, "v").collect()[0]
    assert row["n_ref"] == 3 and row["u"] == pytest.approx(4.5)

    pdf = pd.DataFrame({"x": [1.0, 2.0, nan, 4.0],
                        "y": [2.0, 4.0, 6.0, 8.0]})
    sdf = spark.createDataFrame(pdf, schema="x double, y double")
    row = spearman_corr(sdf, "x", "y").collect()[0]
    assert row["n"] == 3 and row["rho"] == 1.0

    rt = rank_transform(sdf, "x").orderBy("y").collect()
    qs = [r["x_q"] for r in rt]
    assert qs[2] is None  # the NaN row stays missing
    assert qs[0] == pytest.approx(1 / 3) and qs[3] == pytest.approx(1.0)


def test_rank_scorecard_matches_standalone_tests(spark):
    """rank_scorecard's (ks, u, z) must equal ks_statistic +
    mann_whitney_u run separately — same data, same semantics, one
    pass. Random heavy-tie data plus the degenerate edges."""
    import numpy as np

    from eland_spark.operators.drift import (
        ks_statistic, mann_whitney_u, rank_scorecard,
    )

    rng = np.random.RandomState(31)
    nan = float("nan")
    cases = [
        # heavy ties (11 distinct values, unequal sizes)
        (list(rng.randint(0, 11, 300) / 10.0),
         list(rng.randint(2, 13, 211) / 10.0)),
        # continuous, shifted
        (list(rng.normal(0, 1, 97)), list(rng.normal(0.4, 1.3, 143))),
        # nulls/NaN dropped
        ([1.0, 2.0, nan, 3.0, None], [1.0, 2.0, 3.0]),
        # all tied across both sides
        ([5.0] * 8, [5.0] * 5),
    ]
    for vals_r, vals_c in cases:
        a, b = _mk(spark, vals_r), _mk(spark, vals_c)
        got = rank_scorecard(a, b, "v").collect()[0].asDict()
        ks = ks_statistic(a, b, "v").collect()[0].asDict()
        mw = mann_whitney_u(a, b, "v").collect()[0].asDict()
        assert got["ks"] == ks["ks"]
        assert got["n_ref"] == ks["n_ref"] == mw["n_ref"]
        assert got["n_cur"] == ks["n_cur"] == mw["n_cur"]
        for k in ("u", "z"):
            if mw[k] is None:
                assert got[k] is None, (k, got, mw)
            else:
                assert got[k] == pytest.approx(mw[k], rel=1e-12), (k, got, mw)


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence (r7)
# ---------------------------------------------------------------------------

def _hand_js(p_counts, q_counts):
    import math

    rt, ct = sum(p_counts), sum(q_counts)
    js = 0.0
    for rn, cn in zip(p_counts, q_counts):
        p, q = rn / rt, cn / ct
        m = (p + q) / 2.0
        if rn > 0:
            js += p * math.log(p / m) / 2.0
        if cn > 0:
            js += q * math.log(q / m) / 2.0
    return js


def test_js_divergence_categorical_matches_hand(spark):
    from eland_spark.operators.drift import js_divergence

    ref = spark.createDataFrame(
        pd.DataFrame({"x": ["a"] * 50 + ["b"] * 30 + ["c"] * 20})
    )
    cur = spark.createDataFrame(
        pd.DataFrame({"x": ["a"] * 20 + ["b"] * 30 + ["d"] * 50})
    )
    row = js_divergence(ref, cur, "x").toPandas().iloc[0]
    want = _hand_js([50, 30, 20, 0], [20, 30, 0, 50])
    assert row["js"] == pytest.approx(want, abs=1e-6)
    assert row["js_distance"] == pytest.approx(
        (want / math.log(2)) ** 0.5, abs=1e-6
    )
    assert row["n_ref"] == 100 and row["n_cur"] == 100


def test_js_divergence_bounds_and_identity(spark):
    import math

    from eland_spark.operators.drift import js_divergence

    same = spark.createDataFrame(pd.DataFrame({"x": ["a", "b", "b"]}))
    row = js_divergence(same, same, "x").toPandas().iloc[0]
    assert row["js"] == pytest.approx(0.0, abs=1e-9)
    # disjoint supports -> exactly ln 2 (the maximum)
    a = spark.createDataFrame(pd.DataFrame({"x": ["a"] * 10}))
    b = spark.createDataFrame(pd.DataFrame({"x": ["b"] * 7}))
    row2 = js_divergence(a, b, "x").toPandas().iloc[0]
    assert row2["js"] == pytest.approx(math.log(2), abs=1e-6)
    assert row2["js_distance"] == pytest.approx(1.0, abs=1e-6)


def test_js_divergence_numeric_edges_drops_nulls(spark):
    from eland_spark.operators.drift import js_divergence

    ref = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0, 3.0, None, 11.0]})
    )
    cur = spark.createDataFrame(pd.DataFrame({"x": [2.5, 2.6, None, -5.0]}))
    row = js_divergence(ref, cur, "x", edges=[0.0, 2.0, 10.0]).toPandas().iloc[0]
    # ref bins: [1]->0, [2,3]->1, [11]->2 ; cur: [2.5,2.6]->1, [-5]->-1
    want = _hand_js([0, 1, 2, 1], [1, 0, 2, 0])
    assert row["js"] == pytest.approx(want, abs=1e-6)
    assert row["n_ref"] == 4 and row["n_cur"] == 3


def test_js_divergence_empty_side_is_null(spark):
    from eland_spark.operators.drift import js_divergence

    ref = spark.createDataFrame(pd.DataFrame({"x": ["a", "b"]}))
    cur = spark.createDataFrame(
        pd.DataFrame({"x": pd.array([], dtype="string")}),
        schema="x string",
    )
    row = js_divergence(ref, cur, "x").toPandas().iloc[0]
    assert pd.isna(row["js"]) and pd.isna(row["js_distance"])
    assert row["n_ref"] == 2 and row["n_cur"] == 0


# ---------------------------------------------------------------------------
# keyed KS battery + Kolmogorov p-value + BH FDR (r7)
# ---------------------------------------------------------------------------

def _hand_ks2(a, b):
    import numpy as np

    vals = np.unique(np.r_[a, b])
    ra = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    rb = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    return float(np.abs(ra - rb).max())


def _hand_kolmogorov_q(lam, terms=20):
    s = sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, terms + 1)
    )
    return min(max(2 * s, 0.0), 1.0)


def test_kolmogorov_pvalue_known_values(spark):
    from pyspark.sql import functions as F

    from eland_spark.operators.drift import kolmogorov_pvalue

    df = spark.createDataFrame(pd.DataFrame({"lam": [0.5, 1.0, 2.0]}))
    got = {
        r["lam"]: r["q"]
        for r in df.select(
            "lam", kolmogorov_pvalue("lam").alias("q")
        ).collect()
    }
    # scipy.special.kolmogorov reference values
    assert got[0.5] == pytest.approx(0.9639452436648751, abs=1e-12)
    assert got[1.0] == pytest.approx(0.26999967167735456, abs=1e-12)
    assert got[2.0] == pytest.approx(0.0006709252557797245, abs=1e-12)


def test_ks_battery_matches_per_key_hand_ks(spark):
    import numpy as np

    from eland_spark.operators.drift import ks_battery

    rng = np.random.RandomState(7)
    ref = pd.DataFrame(
        {"k": ["a"] * 50 + ["b"] * 40,
         "v": np.r_[rng.normal(0, 1, 50), rng.normal(0, 1, 40)]}
    )
    cur = pd.DataFrame(
        {"k": ["a"] * 60 + ["b"] * 30 + ["c"] * 5,
         "v": np.r_[rng.normal(0.8, 1, 60), rng.normal(0, 1, 30),
                    rng.normal(0, 1, 5)]}
    )
    out = {
        r["k"]: r
        for r in ks_battery(
            spark.createDataFrame(ref), spark.createDataFrame(cur), "k", "v"
        ).collect()
    }
    for k in ("a", "b"):
        a = ref[ref.k == k].v.values
        b = cur[cur.k == k].v.values
        ks = _hand_ks2(a, b)
        en = len(a) * len(b) / (len(a) + len(b))
        lam = (math.sqrt(en) + 0.12 + 0.11 / math.sqrt(en)) * ks
        assert out[k]["ks"] == pytest.approx(ks, abs=1e-6)
        assert out[k]["p"] == pytest.approx(_hand_kolmogorov_q(lam), abs=1e-6)
        assert out[k]["n_ref"] == len(a) and out[k]["n_cur"] == len(b)
    # key with an empty ref side: ks/p null, counts real
    assert out["c"]["ks"] is None and out["c"]["p"] is None
    assert out["c"]["n_ref"] == 0 and out["c"]["n_cur"] == 5


def _hand_bh(ps):
    import numpy as np

    m = len(ps)
    order = np.argsort(ps, kind="mergesort")
    adj = np.empty(m)
    prev = 1.0
    for rft, idx in enumerate(order[::-1]):
        j = m - rft
        prev = min(prev, ps[idx] * m / j)
        adj[idx] = prev
    return adj


def test_fdr_bh_matches_statsmodels_semantics(spark):
    import numpy as np

    from eland_spark.operators.drift import fdr_bh

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34, 0.341,
          0.384, 0.569, 0.594, 0.696, 0.762, 0.94, 0.942, 0.975, 0.986]
    sdf = spark.createDataFrame(pd.DataFrame({"f": range(len(ps)), "p": ps}))
    got = fdr_bh(sdf, "p", alpha=0.05).orderBy("f").toPandas()
    exp = _hand_bh(np.array(ps))
    assert np.allclose(got["p_adj"].values, exp, atol=1e-12)
    assert got[got.reject].f.tolist() == [
        i for i, a in enumerate(exp) if a <= 0.05
    ]


def test_fdr_bh_ties_nulls_and_empty(spark):
    import numpy as np

    from eland_spark.operators.drift import fdr_bh

    # duplicate p-values share one adjusted value
    ps = [0.01, 0.01, 0.02, 0.02, 0.02, 0.5, None]
    sdf = spark.createDataFrame(
        pd.DataFrame({"f": range(len(ps)), "p": pd.array(ps, dtype="Float64")})
    )
    got = fdr_bh(sdf, "p").orderBy("f").toPandas()
    exp = _hand_bh(np.array([p for p in ps if p is not None]))
    assert np.allclose(got["p_adj"].values[:6], exp, atol=1e-12)
    assert got["p_adj"].iloc[0] == got["p_adj"].iloc[1]          # tied block
    assert got["p_adj"].iloc[2] == got["p_adj"].iloc[4]
    assert pd.isna(got["p_adj"].iloc[6]) and pd.isna(got["reject"].iloc[6])
    # all-null battery: adj/reject all null, no division by zero
    empty = spark.createDataFrame(
        pd.DataFrame({"f": [1, 2], "p": pd.array([None, None],
                                                 dtype="Float64")})
    )
    out = fdr_bh(empty, "p").toPandas()
    assert out["p_adj"].isna().all() and out["reject"].isna().all()


def test_fdr_bh_distributed_path_matches_local(spark):
    import numpy as np

    from eland_spark.operators.drift import fdr_bh

    # >1000 distinct p-values forces the distributed prefix-pass path;
    # it must agree with the driver-local fold (same hand reference)
    rng = np.random.RandomState(3)
    ps = np.unique(rng.uniform(0.0001, 1.0, 1500)).tolist()
    sdf = spark.createDataFrame(
        pd.DataFrame({"f": range(len(ps)), "p": ps})
    )
    got = fdr_bh(sdf, "p", alpha=0.05).orderBy("f").toPandas()
    exp = _hand_bh(np.array(ps))
    assert np.allclose(got["p_adj"].values, exp, atol=1e-12)
    assert (got["reject"] == (exp <= 0.05)).all()


def test_kolmogorov_pvalue_small_lam_is_one(spark):
    """lam -> 0 must give p = 1 (no evidence), NOT the truncated
    series' oscillation artifact 0 (r7 review finding: a no-drift key
    would have fired the FDR gate hardest)."""
    from pyspark.sql import functions as F

    from eland_spark.operators.drift import kolmogorov_pvalue

    df = spark.createDataFrame(
        pd.DataFrame({"lam": [0.0, 0.02, 0.1, 0.1599, 0.16, 0.2]})
    )
    got = {
        r["lam"]: r["q"]
        for r in df.select("lam", kolmogorov_pvalue("lam").alias("q"))
        .collect()
    }
    assert got[0.0] == 1.0 and got[0.02] == 1.0
    assert got[0.1] == 1.0 and got[0.1599] == 1.0
    # continuity at the cutover: series error < 1e-9, true Q ~ 1-1e-20
    assert got[0.16] == pytest.approx(1.0, abs=1e-9)
    assert got[0.2] == pytest.approx(1.0, abs=1e-7)


def test_ks_battery_identical_key_p_is_one(spark):
    from eland_spark.operators.drift import ks_battery

    same = pd.DataFrame({"k": ["a"] * 40, "v": [1.0, 2.0] * 20})
    a = spark.createDataFrame(same)
    row = ks_battery(a, a, "k", "v").collect()[0]
    assert row["ks"] == 0.0 and row["p"] == 1.0
