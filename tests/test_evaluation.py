"""Classifier evaluation (operators/evaluation.py): exact AUC vs a
brute-force pairwise reference (ties counted half), confusion metrics
vs sklearn-style hand math."""

import numpy as np
import pandas as pd
import pytest

from eland_spark.operators.evaluation import auc, confusion_at


def _brute_auc(scores, labels):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def _mk(spark, scores, labels):
    return spark.createDataFrame(
        pd.DataFrame({"s": scores, "y": labels}),
        schema="s double, y int",
    )


def test_auc_matches_bruteforce_with_ties(spark):
    rng = np.random.RandomState(2)
    scores = list(rng.randint(0, 15, 120).astype(float))  # heavy ties
    labels = list((rng.rand(120) < 0.4).astype(int))
    got = auc(_mk(spark, scores, labels), "s", "y").collect()[0]
    want = _brute_auc(scores, labels)
    assert got["auc"] == pytest.approx(want, abs=1e-6)
    assert got["n_pos"] == sum(labels)
    assert got["n_neg"] == len(labels) - sum(labels)


def test_auc_perfect_and_random_and_inverted(spark):
    perfect = auc(_mk(spark, [1.0, 2.0, 3.0, 4.0], [0, 0, 1, 1]),
                  "s", "y").collect()[0]["auc"]
    assert perfect == 1.0
    inverted = auc(_mk(spark, [4.0, 3.0, 2.0, 1.0], [0, 0, 1, 1]),
                   "s", "y").collect()[0]["auc"]
    assert inverted == 0.0
    all_tied = auc(_mk(spark, [1.0] * 6, [0, 1, 0, 1, 0, 1]),
                   "s", "y").collect()[0]["auc"]
    assert all_tied == 0.5


def test_auc_degenerate_is_null(spark):
    row = auc(_mk(spark, [1.0, 2.0], [1, 1]), "s", "y").collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0


def test_confusion_at(spark):
    scores = [0.9, 0.8, 0.3, 0.6, 0.1, None]
    labels = [1, 0, 1, 1, 0, 1]
    row = confusion_at(_mk(spark, scores, labels), "s", "y",
                       threshold=0.5).collect()[0]
    # preds (null dropped): [1,1,0,1,0]; labels [1,0,1,1,0]
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (2, 1, 1, 1)
    assert row["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["f1"] == pytest.approx(2 / 3, abs=1e-6)


def test_confusion_zero_denominators_null(spark):
    row = confusion_at(_mk(spark, [0.1, 0.2], [0, 0]), "s", "y",
                       threshold=0.5).collect()[0]
    assert row["precision"] is None and row["recall"] is None
    assert row["f1"] is None


# --- ranking_metrics -------------------------------------------------------

from eland_spark.operators.evaluation import (  # noqa: E402
    calibration_bins,
    cohens_kappa,
    ranking_metrics,
)


def _ref_rank_metrics(rows, k):
    """Pure-python nDCG/MRR/P@k/R@k reference over (q, rank, rel)."""
    import math as m
    by_q = {}
    for q, r, rel in rows:
        by_q.setdefault(q, []).append((r, rel))
    out = {}
    for q, items in by_q.items():
        dcg = sum(
            (2 ** rel - 1) / m.log2(r + 1) for r, rel in items if r <= k
        )
        ideal = sorted(items, key=lambda t: (-t[1], t[0]))
        idcg = sum(
            (2 ** rel - 1) / m.log2(i + 2)
            for i, (_, rel) in enumerate(ideal)
            if i + 2 <= k + 1 and rel > 0
        )
        rel_ranks = [r for r, rel in items if rel > 0 and r <= k]
        nrel = sum(1 for _, rel in items if rel > 0)
        out[q] = (
            dcg / idcg if idcg > 0 else 0.0,
            1.0 / min(rel_ranks) if rel_ranks else 0.0,
            len(rel_ranks) / k,
            len(rel_ranks) / nrel if nrel else 0.0,
            nrel,
        )
    return out


def test_ranking_metrics_matches_reference(spark):
    rng = np.random.RandomState(7)
    rows = []
    for q in range(6):
        n = rng.randint(3, 25)
        ranks = rng.permutation(n) + 1
        rels = rng.randint(0, 3, n)  # graded 0/1/2
        rows += [(f"q{q}", int(r), float(g)) for r, g in zip(ranks, rels)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["q", "rank", "rel"]),
        schema="q string, rank bigint, rel double",
    )
    got = {
        r["q"]: (r["ndcg"], r["mrr"], r["precision_k"], r["recall_k"], r["n_rel"])
        for r in ranking_metrics(sdf, "q", "rank", "rel", k=10).collect()
    }
    want = _ref_rank_metrics(rows, 10)
    assert set(got) == set(want)
    for q in want:
        for g, w in zip(got[q], want[q]):
            assert g == pytest.approx(w, abs=1e-6), q


def test_ranking_metrics_edges(spark):
    # no relevant items -> ndcg/mrr/recall 0; binary rel degrades to DCG
    sdf = spark.createDataFrame(
        pd.DataFrame({"q": ["a", "a", "b"], "rank": [1, 2, 1],
                      "rel": [0.0, 0.0, 1.0]}),
        schema="q string, rank bigint, rel double",
    )
    rows = {r["q"]: r for r in
            ranking_metrics(sdf, "q", "rank", "rel", k=5).collect()}
    assert rows["a"]["ndcg"] == 0.0 and rows["a"]["mrr"] == 0.0
    assert rows["a"]["recall_k"] == 0.0 and rows["a"]["n_rel"] == 0
    assert rows["b"]["ndcg"] == 1.0 and rows["b"]["mrr"] == 1.0
    with pytest.raises(ValueError):
        ranking_metrics(sdf, "q", "rank", "rel", k=0)


def test_ranking_metrics_relevant_beyond_k(spark):
    # relevant item at rank 11 counts in n_rel/recall denominator only
    rows = [("a", r, 1.0 if r in (1, 11) else 0.0) for r in range(1, 12)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["q", "rank", "rel"]),
        schema="q string, rank bigint, rel double",
    )
    r = ranking_metrics(sdf, "q", "rank", "rel", k=10).collect()[0]
    assert r["n_rel"] == 2 and r["recall_k"] == 0.5
    assert r["precision_k"] == pytest.approx(0.1)
    assert r["mrr"] == 1.0


# --- calibration_bins ------------------------------------------------------

def test_calibration_matches_reference(spark):
    rng = np.random.RandomState(11)
    s = rng.rand(400)
    y = (rng.rand(400) < s).astype(int)  # roughly calibrated
    sdf = spark.createDataFrame(
        pd.DataFrame({"s": s, "y": y}), schema="s double, y int"
    )
    rows = calibration_bins(sdf, "s", "y", bins=10).collect()
    bins = np.minimum((s * 10).astype(int), 9)
    for r in rows:
        m = bins == r["bin"]
        assert r["n"] == int(m.sum())
        assert r["confidence"] == pytest.approx(s[m].mean(), abs=1e-6)
        assert r["accuracy"] == pytest.approx(y[m].mean(), abs=1e-6)
        assert r["weight"] == pytest.approx(m.sum() / 400, abs=1e-6)
    ece = sum(r["ece_term"] for r in rows)
    want_ece = sum(
        (bins == b).sum() / 400 * abs(y[bins == b].mean() - s[bins == b].mean())
        for b in np.unique(bins)
    )
    assert ece == pytest.approx(want_ece, abs=1e-5)


def test_calibration_drops_out_of_range_and_folds_top(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"s": [1.0, 0.95, -0.1, 1.5, None],
                      "y": [1, 1, 0, 0, 1]}),
        schema="s double, y int",
    )
    rows = calibration_bins(sdf, "s", "y", bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 9 and rows[0]["n"] == 2
    with pytest.raises(ValueError):
        calibration_bins(sdf, "s", "y", bins=0)


# --- cohens_kappa ----------------------------------------------------------

def _ref_kappa(a, b):
    n = len(a)
    po = sum(1 for x, y in zip(a, b) if x == y) / n
    pe = sum(
        (a.count(c) / n) * (b.count(c) / n) for c in set(a) | set(b)
    )
    return (po - pe) / (1 - pe), po, pe


def test_kappa_matches_reference(spark):
    rng = np.random.RandomState(3)
    a = [str(x) for x in rng.randint(0, 4, 300)]
    b = [
        x if rng.rand() < 0.6 else str(rng.randint(0, 4))
        for x in a
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b}), schema="a string, b string"
    )
    row = cohens_kappa(sdf, "a", "b").collect()[0]
    want_k, want_po, want_pe = _ref_kappa(a, b)
    assert row["kappa"] == pytest.approx(want_k, abs=1e-6)
    assert row["po"] == pytest.approx(want_po, abs=1e-6)
    assert row["pe"] == pytest.approx(want_pe, abs=1e-6)
    assert row["n"] == 300


def test_kappa_constant_raters_null(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": ["x"] * 5, "b": ["x"] * 5}),
        schema="a string, b string",
    )
    row = cohens_kappa(sdf, "a", "b").collect()[0]
    assert row["kappa"] is None and row["pe"] == 1.0


def test_kappa_disjoint_label_sets(spark):
    # raters never agree and share no labels: pe = 0, kappa = po = 0
    sdf = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y"], "b": ["u", "v"]}),
        schema="a string, b string",
    )
    row = cohens_kappa(sdf, "a", "b").collect()[0]
    assert row["kappa"] == 0.0 and row["pe"] == 0.0 and row["po"] == 0.0


# --- spearman_corr ---------------------------------------------------------

from eland_spark.operators.ranking import spearman_corr  # noqa: E402


def test_spearman_matches_pandas(spark):
    rng = np.random.RandomState(19)
    x = rng.randint(0, 20, 300).astype(float)          # heavy ties
    y = x * 2 + rng.normal(0, 5, 300).round(1)         # monotone-ish + ties
    pdf = pd.DataFrame({"x": x, "y": y})
    sdf = spark.createDataFrame(pdf, schema="x double, y double")
    row = spearman_corr(sdf, "x", "y").collect()[0]
    # rank-then-Pearson == Spearman (pandas' method='spearman' needs
    # scipy, absent here; midrank + Pearson is the same definition)
    want = pdf["x"].rank(method="average").corr(
        pdf["y"].rank(method="average")
    )
    assert row["rho"] == pytest.approx(want, abs=1e-6)
    assert row["n"] == 300


def test_spearman_pairwise_complete_and_edges(spark):
    pdf = pd.DataFrame({
        "x": [1.0, 2.0, 3.0, None, 5.0],
        "y": [2.0, 4.0, 6.0, 8.0, None],
    })
    sdf = spark.createDataFrame(pdf, schema="x double, y double")
    row = spearman_corr(sdf, "x", "y").collect()[0]
    assert row["rho"] == 1.0 and row["n"] == 3  # null rows dropped pairwise
    # constant side -> null rho (pandas NaN)
    const = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 1.0, 1.0], "y": [1.0, 2.0, 3.0]}),
        schema="x double, y double",
    )
    assert spearman_corr(const, "x", "y").collect()[0]["rho"] is None


def test_spearman_perfect_inverse(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [9.0, 7.0, 5.0, 1.0]}),
        schema="x double, y double",
    )
    assert spearman_corr(sdf, "x", "y").collect()[0]["rho"] == -1.0


# --- rolling quantile/median ------------------------------------------------

import eland_spark as es  # noqa: E402


def test_rolling_quantile_matches_pandas(spark):
    rng = np.random.RandomState(23)
    vals = rng.normal(100, 30, 400).round(2)
    vals[rng.rand(400) < 0.08] = np.nan  # nulls inside windows
    pdf = pd.DataFrame({"k": np.arange(400), "v": vals})
    edf = es.DataFrame(
        spark.createDataFrame(pdf.astype({"k": "int64"})),
        index_cols=("k",),
    )
    pdf = pdf.set_index("k")
    got = (
        edf["v"].rolling(7, min_periods=3).quantile(0.25)
        .to_pandas()["rolling_quantile"].sort_index().to_numpy()
    )
    want = (
        pdf["v"].rolling(7, min_periods=3).quantile(0.25)
        .sort_index().to_numpy()
    )
    assert np.allclose(got, want, atol=1e-9, equal_nan=True)
    med = (
        edf["v"].rolling(5).median()
        .to_pandas()["rolling_median"].sort_index().to_numpy()
    )
    want_med = pdf["v"].rolling(5).median().sort_index().to_numpy()
    assert np.allclose(med, want_med, atol=1e-9, equal_nan=True)


def test_rolling_quantile_validation(spark):
    pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    with pytest.raises(ValueError):
        edf["v"].rolling(3).quantile(1.5)
    with pytest.raises(NotImplementedError):
        edf["v"].rolling(3).quantile(0.5, interpolation="nearest")


def test_groupby_rolling_quantile_matches_pandas(spark):
    rng = np.random.RandomState(31)
    pdf = pd.DataFrame({
        "k": np.arange(200),
        "g": rng.choice(["a", "b", "c"], 200),
        "v": rng.normal(50, 10, 200).round(2),
    })
    pdf.loc[rng.rand(200) < 0.07, "v"] = np.nan
    edf = es.DataFrame(
        spark.createDataFrame(pdf.astype({"k": "int64"})), index_cols=("k",)
    )
    got = (
        edf[["g", "v"]].groupby("g").rolling(4, min_periods=2).quantile(0.3)
        .to_pandas().sort_index()["v"].to_numpy()
    )
    want = (
        pdf.set_index("k").groupby("g")["v"]
        .rolling(4, min_periods=2).quantile(0.3)
        .reset_index(level=0, drop=True).sort_index().to_numpy()
    )
    assert np.allclose(got, want, atol=1e-9, equal_nan=True)
    # expanding twin (window=None)
    got_m = (
        edf[["g", "v"]].groupby("g").expanding(min_periods=2).median()
        .to_pandas().sort_index()["v"].to_numpy()
    )
    want_m = (
        pdf.set_index("k").groupby("g")["v"].expanding(min_periods=2)
        .median().reset_index(level=0, drop=True).sort_index().to_numpy()
    )
    assert np.allclose(got_m, want_m, atol=1e-9, equal_nan=True)


def test_acf_matches_pandas_autocorr(spark):
    from eland_spark.operators.timeseries import acf

    rng = np.random.RandomState(37)
    vals = np.cumsum(rng.normal(0, 1, 300))  # strong positive memory
    vals[rng.rand(300) < 0.05] = np.nan
    pdf = pd.DataFrame({"k": np.arange(300), "v": vals})
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    got = {r["lag"]: (r["acf"], r["n"])
           for r in acf(sdf, ["k"], "v", nlags=5).collect()}
    s = pdf.set_index("k")["v"]
    for k in range(1, 6):
        want = s.autocorr(k)
        pairs = (s.notna() & s.shift(k).notna()).sum()
        assert got[k][0] == pytest.approx(want, abs=1e-6), k
        assert got[k][1] == pairs, k
    with pytest.raises(ValueError):
        acf(sdf, ["k"], "v", nlags=0)


def test_groupby_rolling_skew_kurt_match_pandas(spark):
    rng = np.random.RandomState(43)
    pdf = pd.DataFrame({
        "k": np.arange(240),
        "g": rng.choice(["a", "b", "c"], 240),
        "v": rng.normal(20, 6, 240).round(2),
    })
    pdf.loc[rng.rand(240) < 0.06, "v"] = np.nan
    pdf.loc[pdf.index[:12], "v"] = 7.0  # constant head windows
    edf = es.DataFrame(
        spark.createDataFrame(pdf.astype({"k": "int64"})), index_cols=("k",)
    )
    got_sk = (
        edf[["g", "v"]].groupby("g").rolling(5, min_periods=3).skew()
        .to_pandas().sort_index()["v"].to_numpy()
    )
    want_sk = (
        pdf.set_index("k").groupby("g")["v"]
        .rolling(5, min_periods=3).skew()
        .reset_index(level=0, drop=True).sort_index().to_numpy()
    )
    assert np.allclose(got_sk, want_sk, rtol=1e-5, atol=1e-6, equal_nan=True)
    got_ku = (
        edf[["g", "v"]].groupby("g").expanding(min_periods=4).kurt()
        .to_pandas().sort_index()["v"].to_numpy()
    )
    want_ku = (
        pdf.set_index("k").groupby("g")["v"].expanding(min_periods=4)
        .kurt().reset_index(level=0, drop=True).sort_index().to_numpy()
    )
    assert np.allclose(got_ku, want_ku, rtol=1e-5, atol=1e-6, equal_nan=True)


def test_ewm_var_std_match_pandas(spark):
    rng = np.random.RandomState(47)
    vals = rng.normal(1000, 100, 250).round(2)
    vals[rng.rand(250) < 0.08] = np.nan  # gaps: weights advance, value carried
    pdf = pd.DataFrame({"k": np.arange(250), "v": vals})
    edf = es.DataFrame(
        spark.createDataFrame(pdf.astype({"k": "int64"})), index_cols=("k",)
    )
    p = pdf.set_index("k")["v"]
    got_v = (
        edf["v"].ewm(span=10).var()
        .to_pandas()["ewm_var"].sort_index().to_numpy()
    )
    want_v = p.ewm(span=10).var().sort_index().to_numpy()
    assert np.allclose(got_v, want_v, rtol=1e-6, atol=1e-9, equal_nan=True)
    got_s = (
        edf["v"].ewm(alpha=0.3, min_periods=5).std()
        .to_pandas()["ewm_std"].sort_index().to_numpy()
    )
    want_s = p.ewm(alpha=0.3, min_periods=5).std().sort_index().to_numpy()
    assert np.allclose(got_s, want_s, rtol=1e-6, atol=1e-9, equal_nan=True)
    # constant series: var exactly 0 from the second observation
    c = pd.DataFrame({"k": [0, 1, 2], "v": [7.0, 7.0, 7.0]})
    ec = es.DataFrame(spark.createDataFrame(c), index_cols=("k",))
    cv = ec["v"].ewm(span=4).var().to_pandas()["ewm_var"].sort_index().tolist()
    assert np.isnan(cv[0]) and cv[1] == 0.0 and cv[2] == 0.0


def test_groupby_ewm_var_std_match_pandas(spark):
    rng = np.random.RandomState(53)
    pdf = pd.DataFrame({
        "k": np.arange(180),
        "g": rng.choice(["a", "b"], 180),
        "v": rng.normal(50, 12, 180).round(2),
    })
    edf = es.DataFrame(
        spark.createDataFrame(pdf.astype({"k": "int64"})), index_cols=("k",)
    )
    got = (
        edf[["g", "v"]].groupby("g").ewm(span=8, min_periods=2).std()
        .to_pandas().sort_values("k")["v_ewm_std"].to_numpy()
    )
    want = (
        pdf.sort_values("k").groupby("g")["v"]
        .transform(lambda s: s.ewm(span=8, min_periods=2).std()).to_numpy()
    )
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12, equal_nan=True)
    got_v = (
        edf[["g", "v"]].groupby("g").ewm(alpha=0.99, min_periods=2).var()
        .to_pandas().sort_values("k")["v_ewm_var"].to_numpy()
    )  # alpha=0.99: kernel width <= 8 -> the JVM window engine
    want_v = (
        pdf.sort_values("k").groupby("g")["v"]
        .transform(lambda s: s.ewm(alpha=0.99, min_periods=2).var()).to_numpy()
    )
    assert np.allclose(got_v, want_v, rtol=1e-6, atol=1e-9, equal_nan=True)


def _ref_decompose(vals, period):
    """numpy reference for the classical additive decomposition with
    the same MA definition (odd: centered window p; even: 2x-MA)."""
    n = len(vals)
    v = np.asarray(vals, dtype="float64")
    h = period // 2
    trend = np.full(n, np.nan)
    for i in range(n):
        if period % 2:
            lo, hi = i - h, i + h
            if lo >= 0 and hi < n:
                trend[i] = v[lo:hi + 1].mean()
        else:
            lo, hi = i - h, i + h
            if lo >= 0 and hi < n:
                trend[i] = (
                    0.5 * v[lo] + v[lo + 1:hi].sum() + 0.5 * v[hi]
                ) / period
    det = v - trend
    smeans = np.array([
        np.nanmean(det[p::period]) if np.any(~np.isnan(det[p::period]))
        else np.nan
        for p in range(period)
    ])
    smeans = smeans - np.nanmean(smeans)
    seasonal = smeans[np.arange(n) % period]
    return trend, seasonal, v - trend - seasonal


@pytest.mark.parametrize("period", [7, 6])
def test_seasonal_decompose_matches_reference(spark, period):
    from eland_spark.operators.timeseries import seasonal_decompose

    rng = np.random.RandomState(67)
    n = 200
    t = np.arange(n)
    vals = (
        0.3 * t                               # trend
        + 10 * np.sin(2 * np.pi * t / period) # seasonality
        + rng.normal(0, 1, n)                 # noise
    ).round(3)
    pdf = pd.DataFrame({"k": t, "v": vals})
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    got = (
        seasonal_decompose(sdf, ["k"], "v", period)
        .toPandas().sort_values("k")
    )
    trend, seasonal, resid = _ref_decompose(vals, period)
    assert np.allclose(got["trend"].to_numpy(), trend,
                       atol=1e-9, equal_nan=True)
    assert np.allclose(got["seasonal"].to_numpy(), seasonal,
                       atol=1e-9, equal_nan=True)
    assert np.allclose(got["resid"].to_numpy(), resid,
                       atol=1e-9, equal_nan=True)
    # components reassemble the series wherever trend is defined
    m = ~np.isnan(trend)
    re = (got["trend"] + got["seasonal"] + got["resid"]).to_numpy()
    assert np.allclose(re[m], vals[m], atol=1e-9)
    with pytest.raises(ValueError):
        seasonal_decompose(sdf, ["k"], "v", 1)


# ---------------------------------------------------------------------------
# Fleiss' kappa (r7)
# ---------------------------------------------------------------------------

def _fleiss_mat_to_rows(mat):
    return [
        (i, str(j))
        for i in range(mat.shape[0])
        for j in range(mat.shape[1])
        for _ in range(mat[i, j])
    ]


def test_fleiss_kappa_canonical_example(spark):
    """The standard worked example (10 items, 14 raters, 5 categories)
    -> kappa = 0.2099."""
    from eland_spark.operators.evaluation import fleiss_kappa

    mat = np.array([
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0], [2, 2, 8, 1, 1], [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0], [2, 5, 3, 2, 2], [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ])
    sdf = spark.createDataFrame(
        pd.DataFrame(_fleiss_mat_to_rows(mat), columns=["item", "cat"])
    )
    row = fleiss_kappa(sdf, "item", "cat").toPandas().iloc[0]
    # hand reference
    n = 14
    pi = ((mat ** 2).sum(axis=1) - n) / (n * (n - 1))
    pj = mat.sum(axis=0) / (mat.shape[0] * n)
    pbar, pe = pi.mean(), (pj ** 2).sum()
    assert row["kappa"] == pytest.approx((pbar - pe) / (1 - pe), abs=1e-6)
    assert row["p_bar"] == pytest.approx(pbar, abs=1e-6)
    assert row["p_e"] == pytest.approx(pe, abs=1e-6)
    assert row["n_items"] == 10 and row["n_raters"] == 14


def test_fleiss_kappa_perfect_and_degenerate(spark):
    from eland_spark.operators.evaluation import fleiss_kappa

    # perfect agreement over >1 category -> kappa 1
    rows = [(i, "a" if i % 2 else "b") for i in range(6) for _ in range(3)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["item", "cat"]))
    row = fleiss_kappa(sdf, "item", "cat").toPandas().iloc[0]
    assert row["kappa"] == pytest.approx(1.0)
    # single category everywhere -> pe == 1 -> kappa null
    rows1 = [(i, "a") for i in range(4) for _ in range(2)]
    sdf1 = spark.createDataFrame(pd.DataFrame(rows1, columns=["item", "cat"]))
    row1 = fleiss_kappa(sdf1, "item", "cat").toPandas().iloc[0]
    assert pd.isna(row1["kappa"]) and row1["p_e"] == pytest.approx(1.0)


def test_fleiss_kappa_validation_errors(spark):
    from eland_spark.operators.evaluation import fleiss_kappa

    uneq = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a"), (1, "b"), (2, "a")], columns=["item", "cat"]
        )
    )
    with pytest.raises(ValueError, match="unequal ratings"):
        fleiss_kappa(uneq, "item", "cat")
    single = spark.createDataFrame(
        pd.DataFrame([(1, "a"), (2, "b")], columns=["item", "cat"])
    )
    with pytest.raises(ValueError, match=">= 2 ratings"):
        fleiss_kappa(single, "item", "cat")
    empty = spark.createDataFrame(
        pd.DataFrame({"item": pd.array([None], dtype="Int64"),
                      "cat": ["a"]})
    )
    with pytest.raises(ValueError, match="no complete ratings"):
        fleiss_kappa(empty, "item", "cat")


# ---------------------------------------------------------------------------
# corpus BLEU (r7)
# ---------------------------------------------------------------------------

def _hand_bleu(pairs, max_n=4):
    import math
    from collections import Counter

    m = [0] * max_n
    t = [0] * max_n
    cl = rl = 0
    for c, r in pairs:
        ct, rt = c.split(), r.split()
        cl += len(ct)
        rl += len(rt)
        for n in range(1, max_n + 1):
            cg = Counter(
                tuple(ct[i:i + n]) for i in range(len(ct) - n + 1)
            )
            rg = Counter(
                tuple(rt[i:i + n]) for i in range(len(rt) - n + 1)
            )
            m[n - 1] += sum(min(v, rg[g]) for g, v in cg.items())
            t[n - 1] += sum(cg.values())
    ps = [mi / ti if ti else None for mi, ti in zip(m, t)]
    bp = 1.0 if cl >= rl else math.exp(1 - rl / cl)
    bleu = (
        0.0
        if any((p or 0) == 0 for p in ps)
        else bp * math.exp(sum(math.log(p) for p in ps) / max_n)
    )
    return bleu, bp, ps, cl, rl


def test_corpus_bleu_matches_hand_reference(spark):
    from eland_spark.operators.evaluation import corpus_bleu

    pairs = [
        ("the cat sat on the mat and the cat sat", "the cat is on the mat and the cat sat"),
        ("a quick brown fox jumps over it", "the quick brown fox jumps over the dog"),
        ("hello world how are you today", "hello there world how are you"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(pairs, columns=["c", "r"]))
    row = corpus_bleu(sdf, "c", "r", max_n=4).toPandas().iloc[0]
    bleu, bp, ps, cl, rl = _hand_bleu(pairs)
    assert row["bleu"] == pytest.approx(bleu, abs=1e-6)
    assert row["bp"] == pytest.approx(bp, abs=1e-6)
    for n in range(1, 5):
        assert row[f"p{n}"] == pytest.approx(ps[n - 1], abs=1e-6)
    assert row["cand_len"] == cl and row["ref_len"] == rl


def test_corpus_bleu_zero_precision_and_nulls(spark):
    from eland_spark.operators.evaluation import corpus_bleu

    # no 4-gram overlap anywhere -> unsmoothed BLEU is exactly 0
    pairs = pd.DataFrame(
        {"c": ["a b c d e", None], "r": ["v w x y z", "dropped row"]}
    )
    sdf = spark.createDataFrame(pairs)
    row = corpus_bleu(sdf, "c", "r", max_n=4).toPandas().iloc[0]
    assert row["bleu"] == 0.0
    assert row["cand_len"] == 5 and row["ref_len"] == 5  # null row dropped
    # identical corpus -> BLEU 1
    same = spark.createDataFrame(
        pd.DataFrame({"c": ["x y z w v"], "r": ["x y z w v"]})
    )
    r2 = corpus_bleu(same, "c", "r", max_n=4).toPandas().iloc[0]
    assert r2["bleu"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="max_n"):
        corpus_bleu(sdf, "c", "r", max_n=0)


# ---------------------------------------------------------------------------
# PR curve (r7)
# ---------------------------------------------------------------------------

def test_pr_curve_matches_hand_thresholds(spark):
    from eland_spark.operators.evaluation import pr_curve

    scores = [0.9, 0.8, 0.8, 0.7, 0.6, 0.5, 0.5, 0.4]
    labels = [1, 1, 0, 1, 0, 1, 0, 0]
    sdf = _mk(spark, scores, labels)
    got = {
        r["threshold"]: r
        for r in pr_curve(sdf, "s", "y").collect()
    }
    P = sum(labels)
    assert len(got) == len(set(scores))
    for t in set(scores):
        tp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 1)
        fp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 0)
        r = got[t]
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
        assert r["recall"] == pytest.approx(tp / P, abs=1e-6)
        prec, rec = tp / (tp + fp), tp / P
        if prec + rec > 0:
            assert r["f1"] == pytest.approx(
                2 * prec * rec / (prec + rec), abs=1e-6
            )


def test_pr_curve_degenerate_no_positives(spark):
    from eland_spark.operators.evaluation import pr_curve

    sdf = _mk(spark, [0.2, 0.8], [0, 0])
    out = pr_curve(sdf, "s", "y").orderBy("threshold").toPandas()
    assert (out["tp"] == 0).all()
    assert out["recall"].isna().all()          # P == 0 -> null recall
    assert (out["precision"] == 0.0).all()     # tp+fp > 0 at every row


# ---------------------------------------------------------------------------
# ROUGE-N (r7)
# ---------------------------------------------------------------------------

def _hand_rouge(pairs, n):
    from collections import Counter

    rs, ps, fs = [], [], []
    for c, r in pairs:
        ct, rt = c.split(), r.split()
        cg = Counter(tuple(ct[i:i + n]) for i in range(len(ct) - n + 1))
        rg = Counter(tuple(rt[i:i + n]) for i in range(len(rt) - n + 1))
        m = sum(min(v, rg[g]) for g, v in cg.items())
        tc, tr = max(len(ct) - n + 1, 0), max(len(rt) - n + 1, 0)
        rr = m / tr if tr else 0.0
        pp = m / tc if tc else 0.0
        ff = 2 * pp * rr / (pp + rr) if pp + rr else 0.0
        rs.append(rr)
        ps.append(pp)
        fs.append(ff)
    k = len(pairs)
    return sum(rs) / k, sum(ps) / k, sum(fs) / k


def test_rouge_n_matches_hand_reference(spark):
    from eland_spark.operators.evaluation import rouge_n

    pairs = [
        ("the cat sat on the mat", "the cat is on the mat"),
        ("a b", "a b c d"),
        ("x", "y z"),     # cand has no bigrams -> scores 0 for n=2
        ("q w e", "q w e"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(pairs, columns=["c", "r"]))
    row = rouge_n(sdf, "c", "r", orders=(1, 2)).toPandas().iloc[0]
    for n in (1, 2):
        rr, pp, ff = _hand_rouge(pairs, n)
        assert row[f"rouge{n}_recall"] == pytest.approx(rr, abs=1e-6)
        assert row[f"rouge{n}_precision"] == pytest.approx(pp, abs=1e-6)
        assert row[f"rouge{n}_f1"] == pytest.approx(ff, abs=1e-6)
    assert row["n_pairs"] == 4
    # identical corpus -> all 1.0
    same = spark.createDataFrame(
        pd.DataFrame({"c": ["x y z"], "r": ["x y z"]})
    )
    r2 = rouge_n(same, "c", "r", orders=(1, 2)).toPandas().iloc[0]
    assert r2["rouge1_f1"] == pytest.approx(1.0)
    assert r2["rouge2_f1"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="orders"):
        rouge_n(same, "c", "r", orders=(0,))


# ---------------------------------------------------------------------------
# chrF (r7)
# ---------------------------------------------------------------------------

def _hand_chrf(pairs, max_n=4, beta=2.0):
    import re
    from collections import Counter

    m = [0] * max_n
    tc = [0] * max_n
    tr = [0] * max_n
    cl = rl = 0
    for c, r in pairs:
        cs, rs = re.sub(r"\s+", "", c), re.sub(r"\s+", "", r)
        cl += len(cs)
        rl += len(rs)
        for n in range(1, max_n + 1):
            cg = Counter(cs[i:i + n] for i in range(len(cs) - n + 1))
            rg = Counter(rs[i:i + n] for i in range(len(rs) - n + 1))
            m[n - 1] += sum(min(v, rg[g]) for g, v in cg.items())
            tc[n - 1] += max(len(cs) - n + 1, 0)
            tr[n - 1] += max(len(rs) - n + 1, 0)
    P = sum((mi / t if t else 0.0) for mi, t in zip(m, tc)) / max_n
    R = sum((mi / t if t else 0.0) for mi, t in zip(m, tr)) / max_n
    b2 = beta * beta
    f = (1 + b2) * P * R / (b2 * P + R) if P + R > 0 else 0.0
    return f, P, R, cl, rl


def test_chrf_matches_hand_reference(spark):
    from eland_spark.operators.evaluation import chrf

    pairs = [
        ("the cat sat", "the cats sat"),   # partial word overlap
        ("abc def", "abcdef"),             # whitespace stripped
        ("xy", "zq"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(pairs, columns=["c", "r"]))
    row = chrf(sdf, "c", "r", max_n=4, beta=2.0).toPandas().iloc[0]
    f, P, R, cl, rl = _hand_chrf(pairs)
    assert row["chrf"] == pytest.approx(f, abs=1e-6)
    assert row["prec"] == pytest.approx(P, abs=1e-6)
    assert row["rec"] == pytest.approx(R, abs=1e-6)
    assert row["cand_len"] == cl and row["ref_len"] == rl
    # identical corpus -> chrF 1; disjoint charset -> 0
    same = spark.createDataFrame(pd.DataFrame({"c": ["abcd"], "r": ["abcd"]}))
    assert chrf(same, "c", "r").toPandas().iloc[0]["chrf"] == pytest.approx(1.0)
    disj = spark.createDataFrame(pd.DataFrame({"c": ["aaaa"], "r": ["bbbb"]}))
    assert chrf(disj, "c", "r").toPandas().iloc[0]["chrf"] == 0.0
    with pytest.raises(ValueError, match="beta"):
        chrf(same, "c", "r", beta=0)


def test_forecast_metrics_matches_reference(spark):
    """sMAPE/MAE/MASE vs a python reference with the same integer-nano
    quantization; zero-denominator, constant-history, and short-series
    edges."""
    import pandas as pd
    import pytest

    from eland_spark.operators.evaluation import forecast_metrics

    rows = [
        # series a: normal
        ("a", 1, 10.0, 12.0), ("a", 2, 11.0, 10.5), ("a", 3, 9.0, 11.0),
        ("a", 4, 14.0, 10.0), ("a", 5, None, 13.0), ("a", 6, 13.0, None),
        # series b: both-zero smape term + exact forecast
        ("b", 1, 0.0, 0.0), ("b", 2, 5.0, 5.0), ("b", 3, 4.0, 6.0),
        # series c: constant history -> mase null
        ("c", 1, 7.0, 6.0), ("c", 2, 7.0, 8.0),
        # series d: single point -> mase null
        ("d", 1, 3.0, 4.0),
    ]
    pdf = pd.DataFrame(rows, columns=["g", "t", "a", "p"])
    sdf = spark.createDataFrame(
        pdf, schema="g string, t long, a double, p double"
    )
    out = forecast_metrics(sdf, "a", "p", "t", ["g"]).toPandas()
    got = {r["g"]: r for _, r in out.iterrows()}

    # the operator's lag() is over the RAW actual column: a null actual
    # yields a null prev for the NEXT row and contributes nothing itself
    def ref2(g):
        sub = pdf[pdf.g == g].sort_values("t")
        actuals = list(sub["a"])
        preds = list(sub["p"])
        ss = sa = sn = n = nn = 0
        for i, (a, p) in enumerate(zip(actuals, preds)):
            if pd.notna(a) and pd.notna(p):
                n += 1
                d = abs(a) + abs(p)
                term = 2.0 * abs(a - p) / d if d > 0 else 0.0
                ss += int(round(term * 1e9))
                sa += int(round(abs(a - p) * 1e9))
            prev = actuals[i - 1] if i > 0 else None
            if pd.notna(a) and prev is not None and pd.notna(prev):
                nn += 1
                sn += int(round(abs(a - prev) * 1e9))
        smape = round(ss / n / 1e9, 6) if n else None
        mae = round(sa / n / 1e9, 6) if n else None
        mase = (
            round((sa / n) / (sn / nn), 6) if nn > 0 and sn > 0 else None
        )
        return n, smape, mae, mase

    for g in ["a", "b", "c", "d"]:
        n, smape, mae, mase = ref2(g)
        r = got[g]
        assert r["n"] == n, g
        assert r["smape"] == pytest.approx(smape, abs=1e-9), g
        assert r["mae"] == pytest.approx(mae, abs=1e-9), g
        if mase is None:
            assert pd.isna(r["mase"]), g
        else:
            assert r["mase"] == pytest.approx(mase, abs=1e-9), g
    # hand-checks: series b smape = mean(0, 0, 2*2/10) = 0.133333
    assert got["b"]["smape"] == pytest.approx(0.133333, abs=1e-6)
    assert pd.isna(got["c"]["mase"]) and pd.isna(got["d"]["mase"])
