"""Differential tests for chunking, decomposition, and scaling ops
(vs a plain-Python/numpy/pandas reference on the collected frame)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.chunking import (
    chunk_by_separator,
    chunk_text,
    chunk_token_windows,
)
from eland_spark.operators.decomposition import (
    covariance_matrix,
    pca,
    project,
    random_projection_matrix,
)
from eland_spark.operators.scaling import (
    minmax_scale,
    robust_scale,
    standard_scale,
    winsorize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()


@pytest.fixture(scope="module")
def emb_sdf(spark):
    return es.read_parquet(spark, f"{SF}/embeddings.parquet").to_spark()


@pytest.fixture(scope="module")
def X(emb_sdf):
    rows = emb_sdf.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.stack([r.embedding for r in rows]).astype(np.float64)


def _py_char_chunks(text, size, overlap):
    step = size - overlap
    return [
        (i, text[s : s + size])
        for i, s in enumerate(range(0, len(text), step))
    ]


def test_chunk_chars_matches_python(docs_sdf):
    got = (
        chunk_text(docs_sdf, size=120, overlap=30)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    texts = {
        r.doc_id: r.text for r in docs_sdf.select("doc_id", "text").collect()
    }
    exp = []
    for did in sorted(texts):
        t = texts[did]
        if t:
            for cid, ch in _py_char_chunks(t, 120, 30):
                exp.append((did, cid, ch, len(ch)))
    assert [(r.doc_id, r.chunk_id, r.chunk, r.chunk_len) for r in got] == exp


def test_chunk_words_matches_python(docs_sdf):
    got = (
        chunk_text(docs_sdf, size=25, overlap=5, unit="words")
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    texts = {
        r.doc_id: r.text for r in docs_sdf.select("doc_id", "text").collect()
    }
    exp = []
    for did in sorted(texts):
        words = texts[did].strip().split()
        if not words:
            continue
        for cid, s in enumerate(range(0, len(words), 20)):
            ch = " ".join(words[s : s + 25])
            exp.append((did, cid, ch))
    assert [(r.doc_id, r.chunk_id, r.chunk) for r in got] == exp


def test_chunk_token_windows_counts(docs_sdf):
    got = chunk_token_windows(docs_sdf, max_tokens=40, overlap=8)
    bad = got.where(
        (F.col("n_tokens") > 40) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0


def test_chunk_by_separator(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b\n\nc d\n\n\ne", "solo", "x\n\n  \n\ny"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = [
        (r.doc_id, r.part_id, r.part)
        for r in chunk_by_separator(sdf).orderBy("doc_id", "part_id").collect()
    ]
    assert got == [
        (1, 0, "a b"),
        (1, 1, "c d"),
        (1, 2, "e"),
        (2, 0, "solo"),
        (3, 0, "x"),
        (3, 2, "y"),
    ]


def test_chunk_errors(docs_sdf):
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(docs_sdf, size=10, overlap=10)
    with pytest.raises(ValueError, match="unit"):
        chunk_text(docs_sdf, unit="sentences")


def test_chunk_plan_has_no_exchange(docs_sdf):
    plan = (
        chunk_text(docs_sdf, size=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_covariance_matches_numpy(emb_sdf, X):
    got = {(r.i, r.j): r.cov for r in covariance_matrix(emb_sdf).collect()}
    C = np.cov(X, rowvar=False)
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    err = max(
        abs(got[(i + 1, j + 1)] - C[i, j])
        for i in range(d)
        for j in range(i, d)
    )
    assert err < 1e-12


def test_pca_matches_numpy(emb_sdf, X):
    mean, comps, ev = pca(emb_sdf, k=5)
    C = np.cov(X, rowvar=False)
    ew = np.sort(np.linalg.eigvalsh(C))[::-1][:5]
    assert np.allclose(ev, ew, atol=1e-10)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-12)
    # components are unit-norm eigenvectors with deterministic sign
    for c, lam in zip(comps, ev):
        v = np.array(c)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        assert np.allclose(C @ v, lam * v, atol=1e-9)
        assert v[np.argmax(np.abs(v))] > 0


def test_project_matches_numpy(emb_sdf, X):
    mean, comps, ev = pca(emb_sdf, k=3)
    got = (
        project(emb_sdf, comps, mean=mean)
        .select("vec_id", "proj")
        .orderBy("vec_id")
        .collect()
    )
    P = (X - np.array(mean)) @ np.array(comps).T
    gotm = np.array([r.proj for r in got])
    assert np.allclose(gotm, P, atol=1e-9)
    # per-component projection variance equals the eigenvalue
    assert np.allclose(P.var(axis=0, ddof=1), ev, atol=1e-9)


def test_random_projection_deterministic():
    m1 = random_projection_matrix(64, k=4, seed=7)
    m2 = random_projection_matrix(64, k=4, seed=7)
    m3 = random_projection_matrix(64, k=4, seed=8)
    assert m1 == m2 and m1 != m3
    flat = np.array(m1).ravel()
    assert abs(flat.max()) <= 0.5  # 1/sqrt(4) scale over [-1, 1)


def test_standard_scale(spark):
    pdf = pd.DataFrame(
        {"a": [1.0, 2.0, 3.0, 4.0], "b": [5.0, 5.0, 5.0, 5.0]}
    )
    sdf = spark.createDataFrame(pdf)
    out = standard_scale(sdf, ["a", "b"]).toPandas()
    exp = (pdf["a"] - pdf["a"].mean()) / pdf["a"].std()
    assert np.allclose(out["a_z"], exp)
    assert (out["b_z"] == 0.0).all()


def test_minmax_and_robust(spark):
    pdf = pd.DataFrame({"a": [2.0, 4.0, 6.0, 8.0, 100.0]})
    sdf = spark.createDataFrame(pdf)
    mm = minmax_scale(sdf, ["a"]).toPandas()["a_mm"]
    assert mm.min() == 0.0 and mm.max() == 1.0
    rb = robust_scale(sdf, ["a"]).toPandas()["a_r"]
    q1, med, q3 = pdf["a"].quantile([0.25, 0.5, 0.75])
    assert np.allclose(rb, (pdf["a"] - med) / (q3 - q1))


def test_winsorize_matches_pandas(spark):
    rng = np.random.RandomState(0)
    pdf = pd.DataFrame({"a": rng.lognormal(size=200)})
    sdf = spark.createDataFrame(pdf)
    lo, hi = pdf["a"].quantile([0.05, 0.95])
    exp = pdf["a"].clip(lo, hi)
    got = winsorize(sdf, ["a"], 0.05, 0.95).toPandas()["a_w"]
    assert np.allclose(np.sort(got), np.sort(exp))


def test_remove_repeated_segments(spark):
    from eland_spark.operators.text import remove_repeated_segments

    pdf = pd.DataFrame(
        {
            "id": [1, 2],
            "text": ["a b\n\nc d\n\na b\n\ne", "solo"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = {
        r.id: r.t
        for r in sdf.select(
            "id", remove_repeated_segments(F.col("text")).alias("t")
        ).collect()
    }
    assert out == {1: "a b\n\nc d\n\ne", 2: "solo"}
    # word-level mode: order-preserving first occurrence of each word
    out2 = sdf.select(
        remove_repeated_segments(F.col("text"), r"\s+", " ").alias("t")
    ).collect()
    assert out2[0].t == "a b c d e"


# --- rank_transform ---------------------------------------------------------

def test_rank_transform_matches_pandas_pct_rank(spark):
    import numpy as np
    import pandas as pd

    from eland_spark.operators.scaling import rank_transform

    rng = np.random.RandomState(29)
    vals = rng.randint(0, 40, 250).astype(float)  # heavy ties
    vals[rng.rand(250) < 0.1] = np.nan
    pdf = pd.DataFrame({"k": np.arange(250), "v": vals})
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    got = (
        rank_transform(sdf, "v").toPandas()
        .sort_values("k")["v_q"].to_numpy()
    )
    want = pdf["v"].rank(method="average", pct=True).to_numpy()
    assert np.allclose(got, want, atol=1e-12, equal_nan=True)
    # monotone: sorting by q must sort by v (on non-null rows)
    m = ~np.isnan(vals)
    order = np.argsort(got[m])
    assert (np.diff(vals[m][order]) >= 0).all()


def test_quantile_normalize_matches_numpy(spark):
    """quantile_normalize == numpy reference (pandas midrank u composed
    with np.interp over np.percentile-linear landmarks of the ref);
    ties, nulls, NaN, and the u=1 top edge all exercised."""
    import numpy as np
    import pandas as pd

    from eland_spark.operators.scaling import quantile_normalize

    rng = np.random.RandomState(11)
    cur = pd.DataFrame({
        "id": range(60),
        "x": list(rng.randint(0, 12, 57) * 1.5) + [None, float("nan"), 18.0],
    })
    ref_vals = rng.lognormal(3, 1, 83)
    ref = spark.createDataFrame(pd.DataFrame({"x": ref_vals}), "x double")
    sdf = spark.createDataFrame(cur, "id long, x double")

    nq = 21
    got = (
        quantile_normalize(sdf, "x", ref, n_quantiles=nq)
        .toPandas().set_index("id")["x_qn"].sort_index()
    )

    u = cur.set_index("id")["x"].rank(method="average") / cur["x"].count()
    landmarks = np.percentile(ref_vals, np.linspace(0, 100, nq),
                              method="linear")
    want = np.interp(u * (nq - 1), np.arange(nq), landmarks)
    mask = u.notna()
    np.testing.assert_allclose(
        got[mask].to_numpy(dtype="float64"),
        want[mask.to_numpy()], rtol=1e-12,
    )
    assert got[~mask].isna().all()
    # monotone: higher raw value -> >= normalized value
    s = cur.dropna(subset=["x"]).sort_values("x")
    assert got[s["id"]].is_monotonic_increasing
