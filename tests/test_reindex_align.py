"""reindex/align (VERDICT r4 #5): pandas differentials including
missing labels (NaN rows), method fills, fill_value scope, duplicate
source raise, and align join modes/axes."""

import numpy as np
import pandas as pd
import pytest

import eland_spark as es


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame({
        "k": [1, 2, 4, 7],
        "a": [10.0, None, 40.0, 70.0],
        "b": ["x", "y", "z", "w"],
    })
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    return pdf.set_index("k"), edf


def test_reindex_missing_labels_nan_rows(frames):
    ppdf, edf = frames
    labels = [2, 3, 7, 100]
    got = edf.reindex(index=labels).to_pandas().set_index("k").sort_index()
    want = ppdf.reindex(labels).sort_index()
    pd.testing.assert_series_equal(got["a"], want["a"], check_dtype=False)
    assert [v if isinstance(v, str) else None for v in got["b"]] == \
           [v if isinstance(v, str) else None for v in want["b"]]


@pytest.mark.parametrize("method,labels", [
    ("ffill", [2, 3, 7, 100]),
    ("pad", [0, 5, 6]),
    ("bfill", [0, 3, 5]),
    ("backfill", [3, 8, 100]),
])
def test_reindex_method_fills(frames, method, labels):
    ppdf, edf = frames
    got = (edf.reindex(index=labels, method=method)
           .to_pandas().set_index("k").sort_index())
    want = ppdf.reindex(labels, method=method).sort_index()
    pd.testing.assert_series_equal(got["a"], want["a"], check_dtype=False)
    norm = lambda xs: [v if isinstance(v, str) else None for v in xs]  # noqa: E731
    assert norm(got["b"]) == norm(want["b"])


def test_reindex_exact_match_keeps_own_nulls(frames):
    """Label 2 exists with a=NaN: method='ffill' must return ITS row
    (NaN), not carry label 1's value — row semantics, like pandas."""
    ppdf, edf = frames
    got = (edf.reindex(index=[2], method="ffill")
           .to_pandas().set_index("k"))
    assert np.isnan(got.loc[2, "a"])
    assert got.loc[2, "b"] == "y"


def test_reindex_fill_value_only_new_cells(frames):
    ppdf, edf = frames
    got = (edf.reindex(index=[1, 2, 3], fill_value=0.0)
           .to_pandas().set_index("k").sort_index())
    want = ppdf.reindex([1, 2, 3], fill_value=0.0).sort_index()
    # existing null at label 2 survives; new label 3 fills
    pd.testing.assert_series_equal(got["a"], want["a"], check_dtype=False)
    # documented divergence: the fill CASTS into string columns
    assert got.loc[3, "b"] == "0.0"


def test_reindex_columns(frames):
    ppdf, edf = frames
    got = (edf.reindex(columns=["b", "zz"])
           .to_pandas().set_index("k").sort_index())
    want = ppdf.reindex(columns=["b", "zz"]).sort_index()
    assert list(got.columns) == list(want.columns)
    assert got["zz"].isna().all()
    assert got["b"].tolist() == want["b"].tolist()


def test_reindex_duplicate_axis_raises(spark):
    dup = es.DataFrame(
        spark.createDataFrame(pd.DataFrame({"k": [1, 1], "a": [1.0, 2.0]})),
        index_cols=("k",),
    )
    with pytest.raises(ValueError, match="duplicate axis"):
        dup.reindex(index=[1])


def test_reindex_method_duplicate_axis_raises(spark):
    """The driver-fold fast path fuses the duplicate-axis check into
    its one agg job — same ValueError, including the all-null-key
    duplicate case the fallback's groupBy count catches."""
    dup = es.DataFrame(
        spark.createDataFrame(pd.DataFrame({"k": [3, 3], "a": [1.0, 2.0]})),
        index_cols=("k",),
    )
    with pytest.raises(ValueError, match="duplicate axis"):
        dup.reindex(index=[1], method="ffill")
    nulldup = es.DataFrame(
        spark.createDataFrame(
            pd.DataFrame({"k": pd.array([None, None], dtype="Int64"),
                          "a": [1.0, 2.0]})),
        index_cols=("k",),
    )
    with pytest.raises(ValueError, match="duplicate axis"):
        nulldup.reindex(index=[1], method="bfill")


@pytest.mark.parametrize("method", ["ffill", "bfill"])
def test_reindex_fold_matches_global_fill_path(frames, method, monkeypatch):
    """Dual-path contract: the bounded driver-fold plan and the
    unbounded global-fill plan return identical rows (the fallback
    stays live for label lists over _REINDEX_FOLD_MAX)."""
    import eland_spark.frame as fmod

    _, edf = frames
    labels = [0, 2, 3, 5, 7, 100]
    fold = (edf.reindex(index=labels, method=method)
            .to_pandas().sort_values("k").reset_index(drop=True))
    monkeypatch.setattr(fmod, "_REINDEX_FOLD_MAX", -1)
    fallback = (edf.reindex(index=labels, method=method)
                .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(fold, fallback)


def test_reindex_bad_method_raises(frames):
    _, edf = frames
    with pytest.raises(ValueError, match="method"):
        edf.reindex(index=[1], method="nearest")


@pytest.fixture(scope="module")
def align_pair(spark, frames):
    ppdf, edf = frames
    pdf2 = pd.DataFrame({
        "k": [2, 4, 9],
        "a": [200.0, 400.0, 900.0],
        "c": [1, 2, 3],
    })
    edf2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))
    return ppdf, edf, pdf2.set_index("k"), edf2


@pytest.mark.parametrize("join", ["outer", "inner", "left", "right"])
def test_align_matches_pandas(align_pair, join):
    ppdf, edf, ppdf2, edf2 = align_pair
    gl, gr = edf.align(edf2, join=join)
    pl, pr = ppdf.align(ppdf2, join=join)
    gl = gl.to_pandas().set_index("k").sort_index()
    gr = gr.to_pandas().set_index("k").sort_index()
    pl, pr = pl.sort_index(), pr.sort_index()
    assert list(gl.columns) == list(pl.columns)
    assert list(gr.columns) == list(pr.columns)
    assert gl.index.tolist() == pl.index.tolist()
    for c in ("a", "c"):
        if c in pl.columns:
            pd.testing.assert_series_equal(
                gl[c], pl[c].astype("float64") if c == "c" else pl[c],
                check_dtype=False)
            pd.testing.assert_series_equal(gr[c], pr[c], check_dtype=False)


def test_align_axis_0_rows_only(align_pair):
    ppdf, edf, ppdf2, edf2 = align_pair
    gl, gr = edf.align(edf2, join="outer", axis=0)
    pl, pr = ppdf.align(ppdf2, join="outer", axis=0)
    gl = gl.to_pandas().set_index("k").sort_index()
    gr = gr.to_pandas().set_index("k").sort_index()
    # columns untouched per side
    assert list(gl.columns) == list(pl.sort_index().columns) == ["a", "b"]
    assert list(gr.columns) == list(pr.sort_index().columns) == ["a", "c"]
    assert gl.index.tolist() == pl.sort_index().index.tolist()


def test_align_axis_1_columns_only(align_pair):
    ppdf, edf, ppdf2, edf2 = align_pair
    gl, gr = edf.align(edf2, join="outer", axis=1)
    pl, pr = ppdf.align(ppdf2, join="outer", axis=1)
    gl = gl.to_pandas().set_index("k").sort_index()
    gr = gr.to_pandas().set_index("k").sort_index()
    assert list(gl.columns) == list(pl.columns) == ["a", "b", "c"]
    # row sets unchanged per side
    assert gl.index.tolist() == [1, 2, 4, 7]
    assert gr.index.tolist() == [2, 4, 9]


def test_align_validation(align_pair):
    _, edf, _, edf2 = align_pair
    with pytest.raises(ValueError, match="join"):
        edf.align(edf2, join="cross")
    with pytest.raises(ValueError, match="axis"):
        edf.align(edf2, axis=2)


def test_reindex_timestamp_index(spark):
    """reindex over a timestamp_ntz index: exact labels, missing
    labels, and ffill across irregular gaps all match pandas."""
    rng = pd.date_range("2024-05-01", periods=12, freq="7h")
    pdf = pd.DataFrame({"ts": rng, "v": np.arange(12.0)})
    pdf = pdf.drop(index=[3, 7])  # irregular holes
    edf = es.DataFrame(
        spark.createDataFrame(pdf, schema="ts timestamp_ntz, v double"),
        index_cols=("ts",),
    )
    ppdf = pdf.set_index("ts")
    labels = [
        pd.Timestamp("2024-05-01 00:00:00"),   # exact
        pd.Timestamp("2024-05-01 10:00:00"),   # between rows
        pd.Timestamp("2024-05-10 00:00:00"),   # past the end
        pd.Timestamp("2023-01-01 00:00:00"),   # before the start
    ]
    got = (edf.reindex(index=labels).to_pandas()
           .set_index("ts").sort_index()["v"])
    want = ppdf.reindex(labels)["v"].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)

    got = (edf.reindex(index=labels, method="ffill").to_pandas()
           .set_index("ts").sort_index()["v"])
    want = ppdf.reindex(labels, method="ffill")["v"].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_align_fill_value(align_pair):
    ppdf, edf, ppdf2, edf2 = align_pair
    gl, gr = edf.align(edf2, join="outer", fill_value=-1.0)
    pl, pr = ppdf.align(ppdf2, join="outer", fill_value=-1.0)
    gl = gl.to_pandas().set_index("k").sort_index()
    pl = pl.sort_index()
    # introduced cells (rows absent from the left) take the fill;
    # pre-existing nulls survive (cell-scope parity with reindex)
    assert gl.loc[9, "a"] == pl.loc[9, "a"] == -1.0
    gr = gr.to_pandas().set_index("k").sort_index()
    pr = pr.sort_index()
    assert gr.loc[1, "c"] == pr.loc[1, "c"] == -1.0


def test_new_ops_empty_frame_edges(spark):
    """Empty sources/labels: reindex yields all-null rows (ffill
    included — no preceding row exists), expanding/ewm/rolling-apply
    yield empty frames, align against an empty side works."""
    empty = es.DataFrame(
        spark.createDataFrame([], schema="k bigint, a double"),
        index_cols=("k",),
    )
    r = empty.reindex(index=[1, 2]).to_pandas()
    assert len(r) == 2 and r["a"].isna().all()
    rf = empty.reindex(index=[1], method="ffill").to_pandas()
    assert len(rf) == 1 and rf["a"].isna().all()
    assert len(empty.expanding().mean().to_pandas()) == 0
    assert len(empty.ewm(alpha=0.5).mean().to_pandas()) == 0
    assert len(empty.rolling(3).apply(lambda x: 1.0, raw=True)
               .to_pandas()) == 0
    other = es.DataFrame(
        spark.createDataFrame(pd.DataFrame({"k": [1], "a": [2.0]})),
        index_cols=("k",),
    )
    left, right = empty.align(other, join="outer")
    assert len(left.to_pandas()) == 1 and len(right.to_pandas()) == 1
    assert len(other.reindex(index=[]).to_pandas()) == 0
