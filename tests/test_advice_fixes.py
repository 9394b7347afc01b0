"""Regression tests for the round-1 ADVICE findings.

Each test pins one previously-latent bug:
- pivot_table(margins=True) with a non-string pivot column dtype
- merge_asof determinism under duplicate right (by, on) timestamps
- pack_documents with a string document-id column
- Series.map dict-type inference (leading None, mixed int+float)
- str.get_dummies category/column-name collisions
"""

import numpy as np
import pandas as pd
import pytest

import eland_spark as es
from eland_spark.operators.asof import merge_asof
from eland_spark.operators.packing import pack_documents


def test_pivot_table_margins_nonstring_columns(lineitem, lineitem_pd):
    # l_linenumber is an integer pivot column: Spark stringifies the
    # output column names, the All-row lookup must still hit.
    got = lineitem.pivot_table(
        "l_returnflag", "l_linenumber", "l_quantity", "mean", margins=True
    )
    exp = pd.pivot_table(
        lineitem_pd,
        index="l_returnflag",
        columns="l_linenumber",
        values="l_quantity",
        aggfunc="mean",
        margins=True,
    )
    assert list(got.index) == list(exp.index)
    assert len(got.columns) == len(exp.columns)
    # the All row must contain real totals, not silent Nones
    assert got.loc["All"].notna().all()
    assert np.allclose(
        got.values.astype(float), exp.values.astype(float), equal_nan=True
    )


def test_merge_asof_duplicate_right_timestamps(spark):
    # several right rows share (by, on): pandas picks the LAST input
    # right row for backward and the FIRST for forward; repeated runs
    # must agree with pandas, not an arbitrary tied row.
    left = pd.DataFrame(
        {"k": ["a", "a", "b"], "ts": [10, 20, 10], "lv": [1, 2, 3]}
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "ts": [10, 10, 10, 15, 15],
            "rv": [100, 200, 300, 400, 500],
        }
    )
    lsdf = spark.createDataFrame(left)
    rsdf = spark.createDataFrame(right)
    for direction in ("backward", "forward"):
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction=direction,
        ).sort_values(["k", "ts"])
        for _ in range(3):  # determinism across repeated runs
            got = (
                merge_asof(lsdf, rsdf, on="ts", by="k", direction=direction)
                .toPandas()
                .sort_values(["k", "ts"])
            )
            assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_pack_documents_string_ids(spark):
    pdf = pd.DataFrame(
        {"doc": [f"d{i:03d}" for i in range(50)], "tok": [7] * 50}
    )
    sdf = spark.createDataFrame(pdf).repartition(4)
    out = pack_documents(sdf, "doc", "tok", budget=20).toPandas()
    assert len(out) == 50
    assert out["doc"].map(type).eq(str).all()
    assert (out.groupby("bin_id")["tok"].sum() <= 20).all()


def test_series_map_type_inference(orders):
    pdf = orders.to_pandas()
    # leading None value: dtype must come from later non-null values
    m = {"O": None, "F": 2, "P": 3}
    got = orders["o_orderstatus"].map(m).to_pandas().sort_index()
    exp = pdf.set_index("o_orderkey").o_orderstatus.map(m).sort_index()
    assert (got.isna() == exp.isna()).all()
    assert (got.dropna() == exp.dropna()).all()
    # mixed int+float promotes to double rather than failing analysis
    m2 = {"O": 1, "F": 2.5, "P": 3}
    got2 = orders["o_orderstatus"].map(m2).to_pandas().sort_index()
    exp2 = pdf.set_index("o_orderkey").o_orderstatus.map(m2).sort_index()
    assert np.allclose(got2.values.astype(float), exp2.values.astype(float))
    # incompatible mixes raise a clear error up front
    with pytest.raises(TypeError, match="mix incompatible"):
        orders["o_orderstatus"].map({"O": 1, "F": "x"})


def test_get_dummies_collision_errors(spark, tmp_path):
    pdf = pd.DataFrame(
        {"tags": ["key;B", "B;D", "D"]}, index=pd.Index([1, 2, 3], name="key")
    )
    df = es.pandas_to_spark(pdf, spark, str(tmp_path / "gd.parquet"))
    # category "key" collides with the index column name
    with pytest.raises(ValueError, match="index column"):
        df["tags"].str.get_dummies(sep=";")
    # "c"/"C" collide case-insensitively once "key" is absent
    pdf2 = pd.DataFrame(
        {"tags": ["a;B", "B;c", "C"]}, index=pd.Index([1, 2, 3], name="key")
    )
    df2 = es.pandas_to_spark(pdf2, spark, str(tmp_path / "gd2.parquet"))
    with pytest.raises(ValueError, match="case-insensitively"):
        df2["tags"].str.get_dummies(sep=";")


def test_quantile_normalize_nan_reference_does_not_poison_landmarks(spark):
    # r6 ADVICE: a single NaN in the reference used to survive
    # exact_percentiles' null-only filter, sort above every double, and
    # poison the top landmark(s) — every high-rank input mapped to NaN.
    from eland_spark.operators.scaling import quantile_normalize

    ref_pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 5.0, float("nan")]})
    cur_pdf = pd.DataFrame({"x": [0.5, 2.5, 4.5, 5.0]})
    ref = spark.createDataFrame(ref_pdf)
    cur = spark.createDataFrame(cur_pdf)
    out = (
        quantile_normalize(cur, "x", ref, n_quantiles=11)
        .orderBy("x")
        .toPandas()
    )
    # all mapped values are finite and land inside the clean reference
    # range [1, 5]; the max-rank input maps to the clean max, not NaN
    assert np.isfinite(out["x_qn"]).all()
    assert (out["x_qn"] >= 1.0).all() and (out["x_qn"] <= 5.0).all()
    assert out["x_qn"].iloc[-1] == pytest.approx(5.0)


def test_keyed_midranks_rejects_unorderable_keys(spark):
    # r6 ADVICE: the per-key offsets come from Python sorted(), which
    # must match Spark's sort of the key column — null keys and
    # non-int/str dtypes now raise instead of silently diverging.
    from eland_spark.operators.ranking import keyed_midranks

    null_key = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "v": [1.0, 2.0], "n": [1, 1]})
    )
    with pytest.raises(ValueError, match="null keys"):
        keyed_midranks(null_key, "k", "v", "n")

    float_key = spark.createDataFrame(
        pd.DataFrame({"k": [1.5, 2.5], "v": [1.0, 2.0], "n": [1, 1]})
    )
    with pytest.raises(TypeError, match="key dtype"):
        keyed_midranks(float_key, "k", "v", "n")
