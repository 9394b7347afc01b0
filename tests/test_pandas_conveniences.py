"""Net-new pandas convenience surface on the frame (value_counts, isin,
equals, take, items, to_dict/records, add_prefix/suffix, squeeze)."""

import pandas as pd
import pytest

from eland_spark.frame import DataFrame as EDF


@pytest.fixture(scope="module")
def frame(spark):
    pdf = pd.DataFrame(
        {
            "x": ["a", "a", "b", None, "b"],
            "y": [1, 1, 2, 2, None],
            "_id": [0, 1, 2, 3, 4],
        }
    )
    sdf = spark.createDataFrame(pdf, schema="x string, y double, _id bigint")
    return pdf.set_index("_id"), EDF(sdf, index_cols=("_id",))


def test_value_counts_matches_pandas(frame):
    pdf, edf = frame
    got = edf.value_counts(subset=["x", "y"])
    exp = pdf.value_counts(subset=["x", "y"])
    assert got.to_dict() == exp.to_dict()
    # normalize + keep-na
    got = edf.value_counts(subset=["x"], normalize=True, dropna=False)
    exp = pdf.value_counts(subset=["x"], normalize=True, dropna=False)
    assert {k: pytest.approx(v) for k, v in got.to_dict().items()} == exp.to_dict()


def test_value_counts_high_cardinality_guard(spark):
    """VERDICT r4: value_counts on a high-cardinality subset raises
    instead of collecting the unbounded distinct-row set (same 10,000
    cap as get_dummies/pivot/crosstab)."""
    from eland_spark.frame import DataFrame as EDF

    sdf = spark.range(20_000).selectExpr("id AS _id", "id AS v")
    edf = EDF(sdf, index_cols=("_id",))
    with pytest.raises(ValueError, match="10000 distinct rows"):
        edf.value_counts(subset=["v"])


def test_isin_matches_pandas(frame):
    pdf, edf = frame
    got = edf.isin(["a", 2.0]).to_pandas().set_index("_id")
    exp = pdf.isin(["a", 2.0])
    assert got["x"].tolist() == exp["x"].tolist()
    assert got["y"].tolist() == exp["y"].tolist()
    got = edf.isin({"x": ["b"]}).to_pandas().set_index("_id")
    exp = pdf.isin({"x": ["b"]})
    assert got["x"].tolist() == exp["x"].tolist()
    assert got["y"].tolist() == exp["y"].tolist()


def test_equals(frame, spark):
    pdf, edf = frame
    same = EDF(
        spark.createDataFrame(
            pdf.reset_index()[["x", "y", "_id"]], schema="x string, y double, _id bigint"
        ),
        index_cols=("_id",),
    )
    assert edf.equals(same)
    assert not edf.equals(edf[edf["y"] > 1.0])
    assert not edf.equals(edf[["x"]])


def test_take_positional(frame):
    pdf, edf = frame
    got = edf.take([0, 2, -1]).to_pandas()["_id"].tolist()
    exp = pdf.take([0, 2, -1]).index.tolist()
    assert got == exp == [0, 2, 4]


def test_take_duplicates_and_out_of_range(frame):
    """ADVICE r2: duplicate positions must repeat rows (pandas
    semantics, not isin-collapse) and out-of-range must raise
    IndexError instead of silently dropping."""
    pdf, edf = frame
    got = sorted(edf.take([1, 1, 3]).to_pandas()["_id"].tolist())
    exp = sorted(pdf.take([1, 1, 3]).index.tolist())
    assert got == exp == [1, 1, 3]
    import pytest as _pytest

    with _pytest.raises(IndexError):
        edf.take([0, len(pdf)]).to_pandas()
    with _pytest.raises(IndexError):
        edf.take([-len(pdf) - 1]).to_pandas()


def test_items_to_dict_records_prefix_squeeze(frame):
    pdf, edf = frame
    names = [n for n, _ in edf.items()]
    assert sorted(names) == sorted(pdf.reset_index().columns)
    gd, ed = edf.to_dict()["y"], pdf.to_dict()["y"]
    assert gd.keys() == ed.keys()
    assert all(
        (pd.isna(gd[k]) and pd.isna(ed[k])) or gd[k] == ed[k] for k in ed
    )
    assert list(edf.to_records(index=True)[0]) == list(pdf.to_records(index=True)[0])
    # data columns renamed, the index column untouched
    assert list(edf.add_prefix("p_").columns) == ["p_x", "p_y", "_id"]
    assert list(edf.add_suffix("_s").columns) == ["x_s", "y_s", "_id"]
    s = edf[["y"]].squeeze()
    assert s.name == "y" and edf.squeeze() is edf


def test_str_partition_rpartition_rsplit(spark):
    """str.partition/rpartition (3-element arrays, first/last
    occurrence, null propagation) and rsplit (last-n separators) vs
    Python string semantics."""
    vals = ["a-b-c", "abc", "", "x-y", "-lead", "trail-", "a--b", None]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    from eland_spark.frame import DataFrame as _EDF

    edf = _EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    ps = pdf.set_index("_id")["s"]

    for name in ("partition", "rpartition"):
        got = getattr(edf["s"].str, name)("-").to_pandas().tolist()
        exp = [None if v is None else list(getattr(v, name)("-")) for v in ps]
        assert [None if g is None else list(g) for g in got] == exp, name

    for n in (-1, 0, 1, 2):
        got = edf["s"].str.rsplit("-", n=n).to_pandas().tolist()
        # pandas semantics: n=0 and n=-1 both mean "all splits"
        exp = [
            None if v is None else (v.rsplit("-", n) if n >= 1 else v.split("-"))
            for v in ps
        ]
        assert [None if g is None else list(g) for g in got] == exp, n


def test_str_rsplit_metachar_separator(spark):
    """ADVICE r2: rsplit with n >= 1 must treat a regex-metachar
    separator as LITERAL for both the split and the head re-join —
    previously the split ran pat as a regex while the join used it as
    a literal, corrupting the head (e.g. 'a\\s+b')."""
    vals = ["a.b.c", "x+y+z", "p|q", "nosep", None]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    from eland_spark.frame import DataFrame as _EDF

    edf = _EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    for sep in (".", "+", "|"):
        got = edf["s"].str.rsplit(sep, n=1).to_pandas().tolist()
        exp = [None if v is None else v.rsplit(sep, 1) for v in vals]
        assert [None if g is None else list(g) for g in got] == exp, sep


def test_dir_and_repr_html(frame):
    pdf, edf = frame
    d = dir(edf)
    assert "x" in d and "y" in d and "to_pandas" in d
    html = edf._repr_html_()
    assert html is not None and "<table" in html and ">x<" in html.replace(
        "th>", ">"
    ).replace("td>", ">") or "x" in html
    with pd.option_context("display.notebook_repr_html", False):
        assert edf._repr_html_() is None


@pytest.fixture(scope="module")
def ts_frame(spark):
    import numpy as np

    rng = pd.date_range("2024-03-01 00:00:00", periods=200, freq="37min")
    pdf = pd.DataFrame(
        {
            "ts": rng,
            "v": np.arange(200, dtype="float64"),
        }
    )
    sdf = spark.createDataFrame(pdf, schema="ts timestamp_ntz, v double")
    return pdf.set_index("ts"), EDF(sdf, index_cols=("ts",))


def test_truncate_matches_pandas(ts_frame):
    pdf, edf = ts_frame
    before, after = "2024-03-02 06:00:00", "2024-03-04 12:00:00"
    got = edf.truncate(before=before, after=after).to_pandas(set_index=True).sort_index()
    exp = pdf.truncate(before=before, after=after)
    assert list(got.index) == list(exp.index)
    assert list(got.v) == list(exp.v)
    # one-sided + validation
    assert len(edf.truncate(after=before).to_pandas()) == len(pdf.truncate(after=before))
    with pytest.raises(ValueError):
        edf.truncate(before=after, after=before)


def test_at_time_matches_pandas(ts_frame):
    pdf, edf = ts_frame
    got = edf.at_time("12:20").to_pandas(set_index=True).sort_index()
    exp = pdf.at_time("12:20")
    assert list(got.index) == list(exp.index) and len(got) > 0


def test_between_time_matches_pandas(ts_frame):
    pdf, edf = ts_frame
    for s, e in [("09:00", "17:00"), ("22:00", "03:00")]:  # incl. midnight wrap
        for inc in ("both", "neither", "left", "right"):
            got = edf.between_time(s, e, inclusive=inc).to_pandas(set_index=True).sort_index()
            exp = pdf.between_time(s, e, inclusive=inc)
            assert list(got.index) == list(exp.index), (s, e, inc)
    with pytest.raises(ValueError):
        edf.between_time("09:00", "10:00", inclusive="bogus")


def test_time_filters_need_datetime_index(frame):
    _, edf = frame
    with pytest.raises(TypeError):
        edf.at_time("09:00")


def test_first_last_valid_index_match_pandas(frame):
    pdf, edf = frame
    assert edf["y"].first_valid_index() == pdf["y"].first_valid_index()
    assert edf["y"].last_valid_index() == pdf["y"].last_valid_index()
    assert edf["x"].first_valid_index() == pdf["x"].first_valid_index()
    # all-null series -> None
    nul = pd.DataFrame({"z": [None, None], "_id": [0, 1]})
    sn = EDF(
        edf._sdf.sparkSession.createDataFrame(nul, schema="z double, _id bigint"),
        index_cols=("_id",),
    )
    assert sn["z"].first_valid_index() is None


def test_cumprod_matches_pandas(spark):
    import numpy as np

    pdf = pd.DataFrame(
        {
            "i": range(12),
            "x": [1.5, -2.0, 0.5, None, 3.0, 0.0, -1.0, 2.0, None, 4.0, -0.5, 1.0],
            "y": [2.0, 1.0, None, -1.0, 0.5, 2.0, 1.0, 0.0, 3.0, 1.0, 1.0, -2.0],
        }
    )
    sdf = spark.createDataFrame(pdf, schema="i bigint, x double, y double")
    edf = EDF(sdf, index_cols=("i",))
    got = edf["x"].cumprod().to_pandas(set_index=True).sort_index()
    exp = pdf.set_index("i")["x"].cumprod()
    import numpy.testing as npt

    npt.assert_allclose(
        got["cumprod"].values, exp.values, rtol=1e-12, equal_nan=True,
    )
    fr = edf[["x", "y"]].cumprod().to_pandas(set_index=True).sort_index()
    pexp = pdf.set_index("i")[["x", "y"]].cumprod()
    npt.assert_allclose(fr["x"].values, pexp["x"].values, rtol=1e-12, equal_nan=True)
    npt.assert_allclose(fr["y"].values, pexp["y"].values, rtol=1e-12, equal_nan=True)


def test_str_split_n_limit(spark):
    """split(n): at most n splits, remainder keeps its original
    separator text (pandas semantics; n=0 -> all splits)."""
    vals = ["a-b-c-d", "x", "", "lead-", None, "a--b-c"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    from eland_spark.frame import DataFrame as _EDF

    edf = _EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    for n in (-1, 0, 1, 2, 10):
        got = edf["s"].str.split("-", n=n).to_pandas().tolist()
        exp = [
            None if v is None else (v.split("-", n) if n >= 1 else v.split("-"))
            for v in vals
        ]
        assert [None if g is None else list(g) for g in got] == exp, n


def test_str_split_single_char_metachar_is_literal(spark):
    """pandas regex=None rule: a 1-char pat is a LITERAL separator even
    when it's a regex metacharacter — split('.') splits on dots, not on
    every character (ADVICE r3); multi-char pats stay regexes; rsplit
    agrees on the same separators."""
    vals = ["a.b.c", "a|b|c", "x", "", None, "..", "a.b|c"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    from eland_spark.frame import DataFrame as _EDF

    edf = _EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    for pat in (".", "|", "$", "*"):
        for n in (-1, 1, 2):
            got = edf["s"].str.split(pat, n=n).to_pandas().tolist()
            exp = [
                None if v is None
                else (v.split(pat, n) if n >= 1 else v.split(pat))
                for v in vals
            ]
            assert [None if g is None else list(g) for g in got] == exp, (pat, n)
        # rsplit full-split path takes the same literal rule
        got = edf["s"].str.rsplit(pat).to_pandas().tolist()
        exp = [None if v is None else v.split(pat) for v in vals]
        assert [None if g is None else list(g) for g in got] == exp, pat
        # rsplit n>=1 (already-literal path) agrees with pandas
        got = edf["s"].str.rsplit(pat, n=1).to_pandas().tolist()
        exp = [None if v is None else v.rsplit(pat, 1) for v in vals]
        assert [None if g is None else list(g) for g in got] == exp, pat
    # multi-char pat stays a regex
    got = edf["s"].str.split(r"[.|]").to_pandas().tolist()
    import re as _re

    exp = [None if v is None else _re.split(r"[.|]", v) for v in vals]
    assert [None if g is None else list(g) for g in got] == exp


def test_concat_axis1_matches_pandas(spark):
    """concat(axis=1) outer/inner index alignment vs pandas, including
    mismatched indexes (outer fills null, inner intersects) and NaN
    columns from the alignment."""
    from eland_spark.frame import concat

    lp = pd.DataFrame({"_id": [1, 2, 3, 5], "a": [10.0, 20, 30, 50]})
    rp = pd.DataFrame({"_id": [2, 3, 4], "b": ["x", "y", "z"]})
    el = EDF(spark.createDataFrame(lp, schema="_id bigint, a double"),
             index_cols=("_id",))
    er = EDF(spark.createDataFrame(rp, schema="_id bigint, b string"),
             index_cols=("_id",))

    for join in ("outer", "inner"):
        got = (
            concat([el, er], axis=1, join=join)
            .to_pandas(set_index=True)
            .sort_index()
        )
        exp = pd.concat(
            [lp.set_index("_id"), rp.set_index("_id")], axis=1, join=join
        ).sort_index()
        assert got.index.tolist() == exp.index.tolist(), join
        for c in ("a", "b"):
            for g, e in zip(got[c].tolist(), exp[c].tolist()):
                if e is None or (isinstance(e, float) and pd.isna(e)):
                    assert g is None or pd.isna(g), (join, c, g, e)
                else:
                    assert g == e, (join, c, g, e)


def test_concat_axis1_collision_suffix_and_errors(spark):
    """Colliding column names take a positional _{i} suffix (documented
    divergence: pandas keeps duplicate labels); frames without an index
    raise; 3-frame fold works."""
    from eland_spark.frame import concat

    lp = pd.DataFrame({"_id": [1, 2], "v": [1.0, 2.0]})
    rp = pd.DataFrame({"_id": [1, 2], "v": [3.0, 4.0]})
    el = EDF(spark.createDataFrame(lp, schema="_id bigint, v double"),
             index_cols=("_id",))
    er = EDF(spark.createDataFrame(rp, schema="_id bigint, v double"),
             index_cols=("_id",))
    out = concat([el, er, er], axis=1)
    assert [c for c in out.columns if c != "_id"] == ["v", "v_1", "v_2"]
    got = out.to_pandas(set_index=True).sort_index()
    assert got["v"].tolist() == [1.0, 2.0]
    assert got["v_1"].tolist() == [3.0, 4.0]
    assert got["v_2"].tolist() == [3.0, 4.0]

    noidx = EDF(spark.createDataFrame(lp, schema="_id bigint, v double"))
    with pytest.raises(ValueError, match="index"):
        concat([noidx, er], axis=1)
    with pytest.raises(ValueError, match="join"):
        concat([el, er], axis=1, join="left")


def test_frame_apply_axis1_matches_pandas(spark):
    """DataFrame.apply(axis=1): row Series in, scalar out, Arrow-batched."""
    pdf = pd.DataFrame(
        {"_id": [0, 1, 2, 3], "x": [1.0, 2.0, None, 4.0], "y": [10.0, 20.0, 30.0, 40.0]}
    )
    edf = EDF(
        spark.createDataFrame(pdf, schema="_id bigint, x double, y double"),
        index_cols=("_id",),
    )
    fn = lambda row: row["y"] - (0.0 if pd.isna(row["x"]) else row["x"])
    got = edf.apply(fn, axis=1).to_pandas().tolist()
    exp = pdf.set_index("_id").apply(fn, axis=1).tolist()
    assert got == exp

    with pytest.raises(NotImplementedError):
        edf.apply(sum, axis=0)


def test_applymap_matches_pandas(spark):
    """applymap / map: elementwise over every column, per-column
    pandas_udf, type-preserving by default."""
    pdf = pd.DataFrame({"_id": [0, 1, 2], "x": [1.0, None, 3.0], "y": [4.0, 5.0, 6.0]})
    edf = EDF(
        spark.createDataFrame(pdf, schema="_id bigint, x double, y double"),
        index_cols=("_id",),
    )
    fn = lambda v: v if pd.isna(v) else v * 2 + 1
    got = edf[["x", "y"]].applymap(fn).to_pandas(set_index=True).sort_index()
    exp = pdf.set_index("_id")[["x", "y"]].applymap(fn)
    for c in ("x", "y"):
        for g, e in zip(got[c].tolist(), exp[c].tolist()):
            if pd.isna(e):
                assert g is None or pd.isna(g)
            else:
                assert g == e
    # pandas 2.1 spelling
    got2 = edf[["x"]].map(fn).to_pandas(set_index=True).sort_index()
    assert got2["x"].dropna().tolist() == exp["x"].dropna().tolist()


def test_str_extract_expand_and_named_groups(spark):
    """str.extract pandas semantics: expand=True -> one column per
    group (named groups keep names, unnamed get positional labels),
    expand=False single group -> Series; no match -> null."""
    vals = ["a12-x", "b-7", "zzz", None, "q99-abc33-t"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    edf = EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    ps = pdf.set_index("_id")["s"]

    got = (
        edf["s"].str.extract(r"(?P<num>\d+)-(?P<tail>[a-z]+)")
        .to_pandas(set_index=True).sort_index()
    )
    exp = ps.str.extract(r"(?P<num>\d+)-(?P<tail>[a-z]+)")
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        for g, e in zip(got[c].tolist(), exp[c].tolist()):
            if pd.isna(e):
                assert g is None or pd.isna(g), (c, g, e)
            else:
                assert g == e, (c, g, e)

    got_s = edf["s"].str.extract(r"(\d+)", expand=False).to_pandas().tolist()
    exp_s = ps.str.extract(r"(\d+)", expand=False).tolist()
    for g, e in zip(got_s, exp_s):
        assert (g == e) or (pd.isna(e) and (g is None or pd.isna(g)))

    with pytest.raises(ValueError, match="capture"):
        edf["s"].str.extract(r"\d+")


def test_str_extractall_matches_pandas(spark):
    """str.extractall: every non-overlapping match becomes a row keyed
    by (index, match); no-match rows drop out."""
    vals = ["a1 b22 c333", "x9", "none here", None, "7 8"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    edf = EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    ps = pdf.set_index("_id")["s"]

    got = (
        edf["s"].str.extractall(r"(?P<d>\d+)")
        .to_pandas(set_index=True).sort_index()
    )
    exp = ps.str.extractall(r"(?P<d>\d+)").sort_index()
    assert got.index.tolist() == exp.index.tolist()
    assert got["d"].tolist() == exp["d"].tolist()

    # two groups
    got2 = (
        edf["s"].str.extractall(r"([a-z])(\d+)")
        .to_pandas(set_index=True).sort_index()
    )
    exp2 = ps.str.extractall(r"([a-z])(\d+)").sort_index()
    assert got2.index.tolist() == exp2.index.tolist()
    assert got2["0"].tolist() == exp2[0].tolist()
    assert got2["1"].tolist() == exp2[1].tolist()


def test_concat_axis1_mismatched_index_names(spark):
    """Frames align POSITIONALLY on index values even when the index
    column NAMES differ, and a data column named like the target index
    gets suffixed before the index rename lands (no duplicate-column
    ambiguity)."""
    from eland_spark.frame import concat

    lp = pd.DataFrame({"_id": [1, 2], "v": [1.0, 2.0]})
    rp = pd.DataFrame({"key": [2, 3], "_id": [90, 91], "w": [5.0, 6.0]})
    el = EDF(spark.createDataFrame(lp, schema="_id bigint, v double"),
             index_cols=("_id",))
    er = EDF(
        spark.createDataFrame(rp, schema="key bigint, _id bigint, w double"),
        index_cols=("key",),
    )
    out = concat([el, er], axis=1).to_pandas().set_index("_id").sort_index()
    # er's index 'key' aligned onto '_id'; er's DATA column '_id'
    # suffixed to _id_1
    assert set(out.columns) == {"v", "_id_1", "w"}
    assert out.index.tolist() == [1, 2, 3]
    assert out.loc[2, "w"] == 5.0 and out.loc[2, "v"] == 2.0
    assert out.loc[3, "_id_1"] == 91.0
    assert pd.isna(out.loc[1, "w"])


def test_str_regex_flags_match_pandas(spark):
    """re-module flags thread through contains/match/fullmatch/count/
    extract/extractall as the inline (?imsx) prefix both regex engines
    understand."""
    import re as _re

    vals = ["Alpha", "ALPHA beta", "gamma", None, "al\npha"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(len(vals))})
    edf = EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    ps = pdf.set_index("_id")["s"]

    def eq(got, exp):
        for g, e in zip(got.to_pandas().tolist(), exp.tolist()):
            if e is None or (isinstance(e, float) and pd.isna(e)):
                assert g is None or pd.isna(g), (g, e)
            else:
                assert g == e, (g, e)

    eq(edf["s"].str.contains("alpha", flags=_re.I),
       ps.str.contains("alpha", flags=_re.I))
    eq(edf["s"].str.match("alpha", flags=_re.I),
       ps.str.match("alpha", flags=_re.I))
    eq(edf["s"].str.fullmatch("alpha", flags=_re.I),
       ps.str.fullmatch("alpha", flags=_re.I))
    eq(edf["s"].str.count("a", flags=_re.I), ps.str.count("a", flags=_re.I))
    eq(edf["s"].str.extract(r"(al.ha)", expand=False, flags=_re.I | _re.S),
       ps.str.extract(r"(al.ha)", expand=False, flags=_re.I | _re.S))
    got = (
        edf["s"].str.extractall(r"(a)", flags=_re.I)
        .to_pandas(set_index=True).sort_index()
    )
    exp = ps.str.extractall(r"(a)", flags=_re.I).sort_index()
    assert got.index.tolist() == exp.index.tolist()
    assert got["0"].tolist() == exp[0].tolist()


def test_sample_weights(spark):
    """sample(n, weights=col): exactly n rows, zero-weight rows never
    sampled, heavy weights dominate over many seeds, deterministic for
    a fixed seed."""
    pdf = pd.DataFrame(
        {
            "_id": range(40),
            "w": [1000.0] * 4 + [0.0] * 4 + [0.001] * 32,
        }
    )
    edf = EDF(
        spark.createDataFrame(pdf, schema="_id bigint, w double"),
        index_cols=("_id",),
    )
    got = edf.sample(n=4, weights="w", random_state=7).to_pandas()
    assert len(got) == 4
    assert not set(got["_id"]) & set(range(4, 8))  # zero weights excluded
    # heavy rows (ids 0-3, weight 1e6x) should dominate the sample
    assert len(set(got["_id"]) & set(range(4))) >= 3
    again = edf.sample(n=4, weights="w", random_state=7).to_pandas()
    assert sorted(got["_id"]) == sorted(again["_id"])  # deterministic
    with pytest.raises(NotImplementedError):
        edf.sample(frac=0.5, weights="w")


def test_json_normalize(spark):
    """json_normalize: inferred and explicit schemas, prefix, name
    collisions, unparseable rows -> nulls, raw column kept/dropped."""
    vals = ['{"a": 1, "b": "x"}', '{"a": 2}', "not json", None,
            '{"a": 4, "b": "y", "extra": 9.5}']
    pdf = pd.DataFrame({"_id": range(5), "j": vals, "a": [10] * 5})
    edf = EDF(
        spark.createDataFrame(pdf, schema="_id bigint, j string, a bigint"),
        index_cols=("_id",),
    )
    out = edf.json_normalize("j")
    # existing column 'a' collides -> parsed field suffixed
    assert "a" in out.columns and "a_" in out.columns
    got = out.to_pandas(set_index=True).sort_index()
    assert got["a"].tolist() == [10] * 5
    assert got["a_"].dropna().tolist() == [1, 2, 4]
    assert got["b"].dropna().tolist() == ["x", "y"]
    assert got["extra"].dropna().tolist() == [9.5]
    assert "j" not in out.columns  # drop=True default

    out2 = edf.json_normalize("j", prefix="p_", schema="a BIGINT, b STRING",
                              drop=False)
    assert {"p_a", "p_b", "j"} <= set(out2.columns)
    g2 = out2.to_pandas(set_index=True).sort_index()
    assert g2["p_a"].dropna().tolist() == [1, 2, 4]

    with pytest.raises(ValueError, match="struct"):
        edf.json_normalize("j", schema="BIGINT")


def test_merge_ordered_matches_pandas(spark):
    """merge_ordered vs pandas: per-group replication of the right
    frame, ordered outer alignment, group-wise ffill, suffixing of
    colliding columns."""
    import eland_spark as es

    lp = pd.DataFrame(
        {"g": ["a", "a", "b", "b"], "t": [1, 3, 1, 4],
         "v": [10.0, 30.0, 100.0, 400.0]}
    )
    rp = pd.DataFrame({"t": [2, 3], "v": [0.2, 0.3]})
    el = EDF(spark.createDataFrame(lp))
    er = EDF(spark.createDataFrame(rp))

    got = (
        es.merge_ordered(el, er, on="t", left_by="g", fill_method="ffill")
        .to_pandas(set_index=True).sort_index()
    )
    exp = (
        pd.merge_ordered(lp, rp, on="t", left_by="g", fill_method="ffill")
        .set_index(["g", "t"]).sort_index()
    )
    assert list(got.columns) == list(exp.columns) == ["v_x", "v_y"]
    for c in exp.columns:
        for g, e in zip(got[c].tolist(), exp[c].tolist()):
            assert (g == e) or (pd.isna(e) and (g is None or pd.isna(g))), (c, g, e)

    with pytest.raises(ValueError, match="fill_method"):
        es.merge_ordered(el, er, on="t", fill_method="bfill")


def test_str_translate_matches_python(spark):
    """str.translate: 1:1 maps + deletions via one JVM translate."""
    vals = ["abcabc", "xyz", "", None, "aXbXc"]
    pdf = pd.DataFrame({"s": pd.Series(vals, dtype="object"), "_id": range(5)})
    edf = EDF(
        spark.createDataFrame(pdf, schema="s string, _id bigint"),
        index_cols=("_id",),
    )
    table = str.maketrans({"a": "1", "b": None, "X": "_"})
    got = edf["s"].str.translate(table).to_pandas().tolist()
    exp = [None if v is None else v.translate(table) for v in vals]
    assert got == exp

    with pytest.raises(ValueError, match="1:1"):
        edf["s"].str.translate(str.maketrans({"a": "long"}))


class TestWideToLong:
    def _frame(self, spark, pdf):
        import eland_spark as es

        return es.DataFrame(spark.createDataFrame(pdf))

    def _cmp(self, got_df, pdf, stubs, i, j, **kw):
        import pandas as pd

        want = (
            pd.wide_to_long(pdf, stubs, i=i, j=j, **kw)
            .reset_index()
        )
        got = got_df.to_pandas().reset_index()
        cols = sorted(want.columns)
        key = [i] if isinstance(i, str) else list(i)
        got = got[cols].sort_values(key + [j]).reset_index(drop=True)
        want = want[cols].sort_values(key + [j]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_numeric_suffix_int_j(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "famid": [1, 1, 2], "birth": [1, 2, 1],
            "ht1": [2.8, 2.9, 2.2], "ht2": [3.4, 3.8, 2.9],
            "extra": ["x", "y", "z"],
        })
        out = es.wide_to_long(self._frame(spark, pdf), "ht",
                              i=["famid", "birth"], j="age")
        assert out.index_cols == ("famid", "birth", "age")
        # j converted to int because every suffix parses
        assert dict(out.to_spark().dtypes)["age"] in ("int", "bigint")
        self._cmp(out, pdf, "ht", ["famid", "birth"], "age")

    def test_string_suffix_and_missing_combo(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "id": [1, 2], "Aone": [1, 2], "Atwo": [3, 4],
            "Bone": [5.0, 6.0],
        })
        out = es.wide_to_long(self._frame(spark, pdf), ["A", "B"],
                              i="id", j="k", suffix="(one|two)")
        assert dict(out.to_spark().dtypes)["k"] == "string"
        self._cmp(out, pdf, ["A", "B"], "id", "k", suffix="(one|two)")

    def test_sep(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"id": [1], "x_1": [10], "x_2": [20]})
        out = es.wide_to_long(self._frame(spark, pdf), "x",
                              i="id", j="t", sep="_")
        self._cmp(out, pdf, "x", "id", "t", sep="_")

    def test_no_match_raises(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"id": [1], "zzz": [1]})
        with pytest.raises(ValueError):
            es.wide_to_long(self._frame(spark, pdf), "x", i="id", j="t")

    def test_zero_shuffle_plan(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"id": [1], "a1": [1], "a2": [2]})
        out = es.wide_to_long(self._frame(spark, pdf), "a", i="id", j="t")
        plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_pad_family_negative_and_zero_width(spark):
    """pandas: width <= len(s) (including negative) is a no-op for the
    whole pad family — pinned here after the r3 negative-index audit."""
    import pandas as pd

    import eland_spark as es

    pdf = pd.DataFrame({"k": [0, 1, 2], "t": ["abc", "a", ""]})
    df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["t"]
    for name, ours, want in [
        ("pad-2", df["t"].str.pad(-2), ps.str.pad(-2)),
        ("zfill-1", df["t"].str.zfill(-1), ps.str.zfill(-1)),
        ("ljust0", df["t"].str.ljust(0), ps.str.ljust(0)),
        ("rjust-9", df["t"].str.rjust(-9), ps.str.rjust(-9)),
        ("center0", df["t"].str.center(0), ps.str.center(0)),
    ]:
        assert ours.to_pandas().sort_index().tolist() == want.tolist(), name


class TestGetDummiesFrame:
    def test_matches_pandas(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "k": [0, 1, 2, 3],
            "cat": ["a", "b", "a", None],
            "n": [1.5, 2.5, 3.5, 4.5],
        })
        df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        got = (es.get_dummies(df, columns=["cat"]).to_pandas()
               .set_index("k").sort_index())
        want = pd.get_dummies(pdf.set_index("k"), columns=["cat"]).sort_index()
        assert sorted(got.columns) == sorted(want.columns)
        for c in want.columns:
            assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c

    def test_default_encodes_all_string_columns(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"k": [0, 1], "a": ["x", "y"], "n": [1, 2]})
        df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        got = df.get_dummies()
        # index column k rides along un-encoded (repo convention: the
        # index is part of columns)
        assert sorted(got.columns) == ["a_x", "a_y", "k", "n"]

    def test_drop_first_and_dummy_na_and_prefix(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"k": [0, 1, 2], "c": ["a", "b", None]})
        df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        got = (df.get_dummies(columns=["c"], drop_first=True, dummy_na=True,
                              prefix="z", prefix_sep="|")
               .to_pandas().set_index("k").sort_index())
        want = pd.get_dummies(pdf.set_index("k"), columns=["c"],
                              drop_first=True, dummy_na=True,
                              prefix="z", prefix_sep="|").sort_index()
        # pandas names the NA column 'z|nan'
        assert sorted(got.columns) == sorted(want.columns)
        for c in want.columns:
            assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c

    def test_zero_shuffle_encoding(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"k": [0, 1], "c": ["a", "b"]})
        df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        out = df.get_dummies(columns=["c"]).to_spark()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_missing_column_raises(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"k": [0], "c": ["a"]})
        df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        with pytest.raises(KeyError):
            df.get_dummies(columns=["zzz"])


class TestCrosstabMarginsNormalize:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", "q"],
        })
        return es.DataFrame(spark.createDataFrame(pdf)), pdf

    @pytest.mark.parametrize("normalize", [False, True, "all", "index", "columns"])
    @pytest.mark.parametrize("margins", [False, True])
    def test_matches_pandas(self, frames, normalize, margins):
        import pandas as pd

        df, pdf = frames
        got = df.crosstab("a", "b", margins=margins, normalize=normalize)
        want = pd.crosstab(pdf.a, pdf.b, margins=margins, normalize=normalize)
        got.index.name, got.columns.name = want.index.name, want.columns.name
        pd.testing.assert_frame_equal(
            got.astype(float), want.astype(float),
            check_names=False, check_dtype=False,
        )

    def test_invalid_normalize(self, frames):
        df, _ = frames
        with pytest.raises(ValueError):
            df.crosstab("a", "b", normalize="rows")


def test_explode_multi_column_zips(spark):
    """Multi-column explode zips element-wise like pandas 1.3+;
    single-column path unchanged; mismatched lengths null-pad
    (documented divergence: pandas raises)."""
    import pandas as pd

    import eland_spark as es

    pdf = pd.DataFrame({
        "k": [0, 1, 2],
        "a": [[1, 2], [3], None],
        "b": [["x", "y"], ["z"], None],
    })
    df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    got = (df.explode(["a", "b"]).to_pandas()
           .sort_values(["k", "a"], na_position="last")
           .reset_index(drop=True))
    want = (pdf.explode(["a", "b"]).reset_index(drop=True)
            .sort_values(["k", "a"], na_position="last")
            .reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    assert [x if pd.notna(x) else None for x in got["a"]] == \
           [x if pd.notna(x) else None for x in want["a"]]
    assert [x if pd.notna(x) else None for x in got["b"]] == \
           [x if pd.notna(x) else None for x in want["b"]]
    # mismatched lengths: null-pad (divergence; pandas raises)
    pdf2 = pd.DataFrame({"k": [0], "a": [[1, 2]], "b": [["x"]]})
    df2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))
    rows = (df2.explode(["a", "b"]).to_pandas()
            .sort_values("a").reset_index(drop=True))
    assert rows["a"].tolist() == [1, 2]
    assert rows["b"][0] == "x" and pd.isna(rows["b"][1])
    # keep_empty=False drops the all-null row
    assert len(df.explode(["a", "b"], keep_empty=False).to_pandas()) == 3


def test_explode_multi_column_one_null_array(spark):
    """ADVICE r4 (frame.py explode): a NULL array among non-null
    siblings must not collapse the row — pandas treats a None cell as
    one scalar-null element, so the siblings' elements survive."""
    import pandas as pd

    import eland_spark as es

    pdf = pd.DataFrame({
        "k": [0, 1, 2],
        "a": [[1, 2], None, None],
        "b": [[10, 20], [7], None],
    })
    df = es.DataFrame(spark.createDataFrame(
        pdf, schema="k long, a array<long>, b array<long>"
    ), index_cols=("k",))
    got = (df.explode(["a", "b"]).to_pandas()
           .sort_values(["k", "b"], na_position="last")
           .reset_index(drop=True))
    # pandas: (1,10),(2,20),(None,7),(None,None)
    want = (pdf.explode(["a", "b"])
            .sort_values(["k", "b"], na_position="last")
            .reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist() == [0, 0, 1, 2]
    for c in ("a", "b"):
        assert [None if pd.isna(x) else int(x) for x in got[c]] == \
               [None if pd.isna(x) else int(x) for x in want[c]], c
    # keep_empty=False: all-null row drops, null-among-siblings stays
    inner = (df.explode(["a", "b"], keep_empty=False).to_pandas()
             .sort_values(["k", "b"], na_position="last"))
    assert inner["k"].tolist() == [0, 0, 1]
    assert [None if pd.isna(x) else int(x) for x in inner["a"]] == [1, 2, None]


def test_str_unicode_classes_and_new_methods(spark):
    """isdecimal/isdigit/isnumeric/isalpha/isalnum on unicode input,
    encode/decode round-trip, index/rindex, wrap, normalize — all vs
    pandas."""
    import pandas as pd

    import eland_spark as es

    vals = ["abc", "ABC1", "١٢٣", "²", "Ⅻ", "3.14", "", "héllo", "a b"]
    pdf = pd.DataFrame({"k": range(len(vals)), "t": vals})
    df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["t"]

    def got(series):
        return series.to_pandas().sort_index().tolist()

    for name in ["isdecimal", "isdigit", "isnumeric", "isalpha", "isalnum"]:
        ours = got(getattr(df["t"].str, name)())
        want = getattr(ps.str, name)().tolist()
        assert ours == want, (name, ours, want)

    # find/index agree where present; -1 instead of raise when absent
    assert got(df["t"].str.index("b")) == [ps.str.find("b")[k] for k in ps.index]
    assert got(df["t"].str.rindex("b")) == [ps.str.rfind("b")[k] for k in ps.index]

    # encode -> binary -> decode round-trips
    enc = df["t"].str.encode("utf-8")
    assert got(enc) == [v.encode() for v in vals]
    back = enc.str.decode("utf-8")
    assert got(back) == vals

    # wrap + normalize (Arrow escape hatch)
    assert got(df["t"].str.wrap(3)) == ps.str.wrap(3).tolist()
    comp = ["école", "abc"]  # e + combining acute
    pdf2 = pd.DataFrame({"k": [0, 1], "t": comp})
    df2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))
    ps2 = pdf2.set_index("k")["t"]
    assert (df2["t"].str.normalize("NFC").to_pandas().sort_index().tolist()
            == ps2.str.normalize("NFC").tolist())
    with pytest.raises(ValueError):
        df2["t"].str.normalize("XXX")


class TestComparisonAndValidityHelpers:
    @pytest.fixture(scope="class")
    def df(self, spark):
        import numpy as np
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "k": [0, 1, 2, 3],
            "a": [1.0, np.nan, 3.0, 5.0],
            "s": ["x", "y", None, "5"],
        })
        return es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",)), pdf

    def test_eq_ne_null_semantics(self, df):
        edf, pdf = df
        got = edf.eq(3.0).to_pandas().set_index("k").sort_index()
        want = pdf.set_index("k").eq(3.0)
        assert got["a"].tolist() == want["a"].tolist()
        assert got["s"].tolist() == want["s"].tolist()  # all False
        got = edf.ne(3.0).to_pandas().set_index("k").sort_index()
        want = pdf.set_index("k").ne(3.0)
        assert got["a"].tolist() == want["a"].tolist()  # NaN ne -> True
        assert got["s"].tolist() == want["s"].tolist()

    def test_ordered_compare(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({"k": [0, 1, 2], "a": [1.0, None, 9.0]})
        edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        got = edf.lt(5).to_pandas().set_index("k").sort_index()["a"].tolist()
        assert got == pdf.set_index("k").lt(5)["a"].tolist()
        got = edf.ge(1.0).to_pandas().set_index("k").sort_index()["a"].tolist()
        assert got == pdf.set_index("k").ge(1.0)["a"].tolist()

    def test_ordered_compare_type_error(self, df):
        edf, _ = df
        with pytest.raises(TypeError):
            edf.lt(5)  # string column present

    def test_first_last_valid_index(self, spark):
        import pandas as pd

        import eland_spark as es

        pdf = pd.DataFrame({
            "k": [10, 20, 30, 40],
            "a": [None, 1.0, 2.0, None],
            "b": [None, None, "x", None],
        })
        edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
        assert edf.first_valid_index() == 20
        assert edf.last_valid_index() == 30
        empty = es.DataFrame(
            spark.createDataFrame(pd.DataFrame({"k": [1], "a": [None]}),
                                  schema="k bigint, a double"),
            index_cols=("k",),
        )
        assert empty.first_valid_index() is None

    def test_copy_is_same_plan(self, df):
        edf, _ = df
        c = edf.copy()
        assert c is not edf
        assert c.to_pandas().equals(edf.to_pandas())

    def test_corrwith(self, spark):
        import numpy as np
        import pandas as pd

        import eland_spark as es

        rng = np.random.RandomState(3)
        pdf1 = pd.DataFrame({"k": range(50), "a": rng.randn(50),
                             "b": rng.randn(50)})
        pdf2 = pd.DataFrame({"k": range(50), "a": rng.randn(50),
                             "b": pdf1["b"] * 2 + 1})
        d1 = es.DataFrame(spark.createDataFrame(pdf1), index_cols=("k",))
        d2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))
        got = d1.corrwith(d2).sort_index()
        want = pdf1.set_index("k").corrwith(pdf2.set_index("k")).sort_index()
        pd.testing.assert_series_equal(got, want, rtol=1e-9,
                                       check_names=False)
        with pytest.raises(ValueError):
            es.DataFrame(spark.createDataFrame(pdf1)).corrwith(d2)


def test_frame_rolling_matches_pandas(spark):
    """Frame-level rolling applies to every numeric column in one
    bucket-overlap pass; matches pandas per column incl. min_periods
    and nulls."""
    import numpy as np
    import pandas as pd

    import eland_spark as es

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "k": range(40),
        "a": rng.randn(40).round(3),
        "b": rng.randn(40).round(3),
        "s": ["x"] * 40,
    })
    pdf.loc[5, "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))

    got = edf.rolling(7, min_periods=3).mean().to_pandas().set_index("k").sort_index()
    want = pdf.set_index("k")[["a", "b"]].rolling(7, min_periods=3).mean()
    pd.testing.assert_frame_equal(got[["a", "b"]], want, rtol=1e-9)

    multi = (edf.rolling(4).agg(["sum", "count"])
             .to_pandas().set_index("k").sort_index())
    want_sum = pdf.set_index("k")[["a", "b"]].rolling(4).sum()
    pd.testing.assert_series_equal(
        multi["a_sum"], want_sum["a"], check_names=False, rtol=1e-9
    )

    with pytest.raises(ValueError):
        edf.rolling(0)
    with pytest.raises(ValueError):
        edf.rolling(3).agg("median")


def test_update_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    import eland_spark as es

    base = pd.DataFrame({
        "k": [1, 2, 3, 4],
        "a": [1.0, 2.0, np.nan, 4.0],
        "b": ["w", "x", "y", "z"],
        "only_mine": [10, 20, 30, 40],
    })
    other = pd.DataFrame({
        "k": [2, 3, 9],
        "a": [99.0, np.nan, 7.0],
        "b": [None, "NEW", "n/a"],
    })
    d1 = es.DataFrame(spark.createDataFrame(base), index_cols=("k",))
    d2 = es.DataFrame(spark.createDataFrame(other), index_cols=("k",))

    got = (d1.update(d2).to_pandas().set_index("k").sort_index())
    want = base.set_index("k").copy()
    want.update(other.set_index("k"))
    for c in ["a", "b", "only_mine"]:
        assert [x if pd.notna(x) else None for x in got[c]] == \
               [x if pd.notna(x) else None for x in want[c]], c

    got_nf = (d1.update(d2, overwrite=False)
              .to_pandas().set_index("k").sort_index())
    want_nf = base.set_index("k").copy()
    want_nf.update(other.set_index("k"), overwrite=False)
    for c in ["a", "b"]:
        assert [x if pd.notna(x) else None for x in got_nf[c]] == \
               [x if pd.notna(x) else None for x in want_nf[c]], c

    with pytest.raises(ValueError):
        es.DataFrame(spark.createDataFrame(base)).update(d2)


def test_rolling_std_var_match_pandas(spark):
    import numpy as np
    import pandas as pd

    import eland_spark as es

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"k": range(60), "a": rng.randn(60).round(3)})
    pdf.loc[[7, 8], "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["a"]

    got = (edf["a"].rolling(9, min_periods=4).std()
           .to_pandas(set_index=True).sort_index()["rolling_std"])
    want = ps.rolling(9, min_periods=4).std()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-9)

    gotf = (edf.rolling(5).var().to_pandas().set_index("k").sort_index()["a"])
    wantf = ps.rolling(5).var()
    pd.testing.assert_series_equal(gotf, wantf, check_names=False, rtol=1e-9)


def test_expanding_std_var_match_pandas(spark):
    import numpy as np
    import pandas as pd

    import eland_spark as es

    rng = np.random.RandomState(17)
    pdf = pd.DataFrame({"k": range(70), "a": rng.randn(70).round(3)})
    pdf.loc[[0, 9], "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["a"]

    got = (edf["a"].expanding(min_periods=3).std()
           .to_pandas(set_index=True).sort_index()["expanding_std"])
    want = ps.expanding(min_periods=3).std()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-8)

    got = (edf["a"].expanding().var()
           .to_pandas(set_index=True).sort_index()["expanding_var"])
    want = ps.expanding().var()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-8)


def test_expanding_std_var_large_magnitude_no_overflow(spark):
    """ADVICE r4 (ranking.py sumsq): integer values whose square
    overflows 64-bit, and doubles whose mean dwarfs the variance, must
    still match pandas — the moments are double-cast and mean-shifted,
    never raw ``sum(c*c)``."""
    import numpy as np
    import pandas as pd

    import eland_spark as es

    rng = np.random.RandomState(23)
    # squares ~ 9e18 each: summing a handful of raw int64 squares
    # overflows (ANSI error / silent wrap); deltas keep a real variance
    base = 3_000_000_000
    ints = base + rng.randint(-500, 500, size=40)
    pdf = pd.DataFrame({"k": range(40), "a": ints.astype("int64")})
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["a"]

    got = (edf["a"].expanding().std()
           .to_pandas(set_index=True).sort_index()["expanding_std"])
    want = ps.expanding().std()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-6)

    # large-mean doubles: naive sumsq - sum^2/n cancels to ~0 here.
    # pandas' own rolling Welford drifts ~5e-5 relative on this data,
    # so the oracle is the EXACT prefix variance (Fraction arithmetic
    # on the stored doubles) — the mean-shifted plan matches it to
    # machine precision.
    from fractions import Fraction

    dbl = 1e12 + rng.randn(40).round(3)
    pdf2 = pd.DataFrame({"k": range(40), "a": dbl})
    edf2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))

    got = (edf2["a"].expanding(min_periods=2).var()
           .to_pandas(set_index=True).sort_index()["expanding_var"])
    fr = [Fraction(x) for x in dbl]
    exact = [np.nan]
    for n in range(2, 41):
        m = sum(fr[:n]) / n
        exact.append(float(sum((x - m) ** 2 for x in fr[:n]) / (n - 1)))
    want = pd.Series(exact, index=got.index, dtype="float64")
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-9)


def test_merge_validate(spark):
    import pandas as pd

    import eland_spark as es

    left = es.DataFrame(spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 2], "a": [10, 20, 21]})
    ))
    right = es.DataFrame(spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "b": ["x", "y"]})
    ))
    # m:1 passes (right unique), 1:1 and 1:m fail (left has dup key 2)
    assert left.merge(right, on="k", validate="m:1").to_pandas().shape[0] == 3
    for v in ("1:1", "1:m", "one_to_one"):
        with pytest.raises(ValueError, match="not unique in the left"):
            left.merge(right, on="k", validate=v)
    with pytest.raises(ValueError, match="invalid validate"):
        left.merge(right, on="k", validate="zzz")
    # duplicate NULL keys count as duplicates (pandas)
    nulls = es.DataFrame(spark.createDataFrame(
        pd.DataFrame({"k": [None, None], "b": ["x", "y"]}),
        schema="k bigint, b string",
    ))
    with pytest.raises(ValueError, match="right"):
        left.merge(nulls, on="k", validate="m:1")
    # left_on/right_on spelling
    r2 = es.DataFrame(spark.createDataFrame(
        pd.DataFrame({"rk": [1, 2], "b": ["x", "y"]})
    ))
    out = left.merge(r2, left_on="k", right_on="rk", validate="m:1")
    assert out.to_pandas().shape[0] == 3


def test_dt_accessor_extensions_match_pandas(spark):
    """day/month names, leap year, quarter/year end, microsecond,
    weekday aliases, ceil/round (ties-to-even) vs pandas on a grid that
    crosses year/quarter/leap boundaries and half-period ties."""
    import pandas as pd

    import eland_spark as es

    rng = list(pd.date_range("2023-12-30 22:15:30", periods=10,
                             freq="11h37min"))
    rng += [pd.Timestamp("2024-02-29 12:00:00"),   # leap + exact half-day
            pd.Timestamp("2024-03-31 23:59:59"),   # quarter end
            pd.Timestamp("2024-01-01 00:00:00")]   # already on boundary
    pdf = pd.DataFrame({"k": range(len(rng)), "ts": rng})
    df = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["ts"]

    def got_m(name):
        return getattr(df["ts"].dt, name)().to_pandas().sort_index().tolist()

    def got_p(name):
        return getattr(df["ts"].dt, name).to_pandas().sort_index().tolist()

    assert got_m("day_name") == ps.dt.day_name().tolist()
    assert got_m("month_name") == ps.dt.month_name().tolist()
    assert got_p("weekday") == ps.dt.weekday.tolist()
    assert got_p("day_of_week") == ps.dt.day_of_week.tolist()
    assert got_p("day_of_year") == ps.dt.day_of_year.tolist()
    assert got_p("microsecond") == ps.dt.microsecond.tolist()
    assert got_p("is_leap_year") == ps.dt.is_leap_year.tolist()
    assert got_p("is_quarter_end") == ps.dt.is_quarter_end.tolist()
    assert got_p("is_year_end") == ps.dt.is_year_end.tolist()
    for ours, theirs in [("D", "D"), ("H", "h"), ("min", "min"), ("S", "s")]:
        assert (df["ts"].dt.ceil(ours).to_pandas().sort_index().tolist()
                == ps.dt.ceil(theirs).tolist()), ("ceil", ours)
        assert (df["ts"].dt.round(ours).to_pandas().sort_index().tolist()
                == ps.dt.round(theirs).tolist()), ("round", ours)
    with pytest.raises(ValueError):
        df["ts"].dt.ceil("W")


def test_rolling_apply_matches_pandas(spark):
    """Series.rolling().apply(fn): arbitrary Python per window via ONE
    Arrow-batched applyInPandas over the bucketed padded frame —
    results (incl. min_periods gating and null handling) must equal
    pandas', bucket boundaries invisible."""
    import numpy as np
    import pandas as pd

    import eland_spark as es

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({"k": range(120), "a": rng.randn(120).round(3)})
    pdf.loc[[5, 6, 50], "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    ps = pdf.set_index("k")["a"]

    fn = lambda a: float(np.nanmax(a) - np.nanmin(a))  # noqa: E731
    got = (edf["a"].rolling(9, min_periods=4).apply(fn, raw=True)
           .to_pandas(set_index=True).sort_index()["rolling_apply"])
    want = ps.rolling(9, min_periods=4).apply(fn, raw=True)
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)

    # raw=False path (fn sees a pandas Series)
    got2 = (edf["a"].rolling(5).apply(lambda s: s.median())
            .to_pandas(set_index=True).sort_index()["rolling_apply"])
    want2 = ps.rolling(5).apply(lambda s: s.median())
    pd.testing.assert_series_equal(got2, want2, check_names=False, rtol=1e-12)

    # frame-level: every numeric column through ONE Arrow pass
    pdf2 = pdf.assign(b=rng.randn(120).round(3))
    edf2 = es.DataFrame(spark.createDataFrame(pdf2), index_cols=("k",))
    gotf = (edf2.rolling(6, min_periods=2).apply(fn, raw=True)
            .to_pandas().set_index("k").sort_index())
    wantf = pdf2.set_index("k")[["a", "b"]].rolling(
        6, min_periods=2).apply(fn, raw=True)
    for c in ("a", "b"):
        pd.testing.assert_series_equal(gotf[c], wantf[c].sort_index(),
                                       check_names=False, rtol=1e-12)


def test_frame_expanding_matches_pandas(spark):
    """DataFrame.expanding(): every numeric column through ONE
    bucket-prefix pass. Well-conditioned columns match pandas tightly;
    the 1e12-magnitude column is compared against the EXACT prefix
    std (Fraction arithmetic) because pandas' own Welford drifts ~2e-4
    there while the mean-shifted moments are exact to machine
    precision."""
    from fractions import Fraction

    import numpy as np

    import eland_spark as es

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "k": range(60),
        "a": rng.randn(60).round(3),
        "b": (1e12 + rng.randn(60)).round(3),
    })
    pdf.loc[[4, 9], "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    pp = pdf.set_index("k")

    got = (edf.expanding(min_periods=2).agg(["mean", "std", "count"])
           .to_pandas().set_index("k").sort_index())
    for agg in ("mean", "std", "count"):
        w = getattr(pp["a"].expanding(2), agg)()
        assert np.allclose(got[f"a_{agg}"].to_numpy(), w.to_numpy(),
                           equal_nan=True, rtol=1e-9), agg
    # ill-conditioned column: exact oracle
    fr = [Fraction(v) for v in pdf["b"].tolist()]
    exact = []
    for n in range(2, 61):
        m = sum(fr[:n]) / n
        exact.append(float(sum((x - m) ** 2 for x in fr[:n]) / (n - 1)))
    ex_std = np.sqrt(np.array(exact))
    ours = got["b_std"].to_numpy()[1:]
    assert np.allclose(ours, ex_std, rtol=1e-12)

    # single-agg naming + sum/min/max paths
    g1 = edf.expanding().sum().to_pandas().set_index("k").sort_index()
    w1 = pp[["a", "b"]].expanding(1).sum()
    for c in ("a", "b"):
        assert np.allclose(g1[c].to_numpy(), w1[c].to_numpy(),
                           equal_nan=True, rtol=1e-9), c

    with pytest.raises(NotImplementedError, match="not distributable"):
        edf.expanding().apply(lambda x: 1.0)


def test_frame_ewm_matches_pandas(spark):
    """DataFrame.ewm().mean(): every numeric column through one
    truncated-kernel bucket pass; null handling and min_periods match
    pandas (adjust=True default)."""
    import numpy as np

    import eland_spark as es

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({
        "k": range(80),
        "a": rng.randn(80).round(3),
        "b": rng.randn(80).round(3),
    })
    pdf.loc[[3, 40], "a"] = None
    edf = es.DataFrame(spark.createDataFrame(pdf), index_cols=("k",))
    pp = pdf.set_index("k")
    got = (edf.ewm(span=7, min_periods=2).mean()
           .to_pandas().set_index("k").sort_index())
    for c in ("a", "b"):
        want = pp[c].ewm(span=7, min_periods=2).mean()
        assert np.allclose(got[c].to_numpy(), want.to_numpy(),
                           equal_nan=True, rtol=1e-9), c
    # alpha spelling + validation
    got2 = (edf.ewm(alpha=0.4).mean()
            .to_pandas().set_index("k").sort_index())
    want2 = pp["b"].ewm(alpha=0.4).mean()
    assert np.allclose(got2["b"].to_numpy(), want2.to_numpy(),
                       equal_nan=True, rtol=1e-9)
    with pytest.raises(ValueError):
        edf[["k"]].ewm(alpha=0.5).mean()
