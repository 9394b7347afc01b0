"""Property-based differential tests: engine vs pandas on random small
frames (hypothesis). The reference differential-tests against pandas on
fixed golden data (SURVEY §5); randomized inputs cover the corners fixed
fixtures miss — empty frames, all-null columns, single rows, ties,
extreme floats."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from eland_spark.frame import DataFrame as EDF

FINITE = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False, width=64
)
VALS = st.one_of(FINITE, st.none())

ROWS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), VALS, FINITE),
    min_size=0,
    max_size=40,
)

# FUZZ_EXAMPLES raises the per-test example budget for deep campaigns
# (e.g. FUZZ_EXAMPLES=100 python -m pytest tests/test_properties.py)
# without slowing the default suite
import os as _os

COMMON = dict(
    max_examples=int(_os.environ.get("FUZZ_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frame(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "a", "b"])
    pdf["_id"] = range(len(pdf))
    sdf = spark.createDataFrame(
        pdf, schema="k bigint, a double, b double, _id bigint"
    )
    return pdf, EDF(sdf, index_cols=("_id",))


@given(rows=ROWS)
@settings(**COMMON)
def test_whole_frame_aggs_match_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    got = edf[["a", "b"]].aggregate(["count", "sum", "min", "max", "mean"])
    exp = pdf[["a", "b"]].agg(["count", "sum", "min", "max", "mean"])
    for fn in ["count", "sum", "min", "max", "mean"]:
        for c in ["a", "b"]:
            g, e = got.loc[fn, c], exp.loc[fn, c]
            if isinstance(e, float) and math.isnan(e):
                # pandas sum of all-NaN is 0.0; mean is NaN — mirror it
                assert (isinstance(g, float) and math.isnan(g)) or g is None, (fn, c, g)
            else:
                # sum/mean order differs between Spark partitions and
                # pandas: when values cancel (|result| << sum|x|), the
                # achievable agreement is bounded by the CONDITION of
                # the sum, not the result — scale abs tolerance by it
                scale = (
                    float(pd.to_numeric(pdf[c], errors="coerce").abs().sum())
                    if fn in ("sum", "mean")
                    else 0.0
                )
                assert g == pytest.approx(e, rel=1e-9, abs=1e-9 + scale * 1e-12), (
                    fn, c, g, e,
                )


@given(rows=ROWS, thresh=FINITE)
@settings(**COMMON)
def test_filter_matches_pandas(spark, rows, thresh):
    pdf, edf = _frame(spark, rows)
    got = edf[edf.a > thresh].to_pandas()
    exp = pdf[pdf.a > thresh]
    assert len(got) == len(exp)
    assert sorted(got["_id"]) == sorted(exp["_id"])


@given(rows=ROWS)
@settings(**COMMON)
def test_arithmetic_matches_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    got = (
        edf.assign(s=edf.a + edf.b, d=edf.a - edf.b, p=edf.a * edf.b)
        .to_pandas().sort_values("_id").reset_index(drop=True)
    )
    exp_s = (pdf.a + pdf.b).reset_index(drop=True)
    exp_d = (pdf.a - pdf.b).reset_index(drop=True)
    exp_p = (pdf.a * pdf.b).reset_index(drop=True)
    np.testing.assert_allclose(
        got["s"].astype("float64"), exp_s.astype("float64"), rtol=1e-12, equal_nan=True
    )
    np.testing.assert_allclose(
        got["d"].astype("float64"), exp_d.astype("float64"), rtol=1e-12, equal_nan=True
    )
    np.testing.assert_allclose(
        got["p"].astype("float64"), exp_p.astype("float64"), rtol=1e-12, equal_nan=True
    )


@given(rows=ROWS)
@settings(**COMMON)
def test_groupby_sum_count_match_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    if len(pdf) == 0:
        return
    got = edf.groupby("k").agg(["sum", "count"])
    exp = pdf.groupby("k")[["a", "b"]].agg(["sum", "count"])
    assert sorted(got.index.tolist()) == sorted(exp.index.tolist())
    for k in exp.index:
        for c in ["a", "b"]:
            assert got.loc[k, (c, "count")] == exp.loc[k, (c, "count")]
            g, e = got.loc[k, (c, "sum")], exp.loc[k, (c, "sum")]
            if isinstance(e, float) and math.isnan(e):
                assert isinstance(g, float) and math.isnan(g)
            else:
                # float addition is not associative: two correct engines
                # summing in different orders differ by up to
                # ~n*eps*max|partial sum| <= n*eps*sum|v| (hypothesis
                # find, r6: cancelling 1e9-scale terms put pandas and
                # Spark 1.2e-7 apart — both within eps of exact)
                sabs = (
                    pdf[pdf["k"] == k][c].astype("float64").abs().sum()
                )
                atol = max(1e-9, 1e-14 * float(sabs))
                assert g == pytest.approx(e, rel=1e-9, abs=atol), (
                    rows, k, c, g, e, atol
                )


@given(rows=ROWS, n=st.integers(min_value=0, max_value=10))
@settings(**COMMON)
def test_head_tail_match_pandas(spark, rows, n):
    pdf, edf = _frame(spark, rows)
    got_h = edf.head(n).to_pandas()["_id"].tolist()
    got_t = edf.tail(n).to_pandas()["_id"].tolist()
    assert got_h == pdf.head(n)["_id"].tolist()
    assert got_t == pdf.tail(n)["_id"].tolist()


@given(rows=ROWS)
@settings(**COMMON)
def test_idxmax_idxmin_match_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    pdf_i = pdf.set_index("_id")
    for col in ["a", "b"]:
        if pdf_i[col].notna().any():
            assert edf.idxmax()[col] == pdf_i[col].idxmax(), (rows, col)
            assert edf.idxmin()[col] == pdf_i[col].idxmin(), (rows, col)


@given(rows=ROWS)
@settings(**COMMON)
def test_mode_excludes_nulls_like_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    if len(pdf) == 0:
        return
    got = edf.mode()
    if len(got) == 0:
        assert pdf[["k", "a", "b"]].dropna(how="all").empty or pdf["a"].isna().all()
        return
    exp = pdf[list(got.columns)].mode()
    for c in got.columns:
        if len(exp) == 0 or pd.isna(exp[c].iloc[0]):
            assert pd.isna(got[c].iloc[0])
        else:
            assert got[c].iloc[0] == exp[c].iloc[0], (rows, c)


ZEROABLE = st.one_of(FINITE, st.just(0.0), st.none())
# non-finite and denormal specials ride along since the r5 floordiv
# rewrite proved parity on them (test_floordiv_special_value_matrix)
_SPECIALS = st.sampled_from(
    [float("inf"), float("-inf"), float("nan"), 5e-324, -5e-324, 1e-310]
)
DIV_ROWS = st.lists(
    st.tuples(
        st.one_of(FINITE, st.none(), _SPECIALS),
        st.one_of(ZEROABLE, _SPECIALS),
    ),
    min_size=1,
    max_size=25,
)


def _div_frame(spark, rows):
    pdf = pd.DataFrame(rows, columns=["a", "b"]).astype(
        {"a": "float64", "b": "float64"}
    )
    pdf["_id"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf, schema="a double, b double, _id bigint")
    return pdf, EDF(sdf, index_cols=("_id",))


def _ieee_close(g, e):
    g = np.asarray(g, dtype="float64")
    e = np.asarray(e, dtype="float64")
    return (
        (np.isnan(g) & np.isnan(e))
        | (np.isinf(g) & np.isinf(e) & (np.sign(g) == np.sign(e)))
        | np.isclose(g, e, rtol=1e-9, atol=1e-12)
    )


@given(rows=DIV_ROWS)
@settings(**COMMON)
def test_division_ieee_semantics(spark, rows):
    """ANSI Spark throws on x/0; pandas and the reference's Painless give
    ±inf / NaN. The engine must produce the IEEE result, never an error
    (and floordiv must not clamp huge quotients to Long.MaxValue)."""
    pdf, edf = _div_frame(spark, rows)
    out = (
        edf.assign(d=edf.a / edf.b, fd=edf.a // edf.b, m=edf.a % edf.b)
        .to_pandas().sort_values("_id").reset_index(drop=True)
    )
    assert _ieee_close(out["d"], (pdf.a / pdf.b).reset_index(drop=True)).all()
    assert _ieee_close(out["fd"], (pdf.a // pdf.b).reset_index(drop=True)).all()
    # mod follows the reference's Java dividend-sign semantics (fmod)
    with np.errstate(invalid="ignore"):
        exp_m = np.where(
            pdf.b.to_numpy() == 0, np.nan,
            np.fmod(pdf.a.to_numpy(), pdf.b.to_numpy()),
        )
    assert _ieee_close(out["m"], exp_m).all()


# -- ES query-DSL compiler vs a pandas evaluator on random trees ---------

_DSL_FIELDS = {"k": "int", "a": "float", "s": "str"}


def _leaf_strategy():
    num = st.one_of(st.integers(-5, 5), st.floats(-5, 5, allow_nan=False))
    sval = st.sampled_from(["x", "y", "z", "xy"])
    return st.one_of(
        st.builds(lambda v: {"term": {"k": v}}, st.integers(-5, 5)),
        st.builds(lambda v: {"term": {"s": v}}, sval),
        st.builds(lambda v: {"terms": {"k": v}}, st.lists(st.integers(-5, 5), max_size=3)),
        st.builds(
            lambda lo, hi: {"range": {"a": {"gte": lo, "lt": hi}}}, num, num
        ),
        st.builds(lambda: {"exists": {"field": "a"}}),
        st.builds(lambda v: {"prefix": {"s": v}}, sval),
        st.builds(lambda: {"match_all": {}}),
    )


def _dsl_strategy(depth=2):
    leaf = _leaf_strategy()
    if depth == 0:
        return leaf
    sub = _dsl_strategy(depth - 1)
    return st.one_of(
        leaf,
        st.builds(
            lambda m, mn, sh: {
                "bool": {
                    "must": m,
                    "must_not": mn,
                    "should": sh,
                    **({"minimum_should_match": 1} if sh else {}),
                }
            },
            st.lists(sub, max_size=2),
            st.lists(sub, max_size=1),
            st.lists(sub, max_size=2),
        ),
    )


def _pd_eval(dsl, pdf):
    """Reference evaluator: ES presence semantics in pandas."""
    (kind, body), = dsl.items()
    if kind == "match_all":
        return pd.Series(True, index=pdf.index)
    if kind == "bool":
        out = pd.Series(True, index=pdf.index)
        for c in body.get("must", []):
            out &= _pd_eval(c, pdf)
        shoulds = body.get("should", [])
        if shoulds and body.get("minimum_should_match", 0):
            d = pd.Series(False, index=pdf.index)
            for c in shoulds:
                d |= _pd_eval(c, pdf)
            out &= d
        for c in body.get("must_not", []):
            out &= ~_pd_eval(c, pdf)
        return out
    if kind == "term":
        f, v = next(iter(body.items()))
        return pdf[f] == v
    if kind == "terms":
        f, vs = next(iter(body.items()))
        return pdf[f].isin(vs)
    if kind == "range":
        f, ops = next(iter(body.items()))
        out = pd.Series(True, index=pdf.index)
        for op, v in ops.items():
            cmp = {"gt": "gt", "gte": "ge", "lt": "lt", "lte": "le"}[op]
            out &= getattr(pdf[f], cmp)(v)
        return out & pdf[f].notna()
    if kind == "exists":
        return pdf[body["field"]].notna()
    if kind == "prefix":
        f, v = next(iter(body.items()))
        return pdf[f].fillna("").str.startswith(v)
    raise AssertionError(kind)


DSL_ROWS = st.lists(
    st.tuples(
        st.integers(-5, 5),
        st.one_of(st.floats(-5, 5, allow_nan=False), st.none()),
        st.one_of(st.sampled_from(["x", "y", "z", "xy", "zz"]), st.none()),
    ),
    min_size=0,
    max_size=25,
)


@given(rows=DSL_ROWS, dsl=_dsl_strategy())
@settings(**COMMON)
def test_es_dsl_matches_pandas_evaluator(spark, rows, dsl):
    from eland_spark.functions.es_dsl import compile_es_dsl

    pdf = pd.DataFrame(rows, columns=["k", "a", "s"])
    pdf["_id"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf, schema="k bigint, a double, s string, _id bigint")
    got = sorted(
        r["_id"] for r in sdf.filter(compile_es_dsl(dsl)).select("_id").collect()
    )
    exp = sorted(pdf.loc[_pd_eval(dsl, pdf).fillna(False).astype(bool), "_id"])
    assert got == exp, f"dsl={dsl}"


# -- query_string parser vs a pandas evaluator on random expression trees


_QS_TOKENS = ["alpha", "beta", "gamma", "delta"]


def _qs_expr(depth=3):
    term = st.builds(lambda t: ("term", t), st.sampled_from(_QS_TOKENS))
    phrase = st.builds(
        lambda a, b: ("phrase", f"{a} {b}"),
        st.sampled_from(_QS_TOKENS),
        st.sampled_from(_QS_TOKENS),
    )
    leaf = st.one_of(term, phrase)
    if depth == 0:
        return leaf
    sub = _qs_expr(depth - 1)
    return st.one_of(
        leaf,
        st.builds(lambda x: ("not", x), sub),
        st.builds(lambda x, y: ("and", x, y), sub, sub),
        st.builds(lambda x, y: ("or", x, y), sub, sub),
    )


def _qs_render(node, variant: int) -> str:
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "phrase":
        return f'"{node[1]}"'
    if kind == "not":
        op = "NOT " if variant % 2 == 0 else "!"
        return f"{op}({_qs_render(node[1], variant)})"
    a = f"({_qs_render(node[1], variant)})"
    b = f"({_qs_render(node[2], variant)})"
    if kind == "and":
        return f"{a} {'AND' if variant % 2 == 0 else '&&'} {b}"
    return f"{a} {'OR' if variant % 2 == 0 else '||'} {b}"


def _qs_eval(node, text: pd.Series) -> pd.Series:
    import re as _re

    kind = node[0]
    if kind == "term":
        return text.str.contains(r"\b" + _re.escape(node[1]) + r"\b")
    if kind == "phrase":
        pat = r"\b" + r"\s+".join(_re.escape(t) for t in node[1].split()) + r"\b"
        return text.str.contains(pat)
    if kind == "not":
        return ~_qs_eval(node[1], text)
    if kind == "and":
        return _qs_eval(node[1], text) & _qs_eval(node[2], text)
    return _qs_eval(node[1], text) | _qs_eval(node[2], text)


_QS_DOCS = st.lists(
    st.lists(st.sampled_from(_QS_TOKENS + ["omega"]), min_size=0, max_size=6),
    min_size=1,
    max_size=20,
)


@given(expr=_qs_expr(), docs=_QS_DOCS, variant=st.integers(0, 3))
@settings(**COMMON)
def test_query_string_matches_pandas(spark, expr, docs, variant):
    pdf = pd.DataFrame(
        {"text": [" ".join(toks) for toks in docs], "_id": range(len(docs))}
    )
    sdf = spark.createDataFrame(pdf, schema="text string, _id bigint")
    df = EDF(sdf, index_cols=("_id",))
    q = _qs_render(expr, variant)
    got = set(
        r["_id"]
        for r in df.es_query({"query_string": {"query": q, "default_field": "text"}})[
            ["_id"]
        ]
        .to_spark()
        .collect()
    )
    exp = set(pdf[_qs_eval(expr, pdf.text)]._id)
    assert got == exp, f"query={q!r}"


# -- cut/qcut vs pandas on random frames ---------------------------------


@given(rows=ROWS, bins=st.integers(2, 6))
@settings(**COMMON)
def test_cut_matches_pandas(spark, rows, bins):
    pdf, edf = _frame(spark, rows)
    vals = pdf["a"]
    if vals.dropna().nunique() < 2:
        return  # degenerate: pandas cut needs a nonzero range
    got = (
        edf.assign(b=edf["a"].cut(bins))[["_id", "b"]]
        .to_spark()
        .toPandas()
        .set_index("_id")
        .sort_index()["b"]
    )
    exp = pd.cut(vals, bins=bins, labels=False)
    exp.index = pdf["_id"]
    exp = exp.sort_index()
    assert (got.isna() == exp.isna()).all()
    m = ~exp.isna()
    assert (got[m].astype(int) == exp[m].astype(int)).all()


# -- merge_asof vs pandas on random keyed event frames -------------------


_ASOF_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 50),  # time (int "on" column)
        st.floats(-5, 5, allow_nan=False),
    ),
    min_size=1,
    max_size=15,
)


@given(
    left=_ASOF_ROWS,
    right=_ASOF_ROWS,
    direction=st.sampled_from(["backward", "forward"]),
    exact=st.booleans(),
)
@settings(**COMMON)
def test_merge_asof_matches_pandas(spark, left, right, direction, exact):
    from eland_spark.operators.asof import merge_asof

    lp = pd.DataFrame(left, columns=["k", "t", "v"]).drop_duplicates(["k", "t"])
    rp = pd.DataFrame(right, columns=["k", "t", "w"]).drop_duplicates(["k", "t"])
    lp["_id"] = range(len(lp))
    ls = spark.createDataFrame(lp, schema="k long, t long, v double, _id long")
    rs = spark.createDataFrame(rp[["k", "t", "w"]], schema="k long, t long, w double")
    got = (
        merge_asof(
            ls, rs, on="t", by="k", direction=direction, allow_exact_matches=exact
        )
        .toPandas()
        .sort_values("_id")
        .reset_index(drop=True)["w"]
    )
    exp = (
        pd.merge_asof(
            lp.sort_values("t"),
            rp.sort_values("t"),
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=exact,
        )
        .sort_values("_id")
        .reset_index(drop=True)["w"]
    )
    assert (got.isna() == exp.isna()).all()
    m = ~exp.isna()
    assert (abs(got[m] - exp[m]) < 1e-9).all()


@given(rows=ROWS, fn=st.sampled_from(["sum", "mean", "min", "max", "count"]))
@settings(**COMMON)
def test_groupby_transform_matches_pandas(spark, rows, fn):
    pdf, edf = _frame(spark, rows)
    got = (
        edf.groupby("k")
        .transform(fn, numeric_only=True)
        .to_spark()
        .toPandas()
        .set_index("_id")
        .sort_index()["a"]
    )
    exp = pdf.set_index("_id").sort_index().groupby("k")["a"].transform(fn)
    assert (got.isna() == exp.isna()).all()
    m = ~exp.isna()
    g, e = got[m].astype(float), exp[m].astype(float)
    # mixed abs+rel tolerance: partial aggregation associates float
    # sums differently from pandas' sequential/pairwise sum, so at
    # magnitude M the achievable agreement is O(M * ulp), not an
    # absolute 1e-9 (fuzz-found: sum of [8388609, 8388609, -1.9, -1]
    # differs by 1.9e-9 between associations — both answers correct)
    assert (abs(g - e) < 1e-9 + 1e-12 * abs(e)).all()


@given(
    toks=st.lists(st.integers(min_value=1, max_value=3000), min_size=0, max_size=60),
    budget=st.integers(min_value=1, max_value=2048),
)
@settings(**COMMON)
def test_pack_documents_matches_sequential_greedy(spark, toks, budget):
    """pack_documents on one sorted partition == the pure-Python
    next-fit state machine (same machine the DuckDB oracle replays)."""
    from eland_spark.operators.packing import pack_documents

    pdf = pd.DataFrame({"doc_id": range(len(toks)), "n_tokens": toks})
    sdf = spark.createDataFrame(
        pdf, schema="doc_id bigint, n_tokens bigint"
    ).repartition(1).sortWithinPartitions("doc_id")
    got = (
        pack_documents(sdf, "doc_id", "n_tokens", budget)
        .toPandas()
        .sort_values("doc_id")
    )
    # python reference: next-fit
    bins, used, b, opened = [], 0, 0, False
    for t in toks:
        if not opened:
            opened = True
        elif used + t > budget:
            b += 1
            used = 0
        used += t
        bins.append(b)
    assert list(got["bin_id"]) == bins
    # invariant: every bin fits the budget unless it holds one oversize doc
    for bid, grp in got.groupby("bin_id"):
        assert grp["n_tokens"].sum() <= budget or len(grp) == 1


@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8).map(" ".join),
        min_size=0,
        max_size=10,
    ),
    bench=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8).map(" ".join),
        min_size=0,
        max_size=4,
    ),
)
@settings(**COMMON)
def test_contamination_flags_match_python_sets(spark, corpus, bench):
    """contamination_flags == python set-intersection of k-shingles."""
    from eland_spark.operators.dedup import contamination_flags

    k = 3

    def sh(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)} if toks else set()

    bench_sh = set().union(*[sh(t) for t in bench]) if bench else set()
    expected = {i: bool(sh(t) & bench_sh) for i, t in enumerate(corpus)}

    cdf = EDF(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(corpus)), "text": corpus}),
            schema="doc_id bigint, text string",
        ),
        index_cols=("doc_id",),
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"text": bench}), schema="text string"
    )
    got = contamination_flags(cdf, bdf, "text", "doc_id", k=k).toPandas()
    assert dict(zip(got.doc_id, got.contaminated)) == expected


@given(rows=ROWS)
@settings(**COMMON)
def test_shift_diff_cumsum_match_pandas(spark, rows):
    """Global-order shift/diff/cumsum == pandas on the index order,
    including null values, empty frames, and single rows."""
    pdf, edf = _frame(spark, rows)
    s = edf["a"]
    p = pdf.set_index("_id")["a"].astype("float64")

    got_shift = s.shift(1).to_pandas()["shift"]
    got_diff = s.diff(1).to_pandas()["diff"]
    got_cum = s.cumsum().to_pandas()["cumsum"]
    got_cmx = s.cummax().to_pandas()["cummax"]
    got_cmn = s.cummin().to_pandas()["cummin"]
    got_cpr = s.cumprod().to_pandas()["cumprod"]
    for got, exp in [
        (got_shift, p.shift(1)),
        (got_diff, p.diff(1)),
        (got_cum, p.cumsum()),
        (got_cmx, p.cummax()),
        (got_cmn, p.cummin()),
        (got_cpr, p.cumprod()),
    ]:
        got = got.sort_index().to_numpy(dtype="float64")
        exp = exp.sort_index().to_numpy(dtype="float64")
        assert len(got) == len(exp)
        assert np.allclose(got, exp, rtol=1e-9, atol=1e-9, equal_nan=True)


@given(
    rows=ROWS,
    window=st.integers(min_value=1, max_value=6),
)
@settings(**COMMON)
def test_rolling_matches_pandas(spark, rows, window):
    """Global row-based rolling sum/min == pandas incl. null values and
    the min_periods head nulls (bucket overlap-replication must splice
    frames across bucket boundaries exactly)."""
    pdf, edf = _frame(spark, rows)
    s = edf["a"]
    p = pdf.set_index("_id")["a"].astype("float64")
    got_sum = s.rolling(window).sum().to_pandas()["rolling_sum"].sort_index()
    got_min = s.rolling(window).min().to_pandas()["rolling_min"].sort_index()
    # sum reference is an EXACT per-window fsum, not pandas: pandas'
    # incremental add/remove kernel drifts when large and tiny
    # magnitudes mix (deep-fuzz find: window [-1/3, 0] after 5.4e8
    # values returned -0.33333393 from pandas; the per-window
    # recompute — pandas' own DEFINITION — gives -1/3, as we do)
    vals = p.to_numpy(dtype="float64")
    exp_sum = []
    for i in range(len(vals)):
        w = vals[max(0, i - window + 1): i + 1]
        w = w[~np.isnan(w)]
        exp_sum.append(math.fsum(w) if len(w) >= window else float("nan"))
    exp_min = p.rolling(window).min().sort_index()
    for got, exp in [
        (got_sum.to_numpy(dtype="float64"), np.array(exp_sum)),
        (got_min.to_numpy(dtype="float64"), exp_min.to_numpy(dtype="float64")),
    ]:
        assert np.allclose(got, exp, rtol=1e-9, atol=1e-9, equal_nan=True)


@given(rows=ROWS, mp=st.integers(min_value=1, max_value=4))
@settings(**COMMON)
def test_expanding_matches_pandas(spark, rows, mp):
    """Global expanding sum/mean/count == pandas incl. null carrying
    (null-value rows still get the running value) and min_periods."""
    pdf, edf = _frame(spark, rows)
    s = edf["a"]
    p = pdf.set_index("_id")["a"].astype("float64")
    for agg in ["sum", "mean", "count"]:
        got = (
            getattr(s.expanding(mp), agg)()
            .to_pandas()[f"expanding_{agg}"]
            .sort_index()
            .to_numpy(dtype="float64")
        )
        exp = (
            getattr(p.expanding(mp), agg)()
            .sort_index()
            .to_numpy(dtype="float64")
        )
        assert np.allclose(got, exp, rtol=1e-9, atol=1e-9, equal_nan=True), (
            agg, rows, mp,
        )


@given(rows=ROWS, alpha=st.sampled_from([0.2, 0.5, 0.9]))
@settings(**COMMON)
def test_grouped_ewm_matches_pandas(spark, rows, alpha):
    """Truncated-kernel ewm == pandas' recursive kernel (adjust=True,
    ignore_na=False) on random frames incl. nulls and empty groups."""
    pdf, edf = _frame(spark, rows)
    if len(pdf) == 0:
        return
    got = (
        edf[["k", "a"]].groupby("k").ewm(alpha=alpha).mean()
        .to_pandas().sort_index()["a_ewm"]
    )
    exp = (
        pdf.set_index("_id").sort_index()
        .groupby("k")["a"].ewm(alpha=alpha).mean()
        .reset_index(level=0, drop=True).sort_index()
    )
    assert np.allclose(
        got.to_numpy(), exp.to_numpy(), equal_nan=True, rtol=1e-9, atol=1e-9
    )


@given(rows=ROWS)
# r3 find: subnormal-magnitude data underflows m2^1.5 inside Spark's
# builtin skewness, which THROWS under ANSI even though the CASE guard
# discards that branch's result (aggregates evaluate unconditionally);
# fixed by _moment_flush on the builtin's argument
@example(rows=[(0, 0.0, 0.0), (0, 1.9e-150, 0.0)])
@settings(**COMMON)
def test_skew_kurt_match_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    for fn in ("skew", "kurt"):
        got = getattr(edf["a"], fn)()
        exp = getattr(pdf["a"], fn)()
        if exp is None or (isinstance(exp, float) and math.isnan(exp)):
            # pandas NaN (n too small)
            assert got is None or math.isnan(got)
        elif math.isinf(exp):
            assert got is None or math.isinf(got) or abs(got) > 1e12
        else:
            assert got is not None and abs(got - exp) < 1e-6 * max(1, abs(exp))


@given(rows=ROWS)
@settings(**COMMON)
def test_frame_ffill_bfill_match_pandas(spark, rows):
    pdf, edf = _frame(spark, rows)
    if len(pdf) == 0:
        return
    base = pdf.set_index("_id").sort_index()
    for m in ("ffill", "bfill"):
        got = getattr(edf[["a", "b"]], m)().to_pandas().sort_index()
        exp = getattr(base[["a", "b"]], m)().sort_index()
        for c in ("a", "b"):
            assert np.allclose(
                got[c].astype("float64").to_numpy(),
                exp[c].astype("float64").to_numpy(),
                equal_nan=True,
            ), (m, c)


# --- composite pipeline fuzzing ------------------------------------------
#
# Random CHAINS of filter -> assign -> groupby-agg / sort+head, the
# shapes real users compose, differentialed against pandas end-to-end.
# Single-op properties above can all pass while a chain breaks (e.g.
# derived-column filters interacting with index projection), so the
# chain is its own property.

_PIPE_FILTER = st.tuples(
    st.just("filter"),
    st.sampled_from(["a", "b"]),
    st.sampled_from([">", "<=", "!="]),
    FINITE,
)
_PIPE_ASSIGN = st.tuples(
    st.just("assign"), st.sampled_from(["add", "mul", "absa"])
)
_PIPE_STEPS = st.lists(
    st.one_of(_PIPE_FILTER, _PIPE_ASSIGN), min_size=0, max_size=3
)
_PIPE_TERMINAL = st.one_of(
    st.tuples(st.just("groupby"), st.sampled_from(["sum", "mean", "min", "max"])),
    st.tuples(st.just("sort_head"), st.sampled_from(["a", "b"]),
              st.integers(min_value=0, max_value=8)),
)


@given(rows=ROWS, steps=_PIPE_STEPS, terminal=_PIPE_TERMINAL)
@settings(**COMMON)
def test_composed_pipeline_matches_pandas(spark, rows, steps, terminal):
    pdf, edf = _frame(spark, rows)
    pdf = pdf.set_index("_id").astype({"a": "float64", "b": "float64"})

    for s in steps:
        if s[0] == "filter":
            _, col, op, t = s
            if op == ">":
                edf, pdf = edf[edf[col] > t], pdf[pdf[col] > t]
            elif op == "<=":
                edf, pdf = edf[edf[col] <= t], pdf[pdf[col] <= t]
            else:
                edf, pdf = edf[edf[col] != t], pdf[pdf[col] != t]
        else:
            kind = s[1]
            if kind == "add":
                edf = edf.assign(c=edf["a"] + edf["b"])
                pdf = pdf.assign(c=pdf["a"] + pdf["b"])
            elif kind == "mul":
                edf = edf.assign(c=edf["a"] * edf["b"])
                pdf = pdf.assign(c=pdf["a"] * pdf["b"])
            else:
                edf = edf.assign(c=edf["a"].abs())
                pdf = pdf.assign(c=pdf["a"].abs())

    if terminal[0] == "groupby":
        func = terminal[1]
        cols = [c for c in ("a", "b", "c") if c in pdf.columns]
        got = getattr(edf.groupby("k"), func)(numeric_only=True)[cols]
        exp = getattr(pdf.groupby("k"), func)(numeric_only=True)[cols]
        assert list(got.index) == list(exp.index)
        for c in cols:
            for g, e in zip(got[c].tolist(), exp[c].tolist()):
                if e is None or (isinstance(e, float) and math.isnan(e)):
                    assert g is None or (isinstance(g, float) and math.isnan(g))
                else:
                    assert g == pytest.approx(e, rel=1e-9, abs=1e-6), (c, got, exp)
    else:
        _, col, n = terminal
        got = edf.sort_values(col).head(n).to_pandas()
        exp = pdf.sort_values(col, kind="stable").head(n)
        assert len(got) == len(exp)
        # row membership must agree (incl. pandas' nulls-last
        # placement); ordering among exact ties may differ, so compare
        # sorted value multisets with NaN counted separately
        g, e = got[col].tolist(), exp[col].tolist()
        g_nan = sum(1 for x in g if isinstance(x, float) and math.isnan(x))
        e_nan = sum(1 for x in e if isinstance(x, float) and math.isnan(x))
        assert g_nan == e_nan
        assert sorted(x for x in g if not math.isnan(x)) == pytest.approx(
            sorted(x for x in e if not math.isnan(x))
        )


_PIPE_INVERT = st.tuples(
    st.just("invert_filter"),
    st.sampled_from(["a", "b"]),
    FINITE,
)


@given(rows=ROWS, col=st.sampled_from(["a", "b"]), t=FINITE,
       func=st.sampled_from(["median", "std", "var", "nunique", "count"]))
@settings(**COMMON)
def test_inverted_filter_then_groupby_matches_pandas(spark, rows, col, t, func):
    """~(col > t) filters (null-keeping, pandas semantics) feeding the
    rest of the groupby agg matrix."""
    pdf, edf = _frame(spark, rows)
    pdf = pdf.set_index("_id").astype({"a": "float64", "b": "float64"})

    edf2 = edf[~(edf[col] > t)]
    pdf2 = pdf[~(pdf[col] > t)]
    kw = {} if func in ("nunique", "count") else {"numeric_only": True}
    got = getattr(edf2.groupby("k"), func)(**kw)["a"]
    exp = getattr(pdf2.groupby("k"), func)(**kw)["a"]
    assert list(got.index) == list(exp.index)
    for g, e in zip(got.tolist(), exp.tolist()):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None or (isinstance(g, float) and math.isnan(g))
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-6)


@given(rows=ROWS, n=st.integers(min_value=0, max_value=6),
       col=st.sampled_from(["a", "b"]), largest=st.booleans())
@settings(**COMMON)
def test_nlargest_nsmallest_membership_matches_pandas(spark, rows, n, col, largest):
    pdf, edf = _frame(spark, rows)
    pdf = pdf.set_index("_id").astype({"a": "float64", "b": "float64"})
    fn = "nlargest" if largest else "nsmallest"
    got = getattr(edf, fn)(n, col).to_pandas()
    exp = getattr(pdf, fn)(n, col)
    assert sorted(got["_id"].tolist()) == sorted(exp.index.tolist())


# --- string accessor differential ----------------------------------------

# PERMANENT PIN (ADVICE r3 / VERDICT r4 #8): the alphabet MUST keep the
# regex metacharacters (. * [ ( | \ $ ^ + ?) — str.split/rsplit on a
# literal separator that is also a regex metachar was an r3 bug class;
# if the fuzzer bounds ever change, keep these characters drawable.
_STR_CHARS = st.text(
    alphabet=" aB3._*[(|\\$^+?'-", min_size=0, max_size=12
)
_STR_ROWS = st.lists(st.one_of(_STR_CHARS, st.none()), min_size=0, max_size=20)


def _str_frame(spark, rows):
    pdf = pd.DataFrame({"s": pd.Series(rows, dtype="object")})
    pdf["_id"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf, schema="s string, _id bigint")
    return pdf.set_index("_id"), EDF(sdf, index_cols=("_id",))


@given(rows=_STR_ROWS, lit=_STR_CHARS)
@settings(**COMMON)
def test_str_accessor_matches_pandas(spark, rows, lit):
    """upper/lower/len/strip/startswith and LITERAL contains/replace on
    regex-special characters — the escaping path is where a naive
    regexp-based port breaks."""
    pdf, edf = _str_frame(spark, rows)
    ps = pdf["s"]

    def eq(got, exp):
        got = got.to_pandas().tolist() if hasattr(got, "to_pandas") else got
        exp = exp.tolist()
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if e is None or (isinstance(e, float) and pd.isna(e)):
                assert g is None or pd.isna(g)
            else:
                assert g == e, (g, e)

    eq(edf["s"].str.upper(), ps.str.upper())
    eq(edf["s"].str.lower(), ps.str.lower())
    eq(edf["s"].str.len(), ps.str.len())
    eq(edf["s"].str.strip(), ps.str.strip())
    if lit:  # pandas startswith('') is True; engine parity on non-empty
        eq(edf["s"].str.startswith(lit), ps.str.startswith(lit))
    eq(
        edf["s"].str.contains(lit, regex=False),
        ps.str.contains(lit, regex=False),
    )
    if lit:  # empty-pattern replace: documented divergence (Spark no-op
        # vs Python insert-everywhere)
        eq(
            edf["s"].str.replace(lit, "#", regex=False),
            ps.str.replace(lit, "#", regex=False),
        )
    eq(edf["s"].str.slice(1, 3), ps.str.slice(1, 3))


_SLICE_BOUND = st.one_of(st.none(), st.integers(min_value=-6, max_value=6))


_SLICE_STEP = st.one_of(
    st.none(), st.integers(min_value=-3, max_value=3).filter(lambda v: v != 0)
)


@given(rows=_STR_ROWS, start=_SLICE_BOUND, stop=_SLICE_BOUND,
       step=_SLICE_STEP, repl=_STR_CHARS)
@settings(**COMMON)
def test_str_slice_bounds_match_pandas(spark, rows, start, stop, step, repl):
    """slice/slice_replace/get over negative, None, and positive bounds
    plus stepped slices — the VERDICT r3 #2 bug class: Spark's
    substring counts negative positions from the end WITHOUT the +1
    shift, so naive arithmetic returns the wrong window (slice(-3) gave
    the last 2 chars) and a negative stop computed a bogus length.
    Steps follow CPython slice.indices (incl. negative steps)."""
    pdf, edf = _str_frame(spark, rows)
    ps = pdf["s"]

    def eq(got, exp):
        got = got.to_pandas().tolist()
        exp = exp.tolist()
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if e is None or (isinstance(e, float) and pd.isna(e)):
                assert g is None or pd.isna(g), (g, e)
            else:
                assert g == e, (g, e, start, stop, step)

    eq(edf["s"].str.slice(start, stop), ps.str.slice(start, stop))
    eq(
        edf["s"].str.slice(start, stop, step),
        ps.str.slice(start, stop, step),
    )
    eq(
        edf["s"].str.slice_replace(start, stop, repl),
        ps.str.slice_replace(start, stop, repl),
    )
    if start is not None:
        eq(edf["s"].str.get(start), ps.str.get(start))


# --- datetime accessor differential --------------------------------------

_EPOCH_S = st.integers(min_value=-100_000_000, max_value=2_000_000_000)
_TS_ROWS = st.lists(st.one_of(_EPOCH_S, st.none()), min_size=1, max_size=15)


@given(rows=_TS_ROWS)
@settings(**COMMON)
def test_dt_accessor_matches_pandas(spark, rows):
    """year/month/day/hour/dayofweek/quarter/dayofyear/isocalendar-week
    over random epochs incl. pre-1970 — off-by-one weekday and ISO-week
    edges are where engine ports usually break."""
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(pd.Series(rows, dtype="object"), unit="s")}
    )
    pdf["_id"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf, schema="ts timestamp_ntz, _id bigint")
    edf = EDF(sdf, index_cols=("_id",))

    for attr in ("year", "month", "hour", "dayofweek", "quarter", "dayofyear", "week"):
        got = getattr(edf["ts"].dt, attr).to_pandas().tolist()
        if attr == "week":
            exp = pdf["ts"].dt.isocalendar().week.tolist()
        else:
            exp = getattr(pdf["ts"].dt, attr).tolist()
        for g, e in zip(got, exp):
            if e is None or (isinstance(e, float) and pd.isna(e)) or pd.isna(e):
                assert g is None or pd.isna(g), (attr, g, e)
            else:
                assert g == e, (attr, g, e, rows)


# --- merge differential ---------------------------------------------------

_KEYS = st.one_of(st.integers(0, 3).map(float), st.none())
_MERGE_SIDE = st.lists(_KEYS, min_size=0, max_size=8)


@given(lk=_MERGE_SIDE, rk=_MERGE_SIDE,
       how=st.sampled_from(["inner", "left", "right", "outer"]))
@settings(**COMMON)
def test_merge_matches_pandas(spark, lk, rk, how):
    """Random duplicate/null key multisets through every join type —
    pandas NaN-key matching, duplicate fan-out, and outer fill must all
    agree (row multisets; ordering is engine-defined)."""
    lpdf = pd.DataFrame({"k": pd.Series(lk, dtype="float64"),
                         "x": range(len(lk))})
    rpdf = pd.DataFrame({"k": pd.Series(rk, dtype="float64"),
                         "y": range(len(rk))})
    el = EDF(spark.createDataFrame(lpdf, schema="k double, x bigint"))
    er = EDF(spark.createDataFrame(rpdf, schema="k double, y bigint"))

    got = el.merge(er, on="k", how=how).to_pandas()
    exp = lpdf.merge(rpdf, on="k", how=how)

    def multiset(df):
        return sorted(
            tuple(-1.0 if pd.isna(v) else v for v in row)
            for row in df[["k", "x", "y"]].astype("float64").itertuples(index=False)
        )

    assert multiset(got) == multiset(exp)


@given(rows=ROWS, limit=st.sampled_from([None, 1, 2]))
@settings(**COMMON)
def test_interpolate_matches_pandas_fuzz(spark, rows, limit):
    """Linear interpolation over the global order == pandas for any
    null layout (leading/trailing/interior runs, all-null, empty) and
    any limit."""
    pdf, edf = _frame(spark, rows)
    got = (
        edf["a"].interpolate(limit=limit).to_pandas().sort_index()["interpolate"]
    )
    exp = pdf.set_index("_id")["a"].astype("float64").interpolate(limit=limit)
    got = got.sort_index().to_numpy(dtype="float64")
    exp = exp.sort_index().to_numpy(dtype="float64")
    assert len(got) == len(exp)
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-9, equal_nan=True)


@given(rows=ROWS)
# the r3 skew-underflow find, transplanted to groups: one subnormal
# group among normal ones must not fail the whole aggregation
@example(rows=[(0, 0.0, 0.0), (0, 1.9e-150, 0.0), (1, 1.0, 0.0),
               (1, 2.0, 0.0), (1, 9.0, 0.0)])
@settings(**COMMON)
def test_groupby_skew_kurt_match_pandas(spark, rows):
    """Per-group skew/kurt vs pandas groupby — the grouped path shares
    the whole-frame expression but hits different degenerate shapes
    (constant groups, n<3 groups, subnormal groups) side by side."""
    pdf, edf = _frame(spark, rows)
    if len(pdf) == 0:
        return
    for fn in ("skew", "kurt"):
        got = getattr(edf.groupby("k"), fn)()
        # this pandas has no DataFrameGroupBy.kurt — per-group Series agg
        exp = pdf.groupby("k")[["a", "b"]].agg(lambda s: getattr(s, fn)())
        assert sorted(got.index.tolist()) == sorted(exp.index.tolist())
        for k in exp.index:
            for c in ("a", "b"):
                g, e = got.loc[k, c], exp.loc[k, c]
                if e is None or (isinstance(e, float) and math.isnan(e)):
                    assert g is None or (isinstance(g, float) and math.isnan(g)), (
                        fn, k, c, g,
                    )
                elif math.isinf(e):
                    assert g is None or math.isinf(g) or abs(g) > 1e12
                else:
                    assert g is not None and abs(g - e) < 1e-6 * max(1, abs(e)), (
                        fn, k, c, g, e,
                    )


@given(rows=_STR_ROWS, lit=_STR_CHARS, w=st.integers(0, 15), i=st.integers(-5, 5))
@settings(**COMMON)
def test_str_accessor_extended_matches_pandas(spark, rows, lit, w, i):
    """Second str sweep: padding family (zfill sign handling), find/
    rfind, removeprefix/suffix, case flips, get, repeat, and the
    n-limited split/rsplit pair — across regex-metachar content."""
    pdf, edf = _str_frame(spark, rows)
    ps = pdf["s"]

    def eq(got, exp, tag):
        got = got.to_pandas().tolist()
        exp = exp.tolist()
        assert len(got) == len(exp), tag
        for g, e in zip(got, exp):
            seq = (list, tuple, np.ndarray)
            if e is None or (not isinstance(e, seq) and pd.isna(e)):
                assert g is None or (not isinstance(g, seq) and pd.isna(g)), (
                    tag, g, e,
                )
            else:
                ge = list(g) if isinstance(g, seq) else g
                ee = list(e) if isinstance(e, seq) else e
                assert ge == ee, (tag, ge, ee)

    eq(edf["s"].str.zfill(w), ps.str.zfill(w), "zfill")
    eq(edf["s"].str.ljust(w, "."), ps.str.ljust(w, "."), "ljust")
    eq(edf["s"].str.rjust(w, "."), ps.str.rjust(w, "."), "rjust")
    eq(edf["s"].str.center(w, "."), ps.str.center(w, "."), "center")
    if lit:
        eq(edf["s"].str.find(lit), ps.str.find(lit), "find")
        eq(edf["s"].str.rfind(lit), ps.str.rfind(lit), "rfind")
    eq(edf["s"].str.removeprefix(lit), ps.str.removeprefix(lit), "rmpre")
    eq(edf["s"].str.removesuffix(lit), ps.str.removesuffix(lit), "rmsuf")
    eq(edf["s"].str.capitalize(), ps.str.capitalize(), "capitalize")
    eq(edf["s"].str.swapcase(), ps.str.swapcase(), "swapcase")
    eq(edf["s"].str.repeat(2), ps.str.repeat(2), "repeat")
    eq(edf["s"].str.get(i), ps.str.get(i), "get")
    # "." and "*" separators pin the regex-metachar split bug class
    # (ADVICE r3) permanently, independent of what the fuzzer draws
    for sep in ("-", ".", "*"):
        for n in (1, 2):
            eq(
                edf["s"].str.split(sep, n=n),
                ps.map(lambda v: None if v is None else v.split(sep, n)),
                f"split{n}{sep!r}",
            )
            eq(
                edf["s"].str.rsplit(sep, n=n),
                ps.map(lambda v: None if v is None else v.rsplit(sep, n)),
                f"rsplit{n}{sep!r}",
            )


# --- funnel / rolling z-score fuzzers (r4) ---------------------------------

_EVENT_LOGS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.sampled_from(["s1", "s2", "s3", "zz"]),      # type (zz = noise)
        st.integers(min_value=0, max_value=50),          # seconds offset
    ),
    min_size=0,
    max_size=60,
)


def _py_greedy_chain(events, steps, within=None):
    """Reference greedy funnel: time-sorted (step-rank tiebreak) fold."""
    rank = {}
    for i, s in enumerate(steps):
        rank.setdefault(s, i + 1)
    out = {}
    by_user = {}
    for u, t, sec in events:
        if t in rank:
            by_user.setdefault(u, []).append((sec, rank[t], t))
    for u, evs in by_user.items():
        evs.sort()
        hits = []
        for sec, _, t in evs:
            if len(hits) < len(steps) and t == steps[len(hits)]:
                hits.append(sec)
        if within is not None:
            hits = [h for h in hits if h - hits[0] <= within]
        out[u] = hits
    return out


@pytest.mark.parametrize("skew_safe", [False, True])
@given(events=_EVENT_LOGS, within=st.one_of(st.none(), st.integers(0, 30)))
@settings(**COMMON)
def test_funnel_chains_match_python_reference(spark, skew_safe, events, within):
    from eland_spark.operators.funnel import funnel_chains

    steps = ["s1", "s2", "s3"]
    pdf = pd.DataFrame(events, columns=["user_id", "event_type", "sec"])
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf["sec"], unit="s")
    sdf = spark.createDataFrame(
        pdf[["user_id", "event_type", "ts"]],
        schema="user_id bigint, event_type string, ts timestamp_ntz",
    )
    got = {}
    out = funnel_chains(sdf, steps, within_seconds=within,
                        skew_safe=skew_safe)
    for r in out.collect():
        got.setdefault(r["user_id"], []).append(
            (r["step_index"], int(r["step_ts"].timestamp()) % 86400 % 3600)
        )
    want = _py_greedy_chain(events, steps, within)
    want = {
        u: [(i + 1, h % 3600) for i, h in enumerate(hits)]
        for u, hits in want.items() if hits
    }
    got = {u: sorted(v) for u, v in got.items()}
    assert got == {u: sorted(v) for u, v in want.items()}


_ZS_VALS = st.one_of(
    # bounded magnitude: pandas' rolling mean/std update incrementally
    # (add/remove running sums), so a huge value LEAVING the window
    # poisons its sums via catastrophic cancellation (~1e-5 rel at 3e5
    # magnitude, found by this fuzzer at FUZZ_EXAMPLES=80) — our
    # per-frame window aggregation doesn't drift, so unbounded draws
    # would fail on pandas' error, not ours
    st.floats(min_value=-1e4, max_value=1e4,
              allow_nan=False, allow_infinity=False, width=64),
    st.none(),
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), _ZS_VALS),
        min_size=0, max_size=50,
    ),
    window=st.integers(1, 8),
    min_periods=st.integers(1, 5),
)
@settings(**COMMON)
def test_rolling_zscore_matches_pandas_fuzz(spark, rows, window, min_periods):
    from eland_spark.operators.timeseries import rolling_zscore

    min_periods = min(min_periods, window)  # pandas raises otherwise
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    pdf["i"] = range(len(pdf))
    sdf = spark.createDataFrame(
        pdf[["g", "v", "i"]], schema="g bigint, v double, i bigint"
    )
    got = (
        rolling_zscore(sdf, "v", ["i"], by="g",
                       window=window, min_periods=min_periods, threshold=2.0)
        .toPandas().sort_values("i")["zscore"].reset_index(drop=True)
    )

    def ref(g):
        # EXACT per-window mean/std (direct slices, fsum) — pandas'
        # own incremental rolling sums drift when a large value passes
        # through the accumulator before tiny ones (e.g. 1716 then
        # 2^-8: pandas z off by 1.5e-5 relative where this engine is
        # exact), so pandas cannot serve as the reference here; same
        # upgrade as the rolling-sum fuzzer
        import math as m

        vals = g["v"].tolist()
        out = []
        for i, v in enumerate(vals):
            prev = [
                x for x in vals[max(0, i - window):i]
                if x is not None and not (isinstance(x, float) and m.isnan(x))
            ]
            n = len(prev)
            if n < min_periods or v is None or (
                isinstance(v, float) and m.isnan(v)
            ):
                out.append(float("nan"))
                continue
            mu = m.fsum(prev) / n
            var = m.fsum((x - mu) ** 2 for x in prev) / (n - 1) if n > 1 else 0.0
            sd = m.sqrt(var)
            # conditioning guard (CLAUDE.md, r6 lesson): when
            # kappa=(1+mu^2)/var blows past 1e12 the window variance is
            # pure cancellation residue — even this exact fsum reference
            # and the engine legitimately disagree by large factors
            # (found r7: [10000.0, 9999.999999999998] -> kappa ~ 6e31,
            # z differs 1.4x). Skip those positions on BOTH sides.
            if var > 0 and (1.0 + mu * mu) / var > 1e12:
                out.append(None)  # sentinel: excluded from comparison
                continue
            out.append((v - mu) / sd if sd > 0 else float("nan"))
        return pd.Series(out, index=g.index, dtype=object)

    if len(pdf) == 0:
        assert len(got) == 0
        return
    pdf["v"] = pdf["v"].astype("float64")
    parts = [
        ref(g.sort_values("i"))
        for _, g in pdf.groupby("g", sort=False)
    ]
    want_obj = pd.concat(parts).sort_index().reset_index(drop=True)
    keep = [w is not None for w in want_obj]
    want = want_obj[keep].astype("float64").round(6).reset_index(drop=True)
    got = got[keep].reset_index(drop=True)
    pd.testing.assert_series_equal(
        got, want, check_names=False, rtol=1e-5, atol=1e-8
    )


# --- reindex / align fuzzers (r5) ------------------------------------------

_RX_VALS = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False, width=64),
    st.none(),
)


@given(
    rows=st.lists(st.tuples(st.integers(0, 30), _RX_VALS),
                  min_size=0, max_size=15, unique_by=lambda t: t[0]),
    labels=st.lists(st.integers(-5, 40), min_size=0, max_size=10),
    method=st.sampled_from([None, "ffill", "bfill"]),
)
@settings(**COMMON)
def test_reindex_matches_pandas_fuzz(spark, rows, labels, method):
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    edf = EDF(
        spark.createDataFrame(pdf, schema="k bigint, v double"),
        index_cols=("k",),
    )
    ppdf = pdf.set_index("k")
    got = (edf.reindex(index=labels, method=method).to_pandas()
           .set_index("k"))
    # pandas needs a monotonic source for method=; our value-ordered
    # as-of formulation is order-free — sort the pandas side to match
    want = ppdf.sort_index().reindex(labels, method=method)
    # duplicate labels repeat rows; compare as sorted multisets
    g = sorted((k, None if pd.isna(v) else round(v, 9))
               for k, v in zip(got.index, got["v"]))
    w = sorted((k, None if pd.isna(v) else round(v, 9))
               for k, v in zip(want.index, want["v"]))
    assert g == w


@given(
    lrows=st.lists(st.tuples(st.integers(0, 12), _RX_VALS),
                   min_size=0, max_size=8, unique_by=lambda t: t[0]),
    rrows=st.lists(st.tuples(st.integers(0, 12), _RX_VALS),
                   min_size=0, max_size=8, unique_by=lambda t: t[0]),
    join=st.sampled_from(["outer", "inner", "left", "right"]),
)
@settings(**COMMON)
def test_align_matches_pandas_fuzz(spark, lrows, rrows, join):
    lp = pd.DataFrame(lrows, columns=["k", "v"])
    rp = pd.DataFrame(rrows, columns=["k", "v"])
    le = EDF(spark.createDataFrame(lp, schema="k bigint, v double"),
             index_cols=("k",))
    re_ = EDF(spark.createDataFrame(rp, schema="k bigint, v double"),
              index_cols=("k",))
    gl, gr = le.align(re_, join=join)
    pl, pr = lp.set_index("k").align(rp.set_index("k"), join=join)

    def snap(df):
        return sorted(
            (k, None if pd.isna(v) else round(v, 9))
            for k, v in zip(df.index, df["v"])
        )

    assert snap(gl.to_pandas().set_index("k")) == snap(pl)
    assert snap(gr.to_pandas().set_index("k")) == snap(pr)


def test_floordiv_special_value_matrix(spark):
    """Deterministic numpy npy_floor_divide parity matrix: rounding-edge
    quotients (1.5 // 1e-05), infinite DIVISORS (the quotient-adjust
    form: 5.0 // -inf is -1.0, never NaN), infinite DIVIDENDS (NaN for
    b != 0, the raw IEEE quotient for b == 0), overflowing finite
    quotients, subnormals, and exact-integer quotients through the lazy
    exactness gate. pow exponent 2 rides along (numpy lowers x**2 to
    x*x; so do we)."""
    import math

    cases = [
        (1.5, 1e-05), (-1.5, 1e-05), (1.5, -1e-05), (-1.5, -1e-05),
        (7.0, 7.0), (14.0, 7.0), (1e16, 3.0),
        (5.0, float("inf")), (5.0, float("-inf")),
        (-5.0, float("inf")), (-5.0, float("-inf")),
        (float("inf"), 7.0), (float("-inf"), 7.0),
        (float("inf"), float("inf")), (float("inf"), 0.0),
        (float("-inf"), 0.0), (0.0, 7.0),
        (1.0, 0.0), (-1.0, 0.0), (0.0, 0.0),
        (float("nan"), 3.0), (3.0, float("nan")),
        (float("nan"), 0.0), (float("inf"), float("nan")),
        (1.0, 1e-308), (2.0 ** 52 + 1, 1.0), (1e300, 1e-300),
        (0.1, 0.3), (-0.1, 0.3), (1e-320, 1e-310),
        (6.0, 2.0), (-6.0, 2.5), (-7.0, 2.0),
        (2.0 ** 53, 3.0), (-(2.0 ** 53), 7.0), (1e308, 0.5),
        (5e-324, 2.0), (-5e-324, 2.0), (1e-310, -1e-300),
    ]
    pdf = pd.DataFrame(cases, columns=["a", "b"])
    _, edf = _div_frame(spark, list(map(tuple, pdf.itertuples(index=False))))
    out = (
        edf.assign(fd=edf.a // edf.b, sq=edf.a ** 2)
        .to_pandas().sort_values("_id").reset_index(drop=True)
    )
    exp_fd = (pdf.a // pdf.b).reset_index(drop=True)
    exp_sq = (pdf.a ** 2).reset_index(drop=True)
    for i in range(len(cases)):
        g, w = out["fd"][i], exp_fd[i]
        assert (math.isnan(g) and math.isnan(w)) or g == w, (cases[i], g, w)
        g, w = out["sq"][i], exp_sq[i]
        assert (math.isnan(g) and math.isnan(w)) or g == w, (cases[i], g, w)


def _ref_rolling_corr_cov(a, b, window, metric):
    """Stable two-pass per-window reference for rolling corr/cov on
    pairwise-complete observations with the engine's pandas semantics
    (pair count gates min_periods; zero variance -> NaN corr).
    Computed fresh per window — pandas' own sliding roll_corr carries
    Welford-removal residue from values that LEFT the window
    (hypothesis find, r6: a 2-point window after a 47409 left the
    history -> pandas 0.9999979 where two points are exactly corr=1;
    this engine re-aggregates each frame and returns 1.0). Returns
    (expected, kappa) where kappa bounds the window's conditioning."""
    n_rows = len(a)
    out = np.full(n_rows, np.nan)
    kappa = np.zeros(n_rows)
    for i in range(n_rows):
        lo = max(0, i - window + 1)
        xa, xb = a[lo:i + 1], b[lo:i + 1]
        m = ~np.isnan(xa) & ~np.isnan(xb)
        n = int(m.sum())
        if n < window:  # min_periods defaults to window, counts PAIRS
            continue
        x, y = xa[m], xb[m]
        mx, my = x.mean(), y.mean()
        dx, dy = x - mx, y - my
        cov = float((dx * dy).sum()) / (n - 1)
        vx = float((dx * dx).sum()) / (n - 1)
        vy = float((dy * dy).sum()) / (n - 1)
        sx, sy = 1.0 + float(mx) * float(mx), 1.0 + float(my) * float(my)
        # clamp the denominator so the ratio stays finite (a zero/tiny
        # variance reads as kappa ~ 1e16, far past every skip cutoff)
        kx = sx / max(vx, sx * 1e-16)
        ky = sy / max(vy, sy * 1e-16)
        kappa[i] = max(kx, ky)
        if metric == "cov":
            out[i] = cov
        elif vx > 0 and vy > 0:
            out[i] = cov / math.sqrt(vx * vy)
    return out, kappa


@given(
    rows=ROWS,
    window=st.integers(min_value=2, max_value=6),
)
@settings(**COMMON)
def test_rolling_corr_cov_match_pandas(spark, rows, window):
    """rolling().corr/cov(other) == a STABLE per-window two-pass
    reference on pairwise-complete observations, incl. null-holed
    windows and min_periods heads. The reference is deliberately not
    pandas: its sliding Welford removal leaves residue from values
    that left the window, and its sums can underflow to ±inf — both
    artifacts this engine (which re-aggregates every frame with
    Spark's stable moments) correctly avoids. Tolerance scales with
    the window's conditioning; windows beyond kappa 1e12 are skipped
    (no double-based engine carries information there)."""
    pdf, edf = _frame(spark, rows)
    sa, sb = edf["a"], edf["b"]
    a = pdf.set_index("_id")["a"].astype("float64").sort_index().to_numpy()
    b = pdf.set_index("_id")["b"].astype("float64").sort_index().to_numpy()
    got_corr = (
        sa.rolling(window).corr(sb).to_pandas()["rolling_corr"].sort_index()
        .to_numpy(dtype="float64")
    )
    got_cov = (
        sa.rolling(window).cov(sb).to_pandas()["rolling_cov"].sort_index()
        .to_numpy(dtype="float64")
    )
    for name, g in [("corr", got_corr), ("cov", got_cov)]:
        e, kappa = _ref_rolling_corr_cov(a, b, window, name)
        for i in range(len(a)):
            if kappa[i] > 1e12:
                continue
            if not np.isfinite(e[i]):
                assert not np.isfinite(g[i]), (rows, window, name, i, g[i])
                continue
            if name == "corr":
                atol = max(1e-9, min(0.1, 1e-13 * kappa[i]))
            else:
                scale = (1.0 + abs(a[i])) * (1.0 + abs(b[i]))
                atol = max(1e-9, 1e-13 * scale)
            assert np.isclose(g[i], e[i], rtol=1e-6, atol=atol), (
                rows, window, name, i, g[i], e[i], kappa[i]
            )


@given(rows=ROWS)
@settings(**COMMON)
def test_spearman_matches_rank_pearson_fuzz(spark, rows):
    """Series.corr(method='spearman') == Pearson of pandas average
    midranks on pairwise-complete observations — incl. nulls on either
    side, heavy ties (the small-int key column doubles as a tied value
    column), constant sides (NaN), and empty frames."""
    pdf, edf = _frame(spark, rows)
    got = edf["k"].corr(edf["b"], method="spearman")
    mask = pdf["k"].notna() & pdf["b"].notna()
    sub = pdf[mask]
    if len(sub) == 0:
        assert math.isnan(got)
        return
    ka = sub["k"].rank(method="average")
    kb = sub["b"].rank(method="average")
    exp = ka.corr(kb)  # Pearson of midranks == Spearman
    if isinstance(exp, float) and math.isnan(exp):
        assert math.isnan(got), (rows, got)
    else:
        assert got == pytest.approx(exp, abs=1e-9), rows


@given(rows=ROWS)
@settings(**COMMON)
def test_rank_transform_matches_pandas_pct_fuzz(spark, rows):
    """rank_transform == pandas rank(method='average', pct=True),
    incl. nulls (stay null), ties, negatives, and empty frames."""
    from eland_spark.operators.scaling import rank_transform

    pdf, _ = _frame(spark, rows)
    sdf = spark.createDataFrame(
        pdf, schema="k bigint, a double, b double, _id bigint"
    )
    got = (
        rank_transform(sdf, "a").toPandas()
        .sort_values("_id")["a_q"].to_numpy(dtype="float64")
    )
    want = pdf["a"].rank(method="average", pct=True).to_numpy(dtype="float64")
    assert np.allclose(got, want, atol=1e-12, equal_nan=True), rows


def _ref_rolling_moment(vals, window, stat):
    """Stable two-pass per-window reference for rolling skew/kurt with
    the engine's pandas-cython-path guard semantics (<3/<4 non-null ->
    nan, exact all-equal -> 0.0/-3.0, population variance <= 1e-14 ->
    nan). Centered sums, so it stays accurate where pandas' own
    roll_skew/roll_kurt power sums catastrophically cancel (hypothesis
    find, r6: window [-999999999, -1e9, -1e9] -> pandas 4.17e8, true
    G1 = sqrt(3)). Returns (expected, m2pop) arrays; m2pop lets the
    caller skip guard-boundary rows and scale tolerance by
    conditioning."""
    n_rows = len(vals)
    out = np.full(n_rows, np.nan)
    m2pops = np.full(n_rows, np.nan)
    need = 3 if stat == "skew" else 4
    for i in range(n_rows):
        if i + 1 < window:
            continue
        w = vals[i - window + 1:i + 1]
        w = w[~np.isnan(w)]
        n = len(w)
        if n < max(window, need):
            continue
        if np.all(w == w[0]):
            out[i] = 0.0 if stat == "skew" else -3.0
            m2pops[i] = 0.0
            continue
        wf = np.where(np.abs(w) < 1e-30, 0.0, w)
        mu = wf.mean()
        d = wf - mu
        m2 = float((d * d).sum())
        m2pops[i] = m2 / n
        if m2 / n <= 1e-14:
            continue
        if stat == "skew":
            g1 = (float((d ** 3).sum()) / n) / (m2 / n) ** 1.5
            out[i] = math.sqrt(n * (n - 1)) / (n - 2) * g1
        else:
            g2 = (float((d ** 4).sum()) / n) / (m2 / n) ** 2 - 3.0
            out[i] = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
    return out, m2pops


@given(rows=ROWS, window=st.integers(min_value=2, max_value=8))
@example(  # the r6 hypothesis find: pandas roll_skew returns 4.17e8 here
    rows=[(0, 0.0, 0.0), (0, -999999999.0, 0.0), (0, -1000000000.0, 0.0),
          (0, -1000000000.0, 0.0)],
    window=3,
)
@settings(**COMMON)
def test_rolling_skew_kurt_match_pandas_fuzz(spark, rows, window):
    """rolling().skew()/.kurt() == a STABLE two-pass per-window
    reference with pandas' guard semantics, incl. null holes, short
    heads, and all-equal windows (0.0 / -3.0). The reference is not
    pandas itself: its roll_skew/roll_kurt power sums cancel
    catastrophically on near-constant windows at |x| ~ 1e9 (this
    engine's Spark builtin moments stay correct there — same class of
    win as the expanding-moments Pébay plan). Tolerance scales with
    the conditioning kappa = (1+mu^2)/var_pop — no double-based engine
    can beat eps*kappa; guard-boundary rows (var_pop within 2x of the
    1e-14 cutoff) are skipped since the two sides may disagree on
    which side of the guard they fall."""
    pdf, edf = _frame(spark, rows)
    p = pdf.set_index("_id")["a"].astype("float64")
    vals = p.sort_index().to_numpy(dtype="float64")
    for stat, col in (("skew", "rolling_skew"), ("kurt", "rolling_kurt")):
        g = (
            getattr(edf["a"].rolling(window), stat)()
            .to_pandas()[col].sort_index().to_numpy(dtype="float64")
        )
        e, m2pop = _ref_rolling_moment(vals, window, stat)
        for i in range(len(vals)):
            if 0.5e-14 <= (m2pop[i] if np.isfinite(m2pop[i]) else 1.0) <= 2e-14:
                continue  # guard boundary: either verdict is defensible
            if not np.isfinite(e[i]):
                assert not np.isfinite(g[i]), (rows, window, stat, i)
                continue
            w = vals[i - window + 1:i + 1]
            w = w[~np.isnan(w)]
            mu = float(w.mean()) if len(w) else 0.0
            scale = 1.0 + mu * mu
            if m2pop[i] > 0 and m2pop[i] < scale * 1e-12:
                continue  # kappa > 1e12: beyond double conditioning
            kappa = scale / m2pop[i] if m2pop[i] > 0 else 1.0
            atol = max(1e-6, min(1.0, 1e-13 * kappa))
            assert np.isclose(g[i], e[i], rtol=1e-5, atol=atol), (
                rows, window, stat, i, g[i], e[i], kappa
            )


@given(rows=ROWS)
@settings(**COMMON)
def test_expanding_skew_kurt_match_exact_fuzz(spark, rows):
    """expanding().skew()/.kurt() == an EXACT two-pass per-prefix
    reference (mean, then central sums) — tighter than pandas parity:
    pandas pre-centers its rolling moment sums at the FULL-SERIES
    mean, so on heavy-tailed data its own prefix skew carries ~1e-4
    relative noise (e.g. [0, 0, 1, 10501] -> pandas 1.73212805 where
    the true value is sqrt(3) = 1.73205081); this engine's per-bucket
    builtin moments + Pebay pairwise combine stay accurate. Edge
    semantics still mirror pandas\' rolling cython path: <3/<4
    observations null, all-equal prefixes 0.0 / -3.0."""

    def exact(vals):
        sk, ku = [], []
        seen = []
        for x in vals:
            if x is not None and not (isinstance(x, float) and math.isnan(x)):
                seen.append(float(x))
            n = len(seen)
            mu = math.fsum(seen) / n if n else 0.0
            m2 = math.fsum((v - mu) ** 2 for v in seen)
            # pandas guard order: exact all-equal -> 0/-3; population
            # variance <= 1e-14 -> NaN (GH 42064); else the formula
            if n >= 3:
                if min(seen) == max(seen):
                    sk.append(0.0)
                elif m2 / n <= 1e-14:
                    sk.append(float("nan"))
                else:
                    m3 = math.fsum((v - mu) ** 3 for v in seen)
                    sk.append(n * math.sqrt(n - 1) / (n - 2) * m3 / m2 ** 1.5)
            else:
                sk.append(float("nan"))
            if n >= 4:
                if min(seen) == max(seen):
                    ku.append(-3.0)
                elif m2 / n <= 1e-14:
                    ku.append(float("nan"))
                else:
                    m4 = math.fsum((v - mu) ** 4 for v in seen)
                    g2 = n * m4 / m2 ** 2 - 3.0
                    ku.append(
                        ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
                    )
            else:
                ku.append(float("nan"))
        return np.array(sk), np.array(ku)

    pdf, edf = _frame(spark, rows)
    got_sk = (
        edf["a"].expanding().skew()
        .to_pandas()["expanding_skew"].sort_index().to_numpy(dtype="float64")
    )
    got_ku = (
        edf["a"].expanding().kurt()
        .to_pandas()["expanding_kurt"].sort_index().to_numpy(dtype="float64")
    )
    exp_sk, exp_ku = exact([r[1] for r in rows])
    for g, e in [(got_sk, exp_sk), (got_ku, exp_ku)]:
        fin = np.isfinite(e)
        # rtol bounded by the conditioning of the builtin window
        # moments (stable, not exact-fsum); atol covers near-zero skew
        assert np.allclose(g[fin], e[fin], rtol=1e-6, atol=1e-7), rows
        assert np.isnan(g[~fin]).all(), rows


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-3, max_value=3),   # key (any sortable int)
            st.integers(min_value=-5, max_value=5),   # value (heavy ties)
            st.integers(min_value=1, max_value=4),    # weight
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**COMMON)
def test_keyed_midranks_match_python_fuzz(spark, rows):
    """keyed_midranks == a pure-python per-key tie-averaged midrank
    over the expanded multiset (weights = repetition counts); keys
    with any weights, any tie structure, including empty input."""
    from eland_spark.operators.ranking import keyed_midranks

    per = {}
    for k, v, w in rows:
        per[(k, float(v))] = per.get((k, float(v)), 0) + w
    if per:
        pdf = pd.DataFrame(
            [(k, v, n) for (k, v), n in per.items()],
            columns=["k", "v", "n"],
        )
    else:
        pdf = pd.DataFrame({"k": [], "v": [], "n": []})
    sdf = spark.createDataFrame(pdf, schema="k bigint, v double, n bigint")
    mids, key_totals = keyed_midranks(sdf, "k", "v", "n", out_col="m")
    got = {(r["k"], r["v"]): r["m"] for r in mids.collect()}
    assert len(got) == len(per)
    want_totals = {}
    for (k, _v), n in per.items():
        want_totals[k] = want_totals.get(k, 0) + n
    assert key_totals == want_totals
    # python reference: expand each key's multiset, average the ranks
    bykey = {}
    for (k, v), n in per.items():
        bykey.setdefault(k, []).extend([v] * n)
    for k, vals in bykey.items():
        s = pd.Series(sorted(vals))
        ranks = s.rank(method="average")
        want = dict(zip(s, ranks))
        for v in set(vals):
            assert got[(k, v)] == pytest.approx(want[v]), (k, v, got[(k, v)], want[v])


# ---------------------------------------------------------------------------
# r7 operator fuzzers: BLEU/ROUGE, Fleiss, JS, KS battery, BH, MMR,
# unigram Viterbi — each vs a sequential pure-python reference
# ---------------------------------------------------------------------------

_WORDS = st.lists(
    st.sampled_from(["a", "b", "ab", "cat", "x", "yz"]),
    min_size=0, max_size=8,
)
_TEXT = _WORDS.map(" ".join)


@given(pairs=st.lists(st.tuples(_TEXT, _TEXT), min_size=1, max_size=8))
@settings(**COMMON)
def test_corpus_bleu_matches_reference_fuzz(spark, pairs):
    from collections import Counter

    from eland_spark.operators.evaluation import corpus_bleu

    sdf = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["c", "r"]),
        schema="c string, r string",
    )
    row = corpus_bleu(sdf, "c", "r", max_n=2).toPandas().iloc[0]
    m = [0, 0]
    t = [0, 0]
    cl = rl = 0
    for c, r in pairs:
        # split('') in Spark yields [''] — mirror the \s+ trim-split
        ct = c.split() if c.strip() else [""]
        rt = r.split() if r.strip() else [""]
        cl += len(ct)
        rl += len(rt)
        for n in (1, 2):
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
    if cl == 0:
        assert row["bleu"] is None or pd.isna(row["bleu"])
        return
    want = (
        0.0
        if any((p or 0) == 0 for p in ps)
        else bp * math.exp(sum(math.log(p) for p in ps) / 2)
    )
    assert row["bleu"] == pytest.approx(want, abs=2e-6)


@given(
    ratings=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abc")),
        min_size=1, max_size=60,
    ),
    n_raters=st.integers(2, 4),
)
@settings(**COMMON)
def test_fleiss_kappa_matches_formula_fuzz(spark, ratings, n_raters):
    from eland_spark.operators.evaluation import fleiss_kappa

    # build an equal-panel table: first n_raters ratings per item
    by_item = {}
    for i, c in ratings:
        by_item.setdefault(i, []).append(c)
    rows = [
        (i, c)
        for i, cs in by_item.items()
        if len(cs) >= n_raters
        for c in cs[:n_raters]
    ]
    if not rows:
        return
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "c"]))
    row = fleiss_kappa(sdf, "i", "c").toPandas().iloc[0]
    items = sorted({i for i, _ in rows})
    cats = sorted({c for _, c in rows})
    n = n_raters
    mat = {(i, c): 0 for i in items for c in cats}
    for i, c in rows:
        mat[(i, c)] += 1
    pi = [
        (sum(mat[(i, c)] ** 2 for c in cats) - n) / (n * (n - 1))
        for i in items
    ]
    pj = [
        sum(mat[(i, c)] for i in items) / (len(items) * n) for c in cats
    ]
    pbar = sum(pi) / len(items)
    pe = sum(p * p for p in pj)
    assert row["p_bar"] == pytest.approx(pbar, abs=1e-6)
    assert row["p_e"] == pytest.approx(pe, abs=1e-6)
    if pe < 1.0:
        assert row["kappa"] == pytest.approx(
            (pbar - pe) / (1 - pe), abs=1e-5
        )
    else:
        assert pd.isna(row["kappa"])


@given(
    ref=st.lists(st.sampled_from("abcd"), min_size=1, max_size=40),
    cur=st.lists(st.sampled_from("abce"), min_size=1, max_size=40),
)
@settings(**COMMON)
def test_js_divergence_matches_reference_fuzz(spark, ref, cur):
    from eland_spark.operators.drift import js_divergence

    a = spark.createDataFrame(pd.DataFrame({"x": ref}))
    b = spark.createDataFrame(pd.DataFrame({"x": cur}))
    row = js_divergence(a, b, "x").toPandas().iloc[0]
    cats = sorted(set(ref) | set(cur))
    js = 0.0
    for c in cats:
        p, q = ref.count(c) / len(ref), cur.count(c) / len(cur)
        mm = (p + q) / 2
        if p > 0:
            js += p * math.log(p / mm) / 2
        if q > 0:
            js += q * math.log(q / mm) / 2
    assert row["js"] == pytest.approx(js, abs=1e-6)
    assert 0 <= row["js"] <= math.log(2) + 1e-9


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.booleans(),                          # side
            st.integers(-5, 5).map(float),          # value (ties likely)
        ),
        min_size=2, max_size=80,
    )
)
@settings(**COMMON)
def test_ks_battery_matches_reference_fuzz(spark, data):
    from eland_spark.operators.drift import ks_battery

    ref = [(k, v) for k, s, v in data if not s]
    cur = [(k, v) for k, s, v in data if s]
    if not ref or not cur:
        return
    a = spark.createDataFrame(pd.DataFrame(ref, columns=["k", "v"]))
    b = spark.createDataFrame(pd.DataFrame(cur, columns=["k", "v"]))
    out = {r["k"]: r for r in ks_battery(a, b, "k", "v").collect()}
    keys = sorted({k for k, _ in ref} | {k for k, _ in cur})
    for k in keys:
        av = sorted(v for kk, v in ref if kk == k)
        bv = sorted(v for kk, v in cur if kk == k)
        r = out[k]
        if not av or not bv:
            assert r["ks"] is None
            continue
        grid = sorted(set(av) | set(bv))
        ks = max(
            abs(
                sum(1 for x in av if x <= g) / len(av)
                - sum(1 for x in bv if x <= g) / len(bv)
            )
            for g in grid
        )
        assert r["ks"] == pytest.approx(ks, abs=1e-6)
        assert r["n_ref"] == len(av) and r["n_cur"] == len(bv)


@given(
    ps=st.lists(
        st.one_of(
            st.floats(0.0001, 1.0, allow_nan=False),
            st.none(),
        ),
        min_size=1, max_size=30,
    )
)
@settings(**COMMON)
def test_fdr_bh_matches_reference_fuzz(spark, ps):
    from eland_spark.operators.drift import fdr_bh

    sdf = spark.createDataFrame(
        pd.DataFrame(
            {"f": range(len(ps)), "p": pd.array(ps, dtype="Float64")}
        )
    )
    got = fdr_bh(sdf, "p", alpha=0.1).orderBy("f").toPandas()
    clean = [(i, p) for i, p in enumerate(ps) if p is not None]
    if not clean:
        assert got["p_adj"].isna().all()
        return
    m = len(clean)
    order = sorted(range(m), key=lambda x: clean[x][1])
    adj = {}
    prev = 1.0
    for pos in range(m - 1, -1, -1):
        i, p = clean[order[pos]]
        prev = min(prev, p * m / (pos + 1))
        adj[i] = prev
    # ties: every member of a tied block shares the block's smallest
    # candidate — recompute with the distinct-value rule
    byp = {}
    for i, p in clean:
        byp.setdefault(p, []).append(i)
    for p, idxs in byp.items():
        v = min(adj[i] for i in idxs)
        for i in idxs:
            adj[i] = v
    for i, p in clean:
        assert got["p_adj"].iloc[i] == pytest.approx(adj[i], abs=1e-9)
        assert bool(got["reject"].iloc[i]) == (adj[i] <= 0.1)


@given(
    cands=st.lists(
        st.tuples(
            st.integers(1, 40),                      # id
            st.floats(-1, 1, allow_nan=False),       # rel
            st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                     min_size=3, max_size=3),        # vec
        ),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
    lam=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
@settings(**COMMON)
def test_mmr_matches_reference_fuzz(spark, cands, lam):
    from eland_spark.operators.similarity import mmr_rerank

    pdf = pd.DataFrame(
        {
            "q": [0] * len(cands),
            "id": [c[0] for c in cands],
            "rel": [c[1] for c in cands],
            "vec": [c[2] for c in cands],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["rnk"], r["id"], r["mmr_score"])
        for r in mmr_rerank(sdf, "q", "id", "rel", "vec", k=5, lam=lam)
        .orderBy("rnk").collect()
    ]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    ids = [c[0] for c in cands]
    rel = [c[1] for c in cands]
    # float32 storage: the engine sees float32-rounded vector values
    vecs = [[float(np.float32(v)) for v in c[2]] for c in cands]
    nrm = [math.sqrt(dot(v, v)) for v in vecs]
    pen = [None] * len(ids)
    taken = [False] * len(ids)
    want = []
    for step in range(min(5, len(ids))):
        best = None
        for i in range(len(ids)):
            if taken[i]:
                continue
            p = pen[i] if pen[i] is not None else 0.0
            s = lam * rel[i] - (1 - lam) * p
            if best is None or s > best[0] or (
                s == best[0] and ids[i] < best[1]
            ):
                best = (s, ids[i], i)
        s, bid, bi = best
        taken[bi] = True
        want.append((step + 1, bid, s))
        for i in range(len(ids)):
            if taken[i]:
                continue
            # engine contract: penalty cosine rounded to 9dp before it
            # feeds the score (cross-engine ulp-drift guard)
            c = (
                round(dot(vecs[i], vecs[bi]) / (nrm[i] * nrm[bi]), 9)
                if nrm[i] > 0 and nrm[bi] > 0
                else 0.0
            )
            if pen[i] is None or c > pen[i]:
                pen[i] = c
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=10),
    vocab_counts=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.integers(1, 50),
        min_size=1, max_size=12,
    ),
)
@settings(**COMMON)
def test_unigram_viterbi_optimal_fuzz(spark, word, vocab_counts):
    """viterbi_segment returns a MINIMUM-cost segmentation: compare
    against exhaustive enumeration of all segmentations."""
    import itertools

    from eland_spark.operators.unigram import viterbi_segment

    T = sum(vocab_counts.values())
    costs = {
        p: int(round(-math.log(c / T) * 1e9))
        for p, c in vocab_counts.items()
    }
    got = viterbi_segment(word, costs, 3)

    def all_segs(w):
        if not w:
            yield []
            return
        for l in range(1, min(3, len(w)) + 1):
            if w[:l] in costs:
                for rest in all_segs(w[l:]):
                    yield [w[:l]] + rest

    best = None
    for seg in all_segs(word):
        c = sum(costs[p] for p in seg)
        if best is None or c < best[0]:
            best = (c, seg)
    if best is None:
        assert got is None
    else:
        assert got is not None
        assert sum(costs[p] for p in got) == best[0]
