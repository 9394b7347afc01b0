"""Reference API-parity surface: get/info/to_string/to_html, the
deliberate to_numpy/values refusal (eland/dataframe.py:2154-2213), and
the Series accessors."""

import io

import pytest

import eland_spark as es

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return es.read_parquet(spark, f"{SF}/orders.parquet", index_col="o_orderkey")


def test_get_with_default(orders):
    assert orders.get("nope") is None
    assert orders.get("nope", 7) == 7
    assert orders.get("o_custkey").name == "o_custkey"


def test_info_prints_counts_and_dtypes(orders):
    buf = io.StringIO()
    orders.info(buf=buf)
    text = buf.getvalue()
    assert "o_custkey" in text and "non-null" in text and "dtypes:" in text


def test_to_string_and_html_are_peeks(orders):
    s = orders.to_string(max_rows=5)
    assert "o_custkey" in s and "rows x" in s
    h = orders.to_html(max_rows=5)
    assert "<table" in h


def test_to_numpy_and_values_refuse(orders):
    with pytest.raises(AttributeError, match="driver memory"):
        orders.to_numpy()
    with pytest.raises(AttributeError, match="driver memory"):
        orders.values
    with pytest.raises(AttributeError, match="driver memory"):
        orders["o_totalprice"].to_numpy()


def test_series_accessors(orders):
    s = orders["o_totalprice"]
    assert s.ndim == 1 and not s.empty
    assert s.es_dtype == "double"
    assert s.es_field_name == "o_totalprice"
    assert len(s.tail(3)) == 3
    assert len(s.sample(n=5)) == 5
    d = s.describe()
    assert d["count"] > 0 and d["min"] <= d["50%"] <= d["max"]
    assert "o_totalprice" in s.es_info()
    assert isinstance(s.to_string(), str)


def test_series_filter_items(orders):
    keys = orders.to_pandas()["o_orderkey"].head(3).tolist()
    got = orders["o_totalprice"].filter(items=keys)
    assert len(got) == 3


def test_index_abstraction_and_es_dtypes(orders):
    idx = orders.index
    assert idx.es_index_field == "o_orderkey"
    assert idx.is_source_field
    assert len(idx) == orders.shape[0]
    assert "o_orderkey" in idx.es_info()
    ed = orders.es_dtypes
    assert ed["o_totalprice"] == "double"
    assert ed["o_orderkey"] == "bigint"


def test_series_named_arithmetic_aliases(orders):
    """Reference eland/series.py:827-1430 named op aliases."""
    s = orders["o_totalprice"]
    head = s.head(3)
    assert (s.add(1).head(3) == head + 1).all()
    assert (s.radd(1).head(3) == head + 1).all()
    assert (s.sub(2).head(3) == head - 2).all()
    assert (s.rsub(0).head(3) == -head).all()
    assert (s.mul(2).head(3) == s.multiply(2).head(3)).all()
    assert (s.div(2).head(3) == s.truediv(2).head(3)).all()
    assert (s.rdiv(1).head(3) == (1 / head)).all()
    assert (s.floordiv(10).head(3) == head // 10).all()
    assert (s.mod(7).head(3) - head % 7).abs().max() < 1e-9
    assert (s.pow(2).head(3) == head**2).all()
    assert (s.rpow(1).head(3) == 1.0).all()


def test_series_property_parity(orders):
    s = orders["o_totalprice"]
    assert s.dtypes == s.dtype
    assert dict(s.es_dtypes) == {"o_totalprice": "double"}
    assert s.size == len(s)
    assert s.index is not None
    edges, counts = (s * 2).rename("tp2").hist(bins=4)
    assert len(edges) == 5 and len(counts) == 4 and sum(counts) == len(s)


def test_series_map_dict_jvm_side(orders):
    pdf = orders.to_pandas()
    m = {"O": "open", "F": "done", "P": "partial"}
    s = orders["o_orderstatus"].map(m)
    assert (s.head(10).values == pdf.o_orderstatus.map(m).head(10).values).all()
    # unmapped keys -> null (pandas NaN)
    n = orders["o_orderstatus"].map({"O": 1})
    assert n.isna().sum() == int(pdf.o_orderstatus.map({"O": 1}).isna().sum())
    # compiled JVM-side, no Python eval in the plan
    f = orders.assign(st=s)
    plan = f[["st"]].to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    with pytest.raises(TypeError, match="map_pandas"):
        orders["o_totalprice"].map(lambda x: x)


def test_series_map_pandas_arrow_path(orders):
    pdf = orders.to_pandas()
    s = orders["o_totalprice"].map_pandas(lambda s: s * 2 + 1, "double")
    assert (
        abs(s.head(5).values - (pdf.o_totalprice.head(5) * 2 + 1).values) < 1e-9
    ).all()
    # ArrowEvalPython (vectorized), never row-at-a-time BatchEvalPython
    f = orders.assign(x=s)
    plan = f[["x"]].to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_map_in_pandas_batches(orders):
    pdf = orders.to_pandas()

    def fn(it):
        for b in it:
            out = b[b.o_totalprice > 100000].copy()
            out["price_k"] = out.o_totalprice / 1000
            yield out[["o_orderkey", "price_k"]]

    r = orders.map_in_pandas(fn, "o_orderkey long, price_k double")
    assert r.shape[0] == int((pdf.o_totalprice > 100000).sum())
    assert r.index_cols == ("o_orderkey",)


def test_bool_series_aggs_pandas_semantics(orders):
    pdf = orders.to_pandas()
    b = orders["o_totalprice"] > 100000
    e = pdf.o_totalprice > 100000
    assert b.sum() == int(e.sum())
    assert abs(b.mean() - e.mean()) < 1e-12
    assert abs(b.std() - e.std()) < 1e-12
    assert abs(b.var() - e.var()) < 1e-12


def test_series_between_clip_round(orders):
    pdf = orders.to_pandas().set_index("o_orderkey").sort_index()
    s = orders["o_totalprice"]

    for inc in ["both", "neither", "left", "right"]:
        got = orders[s.between(50000, 150000, inclusive=inc)].shape[0]
        exp = int(pdf.o_totalprice.between(50000, 150000, inclusive=inc).sum())
        assert got == exp
    with pytest.raises(ValueError, match="inclusive"):
        s.between(1, 2, inclusive="bogus")

    got = (
        orders.assign(c=s.clip(50000, 150000))[["o_orderkey", "c"]]
        .to_spark()
        .toPandas()
        .set_index("o_orderkey")
        .sort_index()["c"]
    )
    exp = pdf.o_totalprice.clip(50000, 150000)
    assert (abs(got - exp) < 1e-9).all()

    got = (
        orders.assign(r=s.round(-2))[["o_orderkey", "r"]]
        .to_spark()
        .toPandas()
        .set_index("o_orderkey")
        .sort_index()["r"]
    )
    exp = pdf.o_totalprice.round(-2)
    assert (abs(got - exp) < 1e-9).all()


def test_series_where_mask(orders):
    pdf = orders.to_pandas().set_index("o_orderkey").sort_index()
    s = orders["o_totalprice"]
    cond = s > 100000

    def col(series):
        return (
            orders.assign(x=series)[["o_orderkey", "x"]]
            .to_spark()
            .toPandas()
            .set_index("o_orderkey")
            .sort_index()["x"]
        )

    e = pdf.o_totalprice
    ec = e > 100000
    got = col(s.where(cond))
    exp = e.where(ec)
    assert (got.isna() == exp.isna()).all()
    assert (abs(got.fillna(0) - exp.fillna(0)) < 1e-9).all()
    got = col(s.mask(cond, 0.0))
    exp = e.mask(ec, 0.0)
    assert (abs(got - exp) < 1e-9).all()
    with pytest.raises(TypeError, match="boolean Series"):
        s.where(True)


def test_assign_callable(orders):
    f = orders.assign(
        k=lambda d: d["o_totalprice"] / 1000,
        k2=lambda d: d["k"] * 2,  # later assign sees earlier one
    )
    pdf = f[["o_orderkey", "k", "k2"]].to_spark().toPandas()
    assert (abs(pdf.k2 - pdf.k * 2) < 1e-9).all()


def test_series_idxmax_idxmin(orders):
    pdf = orders.to_pandas().set_index("o_orderkey")
    assert orders["o_totalprice"].idxmax() == pdf.o_totalprice.idxmax()
    assert orders["o_totalprice"].idxmin() == pdf.o_totalprice.idxmin()
    assert (orders["o_totalprice"] * -1).idxmax() == pdf.o_totalprice.idxmin()


def test_str_get_dummies(orders):
    pdf = orders.to_pandas().set_index("o_orderkey").sort_index()
    got = (
        orders["o_orderpriority"].str.get_dummies()
        .to_spark()
        .toPandas()
        .set_index("o_orderkey")
        .sort_index()
    )
    exp = pdf.o_orderpriority.str.get_dummies()
    assert list(got.columns) == list(exp.columns)
    assert (got.values == exp.values).all()
    with pytest.raises(ValueError, match="categories"):
        orders["o_orderkey"].astype("string").str.get_dummies(limit=10)


def test_list_accessor(spark):
    import numpy as np

    import eland_spark as es

    emb = es.read_parquet(
        spark, "/root/testdata/sf0.001/embeddings.parquet", index_col="vec_id"
    )
    pdf = emb.to_pandas().set_index("vec_id").sort_index()
    s = emb["embedding"]

    def col(series):
        return (
            emb.assign(x=series)[["vec_id", "x"]]
            .to_spark()
            .toPandas()
            .set_index("vec_id")
            .sort_index()["x"]
        )

    assert (col(s.list.len()).astype(int) == pdf.embedding.map(len)).all()
    assert (abs(col(s.list.get(0)) - pdf.embedding.map(lambda a: a[0])) < 1e-6).all()
    assert (abs(col(s.list.get(-1)) - pdf.embedding.map(lambda a: a[-1])) < 1e-6).all()
    assert col(s.list.get(10**6)).isna().all()
    exp_sum = pdf.embedding.map(lambda a: float(np.sum(a, dtype=np.float64)))
    assert (abs(col(s.list.sum()) - exp_sum) < 1e-4).all()
    assert list(col(s.list.sort()).iloc[0]) == sorted(pdf.embedding.iloc[0])


def test_higher_moment_aggs_match_pandas(orders):
    import pandas as pd

    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    # frame-level
    got = orders[["o_totalprice", "o_custkey"]]
    want = pdf[["o_totalprice", "o_custkey"]]
    for fn in ("skew", "kurt"):
        g = getattr(got, fn)()
        w = getattr(want, fn)()
        assert abs(g["o_totalprice"] - w["o_totalprice"]) < 1e-9
    # series-level + aliases
    assert abs(orders["o_totalprice"].skew() - pdf["o_totalprice"].skew()) < 1e-9
    assert abs(orders["o_totalprice"].kurtosis() - pdf["o_totalprice"].kurt()) < 1e-9
    # prod: log-compare (fp association)
    import numpy as np

    small = orders["o_totalprice"] / orders["o_totalprice"]  # all 1.0
    assert small.prod() == pytest.approx(1.0)
    # groupby-level
    g = orders[["o_orderstatus", "o_totalprice"]].groupby("o_orderstatus").skew()
    w = pdf[["o_orderstatus", "o_totalprice"]].groupby("o_orderstatus").skew()
    assert np.allclose(
        g["o_totalprice"].sort_index().to_numpy(),
        w["o_totalprice"].sort_index().to_numpy(),
    )


def test_any_all_prod_aggs(orders):
    import pandas as pd

    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    hi = orders["o_totalprice"] > 400000
    phi = pdf["o_totalprice"] > 400000
    assert hi.any() == phi.any()
    assert hi.all() == phi.all()
    lo = orders["o_totalprice"] > 0
    assert lo.all() is True
    # groupby any/all keeps bool dtype per column
    g = (
        orders[["o_orderstatus", "o_custkey"]]
        .groupby("o_orderstatus")
        .all()
    )
    w = (
        pdf[["o_orderstatus", "o_custkey"]]
        .astype({"o_custkey": "bool"})
        .groupby("o_orderstatus")
        .all()
    )
    assert (g["o_custkey"].sort_index() == w["o_custkey"].sort_index()).all()


def test_str_accessor_batch2_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    vals = [
        "Hello World", "  padded  ", "abc123", "123", "UPPER", "lower",
        "Mixed Case Str", "no", "", "a-b-a-b", "Title Case", "xyzzy abc abc",
    ]
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    edf = es.DataFrame(sdf, index_cols=("i",))
    ps = pd.Series(vals)
    s = edf["s"]

    def col(series):
        return edf.assign(x=series)[["x"]].to_pandas().sort_index()["x"].tolist()

    def norm(xs):
        return [
            None if (x is None or (isinstance(x, float) and np.isnan(x)))
            else (list(x) if isinstance(x, (list, np.ndarray)) else x)
            for x in xs
        ]

    checks = [
        (col(s.str.findall("ab")), ps.str.findall("ab").map(list).tolist()),
        (col(s.str.capitalize()), ps.str.capitalize().tolist()),
        (col(s.str.swapcase()), ps.str.swapcase().tolist()),
        (col(s.str.removeprefix("ab")), ps.str.removeprefix("ab").tolist()),
        (col(s.str.removesuffix("ab")), ps.str.removesuffix("ab").tolist()),
        (col(s.str.lstrip()), ps.str.lstrip().tolist()),
        (col(s.str.rstrip("b")), ps.str.rstrip("b").tolist()),
        (col(s.str.match("[A-Z]")), ps.str.match("[A-Z]").tolist()),
        (col(s.str.fullmatch("[a-z]+")), ps.str.fullmatch("[a-z]+").map(bool).tolist()),
        (col(s.str.find("ab")), ps.str.find("ab").tolist()),
        (col(s.str.rfind("ab")), ps.str.rfind("ab").tolist()),
        (col(s.str.get(1)), ps.str.get(1).tolist()),
        (col(s.str.get(-1)), ps.str.get(-1).tolist()),
        (col(s.str.isalpha()), ps.str.isalpha().tolist()),
        (col(s.str.isdigit()), ps.str.isdigit().tolist()),
        (col(s.str.isalnum()), ps.str.isalnum().tolist()),
        (col(s.str.isspace()), ps.str.isspace().tolist()),
        (col(s.str.islower()), ps.str.islower().tolist()),
        (col(s.str.isupper()), ps.str.isupper().tolist()),
        (col(s.str.istitle()), ps.str.istitle().tolist()),
    ]
    for i, (got, want) in enumerate(checks):
        assert norm(got) == norm(want), (i, got, want)


def test_ndframe_and_sortorder_exports(spark):
    """Reference __all__ parity: NDFrame isinstance contract
    (eland/ndframe.py:57) and the SortOrder enum
    (eland/common.py:80-104)."""
    import eland_spark as es

    df = es.read_parquet(
        spark, "/root/testdata/sf0.001/region.parquet", index_col="r_regionkey"
    )
    assert isinstance(df, es.NDFrame)
    assert isinstance(df["r_name"], es.NDFrame)
    assert not isinstance("x", es.NDFrame)
    assert es.SortOrder.from_string("asc") is es.SortOrder.ASC
    assert es.SortOrder.reverse(es.SortOrder.ASC) is es.SortOrder.DESC
    assert es.SortOrder.to_string(es.SortOrder.DESC) == "desc"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        es.SortOrder.from_string("sideways")
