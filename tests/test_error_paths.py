"""Negative-path probes (reference raises the matching pandas-style
errors): missing columns, conflicting filter args, bad groupby keys,
index-less row ops, incompatible appends."""

import pytest

import eland_spark as es

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return es.read_parquet(spark, f"{SF}/orders.parquet", index_col="o_orderkey")


def test_missing_column_getitem_raises(orders):
    with pytest.raises(KeyError):
        orders["no_such_column"]
    with pytest.raises(KeyError):
        orders[["o_custkey", "no_such_column"]]


def test_missing_column_groupby_raises(orders):
    with pytest.raises(KeyError):
        orders.groupby("no_such_key")


def test_filter_conflicting_args_raises(orders):
    with pytest.raises(TypeError):
        orders.filter(items=["o_custkey"], like="o_")
    with pytest.raises(TypeError):
        orders.filter()


def test_filter_like_on_index_not_implemented(orders):
    with pytest.raises(NotImplementedError):
        orders.filter(like="1", axis=0)


def test_drop_index_requires_index_column(spark):
    nat = es.read_parquet(spark, f"{SF}/nation.parquet")  # no index_col
    with pytest.raises(ValueError, match="index column"):
        nat.drop(index=[1, 2])


def test_drop_missing_column_errors_and_ignore(orders):
    with pytest.raises(KeyError):
        orders.drop(columns=["nope"])
    out = orders.drop(columns=["nope"], errors="ignore")
    assert out.shape[1] == orders.shape[1]


def test_empty_result_aggs_are_sane(orders):
    empty = orders[orders.o_totalprice < 0]
    assert empty.shape[0] == 0
    s = empty.sum()
    assert (s.dropna() >= 0).all()  # sums coalesce to 0.0, not NaN
    assert empty.to_pandas().shape[0] == 0
    assert empty.head(5).to_pandas().shape[0] == 0
