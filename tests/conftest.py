import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from eland_spark.session import get_session

    s = get_session("eland_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    import eland_spark as es

    # (l_orderkey, l_linenumber) alone is NOT unique in the synthetic data;
    # the 4-col key is (verified at sf0.01).
    return es.read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        index_col=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    import eland_spark as es

    return es.read_parquet(spark, f"{sf_dir}/orders.parquet", index_col="o_orderkey")


@pytest.fixture(scope="session")
def lineitem_pd(spark, sf_dir):
    import pandas as pd

    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders_pd(sf_dir):
    import pandas as pd

    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    import eland_spark as es

    return es.read_parquet(spark, f"{sf_dir}/documents.parquet", index_col="doc_id")
