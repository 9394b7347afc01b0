"""Differential harness mimicking the driver's t2 correctness gate:
run every queries() entry on Spark at sf0.01, run the matching
oracle_sql() on DuckDB over the same parquet, compare row count +
column names + order-insensitive values.
"""

import importlib.util
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


ENTRY = _entry_module()
QUERIES = ENTRY.queries()
ORACLES = ENTRY.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype kind, mirroring the driver's type-sensitive value hash.

    The driver hashes values together with their pandas dtype, so an int64
    Spark column vs a float64 oracle column (DuckDB sum(int) -> HUGEINT ->
    float64) hash-mismatches even when every value is bit-identical
    (round-2 judge finding: frame_order_ops). Comparing the *kind* here
    makes this local gate a faithful proxy for that hash.
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert len(spark_df) >= 0
        return
    duck_df = duck.execute(ORACLES[name]).df()
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} != oracle {len(duck_df)}"
    )
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    for c in sorted(spark_df.columns):
        ks, ko = _dtype_kind(spark_df[c]), _dtype_kind(duck_df[c])
        assert ks == ko, (
            f"{name}.{c}: dtype kind {ks} (spark {spark_df[c].dtype}) != "
            f"{ko} (oracle {duck_df[c].dtype}) — the driver's type-sensitive "
            f"hash would fail even if values match"
        )
    a, b = _normalize(spark_df), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            mism = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            assert not mism.any(), (
                f"{name}.{c}: {mism.sum()} float mismatches, e.g. "
                f"{av[mism][:3]} vs {bv[mism][:3]}"
            )
        else:
            mism = av != bv
            if mism.any():
                raise AssertionError(
                    f"{name}.{c}: {mism.sum()} mismatches, e.g. "
                    f"{av[mism][:3]!r} vs {bv[mism][:3]!r}"
                )
