"""eland_spark — PySpark-native analytics engine with the query and
data-processing capabilities of elastic/eland.

The user-visible surface mirrors the reference's pandas-style API
(DataFrame/Series over a lazy remote table); execution compiles to Spark
DataFrame plans optimized by Catalyst instead of Elasticsearch
search/aggregation requests. See SURVEY.md for the full mapping.
"""

from .etl import (
    csv_to_spark,
    pandas_to_spark,
    read_binary,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    overwrite_partitions,
    read_table,
    save_as_table,
    spark_to_pandas,
    write_bucketed,
    write_sorted,
    write_zordered,
)
from .frame import DataFrame, concat, get_dummies, merge_ordered, wide_to_long
from .groupby import DataFrameGroupBy
from .index import Index
from .schema import Field, Schema
from .series import Series
from .session import get_session


def sql(spark, query: str, index_col=None):
    """Run Spark SQL over views registered with ``DataFrame.to_view``
    and get an engine frame back (lazy, index-aware)."""
    from .frame import DataFrame as _DF

    sdf = spark.sql(query)
    idx = (
        tuple([index_col] if isinstance(index_col, str) else index_col)
        if index_col
        else ()
    )
    return _DF(sdf, index_cols=tuple(c for c in idx if c in sdf.columns))

# migration aliases — the reference's module-level entry points
# (eland/__init__.py: pandas_to_eland / eland_to_pandas / csv_to_eland)
# keep their names so reference call sites only swap the client arg
# for (spark, path)
pandas_to_eland = pandas_to_spark
eland_to_pandas = spark_to_pandas
csv_to_eland = csv_to_spark

from .common import NDFrame, SortOrder, _register_ndframe_subclasses  # noqa: E402

_register_ndframe_subclasses()

__version__ = "0.1.0"

__all__ = [
    "NDFrame",
    "SortOrder",
    "concat",
    "overwrite_partitions",
    "wide_to_long",
    "get_dummies",
    "merge_ordered",
    "pandas_to_eland",
    "eland_to_pandas",
    "csv_to_eland",
    "sql",
    "Index",
    "DataFrame",
    "Series",
    "DataFrameGroupBy",
    "Field",
    "Schema",
    "get_session",
    "read_parquet",
    "read_binary",
    "read_orc",
    "read_csv",
    "read_json",
    "read_table",
    "save_as_table",
    "csv_to_spark",
    "pandas_to_spark",
    "spark_to_pandas",
    "write_bucketed",
    "write_zordered",
    "write_sorted",
]
