"""Source connectors (reference eland/etl.py read surface).

Thin namespace over the ETL readers: parquet is the primary columnar
source (snapshot semantics from immutable files replace the reference's
PIT pagination, eland/operations.py:1558-1664); csv/json mirror
``csv_to_eland``. All readers return lazy engine frames — nothing is
materialized until an action.
"""

from ..etl import (
    csv_to_spark,
    pandas_to_spark,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    save_as_table,
)

__all__ = [
    "read_parquet",
    "read_orc",
    "read_csv",
    "read_json",
    "read_table",
    "save_as_table",
    "csv_to_spark",
    "pandas_to_spark",
]
