"""Histogram operator.

Reference: two roundtrips — min/max agg, then a server-side histogram agg
with interval=(max-min)/bins offset=min, folding ES's one extra trailing
bucket into the previous (eland/operations.py:470-556, fold at 546-552).
Spark version: same two passes, bucketing via a codegen'd
floor((x-min)/interval) groupBy — no UDF, scales as a single shuffle on
at most ``bins`` distinct keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..frame import DataFrame


def histogram(df: DataFrame, column: str, bins: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Returns (bin_edges[bins+1], counts[bins]) like np.histogram."""
    col = F.col(df._schema.resolve(column))
    row = df._sdf.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    if row["lo"] is None or row["hi"] is None:
        # empty / all-null column: match np.histogram([]) — unit-range
        # edges, zero counts
        return np.linspace(0.0, 1.0, bins + 1), np.zeros(bins, dtype="int64")
    lo, hi = float(row["lo"]), float(row["hi"])
    if lo == hi:
        edges = np.linspace(lo - 0.5, hi + 0.5, bins + 1)
        interval = edges[1] - edges[0]
        base = edges[0]
    else:
        interval = (hi - lo) / bins
        base = lo
        edges = np.array([base + i * interval for i in range(bins + 1)])
    bucket = F.floor((col - F.lit(base)) / F.lit(interval)).cast("long")
    # the max value lands in bucket==bins: fold into the last real bucket
    # (reference's extra-bucket fold, eland/operations.py:546-552)
    bucket = F.when(bucket >= bins, bins - 1).otherwise(bucket)
    rows = (
        df._sdf.filter(col.isNotNull())
        .groupBy(bucket.alias("b"))
        .count()
        .collect()
    )
    counts = np.zeros(bins, dtype="int64")
    for r in rows:
        if r["b"] is not None and 0 <= r["b"] < bins:
            counts[r["b"]] = r["count"]
    return edges, counts


def hist_frame(df: DataFrame, bins: int = 10) -> pd.DataFrame:
    """All-numeric-column histogram matrix for plotting (reference
    eland/plotting/_core.py:21-131)."""
    out = {}
    for f in df._schema.fields:
        if f.is_numeric:
            edges, counts = histogram(df, f.display_name, bins)
            out[f"{f.display_name}_edges"] = edges[:-1]
            out[f"{f.display_name}_counts"] = counts
    return pd.DataFrame(out)
