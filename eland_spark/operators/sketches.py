"""Reusable HyperLogLog sketches for distinct counting at scale.

The reference's ``nunique`` maps to one-shot HLL++ inside
Elasticsearch (cardinality agg, SURVEY §2.5). At 100 TB the stronger
pattern is MATERIALIZED sketches: aggregate each partition/group to an
HLL sketch once (Spark 4 ``hll_sketch_agg`` — Apache DataSketches
binary), persist the few-KB sketches, then answer distinct-count
questions at any rollup level by merging sketches (``hll_union_agg``)
without touching the raw data again. Merge is associative — per-day
sketches roll up to months/years for free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_sketches", "hll_rollup_estimate"]


def hll_sketches(
    sdf: DataFrame,
    value_col: str,
    by: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per ``by`` group over ``value_col`` (binary
    column ``sketch`` + exact per-group estimate ``estimate``).
    ``lg_k=12`` -> ~1.6% relative standard error, ~2.5 KB/sketch."""
    by = list(by)
    return sdf.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("estimate"),
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    by: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge pre-computed sketches up to a coarser grouping (``by`` may
    be empty for the global estimate): union is lossless relative to
    building the sketch from raw data, so rollups never rescan."""
    by = list(by)
    merged = F.hll_union_agg(F.col(sketch_col)).alias("merged")
    if by:
        out = sketches.groupBy(*by).agg(merged)
    else:
        out = sketches.agg(merged)
    return out.select(
        *by, F.hll_sketch_estimate(F.col("merged")).alias("estimate")
    )
