"""Z-order (Morton) multi-column clustering for write layout.

The lakehouse OPTIMIZE-ZORDER analog, built from plain Spark
primitives: map each clustering column to a fixed-width integer bucket
(linear min/max scaling — one tiny agg pass for the bounds), interleave
the bucket bits into a Morton z-value, then range-partition + sort by
that z-value before writing. Files then hold small HYPER-RECTANGLES of
the key space instead of slabs of one column, so parquet min/max file
skipping prunes on EVERY clustered column, not just the first sort key
— the property that makes multi-predicate scans cheap at 100 TB.

Everything is a Column expression (bit shifts/ORs inside whole-stage
codegen) plus one repartitionByRange — no UDFs, no driver data. The
z-value is a pure function of (value, bounds, bits), so DuckDB replays
it bit-for-bit for the oracle.

No reference analog (ES owns physical layout; this is the Spark-native
table-layout counterpart). Public algorithm (Morton 1966).

Two bucketing strategies share the ``zvalue`` interleave core:
``etl.write_zordered`` buckets by approximate QUANTILES (skew-robust —
equal-population cells regardless of value distribution, the right
default for writing), while :func:`zorder_layout` here buckets
LINEARLY by min/max — a pure function of the bounds, which is what
makes the ``zorder_cluster`` driver query exactly SQL-oracle-checkable
(approxQuantile has no portable replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_layout"]


def _bucket(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket of ``c`` into [0, 2^bits): nulls and NaNs sink to
    bucket 0 (they cluster together at the low end, like nulls-first)."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    top = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top))
    # NaN -> 0 BEFORE the long cast (ANSI cast of NaN throws); clamp in
    # double space so +-inf inputs land on the edge buckets
    clamped = F.least(
        F.lit(float(top)),
        F.greatest(F.lit(0.0), F.round(F.nanvl(scaled, F.lit(0.0)))),
    )
    return F.coalesce(clamped.cast("long"), F.lit(0).cast("long"))


def zvalue(
    buckets: "list[Column]", bits: int = 8
) -> Column:
    """Morton-interleave pre-bucketed integer columns (each in
    [0, 2^bits)) into one z-value: bit j of column i lands at position
    j * n_cols + i. Pure shift/OR arithmetic — codegen'd, and replayed
    exactly by the SQL oracle."""
    n = len(buckets)
    total = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            total = total.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n + i
                ).cast("long")
            )
    return total


def zorder_layout(
    sdf: DataFrame,
    cols: "list[str]",
    bits: int = 8,
    partitions: int | None = None,
    zcol: str = "__z__",
    keep_zcol: bool = False,
) -> DataFrame:
    """Cluster ``sdf`` for writing: bucket each column by its global
    min/max (ONE scalar agg job — bounds become plan literals),
    interleave to a z-value, range-partition on it (sampled range
    exchange — balanced regardless of data skew in any single column)
    and sort within partitions. Write the result with
    ``df.write.parquet(...)`` and every file covers a small
    hyper-rectangle of the clustered key space.
    """
    bounds = sdf.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    bks = [
        _bucket(
            F.col(c),
            float(bounds[f"lo_{i}"] if bounds[f"lo_{i}"] is not None else 0.0),
            float(bounds[f"hi_{i}"] if bounds[f"hi_{i}"] is not None else 0.0),
            bits,
        )
        for i, c in enumerate(cols)
    ]
    with_z = sdf.withColumn(zcol, zvalue(bks, bits))
    if partitions is None:
        parts = with_z.rdd.getNumPartitions()
    else:
        parts = partitions
    out = with_z.repartitionByRange(parts, F.col(zcol)).sortWithinPartitions(zcol)
    return out if keep_zcol else out.drop(zcol)
