"""Distribution-drift metrics between two corpus snapshots.

No reference analog; these are the standard monitoring statistics a
data pipeline computes between yesterday's corpus and today's before
letting a training run consume it: the Population Stability Index
(the banking-scorecard drift measure, sum over bins of
``(p-q) * ln(p/q)``) and KL divergence. Conventions follow common
practice: empty-bin proportions clamp to ``eps`` so the logs stay
finite, and the PSI reading is interpreted on the usual
<0.1 stable / 0.1-0.25 moderate / >0.25 major scale.

Scale shape: each snapshot reduces to bin-cardinality counts in ONE
hash aggregation (map-side combinable), the two tiny count frames
full-outer-join on the bin id, and the metric is a sum over bins —
the raw tables stream through exactly once, nothing row-sized ever
joins or collects.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["drift_bins", "psi"]


def _bin_expr(col, edges: Sequence[float]):
    """Bin index for explicit edges: bin i covers [edges[i], edges[i+1])
    with underflow -> bin -1 and overflow -> bin len(edges)-1. Explicit
    edges (not engine-side quantiles) so any engine replays the exact
    same binning."""
    e = [float(x) for x in edges]
    if sorted(e) != e or len(set(e)) != len(e):
        raise ValueError("edges must be strictly increasing")
    expr = F.lit(len(e) - 1)  # overflow
    for i in range(len(e) - 2, -1, -1):
        expr = F.when(col < F.lit(e[i + 1]), F.lit(i)).otherwise(expr)
    expr = F.when(col < F.lit(e[0]), F.lit(-1)).otherwise(expr)
    return expr


def drift_bins(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    edges: "Sequence[float] | None" = None,
    eps: float = 1e-4,
) -> DataFrame:
    """Per-bin drift table: ``(bin, ref_frac, cur_frac, psi_term,
    kl_term)``. Numeric binning with explicit ``edges``; pass
    ``edges=None`` for CATEGORICAL drift (one bin per distinct value
    of ``column`` across both snapshots; null is its own bin).

    Fractions are computed against each snapshot's non-null total (for
    numeric) / full total (categorical, where null is a category);
    absent bins clamp to ``eps`` before the logs, the standard PSI
    convention. Everything after the two count aggregations is
    bin-cardinality data.
    """
    c = F.col(column)
    if edges is not None:
        key = _bin_expr(c.cast("double"), edges)
        rf = ref.where(c.isNotNull())
        cf = cur.where(c.isNotNull())
    else:
        key = c.cast("string")
        rf, cf = ref, cur

    def counts(df, name):
        return (
            df.groupBy(key.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    rc, cc = counts(rf, "__rn__"), counts(cf, "__cn__")
    # null-SAFE bin join: in categorical mode null is a real category
    # and must line up across snapshots (a bare key join would emit two
    # disjoint null rows)
    cc = cc.withColumnRenamed("bin", "__cbin__")
    joined = rc.join(
        cc, rc["bin"].eqNullSafe(cc["__cbin__"]), "full"
    ).select(
        F.coalesce(rc["bin"], cc["__cbin__"]).alias("bin"),
        "__rn__", "__cn__",
    )
    tot = joined.agg(
        F.coalesce(F.sum("__rn__"), F.lit(0)).alias("__rt__"),
        F.coalesce(F.sum("__cn__"), F.lit(0)).alias("__ct__"),
    )
    j = joined.crossJoin(F.broadcast(tot))
    p = F.greatest(
        F.coalesce(F.col("__rn__"), F.lit(0)) / F.col("__rt__"),
        F.lit(float(eps)),
    )
    q = F.greatest(
        F.coalesce(F.col("__cn__"), F.lit(0)) / F.col("__ct__"),
        F.lit(float(eps)),
    )
    return j.select(
        "bin",
        F.round(F.coalesce(F.col("__rn__"), F.lit(0)) / F.col("__rt__"), 6)
        .alias("ref_frac"),
        F.round(F.coalesce(F.col("__cn__"), F.lit(0)) / F.col("__ct__"), 6)
        .alias("cur_frac"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        F.round(p * F.log(p / q), 6).alias("kl_term"),
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    edges: "Sequence[float] | None" = None,
    eps: float = 1e-4,
) -> float:
    """Scalar PSI between the two snapshots (sum of the per-bin terms
    of :func:`drift_bins`); a driver float for gating logic."""
    row = (
        drift_bins(ref, cur, column, edges, eps)
        .agg(F.sum("psi_term").alias("psi"))
        .collect()[0]
    )
    v = row["psi"]
    return float("nan") if v is None else float(v)
