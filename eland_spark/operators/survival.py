"""Kaplan-Meier survival / retention estimation.

No reference analog (eland has no survival surface); this is the
standard retention-curve primitive for event-log corpora — "what
fraction of users/documents survive past time t" with right-censoring
handled correctly (users still active at the observation end are NOT
counted as churned, unlike a naive retention ratio).

Scale shape: one hash aggregation collapses the subject table to
per-(group, time) death/censor counts — distinct-time-sized, the only
data-sized pass — then the at-risk counts, the cumulative log-product
and the zero-factor guard all ride ONE keyed window exchange (same
partition+order spec, so Spark plans a single Exchange+Sort). The
survival product is computed as ``exp(cumsum(ln(1 - d/n)))`` — written
identically in the SQL oracle so both engines execute the same float
sequence in the same order — and rounded to 6dp (the CLAUDE.md
cross-engine ln/exp ulp rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "kaplan_meier_from_counts"]


def kaplan_meier(
    sdf: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Product-limit (Kaplan-Meier) survival estimate per group.

    One input row per subject: ``duration_col`` = observed time (any
    orderable numeric), ``event_col`` = 1/true when the event (death,
    churn, removal) was OBSERVED at that time, 0/false when the subject
    was right-censored (still alive when observation stopped). Null
    durations/events drop.

    Returns one row per (group, distinct duration):
    ``n_risk`` (subjects with duration >= t), ``n_event``,
    ``n_censored``, and ``survival`` = prod_{t_i <= t} (1 - d_i/n_i)
    rounded to 6 decimals (exactly 0.0 once the at-risk set dies out —
    the log-space product guards the ln(0) pole explicitly).
    Censor-only times keep their row (the at-risk bookkeeping step)
    with the survival value unchanged, matching lifelines'
    ``event_table`` convention.
    """
    groups = list(group_cols or [])
    ev = F.col(event_col).cast("int")
    base = sdf.where(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    counts = base.groupBy(*groups, duration_col).agg(
        F.sum(ev).alias("n_event"),
        F.sum(1 - ev).alias("n_censored"),
    )
    return kaplan_meier_from_counts(counts, duration_col, groups)


def kaplan_meier_from_counts(
    counts: DataFrame,
    duration_col: str,
    groups: "Sequence[str]" = (),
) -> DataFrame:
    """The estimator core over pre-aggregated per-(group, duration)
    ``n_event`` / ``n_censored`` counts — shared by the batch operator
    above and the streaming merge-on-read twin
    (``streaming/curation.read_kaplan_meier``), so streamed reading
    equals the batch estimate of everything ingested EXACTLY (counts
    merge by plain addition). Expects at most one row per (group,
    duration)."""
    groups = list(groups)
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
        F.col(duration_col).asc()
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    leaving = F.col("n_event") + F.col("n_censored")
    # at risk at t = everyone - those who left strictly before t
    n_risk = (
        F.sum(leaving).over(w_all)
        - F.sum(leaving).over(w_cum)
        + leaving
    )
    staged = counts.select(
        *groups,
        duration_col,
        "n_event",
        "n_censored",
        n_risk.alias("n_risk"),
    )
    # survival in log space; a factor of exactly 0 (everyone at risk
    # dies at t) poisons ln — it contributes 0 to the log-sum and the
    # zero-factor counter clamps that row and every later one to 0.0.
    # The guard is explicit on BOTH engines (DuckDB errors on ln(0)
    # even under a dead outer CASE branch; window aggregates evaluate
    # unconditionally)
    frac = F.col("n_event") / F.col("n_risk")
    ln_factor = (
        F.when(F.col("n_event") == 0, F.lit(0.0))
        .when(F.col("n_event") == F.col("n_risk"), F.lit(0.0))
        .otherwise(F.log(F.lit(1.0) - frac))
    )
    zero = F.when(F.col("n_event") == F.col("n_risk"), 1).otherwise(0)
    return staged.select(
        *groups,
        duration_col,
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_event").cast("long").alias("n_event"),
        F.col("n_censored").cast("long").alias("n_censored"),
        F.when(F.sum(zero).over(w_cum) > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(ln_factor).over(w_cum)), 6))
        .alias("survival"),
    )
