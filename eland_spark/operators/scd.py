"""Slowly-changing-dimension (type 2) history from event/snapshot
streams: collapse consecutive observations of the same attribute
values into validity intervals.

No reference analog (eland's index scan is stateless); this is the
change-data-capture layout step every warehouse-backed training
pipeline needs — "what was this record's state at time t" joins
(point-in-time feature lookups, label leakage audits) read the
interval table with a plain range predicate instead of replaying the
raw event log.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    sdf: DataFrame,
    key_cols: "Sequence[str] | str",
    attr_cols: "Sequence[str] | str",
    ts_col: str,
    tiebreak_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Build the SCD type-2 interval table: one row per maximal run of
    consecutive observations (per key, in ``ts_col`` order) whose
    ``attr_cols`` are all unchanged, with ``valid_from`` = the run's
    first timestamp and ``valid_to`` = the next run's ``valid_from``
    (null for the key's current state). Attribute comparison is
    null-safe (null == null extends a run); a value REVERTING to an
    earlier state opens a NEW interval (true history, not a distinct).
    ``tiebreak_cols`` break equal-timestamp orderings deterministically
    (pass the event id; without one, equal-``ts`` runs would be
    engine-dependent).

    Scale shape: two keyed window passes (lag-change flag + running
    run-id, then the lead for ``valid_to``) and one hash aggregation,
    ALL partitioned on the key — one shuffle total since the
    partitioning is reused across the three steps; no global sort, no
    driver state. Skew follows the hottest key's event count, the same
    bound as any per-entity sessionization.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    if not keys or not attrs:
        raise ValueError("key_cols and attr_cols must be non-empty")
    tb = list(tiebreak_cols or [])
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    w = Window.partitionBy(*keys).orderBy(*order)
    chg = F.lit(False)
    for a in attrs:
        chg = chg | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # two projection layers because the running sum consumes the lag
    # flag (nested window functions are illegal in one expression);
    # identical partition+order specs, so the second Window reuses the
    # first's exchange and sort — still ONE shuffle
    flagged = sdf.select(
        *keys, *attrs, ts_col, *tb, chg.alias("__chg__")
    ).select(
        *keys,
        *attrs,
        ts_col,
        F.sum(F.when(F.col("__chg__"), 1).otherwise(0))
        .over(
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("__run__"),
    )
    grouped = flagged.groupBy(*keys, "__run__").agg(
        # attrs are constant within a run; min == the value and is
        # deterministic (F.first is not)
        *[F.min(a).alias(a) for a in attrs],
        F.min(ts_col).alias("valid_from"),
    )
    wk = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return grouped.select(
        *keys,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
    )
