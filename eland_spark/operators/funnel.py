"""Event-sequence analytics: ordered funnels and cohort retention.

No reference analog (eland stops at date_histogram buckets); these are
the two workhorse event-table reports every product/behavioral
pipeline runs, re-expressed Spark-first.

``funnel`` computes the classic greedy ordered funnel — the earliest
step-1 event, then the earliest step-2 event at-or-after it, and so on
— in ONE shuffle: events are grouped per user, time-sorted, and the
step chain is folded with ``F.aggregate`` entirely inside codegen (no
Python, no per-step join round). The greedy chain over a time-sorted
list is equivalent to the sequential min-chain
``t_i = min(ts of step_i events with ts >= t_{i-1})``, which is what a
SQL engine replays with k chained CTEs — ties between different steps
at the same timestamp are resolved in step order so both formulations
agree exactly. ``funnel_chains`` exposes the per-user step timestamps
the summary is built from (and is the batch twin of the streaming
``funnel_with_state``).

``cohort_retention`` buckets each user into the cohort of their first
event and counts distinct active users per (cohort, periods-since) —
two hash aggregations, everything partial-aggregable.

Scale: both operators shuffle on ``user_id`` once (funnel's per-user
state is the user's own event list — bounded by per-user activity,
never corpus-sized); the fold state is k timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_chains", "cohort_retention"]


def _fold_chains(
    events: DataFrame,
    steps: "list[str]",
    user_col: str,
    type_col: str,
    ts_col: str,
    within_seconds: "int | None",
) -> DataFrame:
    """Per-user greedy chain fold -> ``(__u__, __c__)`` where ``__c__``
    is a k-array of epoch-micro step timestamps (non-null prefix)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    ev = events.select(
        F.col(user_col).alias("__u__"),
        F.col(type_col).alias("__t__"),
        F.col(ts_col).cast("timestamp_ntz").alias("__ts__"),
    ).where(F.col("__t__").isin(list(set(steps))) & F.col("__ts__").isNotNull())

    # (ts, step-rank) sort key: ties at one timestamp resolve in step
    # order so the greedy fold equals the sequential min-chain exactly.
    # NTZ rejects a direct long cast; the session pins UTC so the
    # ntz->ltz cast is stable (frame.py:1715 uses the same path).
    # Micros, not millis: an external engine replaying the min-chain at
    # full parquet precision must see identical orderings.
    item = F.struct(
        F.unix_micros(F.col("__ts__").cast("timestamp")).alias("ts"),
        F.array_position(steps_lit, F.col("__t__")).alias("rank"),
        F.col("__t__").alias("t"),
    )
    per_user = ev.groupBy("__u__").agg(
        F.sort_array(F.collect_list(item)).alias("__evs__")
    )

    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step_fold(acc, x):
        # n = how many steps already matched (prefix of non-nulls)
        n = F.size(F.filter(acc, lambda a: a.isNotNull()))
        need = F.element_at(steps_lit, (n + 1).cast("int"))
        hit = (n < k) & (x["t"] == need)
        return F.when(
            hit,
            F.transform(
                acc,
                lambda a, i: F.when(i == n, x["ts"]).otherwise(a),
            ),
        ).otherwise(acc)

    chains = per_user.select(
        "__u__",
        F.aggregate(F.col("__evs__"), init, step_fold).alias("__c__"),
    )
    if within_seconds is not None:
        w = int(within_seconds) * 1_000_000
        chains = chains.select(
            "__u__",
            F.transform(
                F.col("__c__"),
                lambda t, i: F.when(
                    t.isNotNull()
                    & ((t - F.element_at(F.col("__c__"), 1)) <= F.lit(w)),
                    t,
                ),
            ).alias("__c__"),
        )
    return chains


def funnel_chains(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Per-user step completions: one row per (user, completed step)
    with the step's chain timestamp — ``(user_id, step_index, step,
    step_ts)``. The long-format twin of :func:`funnel` (same single
    user shuffle + fold), and the batch reference for the streaming
    ``funnel_with_state`` operator."""
    steps_lit = F.array(*[F.lit(s) for s in steps])
    chains = _fold_chains(events, steps, user_col, type_col, ts_col,
                          within_seconds)
    return (
        chains.select(
            F.col("__u__").alias(user_col),
            F.posexplode(F.col("__c__")).alias("__i__", "__tus__"),
        )
        .where(F.col("__tus__").isNotNull())
        .select(
            user_col,
            (F.col("__i__") + 1).alias("step_index"),
            F.element_at(steps_lit, (F.col("__i__") + 1).cast("int"))
            .alias("step"),
            F.timestamp_micros(F.col("__tus__"))
            .cast("timestamp_ntz")
            .alias("step_ts"),
        )
    )


def funnel(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Greedy ordered-funnel summary.

    Returns one row per step: ``(step_index, step, n_users,
    conversion)`` where ``n_users`` counts users whose chain reached
    the step (and, with ``within_seconds``, whose step time falls
    within that window of their step-1 time) and ``conversion`` is
    ``n_users / step-1 users`` rounded to 6.

    Repeated step names are allowed (``["view", "view"]`` means two
    views); each list element consumes a distinct event.
    """
    k = len(steps)
    chains = _fold_chains(events, steps, user_col, type_col, ts_col,
                          within_seconds).select("__c__")

    # ONE tiny aggregation carries every step's reach count (count of
    # non-null chain slots), so the base count shares the row and the
    # event pipeline runs exactly once — no join-back, no recompute
    one = chains.agg(
        *[
            F.count(F.element_at(F.col("__c__"), i + 1)).alias(f"__s{i}__")
            for i in range(k)
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).alias("step_index"),
            F.lit(steps[i]).alias("step"),
            F.col(f"__s{i}__").alias("n_users"),
            F.round(
                F.when(
                    F.col("__s0__") > 0, F.col(f"__s{i}__") / F.col("__s0__")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("conversion"),
        )
        for i in range(k)
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention triangle: users bucket into the cohort of
    their FIRST event (floor of epoch seconds / period), and each
    (cohort, periods-since-cohort) cell counts distinct active users.

    Two hash aggregations (per-user first-event, then per-cell distinct
    users — the distinct collapses map-side since a user contributes
    one row per active period); output is cohort x period sized.
    Returns ``(cohort_start, period_number, n_active)``.
    """
    step_us = int(period_seconds) * 1_000_000
    ep = F.unix_micros(F.col(ts_col).cast("timestamp_ntz").cast("timestamp"))
    # exact long arithmetic (a double division could flip floor at a
    # period boundary); numerator is a multiple of step_us so the final
    # division is exact
    ev = events.select(
        F.col(user_col).alias("__u__"),
        ((ep - (ep % step_us)) / step_us).cast("long").alias("__p__"),
    ).where(F.col("__p__").isNotNull())
    first = ev.groupBy("__u__").agg(F.min("__p__").alias("__c__"))
    cells = (
        ev.join(first, "__u__")
        .select("__u__", "__c__", (F.col("__p__") - F.col("__c__")).alias("__d__"))
        .distinct()
        .groupBy("__c__", "__d__")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.select(
        F.timestamp_seconds(F.col("__c__") * int(period_seconds))
        .cast("timestamp_ntz")
        .alias("cohort_start"),
        F.col("__d__").cast("bigint").alias("period_number"),
        "n_active",
    )
