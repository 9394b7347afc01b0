"""As-of (temporal) join — pandas ``merge_asof`` semantics.

Net-new relative to the reference (eland has no joins at all, SURVEY
§2.4); this is the classic "enrich each event with the most recent
state row" operator a training-data pipeline needs.

Spark-first plan: instead of a range join (which explodes into
O(candidates) per row) the two sides are UNIONED, hash-shuffled once on
the ``by`` key, locally sorted on the time column, and the right side's
values are carried to left rows with ``last(col, ignorenulls=True)``
over an unbounded-preceding running window — the distributed version of
"sort then fill forward". Cost = one exchange + one local sort,
identical shape to any keyed window aggregation at 100 TB; no
single-partition cliff, no cartesian candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["merge_asof"]

_SIDE = "__asof_side"
_RTS = "__asof_rts"
_SEQ = "__asof_seq"


def _is_numeric(dtype: str) -> bool:
    return dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or (
        dtype.startswith("decimal")
    )


def merge_asof(
    left,
    right,
    on: str,
    by=None,
    direction: str = "backward",
    tolerance=None,
    suffixes: tuple[str, str] = ("", "_right"),
    allow_exact_matches: bool = True,
):
    """pandas ``merge_asof``: for every left row, attach the right row
    with the greatest ``on`` <= left's (backward), smallest ``on`` >=
    left's (forward), or smallest absolute distance (nearest — ties go
    backward like pandas) within each ``by`` group; unmatched rows keep
    nulls. ``tolerance`` (seconds for timestamps, same units for
    numeric ``on``) nulls matches farther away than the bound.
    ``nearest`` runs both running fills over the SAME single exchange
    (two local sorts, no extra shuffle) and picks per row.

    Accepts engine frames or plain Spark DataFrames; returns a Spark
    DataFrame of all left columns plus the right value columns
    (suffixed on collision).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    lsdf = left if isinstance(left, SparkDataFrame) else left.to_spark()
    rsdf = right if isinstance(right, SparkDataFrame) else right.to_spark()
    by = [by] if isinstance(by, str) else list(by or [])
    for c in [on, *by]:
        if c not in lsdf.columns or c not in rsdf.columns:
            raise KeyError(f"merge_asof column {c!r} must exist on both sides")

    ltypes = dict(lsdf.dtypes)
    rtypes = dict(rsdf.dtypes)
    rvals = [c for c in rsdf.columns if c != on and c not in by]
    lcols = list(lsdf.columns)
    rmap = {c: c + suffixes[1] if c in lsdf.columns else c for c in rvals}
    out_names = list(rmap.values())
    if len(set(out_names)) != len(out_names) or set(out_names) & set(lcols):
        raise ValueError(
            "suffixed right columns collide with left columns; pass "
            "different suffixes or drop/rename before the join"
        )

    # union with a side tag; each side nulls the other's columns
    left_part = lsdf.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(rmap[c]) for c in rvals],
        F.lit(None).cast(ltypes[on]).alias(_RTS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_SEQ),
    )
    right_part = rsdf.select(
        *[
            F.col(c) if c in (on, *by) else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        *[F.col(c).alias(rmap[c]) for c in rvals],
        F.col(on).alias(_RTS),
        F.lit(0).alias(_SIDE),
        F.monotonically_increasing_id().alias(_SEQ),
    )
    u = left_part.unionByName(right_part)

    # allow_exact: the right row at an equal timestamp must sort BEFORE
    # the left row (visible to the running window); otherwise after
    tie = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()

    def _running_window(d: str):
        """Unbounded-preceding running window for one direction.
        Deterministic pick among right rows sharing the same (by, on):
        pandas takes the LAST input right row for backward and the
        FIRST for forward, so ties order by the right-side row sequence
        such that the wanted row is the last one the window sees.
        Forward scans time DESCENDING, so its 'preceding' rows are the
        later timestamps."""
        ts_order = F.col(on).asc() if d == "backward" else F.col(on).desc()
        seq_order = F.col(_SEQ).asc() if d == "backward" else F.col(_SEQ).desc()
        return (
            Window.partitionBy(*[F.col(b) for b in by])
            .orderBy(ts_order, tie, seq_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    # the fill carries the last right ROW as one struct (null on left
    # rows, so ignorenulls skips interleaved left rows but NOT a right
    # row whose value columns are null) — pandas matches rows, not
    # per-column last-non-null values: a matched row's NaN must come
    # through as NaN, never an older row's value
    right_row = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            *[F.col(rmap[c]).alias(rmap[c]) for c in rvals],
            F.col(_RTS).alias(_RTS),
        ),
    )
    if direction in ("backward", "forward"):
        w = _running_window(direction)
        picked = u.withColumn(
            "__asof_row", F.last(right_row, ignorenulls=True).over(w)
        )
        filled = picked.select(
            *[F.col(c) for c in lcols],
            *[
                F.col("__asof_row")[rmap[c]].alias(rmap[c])
                for c in rvals
            ],
            F.col("__asof_row")[_RTS].alias(_RTS),
            F.col(_SIDE),
        )
    else:
        # nearest = both running fills over the SAME single exchange
        # (two Window nodes re-sort locally, no second shuffle), then a
        # per-row pick by absolute distance — ties go BACKWARD like
        # pandas; a missing side loses automatically.
        wb, wf = _running_window("backward"), _running_window("forward")
        both = u.withColumn(
            "__asof_b", F.last(right_row, ignorenulls=True).over(wb)
        ).withColumn(
            "__asof_f", F.last(right_row, ignorenulls=True).over(wf)
        )
        b_rts = F.col("__asof_b")[_RTS]
        f_rts = F.col("__asof_f")[_RTS]
        if _is_numeric(ltypes[on]):
            db = F.col(on) - b_rts
            df_ = f_rts - F.col(on)
        else:
            # full microsecond precision — whole-second truncation would
            # mis-pick when both sides are within the same second; the
            # timestamp cast lifts NTZ into the (UTC) session zone,
            # which cancels in the difference
            def _us(c):
                return F.unix_micros(c.cast("timestamp"))

            db = _us(F.col(on)) - _us(b_rts)
            df_ = _us(f_rts) - _us(F.col(on))
        pick_b = f_rts.isNull() | (b_rts.isNotNull() & (db <= df_))
        filled = both.select(
            *[F.col(c) for c in lcols],
            *[
                F.when(pick_b, F.col("__asof_b")[rmap[c]])
                .otherwise(F.col("__asof_f")[rmap[c]])
                .alias(rmap[c])
                for c in rvals
            ],
            F.when(pick_b, b_rts).otherwise(f_rts).alias(_RTS),
            F.col(_SIDE),
        )
    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE)

    if tolerance is not None:
        try:  # pd.Timedelta / datetime.timedelta -> seconds
            tol = float(tolerance.total_seconds())
        except AttributeError:
            tol = float(tolerance)
        if _is_numeric(ltypes[on]):
            if direction == "nearest":
                diff = F.abs(F.col(on) - F.col(_RTS))
            else:
                diff = (
                    F.col(on) - F.col(_RTS)
                    if direction == "backward"
                    else F.col(_RTS) - F.col(on)
                )
        elif direction == "nearest":
            diff = (
                F.abs(
                    F.unix_micros(F.col(on).cast("timestamp"))
                    - F.unix_micros(F.col(_RTS).cast("timestamp"))
                )
                / F.lit(1_000_000.0)
            )
        else:
            a, b = (_RTS, on) if direction == "backward" else (on, _RTS)
            diff = F.expr(f"timestampdiff(SECOND, {a}, {b})")
        ok = F.col(_RTS).isNotNull() & (diff <= F.lit(tol))
        out = out.select(
            *[F.col(c) for c in lcols],
            *[F.when(ok, F.col(rmap[c])).alias(rmap[c]) for c in rvals],
            F.col(_RTS),
        )
    return out.drop(_RTS)
