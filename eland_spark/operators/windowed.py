"""Window-function operators.

The reference exposes no window functions (ES has none; rank/sem raise
NotImplementedError, eland/operations.py:1140-1146); its only frame-like
op is top_hits (per-group first row) behind idxmax/idxmin. These are the
Spark-native generalizations: per-group top-k, running aggregates,
lag/lead. All are single-shuffle on the partition keys.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..frame import DataFrame


def top_k_per_group(
    df: "DataFrame",
    by: list[str] | str,
    order_col: str,
    k: int = 3,
    ascending: bool = False,
    tiebreak: list[str] | str | None = None,
    rank_col: str = "rn",
) -> "DataFrame":
    """Top-k rows per group by order_col (top_hits generalization).

    One shuffle on the group keys; with AQE the per-partition sort is
    spill-safe. Deterministic given a tiebreak key.
    """
    from ..frame import DataFrame as EDF

    by = [by] if isinstance(by, str) else list(by)
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    schema = df._schema
    order = [
        F.col(schema.resolve(order_col)).asc()
        if ascending
        else F.col(schema.resolve(order_col)).desc()
    ] + [F.col(schema.resolve(c)).asc() for c in tb]
    w = Window.partitionBy(*[F.col(schema.resolve(b)) for b in by]).orderBy(*order)
    out = (
        df._sdf.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
    from ..schema import Field
    from pyspark.sql import types as T

    return EDF(out, schema.with_field(Field(rank_col, rank_col, T.IntegerType(), True)))


def rolling_time_agg(
    df: "DataFrame",
    by: list[str] | str,
    ts: str,
    col: str,
    window_seconds: int,
    aggs: list[str] = ("sum", "count"),
    prefix: str = "rolling",
) -> "DataFrame":
    """Per-key trailing time-window aggregates (pandas
    ``rolling('7D', on=ts)`` per group): RANGE BETWEEN over epoch
    seconds — one hash shuffle on the keys + local sort, state bounded
    by the window, no self-join. Emits ``<prefix>_<agg>`` columns next
    to the key/ts/value columns."""
    from pyspark.sql import types as T

    from ..frame import DataFrame as EDF

    by = [by] if isinstance(by, str) else list(by)
    schema = df._schema
    fn_map = {
        "sum": F.sum,
        "count": F.count,
        "mean": F.avg,
        "min": F.min,
        "max": F.max,
    }
    bad = [a for a in aggs if a not in fn_map]
    if bad:
        raise ValueError(f"unsupported rolling aggs {bad}; one of {sorted(fn_map)}")
    tcol = F.col(schema.resolve(ts))
    secs = F.expr(
        f"timestampdiff(SECOND, to_timestamp('1970-01-01 00:00:00'), "
        f"`{schema.resolve(ts)}`)"
    )
    w = (
        Window.partitionBy(*[F.col(schema.resolve(b)) for b in by])
        .orderBy(secs.asc())
        .rangeBetween(-int(window_seconds), 0)
    )
    v = F.col(schema.resolve(col))
    out = df._sdf.select(
        *[F.col(schema.resolve(b)).alias(b) for b in by],
        tcol.alias(ts),
        v.alias(col),
        *[F.col(schema.resolve(ic)).alias(ic) for ic in schema.index_cols
          if ic not in by and ic != ts],
        *[fn_map[a](v).over(w).alias(f"{prefix}_{a}") for a in aggs],
    )
    return EDF(out, index_cols=tuple(schema.index_cols))


def running_agg(
    df: "DataFrame",
    by: list[str] | str,
    order: list[str] | str,
    col: str,
    agg: str = "sum",
    out_col: str = "running",
) -> "DataFrame":
    """Cumulative aggregate within group ordered by ``order``."""
    from ..frame import DataFrame as EDF
    from ..schema import Field
    from pyspark.sql import types as T

    by = [by] if isinstance(by, str) else list(by)
    order = [order] if isinstance(order, str) else list(order)
    schema = df._schema
    w = (
        Window.partitionBy(*[F.col(schema.resolve(b)) for b in by])
        .orderBy(*[F.col(schema.resolve(o)).asc() for o in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}[agg]
    out = df._sdf.withColumn(out_col, fn(F.col(schema.resolve(col))).over(w))
    return EDF(out, schema.with_field(Field(out_col, out_col, T.DoubleType(), True)))


def shifted(
    df: "DataFrame",
    by: list[str] | str,
    order: list[str] | str,
    col: str,
    periods: int = 1,
    out_col: str | None = None,
) -> "DataFrame":
    """lag (periods>0) / lead (periods<0) within group."""
    from ..frame import DataFrame as EDF
    from ..schema import Field

    by = [by] if isinstance(by, str) else list(by)
    order = [order] if isinstance(order, str) else list(order)
    schema = df._schema
    w = Window.partitionBy(*[F.col(schema.resolve(b)) for b in by]).orderBy(
        *[F.col(schema.resolve(o)).asc() for o in order]
    )
    src = F.col(schema.resolve(col))
    expr = F.lag(src, periods).over(w) if periods >= 0 else F.lead(src, -periods).over(w)
    name = out_col or f"{col}_shift"
    out = df._sdf.withColumn(name, expr)
    return EDF(out, schema.with_field(Field(name, name, schema.field(col).spark_type, True)))


def sessionize(
    df: "DataFrame",
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> "DataFrame":
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. Batch analog of
    Structured Streaming session_window (see eland_spark.streaming);
    two window passes over one shuffle on user_col."""
    from ..frame import DataFrame as EDF
    from ..schema import Field
    from pyspark.sql import types as T

    schema = df._schema
    u, t = F.col(schema.resolve(user_col)), F.col(schema.resolve(ts_col))
    w = Window.partitionBy(u).orderBy(t.asc())
    gap = F.timestamp_diff("SECOND", F.lag(t, 1).over(w), t)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    out = (
        df._sdf.withColumn("__new__", is_new)
        .withColumn(session_col, F.sum("__new__").over(
            Window.partitionBy(u).orderBy(t.asc()).rowsBetween(Window.unboundedPreceding, 0)
        ))
        .drop("__new__")
    )
    return EDF(out, schema.with_field(Field(session_col, session_col, T.LongType(), True)))
