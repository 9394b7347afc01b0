"""Streaming joins — enrichment (stream-static) and correlation
(stream-stream), net-new vs the reference (eland has no streaming and
no joins, SURVEY §2.4/§2.11).

Scale posture:
- stream-static: the static side is re-read per micro-batch and
  broadcast when small — the planner treats it like any batch dim join,
  so dims follow the same broadcast contract as `frame.merge`.
- stream-stream: BOTH sides must be watermarked and the join condition
  must bound event time, or state grows without limit. The range
  condition below gives Spark the purge rule: a buffered left row can
  be dropped once the right watermark passes `left_ts + within`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _with_watermark

__all__ = ["stream_enrich", "stream_stream_join"]


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Enrich a stream with a static dimension table (per-micro-batch
    join; ``broadcast=True`` hints the dim side like frame.merge)."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: equality on ``on`` plus a
    symmetric event-time bound ``|left_ts - right_ts| <= within``.
    Both inputs get the same ``watermark``; the time bound is what lets
    Spark expire buffered state (without it the join would hold every
    row forever). Column names are disambiguated with `l_`/`r_`
    prefixes on the timestamp columns.
    """
    lw = _with_watermark(left, left_ts, watermark).withColumnRenamed(
        left_ts, "l_ts"
    )
    rw = _with_watermark(right, right_ts, watermark).withColumnRenamed(
        right_ts, "r_ts"
    )
    l, r = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("r.r_ts") >= F.col("l.l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r.r_ts") <= F.col("l.l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, on=cond, how=how)
