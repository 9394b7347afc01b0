"""Hypertable-style continuous aggregates (time-bucketed rollups).

The TimescaleDB/continuous-aggregate pattern re-expressed for
Structured Streaming: each micro-batch appends PARTIAL aggregates per
(time bucket, keys) — count/sum/min/max plus a mergeable KMV distinct
sketch — to an append-only parquet rollup table. Partials are
associative, so readers merge them at any granularity:

- ``read_rollup`` finalizes the stored bucket width (sum the counts,
  min the mins, merge the sketches);
- the SAME merge at a coarser ``bucket`` rolls hours into days/months
  without ever rescanning the raw events (sums are lossless; distinct
  counts stay exact below the sketch's K and ~1/sqrt(K-2) beyond).

Append-only partials mean no transaction log, no read-modify-write
races, exactly-once via the stream checkpoint; ``compact_rollup``
optionally rewrites partials into one row per bucket when the partial
count grows. The batch-twin test pins read_rollup == a from-scratch
batch aggregation of the raw table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["continuous_aggregate", "read_rollup", "compact_rollup"]


def _partials(
    sdf: DataFrame,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    value_col: str,
    distinct_col: str | None,
    k: int,
    item_col: str | None = None,
    topk: int = 16,
) -> DataFrame:
    from ..operators.sketches import _kmv_hash

    v = F.col(value_col)
    aggs = [
        F.count(v).alias("p_count"),
        F.sum(v).alias("p_sum"),
        F.min(v).alias("p_min"),
        F.max(v).alias("p_max"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.slice(
                F.array_sort(F.collect_set(_kmv_hash(F.col(distinct_col)))),
                1,
                k,
            ).alias("p_kmv")
        )
    out = sdf.groupBy(
        F.window(F.col(ts_col), bucket).start.alias("bucket"),
        *[F.col(c) for c in keys],
    ).agg(*aggs)
    if item_col is not None:
        # per-batch Misra-Gries top-k map per (bucket, keys): mergeable
        # heavy hitters ride the same append-only partial rows
        from ..operators.sketches import _mg_compress

        rows = sdf.groupBy(
            F.window(F.col(ts_col), bucket).start.alias("bucket"),
            *[F.col(c) for c in keys],
            F.col(item_col).cast("string").alias("item"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        by = ["bucket", *keys]
        comp = _mg_compress(rows, by, topk)
        pair = F.struct(F.col("item"), F.col("cnt"))
        mg = comp.groupBy(*by).agg(
            F.map_from_entries(F.array_sort(F.collect_list(pair))).alias("p_mg")
        )
        out = out.join(mg, by, "left")
    return out


def continuous_aggregate(
    stream_sdf: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    value_col: str,
    distinct_col: str | None = None,
    k: int = 256,
    item_col: str | None = None,
    topk: int = 16,
):
    """Maintain the rollup from a stream: per micro-batch, aggregate to
    (bucket, keys) partials and APPEND them (exactly-once via the
    checkpoint; appends commute, so no upsert machinery). Returns the
    StreamingQuery; combine with ``trigger(availableNow=True)`` for
    catch-up runs."""
    keys = list(keys)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        part = _partials(
            batch_df, ts_col, bucket, keys, value_col, distinct_col, k,
            item_col, topk,
        )
        part.write.mode("append").parquet(path)

    return (
        stream_sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def batch_rollup(
    sdf: DataFrame,
    path: str,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    value_col: str,
    distinct_col: str | None = None,
    k: int = 256,
    item_col: str | None = None,
    topk: int = 16,
) -> None:
    """Seed (or extend) the same rollup table from a BATCH frame — the
    backfill half of a continuous aggregate; identical partial schema,
    so streamed and backfilled partials merge transparently."""
    _partials(
        sdf, ts_col, bucket, list(keys), value_col, distinct_col, k,
        item_col, topk,
    ).write.mode("append").parquet(path)


def read_rollup(
    spark: SparkSession,
    path: str,
    keys: Sequence[str] = (),
    bucket: str | None = None,
    k: int = 256,
    topk: int = 16,
) -> DataFrame:
    """Finalize the rollup: merge partials per (bucket, keys). Pass a
    coarser ``bucket`` (e.g. '1 day' over stored hours) to re-bucket —
    the merge is the same, raw data is never touched. Emits
    n/total/vmin/vmax/avg (+ approx_distinct when KMV sketches were
    stored, + a top_items heavy-hitter map when item tracking was on —
    MG-merged across partials AND bucket widths, same guarantees as
    sketches.mg_rollup)."""
    from ..operators.sketches import _KMV_SPACE

    part = spark.read.parquet(path)
    keys = list(keys)
    b = (
        F.window(F.col("bucket"), bucket).start.alias("bucket")
        if bucket is not None
        else F.col("bucket")
    )
    has_kmv = "p_kmv" in part.columns
    aggs = [
        F.sum("p_count").alias("n"),
        F.sum("p_sum").alias("total"),
        F.min("p_min").alias("vmin"),
        F.max("p_max").alias("vmax"),
    ]
    if has_kmv:
        aggs.append(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("p_kmv")))),
                1,
                k,
            ).alias("m")
        )
    out = part.groupBy(b, *keys).agg(*aggs)
    has_mg = "p_mg" in part.columns
    if has_mg:
        from ..operators.sketches import _mg_compress

        rows = part.select(
            b, *keys, F.explode(F.col("p_mg")).alias("item", "cnt")
        )
        comp = _mg_compress(rows, ["bucket", *keys], topk)
        pair = F.struct(F.col("item"), F.col("cnt"))
        mg = comp.groupBy("bucket", *keys).agg(
            F.map_from_entries(F.array_sort(F.collect_list(pair))).alias(
                "top_items"
            )
        )
        out = out.join(mg, ["bucket", *keys], "left")
    cols = [
        "bucket",
        *keys,
        F.col("n"),
        F.col("total"),
        F.col("vmin"),
        F.col("vmax"),
        (F.col("total") / F.col("n")).alias("avg"),
    ]
    if has_kmv:
        n_h = F.size("m")
        est = F.when(n_h < k, n_h.cast("long")).otherwise(
            F.round((n_h - 1) / (F.element_at("m", -1) / F.lit(_KMV_SPACE))).cast(
                "long"
            )
        )
        cols.append(est.alias("approx_distinct"))
    if has_mg:
        cols.append(F.col("top_items"))
    return out.select(*cols)


def compact_rollup(
    spark: SparkSession, path: str, keys: Sequence[str] = (), k: int = 256
) -> int:
    """Rewrite accumulated partials as ONE partial row per (bucket,
    keys) — same schema, so readers are unaffected; returns the
    compacted row count. Run when micro-batch appends have piled up."""
    part = spark.read.parquet(path)
    keys = list(keys)
    has_kmv = "p_kmv" in part.columns
    aggs = [
        F.sum("p_count").alias("p_count"),
        F.sum("p_sum").alias("p_sum"),
        F.min("p_min").alias("p_min"),
        F.max("p_max").alias("p_max"),
    ]
    if has_kmv:
        aggs.append(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("p_kmv")))),
                1,
                k,
            ).alias("p_kmv")
        )
    if "p_mg" in part.columns:
        from ..operators.sketches import _mg_compress

        rows = part.select(
            "bucket", *keys, F.explode(F.col("p_mg")).alias("item", "cnt")
        )
        comp = _mg_compress(rows, ["bucket", *keys], 1 << 20)
        pair = F.struct(F.col("item"), F.col("cnt"))
        mg = comp.groupBy("bucket", *keys).agg(
            F.map_from_entries(F.array_sort(F.collect_list(pair))).alias("p_mg")
        )
        merged_mg = mg
    else:
        merged_mg = None
    # localCheckpoint CUTS the lineage before the overwrite truncates
    # the source files (a cache could still be evicted and recompute
    # from the truncated path — checkpointing cannot)
    merged = part.groupBy("bucket", *keys).agg(*aggs)
    if merged_mg is not None:
        merged = merged.join(merged_mg, ["bucket", *keys], "left")
    merged = merged.localCheckpoint()
    n = merged.count()
    merged.write.mode("overwrite").parquet(path)
    return n
