"""Structured Streaming operators over the events table.

Net-new territory relative to the reference (eland has no streaming;
its closest analogs are PIT snapshot scans and chunked generators,
SURVEY §2.11). Design:

- file/parquet source with ``maxFilesPerTrigger`` for replayable tests;
  at production scale the same plans run on Kafka/Kinesis sources
  unchanged (swap ``readStream`` options only).
- event-time windows (tumbling/sliding/session) + watermark for late
  data; state is bounded by the watermark horizon — the knob that keeps
  100 TB/day streams from accumulating unbounded state.
- outputs default to update/append mode; tests use the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_events_stream",
    "tumbling_windowed",
    "sliding_windowed",
    "session_windowed",
    "stream_dedup",
    "stream_to_memory",
]


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Parquet-directory stream of the events table. Schema must be
    known up front for streaming reads; infer from a batch peek when not
    given. Nanos timestamps are rebuilt exactly like the batch reader."""
    from ..etl import _nanos_ts_columns
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    nanos_cols = _nanos_ts_columns(files[0])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isfile(path):
        # file streams need a directory source; scope the parent dir to
        # just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    sdf = reader.parquet(path)
    for c in nanos_cols:
        micros = F.expr(f"`{c}` div 1000")
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        sdf = sdf.withColumn(c, F.timestamp_add("MICROSECOND", micros, epoch))
    return sdf


def _with_watermark(sdf: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    # watermark requires TIMESTAMP (not NTZ); convert once at the boundary
    field = dict((f.name, f.dataType.simpleString()) for f in sdf.schema.fields)
    if field.get(ts_col) == "timestamp_ntz":
        sdf = sdf.withColumn(ts_col, F.to_utc_timestamp(F.col(ts_col), "UTC"))
    return sdf.withWatermark(ts_col, watermark)


def tumbling_windowed(
    sdf: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data handling."""
    sdf = _with_watermark(sdf, ts_col, watermark)
    group = [F.window(F.col(ts_col), duration)] + [F.col(k) for k in (keys or [])]
    return (
        sdf.groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def sliding_windowed(
    sdf: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) window: each event lands in duration/slide
    overlapping windows."""
    sdf = _with_watermark(sdf, ts_col, watermark)
    return (
        sdf.groupBy(F.window(F.col(ts_col), duration, slide))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def session_windowed(
    sdf: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Session windows: dynamic-length windows closed after ``gap`` of
    inactivity per key (stock session_window — stateful, watermark-bounded;
    the batch twin is operators.windowed.sessionize)."""
    sdf = _with_watermark(sdf, ts_col, watermark)
    group = [F.session_window(F.col(ts_col), gap)] + [
        F.col(k) for k in (keys or ["user_id"])
    ]
    return (
        sdf.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *[F.col(k) for k in (keys or ["user_id"])],
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with state bounded by the
    watermark: duplicates arriving within the watermark horizon of the
    first sighting are dropped; state for older keys is evicted, so the
    dedup store never grows beyond the horizon's key cardinality — the
    property that makes exactly-once event ingestion feasible at
    100 TB/day (a global dropDuplicates would keep every key forever).

    Batch twin: operators.dedup.drop_duplicates (tested equivalent in
    tests/test_streaming.py for in-horizon data)."""
    sdf = _with_watermark(sdf, ts_col, watermark)
    return sdf.dropDuplicatesWithinWatermark(keys)


def stream_to_memory(
    result: DataFrame, name: str, output_mode: str = "complete", timeout_sec: int = 60
):
    """Run a streaming query to completion against the memory sink
    (test/debug harness; production uses kafka/parquet/foreachBatch)."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
