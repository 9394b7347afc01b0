"""Input-parallelism guard for compute-heavy map stages.

Small-file inputs (one parquet footer -> one scan partition) serialize
any expensive per-row map chained on them — shingling, hashing,
tokenize+explode — no matter how many cores the cluster has. At real
scale (thousands of files) the scan is already parallel and this guard
is a no-op; on small inputs it inserts ONE keyed repartition ahead of
the map so the work spreads across the cluster.

Repartitioning BY THE DOWNSTREAM GROUPING KEY is strictly better than
round-robin: Spark's alias-aware output partitioning lets the later
``groupBy(key)`` / ``Window.partitionBy(key)`` reuse the exchange
(HashPartitioning(k) satisfies ClusteredDistribution([k, ...])), so the
guard *moves* the chain's one shuffle from post-explode (token rows) to
pre-explode (doc rows — far fewer bytes) instead of adding a second.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def ensure_parallelism(
    sdf: DataFrame, *keys: Column | str, partitions: int | None = None
) -> DataFrame:
    """Repartition ``sdf`` (by ``keys`` when given, else round-robin)
    iff its current parallelism is below both the target and the
    cluster's default parallelism. No-op on already-parallel inputs."""
    spark = sdf.sparkSession
    target = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    current = sdf.rdd.getNumPartitions()
    if current >= min(target, spark.sparkContext.defaultParallelism):
        return sdf
    return sdf.repartition(target, *keys) if keys else sdf.repartition(target)
