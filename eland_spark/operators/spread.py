"""Scale-adaptive compute-parallelism spread.

The bench inputs (and any small extract) are single-row-group parquet
files: Spark's scan planner can slice a file into byte ranges, but a
range only yields rows when it contains a row group's start, so a
one-row-group file is ONE task no matter the split config — every map
stage above it (explodes, signature hashing, partial aggregation,
mapInPandas Python) runs serially on one core of the whole cluster
(guide §2/§6: input split size bounds scan parallelism; measured r8:
frame_apply 8.2 s serial vs 1.2 s on a 32-row-group twin of the same
data).

:func:`spread_for_compute` inserts ONE narrow repartition in front of
an expensive compute stage — but only when the scan underneath cannot
reach the cluster's parallelism. The gate is decided from cheap
metadata (leaf file list + local parquet footers), never a job:

- many leaf files (>= target): the scan parallelizes by itself (the
  100 TB case) — no-op, the extra shuffle would be pure waste;
- non-local / un-statable files: unknown — conservatively no-op (a
  real cluster's inputs are the many-files case);
- plan already carries a repartition / shuffle-producing operator
  (join, aggregate, window, sort) or an opaque python stage: its
  exchange already spreads downstream work — no-op;
- plan carries a Filter: the cardinality actually reaching the compute
  stage is statically unknown (a selective filter leaves rows too few
  to amortize the exchange — measured r8: a 200-row filtered input
  paid 0.3 s for a useless 32-way spread) — conservatively no-op;
- otherwise: effective scan parallelism = min(byte-range splits,
  total row groups); below target -> ``repartition(target, *keys)``.

``keys`` (when the caller has a high-cardinality key, e.g. the frame's
index) use hash partitioning — cheaper than keyless round-robin, which
pays a per-partition binary sort of the full rows for retry determinism
(``spark.sql.execution.sortBeforeRepartition``). Results never depend
on the spread: callers only use it in front of row-wise or
partition-invariant computations.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame

__all__ = ["spread_for_compute"]

# analyzed-plan node names whose presence means the plan already has a
# shuffle (or an explicit distribution choice) above the scan — the map
# work downstream of it is already parallel, so a spread would only add
# an exchange. String-matched on the analyzed logical plan (cheap: no
# optimization run).
_ALREADY_SHAPED = (
    "Repartition",          # Repartition / RepartitionByExpression / rebalance
    "MapInPandas",          # opaque python stage (its own spread decision)
    "MapInArrow",
    "Join",                 # shuffle or broadcast: either way deliberate
    "Aggregate",            # partial/final agg pair -> exchange
    "Window",
    "Sort",                 # global sort -> range exchange
    "Deduplicate",
    "LogicalRDD",           # checkpointed / in-memory source: no files
    "Filter",               # post-filter cardinality unknown: be conservative
)


def _analyzed_has(sdf: DataFrame, markers: tuple[str, ...]) -> bool:
    try:
        s = sdf._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True  # unknown -> treat as shaped (no spread)
    return any(m in s for m in markers)


def _effective_scan_parallelism(sdf: DataFrame, target: int) -> "int | None":
    """Estimated max concurrent scan tasks, or None when unknown.

    min(byte-range splits, row groups): a split only produces rows for
    row groups starting inside it, and a row group is never shared.
    Only local files are footer-read (bench/test layout); remote paths
    return None (clusters are the many-files case the early exit
    already covers)."""
    try:
        files = sdf.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= target:
        return len(files)
    local = []
    for f in files:
        if f.startswith("file:"):
            local.append(f[len("file:"):])
        elif f.startswith("/"):
            local.append(f)
        else:
            return None
    try:
        import pyarrow.parquet as pq

        conf = sdf.sparkSession.conf
        max_pb = _bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        open_cost = _bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
        total = 0
        row_groups = 0
        for p in local:
            total += os.path.getsize(p)
            row_groups += pq.ParquetFile(p).num_row_groups
    except Exception:
        return None
    # FilePartition packing: maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, total/default parallelism)) — the local
    # small-file case lands on openCostInBytes.
    dp = max(1, sdf.sparkSession.sparkContext.defaultParallelism)
    max_split = min(max_pb, max(open_cost, (total + len(local) * open_cost) // dp))
    splits = max(1, -(-total // max(1, max_split)))
    return min(splits, row_groups)


def _bytes(v: str) -> int:
    v = str(v).strip().lower()
    mult = 1
    for sfx, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if v.endswith(sfx):
            v = v[: -1]
            mult = m
            break
    return int(float(v) * mult)


def spread_for_compute(
    sdf: DataFrame, *keys: "str | Column", factor: int = 1
) -> DataFrame:
    """Repartition ``sdf`` to the cluster's parallelism IFF its scan
    cannot reach it (see module docstring). ``keys``: optional
    high-cardinality hash keys (skips round-robin's local sort).
    ``factor``: partitions per core for long-tailed per-row costs."""
    sc = sdf.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism) * factor
    if _analyzed_has(sdf, _ALREADY_SHAPED):
        return sdf
    eff = _effective_scan_parallelism(sdf, target)
    if eff is None or eff >= target:
        return sdf
    if keys:
        return sdf.repartition(target, *keys)
    return sdf.repartition(target)
