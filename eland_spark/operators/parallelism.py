"""Input-parallelism guards for compute-heavy map stages.

Small-file inputs (one parquet row group -> one effective scan task, no
matter the split config: a byte-range split only yields rows when a row
group STARTS inside it) serialize any expensive per-row map chained on
them — shingling, hashing, tokenize+explode, mapInPandas Python — no
matter how many cores the cluster has. At real scale (thousands of
files/row groups) the scan is already parallel and these guards are
no-ops; on small inputs they insert ONE keyed repartition ahead of the
map so the work spreads across the cluster.

Repartitioning BY THE DOWNSTREAM GROUPING KEY is strictly better than
round-robin: Spark's alias-aware output partitioning lets the later
``groupBy(key)`` / ``Window.partitionBy(key)`` reuse the exchange
(HashPartitioning(k) satisfies ClusteredDistribution([k, ...])), so the
guard *moves* the chain's one shuffle from post-explode (token rows) to
pre-explode (doc rows — far fewer bytes) instead of adding a second.

Two entry points, one estimator:

- :func:`ensure_parallelism` — caller ASSERTS the downstream stage is
  expensive; fires whenever current parallelism is low, including over
  filtered inputs. Uses the cheap metadata estimate when the plan is
  scan-shaped and falls back to ``rdd.getNumPartitions()`` (a physical
  planning pass, ~0.5 s on a fresh plan) otherwise.
- :func:`spread_for_compute` — conservative variant for generic
  library sites (``DataFrame.apply``, multimodal decode): additionally
  DECLINES when a Filter makes the cardinality actually reaching the
  stage statically unknown (measured r8: a 200-row filtered input paid
  0.3 s for a useless 32-way spread), and never runs a planning pass.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame

__all__ = [
    "ensure_parallelism",
    "spread_for_compute",
    "bounded_single_task_rows",
]

# analyzed-plan node names whose presence means the plan already has a
# shuffle (or an explicit distribution choice) above the scan — the map
# work downstream of it is already parallel, so a spread would only add
# an exchange. String-matched on the analyzed logical plan (cheap: no
# optimization or physical planning run).
_SHUFFLE_SHAPED = (
    "Repartition",          # Repartition / RepartitionByExpression / rebalance
    "MapInPandas",          # opaque python stage (its own spread decision)
    "MapInArrow",
    "Join",                 # shuffle or broadcast: either way deliberate
    "Aggregate",            # partial/final agg pair -> exchange
    "Window",
    "Sort",                 # global sort -> range exchange
    "Deduplicate",
    "LogicalRDD",           # checkpointed / in-memory source: no files
)


def _analyzed_plan(sdf: DataFrame) -> str | None:
    try:
        return sdf._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None


def _effective_scan_parallelism(sdf: DataFrame, target: int) -> "int | None":
    """Estimated max concurrent scan tasks from metadata only, or None
    when unknown.

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
    many = len(files) >= target
    local = []
    for f in files:
        if f.startswith("file:"):
            local.append(f[len("file:"):])
        elif f.startswith("/"):
            local.append(f)
        else:
            # remote many-files: clusters' normal case, assume parallel
            return len(files) if many else None
    try:
        import pyarrow.parquet as pq

        conf = sdf.sparkSession.conf
        max_pb = _bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        open_cost = _bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
        total = 0
        row_groups = 0
        for p in local:
            total += os.path.getsize(p)
            if not many:  # footer reads only for small file counts
                row_groups += pq.ParquetFile(p).num_row_groups
    except Exception:
        return None
    # FilePartition packing: maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, total/default parallelism)) — the local
    # small-file case lands on openCostInBytes.
    dp = max(1, sdf.sparkSession.sparkContext.defaultParallelism)
    max_split = min(max_pb, max(open_cost, (total + len(local) * open_cost) // dp))
    splits = max(1, -(-total // max(1, max_split)))
    if many:
        # ADVICE r8: with a tiny openCostInBytes many small files pack
        # into few splits — bound by the packing estimate instead of
        # declaring len(files) parallel. When splits >= files, every
        # file's first row group gives a task, so files is the floor.
        return min(splits, len(files)) if splits < len(files) else len(files)
    return min(splits, row_groups)


def _bytes(v: str) -> int:
    # Spark accepts both one- and two-letter suffixes ("128m" / "128mb");
    # strip the optional trailing 'b' first so "mb" parses as 'm', then
    # the k/m/g multiplier; a bare trailing 'b' means bytes.
    v = str(v).strip().lower()
    mult = 1
    if v.endswith("b"):
        v = v[:-1]
    for sfx, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(sfx):
            v = v[:-1]
            mult = m
            break
    return int(float(v) * mult)


# analyzed-plan node names bounded_single_task_rows ACCEPTS: each is
# row-preserving over exactly one child (or a leaf file source), so the
# parquet footer row count equals the frame's row count and a single
# split executes it as one task. Everything else — Filter (rows
# unknown), Generate/explode (row-multiplying), Union (multi-source:
# inputFiles() dedups, so one file scanned twice still looks like one
# row group), Expand, Sample, joins, aggregates — fails the proof and
# returns None (ADVICE r8: the old blocklist let Generate/Union pass).
_ROW_PRESERVING = ("Project", "SubqueryAlias", "Relation", "View", "Alias")


def bounded_single_task_rows(sdf: DataFrame, max_rows: int) -> "int | None":
    """Row count of ``sdf`` IFF metadata alone proves the frame is a
    bare local scan/projection that executes as ONE task holding at
    most ``max_rows`` rows — the precondition under which a driver-side
    replica of a one-partition/one-Arrow-batch compute produces
    bit-identical floats (single partial, no cross-task combine).
    Returns None whenever any of that is unprovable (filters, shuffles,
    row-multiplying or multi-source nodes, remote files, multiple
    splits/row groups, too many rows) — callers then keep their
    distributed path. Never runs a job. Allowlist-based: every plan
    node must be a known row-preserving single-child shape."""
    plan = _analyzed_plan(sdf)
    if plan is None:
        return None
    for line in plan.splitlines():
        node = line.lstrip(" +-:|").split(" ", 1)[0].split("[", 1)[0]
        if node and node not in _ROW_PRESERVING:
            return None
    try:
        files = sdf.inputFiles()
    except Exception:
        return None
    if not files:
        return None
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

        rows = 0
        row_groups = 0
        for p in local:
            meta = pq.ParquetFile(p)
            rows += meta.metadata.num_rows
            row_groups += meta.num_row_groups
    except Exception:
        return None
    if row_groups != 1 or rows > max_rows:
        return None
    return rows


def ensure_parallelism(
    sdf: DataFrame, *keys: Column | str, partitions: int | None = None
) -> DataFrame:
    """Repartition ``sdf`` (by ``keys`` when given, else round-robin)
    iff its current parallelism is below both the target and the
    cluster's default parallelism. No-op on already-parallel inputs.
    Fires over filtered inputs too — the caller asserts the downstream
    stage is worth spreading at any surviving cardinality."""
    spark = sdf.sparkSession
    target = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    floor = min(target, spark.sparkContext.defaultParallelism)
    plan = _analyzed_plan(sdf)
    if plan is not None and not any(m in plan for m in _SHUFFLE_SHAPED):
        # scan-shaped (projections/filters only): metadata estimate,
        # no physical planning pass
        eff = _effective_scan_parallelism(sdf, floor)
        if eff is not None:
            if eff >= floor:
                return sdf
            return sdf.repartition(target, *keys) if keys else sdf.repartition(target)
    current = sdf.rdd.getNumPartitions()
    if current >= floor:
        return sdf
    return sdf.repartition(target, *keys) if keys else sdf.repartition(target)


def spread_for_compute(
    sdf: DataFrame, *keys: "str | Column", factor: int = 1
) -> DataFrame:
    """Conservative spread for generic library sites (module
    docstring): additionally a no-op when the plan carries a Filter
    (surviving cardinality statically unknown) or anything
    shuffle-shaped, and decided from metadata only — never a planning
    pass. ``keys``: optional high-cardinality hash keys (skips
    round-robin's local sort). ``factor``: partitions per core for
    long-tailed per-row costs."""
    sc = sdf.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism) * factor
    plan = _analyzed_plan(sdf)
    if plan is None or any(m in plan for m in _SHUFFLE_SHAPED + ("Filter",)):
        return sdf
    eff = _effective_scan_parallelism(sdf, target)
    if eff is None or eff >= target:
        return sdf
    if keys:
        return sdf.repartition(target, *keys)
    return sdf.repartition(target)
