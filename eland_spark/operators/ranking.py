"""Distributed global ranking.

``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY pulls
every row through ONE partition — the classic scale cliff. This
operator produces the same 1-based global row numbers the scalable way:

1. range-partition + sort by the order columns (one range shuffle —
   the same shuffle a global sort needs anyway);
2. per-partition counts -> cumulative offsets on the driver (one tiny
   row per partition);
3. ``monotonically_increasing_id`` on the SORTED, CACHED frame encodes
   (partition_id << 33) | row_in_partition — pure bit arithmetic
   recovers the within-partition position, and ``offset[pid] + pos + 1``
   is the global rank. No window, no extra exchange, everything stays
   JVM-side.

The two passes share the cached sorted frame (range boundaries come
from sampling, so the frame must be pinned for the id assignment to be
consistent with the counted layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_global_rank"]

_POS_MASK = (1 << 33) - 1


def with_global_rank(
    sdf: DataFrame,
    order_by: list[str | Column],
    ascending: bool = True,
    rank_col: str = "rank",
    partitions: int | None = None,
    range_cols: list[str | Column] | None = None,
) -> DataFrame:
    """Return ``sdf`` with a 1-based global row-number column over the
    total order given by ``order_by`` (add a unique key as the last
    order column for fully deterministic ranks). The result is
    range-partitioned and sorted — downstream ``filter(rank <= k)``
    prunes whole partitions via the offsets already paid for.

    ``range_cols`` (default: all of ``order_by``) narrows the RANGE
    partitioning to a prefix of the order columns while the full
    ordering still sorts within partitions. Rows equal on the prefix
    are then CO-LOCATED (RangePartitioning satisfies the clustered
    distribution a downstream ``Window.partitionBy(prefix)`` needs), so
    e.g. a tie-resolution window on the value reuses this exchange
    instead of adding a hash shuffle; global order is preserved because
    equal prefix keys never straddle a range boundary. Trade-off: a
    single massively-duplicated prefix value concentrates in one
    partition — same skew exposure the tie window itself would have.

    NOTE: the returned frame holds a cache pin; call
    ``.unpersist()`` on it (or let it age out) when done.
    """
    spark = sdf.sparkSession
    n_parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ordering = [c.asc() if ascending else c.desc() for c in cols]
    if range_cols is None:
        range_ordering = ordering
    else:
        rc = [F.col(c) if isinstance(c, str) else c for c in range_cols]
        range_ordering = [c.asc() if ascending else c.desc() for c in rc]
    ranked_src = (
        sdf.repartitionByRange(int(n_parts), *range_ordering)
        .sortWithinPartitions(*ordering)
        .withColumn("__mid__", F.monotonically_increasing_id())
        .cache()
    )
    counts = (
        ranked_src.groupBy(F.shiftright(F.col("__mid__"), 33).alias("__pid__"))
        .count()
        .orderBy("__pid__")
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[r["__pid__"]] = acc
        acc += r["count"]
    off_map = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
    rank = (
        off_map[F.shiftright(F.col("__mid__"), 33)]
        + F.col("__mid__").bitwiseAND(F.lit(_POS_MASK))
        + 1
    )
    return ranked_src.withColumn(rank_col, rank.cast("long")).drop("__mid__")
