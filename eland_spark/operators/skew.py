"""Skew-mitigation join/agg helpers.

No reference analog (ES owns physical execution). At 100 TB a handful
of hot keys (null ids, default accounts, bot users) can put one
reducer 1000x over the others. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin`) is the first line of defense and is on
by default in `get_session`; these helpers cover the cases AQE can't:
a shuffle join where ONE side must be replicated per salt bucket, and
exact distinct-style aggs where partial aggregation doesn't compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_count_distinct"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Shuffle join with the big side's hot keys spread over ``salt``
    buckets. The big side gets a random salt per row; the small side is
    replicated ``salt`` times (explode of a literal range — cheap when
    ``small`` is genuinely smaller, which is the only case this helps).
    The join key becomes (on, salt), so one hot key fans out to
    ``salt`` reducers instead of one.

    Prefer ``F.broadcast(small)`` when small fits the broadcast
    threshold — salting is for the mid-size side that is too big to
    broadcast but small enough to replicate ``salt`` ways.

    Only inner/left-ish joins are valid: in a right or full join an
    unmatched small-side row would surface once PER SALT replica.
    """
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti", "semi", "anti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of "
            "the replicated side would appear once per salt bucket"
        )
    salted_big = big.withColumn(
        "__salt__", (F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, on=[on, "__salt__"], how=how)
    return out.drop("__salt__")


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-group distinct count without one giant per-key reducer:
    phase 1 dedups (key, value) pairs — the shuffle spreads by value
    hash too — phase 2 counts per key. Two small shuffles instead of
    one skew-prone one; at scale this is the standard rewrite for
    count(DISTINCT) over hot keys.

    count(col) in phase 2 skips the null value rows kept by distinct,
    so groups whose values are ALL null still appear with count 0 —
    exactly countDistinct's group set and values."""
    dedup = df.select(*keys, col).distinct()
    return dedup.groupBy(*keys).agg(F.count(F.col(col)).alias(out_col))
