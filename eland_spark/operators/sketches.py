"""Reusable HyperLogLog sketches for distinct counting at scale.

The reference's ``nunique`` maps to one-shot HLL++ inside
Elasticsearch (cardinality agg, SURVEY §2.5). At 100 TB the stronger
pattern is MATERIALIZED sketches: aggregate each partition/group to an
HLL sketch once (Spark 4 ``hll_sketch_agg`` — Apache DataSketches
binary), persist the few-KB sketches, then answer distinct-count
questions at any rollup level by merging sketches (``hll_union_agg``)
without touching the raw data again. Merge is associative — per-day
sketches roll up to months/years for free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_sketches",
    "hll_rollup_estimate",
    "kmv_sketches",
    "kmv_estimate",
    "kmv_rollup_estimate",
    "sample_sketches",
    "sample_rollup",
    "quantile_from_sample",
    "mg_partials",
    "mg_sketches",
    "mg_rollup",
    "mg_items",
    "bloom_sketches",
    "bloom_rollup",
    "bloom_contains",
    "bloom_fill_ratio",
    "cms_sketches",
    "cms_rollup",
    "cms_estimate",
]


def hll_sketches(
    sdf: DataFrame,
    value_col: str,
    by: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per ``by`` group over ``value_col`` (binary
    column ``sketch`` + exact per-group estimate ``estimate``).
    ``lg_k=12`` -> ~1.6% relative standard error, ~2.5 KB/sketch."""
    by = list(by)
    return sdf.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("estimate"),
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    by: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge pre-computed sketches up to a coarser grouping (``by`` may
    be empty for the global estimate): union is lossless relative to
    building the sketch from raw data, so rollups never rescan."""
    by = list(by)
    merged = F.hll_union_agg(F.col(sketch_col)).alias("merged")
    if by:
        out = sketches.groupBy(*by).agg(merged)
    else:
        out = sketches.agg(merged)
    return out.select(
        *by, F.hll_sketch_estimate(F.col("merged")).alias("estimate")
    )


# ---------------------------------------------------------------------------
# KMV (K-minimum values) sketch — engine-portable distinct counting
# ---------------------------------------------------------------------------
#
# Beyond HLL (JVM DataSketches binaries, opaque to other engines), the
# KMV sketch (Bar-Yossef et al. 2002) is the simplest mergeable
# distinct-count summary: hash every value to (0,1), keep the K
# smallest hashes. The estimate is (K-1)/h_K (h_K = the largest kept
# hash); merging sketches = keep the K smallest of the union — still
# exactly "the K smallest hashes of the union of inputs", so rollups
# are lossless relative to a from-scratch build. Built here on the
# md5-prefix hash, which any SQL engine reproduces bit-for-bit — the
# whole sketch (build, merge, estimate) has a DuckDB oracle, unlike
# HLL. Error ~ 1/sqrt(K-2): K=256 -> ~6%, K=1024 -> ~3%.

_KMV_SPACE = float(16 ** 15)  # md5 60-bit prefix universe


def _kmv_hash(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "double"
    )


def kmv_sketches(
    sdf: DataFrame,
    value_col: str,
    by: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """One KMV sketch per group: ``kmv`` = sorted array of the K
    smallest distinct md5-prefix hashes of ``value_col``. One hash
    aggregation (collect_set capped via slice after sort — the shuffled
    state is the per-group distinct hash set; for very high-cardinality
    groups build per-partition sketches first and merge with
    :func:`kmv_rollup_estimate`)."""
    from .parallelism import spread_for_compute

    by = list(by)
    h = _kmv_hash(F.col(value_col))
    arr = F.slice(F.array_sort(F.collect_set(h)), 1, k)
    # hash-spread on the value: parallelizes the md5 map work when the
    # scan is single-task AND pre-groups duplicates for the partial
    # collect_set (no-op when the scan already parallelizes); project
    # first so the exchange carries only the sketch's columns
    cols = list(dict.fromkeys([*by, value_col]))
    src = spread_for_compute(sdf.select(*cols), value_col)
    return src.groupBy(*by).agg(arr.alias("kmv"))


def kmv_estimate(kmv_col, k: int | None = None) -> "F.Column":
    """Distinct-count estimate from a KMV array:
    ``(K-1) / (h_K / space)``. Pass ``k`` to get the EXACT count when
    the sketch holds fewer than K hashes (it IS the distinct set
    then)."""
    n = F.size(kmv_col)
    h_k = F.element_at(kmv_col, -1) / F.lit(_KMV_SPACE)
    est = F.round((n - 1) / h_k).cast("long")
    if k is not None:
        return F.when(n < k, n.cast("long")).otherwise(est)
    return est


def kmv_rollup_estimate(
    sketches: DataFrame,
    by: Sequence[str],
    k: int = 256,
    kmv_col: str = "kmv",
) -> DataFrame:
    """Merge KMV sketches to a coarser grouping: flatten the arrays,
    keep the K smallest distinct hashes of the union — identical to a
    from-scratch sketch of the union, so rollups never rescan raw
    data. Returns ``estimate`` per group (global when ``by`` empty)."""
    by = list(by)
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.col(kmv_col))))
        ),
        1,
        k,
    )
    if by:
        out = sketches.groupBy(*by).agg(merged.alias("m"))
    else:
        out = sketches.agg(merged.alias("m"))
    return out.select(*by, kmv_estimate(F.col("m"), k).alias("estimate"))


# ---------------------------------------------------------------------------
# bottom-k row sample sketch — mergeable quantiles / uniform samples
# ---------------------------------------------------------------------------
#
# The same min-K idea applied to ROWS instead of distinct values: keep
# the K rows whose md5 row-key hashes smallest. That is a uniform
# random sample of the rows — and it MERGES: the K smallest keys of a
# union of sketches are exactly the sketch of the union, so per-group
# samples roll up to any coarser grouping losslessly (vs a from-scratch
# sample with the same keys). Quantiles from the sample carry the
# usual O(1/sqrt(K)) sampling error; the md5 key makes every step
# SQL-replayable (t-digest/KLL have no such oracle).

def sample_sketches(
    sdf: DataFrame,
    value_col: str,
    id_col: str,
    by: Sequence[str],
    k: int = 512,
    salt_parts: int | None = None,
) -> DataFrame:
    """One bottom-k row sample per group: ``sample`` = array of
    (h, v) structs, the K smallest md5 row-keys with their values.
    Null values are skipped (pandas quantile semantics).

    TWO-LEVEL aggregation (guide §2.5): a single collect_list per
    group buffers and sorts the ENTIRE group in one task — with few
    groups that is a handful of reducers doing all the work (and an
    unbounded buffer at scale). Level 1 takes the bottom-k per
    (group, salt) — ``salt_parts``-way deterministic split of the row
    ids, defaulting to the shuffle parallelism — level 2 merges the
    salted min-K samples exactly like :func:`sample_rollup` (min-K of
    min-Ks of a partition IS the min-K of the union, so the result is
    identical); buffers shrink ~salt_parts-fold and every core sorts."""
    by = list(by)
    n_salt = int(
        salt_parts
        or sdf.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    v = F.col(value_col).cast("double")
    pair = F.when(
        v.isNotNull(), F.struct(_kmv_hash(F.col(id_col)).alias("h"), v.alias("v"))
    )
    arr = F.slice(F.array_sort(F.collect_list(pair)), 1, k)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).alias("__salt__")
    # the md5 row keys + per-salt partial buffers are map-side work:
    # spread a single-task scan across the cluster first (no-op when
    # the scan already parallelizes — operators/parallelism.py)
    from .parallelism import spread_for_compute

    cols = list(dict.fromkeys([*by, value_col, id_col]))
    partial = spread_for_compute(sdf.select(*cols), id_col).groupBy(
        *by, salt
    ).agg(arr.alias("sample"))
    merged = F.slice(
        F.array_sort(F.flatten(F.collect_list(F.col("sample")))), 1, k
    )
    return partial.groupBy(*by).agg(merged.alias("sample"))


def sample_rollup(
    sketches: DataFrame,
    by: Sequence[str],
    k: int = 512,
    sample_col: str = "sample",
) -> DataFrame:
    """Merge bottom-k samples to a coarser grouping (min-K of the
    union — identical to sampling the union directly)."""
    by = list(by)
    merged = F.slice(
        F.array_sort(F.flatten(F.collect_list(F.col(sample_col)))), 1, k
    )
    if by:
        return sketches.groupBy(*by).agg(merged.alias(sample_col))
    return sketches.agg(merged.alias(sample_col))


def quantile_from_sample(sample_col, q: float) -> "F.Column":
    """Nearest-rank quantile of the sketched values: sort the sampled
    values, take element ceil(q*n). Exact when the group had <= K rows
    (the sample IS the group)."""
    vals = F.array_sort(F.transform(sample_col, lambda s: s["v"]))
    n = F.size(vals)
    idx = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * n).cast("int"))
    return F.when(n > 0, F.element_at(vals, idx))


# ---------------------------------------------------------------------------
# Misra-Gries frequent-items (heavy hitters) sketches
# ---------------------------------------------------------------------------

def mg_partials(
    sdf: DataFrame, value_col: str, by: Sequence[str], k: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries summaries as (by..., item, cnt) rows,
    at most ``k`` items per (partition-batch, group).

    Each Arrow batch counts its items per group and MG-compresses to k
    counters (subtract the (k+1)-th largest from all, drop non-positive)
    — so the shuffle carries <= batches * groups * k tiny rows no matter
    how many DISTINCT items the raw data holds. That bound is the whole
    point vs a plain groupBy(item): a 100 TB corpus with billions of
    distinct tokens still shuffles only the capped summaries.
    """
    by = list(by)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.name in by
    )
    out_schema = (fields + ", " if fields else "") + "item string, cnt long"

    def emit(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            g = (
                pdf.groupby(by, dropna=False)[value_col].value_counts()
                if by
                else pdf[value_col].value_counts()
            )
            out = g.rename("cnt").reset_index()
            out = out.rename(columns={value_col: "item"})
            if by:
                # MG-compress each group's counter set to k entries
                def compress(grp):
                    if len(grp) <= k:
                        return grp
                    grp = grp.sort_values("cnt", ascending=False)
                    delta = grp["cnt"].iloc[k]
                    kept = grp.iloc[:k].copy()
                    kept["cnt"] = kept["cnt"] - delta
                    return kept[kept["cnt"] > 0]

                out = (
                    out.groupby(by, dropna=False, group_keys=False)
                    .apply(compress)
                    .reset_index(drop=True)
                )
            elif len(out) > k:
                out = out.sort_values("cnt", ascending=False)
                delta = out["cnt"].iloc[k]
                out = out.iloc[:k].copy()
                out["cnt"] = out["cnt"] - delta
                out = out[out["cnt"] > 0]
            out["item"] = out["item"].astype(str)
            yield out[by + ["item", "cnt"]]

    return sdf.select(*by, value_col).mapInPandas(emit, schema=out_schema)


def _mg_compress(rows: DataFrame, by: Sequence[str], k: int) -> DataFrame:
    """Merge (by..., item, cnt) partial rows and MG-compress per group:
    sum per item, subtract the (k+1)-th largest sum, keep positive.
    Both shuffles are bounded by the partial-row count, not the data."""
    from pyspark.sql import Window

    by = list(by)
    merged = rows.groupBy(*by, "item").agg(F.sum("cnt").alias("cnt"))
    if not by:
        # global compress without a window: the merged rows are bounded
        # by the incoming partial count, so one array aggregation takes
        # the top k+1 and subtracts the boundary — no WindowExec, no
        # single-partition window node
        entry = F.struct(
            (-F.col("cnt")).alias("nc"),
            F.col("item").alias("item"),
            F.col("cnt").alias("cnt"),
        )
        top = merged.agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, k + 1).alias("a")
        )
        delta = F.when(
            F.size("a") > k, F.element_at("a", k + 1)["cnt"]
        ).otherwise(F.lit(0))
        return (
            top.select(delta.alias("__d__"), F.explode(F.slice("a", 1, k)).alias("e"))
            .select(
                F.col("e.item").alias("item"),
                (F.col("e.cnt") - F.col("__d__")).alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
        )
    w = Window.partitionBy(*by)
    ordered = w.orderBy(F.col("cnt").desc(), F.col("item").asc())
    ranked = merged.withColumn("__rn__", F.row_number().over(ordered))
    delta = F.max(
        F.when(F.col("__rn__") == k + 1, F.col("cnt")).otherwise(F.lit(0))
    ).over(w)
    return (
        ranked.withColumn("__cnt__", F.col("cnt") - delta)
        .filter((F.col("__rn__") <= k) & (F.col("__cnt__") > 0))
        .select(*by, "item", F.col("__cnt__").alias("cnt"))
    )


def mg_sketches(
    sdf: DataFrame, value_col: str, by: Sequence[str], k: int = 64
) -> DataFrame:
    """One Misra-Gries sketch per group: ``mg`` = map<item, count lower
    bound> with <= k entries. EXACT counts whenever the group has <= k
    distinct items (no compression ever subtracts); otherwise each
    stored count undercounts by at most n_group / (k+1) per merge
    level, and any item with true frequency > n/(k+1) is guaranteed
    present (the classic heavy-hitter contract)."""
    by = list(by)
    rows = _mg_compress(mg_partials(sdf, value_col, by, k), by, k)
    pair = F.struct(F.col("item"), F.col("cnt"))
    agg = F.map_from_entries(F.array_sort(F.collect_list(pair))).alias("mg")
    if by:
        return rows.groupBy(*by).agg(agg)
    return rows.agg(agg)


def mg_rollup(
    sketches: DataFrame,
    by: Sequence[str],
    k: int = 64,
    mg_col: str = "mg",
) -> DataFrame:
    """Merge MG sketches to a coarser grouping (global when ``by``
    empty): explode the maps, sum per item, re-compress — identical
    guarantees as sketching the union, no raw-data rescan."""
    by = list(by)
    rows = sketches.select(
        *by, F.explode(F.col(mg_col)).alias("item", "cnt")
    )
    merged = _mg_compress(rows, by, k)
    pair = F.struct(F.col("item"), F.col("cnt"))
    agg = F.map_from_entries(F.array_sort(F.collect_list(pair))).alias(mg_col)
    if by:
        return merged.groupBy(*by).agg(agg)
    return merged.agg(agg)


def mg_items(sketches: DataFrame, by: Sequence[str], mg_col: str = "mg") -> DataFrame:
    """Explode sketches to (by..., item, cnt) rows — the queryable
    heavy-hitter table."""
    return sketches.select(
        *list(by), F.explode(F.col(mg_col)).alias("item", "cnt")
    )


# --- Bloom filter (membership) -------------------------------------------
#
# The membership member of the sketch family (HLL/KMV: distinct counts,
# MG: heavy hitters, bottom-k: quantiles). A Bloom filter answers "was
# this key EVER in the group" with no false negatives and a tunable
# false-positive rate — the 100-TB tool for incremental cross-snapshot
# dedup: sketch yesterday's corpus once (m/8 bytes per group instead of
# the key set), then gate today's increment with a broadcast membership
# probe instead of a full-corpus anti-join. Sketches store SPARSE
# (group, word, bits) rows — only words with set bits exist — and merge
# losslessly by bitwise OR, so rollups never rescan raw data (same
# contract as the KMV/MG families).
#
# Hashing: Kirsch-Mitzenmacher double hashing pos_i = (h1 + i*h2) mod m
# with h1/h2 = disjoint 60-bit md5 prefixes — exact integer arithmetic
# in longs, and any SQL engine replays it (DuckDB oracle idiom:
# CAST('0x'||substr(md5(x),...) AS BIGINT)). Words hold 63 bits (bit =
# 1 << (pos % 63)): the sign bit is never set, so bit_or/bit-and
# semantics are engine-portable without two's-complement edge cases.

_BLOOM_WORD = 63


def _bloom_h12(col) -> tuple["F.Column", "F.Column"]:
    s = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(s, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(s, 17, 15), 16, 10).cast("long")
    return h1, h2


def _bloom_positions(col, m_bits: int, n_hashes: int) -> "F.Column":
    h1, h2 = _bloom_h12(col)
    return F.transform(
        F.sequence(F.lit(1), F.lit(n_hashes)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
    )


def bloom_sketches(
    sdf: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Build one Bloom filter per group as sparse (by..., word int,
    bits long) rows. ONE hash aggregation: explode each value's
    ``n_hashes`` bit positions (map-only), bit_or the per-word masks
    (map-side combined — shuffle bounded by groups x words, not rows).

    Sizing: fpp ~ (1 - e^(-k*n/m))^k; m_bits = 10 bits/key with k=4
    gives ~1.2% fpp. Pick m_bits for the LARGEST group."""
    by = list(by)
    pos = F.explode(
        _bloom_positions(F.col(value_col), m_bits, n_hashes)
    ).alias("__pos__")
    rows = sdf.select(*by, pos).select(
        *by,
        (F.col("__pos__") / _BLOOM_WORD).cast("int").alias("word"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(__pos__ % {_BLOOM_WORD} as int))"
        ).alias("__bit__"),
    )
    agg = F.bit_or("__bit__").alias("bits")
    if by:
        return rows.groupBy(*by, "word").agg(agg)
    return rows.groupBy("word").agg(agg)


def bloom_rollup(
    sketches: DataFrame, by: Sequence[str] = ()
) -> DataFrame:
    """Merge sketches to a coarser grouping by bitwise OR per word —
    identical to a from-scratch sketch of the union (OR is the Bloom
    merge), so incremental snapshots fold without rescanning."""
    by = list(by)
    agg = F.bit_or("bits").alias("bits")
    return sketches.groupBy(*by, "word").agg(agg)


def bloom_contains(
    sketches: DataFrame,
    probes: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership test: for each probe row (carrying the ``by`` columns
    when grouped), ``contained`` is true iff ALL ``n_hashes`` bits are
    set in that group's filter — no false negatives, fpp-bounded false
    positives. Plan: the probe side reduces to (by, item, word,
    needed-mask) rows (tiny — aggregate before the join), left-joins
    the sketch on (by, word) (AQE broadcasts whichever side is small),
    and ONE aggregation ANDs the per-word checks back to one row per
    probe. NULL probes pass through as an explicit ``contained=false``
    row (explode_outer keeps them; the null join key never matches a
    sketch word) so per-probe joins downstream don't lose rows
    (ADVICE r2)."""
    by = list(by)
    need = (
        probes.select(
            *by,
            F.col(value_col).alias("item"),
            F.explode_outer(
                _bloom_positions(F.col(value_col), m_bits, n_hashes)
            ).alias("__pos__"),
        )
        .select(
            *by,
            "item",
            (F.col("__pos__") / _BLOOM_WORD).cast("int").alias("word"),
            F.expr(
            f"shiftleft(cast(1 as bigint), cast(__pos__ % {_BLOOM_WORD} as int))"
        ).alias("__bit__"),
        )
        .groupBy(*by, "item", "word")
        .agg(F.bit_or("__bit__").alias("__need__"))
    )
    joined = need.join(sketches, [*by, "word"], "left")
    ok = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("__need__")) == F.col("__need__"))
    )
    return (
        joined.groupBy(*by, "item")
        .agg(F.min(ok.cast("int")).alias("__all__"))
        .select(*by, "item", (F.col("__all__") == 1).alias("contained"))
    )


def bloom_fill_ratio(
    sketches: DataFrame, by: Sequence[str] = (), m_bits: int = 4096
) -> DataFrame:
    """Per-group fill ratio (set bits / m) — the observable that prices
    the false-positive rate: fpp ~ fill_ratio ** n_hashes. A group
    past ~0.5 fill needs a bigger ``m_bits``."""
    by = list(by)
    agg = (F.sum(F.bit_count("bits")) / F.lit(float(m_bits))).alias(
        "fill_ratio"
    )
    if by:
        return sketches.groupBy(*by).agg(agg)
    return sketches.agg(agg)


# --- Count-min sketch (frequency estimates) --------------------------------
#
# The frequency member of the sketch family: "how often did key x
# occur" with a one-sided error (estimate >= truth, overshoot bounded
# by e*N/width with probability 1 - e^-depth) from counters whose size
# is depth x width — independent of both the number of rows AND the
# number of distinct keys. Complements Misra-Gries: MG returns the
# top-k list, CMS answers point queries for ARBITRARY keys (including
# ones that never made anyone's top-k), and both merge losslessly —
# per-shard/day sketches roll up by plain counter addition, never
# rescanning raw data.
#
# Hashing: the same md5 -> (a*h + b) mod p affine family as MinHash
# (dedup.minhash_params LCG constants, p = 2^31 - 1, h pre-reduced mod
# p so a*h + b stays < 2^62) — exact long arithmetic, so a SQL engine
# replays the sketch bit-for-bit (the oracle idiom used across this
# repo). Sketches store SPARSE (by..., row, bucket, cnt) rows — only
# touched counters exist.

def _cms_buckets(col, depth: int, width: int) -> "F.Column":
    """array<struct<row:int, bucket:int>> — one counter per sketch row."""
    from .dedup import MINHASH_PRIME, minhash_params

    params = minhash_params(depth, seed=1729)
    h = F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(MINHASH_PRIME),
    )
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_PRIME)),
                    F.lit(width),
                ).cast("int").alias("bucket"),
            )
            for r, (a, b) in enumerate(params)
        ]
    )


def cms_sketches(
    sdf: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build one count-min sketch per group as sparse (by..., row int,
    bucket int, cnt long) rows. ONE hash aggregation: explode each
    value's ``depth`` counter coordinates (map-only), count per
    coordinate (map-side combined — shuffle bounded by
    groups x depth x width, not rows).

    Sizing: overshoot <= e * N / width with prob 1 - e^-depth; width
    256 / depth 4 bounds error to ~1% of the stream at ~98% conf."""
    by = list(by)
    coord = F.explode(_cms_buckets(F.col(value_col), depth, width)).alias(
        "__c__"
    )
    rows = sdf.select(*by, coord).select(
        *by, F.col("__c__.row").alias("row"), F.col("__c__.bucket").alias("bucket")
    )
    return rows.groupBy(*by, "row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_rollup(sketches: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Merge sketches to a coarser grouping by counter ADDITION —
    identical to a from-scratch sketch of the union, so per-shard/day
    sketches fold without rescanning (same contract as the other
    sketch families)."""
    by = list(by)
    return sketches.groupBy(*by, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketches: DataFrame,
    probes: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query frequency estimates: for each probe row, the MIN
    over its ``depth`` counters (missing counter -> 0). Returns
    (by..., item, est). Plan: the probe side expands to depth
    coordinates (map-only), left-joins the sketch on (by, row, bucket)
    — AQE broadcasts whichever side is small — and ONE aggregation
    takes the min back to one row per probe."""
    by = list(by)
    need = probes.select(
        *by,
        F.col(value_col).alias("item"),
        F.explode(_cms_buckets(F.col(value_col), depth, width)).alias("__c__"),
    ).select(
        *by, "item", F.col("__c__.row").alias("row"),
        F.col("__c__.bucket").alias("bucket"),
    )
    joined = need.join(sketches, [*by, "row", "bucket"], "left")
    return (
        joined.groupBy(*by, "item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
