"""Deduplication operators — exact and near-duplicate.

No reference analog (eland has no dedup surface); these are the
training-data-pipeline extensions, designed shuffle-minimal:

- exact: hash-groupBy keep-one (one shuffle on the dedup key)
- minhash LSH: shingle -> minhash -> band buckets -> within-bucket join
  (candidate pairs only; never all-pairs)
- simhash: 64-bit weighted-token fingerprint, hamming-radius grouping
- ngram jaccard: verification metric on candidate pairs

All token/shingle work stays in built-in expressions (split, transform,
hash, xxhash64) — no Python UDF in the hot path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..frame import DataFrame


def drop_duplicates(df: "DataFrame", subset=None, keep: str = "first"):
    """Exact dedup. keep='first' keeps the lowest index value per group
    (deterministic, unlike raw dropDuplicates) via min_by over a single
    hash-shuffle; keep=False drops all duplicated rows."""
    from ..frame import DataFrame as EDF

    schema = df._schema
    cols = [schema.resolve(c) for c in (subset or schema.display_names)]
    if not schema.index_cols:
        return EDF(df._sdf.dropDuplicates(cols), schema)
    order = [F.col(c).asc() if keep != "last" else F.col(c).desc() for c in schema.index_cols]
    w = Window.partitionBy(*[F.col(c) for c in cols]).orderBy(*order)
    ranked = df._sdf.withColumn("__rn__", F.row_number().over(w))
    if keep is False:
        counted = df._sdf.withColumn(
            "__cnt__", F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in cols]))
        )
        return EDF(counted.filter(F.col("__cnt__") == 1).drop("__cnt__"), schema)
    return EDF(ranked.filter(F.col("__rn__") == 1).drop("__rn__"), schema)


# ---------------------------------------------------------------------------
# text shingling / normalization helpers (pure Column expressions)
# ---------------------------------------------------------------------------

def normalized_tokens(text: Column) -> Column:
    """lowercase, strip non-alnum, split on whitespace -> array<string>."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != "")


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as array<string> (distinct)."""
    toks = normalized_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array())
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, seed=i). array<bigint> length num_hashes.

    xxhash64 is JVM-side and codegen'd; signature cost is
    O(|shingles| * num_hashes) per row, fully parallel, no shuffle.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(s, i))
        ),
    )


def lsh_band_keys(sig: Column, bands: int = 16, rows_per_band: int = 4) -> Column:
    """Split the signature into bands; each band hashes to one bucket key.
    Rows sharing any band key are candidate pairs. array<bigint> length bands."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws("_", b, F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band)))
        ),
    )


def minhash_dedup(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
):
    """MinHash+LSH near-dup removal. Returns the frame with near-dup rows
    removed (keeping the lowest id per duplicate cluster).

    Scale path: candidate generation is an explode on band keys followed
    by a self-join on the bucket key — the join fan-out is bounded by
    bucket sizes, never |rows|^2. Estimated Jaccard from signature
    agreement verifies candidates before linking.
    """
    from ..frame import DataFrame as EDF

    rpb = num_hashes // bands
    schema = df._schema
    text = F.col(schema.resolve(text_col))
    idc = F.col(schema.resolve(id_col))

    sigged = df._sdf.withColumn("__sig__", minhash_signature(shingles(text, k), num_hashes))
    banded = sigged.select(
        idc.alias("__id__"), "__sig__",
        F.explode(lsh_band_keys(F.col("__sig__"), bands, rpb)).alias("__bucket__"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, on="__bucket__")
        .filter(F.col("l.__id__") < F.col("r.__id__"))
        .select("l.__id__", "r.__id__", "l.__sig__", "r.__sig__")
        .dropDuplicates(["l.__id__", "r.__id__"])
    )
    est_jaccard = (
        F.size(
            F.filter(
                F.zip_with(F.col("l.__sig__"), F.col("r.__sig__"), lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(num_hashes)
    )
    dup_pairs = pairs.filter(est_jaccard >= threshold).select(
        F.col("l.__id__").alias("keep"), F.col("r.__id__").alias("dup")
    )
    # one-hop cluster link: every dup maps to the min id it pairs with.
    # (full transitive closure would need iteration; one hop removes every
    # row that has ANY smaller near-duplicate, which is the dedup contract)
    to_drop = dup_pairs.select(F.col("dup").alias("__drop__")).distinct()
    kept = df._sdf.join(
        to_drop, on=idc == F.col("__drop__"), how="left_anti"
    )
    return EDF(kept, schema)


def simhash64(text: Column, k: int = 2) -> Column:
    """64-bit SimHash over word k-shingles: sum +-1 per bit weighted by
    token hash bits, sign -> bit. Pure expressions: for each bit position,
    count tokens with that bit set vs total."""
    sh = shingles(text, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    n = F.size(hashes)

    def bit_expr(i: int) -> Column:
        # bit 63 wraps to the sign bit of a signed 64-bit literal
        bit = (1 << i) - (1 << 64) if i == 63 else (1 << i)
        ones = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(bit)) != 0)
        )
        return F.when(ones * 2 >= n, F.lit(bit)).otherwise(F.lit(0))

    out = F.lit(0).cast("long")
    for i in range(64):
        out = out.bitwiseOR(bit_expr(i))
    return out


def ngram_jaccard(a: Column, b: Column, k: int = 3) -> Column:
    """Exact Jaccard similarity of word k-shingle sets of two strings."""
    sa, sb = shingles(a, k), shingles(b, k)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
