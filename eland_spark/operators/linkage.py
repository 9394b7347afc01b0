"""Record linkage: blocked fuzzy string matching with Jaro-Winkler.

No reference analog (eland has no entity-resolution surface); this is
the classic record-linkage primitive — match near-identical short
strings (names, titles, product labels) across two tables without the
O(n*m) cross join.

The similarity is Jaro-Winkler in DUCKDB'S exact variant, pinned
empirically against ``jaro_winkler_similarity`` (0 mismatches over
10k randomized cases, ``tests/test_linkage.py``):

- either string empty -> 0.0 (even both empty); equal strings -> 1.0;
- match window = max(len)/2 - 1, clamped at 0 (NOT floored at 1);
- transpositions = half the matched-but-misaligned count;
- Winkler boost only when jaro > 0.7: ``j + l * 0.1 * (1 - j)`` with
  ``l`` = common prefix capped at 4.

Scale shape: candidates come from RARE-BIGRAM BLOCKING (character
2-grams with document frequency in [2, max_df] — same contract as
``dedup.containment_near_dup_pairs``: bucket sizes bounded by max_df,
so candidate pairs stay linear in input size; pairs sharing only
corpus-common bigrams are missed by design) plus an EXACT length-ratio
prefilter (``jw >= t`` implies ``min_len/max_len >= 3*(t - 0.4)/0.6
- 2``, since matches <= min_len and the boost adds at most
``0.4 * (1 - j)``). Verification is one Arrow-batched pandas UDF over
the surviving candidate pairs only — the documented Python island for
a per-pair O(len^2) algorithm no builtin expresses; everything before
it is hash aggs and hash joins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["jaro_winkler_py", "fuzzy_match_join"]


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Pure-python Jaro-Winkler, bit-compatible with DuckDB's
    ``jaro_winkler_similarity`` (see module docstring for the pinned
    variant choices)."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(n1, n2) // 2 - 1, 0)
    m1 = [False] * n1
    m2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > n2:
            hi = n2
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / n1 + m / n2 + (m - t) / m) / 3.0
    if j <= 0.7:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def _bigram_rows(sdf: DataFrame, col: Column, id_alias: Column):
    """(id, string, bigram) rows — distinct character 2-grams per
    string; 1-char strings block on the char itself so they remain
    matchable."""
    s = F.col("__s__")
    grams = F.when(
        F.length(s) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 1),
                lambda i: s.substr(i, F.lit(2)),
            )
        ),
    ).otherwise(F.array(s))
    base = sdf.select(id_alias.alias("__id__"), col.alias("__s__")).where(
        F.col("__s__").isNotNull() & (F.length("__s__") > 0)
    )
    return base.select(
        "__id__", "__s__", F.explode(grams).alias("__g__")
    )


def fuzzy_match_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.9,
    max_df: int = 50,
) -> DataFrame:
    """Fuzzy equi-join: (left_id, right_id, left string, right string,
    jw) for every cross pair whose rare-bigram-blocked Jaro-Winkler
    similarity, ROUNDED to 6dp, reaches ``threshold``. The rounding is
    the cross-engine contract: the threshold compares the same 6dp
    value on any engine, so a 1-ulp similarity drift can't flip a
    boundary pair. Blocking recall contract: a pair sharing only
    corpus-common bigrams (df > max_df on the combined corpus) is
    missed by design."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    from pyspark.sql.functions import pandas_udf

    lg = _bigram_rows(left, F.col(left_col), F.col(left_id))
    rg = _bigram_rows(right, F.col(right_col), F.col(right_id))
    both = lg.select("__g__").unionAll(rg.select("__g__"))
    dfc = both.groupBy("__g__").agg(F.count(F.lit(1)).alias("df"))
    rare = dfc.where((F.col("df") >= 2) & (F.col("df") <= max_df)).select(
        "__g__"
    )
    cand = (
        lg.join(rare, "__g__")
        .select(
            F.col("__id__").alias("lid"), F.col("__s__").alias("ls"), "__g__"
        )
        .join(
            rg.join(rare, "__g__").select(
                F.col("__id__").alias("rid"),
                F.col("__s__").alias("rs"),
                "__g__",
            ),
            "__g__",
        )
        .select("lid", "ls", "rid", "rs")
        .distinct()
    )
    # exact length-ratio prefilter (see module docstring): jw >= t
    # needs jaro >= (t - 0.4) / 0.6 and jaro <= (min/max + 2) / 3
    jaro_min = (threshold - 0.4) / 0.6
    ratio_min = 3.0 * jaro_min - 2.0
    if ratio_min > 0.0:
        ln, rn = F.length("ls"), F.length("rs")
        cand = cand.where(
            F.least(ln, rn).cast("double") / F.greatest(ln, rn)
            >= F.lit(ratio_min)
        )

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    # nondeterministic marking (the function IS pure) stops the
    # optimizer pushing the threshold filter — and the UDF with it —
    # below the candidate distinct: unmarked, the plan evaluates JW
    # TWICE (once per pre-distinct duplicated candidate row for the
    # filter, once post-distinct for the output column) — the guide
    # §4.4 duplicate-BatchEvalPython pattern, verified in the r8 plan
    _jw = _jw.asNondeterministic()

    return (
        cand.select(
            "lid",
            "rid",
            "ls",
            "rs",
            F.round(_jw(F.col("ls"), F.col("rs")), 6).alias("jw"),
        )
        .where(F.col("jw") >= F.lit(threshold))
    )
