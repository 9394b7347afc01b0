"""Privacy audits for training-data release: k-anonymity and
l-diversity over quasi-identifier columns, plus the suppression
transform that enforces them.

No reference analog (eland has no privacy surface); this is the
pre-release gate a dataset curation pipeline runs before publishing
corpora with user-derived columns: every equivalence class over the
quasi-identifiers (the column combination an adversary could link on)
must contain at least ``k`` records (k-anonymity, Sweeney 2002), and —
when a sensitive column is named — at least ``l`` distinct sensitive
values (distinct l-diversity, Machanavajjhala et al. 2007), or the
class's records are suppressed.

Scale shape: ONE hash aggregation to the equivalence-class table
(class-count + distinct-sensitive per class — map-side combinable;
the class table is as small as the quasi-identifier cardinality), and
suppression is one hash semi/anti-join of the data against the
violating classes. No windows, no driver state, null quasi values
form their own classes (pandas-groupby dropna=False semantics —
nulls are linkable too).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "suppress_small_classes"]


def k_anonymity_audit(
    sdf: DataFrame,
    quasi_cols: "Sequence[str] | str",
    sensitive_col: "str | None" = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Equivalence-class audit table: one row per distinct
    quasi-identifier combination with ``class_size``,
    ``is_k_anonymous`` (class_size >= k) and — when ``sensitive_col``
    is given — ``l_diversity`` (exact distinct count of sensitive
    values, nulls excluded per countDistinct semantics) and
    ``is_l_diverse`` (l_diversity >= l). A dataset is k-anonymous iff
    every row of this table has ``is_k_anonymous``."""
    quasi = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    if not quasi:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1 or l < 1:
        raise ValueError("k and l must be >= 1")
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("long").alias(
                "l_diversity"
            )
        )
    out = sdf.groupBy(*quasi).agg(*aggs)
    cols = [
        *quasi,
        "class_size",
        (F.col("class_size") >= k).alias("is_k_anonymous"),
    ]
    if sensitive_col is not None:
        cols += ["l_diversity", (F.col("l_diversity") >= l).alias("is_l_diverse")]
    return out.select(*cols)


def suppress_small_classes(
    sdf: DataFrame,
    quasi_cols: "Sequence[str] | str",
    sensitive_col: "str | None" = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Enforcement transform: drop every row whose quasi-identifier
    equivalence class violates k-anonymity (or l-diversity when a
    sensitive column is named) — record suppression, the simplest
    release-safe policy (generalization hierarchies are a modeling
    choice left to the caller). One aggregation + one hash semi-join
    on the quasi columns; null-safe on null quasi values."""
    quasi = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    audit = k_anonymity_audit(sdf, quasi, sensitive_col, k, l)
    ok = F.col("is_k_anonymous")
    if sensitive_col is not None:
        ok = ok & F.col("is_l_diverse")
    keep = audit.where(ok).select(*quasi)
    cond = [sdf[c].eqNullSafe(keep[c]) for c in quasi]
    return sdf.join(keep, cond, "left_semi")
