"""Parse `df.explain` output into checkable facts.

Used by tests to pin the scale-critical plan properties (predicate
pushdown, column pruning, broadcast joins, shuffle counts) so a
refactor that silently degrades the plan fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for row-group pruning."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each scan actually reads (column pruning check):
    one list per scan node."""
    text = explain_str(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        scans.append([p.split(":")[0].strip() for p in body.split(",") if p.strip()])
    return scans


def shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchange nodes in the plan — each repartitions its whole
    input. Counts unique node ids from the formatted detail section, so
    the tree header line isn't double-counted; BroadcastExchange is
    excluded (that's a broadcast, not a shuffle)."""
    return len(set(re.findall(r"\((\d+)\) Exchange\b", explain_str(df))))


def broadcast_join_count(df: DataFrame) -> int:
    return len(
        set(
            re.findall(
                r"\((\d+)\) (?:BroadcastHashJoin|BroadcastNestedLoopJoin)",
                explain_str(df),
            )
        )
    )


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans — wider is better (fewer interpreter
    boundaries). Formatted explain tags member operators with
    ``[codegen id : N]``; simple mode uses ``WholeStageCodegen (N)``."""
    text = explain_str(df)
    ids = set(re.findall(r"codegen id : (\d+)", text))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    return len(ids)


def plan_summary(df: DataFrame) -> dict:
    """One-call dashboard of the scale-critical plan facts."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema_columns(df),
        "shuffles": shuffle_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "codegen_stages": codegen_stage_count(df),
    }
