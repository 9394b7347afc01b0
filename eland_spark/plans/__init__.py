"""Physical-plan inspection & assertions.

The reference's only introspection is ``es_info()`` — a dump of the
resolved ES request body (eland/operations.py:1500-1518). On Spark the
equivalent surface is the Catalyst plan, and at 100 TB the plan IS the
performance contract: filters must reach the parquet scan, projections
must prune columns, small dimension tables must broadcast. This module
turns those properties into testable assertions.
"""

from .inspect import (
    broadcast_join_count,
    metric_total,
    runtime_metrics,
    codegen_stage_count,
    explain_str,
    lint_plan,
    plan_summary,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "plan_summary",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "broadcast_join_count",
    "codegen_stage_count",
    "lint_plan",
    "runtime_metrics",
    "metric_total",
]
