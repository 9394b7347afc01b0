"""Dump `.explain("formatted")` for named queries() entries into
plans/r09/<query>_<tag>.txt — the before/after evidence files the
optimization round commits alongside OPTIMIZATION_r09.md.

    python tools_explain.py before pricing_summary dup_spans ...
    python tools_explain.py after  pricing_summary

Runs at sf0.001 by default (plan SHAPE is scale-invariant; only sizes
change) — override with SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import importlib.util
import os
import sys

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    here = os.path.dirname(os.path.abspath(__file__))
    out_dir = os.path.join(here, "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(here, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    import eland_spark as es

    spark = es.get_session("dump_explain")
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, SF)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
