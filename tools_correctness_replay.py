"""Replay the driver's full correctness pass over EVERY queries() entry
(VERDICT r5 #2): the driver samples only ~50 queries per round, so most
entries rest on the in-repo pytest gate alone. This tool runs the
driver's exact recipe (rows + schema + value/dtype hash, shared via
``driver_gate.py``) over all entries at sf0.01 and writes the summary
to ``CORRECTNESS_FULL.json`` at the repo root — committed per round so
a future driver sample cannot surface a first-time mismatch class.

Usage: python tools_correctness_replay.py [--only name1,name2]
Exit code 0 iff every oracle-backed entry hash-matches and every
rows-only entry runs without error.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from driver_gate import SF_DIR, connect_duck, driver_check  # noqa: E402


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.queries()
    oracles = entry.oracle_sql()

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    import eland_spark as es

    spark = es.get_session("eland_spark_correctness_replay")
    duck = connect_duck()

    results: dict[str, dict] = {}
    failed: list[str] = []
    t_start = time.perf_counter()
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        try:
            spark_pdf = queries[name](spark, SF_DIR).toPandas()
            if name in oracles:
                duck_pdf = duck.execute(oracles[name]).df()
                rec = driver_check(name, spark_pdf, duck_pdf)
            else:
                # rows-only contract for non-SQL-expressible ops (the
                # driver records the same weaker check)
                rec = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(spark_pdf),
                    "oracle_rows": None,
                    "err": None,
                    "rows_only": True,
                }
        except Exception as e:  # noqa: BLE001 — per-query isolation
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}",
            }
            traceback.print_exc(file=sys.stderr)
        results[name] = rec
        ok = rec.get("hash_match") is not False and rec.get("err") is None
        if not ok:
            failed.append(name)
        print(
            f"  {name}: {'PASS' if ok else 'FAIL'}"
            + (" (rows-only)" if rec.get("rows_only") else ""),
            file=sys.stderr,
        )

    elapsed = round(time.perf_counter() - t_start, 1)
    n_hash = sum(1 for r in results.values() if r.get("hash_match") is True)
    n_rows_only = sum(1 for r in results.values() if r.get("rows_only"))
    summary = {
        "n_queries": len(results),
        "n_hash_match": n_hash,
        "n_rows_only": n_rows_only,
        "n_failed": len(failed),
        "failed": failed,
        "sf_dir": SF_DIR,
        "elapsed_sec": elapsed,
        "recipe": "driver_gate.driver_check (rows+schema+value/dtype hash)",
    }
    if only is None:
        with open(os.path.join(REPO, "CORRECTNESS_FULL.json"), "w") as f:
            json.dump({"summary": summary, "queries": results}, f,
                      indent=1, sort_keys=True)
            f.write("\n")
    print(json.dumps(summary))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
