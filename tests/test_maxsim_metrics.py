"""MaxSim late-interaction retrieval (ColBERT) + runtime-metrics
introspection tests."""

import math

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.similarity import maxsim_topk
from eland_spark.plans import shuffle_count

SF = "/root/testdata/sf0.001"


def _py_maxsim(rows, queries):
    """Sequential reference: rows = [(doc, vec)]."""
    docs = {}
    for d, v in rows:
        docs.setdefault(d, []).append(v)
    out = []
    for d, vecs in docs.items():
        s = 0.0
        for q in queries:
            s += max(sum(float(a) * float(b) for a, b in zip(q, v)) for v in vecs)
        out.append((d, round(s, 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def test_maxsim_matches_python_reference(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
        (2, [0.5, 0.5, 0.0]), (2, [0.0, 0.0, 1.0]),
        (3, [-1.0, -1.0, -1.0]),
    ]
    queries = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    sdf = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    got = [(r["id"], r["maxsim"]) for r in
           maxsim_topk(sdf, queries, k=10, group_col="doc_id").collect()]
    assert got == _py_maxsim(rows, queries)
    # doc 2's best token for q0 is [0.5,...] (0.5) and for q1 [0,0,1] (1.0):
    # late interaction picks DIFFERENT tokens per query term
    assert dict(got)[2] == 1.5


def test_maxsim_empty_queries_raise(spark):
    sdf = spark.createDataFrame([(1, [1.0])], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one query vector"):
        maxsim_topk(sdf, [])


def test_maxsim_plan_one_exchange_takeordered(spark):
    """Scale pin: per-token dots are map-only; ONE hash agg on the doc
    key (map-side-combinable max); top-k is TakeOrderedAndProject."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    toks = emb.select((F.col("vec_id") % 50).alias("doc_id"), "embedding")
    out = maxsim_topk(toks, [[0.1] * 64, [0.2] * 64], k=5, group_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert shuffle_count(out) == 1
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode


def test_runtime_metrics_report_executed_plan(spark):
    from eland_spark.plans import metric_total, runtime_metrics

    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderstatus").count()
    )
    n = len(df.collect())  # execute THIS QueryExecution (count() builds
    # a different one whose metrics would stay zero)
    rows = runtime_metrics(df)
    assert any("HashAggregate" in r["node"] for r in rows)
    # the FINAL aggregate emitted exactly the group count
    agg_rows = [
        r["metrics"].get("numOutputRows")
        for r in rows if "HashAggregate" in r["node"]
    ]
    assert n in agg_rows
    assert metric_total(df, "spillSize") == 0  # nothing spilled at sf0.001
    assert metric_total(df, "numOutputRows", "Scan") > 0


def test_heavy_queries_do_not_spill(spark):
    """Runtime twin of the static plan pins: the most expensive
    headline queries must run spill-free at test scale — a partial
    aggregate or sort that spills here would page to disk long before
    100x. Uses the executed plan's own SQL metrics."""
    import importlib.util

    from eland_spark.plans import metric_total

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    queries = m.queries()
    for name in ("pricing_summary", "dsir_select", "cross_near_dup",
                 "frame_order_ops", "eval_auc"):
        df = queries[name](spark, SF)
        df.collect()
        assert metric_total(df, "spillSize") == 0, name
        assert metric_total(df, "numTasksFallBacked") == 0, name
