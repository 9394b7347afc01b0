"""MaxSim late-interaction retrieval (ColBERT) + runtime-metrics
introspection tests."""

import math

import pandas as pd
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


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (r7)
# ---------------------------------------------------------------------------

def _hand_mmr(grp, k, lam):
    import math

    rel = [float(x) for x in grp["rel"]]
    ids = list(grp["id"])
    vecs = [list(map(float, v)) for v in grp["vec"]]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    nrm = [math.sqrt(dot(v, v)) for v in vecs]
    pen = [None] * len(ids)
    taken = [False] * len(ids)
    res = []
    for step in range(min(k, len(ids))):
        best = None
        for i in range(len(ids)):
            if taken[i]:
                continue
            p = pen[i] if pen[i] is not None else 0.0
            s = lam * rel[i] - (1 - lam) * p
            if best is None or s > best[0] or (s == best[0] and ids[i] < best[1]):
                best = (s, ids[i], i)
        s, bid, bi = best
        taken[bi] = True
        res.append((bid, s, step + 1))
        for i in range(len(ids)):
            if taken[i]:
                continue
            # engine contract: penalty cosine rounded to 9dp before it
            # feeds the score (cross-engine ulp-drift guard)
            c = (
                round(dot(vecs[i], vecs[bi]) / (nrm[i] * nrm[bi]), 9)
                if nrm[i] > 0 and nrm[bi] > 0
                else 0.0
            )
            if pen[i] is None or c > pen[i]:
                pen[i] = c


    return res


def test_mmr_matches_hand_greedy(spark):
    from eland_spark.operators.similarity import mmr_rerank

    pdf = pd.DataFrame(
        {
            "q": [0] * 5 + [1] * 5,
            "id": [1, 2, 3, 4, 5] * 2,
            "rel": [0.9, 0.85, 0.5, 0.45, 0.4, 0.2, 0.8, 0.75, 0.7, 0.1],
            "vec": [
                [1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [0.5, 0.5], [-1.0, 0.2],
            ] * 2,
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        (r["q"], r["rnk"]): (r["id"], round(r["mmr_score"], 9))
        for r in mmr_rerank(sdf, "q", "id", "rel", "vec", k=4, lam=0.7).collect()
    }
    for q, grp in pdf.groupby("q"):
        for bid, s, rnk in _hand_mmr(grp, 4, 0.7):
            assert got[(q, rnk)] == (bid, round(s, 9))


def test_mmr_lam1_is_pure_relevance_topk(spark):
    from eland_spark.operators.similarity import mmr_rerank

    pdf = pd.DataFrame(
        {
            "q": [0] * 4,
            "id": [4, 3, 2, 1],
            "rel": [0.1, 0.9, 0.9, 0.5],
            "vec": [[1.0, 0.0]] * 4,
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["rnk"], r["id"])
        for r in mmr_rerank(sdf, "q", "id", "rel", "vec", k=3, lam=1.0)
        .orderBy("rnk")
        .collect()
    ]
    # pure relevance, ties -> lowest id
    assert got == [(1, 2), (2, 3), (3, 1)]


def test_mmr_k_exceeds_candidates_and_validation(spark):
    from eland_spark.operators.similarity import mmr_rerank

    pdf = pd.DataFrame(
        {"q": [0, 0], "id": [1, 2], "rel": [0.5, 0.4],
         "vec": [[1.0, 0.0], [0.0, 1.0]]}
    )
    sdf = spark.createDataFrame(pdf)
    assert mmr_rerank(sdf, "q", "id", "rel", "vec", k=10, lam=0.5).count() == 2
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(sdf, "q", "id", "rel", "vec", k=2, lam=1.5)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(sdf, "q", "id", "rel", "vec", k=0, lam=0.5)


def test_mmr_drops_nan_relevance_and_vectors(spark):
    from eland_spark.operators.similarity import mmr_rerank

    pdf = pd.DataFrame(
        {
            "q": [0, 0, 0, 0],
            "id": [1, 2, 3, 4],
            "rel": [float("nan"), 0.9, 0.5, 0.8],
            "vec": [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0],
                    [float("nan"), 1.0]],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["rnk"], r["id"])
        for r in mmr_rerank(sdf, "q", "id", "rel", "vec", k=4, lam=1.0)
        .orderBy("rnk").collect()
    ]
    # ids 1 (NaN rel) and 4 (NaN vector) dropped; pure relevance order
    assert got == [(1, 2), (2, 3)]
