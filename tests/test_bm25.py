"""BM25 ranked retrieval: Lucene-formula differential + plan pins.

The reference's es_match (eland/dataframe.py) compiles a boolean match
filter; Elasticsearch ranks those matches with Okapi BM25
(Lucene BM25Similarity). bm25_topk supplies the ranking: these tests
pin the exact Lucene formula against a sequential python reference and
the zero-exchange / TakeOrdered plan shape.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.text import bm25_topk
from eland_spark.plans import shuffle_count

SF = "/root/testdata/sf0.001"


def _py_bm25(rows, query, k1=1.2, b=0.75):
    """Sequential reference: dict-of-token-counts BM25."""
    terms = list(dict.fromkeys(
        w for w in re.split(r"[^a-z0-9]+", query.lower()) if w
    ))
    docs = []
    for doc_id, text in rows:
        toks = [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]
        docs.append((doc_id, toks))
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    dfs = {w: sum(1 for _, t in docs if w in t) for w in terms}
    out = []
    for doc_id, toks in docs:
        dl = len(toks)
        s = 0.0
        for w in terms:
            tf = float(toks.count(w))
            idf = math.log(1.0 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + (b / avgdl) * dl))
        if round(s, 6) > 0:
            out.append((doc_id, round(s, 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def test_bm25_matches_python_reference(spark):
    rows = [
        (1, "spark shuffles data between stages"),
        (2, "the window agg runs after the shuffle"),
        (3, "spark spark spark window"),
        (4, "nothing relevant here at all"),
        (5, "agg agg agg agg agg agg agg agg"),
        (6, ""),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["id"], r["bm25"])
        for r in bm25_topk(sdf, "text", "doc_id", "spark window agg", k=10).collect()
    ]
    assert got == _py_bm25(rows, "spark window agg")


def test_bm25_saturates_with_tf(spark):
    """k1 saturation: 8 repeats must score below 8x a single hit."""
    rows = [(1, "agg"), (2, "agg " * 8), (3, "x y z")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["bm25"] for r in
           bm25_topk(sdf, "text", "doc_id", "agg", k=3).collect()}
    assert got[2] > got[1]
    assert got[2] < 8 * got[1]


def test_bm25_length_normalization(spark):
    """b: same tf, longer doc scores lower."""
    rows = [(1, "agg " + "pad " * 40), (2, "agg")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["bm25"] for r in
           bm25_topk(sdf, "text", "doc_id", "agg", k=2).collect()}
    assert got[2] > got[1]


def test_bm25_digit_terms_and_dedup(spark):
    """Regression pin: digit-bearing query terms ride through the
    arity-1 HOF closure (a 2-arg lambda would bind the array index and
    die casting tokens to bigint); duplicate query terms count once."""
    rows = [(1, "error 404 not found"), (2, "code 200 ok"), (3, "404 404")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    once = bm25_topk(sdf, "text", "doc_id", "404", k=3).collect()
    twice = bm25_topk(sdf, "text", "doc_id", "404 404", k=3).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]
    assert {r["id"] for r in once} == {1, 3}


def test_bm25_no_terms_raises(spark):
    sdf = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no indexable terms"):
        bm25_topk(sdf, "text", "doc_id", "!!! ???")


def test_bm25_empty_corpus_empty_result(spark):
    sdf = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(sdf, "text", "doc_id", "spark").collect() == []
    # all-empty texts: avgdl is 0 -> same guarded empty path
    sdf2 = spark.createDataFrame([(1, ""), (2, "")], "doc_id long, text string")
    assert bm25_topk(sdf2, "text", "doc_id", "spark").collect() == []


def test_bm25_plan_zero_exchanges_takeordered(spark):
    """Scale contract: the score pass is map-only into a per-partition
    top-k heap (TakeOrderedAndProject) — no exchange of row data, no
    global sort, at any corpus size. (The stats pass is a separate
    scalar aggregation that has already run at build time.)"""
    sdf = spark.read.parquet(f"{SF}/documents.parquet")
    out = bm25_topk(sdf, "text", "doc_id", "spark window agg", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(out) == 0
    assert "Generate" not in plan  # no explode anywhere
