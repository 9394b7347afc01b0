"""Graph operators (operators/graph.py): PageRank vs a dense numpy
power iteration, dangling-mass semantics, degree stats."""

import numpy as np
import pandas as pd
import pytest

from eland_spark.operators.graph import degrees, pagerank


def _np_pagerank(edge_list, iterations, damping, redistribute=True):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in set(edge_list):
        out[ix[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u, v in set(edge_list):
            nxt[ix[v]] += r[ix[u]] / out[ix[u]]
        dang = r[out == 0].sum() if redistribute else 0.0
        r = (1 - damping) / n + damping * (nxt + dang / n)
    return {nodes[i]: r[i] for i in range(n)}


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
DANGLING = [("a", "b"), ("b", "c"), ("c", "d")]  # d has no out-edges


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))


def test_pagerank_matches_numpy(spark, edge_df):
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=5, damping=0.85).collect()}
    want = _np_pagerank(EDGES, 5, 0.85)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_dangling_redistribute_conserves_mass(spark):
    df = spark.createDataFrame(pd.DataFrame(DANGLING, columns=["src", "dst"]))
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=4, damping=0.85).collect()}
    want = _np_pagerank(DANGLING, 4, 0.85, redistribute=True)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_dangling_ignore_leaks_mass(spark):
    df = spark.createDataFrame(pd.DataFrame(DANGLING, columns=["src", "dst"]))
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=4, damping=0.85,
                             dangling="ignore").collect()}
    want = _np_pagerank(DANGLING, 4, 0.85, redistribute=False)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) < 1.0  # mass leaked through the dangling node


def test_multi_edges_count_once(spark):
    df = spark.createDataFrame(
        pd.DataFrame(EDGES + EDGES, columns=["src", "dst"])
    )
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=3, damping=0.85).collect()}
    want = _np_pagerank(EDGES, 3, 0.85)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_deep_iteration_converges(spark, edge_df):
    """K=25 exercises the per-round lineage truncation (without it the
    dangling branch makes the plan 2^K); ranks settle to a fixed point
    that still sums to 1."""
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=25).collect()}
    want = _np_pagerank(EDGES, 25, 0.85)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-10)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_validation(spark, edge_df):
    with pytest.raises(ValueError):
        pagerank(edge_df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(edge_df, dangling="drop")


def test_degrees(spark, edge_df):
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degrees(edge_df).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 3), "d": (1, 0)}
