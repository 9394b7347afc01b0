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


def _np_pagerank_ext(edge_list, iterations, damping, weights=None,
                     seeds=None):
    """Weighted/personalized dense reference."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list}
                   | (set(seeds) if seeds else set()))
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = {}
    for idx, (u, v) in enumerate(edge_list):
        w[(u, v)] = w.get((u, v), 0.0) + (
            weights[idx] if weights is not None else 0.0
        )
    if weights is None:
        w = {e: 1.0 for e in set(edge_list)}
    out = np.zeros(n)
    for (u, _), wt in w.items():
        out[ix[u]] += wt
    if seeds:
        p = np.zeros(n)
        for s in seeds:
            p[ix[s]] = 1.0 / len(seeds)
    else:
        p = np.full(n, 1.0 / n)
    r = p.copy()
    for _ in range(iterations):
        nxt = np.zeros(n)
        for (u, v), wt in w.items():
            nxt[ix[v]] += r[ix[u]] * wt / out[ix[u]]
        dang = r[out == 0].sum()
        r = (1 - damping) * p + damping * (nxt + dang * p)
    return {nodes[i]: r[i] for i in range(n)}


def test_weighted_pagerank_matches_numpy(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "b")]
    wts = [1.0, 3.0, 2.0, 1.0, 1.0]  # duplicate (a,b) rows sum to 2.0
    pdf = pd.DataFrame(
        [(u, v, w) for (u, v), w in zip(edges, wts)],
        columns=["src", "dst", "w"],
    )
    df = spark.createDataFrame(pdf)
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=4, weight="w").collect()}
    want = _np_pagerank_ext(edges, 4, 0.85, weights=wts)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_weighted_drops_nonpositive(spark):
    pdf = pd.DataFrame(
        [("a", "b", 1.0), ("a", "c", 0.0), ("b", "a", None)],
        columns=["src", "dst", "w"],
    )
    df = spark.createDataFrame(pdf)
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=2, weight="w").collect()}
    # only the (a, b) edge survives; c stays in the graph as a dst
    want = _np_pagerank_ext([("a", "b")], 2, 0.85, weights=[1.0],
                            seeds=None)
    # c participates only via its dst appearance in the raw edge set —
    # it is dropped with its zero-weight edge, like a never-linked page
    assert set(got) == {"a", "b"}
    want = _np_pagerank_ext([("a", "b")], 2, 0.85, weights=[1.0])
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_personalized_pagerank_matches_numpy(spark, edge_df):
    seeds = ["a", "d"]
    sdf = spark.createDataFrame(pd.DataFrame({"node": seeds}))
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=5,
                             personalized=sdf).collect()}
    want = _np_pagerank_ext(EDGES, 5, 0.85, seeds=seeds)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # teleport mass concentrates on/near the seeds
    assert got["a"] > got["b"]


def test_personalized_seed_outside_graph(spark, edge_df):
    sdf = spark.createDataFrame(pd.DataFrame({"node": ["zzz"]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=3,
                             personalized=sdf).collect()}
    # the orphan seed holds all teleport mass and leaks nothing back
    want = _np_pagerank_ext(EDGES, 3, 0.85, seeds=["zzz"])
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pagerank_tol_converges_to_fixed_point(spark, edge_df):
    """VERDICT r4 #4: tol= early-exit. The converged ranks must match
    the numpy fixed point (200 rounds) to well under tol, stop before
    the iteration cap, and conserve mass."""
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=100, damping=0.85,
                             tol=1e-10).collect()}
    want = _np_pagerank(EDGES, 200, 0.85)  # effectively the fixed point
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_tol_stops_early(spark, edge_df):
    """tol large enough to trip after round 1 must equal a 1-round
    fixed-K run (early exit returns THAT round's ranks, not the cap's)."""
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=50, damping=0.85,
                             tol=10.0).collect()}
    want = {r["node"]: r["rank"]
            for r in pagerank(edge_df, iterations=1, damping=0.85).collect()}
    assert got == want


def test_pagerank_tol_fixed_k_unchanged(spark, edge_df):
    """tol=None (the oracle path) is byte-identical to before: matches
    the fixed-K numpy replay exactly."""
    got = {r["node"]: r["rank"]
           for r in pagerank(edge_df, iterations=3, damping=0.85,
                             tol=None).collect()}
    want = _np_pagerank(EDGES, 3, 0.85)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


# ---------------------------------------------------------------- r8: LPA

def _ref_lpa(edges, iterations, seeds=None, fixed=True):
    """Pure-python synchronous LPA: max neighbor-label count, ties to
    the smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = set(adj)
    if seeds:
        nodes |= set(seeds)
    lab = {
        n: (seeds.get(n) if seeds else n) if (seeds is None or n in seeds)
        else None
        for n in nodes
    }
    if seeds is None:
        lab = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            cnt = Counter(
                lab[m] for m in adj[n] if lab.get(m) is not None
            )
            if cnt:
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[n] = best[0]
            else:
                new[n] = lab[n]
            if seeds and fixed and n in seeds:
                new[n] = seeds[n]
        lab = new
    return lab


def test_label_propagation_matches_reference(spark):
    import random

    from eland_spark.operators.graph import label_propagation

    rng = random.Random(4)
    # two dense blobs + a sparse bridge
    edges = []
    for base in (0, 100):
        members = list(range(base, base + 12))
        for _ in range(40):
            u, v = rng.sample(members, 2)
            edges.append((u, v))
    edges.append((5, 105))
    sdf = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(sdf, iterations=iters).collect()
        }
        assert got == _ref_lpa(edges, iters), iters
    # 3 rounds: the two blobs agree internally on different labels
    got = {
        r["node"]: r["label"]
        for r in label_propagation(sdf, iterations=3).collect()
    }
    blob_a = {got[n] for n in range(0, 12)}
    blob_b = {got[n] for n in range(100, 112)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_label_propagation_seeded_spread(spark):
    import pandas as pd

    from eland_spark.operators.graph import label_propagation

    # path 1-2-3-4-5; seeds: node 1 -> 10, node 5 -> 20
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sdf = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame(
        pd.DataFrame({"node": [1, 5], "label": [10, 20]})
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            sdf, iterations=2, seeds=seeds
        ).collect()
    }
    want = _ref_lpa(edges, 2, seeds={1: 10, 5: 20})
    assert got == want
    # seeds stay clamped
    assert got[1] == 10 and got[5] == 20
    # after 2 rounds labels reached distance-2 nodes
    assert got[2] == 10 and got[4] == 20


def test_random_walks_deterministic_and_valid(spark):
    import hashlib

    from eland_spark.operators.graph import random_walks

    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (5, 6)]  # 6 is a sink
    sdf = spark.createDataFrame(edges, "src long, dst long")
    starts = spark.createDataFrame([(1,), (5,), (6,)], "n long")
    out = random_walks(sdf, starts, length=3, seed=9).toPandas()

    def key(node, step, v, seed=9):
        s = f"{node}|{step}|{v}{seed}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)

    def ref_walk(start, length):
        path = [(0, start)]
        cur = start
        for step in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v: key(cur, step, v))
            path.append((step, cur))
        return path

    got = {
        w: sorted(
            (int(r["step"]), int(r["node"]))
            for _, r in grp.iterrows()
        )
        for w, grp in out.groupby("walk")
    }
    assert got[1] == ref_walk(1, 3)
    assert got[5] == ref_walk(5, 3)
    # sink start: only step 0
    assert got[6] == [(0, 6)]
    # deterministic across plans
    again = random_walks(sdf, starts, length=3, seed=9).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )
