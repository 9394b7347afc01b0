"""Corpus manifest integrity primitive + cluster-quality metrics."""

import math

import pytest
from pyspark.sql import functions as F

from eland_spark.etl import corpus_manifest, verify_manifest
from eland_spark.operators.similarity import cluster_metrics

SF = "/root/testdata/sf0.001"


def test_manifest_is_order_and_partitioning_insensitive(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    a = corpus_manifest(df, by=["o_orderstatus"]).collect()
    b = corpus_manifest(
        df.orderBy(F.desc("o_totalprice")).repartition(7),
        by=["o_orderstatus"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_manifest_detects_single_value_change(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, t string"
    )
    base = corpus_manifest(df)
    mutated = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "id long, t string"
    )
    assert (
        corpus_manifest(mutated).collect()[0]["checksum"]
        != base.collect()[0]["checksum"]
    )
    # duplicate-row PAIR must not cancel (the xor failure mode)
    doubled = df.unionAll(spark.createDataFrame([(2, "b"), (2, "b")], "id long, t string"))
    assert (
        corpus_manifest(doubled).collect()[0]["checksum"]
        != base.collect()[0]["checksum"]
    )


def test_manifest_null_vs_empty_distinct(spark):
    a = spark.createDataFrame([(1, None)], "id long, t string")
    b = spark.createDataFrame([(1, "")], "id long, t string")
    assert (
        corpus_manifest(a).collect()[0]["checksum"]
        != corpus_manifest(b).collect()[0]["checksum"]
    )


def test_verify_manifest_statuses(spark):
    old = spark.createDataFrame(
        [("x", 1, "a"), ("x", 2, "b"), ("y", 3, "c"), ("z", 4, "d")],
        "g string, id long, t string",
    )
    new = spark.createDataFrame(
        [("x", 1, "a"), ("x", 2, "b"),        # unchanged
         ("y", 3, "CHANGED"),                 # same count, new content
         ("w", 9, "new")],                    # new group; z removed
        "g string, id long, t string",
    )
    stored = corpus_manifest(old, by=["g"])
    got = {
        r["g"]: r["status"]
        for r in verify_manifest(new, stored, by=["g"]).collect()
    }
    assert got == {"x": "ok", "y": "changed", "z": "removed", "w": "added"}


def test_manifest_portable_matches_duckdb(spark):
    import duckdb

    df = spark.read.parquet(f"{SF}/nation.parquet")
    got = corpus_manifest(df, cols=["n_nationkey", "n_name"]).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF}/nation.parquet')"
    )
    exp = con.execute(
        "SELECT count(*), CAST(sum(CAST(('0x' || substr(md5("
        "concat_ws(chr(31), COALESCE(CAST(n_nationkey AS VARCHAR), chr(0)), "
        "COALESCE(n_name, chr(0)))), 1, 15)) AS BIGINT)) AS VARCHAR) "
        "FROM nation"
    ).fetchone()
    assert (got["n_rows"], got["checksum"]) == exp


def test_cluster_metrics_hand_case(spark):
    """Two tight clusters around (0,0) and (10,0): every point's own
    distance is 1, other distance ~9/11 -> silhouette (b-1)/b."""
    pts = [([0.0, 1.0],), ([0.0, -1.0],), ([10.0, 1.0],), ([10.0, -1.0],)]
    sdf = spark.createDataFrame(pts, "embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 0.0]]
    out = {r["cell"]: r for r in cluster_metrics(sdf, cents).collect()}
    for cell in (0, 1):
        assert out[cell]["n"] == 2
        assert out[cell]["inertia"] == 2.0  # two points at squared dist 1
        b = math.sqrt(101.0)
        assert out[cell]["silhouette"] == round((b - 1.0) / b, 6)


def test_cluster_metrics_tie_goes_to_lowest_cell(spark):
    sdf = spark.createDataFrame([([5.0],)], "embedding array<double>")
    out = cluster_metrics(sdf, [[0.0], [10.0]]).collect()
    assert [r["cell"] for r in out] == [0]
    assert out[0]["silhouette"] == 0.0  # equidistant -> (b-a)/max = 0


def test_cluster_metrics_needs_two_centroids(spark):
    sdf = spark.createDataFrame([([1.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 centroids"):
        cluster_metrics(sdf, [[0.0]])


def test_cluster_metrics_plan_one_exchange(spark):
    from eland_spark.plans import shuffle_count

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    out = cluster_metrics(emb, cents)
    assert shuffle_count(out) <= 2  # cell agg + the output sort
    assert "CartesianProduct" not in out._jdf.queryExecution().executedPlan().toString()
