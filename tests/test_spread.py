"""spread_for_compute gate semantics (operators/parallelism.py).

The helper must (a) widen a single-row-group scan to the cluster's
parallelism in front of expensive compute, (b) stay a no-op for plans
whose cardinality or distribution it cannot reason about — filtered
scans, already-shuffled plans, checkpointed sources — and (c) never
change the row multiset.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )


def _partitions(sdf) -> int:
    return sdf.rdd.getNumPartitions()


def test_spread_widens_single_row_group_scan(spark, docs):
    from eland_spark.operators.parallelism import spread_for_compute

    target = spark.sparkContext.defaultParallelism
    assert _partitions(docs) < target  # the bench layout being fixed
    out = spread_for_compute(docs)
    assert _partitions(out) == target


def test_spread_keeps_rows_identical(spark, docs):
    from eland_spark.operators.parallelism import spread_for_compute

    out = spread_for_compute(docs, "doc_id")
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b


@pytest.mark.parametrize(
    "shape",
    ["filter", "aggregate", "join", "repartition", "checkpoint"],
)
def test_spread_skips_unknown_or_shaped_plans(spark, docs, shape):
    from eland_spark.operators.parallelism import spread_for_compute

    if shape == "filter":
        sdf = docs.where(F.col("doc_id") < 10)
    elif shape == "aggregate":
        sdf = docs.groupBy("source").count()
    elif shape == "join":
        sdf = docs.join(docs.select("doc_id"), "doc_id")
    elif shape == "repartition":
        sdf = docs.repartition(2)
    else:
        sdf = docs.localCheckpoint(eager=False)
    out = spread_for_compute(sdf)
    assert out is sdf  # gate declined: plan returned untouched


def test_spread_hash_keys_used(spark, docs):
    from eland_spark.operators.parallelism import spread_for_compute

    out = spread_for_compute(docs, "doc_id")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression" in plan  # hash, not round-robin
