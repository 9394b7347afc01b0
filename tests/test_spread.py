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


def test_bounded_single_task_rows_accepts_bare_scan(spark, docs):
    from eland_spark.operators.parallelism import bounded_single_task_rows

    n = docs.count()
    assert bounded_single_task_rows(docs.select("doc_id"), n + 10) == n
    assert bounded_single_task_rows(docs, n - 1) is None  # over max_rows


@pytest.mark.parametrize("shape", ["explode", "union_same_file", "sample"])
def test_bounded_single_task_rows_rejects_row_multiplying(
    spark, docs, shape
):
    """ADVICE r8 (medium): Generate multiplies rows past the footer
    count, a Union of the SAME file dedups in inputFiles() so two scan
    tasks look like one row group, Sample's surviving count is unknown
    — all must fail the one-task/one-batch proof."""
    from eland_spark.operators.parallelism import bounded_single_task_rows

    if shape == "explode":
        sdf = docs.select(F.explode(F.array("doc_id", "doc_id")).alias("d"))
    elif shape == "union_same_file":
        sdf = docs.unionByName(docs)
    else:
        sdf = docs.sample(0.5, seed=1)
    assert bounded_single_task_rows(sdf, 10**9) is None


def test_bytes_parses_two_letter_suffixes():
    """ADVICE r8 (low): Spark accepts '128mb'; a parse failure was
    silently turning spread_for_compute into a permanent no-op."""
    from eland_spark.operators.parallelism import _bytes

    assert _bytes("128m") == _bytes("128mb") == 128 << 20
    assert _bytes("1g") == _bytes("1GB") == 1 << 30
    assert _bytes("64k") == _bytes("64kb") == 64 << 10
    assert _bytes("4096b") == 4096
    assert _bytes("4096") == 4096


def test_many_tiny_files_use_packing_estimate(spark, tmp_path):
    """ADVICE r8 (low): with a small openCostInBytes many tiny files
    pack into few scan partitions — the estimator must not declare
    len(files) parallel when the packing yields fewer splits."""
    from eland_spark.operators.parallelism import (
        _effective_scan_parallelism,
    )

    spark.range(0, 400).repartition(40).write.mode("overwrite").parquet(
        str(tmp_path / "tiny")
    )
    sdf = spark.read.parquet(str(tmp_path / "tiny"))
    n_files = len(sdf.inputFiles())
    assert n_files >= 32
    old = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        est = _effective_scan_parallelism(sdf, target=32)
        # total bytes of 40 tiny files is far below one 128m split
        assert est is not None and est < n_files
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old)


def test_session_factory_keeps_aqe_on(spark):
    """The lazily-unrolled iterative plans (pagerank, label_propagation,
    bigram_logppl) bound their textual-exchange copies on AQE's stage
    cache executing canonically-equal subtrees once — a session with
    AQE off would recompute them up to 64x. Pin the factory default."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
