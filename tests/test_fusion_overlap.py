"""RRF hybrid-search fusion + n-gram contamination-overlap tests."""

import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.dedup import contamination_overlap
from eland_spark.operators.fusion import rrf_fuse

SF = "/root/testdata/sf0.001"


def test_rrf_matches_hand_computation(spark):
    """Two 3-item lists with one shared doc: the shared doc's fused
    score is 1/(60+rank_a) + 1/(60+rank_b)."""
    a = spark.createDataFrame(
        [(10, 3.0), (11, 2.0), (12, 1.0)], "id long, s double"
    )
    b = spark.createDataFrame(
        [(12, 9.0), (13, 8.0), (14, 7.0)], "id long, s double"
    )
    got = {r["id"]: (r["rrf"], r["n_lists"]) for r in rrf_fuse([a, b]).collect()}
    assert got[12] == (round(1 / 63 + 1 / 61, 6), 2)  # rank 3 in a, 1 in b
    assert got[10] == (round(1 / 61, 6), 1)
    assert got[13] == (round(1 / 62, 6), 1)
    # the doc present in BOTH lists outranks every single-list doc here
    top = max(got, key=lambda i: got[i][0])
    assert top == 12


def test_rrf_tie_breaks_on_id_within_a_list(spark):
    """Equal scores rank by id ascending — deterministic on any engine."""
    a = spark.createDataFrame([(7, 1.0), (3, 1.0)], "id long, s double")
    got = {r["id"]: r["rrf"] for r in rrf_fuse([a]).collect()}
    assert got[3] == round(1 / 61, 6) and got[7] == round(1 / 62, 6)


def test_rrf_input_validation(spark):
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])
    bad = spark.createDataFrame([(1, 1.0, 2.0)], "id long, s double, t double")
    with pytest.raises(ValueError, match="ONE score column"):
        rrf_fuse([bad])


def test_contamination_overlap_fraction_semantics(spark):
    """Half of doc 1's shingles occur in the benchmark -> 0.5; a fully
    contained doc -> 1.0; disjoint -> 0.0; short/empty docs -> 0/0/0."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # shingles (k=2): "a b","b c","c d"
            (2, "x y z"),        # "x y","y z"  (disjoint)
            (3, "a b"),          # single shingle "a b" (contained)
            (4, ""),             # no shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("a b c q",)], "text string")  # "a b","b c","c q"
    f = es.DataFrame(docs, index_cols=("doc_id",))
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["overlap_frac"])
        for r in contamination_overlap(f, bench, "text", "doc_id", k=2).collect()
    }
    assert out[1] == (3, 2, round(2 / 3, 6))
    assert out[2] == (2, 0, 0.0)
    assert out[3] == (1, 1, 1.0)
    assert out[4] == (0, 0, 0.0)


def test_contamination_overlap_counts_distinct_shingles(spark):
    """Repeated shingles count once: 'a b a b a b' has shingles
    {'a b','b a'} -> n_shingles 2."""
    docs = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b",)], "text string")
    f = es.DataFrame(docs, index_cols=("doc_id",))
    r = contamination_overlap(f, bench, "text", "doc_id", k=2).collect()[0]
    assert (r["n_shingles"], r["n_contaminated"]) == (2, 1)
    assert r["overlap_frac"] == 0.5


def test_contamination_overlap_plan_broadcasts_benchmark(spark):
    from eland_spark.plans import broadcast_join_count

    docs = es.read_parquet(spark, f"{SF}/documents.parquet", index_col="doc_id")
    bench = docs.to_spark().filter(F.col("source") == "src2").select("text")
    out = contamination_overlap(docs, bench, "text", "doc_id", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert broadcast_join_count(out) >= 1
    assert "CartesianProduct" not in plan
