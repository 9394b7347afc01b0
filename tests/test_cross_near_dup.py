"""Semantics tests for cross-corpus near-dup decontamination
(operators/dedup.cross_near_dup_flags)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.frame import DataFrame as EDF
from eland_spark.operators.dedup import cross_near_dup_flags

REF_TEXT = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the quiet hills and the river keeps flowing north"
)
PARA_TEXT = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the quiet hills and the river keeps flowing south"
)
OTHER_TEXT = (
    "completely unrelated content about database engines partitioning "
    "strategies shuffle exchanges and columnar storage formats"
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [REF_TEXT, PARA_TEXT, OTHER_TEXT],
        }
    )
    return EDF(spark.createDataFrame(pdf), index_cols=("doc_id",))


@pytest.fixture(scope="module")
def reference(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [REF_TEXT]})
    )


def test_exact_and_near_flagged_distinct_not(spark, corpus, reference):
    out = (
        cross_near_dup_flags(corpus, reference, "text", "doc_id", threshold=0.5)
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3}
    # identical doc: every signature position agrees
    assert by_id[1].contaminated and by_id[1].max_est_jaccard == 1.0
    # one-word paraphrase: flagged with high (but < 1) estimated Jaccard
    assert by_id[2].contaminated and 0.5 <= by_id[2].max_est_jaccard < 1.0
    # unrelated doc: not flagged, zero matches
    assert not by_id[3].contaminated
    assert by_id[3].n_near_matches == 0 and by_id[3].max_est_jaccard == 0.0


def test_portable_mode_matches_fast_path_flags(spark, corpus, reference):
    fast = {
        r.doc_id: r.contaminated
        for r in cross_near_dup_flags(
            corpus, reference, "text", "doc_id", threshold=0.5
        ).collect()
    }
    port = {
        r.doc_id: r.contaminated
        for r in cross_near_dup_flags(
            corpus, reference, "text", "doc_id", threshold=0.5, portable=True
        ).collect()
    }
    # hash family changes the estimate, not the verdict on this spread
    assert fast == port


def test_reference_side_is_broadcast(spark, corpus, reference):
    plan = (
        cross_near_dup_flags(corpus, reference, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_near_dup_keep_best_policy(spark):
    from eland_spark.operators.dedup import near_dup_keep_best

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [REF_TEXT, PARA_TEXT, OTHER_TEXT, REF_TEXT + " extra tail"],
            "score": [10.0, 50.0, 1.0, 50.0],
        }
    )
    f = EDF(spark.createDataFrame(pdf), index_cols=("doc_id",))
    kept = near_dup_keep_best(f, "text", "doc_id", "score", threshold=0.5)
    ids = sorted(r.doc_id for r in kept.to_spark().collect())
    # docs 1/2/4 cluster; best score ties 2 vs 4 -> lowest id 2 wins;
    # doc 3 is unpaired and survives
    assert ids == [2, 3]

    pdf2 = pdf.assign(doc_id=pdf.doc_id.astype(str))
    f2 = EDF(spark.createDataFrame(pdf2), index_cols=("doc_id",))
    with pytest.raises(ValueError, match="numeric id"):
        near_dup_keep_best(f2, "text", "doc_id", "score")
