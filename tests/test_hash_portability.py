"""The fast xxhash64 dedup path and the md5-portable path must detect
the SAME near-dup structure.

This is the soundness condition under which the fast-path driver
queries (minhash_near_dup, near_dup_components) carry a full DuckDB
oracle built from the portable pipeline: per-pair jaccard ESTIMATES are
hash-dependent, but true near-dups sit far above the detection
threshold and true non-dups far below it, so the thresholded pair set
— and everything derived from it, like connected components — is
hash-independent. If a data change ever breaks that margin, these
tests fail before the driver's oracle gate does.

Reference parity: the reference has no near-dup operators at all
(net-new LLM-curation surface); semantics follow Broder's MinHash and
the standard LSH banding construction.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    import eland_spark as es

    return es.read_parquet(
        spark, f"{SF_DIR}/documents.parquet", index_col=["doc_id"]
    )


def test_minhash_pair_set_is_hash_independent(docs):
    from eland_spark.operators.dedup import minhash_candidate_pairs

    def pair_set(portable):
        pairs = minhash_candidate_pairs(
            docs, "text", "doc_id", k=3, num_hashes=64, bands=16,
            portable=portable,
        )
        return {
            (r["id_a"], r["id_b"])
            for r in pairs.filter(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b")
            .collect()
        }

    fast, portable = pair_set(False), pair_set(True)
    assert fast == portable, (
        f"thresholded pair sets diverged: fast-only={fast - portable}, "
        f"portable-only={portable - fast}"
    )
    assert fast, "empty pair set — the fixture no longer contains near-dups"


def test_components_are_hash_independent(docs):
    from eland_spark.operators.dedup import near_dup_components

    def comp(portable):
        out = near_dup_components(
            docs, "text", "doc_id", threshold=0.6, portable=portable
        )
        return {(r["node"], r["component"]) for r in out.collect()}

    fast, portable = comp(False), comp(True)
    assert fast == portable
    assert fast
