"""Stored MinHash index + increment probe (the fuzzy incremental
dedup gate) and its streaming maintenance twin.

Contract: history signed ONCE into (id, sig, keys) rows; tonight's
increment probes those rows without re-shingling history; the
streaming store union-reads to exactly the from-scratch index.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.dedup import (
    minhash_index_rows,
    minhash_probe,
)
from eland_spark.plans import broadcast_join_count

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs before the night ends"),
    (3, "sphinx of black quartz judge my vow under the ancient moon"),
    (4, "how vexingly quick daft zebras jump over the sleeping hound"),
]
INC = [
    # near-dup of doc 1 (one word changed)
    (101, "the quick brown fox jumps over the lazy cat near the river bank"),
    # exact dup of doc 3
    (102, "sphinx of black quartz judge my vow under the ancient moon"),
    # novel
    (103, "completely unrelated sentence about spark shuffle partitions"),
]


def _index(spark, rows):
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_index_rows(sdf, F.col("text"), F.col("doc_id"))


def test_probe_flags_near_and_exact_dups(spark):
    out = {
        r["id"]: (r["near_dup"], r["n_near_matches"], r["max_est_jaccard"])
        for r in minhash_probe(
            _index(spark, INC), _index(spark, DOCS), threshold=0.5
        ).collect()
    }
    assert set(out) == {101, 102, 103}  # every increment id covered
    assert out[102][0] and out[102][2] == 1.0  # exact dup: full agreement
    assert out[101][0]  # near-dup trips the banded match
    assert not out[103][0] and out[103][1] == 0 and out[103][2] == 0.0


def test_probe_does_not_flag_within_increment(spark):
    """Only increment-vs-INDEX pairs count: two identical docs inside
    the increment don't flag each other."""
    inc = _index(spark, [(201, INC[2][1]), (202, INC[2][1])])
    out = minhash_probe(inc, _index(spark, DOCS), threshold=0.5)
    assert out.filter(F.col("near_dup")).count() == 0


def test_probe_broadcasts_increment_not_index(spark):
    """Scale pin: the increment side is the broadcast, the (100 TB)
    index never hash-shuffles by bucket — at least two broadcast
    joins (bucket join + sig re-attach) in the plan."""
    out = minhash_probe(_index(spark, INC), _index(spark, DOCS), threshold=0.5)
    assert broadcast_join_count(out) >= 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_stream_minhash_update_matches_from_scratch(spark, tmp_path):
    """Two micro-batches of index rows union-read to exactly the
    from-scratch index of all ingested docs, and probing the streamed
    store gives the same flags as probing the from-scratch index."""
    from eland_spark.streaming.curation import (
        read_minhash,
        stream_minhash_update,
    )

    src = tmp_path / "src"
    src.mkdir()
    b1 = pd.DataFrame(DOCS[:2], columns=["doc_id", "text"])
    b2 = pd.DataFrame(DOCS[2:], columns=["doc_id", "text"])
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tmp_path / "mh"
    q = stream_minhash_update(
        stream, str(out), str(tmp_path / "ckpt"), "text", "doc_id"
    )
    q.awaitTermination(120)

    streamed = read_minhash(spark, str(out))
    scratch = _index(spark, DOCS)
    key = lambda r: (r["id"], tuple(r["sig"]), tuple(r["keys"]))
    assert {key(r) for r in streamed.collect()} == {
        key(r) for r in scratch.collect()
    }

    inc = _index(spark, INC)
    flags_streamed = sorted(
        map(tuple, minhash_probe(inc, streamed, threshold=0.5).collect())
    )
    flags_scratch = sorted(
        map(tuple, minhash_probe(inc, scratch, threshold=0.5).collect())
    )
    assert flags_streamed == flags_scratch


def test_read_minhash_missing_dir_raises(spark, tmp_path):
    from eland_spark.streaming.curation import read_minhash

    with pytest.raises(FileNotFoundError):
        read_minhash(spark, str(tmp_path / "nope"))
