"""SimHash hamming-radius near-dup: pigeonhole banding must find
EXACTLY the pairs an exhaustive all-pairs scan finds."""

from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.dedup import simhash_frame, simhash_near_dup_pairs

SF = "/root/testdata/sf0.001"


def test_banded_pairs_equal_exhaustive(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    sub = docs.filter(F.col("doc_id") < 200)
    fp = simhash_frame(sub, F.col("text"), F.col("doc_id"), 2)
    l, r = fp.alias("l"), fp.alias("r")
    exhaustive = sorted(
        (row["a"], row["b"])
        for row in (
            l.crossJoin(r)
            .filter(F.col("l.__id__") < F.col("r.__id__"))
            .select(
                F.col("l.__id__").alias("a"),
                F.col("r.__id__").alias("b"),
                F.bit_count(
                    F.col("l.__simhash__").bitwiseXOR(F.col("r.__simhash__"))
                ).alias("h"),
            )
            .filter(F.col("h") <= 3)
            .collect()
        )
    )
    banded = sorted(
        (row["id_a"], row["id_b"])
        for row in simhash_near_dup_pairs(
            sub, F.col("text"), F.col("doc_id"), 2, 3
        ).collect()
    )
    assert banded == exhaustive
    assert len(banded) >= 1  # fixture contains at least one near-dup pair
