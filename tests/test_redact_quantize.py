"""Text redaction + int8 embedding quantization operators."""

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.similarity import (
    cosine,
    dequantize_embedding,
    quantize_embedding,
)
from eland_spark.operators.text import redact, redaction_counts

SF = "/root/testdata/sf0.001"


def test_redact_patterns(spark):
    rows = [
        ("a", "mail bob@x.com call 212-555-1234"),
        ("b", "ip 10.0.0.1 ssn 123-45-6789 card 4111 1111 1111 1111"),
        ("c", "clean text"),
    ]
    sdf = spark.createDataFrame(rows, "id string, text string")
    out = {
        r["id"]: r["r"] for r in sdf.select("id", redact(F.col("text")).alias("r")).collect()
    }
    assert "[EMAIL]" in out["a"] and "[PHONE]" in out["a"] and "bob@" not in out["a"]
    assert "[IPV4]" in out["b"] and "[SSN]" in out["b"] and "[CREDIT_CARD]" in out["b"]
    assert out["c"] == "clean text"
    counts = sdf.agg(
        *[
            F.sum(v).alias(k)
            for k, v in redaction_counts(F.col("text")).items()
        ]
    ).collect()[0]
    assert counts["EMAIL"] == 1 and counts["SSN"] == 1
    # custom patterns override the defaults
    got = sdf.select(
        redact(F.col("text"), {"NUM": r"\d+"}).alias("r")
    ).collect()[0]["r"]
    assert "[NUM]" in got and "[EMAIL]" not in got


def test_quantize_roundtrip_bounds(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.select("embedding", quantize_embedding(F.col("embedding")).alias("qe"))
    rt = q.select(
        "embedding",
        dequantize_embedding(F.col("qe")).alias("de"),
        F.col("qe.scale").alias("scale"),
    )
    row = rt.select(
        F.max(
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("de"), lambda a, b: F.abs(a - b)),
                F.lit(0.0).cast("float"),
                lambda acc, x: F.greatest(acc, x),
            )
            / F.col("scale")
        ).alias("err"),
        F.min(cosine(F.col("embedding"), F.col("de"))).alias("min_cos"),
    ).collect()[0]
    assert row["err"] <= 0.5 + 1e-6  # per-component error bounded by scale/2
    assert row["min_cos"] > 0.995  # int8 preserves cosine structure
    # zero vector -> scale 1.0, all-zero codes
    z = spark.createDataFrame([([0.0, 0.0],)], "embedding array<float>")
    r = z.select(quantize_embedding(F.col("embedding")).alias("qe")).collect()[0]["qe"]
    assert r["scale"] == 1.0 and list(r["q"]) == [0, 0]


def test_ivf_quantized_topk_recall(spark):
    import eland_spark as es
    from eland_spark.operators.similarity import (
        _vec_lit,
        cosine,
        ivf_index,
        ivf_quantized_topk,
    )

    emb = es.read_parquet(spark, f"{SF}/embeddings.parquet", index_col="vec_id")
    qrow = emb.to_spark().filter(F.col("vec_id") == 3).collect()[0]
    qv = [float(x) for x in qrow["embedding"]]
    cents = ivf_index(emb, n_cells=8)
    got = ivf_quantized_topk(emb, qv, cents, k=10, nprobe=3).collect()
    got_ids = [r["id"] for r in got]
    exact = (
        emb.to_spark()
        .withColumn("cos", cosine(F.col("embedding"), _vec_lit(qv)))
        .orderBy(F.desc("cos"), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    exact_ids = [r["vec_id"] for r in exact]
    assert 3 in got_ids  # self-match survives quantization
    assert len(set(got_ids) & set(exact_ids)) >= 6  # recall@10 >= 0.6
    # reranked scores are full-precision
    em = {r["vec_id"]: r["cos"] for r in exact}
    for r in got:
        if r["id"] in em:
            assert abs(r["cos"] - em[r["id"]]) < 1e-9


def test_ivf_index_lloyd_matches_local_numpy(spark, sf_dir):
    """The Arrow-partial-reduce Lloyd path must reproduce a local
    single-process numpy Lloyd run (same seeds, same subtract-square
    assignment, same mean update) to float tolerance."""
    import numpy as np

    import eland_spark as es
    from eland_spark.operators.similarity import ivf_index

    emb = es.read_parquet(spark, f"{sf_dir}/embeddings.parquet", index_col="vec_id")
    got = ivf_index(emb, n_cells=4, max_iter=2, seed_strategy="first")

    rows = (
        emb.to_spark().select("vec_id", "embedding").orderBy("vec_id").collect()
    )
    X = np.stack([r.embedding for r in rows]).astype(np.float64)
    C = X[:4].copy()
    for _ in range(2):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        cells = d.argmin(axis=1)
        for c in range(4):
            if (cells == c).any():
                C[c] = X[cells == c].mean(axis=0)
    assert np.allclose(np.asarray(got), C, atol=1e-9)


def test_pq_recall_and_determinism(spark, sf_dir):
    import numpy as np

    import eland_spark as es
    from eland_spark.operators.similarity import (
        cosine_topk, pq_encode, pq_topk, pq_train,
    )
    from pyspark.sql import functions as F

    emb = es.read_parquet(spark, f"{sf_dir}/embeddings.parquet", index_col="vec_id")
    books = pq_train(emb, m=8, k=16, max_iter=3, seed_strategy="first")
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    # deterministic training
    books2 = pq_train(emb, m=8, k=16, max_iter=3, seed_strategy="first")
    assert books == books2

    qrow = emb.to_spark().filter(F.col("vec_id") == 0).select("embedding").collect()
    q = [float(x) for x in qrow[0]["embedding"]]
    approx = {r.vec_id for r in pq_topk(emb, q, books, k=10, rerank=50).collect()}
    exact = {
        r.vec_id
        for r in cosine_topk(emb, q, k=10).to_spark().select("vec_id").collect()
    }
    assert len(approx & exact) >= 6  # recall@10 with 50-candidate rerank
    assert 0 in approx  # the query vector itself always survives

    codes = pq_encode(emb.to_spark(), books)
    row = codes.first()
    assert len(row["pq_code"]) == 8
    mx = codes.select(F.array_max("pq_code").alias("m")).agg(F.max("m")).collect()
    assert mx[0][0] <= 15


def test_pq_errors(spark, sf_dir):
    import eland_spark as es
    from eland_spark.operators.similarity import pq_train

    emb = es.read_parquet(spark, f"{sf_dir}/embeddings.parquet", index_col="vec_id")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)


def test_ivf_pq_topk_recall(spark, sf_dir):
    import eland_spark as es
    from eland_spark.operators.similarity import (
        cosine_topk, ivf_index, ivf_pq_topk, pq_train,
    )

    emb = es.read_parquet(spark, f"{sf_dir}/embeddings.parquet", index_col="vec_id")
    cents = ivf_index(emb, n_cells=8, max_iter=2, seed_strategy="first")
    books = pq_train(emb, m=8, k=16, max_iter=3, seed_strategy="first")
    qrow = emb.to_spark().filter(F.col("vec_id") == 3).collect()[0]
    qv = [float(x) for x in qrow["embedding"]]
    got = {r.vec_id for r in ivf_pq_topk(emb, qv, cents, books, k=10, nprobe=4).collect()}
    exact = {
        r.vec_id
        for r in cosine_topk(emb, qv, k=10).to_spark().select("vec_id").collect()
    }
    assert 3 in got
    assert len(got & exact) >= 5  # pruning + PQ, still recalls half+


def test_ivf_index_driver_fold_equals_distributed(spark, sf_dir):
    """r8 opt: when metadata proves a one-local-task/one-batch scan,
    ivf_index folds the Lloyd iterations on the driver. The fold must
    be BIT-IDENTICAL to the distributed path (forced here through a
    localCheckpoint source, which defeats the metadata gate while
    keeping the same single-partition layout, so both paths see the
    identical single Arrow batch)."""
    import eland_spark as es
    from eland_spark.frame import DataFrame as EDF
    from eland_spark.operators.parallelism import bounded_single_task_rows
    from eland_spark.operators.similarity import ivf_index

    emb = es.read_parquet(spark, f"{sf_dir}/embeddings.parquet", index_col="vec_id")
    # gate must fire on the plain scan (this is the layout being folded)
    assert bounded_single_task_rows(emb.to_spark(), 10000) is not None
    folded = ivf_index(emb, n_cells=4, max_iter=3, seed_strategy="first")

    ck = emb.to_spark().localCheckpoint()  # LogicalRDD: gate declines
    assert bounded_single_task_rows(ck, 10000) is None
    assert ck.rdd.getNumPartitions() == 1
    dist = ivf_index(EDF(ck, index_cols=("vec_id",)), n_cells=4, max_iter=3,
                     seed_strategy="first")
    assert folded == dist  # exact float equality, not allclose
