"""In-engine linear-classifier training: separation, determinism,
scoring parity with the feature definition."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.classifier import (
    hashed_features,
    score_hashed_classifier,
    train_linear_classifier,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.RandomState(0)
    good = ["clean", "useful", "informative", "structured", "clear"]
    bad = ["spam", "noise", "junk", "clickbait", "garbage"]
    rows = []
    for i in range(300):
        y = i % 2
        vocab = good if y else bad
        text = " ".join(rng.choice(vocab, 15)) + " the of and"
        rows.append((i, text, y))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "text", "label"])
    )


def test_training_separates(spark, labeled):
    w, b0 = train_linear_classifier(
        labeled, "text", "label", "id", n_buckets=1 << 10, iters=5, lr=4.0
    )
    pdf = labeled.select(
        "label", score_hashed_classifier(F.col("text"), w, b0).alias("p")
    ).toPandas()
    acc = ((pdf.p > 0.5).astype(int) == pdf.label).mean()
    assert acc == 1.0
    means = pdf.groupby("label").p.mean()
    assert means[1] - means[0] > 0.15


def test_training_deterministic(spark, labeled):
    a = train_linear_classifier(
        labeled, "text", "label", "id", n_buckets=256, iters=2, lr=2.0
    )
    b = train_linear_classifier(
        labeled, "text", "label", "id", n_buckets=256, iters=2, lr=2.0
    )
    assert a == b


def test_score_matches_feature_definition(spark, labeled):
    # mean-pooled bucket weights == sum(w_b * x_b) over the sparse rows
    w, b0 = train_linear_classifier(
        labeled, "text", "label", "id", n_buckets=256, iters=2, lr=2.0
    )
    feats = hashed_features(labeled, "text", "id", n_buckets=256)
    wdf = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(w) if x], "bucket int, w double"
    )
    via_feats = (
        feats.join(wdf, "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x")).alias("s"))
        .select(
            "id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("s") + F.lit(b0))))).alias("p"),
        )
    )
    direct = labeled.select(
        F.col("id"), score_hashed_classifier(F.col("text"), w, b0).alias("p")
    )
    joined = via_feats.alias("a").join(direct.alias("b"), "id")
    bad = joined.where(
        F.abs(F.col("a.p") - F.col("b.p")) > 1e-12
    ).count()
    assert bad == 0
