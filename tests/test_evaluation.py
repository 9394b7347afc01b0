"""Classifier evaluation (operators/evaluation.py): exact AUC vs a
brute-force pairwise reference (ties counted half), confusion metrics
vs sklearn-style hand math."""

import numpy as np
import pandas as pd
import pytest

from eland_spark.operators.evaluation import auc, confusion_at


def _brute_auc(scores, labels):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def _mk(spark, scores, labels):
    return spark.createDataFrame(
        pd.DataFrame({"s": scores, "y": labels}),
        schema="s double, y int",
    )


def test_auc_matches_bruteforce_with_ties(spark):
    rng = np.random.RandomState(2)
    scores = list(rng.randint(0, 15, 120).astype(float))  # heavy ties
    labels = list((rng.rand(120) < 0.4).astype(int))
    got = auc(_mk(spark, scores, labels), "s", "y").collect()[0]
    want = _brute_auc(scores, labels)
    assert got["auc"] == pytest.approx(want, abs=1e-6)
    assert got["n_pos"] == sum(labels)
    assert got["n_neg"] == len(labels) - sum(labels)


def test_auc_perfect_and_random_and_inverted(spark):
    perfect = auc(_mk(spark, [1.0, 2.0, 3.0, 4.0], [0, 0, 1, 1]),
                  "s", "y").collect()[0]["auc"]
    assert perfect == 1.0
    inverted = auc(_mk(spark, [4.0, 3.0, 2.0, 1.0], [0, 0, 1, 1]),
                   "s", "y").collect()[0]["auc"]
    assert inverted == 0.0
    all_tied = auc(_mk(spark, [1.0] * 6, [0, 1, 0, 1, 0, 1]),
                   "s", "y").collect()[0]["auc"]
    assert all_tied == 0.5


def test_auc_degenerate_is_null(spark):
    row = auc(_mk(spark, [1.0, 2.0], [1, 1]), "s", "y").collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0


def test_confusion_at(spark):
    scores = [0.9, 0.8, 0.3, 0.6, 0.1, None]
    labels = [1, 0, 1, 1, 0, 1]
    row = confusion_at(_mk(spark, scores, labels), "s", "y",
                       threshold=0.5).collect()[0]
    # preds (null dropped): [1,1,0,1,0]; labels [1,0,1,1,0]
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (2, 1, 1, 1)
    assert row["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["f1"] == pytest.approx(2 / 3, abs=1e-6)


def test_confusion_zero_denominators_null(spark):
    row = confusion_at(_mk(spark, [0.1, 0.2], [0, 0]), "s", "y",
                       threshold=0.5).collect()[0]
    assert row["precision"] is None and row["recall"] is None
    assert row["f1"] is None
