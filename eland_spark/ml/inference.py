"""Vectorized ensemble scoring on Spark.

Reference: eland runs inference server-side via an ingest pipeline with
an inference processor (eland/ml/ml_model.py:92-212). Spark-native: the
IR is broadcast once per job; an Arrow-batched pandas UDF evaluates all
trees with flattened numpy arrays (no Python-per-row cost). For 100 TB:
the UDF is a pure map — no shuffle, linear scaling; model size is bounded
by the broadcast (MBs for thousands of trees).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tree_ir import Ensemble

__all__ = ["score_columns", "predict_column", "flatten_ensemble"]


def flatten_ensemble(ens: Ensemble) -> dict:
    """Flatten trees into parallel numpy arrays for vectorized traversal:
    per node: feature, threshold, left, right, default_left, leaf matrix."""
    flat_trees = []
    n_out = ens.n_classes if (ens.task != "regression" and ens.agg == "sum_probs") else 1
    if ens.task == "multiclass" and ens.agg == "sum":
        n_out = ens.n_classes
    for t in ens.trees:
        n = max(node.node_idx for node in t.nodes) + 1
        feat = np.full(n, -1, dtype="int64")
        thr = np.full(n, np.nan, dtype="float64")
        left = np.zeros(n, dtype="int64")
        right = np.zeros(n, dtype="int64")
        dleft = np.ones(n, dtype=bool)
        leaf = np.zeros((n, max(n_out, 1)), dtype="float64")
        is_leaf = np.zeros(n, dtype=bool)
        for node in t.nodes:
            i = node.node_idx
            if node.is_leaf:
                is_leaf[i] = True
                lv = np.asarray(node.leaf_value, dtype="float64")
                leaf[i, : lv.shape[0]] = lv
            else:
                feat[i] = node.split_feature
                thr[i] = node.threshold
                left[i] = node.left_child
                right[i] = node.right_child
                dleft[i] = node.default_left
        flat_trees.append((feat, thr, left, right, dleft, leaf, is_leaf))
    return {
        "trees": flat_trees,
        "weights": np.asarray(ens.weights or [1.0] * len(ens.trees)),
        "task": ens.task,
        "agg": ens.agg,
        "base_score": ens.base_score,
        "n_out": max(n_out, 1),
        "labels": (
            np.asarray(ens.classification_labels)
            if ens.classification_labels is not None
            else None
        ),
    }


def _eval_flat(flat: dict, X: np.ndarray) -> np.ndarray:
    """Evaluate all rows through all trees; X is (n_rows, n_features)."""
    n_rows = X.shape[0]
    acc = np.zeros((n_rows, flat["n_out"]), dtype="float64")
    for (feat, thr, left, right, dleft, leaf, is_leaf), w in zip(
        flat["trees"], flat["weights"]
    ):
        idx = np.zeros(n_rows, dtype="int64")
        active = ~is_leaf[idx]
        while active.any():
            cur = idx[active]
            f = feat[cur]
            v = X[active, f]
            nan = np.isnan(v)
            go_left = np.where(nan, dleft[cur], v <= thr[cur])
            idx[active] = np.where(go_left, left[cur], right[cur])
            active = ~is_leaf[idx]
        acc += leaf[idx] * w
    acc += flat["base_score"]
    return acc


def _finalize(flat: dict, acc: np.ndarray, output: str) -> np.ndarray:
    task, agg = flat["task"], flat["agg"]
    if task == "regression":
        return acc[:, 0]
    if task == "binary" and agg == "sum":
        p1 = 1.0 / (1.0 + np.exp(-acc[:, 0]))
        probs = np.stack([1 - p1, p1], axis=1)
    elif agg == "sum_probs":
        probs = acc / acc.sum(axis=1, keepdims=True)
    else:  # multiclass margins
        e = np.exp(acc - acc.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
    if output == "probability":
        return probs
    idx = probs.argmax(axis=1)
    labels = flat.get("labels")
    if labels is not None:
        return labels[idx]
    return idx


def predict_column(
    spark: SparkSession, ens: Ensemble, output: str = "predict"
) -> "callable":
    """Returns a pandas-UDF factory: call with the feature Columns in
    ``ens.feature_names`` order."""
    if ens.task == "regression" and output == "probability":
        raise ValueError("probability output is undefined for regression models")
    flat = flatten_ensemble(ens)
    bc = spark.sparkContext.broadcast(flat)
    if output == "probability":
        ret = T.ArrayType(T.DoubleType())
    elif ens.task == "regression":
        ret = T.DoubleType()
    else:
        labels = ens.classification_labels
        # bool before int: isinstance(True, int) is True
        if labels is not None and any(isinstance(v, bool) for v in labels):
            ret = T.BooleanType()
        elif labels is not None and any(isinstance(v, str) for v in labels):
            ret = T.StringType()
        elif labels is not None and any(isinstance(v, float) for v in labels):
            ret = T.DoubleType()
        else:
            ret = T.LongType()

    if output == "probability":

        @F.pandas_udf(ret)
        def udf(*cols: pd.Series) -> pd.Series:
            X = np.column_stack([c.to_numpy(dtype="float64", na_value=np.nan) for c in cols])
            probs = _finalize(bc.value, _eval_flat(bc.value, X), "probability")
            return pd.Series(list(probs))

    else:

        @F.pandas_udf(ret)
        def udf(*cols: pd.Series) -> pd.Series:
            X = np.column_stack([c.to_numpy(dtype="float64", na_value=np.nan) for c in cols])
            out = _finalize(bc.value, _eval_flat(bc.value, X), output)
            return pd.Series(out)

    return udf


def score_columns(
    df: DataFrame, ens: Ensemble, output: str = "predict", out_col: str = "prediction"
) -> DataFrame:
    """Append a prediction column; features resolved by ensemble
    feature_names."""
    spark = df.sparkSession
    udf = predict_column(spark, ens, output)
    return df.withColumn(out_col, udf(*[F.col(c) for c in ens.feature_names]))
