"""MLModel — user-facing import/predict surface.

Reference API shape: MLModel.import_model(es_client, model_id, model,
feature_names) then es_model.predict(X) (eland/ml/ml_model.py:92-550).
Spark-native: the "registry" is a directory of serialized IR files; the
client is the SparkSession; predict maps over a DataFrame (or a local
numpy/pandas batch for parity testing).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .inference import _eval_flat, _finalize, flatten_ensemble, score_columns
from .tree_ir import Ensemble

__all__ = ["MLModel"]


class MLModel:
    def __init__(self, spark: SparkSession, model_id: str, ensemble: Ensemble):
        self._spark = spark
        self.model_id = model_id
        self.ensemble = ensemble
        self._flat = None

    # -- registry --------------------------------------------------------
    @classmethod
    def import_model(
        cls,
        spark: SparkSession,
        model_id: str,
        model: Any,
        feature_names: list[str],
        registry_dir: str | None = None,
        overwrite: bool = False,
    ) -> "MLModel":
        """Serialize a trained sklearn/XGBoost/LightGBM model into the IR
        (reference eland/ml/ml_model.py:249-550) and register it."""
        from .importers import import_model as to_ir

        ens = model if isinstance(model, Ensemble) else to_ir(model, feature_names)
        out = cls(spark, model_id, ens)
        if registry_dir:
            os.makedirs(registry_dir, exist_ok=True)
            path = os.path.join(registry_dir, f"{model_id}.ir.b64")
            if os.path.exists(path) and not overwrite:
                raise ValueError(f"model {model_id!r} exists; pass overwrite=True")
            with open(path, "w") as f:
                f.write(ens.serialize())
        return out

    @classmethod
    def load(cls, spark: SparkSession, model_id: str, registry_dir: str) -> "MLModel":
        with open(os.path.join(registry_dir, f"{model_id}.ir.b64")) as f:
            return cls(spark, model_id, Ensemble.deserialize(f.read()))

    # -- inference -------------------------------------------------------
    def predict(self, X) -> np.ndarray:
        """Local batch predict for parity testing (reference returns an
        np array from the inference pipeline, eland/ml/ml_model.py:92-212:
        int for classification, float for regression)."""
        import pandas as pd

        if isinstance(X, pd.DataFrame):
            X = X[self.ensemble.feature_names].to_numpy(dtype="float64")
        X = np.asarray(X, dtype="float64")
        if X.ndim == 1:
            X = X[None, :]
        if self._flat is None:
            self._flat = flatten_ensemble(self.ensemble)
        out = _finalize(self._flat, _eval_flat(self._flat, X), "predict")
        if self.ensemble.task == "regression":
            return out.astype("float64")
        # _finalize already mapped argmax through classification_labels;
        # keep the labels' own dtype (reference returns the model's real
        # class labels, not positional indices — including bools)
        if out.dtype.kind in ("i", "u"):
            return out.astype("int64")
        return out

    def predict_proba(self, X) -> np.ndarray:
        import pandas as pd

        if isinstance(X, pd.DataFrame):
            X = X[self.ensemble.feature_names].to_numpy(dtype="float64")
        X = np.asarray(X, dtype="float64")
        if self._flat is None:
            self._flat = flatten_ensemble(self.ensemble)
        return _finalize(self._flat, _eval_flat(self._flat, X), "probability")

    def transform(
        self, df: DataFrame, output: str = "predict", out_col: str = "prediction"
    ) -> DataFrame:
        """Distributed scoring: broadcast IR + Arrow-batched pandas UDF."""
        return score_columns(df, self.ensemble, output, out_col)
