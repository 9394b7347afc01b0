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
    def import_ltr_model(
        cls,
        spark: SparkSession,
        model_id: str,
        model: Any,
        ltr_model_config,
        registry_dir: str | None = None,
        overwrite: bool = False,
    ) -> "MLModel":
        """Register a regressor as a learning-to-rank rescorer
        (reference eland/ml/ml_model.py:392-550): the LTR config's
        feature extractors NAME the model's features, so scoring can
        chain FeatureLogger.extract_features -> transform. Only
        regression IRs rank; classifiers are rejected like the
        reference's objective whitelist."""
        out = cls.import_model(
            spark,
            model_id,
            model,
            list(ltr_model_config.feature_names),
            registry_dir=registry_dir,
            overwrite=overwrite,
        )
        if out.ensemble.task != "regression":
            raise ValueError(
                "LTR rescoring needs a regression model (rank:* / reg:* "
                "objectives); got a classifier"
            )
        out.ltr_config = ltr_model_config
        return out

    @classmethod
    def load(cls, spark: SparkSession, model_id: str, registry_dir: str) -> "MLModel":
        with open(os.path.join(registry_dir, f"{model_id}.ir.b64")) as f:
            return cls(spark, model_id, Ensemble.deserialize(f.read()))

    @staticmethod
    def exists_model(model_id: str, registry_dir: str) -> bool:
        """Registry membership probe (reference
        eland/ml/ml_model.py:565-585 checks the ES model store)."""
        return os.path.exists(os.path.join(registry_dir, f"{model_id}.ir.b64"))

    @staticmethod
    def delete_model(model_id: str, registry_dir: str) -> None:
        """Remove a registered model; missing ids are a no-op like the
        reference's ignore(404) (eland/ml/ml_model.py:552-563)."""
        path = os.path.join(registry_dir, f"{model_id}.ir.b64")
        if os.path.exists(path):
            os.remove(path)

    # -- metadata (reference eland/ml/ml_model.py:215-248) ---------------
    @property
    def model_type(self) -> str:
        return (
            "tree_ensemble_regressor"
            if self.ensemble.task == "regression"
            else "tree_ensemble_classifier"
        )

    @property
    def feature_names(self) -> list[str]:
        return list(self.ensemble.feature_names)

    @property
    def results_field(self) -> str:
        return "prediction"

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
