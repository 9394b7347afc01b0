"""PyTorch / Hugging Face NLP task surface.

Reference: eland traces HF transformers for 9 NLP task types and
uploads TorchScript chunks to ES (eland/ml/pytorch/transformers.py
task registry at 71-131, eland/ml/pytorch/_pytorch_model.py:43-165).
On Spark the deployment target is the executors themselves: a model is
loaded once per partition inside a mapInPandas stage, so "import" means
registering a loader; no upload protocol exists or is needed.

torch/transformers are not installed in this environment, so every task
runs on a deterministic NO-TORCH STAND-IN clearly named below — the
Spark plumbing (mapInPandas batching, output schemas mirroring the
reference's inference result fields, model-per-partition init point) is
the real production shape; only the per-batch scoring function is the
swap point for a real model:

- ``text_embedding`` / ``pass_through``: hashed bag-of-tokens encoder
  (ml/embeddings.py).
- ``zero_shot_classification`` / ``text_classification``: bi-encoder
  shape — embed text and each candidate label with the same encoder,
  softmax over cosine scores.
- ``text_similarity``: cosine of hashed embeddings.
- ``text_expansion``: SPLADE-shaped sparse token->weight map,
  weight = ln(1 + tf).
- ``ner``: rule-based tagger (emails -> MISC, capitalized token runs
  -> PER-ish MISC spans) with character offsets.
- ``question_answering``: extractive span = the sentence with maximal
  token overlap with the question.
- ``fill_mask``: candidate tokens from the context's own vocabulary,
  scored by cosine(embed(text with ``[MASK]`` filled), embed(context))
  and softmaxed — a masked-LM-shaped ranker over the same bi-encoder.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .embeddings import embed_text, hashed_embedding_batch

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


def _embed_np(texts, dim: int) -> np.ndarray:
    return np.asarray(hashed_embedding_batch(pd.Series(list(texts)), dim))


def _cos_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine; zero vectors score 0."""
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)


_EMAIL = re.compile(r"[\w.+-]+@[\w-]+\.[\w.]+")
_CAPRUN = re.compile(r"\b(?:[A-Z][a-z]+)(?:\s+[A-Z][a-z]+)*\b")
_SENT = re.compile(r"[^.!?]+[.!?]?")
_TOK = re.compile(r"[a-z0-9]+")


def _ner_row(text: str) -> list[dict]:
    ents = []
    for m in _EMAIL.finditer(text):
        ents.append(
            {"entity": m.group(0), "class_name": "MISC",
             "start_pos": m.start(), "end_pos": m.end()}
        )
    taken = [(e["start_pos"], e["end_pos"]) for e in ents]
    for m in _CAPRUN.finditer(text):
        if m.start() == 0 and " " not in m.group(0):
            continue  # lone sentence-initial capital: ambiguous, skip
        if any(s <= m.start() < e for s, e in taken):
            continue
        ents.append(
            {"entity": m.group(0), "class_name": "PER",
             "start_pos": m.start(), "end_pos": m.end()}
        )
    return sorted(ents, key=lambda e: e["start_pos"])


def _qa_row(question: str, context: str) -> dict:
    q_toks = set(_TOK.findall(question.lower()))
    best, best_ov, best_span = None, -1.0, (0, 0)
    for m in _SENT.finditer(context):
        toks = set(_TOK.findall(m.group(0).lower()))
        ov = len(q_toks & toks) / max(len(q_toks), 1)
        if ov > best_ov:  # strict '>' keeps the EARLIEST best sentence
            best, best_ov, best_span = m.group(0).strip(), ov, (m.start(), m.end())
    return {
        "predicted_value": best or "",
        "start_pos": best_span[0],
        "end_pos": best_span[1],
        "prediction_probability": float(best_ov),
    }


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


class TransformerModel:
    """HF-model-over-Spark runner (reference TransformerModel,
    eland/ml/pytorch/transformers.py:336+).

    ``apply(df, text_col)`` appends the task's output column via a
    mapInPandas stage — the per-batch scoring function is the swap
    point for a real model; init happens once per partition,
    Arrow-batched, GPU-friendly.

    Task parameters: ``labels`` (text_classification default
    ['negative','positive'] / zero_shot_classification required),
    ``query`` (text_similarity), ``question`` (question_answering),
    ``top_k`` (text_expansion).
    """

    def __init__(
        self,
        model_id: str,
        task_type: str,
        dim: int = 64,
        labels: list[str] | None = None,
        query: str | None = None,
        question: str | None = None,
        top_k: int = 5,
    ):
        if not task_supported(task_type):
            raise ValueError(
                f"unknown task {task_type!r}; supported: {SUPPORTED_TASK_TYPES}"
            )
        self.model_id = model_id
        self.task_type = task_type
        self.dim = dim
        self.labels = labels
        self.query = query
        self.question = question
        self.top_k = top_k

    # -- task bodies (per-batch, numpy/pandas — the model swap point) --

    def _classify(self, texts: pd.Series, labels: list[str]) -> pd.Series:
        emb = _embed_np(texts, self.dim)
        lab = _embed_np(labels, self.dim)
        scores = np.stack([_cos_rows(emb, np.tile(v, (len(emb), 1))) for v in lab], 1)
        probs = _softmax(scores)
        idx = probs.argmax(axis=1)
        return pd.Series(
            [
                {"predicted_value": labels[i], "prediction_probability": float(p[i])}
                for i, p in zip(idx, probs)
            ]
        )

    def _fill_mask(self, text: str) -> dict:
        """Masked-token prediction without torch: candidates are the
        context's own vocabulary, each scored by the hashed bi-encoder
        — cosine(embed(text with ``[MASK]`` -> candidate), embed(bare
        context)) — then softmaxed; ties break lexicographically. A
        real masked-LM plugs into the same per-batch swap point."""
        empty = {"predicted_value": None, "prediction_probability": 0.0,
                 "top_classes": []}
        if "[MASK]" not in text:
            return empty
        ctx = text.replace("[MASK]", " ")
        cands = sorted(set(_TOK.findall(ctx.lower())))
        if not cands:
            return empty
        emb = _embed_np([ctx] + [text.replace("[MASK]", c) for c in cands],
                        self.dim)
        scores = _cos_rows(np.tile(emb[0], (len(cands), 1)), emb[1:])
        probs = _softmax(scores[None, :])[0]
        order = sorted(range(len(cands)), key=lambda i: (-probs[i], cands[i]))
        top = [
            {"class_name": cands[i], "class_probability": float(probs[i])}
            for i in order[: self.top_k]
        ]
        return {
            "predicted_value": top[0]["class_name"],
            "prediction_probability": top[0]["class_probability"],
            "top_classes": top,
        }

    def _expand(self, texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = _TOK.findall(str(t or "").lower())
            tf: dict[str, int] = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[: self.top_k]
            out.append({k: float(np.log1p(v)) for k, v in top})
        return pd.Series(out)

    def apply(
        self,
        df: DataFrame,
        text_col: str = "text",
        out_col: str | None = None,
        engine: str = "stand_in",
    ) -> DataFrame:
        if engine not in ("stand_in", "hf"):
            raise ValueError(f"engine must be stand_in|hf, got {engine!r}")
        if engine == "hf":
            return self._apply_hf(df, text_col, out_col)
        t = self.task_type
        if t == "text_embedding":
            return embed_text(df, text_col, out_col or "embedding", dim=self.dim)
        if t == "pass_through":
            # raw model output = the encoder features themselves
            return embed_text(df, text_col, out_col or "features", dim=self.dim)
        oc = out_col or "prediction"
        if t in ("text_classification", "zero_shot_classification"):
            labels = self.labels or (
                ["negative", "positive"] if t == "text_classification" else None
            )
            if not labels:
                raise ValueError("zero_shot_classification needs labels=[...]")
            ret = T.StructType(
                [
                    T.StructField("predicted_value", T.StringType()),
                    T.StructField("prediction_probability", T.DoubleType()),
                ]
            )
            fn = lambda s: self._classify(s, labels)  # noqa: E731
        elif t == "text_similarity":
            if not self.query:
                raise ValueError("text_similarity needs query='...'")
            qv = _embed_np([self.query], self.dim)

            def fn(s: pd.Series) -> pd.Series:
                emb = _embed_np(s, self.dim)
                return pd.Series(_cos_rows(emb, np.tile(qv[0], (len(emb), 1))))

            ret = T.DoubleType()
        elif t == "fill_mask":
            ret = T.StructType(
                [
                    T.StructField("predicted_value", T.StringType()),
                    T.StructField("prediction_probability", T.DoubleType()),
                    T.StructField(
                        "top_classes",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("class_name", T.StringType()),
                                    T.StructField(
                                        "class_probability", T.DoubleType()
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            )
            fn = lambda s: pd.Series(  # noqa: E731
                [self._fill_mask(str(x or "")) for x in s]
            )
        elif t == "text_expansion":
            ret = T.MapType(T.StringType(), T.DoubleType())
            fn = self._expand
        elif t == "ner":
            ret = T.ArrayType(
                T.StructType(
                    [
                        T.StructField("entity", T.StringType()),
                        T.StructField("class_name", T.StringType()),
                        T.StructField("start_pos", T.IntegerType()),
                        T.StructField("end_pos", T.IntegerType()),
                    ]
                )
            )
            fn = lambda s: pd.Series([_ner_row(str(x or "")) for x in s])  # noqa: E731
        elif t == "question_answering":
            if not self.question:
                raise ValueError("question_answering needs question='...'")
            q = self.question
            ret = T.StructType(
                [
                    T.StructField("predicted_value", T.StringType()),
                    T.StructField("start_pos", T.IntegerType()),
                    T.StructField("end_pos", T.IntegerType()),
                    T.StructField("prediction_probability", T.DoubleType()),
                ]
            )
            fn = lambda s: pd.Series([_qa_row(q, str(x or "")) for x in s])  # noqa: E731
        else:  # pragma: no cover — registry and branches are exhaustive
            raise NotImplementedError(t)

        out_schema = T.StructType(df.schema.fields + [T.StructField(oc, ret, True)])

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # model init happens HERE, once per partition (torch swap point)
            for pdf in batches:
                chunk = pdf.copy()
                chunk[oc] = fn(chunk[text_col]).values
                yield chunk

        return df.mapInPandas(run, out_schema)

    def _apply_hf(
        self, df: DataFrame, text_col: str, out_col: str | None
    ) -> DataFrame:
        """Real-model engine (``engine='hf'``): loads the HF model named
        by ``model_id`` through torch + transformers INSIDE the
        mapInPandas stage (once per partition, the documented swap
        point) and emits the SAME output schema as the stand-in, so a
        torch-present environment can pin contract parity (reference
        behavior: eland/ml/pytorch/transformers.py:336+ traces live HF
        models). Import-gated — raises ImportError where torch or
        transformers is absent (this container). text_embedding
        (mean-pooled last hidden state, L2-normalized like the ES
        dense_vector convention) and text_classification
        (transformers.pipeline) are wired; other task types raise
        NotImplementedError until a torch-present environment exists
        to validate their output mapping."""
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover — torch absent here
            raise ImportError(
                "engine='hf' needs torch and transformers installed; "
                "use the default engine='stand_in' in torch-free "
                "environments"
            ) from e
        t = self.task_type
        model_id = self.model_id
        if t == "text_embedding":  # pragma: no cover — needs torch
            oc = out_col or "embedding"
            out_schema = T.StructType(
                df.schema.fields
                + [T.StructField(oc, T.ArrayType(T.FloatType()), True)]
            )

            def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                import torch
                from transformers import AutoModel, AutoTokenizer

                tok = AutoTokenizer.from_pretrained(model_id)
                mdl = AutoModel.from_pretrained(model_id)
                mdl.eval()
                for pdf in batches:
                    texts = [str(x or "") for x in pdf[text_col]]
                    with torch.no_grad():
                        enc = tok(
                            texts, padding=True, truncation=True,
                            return_tensors="pt",
                        )
                        hs = mdl(**enc).last_hidden_state
                        mask = enc["attention_mask"].unsqueeze(-1).float()
                        emb = (hs * mask).sum(1) / mask.sum(1).clamp(min=1.0)
                        emb = torch.nn.functional.normalize(emb, dim=1)
                    chunk = pdf.copy()
                    chunk[oc] = [
                        [float(v) for v in row] for row in emb.cpu().numpy()
                    ]
                    yield chunk

            return df.mapInPandas(run, out_schema)
        if t == "text_classification":  # pragma: no cover — needs torch
            oc = out_col or "prediction"
            out_schema = T.StructType(
                df.schema.fields
                + [
                    T.StructField(
                        oc,
                        T.StructType(
                            [
                                T.StructField("predicted_value", T.StringType()),
                                T.StructField(
                                    "prediction_probability", T.DoubleType()
                                ),
                            ]
                        ),
                        True,
                    )
                ]
            )

            def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from transformers import pipeline

                pipe = pipeline("text-classification", model=model_id)
                for pdf in batches:
                    texts = [str(x or "") for x in pdf[text_col]]
                    preds = pipe(texts, truncation=True)
                    chunk = pdf.copy()
                    chunk[oc] = [
                        {
                            "predicted_value": p["label"],
                            "prediction_probability": float(p["score"]),
                        }
                        for p in preds
                    ]
                    yield chunk

            return df.mapInPandas(run, out_schema)
        raise NotImplementedError(
            f"engine='hf' not yet wired for task {t!r}; wire its output "
            "mapping in a torch-present environment and pin it against "
            "the stand-in schema"
        )

    def encoder(self) -> Callable:
        """The per-batch encode function (swap point for a real model)."""
        if self.task_type in ("text_embedding", "pass_through"):
            return hashed_embedding_batch
        raise NotImplementedError(self.task_type)

    def elasticsearch_model_id(self) -> str:
        """Deployment-safe id for this model (reference
        transformers.py:798-799)."""
        from .nlp_config import elasticsearch_model_id

        return elasticsearch_model_id(self.model_id)

    def model_config(self) -> "NlpTrainedModelConfig":
        """Build the trained-model config document for this deployment
        (reference TransformerModel._create_config,
        transformers.py:517-595): task-keyed inference options wrapping
        a tokenization config, with the reference's well-known defaults
        — SQuAD windows for question_answering (max_seq 386, span 128,
        truncate none), truncate='second' for text_similarity, and the
        embedding size advertised for text_embedding.  Metadata records
        the encoder family instead of TorchScript memory sizes."""
        from .nlp_config import (
            NlpBertTokenizationConfig,
            NlpTrainedModelConfig,
            PrefixStrings,
            TASK_TYPE_TO_INFERENCE_CONFIG,
            TrainedModelInput,
        )

        tok = NlpBertTokenizationConfig(do_lower_case=True)
        kw = {"tokenization": tok}
        if self.task_type == "question_answering":
            tok.max_sequence_length, tok.span, tok.truncate = 386, 128, "none"
            if self.question:
                kw["question"] = self.question
        elif self.task_type == "text_similarity":
            tok.truncate = "second"
            if self.query:
                kw["text"] = self.query
        elif self.task_type == "text_embedding":
            kw["embedding_size"] = self.dim
        elif self.task_type in ("text_classification", "zero_shot_classification"):
            if self.labels:
                kw["classification_labels"] = list(self.labels)
            elif self.task_type == "text_classification":
                kw["classification_labels"] = ["negative", "positive"]
        return NlpTrainedModelConfig(
            description=(
                f"Model {self.model_id} for task type '{self.task_type}'"
            ),
            inference_config=TASK_TYPE_TO_INFERENCE_CONFIG[self.task_type](**kw),
            input=TrainedModelInput(field_names=["text_field"]),
            metadata={"encoder": "hashed-bow", "dim": self.dim},
            prefix_strings=None,
        )
