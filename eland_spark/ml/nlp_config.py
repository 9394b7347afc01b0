"""NLP trained-model configuration surface (torch-free).

Parity target: eland/ml/pytorch/nlp_ml_model.py (the full config /
serialization class tree) and the pure-Python helpers in
eland/ml/pytorch/transformers.py — ``task_type_from_model_config``
(:141-173), ``elasticsearch_model_id`` (:813-827), and the
architecture→task mapping tables (:82-105).  None of this needs torch:
the classes describe a deployed NLP model (task type, tokenizer
settings, labels, prefixes) and serialize to the JSON body the
reference PUTs to the trained-models API.  Here the same document is
the registry entry `eland_spark.cli` persists next to the encoder so a
deployment is reproducible.

Serialization contract (matches the reference shapes exactly):

- a tokenization config renders as ``{family: {set fields...}}``,
  e.g. ``{"bert": {"do_lower_case": true, "truncate": "first"}}`` —
  unset (None) fields are omitted;
- an inference config renders as ``{task_name: {fields...}}`` with
  nested configs recursively rendered;
- ``NlpTrainedModelConfig.to_dict()`` is the flat top-level document
  (description / tags / inference_config / input / metadata /
  model_type / prefix_strings), None fields omitted.

Known reference quirk, preserved: ``NlpDebertaV2TokenizationConfig``
accepts ``do_lower_case`` but the reference never stores it
(nlp_ml_model.py:89-108 assigns it to nothing), so it does not appear
in the serialized body for the deberta_v2 family either.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

__all__ = [
    "NlpTokenizationConfig",
    "NlpBertTokenizationConfig",
    "NlpBertJapaneseTokenizationConfig",
    "NlpMPNetTokenizationConfig",
    "NlpRobertaTokenizationConfig",
    "NlpXLMRobertaTokenizationConfig",
    "NlpDebertaV2TokenizationConfig",
    "InferenceConfig",
    "FillMaskInferenceOptions",
    "NerInferenceOptions",
    "PassThroughInferenceOptions",
    "QuestionAnsweringInferenceOptions",
    "TextClassificationInferenceOptions",
    "TextEmbeddingInferenceOptions",
    "TextExpansionInferenceOptions",
    "TextSimilarityInferenceOptions",
    "ZeroShotClassificationInferenceOptions",
    "TrainedModelInput",
    "PrefixStrings",
    "NlpTrainedModelConfig",
    "ARCHITECTURE_TO_TASK_TYPE",
    "ZERO_SHOT_LABELS",
    "TASK_TYPE_TO_INFERENCE_CONFIG",
    "task_type_from_model_config",
    "elasticsearch_model_id",
]


def _render(value: Any) -> Any:
    """Recursive serializer: config objects -> dicts, containers walked,
    scalars passed through."""
    if hasattr(value, "to_dict"):
        return value.to_dict()
    if isinstance(value, (list, tuple)):
        return [_render(v) for v in value]
    return value


def _body(obj: Any, skip: tuple[str, ...] = ()) -> dict:
    """Set (non-None) dataclass fields of ``obj`` as a dict, rendered."""
    out = {}
    for f in dataclasses.fields(obj):
        if f.name in skip:
            continue
        v = getattr(obj, f.name)
        if v is not None:
            out[f.name] = _render(v)
    return out


# --------------------------------------------------------------------------
# tokenization configs


@dataclass
class NlpTokenizationConfig:
    """Base tokenizer settings; ``family`` keys the serialized body
    (reference: configuration_type, nlp_ml_model.py:21-44)."""

    family: str = "bert"
    with_special_tokens: Optional[bool] = None
    max_sequence_length: Optional[int] = None
    truncate: Optional[str] = None  # 'first' | 'none' | 'second'
    span: Optional[int] = None

    def to_dict(self) -> dict:
        return {self.family: _body(self, skip=("family",))}


def _tok_family(name: str, extra: Sequence[str] = ()):
    """Build a concrete tokenization-config subclass for one tokenizer
    family; ``extra`` lists family-specific optional flags."""

    fields = [
        ("family", str, field(default=name, init=False)),
        *[(x, Optional[bool], field(default=None)) for x in extra],
        ("with_special_tokens", Optional[bool], field(default=None)),
        ("max_sequence_length", Optional[int], field(default=None)),
        ("truncate", Optional[str], field(default=None)),
        ("span", Optional[int], field(default=None)),
    ]
    return dataclasses.make_dataclass(
        f"Nlp_{name}_TokenizationConfig",
        fields,
        bases=(NlpTokenizationConfig,),
        kw_only=True,
    )


NlpBertTokenizationConfig = _tok_family("bert", ["do_lower_case"])
NlpBertJapaneseTokenizationConfig = _tok_family("bert_ja", ["do_lower_case"])
NlpMPNetTokenizationConfig = _tok_family("mpnet", ["do_lower_case"])
NlpRobertaTokenizationConfig = _tok_family("roberta", ["add_prefix_space"])
NlpXLMRobertaTokenizationConfig = _tok_family("xlm_roberta")
# reference quirk: deberta_v2 accepts do_lower_case but drops it
# (nlp_ml_model.py:89-108) — mirrored by simply not declaring it


class NlpDebertaV2TokenizationConfig(NlpTokenizationConfig):
    # plain subclass (not a dataclass) so the accepted-and-dropped
    # do_lower_case kwarg survives; fields() resolves to the base's
    def __init__(self, *, do_lower_case=None, **kw):
        super().__init__(family="deberta_v2", **kw)


# --------------------------------------------------------------------------
# per-task inference options


@dataclass(kw_only=True)
class InferenceConfig:
    """Base per-task options; serialized as ``{task_name: {...}}``
    (reference nlp_ml_model.py:176-188)."""

    task_name: str = "pass_through"
    tokenization: Optional[NlpTokenizationConfig] = None
    results_field: Optional[str] = None

    def to_dict(self) -> dict:
        return {self.task_name: _body(self, skip=("task_name",))}


@dataclass(kw_only=True)
class FillMaskInferenceOptions(InferenceConfig):
    task_name: str = field(default="fill_mask", init=False)
    num_top_classes: Optional[int] = None


@dataclass(kw_only=True)
class NerInferenceOptions(InferenceConfig):
    task_name: str = field(default="ner", init=False)
    classification_labels: Sequence[str] = ()


@dataclass(kw_only=True)
class PassThroughInferenceOptions(InferenceConfig):
    task_name: str = field(default="pass_through", init=False)


@dataclass(kw_only=True)
class QuestionAnsweringInferenceOptions(InferenceConfig):
    task_name: str = field(default="question_answering", init=False)
    max_answer_length: Optional[int] = None
    question: Optional[str] = None
    num_top_classes: Optional[int] = None


@dataclass(kw_only=True)
class TextClassificationInferenceOptions(InferenceConfig):
    task_name: str = field(default="text_classification", init=False)
    classification_labels: Sequence[str] = ()
    num_top_classes: Optional[int] = None


@dataclass(kw_only=True)
class TextEmbeddingInferenceOptions(InferenceConfig):
    task_name: str = field(default="text_embedding", init=False)
    embedding_size: Optional[int] = None


@dataclass(kw_only=True)
class TextExpansionInferenceOptions(InferenceConfig):
    task_name: str = field(default="text_expansion", init=False)


@dataclass(kw_only=True)
class TextSimilarityInferenceOptions(InferenceConfig):
    task_name: str = field(default="text_similarity", init=False)
    text: Optional[str] = None


@dataclass(kw_only=True)
class ZeroShotClassificationInferenceOptions(InferenceConfig):
    task_name: str = field(default="zero_shot_classification", init=False)
    classification_labels: Sequence[str] = ()
    hypothesis_template: Optional[str] = None
    multi_label: Optional[bool] = None
    labels: Optional[Sequence[str]] = None


# --------------------------------------------------------------------------
# whole-model document


@dataclass
class TrainedModelInput:
    """Input field binding (reference nlp_ml_model.py:324-329)."""

    field_names: Sequence[str] = ("text_field",)

    def to_dict(self) -> dict:
        return {"field_names": list(self.field_names)}


@dataclass
class PrefixStrings:
    """Asymmetric-retrieval prefixes (reference nlp_ml_model.py:332-346):
    ingest/search strings prepended to documents vs queries."""

    ingest_prefix: Optional[str] = None
    search_prefix: Optional[str] = None

    def to_dict(self) -> dict:
        out = {}
        if self.ingest_prefix is not None:
            out["ingest"] = self.ingest_prefix
        if self.search_prefix is not None:
            out["search"] = self.search_prefix
        return out


@dataclass(kw_only=True)
class NlpTrainedModelConfig:
    """Top-level trained-model document (reference
    nlp_ml_model.py:349-374).  ``model_type`` defaults to "pytorch" for
    shape parity even though the Spark deployment stores an encoder
    registry entry rather than TorchScript chunks."""

    description: str
    inference_config: InferenceConfig
    input: TrainedModelInput = field(default_factory=TrainedModelInput)
    metadata: Optional[dict] = None
    model_type: str = "pytorch"
    tags: Optional[Sequence[str]] = None
    prefix_strings: Optional[PrefixStrings] = None

    def to_dict(self) -> dict:
        return _body(self)


# --------------------------------------------------------------------------
# task-type inference from a Hugging Face config (pure dict logic)

# reference eland/ml/pytorch/transformers.py:82-93
ARCHITECTURE_TO_TASK_TYPE = {
    "MaskedLM": ["fill_mask", "text_embedding"],
    "TokenClassification": ["ner"],
    "SequenceClassification": [
        "text_classification",
        "zero_shot_classification",
        "text_similarity",
    ],
    "QuestionAnswering": ["question_answering"],
    "DPRQuestionEncoder": ["text_embedding"],
    "DPRContextEncoder": ["text_embedding"],
}
# NLI label sets that mark a zero-shot-capable classifier (ibid.:94)
ZERO_SHOT_LABELS = {"contradiction", "neutral", "entailment"}

TASK_TYPE_TO_INFERENCE_CONFIG = {
    "fill_mask": FillMaskInferenceOptions,
    "ner": NerInferenceOptions,
    "pass_through": PassThroughInferenceOptions,
    "question_answering": QuestionAnsweringInferenceOptions,
    "text_classification": TextClassificationInferenceOptions,
    "text_embedding": TextEmbeddingInferenceOptions,
    "text_expansion": TextExpansionInferenceOptions,
    "text_similarity": TextSimilarityInferenceOptions,
    "zero_shot_classification": ZeroShotClassificationInferenceOptions,
}


def task_type_from_model_config(model_config: Any) -> Optional[str]:
    """Infer the NLP task type from a Hugging Face model config.

    Accepts either an object with ``architectures`` / ``name_or_path``
    / ``id2label`` / ``label2id`` attributes (a transformers
    PretrainedConfig) or the plain ``config.json`` dict — the latter is
    the torch-free path.  Decision procedure mirrors the reference
    (transformers.py:141-173):

    1. collect candidate tasks from architecture-name substrings;
    2. no architectures / no match: sentence-transformers repos default
       to text_embedding, else unknown;
    3. a 1-label classifier is a text_similarity (cross-encoder) head;
    4. ambiguous SequenceClassification: NLI-labelled models are
       zero_shot_classification, others text_classification;
    5. ambiguous MaskedLM: sentence-transformers → text_embedding,
       else fill_mask.
    """
    if isinstance(model_config, dict):
        get = model_config.get
        architectures = get("architectures")
        name_or_path = get("name_or_path") or get("_name_or_path") or ""
        id2label, label2id = get("id2label"), get("label2id")
    else:
        architectures = getattr(model_config, "architectures", None)
        name_or_path = getattr(model_config, "name_or_path", "") or ""
        id2label = getattr(model_config, "id2label", None)
        label2id = getattr(model_config, "label2id", None)

    is_st = name_or_path.startswith("sentence-transformers/")
    candidates: set[str] = set()
    for arch in architectures or ():
        for marker, tasks in ARCHITECTURE_TO_TASK_TYPE.items():
            if marker in arch:
                candidates.update(tasks)
    if not candidates:
        return "text_embedding" if is_st else None
    if "text_classification" in candidates and id2label and len(id2label) == 1:
        return "text_similarity"
    if len(candidates) > 1:
        if "zero_shot_classification" in candidates:
            if label2id and not {
                k.lower() for k in label2id
            } - ZERO_SHOT_LABELS:
                return "zero_shot_classification"
            return "text_classification"
        if "text_embedding" in candidates:
            return "text_embedding" if is_st else "fill_mask"
    return candidates.pop()


def elasticsearch_model_id(model_id: str) -> str:
    """Normalize a hub id / file path to a valid deployment id: spaces
    and path separators become ``__``, lowercased, last 64 chars, no
    leading ``__`` (reference transformers.py:813-827)."""
    out = re.sub(r"[\s\\/]", "__", model_id).lower()[-64:]
    return out.removeprefix("__")
