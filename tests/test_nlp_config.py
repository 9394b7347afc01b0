"""NLP trained-model config surface (torch-free parity with
eland/ml/pytorch/nlp_ml_model.py and the pure-Python helpers in
eland/ml/pytorch/transformers.py)."""

import json

import pytest

from eland_spark.ml.nlp_config import (
    FillMaskInferenceOptions,
    NerInferenceOptions,
    NlpBertTokenizationConfig,
    NlpDebertaV2TokenizationConfig,
    NlpMPNetTokenizationConfig,
    NlpRobertaTokenizationConfig,
    NlpTrainedModelConfig,
    NlpXLMRobertaTokenizationConfig,
    PrefixStrings,
    QuestionAnsweringInferenceOptions,
    TASK_TYPE_TO_INFERENCE_CONFIG,
    TextClassificationInferenceOptions,
    TextEmbeddingInferenceOptions,
    TrainedModelInput,
    ZeroShotClassificationInferenceOptions,
    elasticsearch_model_id,
    task_type_from_model_config,
)
from eland_spark.ml.pytorch import SUPPORTED_TASK_TYPES, TransformerModel


# --- tokenization configs -------------------------------------------------


def test_tokenization_none_fields_omitted():
    assert NlpBertTokenizationConfig().to_dict() == {"bert": {}}
    assert NlpBertTokenizationConfig(
        do_lower_case=True, max_sequence_length=512, truncate="first"
    ).to_dict() == {
        "bert": {
            "do_lower_case": True,
            "max_sequence_length": 512,
            "truncate": "first",
        }
    }


def test_tokenization_families():
    assert NlpRobertaTokenizationConfig(add_prefix_space=True).to_dict() == {
        "roberta": {"add_prefix_space": True}
    }
    assert NlpXLMRobertaTokenizationConfig(span=64).to_dict() == {
        "xlm_roberta": {"span": 64}
    }
    assert NlpMPNetTokenizationConfig(do_lower_case=False).to_dict() == {
        "mpnet": {"do_lower_case": False}
    }


def test_deberta_drops_do_lower_case_like_reference():
    # reference nlp_ml_model.py:89-108 accepts do_lower_case but never
    # stores it — the serialized body must not contain it
    cfg = NlpDebertaV2TokenizationConfig(do_lower_case=True, truncate="second")
    assert cfg.to_dict() == {"deberta_v2": {"truncate": "second"}}


# --- inference options ----------------------------------------------------


def test_inference_config_shapes():
    tok = NlpBertTokenizationConfig(do_lower_case=True)
    d = TextClassificationInferenceOptions(
        tokenization=tok, classification_labels=["neg", "pos"], num_top_classes=2
    ).to_dict()
    assert d == {
        "text_classification": {
            "tokenization": {"bert": {"do_lower_case": True}},
            "classification_labels": ["neg", "pos"],
            "num_top_classes": 2,
        }
    }
    d = QuestionAnsweringInferenceOptions(
        tokenization=tok, question="who?", max_answer_length=15
    ).to_dict()
    assert d["question_answering"]["question"] == "who?"
    assert d["question_answering"]["max_answer_length"] == 15
    d = ZeroShotClassificationInferenceOptions(
        tokenization=tok,
        classification_labels=["contradiction", "neutral", "entailment"],
        multi_label=False,
    ).to_dict()
    assert d["zero_shot_classification"]["multi_label"] is False
    d = FillMaskInferenceOptions(tokenization=tok).to_dict()
    assert set(d) == {"fill_mask"} and "num_top_classes" not in d["fill_mask"]
    d = NerInferenceOptions(
        tokenization=tok, classification_labels=["O", "B-PER"]
    ).to_dict()
    assert d["ner"]["classification_labels"] == ["O", "B-PER"]


def test_task_registry_covers_all_tasks():
    assert set(TASK_TYPE_TO_INFERENCE_CONFIG) == set(SUPPORTED_TASK_TYPES)


# --- whole-model document -------------------------------------------------


def test_trained_model_config_document():
    cfg = NlpTrainedModelConfig(
        description="m",
        inference_config=TextEmbeddingInferenceOptions(
            tokenization=NlpBertTokenizationConfig(), embedding_size=384
        ),
        input=TrainedModelInput(field_names=["text_field"]),
        tags=["a", "b"],
        prefix_strings=PrefixStrings(
            ingest_prefix="passage: ", search_prefix="query: "
        ),
    )
    d = cfg.to_dict()
    assert d["model_type"] == "pytorch"
    assert d["input"] == {"field_names": ["text_field"]}
    assert d["tags"] == ["a", "b"]
    assert d["prefix_strings"] == {"ingest": "passage: ", "search": "query: "}
    assert d["inference_config"]["text_embedding"]["embedding_size"] == 384
    assert "metadata" not in d  # None fields omitted
    json.dumps(d)  # round-trippable


def test_prefix_strings_partial():
    assert PrefixStrings(ingest_prefix="p: ").to_dict() == {"ingest": "p: "}
    assert PrefixStrings().to_dict() == {}


# --- task-type inference (transformers.py:141-173 semantics) --------------


@pytest.mark.parametrize(
    "config,expect",
    [
        ({"architectures": ["BertForMaskedLM"],
          "name_or_path": "bert-base-uncased"}, "fill_mask"),
        ({"architectures": ["BertForMaskedLM"],
          "name_or_path": "sentence-transformers/all-MiniLM-L6-v2"},
         "text_embedding"),
        ({"architectures": None,
          "name_or_path": "sentence-transformers/x"}, "text_embedding"),
        ({"architectures": None, "name_or_path": "plain"}, None),
        ({"architectures": ["BertForTokenClassification"],
          "name_or_path": "m"}, "ner"),
        ({"architectures": ["BertForQuestionAnswering"],
          "name_or_path": "m"}, "question_answering"),
        # 1-label classifier = cross-encoder similarity head
        ({"architectures": ["BertForSequenceClassification"],
          "name_or_path": "m", "id2label": {0: "score"}}, "text_similarity"),
        # NLI label set = zero-shot capable
        ({"architectures": ["BertForSequenceClassification"],
          "name_or_path": "m",
          "id2label": {0: "a", 1: "b", 2: "c"},
          "label2id": {"CONTRADICTION": 0, "NEUTRAL": 1, "ENTAILMENT": 2}},
         "zero_shot_classification"),
        # plain sentiment labels = text classification
        ({"architectures": ["BertForSequenceClassification"],
          "name_or_path": "m",
          "id2label": {0: "neg", 1: "pos"},
          "label2id": {"neg": 0, "pos": 1}}, "text_classification"),
        ({"architectures": ["DPRQuestionEncoder"],
          "name_or_path": "m"}, "text_embedding"),
        ({"architectures": ["SomethingElse"], "name_or_path": "m"}, None),
    ],
)
def test_task_type_from_model_config(config, expect):
    assert task_type_from_model_config(config) == expect


def test_task_type_from_attr_object():
    class Cfg:
        architectures = ["RobertaForMaskedLM"]
        name_or_path = "roberta-base"
        id2label = None
        label2id = None

    assert task_type_from_model_config(Cfg()) == "fill_mask"


# --- model id normalization ----------------------------------------------


def test_elasticsearch_model_id():
    assert elasticsearch_model_id("BERT Base") == "bert__base"
    assert (
        elasticsearch_model_id("sentence-transformers/all-MiniLM-L6-v2")
        == "sentence-transformers__all-minilm-l6-v2"
    )
    # long path: keep the LAST 64 chars, strip a leading __
    long = "/very/long/path/to/some/model/dir/" + "x" * 40
    out = elasticsearch_model_id(long)
    assert len(out) <= 64 and not out.startswith("__") and out.endswith("x" * 40)


# --- TransformerModel integration ----------------------------------------


def test_transformer_model_config_qa_defaults():
    m = TransformerModel("org/qa-model", "question_answering", question="who?")
    d = m.model_config().to_dict()
    qa = d["inference_config"]["question_answering"]
    assert qa["tokenization"]["bert"]["max_sequence_length"] == 386
    assert qa["tokenization"]["bert"]["span"] == 128
    assert qa["tokenization"]["bert"]["truncate"] == "none"
    assert qa["question"] == "who?"
    assert d["description"].startswith("Model org/qa-model")


def test_transformer_model_config_embedding_and_id():
    m = TransformerModel("Org/Embed Model", "text_embedding", dim=32)
    d = m.model_config().to_dict()
    emb = d["inference_config"]["text_embedding"]
    assert emb["embedding_size"] == 32
    assert m.elasticsearch_model_id() == "org__embed__model"


def test_transformer_model_config_similarity_truncate_second():
    m = TransformerModel("m", "text_similarity", query="q")
    d = m.model_config().to_dict()
    sim = d["inference_config"]["text_similarity"]
    assert sim["tokenization"]["bert"]["truncate"] == "second"
    assert sim["text"] == "q"


def test_registry_entry_carries_config(tmp_path):
    from eland_spark.cli import register_model

    entry = register_model(
        "org/Sim Model", task_type="text_similarity", registry=str(tmp_path)
    )
    assert entry["model_id"] == "org__sim__model"
    assert "text_similarity" in entry["config"]["inference_config"]
