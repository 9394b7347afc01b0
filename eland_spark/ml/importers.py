"""Model importers: trained sklearn / XGBoost / LightGBM -> tree IR.

Reference transformer registry: eland/ml/transformers/__init__.py:27-42
with per-library serializers (sklearn.py, xgboost.py:39-284,
lightgbm.py:30-275). All imports are gated — the importer for a library
activates only when that library is installed; the IR and the Spark
scorer have no ML-library dependency.
"""

from __future__ import annotations

from typing import Any

from .tree_ir import Ensemble, Tree, TreeNode

__all__ = ["import_model", "SUPPORTED"]

SUPPORTED = [
    "sklearn.tree.DecisionTreeClassifier",
    "sklearn.tree.DecisionTreeRegressor",
    "sklearn.ensemble.RandomForestClassifier",
    "sklearn.ensemble.RandomForestRegressor",
    "sklearn.ensemble.GradientBoostingClassifier",
    "sklearn.ensemble.GradientBoostingRegressor",
    "xgboost.XGBClassifier",
    "xgboost.XGBRegressor",
    "xgboost.XGBRanker",
    "lightgbm.LGBMClassifier",
    "lightgbm.LGBMRegressor",
]


def import_model(model: Any, feature_names: list[str]) -> Ensemble:
    """Dispatch on the model's module/class name (no imports needed for
    the dispatch itself — mirrors the reference's registry lookup)."""
    cls = type(model).__name__
    mod = type(model).__module__ or ""
    if mod.startswith("sklearn.tree"):
        return _from_sklearn_tree(model, feature_names)
    if mod.startswith("sklearn.ensemble"):
        return _from_sklearn_ensemble(model, feature_names, cls)
    if mod.startswith("xgboost"):
        return _from_xgboost(model, feature_names, cls)
    if mod.startswith("lightgbm"):
        return _from_lightgbm(model, feature_names, cls)
    raise NotImplementedError(
        f"Model type {mod}.{cls} is not supported; supported: {SUPPORTED}"
    )


def _assign_class_columns(trees: list[Tree], n_classes: int) -> None:
    """Multiclass boosters emit trees round-robin per class (tree i
    scores class i % n_classes). Expand each scalar leaf into an
    n_classes vector with the margin in that tree's class column, so the
    scorer's per-column accumulation is correct."""
    for i, t in enumerate(trees):
        cls_idx = i % n_classes
        for node in t.nodes:
            if node.is_leaf and len(node.leaf_value) == 1:
                vec = [0.0] * n_classes
                vec[cls_idx] = float(node.leaf_value[0])
                node.leaf_value = vec


# -- sklearn ---------------------------------------------------------------

def _sklearn_tree_nodes(tree, is_classifier: bool) -> list[TreeNode]:
    """Convert one sklearn tree_ (arrays of children/feature/threshold/
    value) into IR nodes (reference eland/ml/transformers/sklearn.py)."""
    nodes = []
    for i in range(tree.node_count):
        if tree.children_left[i] == -1:  # sklearn leaf marker
            value = tree.value[i][0]
            if is_classifier:
                total = value.sum()
                leaf = (value / total).tolist() if total else value.tolist()
            else:
                leaf = [float(value[0])]
            nodes.append(TreeNode(node_idx=i, leaf_value=leaf))
        else:
            nodes.append(
                TreeNode(
                    node_idx=i,
                    split_feature=int(tree.feature[i]),
                    threshold=float(tree.threshold[i]),
                    left_child=int(tree.children_left[i]),
                    right_child=int(tree.children_right[i]),
                )
            )
    return nodes


def _from_sklearn_tree(model, feature_names) -> Ensemble:
    is_clf = hasattr(model, "classes_")
    tree = Tree(feature_names, _sklearn_tree_nodes(model.tree_, is_clf))
    if is_clf:
        n = len(model.classes_)
        return Ensemble(
            feature_names, [tree],
            task="binary" if n == 2 else "multiclass",
            n_classes=n, agg="sum_probs",
            classification_labels=[v.item() if hasattr(v, "item") else v
                                   for v in model.classes_],
        )
    return Ensemble(feature_names, [tree], task="regression")


def _from_sklearn_ensemble(model, feature_names, cls: str) -> Ensemble:
    is_clf = cls.endswith("Classifier")
    if cls.startswith("RandomForest"):
        trees = [
            Tree(feature_names, _sklearn_tree_nodes(e.tree_, is_clf))
            for e in model.estimators_
        ]
        n_trees = len(trees)
        if is_clf:
            n = len(model.classes_)
            # RF averages per-tree class probabilities
            return Ensemble(
                feature_names, trees,
                task="binary" if n == 2 else "multiclass",
                n_classes=n, weights=[1.0 / n_trees] * n_trees, agg="sum_probs",
                classification_labels=[v.item() if hasattr(v, "item") else v
                                       for v in model.classes_],
            )
        return Ensemble(
            feature_names, trees, task="regression",
            weights=[1.0 / n_trees] * n_trees,
        )
    if cls.startswith("GradientBoosting"):
        lr = model.learning_rate
        if is_clf and len(model.classes_) > 2:
            raise NotImplementedError("multiclass GBM import not supported")
        trees = [
            Tree(feature_names, _sklearn_tree_nodes(stage.tree_, False))
            for stage in model.estimators_[:, 0]
        ]
        import math

        init = getattr(model, "init_", None)
        if is_clf:
            # binary GBM raw init = prior log-odds (DummyClassifier has
            # class_prior_, never constant_)
            prior = getattr(init, "class_prior_", None)
            if prior is not None and 0.0 < prior[1] < 1.0:
                base = float(math.log(prior[1] / (1.0 - prior[1])))
            else:
                base = 0.0
        else:
            const = getattr(init, "constant_", None)
            base = float(const[0][0]) if const is not None else 0.0
        labels = (
            [v.item() if hasattr(v, "item") else v for v in model.classes_]
            if is_clf else None
        )
        return Ensemble(
            feature_names, trees,
            task="binary" if is_clf else "regression",
            weights=[lr] * len(trees), base_score=base,
            classification_labels=labels,
        )
    raise NotImplementedError(cls)


# -- xgboost ---------------------------------------------------------------

def ensemble_from_xgb_dump(
    dumps: list,
    feature_names: list[str],
    base_score: float = 0.5,
    model_class: str = "XGBRegressor",
    n_classes: int = 2,
    labels: list | None = None,
    dump_feature_names: list[str] | None = None,
) -> Ensemble:
    """Build the IR from a booster's ``get_dump(dump_format='json')``
    output — no xgboost import needed, so a vendored dump JSON tests
    the parser lib-free (reference eland/ml/transformers/xgboost.py
    walks the same structure). ``dumps`` items may be JSON strings or
    already-parsed dicts."""
    import json
    import math

    fmap = {f: i for i, f in enumerate(dump_feature_names or feature_names)}

    def resolve_split(name: str) -> int:
        # boosters trained on bare numpy arrays have no stored names and
        # dump splits as 'f0', 'f1', ...
        if name in fmap:
            return fmap[name]
        if name.startswith("f") and name[1:].isdigit():
            return int(name[1:])
        raise ValueError(
            f"split feature {name!r} not found in feature_names {list(fmap)}"
        )

    def walk(node, nodes, counter):
        idx = counter[0]
        counter[0] += 1
        if "leaf" in node:
            nodes.append(TreeNode(node_idx=idx, leaf_value=[float(node["leaf"])]))
            return idx
        me = TreeNode(
            node_idx=idx,
            split_feature=resolve_split(node["split"]),
            threshold=float(node["split_condition"]),
            default_left=node.get("missing", node["yes"]) == node["yes"],
        )
        nodes.append(me)
        kids = {c["nodeid"]: c for c in node["children"]}
        me.left_child = walk(kids[node["yes"]], nodes, counter)
        me.right_child = walk(kids[node["no"]], nodes, counter)
        return idx

    trees = []
    for d in dumps:
        nodes: list[TreeNode] = []
        walk(json.loads(d) if isinstance(d, str) else d, nodes, [0])
        trees.append(Tree(feature_names, nodes))

    if model_class == "XGBClassifier":
        n = int(n_classes)
        lab = labels if labels is not None else list(range(n))
        if n > 2:
            _assign_class_columns(trees, n)
            return Ensemble(
                feature_names, trees, task="multiclass", n_classes=n,
                base_score=0.0, agg="sum", classification_labels=lab,
            )
        margin = (
            math.log(base_score / (1 - base_score)) if 0 < base_score < 1 else 0.0
        )
        return Ensemble(feature_names, trees, task="binary", base_score=margin,
                        classification_labels=lab)
    return Ensemble(feature_names, trees, task="regression", base_score=base_score)


def _from_xgboost(model, feature_names, cls: str) -> Ensemble:
    """Extract the dump from a live model and delegate to the lib-free
    parser."""
    import json

    booster = model.get_booster()
    dumps = booster.get_dump(dump_format="json", with_stats=False)
    base = float(
        json.loads(booster.save_config())["learner"]["learner_model_param"].get(
            "base_score", 0.5
        )
    )
    n = int(getattr(model, "n_classes_", 2))
    labels = [v.item() if hasattr(v, "item") else v
              for v in getattr(model, "classes_", range(n))]
    return ensemble_from_xgb_dump(
        dumps,
        feature_names,
        base_score=base,
        model_class=cls,
        n_classes=n,
        labels=labels if cls == "XGBClassifier" else None,
        dump_feature_names=booster.feature_names,
    )


# -- lightgbm --------------------------------------------------------------

def ensemble_from_lgbm_dump(
    dump: dict,
    feature_names: list[str],
    model_class: str = "LGBMRegressor",
    labels: list | None = None,
) -> Ensemble:
    """Build the IR from a Booster's ``dump_model()`` dict — no lightgbm
    import needed, so a vendored dump JSON tests the parser lib-free
    (reference eland/ml/transformers/lightgbm.py walks the same
    structure). NOTE: lightgbm default splits are `<=` with a
    default_left flag — identical traversal semantics to the IR."""

    def walk(node, nodes, counter):
        idx = counter[0]
        counter[0] += 1
        if "leaf_value" in node and "split_feature" not in node:
            nodes.append(TreeNode(node_idx=idx, leaf_value=[float(node["leaf_value"])]))
            return idx
        me = TreeNode(
            node_idx=idx,
            split_feature=int(node["split_feature"]),
            threshold=float(node["threshold"]),
            default_left=bool(node.get("default_left", True)),
        )
        nodes.append(me)
        me.left_child = walk(node["left_child"], nodes, counter)
        me.right_child = walk(node["right_child"], nodes, counter)
        return idx

    trees = []
    for tinfo in dump["tree_info"]:
        nodes: list[TreeNode] = []
        walk(tinfo["tree_structure"], nodes, [0])
        trees.append(Tree(feature_names, nodes))

    if model_class == "LGBMClassifier":
        n = int(dump.get("num_class", 1)) or 1
        lab = labels if labels is not None else list(range(max(n, 2)))
        if n > 1:
            _assign_class_columns(trees, n)
            return Ensemble(feature_names, trees, task="multiclass", n_classes=n,
                            classification_labels=lab)
        return Ensemble(feature_names, trees, task="binary",
                        classification_labels=lab)
    return Ensemble(feature_names, trees, task="regression")


def _from_lightgbm(model, feature_names, cls: str) -> Ensemble:
    """Extract dump_model() from a live model and delegate to the
    lib-free parser."""
    dump = model.booster_.dump_model()
    n = int(dump.get("num_class", 1)) or 1
    labels = [v.item() if hasattr(v, "item") else v
              for v in getattr(model, "classes_", range(max(n, 2)))]
    return ensemble_from_lgbm_dump(
        dump,
        feature_names,
        model_class=cls,
        labels=labels if cls == "LGBMClassifier" else None,
    )
