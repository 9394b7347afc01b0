"""Portable tree-model IR.

Reference: eland serializes sklearn/XGBoost/LightGBM models into an ES
trained-model JSON of TreeNode/Tree/Ensemble parts with gzip+b64
compression (eland/ml/_model_serializer.py:26-178). This keeps the same
IR shape — it is the interchange format between importers and the Spark
scorer — but scoring happens in executors via a broadcast model +
vectorized numpy evaluation (no server inference endpoint).
"""

from __future__ import annotations

import base64
import gzip
import json
from dataclasses import dataclass, field

import numpy as np

__all__ = ["TreeNode", "Tree", "Ensemble"]


@dataclass
class TreeNode:
    """One split or leaf (reference eland/ml/_model_serializer.py TreeNode).

    Split nodes: split_feature (index), threshold, default_left governs
    NaN routing; children by node id. Leaf nodes: leaf_value (list for
    multiclass probabilities; single for regression/binary margin).
    """

    node_idx: int
    split_feature: int | None = None
    threshold: float | None = None
    left_child: int | None = None
    right_child: int | None = None
    default_left: bool = True
    leaf_value: list[float] | None = None

    @property
    def is_leaf(self) -> bool:
        return self.leaf_value is not None

    def to_dict(self) -> dict:
        d = {"node_index": self.node_idx}
        if self.is_leaf:
            d["leaf_value"] = self.leaf_value
        else:
            d.update(
                split_feature=self.split_feature,
                threshold=self.threshold,
                left_child=self.left_child,
                right_child=self.right_child,
                default_left=self.default_left,
            )
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "TreeNode":
        return cls(
            node_idx=d["node_index"],
            split_feature=d.get("split_feature"),
            threshold=d.get("threshold"),
            left_child=d.get("left_child"),
            right_child=d.get("right_child"),
            default_left=d.get("default_left", True),
            leaf_value=d.get("leaf_value"),
        )


@dataclass
class Tree:
    feature_names: list[str]
    nodes: list[TreeNode] = field(default_factory=list)

    def predict_row(self, x: np.ndarray) -> np.ndarray:
        """Reference traversal for tests (the scorer vectorizes this)."""
        by_idx = {n.node_idx: n for n in self.nodes}
        node = by_idx[0]
        while not node.is_leaf:
            v = x[node.split_feature]
            if np.isnan(v):
                go_left = node.default_left
            else:
                go_left = v <= node.threshold
            node = by_idx[node.left_child if go_left else node.right_child]
        return np.asarray(node.leaf_value, dtype="float64")

    def to_dict(self) -> dict:
        return {
            "feature_names": self.feature_names,
            "tree_structure": [n.to_dict() for n in self.nodes],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Tree":
        return cls(
            feature_names=d["feature_names"],
            nodes=[TreeNode.from_dict(n) for n in d["tree_structure"]],
        )


@dataclass
class Ensemble:
    """Weighted tree ensemble (reference Ensemble aggregator):
    regression -> weighted sum (+ base_score); binary classification ->
    sigmoid of summed margins; multiclass -> softmax of per-class sums /
    or vote-sum of per-tree probability leaves (agg='sum_probs')."""

    feature_names: list[str]
    trees: list[Tree]
    task: str = "regression"  # regression | binary | multiclass
    n_classes: int = 2
    weights: list[float] | None = None
    base_score: float = 0.0
    agg: str = "sum"  # sum (margins) | sum_probs (prob leaves, sklearn RF)
    # original class labels, argmax maps through these on predict
    # (reference stores classification_labels for the same reason)
    classification_labels: list | None = None

    # -- serialization (gzip+b64 envelope like the reference's
    #    compressed definition) ----------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "feature_names": self.feature_names,
                "task": self.task,
                "n_classes": self.n_classes,
                "weights": self.weights,
                "base_score": self.base_score,
                "agg": self.agg,
                "classification_labels": self.classification_labels,
                "trees": [t.to_dict() for t in self.trees],
            }
        )

    def serialize(self) -> str:
        return base64.b64encode(gzip.compress(self.to_json().encode())).decode()

    @classmethod
    def from_json(cls, s: str) -> "Ensemble":
        d = json.loads(s)
        return cls(
            feature_names=d["feature_names"],
            trees=[Tree.from_dict(t) for t in d["trees"]],
            task=d.get("task", "regression"),
            n_classes=d.get("n_classes", 2),
            weights=d.get("weights"),
            base_score=d.get("base_score", 0.0),
            agg=d.get("agg", "sum"),
            classification_labels=d.get("classification_labels"),
        )

    @classmethod
    def deserialize(cls, s: str) -> "Ensemble":
        return cls.from_json(gzip.decompress(base64.b64decode(s)).decode())

    # -- reference (non-vectorized) evaluation for tests ----------------
    def predict_row(self, x: np.ndarray, output: str = "predict") -> float | int | np.ndarray:
        w = self.weights or [1.0] * len(self.trees)
        acc = None
        for t, wi in zip(self.trees, w):
            v = t.predict_row(x) * wi
            acc = v if acc is None else acc + v
        acc = acc + self.base_score
        if self.task == "regression":
            return float(acc[0])
        if self.task == "binary":
            if self.agg == "sum_probs":
                probs = acc / acc.sum()
            else:
                p1 = 1.0 / (1.0 + np.exp(-acc[0]))
                probs = np.array([1 - p1, p1])
        else:
            if self.agg == "sum_probs":
                probs = acc / acc.sum()
            else:
                e = np.exp(acc - acc.max())
                probs = e / e.sum()
        if output == "probability":
            return probs
        idx = int(np.argmax(probs))
        if self.classification_labels is not None:
            return self.classification_labels[idx]
        return idx
