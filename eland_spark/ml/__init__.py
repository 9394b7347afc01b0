from .tree_ir import Ensemble, Tree, TreeNode
from .ml_model import MLModel

__all__ = ["TreeNode", "Tree", "Ensemble", "MLModel"]
