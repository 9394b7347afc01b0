"""Learning-to-rank feature extraction.

Reference: eland's LTR surface is an ``LTRModelConfig`` of named
``QueryFeatureExtractor``s — templated Elasticsearch queries whose match
scores become model features — plus a ``FeatureLogger`` that runs one
templated search per query and assembles the per-document feature
matrix, NaN for non-matching docs
(eland/ml/ltr/ltr_model_config.py:25-157,
eland/ml/ltr/feature_logger.py:30-163).

Spark-native re-expression: a feature extractor is a SQL expression
template over the document table's columns; ``{param}`` placeholders are
substituted per query at extraction time. Feature logging is then a
single select over the judgment-filtered frame — one codegen'd
projection, no per-feature round trips, and at 100 TB the judgment
filter is a broadcast semi-join on the doc id, never a full scan per
query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["QueryFeatureExtractor", "LTRModelConfig", "FeatureLogger"]


@dataclass
class QueryFeatureExtractor:
    """One named feature: a SQL expression template over document
    columns. ``{param}`` placeholders are filled from the query params
    (values are SQL-escaped as string literals); a NULL result becomes
    the ``default_score`` (reference default: NaN for non-match)."""

    feature_name: str
    expr_template: str
    default_score: float | None = None

    def resolve(self, params: dict[str, object]) -> F.Column:
        rendered = self.expr_template
        for k, v in params.items():
            if isinstance(v, str):
                lit = "'" + v.replace("'", "''") + "'"
            else:
                lit = str(v)
            rendered = rendered.replace("{" + k + "}", lit)
        col = F.expr(rendered).cast("double")
        if self.default_score is not None:
            col = F.coalesce(col, F.lit(float(self.default_score)))
        return col.alias(self.feature_name)

    def to_dict(self) -> dict[str, object]:
        """Serializable config entry (reference FeatureExtractor.to_dict,
        eland/ml/ltr/ltr_model_config.py:43-51): ``{type: {fields}}``
        with None-valued fields dropped."""
        body: dict[str, object] = {
            "feature_name": self.feature_name,
            "expr_template": self.expr_template,
        }
        if self.default_score is not None:
            body["default_score"] = self.default_score
        return {"query_extractor": body}


@dataclass
class LTRModelConfig:
    """Ordered collection of feature extractors (reference
    LTRModelConfig). ``feature_names`` order defines the model's input
    vector layout."""

    feature_extractors: list[QueryFeatureExtractor] = field(default_factory=list)

    @property
    def feature_names(self) -> list[str]:
        return [e.feature_name for e in self.feature_extractors]

    @property
    def query_feature_extractors(self) -> list[QueryFeatureExtractor]:
        """All query-typed extractors (reference
        ltr_model_config.py:144-152; here every extractor is one)."""
        return [
            e for e in self.feature_extractors
            if isinstance(e, QueryFeatureExtractor)
        ]

    def feature_index(self, feature_name: str) -> int:
        """Position of ``feature_name`` in the model's input vector
        (reference ltr_model_config.py:154-157)."""
        return self.feature_names.index(feature_name)

    def to_dict(self) -> dict[str, object]:
        """Registry-serializable config (reference
        ltr_model_config.py:122-132)."""
        return {
            "learning_to_rank": {
                "feature_extractors": [
                    e.to_dict() for e in self.feature_extractors
                ]
            }
        }


class FeatureLogger:
    """Batch feature extraction over a document frame (reference
    FeatureLogger.extract_features)."""

    def __init__(self, df: DataFrame, id_col: str, config: LTRModelConfig):
        self._df = df
        self._id_col = id_col
        self._config = config

    def extract_features(
        self, params: dict[str, object], doc_ids: list[object] | None = None
    ) -> DataFrame:
        """Feature matrix (id_col, *feature_names) for the judged docs.

        ``doc_ids=None`` scores every document. The id filter uses
        ``isin`` (compiles to an In predicate pushed to the scan) for
        literal lists; large judgment lists should be joined instead —
        see ``extract_features_join``.
        """
        sdf = self._df
        if doc_ids is not None:
            sdf = sdf.filter(F.col(self._id_col).isin(list(doc_ids)))
        feats = [e.resolve(params) for e in self._config.feature_extractors]
        return sdf.select(F.col(self._id_col), *feats)

    def extract_features_join(
        self, params: dict[str, object], judgments: DataFrame
    ) -> DataFrame:
        """Scale path: judgment list as a DataFrame, broadcast
        semi-joined on the id column — the 100 TB shape (judgments are
        small; the document table is not)."""
        sdf = self._df.join(
            F.broadcast(judgments.select(self._id_col).distinct()),
            on=self._id_col,
            how="left_semi",
        )
        feats = [e.resolve(params) for e in self._config.feature_extractors]
        return sdf.select(F.col(self._id_col), *feats)
