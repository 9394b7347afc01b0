"""Scalar/column function library.

The reference has no scalar-function surface beyond Painless arithmetic
(SURVEY §2.10); this package is the engine's built-in library for the
training-data extensions. Everything returns a pyspark Column built
from JVM-side expressions — usable in select/filter on any frame, and
whole-stage-codegen'd on the hot path.
"""

from ..operators.dedup import ngram_jaccard, normalized_tokens, shingles
from ..operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    rolling_hash,
    stopword_ratio,
    token_count,
    tokens,
    vocabulary,
)
from ..operators.similarity import cosine, dot, norm

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_length",
    "quality_score",
    "lang_id",
    "fingerprint",
    "rolling_hash",
    "vocabulary",
    "normalized_tokens",
    "shingles",
    "ngram_jaccard",
    "dot",
    "norm",
    "cosine",
]
