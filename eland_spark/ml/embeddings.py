"""Text-embedding operator (reference text_embedding NLP task,
eland/ml/pytorch/transformers.py task registry).

The container has no torch/transformers, so the MODEL is swappable: the
default is a deterministic hashed bag-of-words projection (real math,
reproducible, zero deps) with the exact plumbing a real sentence-encoder
would use — mapInPandas over Arrow batches, array<float> output column,
partition-level model init (the pattern for loading a real HF model once
per executor, not per row).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["embed_text", "hashed_embedding_batch"]


def hashed_embedding_batch(texts: pd.Series, dim: int = 64) -> list[list[float]]:
    """Deterministic stand-in encoder: tokens -> md5-hash buckets ->
    l2-normalized counts. Replace this function body with a real model's
    encode() — the Spark plumbing around it is identical."""
    out = []
    for text in texts:
        vec = np.zeros(dim, dtype="float64")
        for tok in str(text or "").lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            vec[h % dim] += 1.0
        n = np.linalg.norm(vec)
        out.append((vec / n if n else vec).astype("float32").tolist())
    return out


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    batch_size: int = 1024,
) -> DataFrame:
    """Append an embedding column. mapInPandas so the (real) model loads
    once per partition and sees Arrow record batches — the 100 TB path:
    pure map stage, no shuffle, GPU-friendly batching."""
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), True)
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model init happens HERE, once per partition (swap in torch load)
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                chunk[out_col] = hashed_embedding_batch(chunk[text_col], dim)
                yield chunk

    return df.mapInPandas(run, out_schema)
