"""Document chunking for training-data / RAG pipelines.

No reference analog (eland has no text-splitting surface); this is the
standard pre-tokenization step of an LLM data pipeline: split each
document into fixed-size (optionally overlapping) windows, or on a
separator pattern, carrying (doc_id, chunk_id) lineage.

Scale shape: every splitter here is a zero-shuffle projection —
``sequence`` + ``posexplode`` generated JVM-side, so a 100 TB corpus
chunks in one map-only pass with whole-stage codegen and the output
inherits the input partitioning (no exchange, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F


def chunk_text(
    sdf: SparkDataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 500,
    overlap: int = 0,
    unit: str = "chars",
) -> SparkDataFrame:
    """Split each document into windows of ``size`` chars/words with
    ``overlap`` units shared between consecutive chunks.

    Returns (id_col, chunk_id, chunk, chunk_len) — chunk_id is the
    0-based window ordinal. Empty/null documents yield no rows (like a
    tokenizer would drop them). ``unit='words'`` windows over
    whitespace tokens and rejoins with single spaces.

    Plan: ``sequence(0, len-1, step)`` + ``posexplode`` + ``substring``
    (or ``slice``+``array_join``) — map-only, zero shuffle, no UDF.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    text = F.col(text_col)
    if unit == "chars":
        n = F.length(text)
        starts = F.sequence(F.lit(0), n - 1, F.lit(step))
        out = (
            sdf.where(text.isNotNull() & (F.length(text) > 0))
            .select(
                F.col(id_col),
                F.posexplode(starts).alias("chunk_id", "__start__"),
                text.alias("__t__"),
            )
            .select(
                id_col,
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.substring(F.col("__t__"), F.col("__start__") + 1, size).alias(
                    "chunk"
                ),
            )
        )
    elif unit == "words":
        toks = F.split(F.trim(text), r"\s+")
        n = F.size(toks)
        starts = F.sequence(F.lit(0), n - 1, F.lit(step))
        out = (
            sdf.where(text.isNotNull() & (F.length(F.trim(text)) > 0))
            .select(
                F.col(id_col),
                F.posexplode(starts).alias("chunk_id", "__start__"),
                toks.alias("__toks__"),
            )
            .select(
                id_col,
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.array_join(
                    # slice() is 1-based on the start index
                    F.slice(F.col("__toks__"), F.col("__start__") + 1, size),
                    " ",
                ).alias("chunk"),
            )
        )
    else:
        raise ValueError(f"unit must be 'chars' or 'words', got {unit!r}")
    return out.withColumn("chunk_len", F.length("chunk").cast("long"))


def chunk_by_separator(
    sdf: SparkDataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n\n+",
    keep_empty: bool = False,
) -> SparkDataFrame:
    """Split each document on a separator regex (paragraphs by
    default), keeping (id_col, part_id, part) lineage. Zero shuffle —
    ``split`` + ``posexplode`` projection.
    """
    parts = F.split(F.col(text_col), sep)
    out = sdf.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(parts).alias("part_id", "part"),
    )
    if not keep_empty:
        out = out.where(F.length(F.trim("part")) > 0)
    return out.select(
        id_col,
        F.col("part_id").cast("long").alias("part_id"),
        F.col("part"),
    )


def chunk_token_windows(
    sdf: SparkDataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 16,
) -> SparkDataFrame:
    """Sugar: word-unit chunking sized for a token budget (the common
    'pack into model context' pre-pass; pairs with
    operators.packing.pack_documents for bin assembly). Adds a
    whitespace token count per chunk."""
    out = chunk_text(
        sdf, text_col, id_col, size=max_tokens, overlap=overlap, unit="words"
    )
    return out.withColumn(
        "n_tokens",
        F.when(F.length("chunk") == 0, F.lit(0))
        .otherwise(F.size(F.split(F.col("chunk"), r"\s+")))
        .cast("long"),
    )
