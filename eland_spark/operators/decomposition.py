"""Distributed linear decomposition over embedding columns.

No reference analog (eland ships model *inference*, not feature
decomposition); this is the dimensionality-reduction pre-pass of an
embedding pipeline: covariance/PCA before ANN indexing, and
Johnson-Lindenstrauss random projection as the oblivious alternative.

Scale shape: the only data-sized pass is one mapInPandas scan that
reduces each Arrow batch to d(d+1)/2 + d + 1 moment scalars (numpy
``X.T @ X`` per batch — vectorized, no per-row Python); everything
after that aggregation is O(d^2) rows regardless of corpus size, so
the shuffle for a 100 TB embedding table is a few KB per partition.
The eigendecomposition runs on the driver over the d x d matrix (d is
model-sized, not data-sized) — the standard big-data PCA split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F


def _moment_frame(sdf: SparkDataFrame, col: str) -> SparkDataFrame:
    """One scan -> per-batch second/first moments as (kind, i, j, v):
    kind 0 = sum(x_i * x_j) for i <= j (1-based), kind 1 = sum(x_i)
    at (i, 0), kind 2 = row count at (0, 0). Aggregated by key, the
    result is exact float64 moments of the whole column."""
    out_schema = "kind int, i int, j int, v double"

    def emit(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            G = X.T @ X
            s = X.sum(axis=0)
            d = X.shape[1]
            iu, ju = np.triu_indices(d)
            rows = {
                "kind": np.concatenate(
                    [np.zeros(len(iu), dtype=np.int32),
                     np.ones(d, dtype=np.int32),
                     np.array([2], dtype=np.int32)]
                ),
                "i": np.concatenate(
                    [(iu + 1).astype(np.int32),
                     np.arange(1, d + 1, dtype=np.int32),
                     np.array([0], dtype=np.int32)]
                ),
                "j": np.concatenate(
                    [(ju + 1).astype(np.int32),
                     np.zeros(d, dtype=np.int32),
                     np.array([0], dtype=np.int32)]
                ),
                "v": np.concatenate(
                    [G[iu, ju], s, np.array([float(len(X))])]
                ),
            }
            yield pd.DataFrame(rows)

    return (
        sdf.select(col)
        .mapInPandas(emit, schema=out_schema)
        .groupBy("kind", "i", "j")
        .agg(F.sum("v").alias("v"))
    )


def covariance_matrix(
    sdf: SparkDataFrame, col: str = "embedding", ddof: int = 1
) -> SparkDataFrame:
    """Sample covariance of an array<float> column as (i, j, cov) rows
    (1-based, upper triangle i <= j). cov_ij = (PP_ij - S_i S_j / n)
    / (n - ddof); assembly is a join over the O(d^2)-row moment table,
    so the plan is one scan + tiny post-agg joins."""
    m = _moment_frame(sdf, col)
    pp = m.where(F.col("kind") == 0).select("i", "j", F.col("v").alias("pp"))
    s = m.where(F.col("kind") == 1).select(
        F.col("i").alias("si_i"), F.col("v").alias("s")
    )
    n = m.where(F.col("kind") == 2).select(F.col("v").alias("n"))
    return (
        pp.crossJoin(F.broadcast(n))
        .join(F.broadcast(s), F.col("i") == F.col("si_i"))
        .drop("si_i")
        .withColumnRenamed("s", "s_i")
        .join(
            F.broadcast(s.withColumnRenamed("s", "s_j")),
            F.col("j") == F.col("si_i"),
        )
        .select(
            "i",
            "j",
            (
                (F.col("pp") - F.col("s_i") * F.col("s_j") / F.col("n"))
                / (F.col("n") - F.lit(ddof))
            ).alias("cov"),
        )
    )


def pca(sdf: SparkDataFrame, col: str = "embedding", k: int = 8):
    """Principal components of an array<float> column.

    Returns (mean: list[float], components: list[list[float]] k x d,
    explained_variance: list[float]) — components sign-fixed so the
    largest-|.| entry of each is positive (deterministic across runs).
    One distributed scan (moments); eigh of the d x d covariance on the
    driver via numpy.
    """
    import numpy as np

    rows = _moment_frame(sdf, col).collect()
    n = next(r["v"] for r in rows if r["kind"] == 2)
    d = max(r["i"] for r in rows if r["kind"] == 1)
    s = np.zeros(d)
    C = np.zeros((d, d))
    for r in rows:
        if r["kind"] == 1:
            s[r["i"] - 1] = r["v"]
        elif r["kind"] == 0:
            C[r["i"] - 1, r["j"] - 1] = r["v"]
            C[r["j"] - 1, r["i"] - 1] = r["v"]
    mean = s / n
    cov = (C - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        [float(x) for x in mean],
        comps,
        [float(evals[idx]) for idx in order],
    )


def project(
    sdf: SparkDataFrame,
    components: list[list[float]],
    col: str = "embedding",
    mean: list[float] | None = None,
    out_col: str = "proj",
) -> SparkDataFrame:
    """Project onto fixed component vectors: out_col = array<double> of
    dot(x - mean, c_j). Pure Column fold (zip_with + aggregate) — JVM
    expressions, zero shuffle; dot(x, c) - dot(mean, c) avoids
    materializing the centered vector."""
    from .similarity import _vec_lit, dot

    x = F.col(col)
    projs = []
    for c in components:
        p = dot(x, _vec_lit(c))
        if mean is not None:
            shift = sum(m * ci for m, ci in zip(mean, c))
            p = p - F.lit(float(shift))
        projs.append(p)
    return sdf.withColumn(out_col, F.array(*projs))


def random_projection_matrix(
    dim: int, k: int = 8, seed: int = 7
) -> list[list[float]]:
    """Johnson-Lindenstrauss projection rows via the engine-portable
    LCG (same generator as similarity.random_hyperplanes), scaled by
    1/sqrt(k) so squared distances are preserved in expectation."""
    import math

    from .similarity import random_hyperplanes

    scale = 1.0 / math.sqrt(k)
    return [
        [x * scale for x in row]
        for row in random_hyperplanes(dim, n_planes=k, seed=seed)
    ]
