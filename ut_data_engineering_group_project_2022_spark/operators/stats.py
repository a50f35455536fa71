"""Distributed second-moment statistics over embedding columns.

``embedding_moments`` computes the full mean vector and covariance
matrix of an ``array<float>`` column in one distributed pass — the
primitive behind PCA whitening, Mahalanobis outlier scoring, and
feature-drift monitoring in a training-data pipeline.
``pca_whiten`` builds on it: eigendecompose the (dim x dim) covariance
on the driver — a dim-sized artifact, like k-means centroids — and
project the corpus through the whitening matrix distributedly.

Why not explode? A 64-dim covariance needs all 64x64 cross products;
exploding twice is a 4096x row blow-up *before* the shuffle — dead at
100 TB. The scale plan used here is the classic map-side moment
aggregation instead:

  1. ``mapInPandas`` folds each Arrow batch into ONE partial-moment
     row set: ``n``, the 64 component sums, and the 2080 upper-triangle
     product sums (numpy ``X.T @ X`` per batch, float64).
  2. The partials (one row set per Arrow batch, ~thousands of floats
     each) are summed with ``groupBy(i, j)`` — a shuffle of
     O(batches x d^2/2) tiny rows, independent of the corpus size.
  3. Covariance finalizes JVM-side: ``cov = sxy/n - mean_i * mean_j``.

At 1000 executors over 100 TB this moves only a few MB per batch to
the shuffle, and the Python boundary is Arrow-vectorized numpy, not
per-row work. The registered covariance query's DuckDB oracle
recomputes the same matrix by brute-force UNNEST self-join, which is
fine at sf0.01 and exactly what step 1 avoids at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(vec_col: str, dim: int):
    """mapInPandas fn: fold each Arrow batch into flat moment rows.

    Encoding (summable under groupBy(i, j) + SUM(s)):
      * (i, j)  with 0 <= i <= j < dim : sum of x_i * x_j
      * (i, -1)                        : sum of x_i
      * (-1, -1)                       : row count
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iu, ju = np.triu_indices(dim)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            sxy = x.T @ x
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dim), [-1]]),
                    "j": np.concatenate([ju, np.full(dim, -1), [-1]]),
                    "s": np.concatenate(
                        [sxy[iu, ju], x.sum(axis=0), [float(x.shape[0])]]
                    ),
                }
            )

    return fn


def _summed_moments(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    partials = emb.select(vec_col).mapInPandas(
        _moment_partials(vec_col, dim), schema="i int, j int, s double"
    )
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def embedding_moments(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Upper-triangle covariance of ``vec_col``: rows ``(i, j, cov)``.

    ``cov`` is the population covariance (divide by n), rounded to 6
    decimals to pin float associativity differences across engines.
    """
    summed = _summed_moments(emb, vec_col, dim)
    n = summed.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    means = summed.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("mi"), F.col("s").alias("sx")
    )
    pairs = summed.filter(F.col("j") >= 0)
    return (
        pairs.join(F.broadcast(n))
        .join(F.broadcast(means.withColumnRenamed("mi", "i_")), F.col("i") == F.col("i_"))
        .drop("i_")
        .withColumnRenamed("sx", "sx_i")
        .join(
            F.broadcast(
                means.select(F.col("mi").alias("j_"), F.col("sx").alias("sx_j"))
            ),
            F.col("j") == F.col("j_"),
        )
        .drop("j_")
        .select(
            "i",
            "j",
            F.round(
                F.col("s") / F.col("n")
                - (F.col("sx_i") / F.col("n")) * (F.col("sx_j") / F.col("n")),
                6,
            ).alias("cov"),
        )
    )


def pca_whiten(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 8,
) -> DataFrame:
    """Project ``vec_col`` onto its top-``k`` whitened principal axes.

    Returns ``(id_col, pc0..pc{k-1})`` where the components are
    centered, unit-variance, and mutually decorrelated (cov ~ I) — the
    embedding-whitening step that improves cosine-based near-dup and
    retrieval quality on anisotropic embedding spaces.

    Plan: one distributed moment pass (see module docstring), then the
    (dim x dim) covariance — a DIM-sized artifact, independent of the
    corpus — is eigendecomposed on the driver with numpy and the
    whitening matrix ships back broadcast inside an Arrow
    ``mapInPandas`` projection (per-batch numpy matmul, no per-row
    Python). Two corpus passes total, no shuffle of the corpus itself.

    Eigenvector sign is pinned (largest-|component| coordinate made
    positive) so output is reproducible across runs; components are
    rounded to 4 decimals because eigendecomposition amplifies the
    ~1e-12 summation-order jitter of the float moment sums (the same
    reason this op has no SQL oracle — tests/test_stats.py gates it
    closed-form instead: cov(output) ~ I, mean ~ 0, run-to-run match).
    """
    import numpy as np

    rows = _summed_moments(emb, vec_col, dim).collect()
    n = 0.0
    sx = np.zeros(dim)
    sxy = np.zeros((dim, dim))
    for r in rows:
        if r["i"] == -1:
            n = r["s"]
        elif r["j"] == -1:
            sx[r["i"]] = r["s"]
        else:
            sxy[r["i"], r["j"]] = r["s"]
            sxy[r["j"], r["i"]] = r["s"]
    mean = sx / n
    cov = sxy / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    lam, v = eigval[order], eigvec[:, order]
    # Sign convention: the largest-|x| coordinate of each axis is positive.
    flips = np.sign(v[np.abs(v).argmax(axis=0), np.arange(k)])
    v = v * flips
    whiten = v / np.sqrt(np.maximum(lam, 1e-12))  # (dim, k)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            z = np.round((x - mean) @ whiten, 4)
            out = pd.DataFrame({id_col: pdf[id_col].to_numpy()})
            for c in range(k):
                out[f"pc{c}"] = z[:, c]
            yield out

    schema = f"{id_col} bigint, " + ", ".join(f"pc{c} double" for c in range(k))
    return emb.select(id_col, vec_col).mapInPandas(project, schema=schema)


def mahalanobis_diag(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Diagonal-Mahalanobis outlier score per vector: ``(id, maha2)``.

    ``maha2 = sum_i ((x_i - mean_i) / std_i)^2`` — the standard cheap
    embedding-outlier score (full Mahalanobis needs the inverse
    covariance; the diagonal form is the per-dimension z-score energy).

    Scale plan: per-dimension mean/std come from the distributed moment
    pass (diagonal rows only), are ROUNDED to 6 decimals (so any other
    engine computing the same stats agrees bit-for-bit on the
    constants), collected — 64 numbers, corpus-independent — and
    embedded as array literals in a ``zip_with``+``aggregate`` fold:
    pure JVM column expressions, NO per-dimension explode of the corpus
    and no shuffle in the scoring pass.
    """
    summed = _summed_moments(emb, vec_col, dim)
    diag = {
        (r["i"], r["j"]): r["s"]
        for r in summed.filter(
            (F.col("i") == F.col("j")) | (F.col("j") == -1)
        ).collect()
    }
    n = diag[(-1, -1)]
    means = [round(diag[(i, -1)] / n, 6) for i in range(dim)]
    stds = [
        round((diag[(i, i)] / n - (diag[(i, -1)] / n) ** 2) ** 0.5, 6)
        for i in range(dim)
    ]
    m_arr = F.array(*[F.lit(v) for v in means])
    s_arr = F.array(*[F.lit(v) for v in stds])
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    z2 = F.zip_with(
        F.zip_with(x, m_arr, lambda a, b: a - b),
        s_arr,
        lambda d, s: (d / s) * (d / s),
    )
    return emb.select(
        id_col,
        F.aggregate(z2, F.lit(0.0), lambda acc, v: acc + v).alias("maha2"),
    )
