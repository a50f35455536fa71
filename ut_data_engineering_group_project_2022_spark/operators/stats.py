"""Distributed second-moment statistics over embedding columns.

``embedding_moments`` computes the full mean vector and covariance
matrix of an ``array<float>`` column in one distributed pass — the
primitive behind PCA whitening, Mahalanobis outlier scoring, and
feature-drift monitoring in a training-data pipeline.

Why not explode? A 64-dim covariance needs all 64x64 cross products;
exploding twice is a 4096x row blow-up *before* the shuffle — dead at
100 TB. The scale plan used here is the classic map-side moment
aggregation instead:

  1. ``mapInPandas`` folds each Arrow batch into ONE partial-moment
     row: ``n``, the 64 component sums, and the 2080 upper-triangle
     product sums (numpy ``X.T @ X`` per batch, float64).
  2. The partials (one row per Arrow batch, ~thousands of floats each)
     are exploded and summed with ``groupBy(i, j)`` — a shuffle of
     O(batches x d^2/2) tiny rows, independent of the corpus size.
  3. Covariance finalizes JVM-side: ``cov = sxy/n - mean_i * mean_j``.

At 1000 executors over 100 TB this moves only a few MB per batch to
the shuffle, and the Python boundary is Arrow-vectorized numpy, not
per-row work. The registered query's DuckDB oracle recomputes the same
matrix by brute-force UNNEST self-join, which is fine at sf0.01 and
exactly what step 1 avoids at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Upper-triangle covariance of ``vec_col``: rows ``(i, j, cov)``.

    ``cov`` is the population covariance (divide by n), rounded to 6
    decimals to pin float associativity differences across engines.
    """

    def partial_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            n = float(x.shape[0])
            sx = x.sum(axis=0)
            sxy = x.T @ x
            iu, ju = np.triu_indices(dim)
            # One row per (i, j) pair plus one sum row per component
            # (j = -1) and a single count row (i = j = -1): a flat,
            # summable encoding of the moment triple.
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dim), [-1]]),
                    "j": np.concatenate([ju, np.full(dim, -1), [-1]]),
                    "s": np.concatenate([sxy[iu, ju], sx, [n]]),
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        partial_moments, schema="i int, j int, s double"
    )
    summed = partials.groupBy("i", "j").agg(F.sum("s").alias("s"))
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
