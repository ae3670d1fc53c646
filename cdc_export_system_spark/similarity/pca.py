"""Distributed PCA over the embeddings table (north-star extension).

The scale shape mirrors cluster_kmeans / sim_search_pq: the cluster
reduces the corpus to a SMALL sufficient statistic — here the d-vector
sum and the d×d Gram matrix, accumulated per Arrow batch with NumPy and
partially aggregated (one ~(d² + d)-double row per batch) — the driver
eigendecomposes the 64×64 covariance (O(d³), microseconds), and the
top-k components broadcast back inside a vectorized projection UDF. The
corpus is read ONCE per pass (mean+Gram ride the same batch iterator),
never shuffled, and nothing larger than d² floats ever reaches the
driver.

Determinism: eigenvector sign is normalized (largest-|coefficient|
entry positive, ties to the lowest index) so the projection is unique;
numpy.linalg.eigh on a symmetric matrix is deterministic for a fixed
input. No SQL oracle exists for an eigendecomposition — driver check is
rows-only; the accuracy contract is pinned in tests/test_pca.py
(orthonormal components, descending explained variance, projection
equal to the exact NumPy reference, reconstruction error below total
variance).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

N_COMPONENTS = 4


def _suffstats(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """(sum_vec, gram, n) accumulated batch-locally, summed driver-side.
    The collect is |batches| rows of d²+d+1 doubles — a model, not data."""

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = emb.select("embedding").mapInPandas(
        _partials, "n long, s array<double>, g array<double>"
    ).collect()
    d = len(parts[0]["s"])
    n = sum(p["n"] for p in parts)
    s = np.sum([np.array(p["s"]) for p in parts], axis=0)
    g = np.sum([np.array(p["g"]).reshape(d, d) for p in parts], axis=0)
    return s, g, n


def pca_fit(emb: DataFrame, k: int = N_COMPONENTS) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components[k, d], explained_variance[k]) from one corpus
    pass + an O(d³) driver eigendecomposition."""
    s, g, n = _suffstats(emb)
    mean = s / n
    cov = g / n - np.outer(mean, mean)  # E[xxᵀ] - μμᵀ
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # sign normalization: largest-|coeff| entry positive (ties: lowest idx)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


@register(
    "feat_pca_project",
    tags=("ml", "feature", "similarity"),
)
def feat_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-N_COMPONENTS principal
    components (vec_id, pc1..pcN) — the dimensionality-reduction front
    of an embedding-dedup / visualization pipeline. Fit is one corpus
    pass (sufficient statistics above); projection is a second pass with
    the (k, d) model broadcast inside a vectorized NumPy matmul."""
    emb = load_table(spark, sf_dir, "embeddings")
    if not emb.take(1):  # schema-only input: nothing to fit
        return spark.createDataFrame(
            [], "vec_id long, " + ", ".join(f"pc{i + 1} double" for i in range(N_COMPONENTS))
        )
    mean, comps, _ = pca_fit(emb)

    def _project(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (x - mean) @ comps.T
            out = {"vec_id": pdf["vec_id"]}
            for i in range(comps.shape[0]):
                out[f"pc{i + 1}"] = proj[:, i]
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(
        _project,
        "vec_id long, " + ", ".join(f"pc{i + 1} double" for i in range(N_COMPONENTS)),
    )
