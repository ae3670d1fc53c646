"""Accuracy pins for distributed PCA (no SQL oracle exists for an
eigendecomposition): the distributed sufficient-statistics fit must
equal the exact in-memory NumPy PCA, components must be orthonormal
with descending explained variance, and the projection must preserve
the data's variance budget."""

from __future__ import annotations

import numpy as np

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.similarity.pca import (
    N_COMPONENTS,
    feat_pca_project,
    pca_fit,
)
from tests.conftest import SF_DIR


def _local_reference(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    c = x - mean
    cov = c.T @ c / x.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def test_distributed_fit_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    x = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    ref_mean, ref_comps, ref_vals = _local_reference(x, N_COMPONENTS)

    mean, comps, vals = pca_fit(emb)
    np.testing.assert_allclose(mean, ref_mean, atol=1e-9)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-9)
    np.testing.assert_allclose(comps, ref_comps, atol=1e-7)

    # contract: orthonormal rows, descending explained variance
    np.testing.assert_allclose(comps @ comps.T, np.eye(N_COMPONENTS), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))

    # projection matches the reference matmul row-for-row
    proj = {
        r["vec_id"]: [r[f"pc{i + 1}"] for i in range(N_COMPONENTS)]
        for r in feat_pca_project(spark, SF_DIR).collect()
    }
    ref = (x - ref_mean) @ ref_comps.T
    for idx, r in enumerate(rows):
        np.testing.assert_allclose(proj[r["vec_id"]], ref[idx], atol=1e-7)

    # the top-k subspace captures a positive, bounded share of variance
    total_var = ((x - ref_mean) ** 2).sum(axis=1).mean()
    explained = vals.sum()
    assert 0 < explained <= total_var + 1e-9


def test_power_exact_matches_numpy_top_direction(spark):
    """The exact-integer repeated-squaring direction aligns with NumPy's
    top eigenvector (|cos| > 0.999) and the Rayleigh eigenvalue agrees
    within the 1e-3 quantization error; the canonical sign convention
    (largest-|loading| dim positive) holds."""
    from cdc_export_system_spark.similarity.pca import feat_pca_power_exact

    rows = feat_pca_power_exact(spark, SF_DIR).orderBy("pos").collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    x = np.stack(
        [
            np.array(r["embedding"], dtype=np.float64)
            for r in emb.select("embedding").collect()
        ]
    )
    xc = x - x.mean(axis=0)
    w, v = np.linalg.eigh(xc.T @ xc)
    top = v[:, -1]
    mine = np.array([r["loading_q"] for r in rows], dtype=np.float64)
    mine /= np.linalg.norm(mine)
    assert abs(float(top @ mine)) > 0.999
    assert abs(rows[0]["ev6"] / 1e6 - w[-1]) < 0.05 * w[-1]
    assert mine[int(np.argmax(np.abs(mine)))] > 0  # canonical sign
