"""Pins the iterative k-means (rows-only op) against a NumPy replica of
the same Lloyd recurrence: deterministic seed centroids (vec_id < k),
ties to the lowest centroid id, elementwise-mean update, float32 model.
Assignments must agree exactly; centroids to float tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.similarity.kmeans import K, N_ITER, kmeans_fit
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def numpy_lloyd(ids, X, k=K, n_iter=N_ITER):
    C = X[ids < k].copy()
    cids = ids[ids < k]
    assign = None
    for _ in range(n_iter):
        # squared L2 to every centroid; argmin ties -> lowest centroid id
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d, axis=1)  # argmin takes first (= lowest cid, sorted)
        assign = cids[best]
        for j, cid in enumerate(cids):
            mask = assign == cid
            if mask.any():
                C[j] = X[mask].mean(axis=0).astype(np.float32).astype(np.float64)
    return assign, C


def test_kmeans_matches_numpy_replica(spark, emb_np):
    ids, X = emb_np
    np_assign, np_C = numpy_lloyd(ids, X)

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    centroids, assigned = kmeans_fit(emb)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}

    mismatches = sum(
        1 for vid, cid in zip(ids, np_assign) if got[int(vid)] != int(cid)
    )
    # float32 model + double fold vs numpy vectorized sums: argmin flips are
    # only possible on near-exact distance ties; none exist in this data
    assert mismatches == 0

    spark_C = {r.cid: np.array(r.centroid, dtype=np.float64) for r in centroids}
    cids = ids[ids < K]
    for j, cid in enumerate(cids):
        assert np.allclose(spark_C[int(cid)], np_C[j], rtol=1e-5, atol=1e-6)


def test_kmeans_sse_decreases(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    _, a1 = kmeans_fit(emb, n_iter=1)
    _, a5 = kmeans_fit(emb, n_iter=N_ITER)
    sse1 = a1.agg({"sq_dist": "sum"}).collect()[0][0]
    sse5 = a5.agg({"sq_dist": "sum"}).collect()[0][0]
    assert sse5 <= sse1 + 1e-9
