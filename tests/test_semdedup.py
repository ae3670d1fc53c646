"""Pins dedup_semantic_semdedup's exact keep-set against a NumPy replica
of the full SemDeDup pipeline: the same deterministic Lloyd k-means as
tests/test_kmeans.py, then within-cluster pairwise cosine with the same
micro-int threshold and the same keep-lowest drop rule. Also asserts the
threshold is not knife-edge in this data (no pair within 1e-4 of tau),
so an ulp of engine float difference cannot flip membership."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_export_system_spark.dedup.semantic import SEMDEDUP_TAU_MICRO
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR
from tests.test_kmeans import numpy_lloyd


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


def numpy_semdedup_keep(ids, X) -> set[int]:
    assign, _ = numpy_lloyd(ids, X)
    # the micro-int gate floor(cos*1e6 + 0.5) >= TAU flips at this cosine
    boundary = (SEMDEDUP_TAU_MICRO - 0.5) / 1_000_000
    norms = np.linalg.norm(X, axis=1)
    dropped: set[int] = set()
    margins = []
    for cid in np.unique(assign):
        idx = np.where(assign == cid)[0]
        for i_pos, i in enumerate(idx):
            for j in idx[i_pos + 1 :]:
                a, b = (i, j) if ids[i] < ids[j] else (j, i)
                cos = X[a] @ X[b] / (norms[a] * norms[b])
                cos_micro = np.floor(cos * 1_000_000 + 0.5)
                margins.append(abs(cos - boundary))
                if cos_micro >= SEMDEDUP_TAU_MICRO:
                    dropped.add(int(ids[b]))
    # guard: no pair may sit so close to the rounding boundary that an
    # ulp of engine fold-order difference (~1e-15 for 64-dim doubles)
    # could flip membership
    assert min(margins) > 1e-9, "tau on a float knife-edge for a real pair"
    return {int(v) for v in ids} - dropped


def test_semdedup_keep_set_matches_numpy(spark, emb_np):
    from cdc_export_system_spark.dedup.semantic import dedup_semantic_semdedup

    ids, X = emb_np
    expected = numpy_semdedup_keep(ids, X)
    got_rows = dedup_semantic_semdedup(spark, SF_DIR).collect()
    got = {r.vec_id for r in got_rows}
    assert got == expected
    assert len(got) < len(ids), "threshold should drop at least one duplicate"


def test_semdedup_deterministic_rerun(spark):
    from cdc_export_system_spark.dedup.semantic import dedup_semantic_semdedup

    a = {r.vec_id for r in dedup_semantic_semdedup(spark, SF_DIR).collect()}
    b = {r.vec_id for r in dedup_semantic_semdedup(spark, SF_DIR).collect()}
    assert a == b
