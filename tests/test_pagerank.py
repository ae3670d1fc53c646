"""Pins the iterative PageRank (rows-only op) against a NumPy replica of
the same power iteration: symmetric co-purchase edges, uniform init,
r <- (1-d)/N + d * A^T (r / deg), PAGERANK_ITERS rounds. Node sets must
agree exactly; ranks to float tolerance (the Spark sum order differs)."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_export_system_spark.operators.graph import (
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
    _edges,
    graph_pagerank,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def edges_np(spark):
    rows = _edges(spark, SF_DIR).collect()
    return [(r.pa, r.pb) for r in rows]


def numpy_pagerank(pairs, n_iter=PAGERANK_ITERS, d=PAGERANK_DAMPING):
    nodes = sorted({p for pair in pairs for p in pair})
    idx = {p: i for i, p in enumerate(nodes)}
    n = len(nodes)
    out = [[] for _ in range(n)]  # out[src] = dsts (symmetric)
    for a, b in pairs:
        out[idx[a]].append(idx[b])
        out[idx[b]].append(idx[a])
    deg = np.array([len(o) for o in out], dtype=np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        share = r / deg
        for s, dsts in enumerate(out):
            for t in dsts:
                nxt[t] += share[s]
        r = (1 - d) / n + d * nxt
    return {nodes[i]: r[i] for i in range(n)}

def test_pagerank_matches_numpy_power_iteration(spark, edges_np):
    want = numpy_pagerank(edges_np)
    got = {r.node: r.rank for r in graph_pagerank(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    for node, rank in want.items():
        assert abs(got[node] - rank) < 1e-9, (node, got[node], rank)


def test_pagerank_mass_conserved(spark, edges_np):
    # with no dangling nodes total rank mass stays ~1
    got = graph_pagerank(spark, SF_DIR).collect()
    assert abs(sum(r.rank for r in got) - 1.0) < 1e-6


def test_exact_pagerank_agrees_with_float_ranks(spark):
    """The integer fixed-point variant must induce the same ranking as
    the float power iteration (it drops only div/floor remainders of
    ~1e-12 mass): identical node set, mass conserved to within
    n_nodes * iters units, and the same top-10 by rank."""
    from cdc_export_system_spark.operators.graph import (
        PAGERANK_EXACT_ITERS, PR_SCALE, graph_pagerank, graph_pagerank_exact,
    )
    from tests.conftest import SF_DIR

    fl = {r["node"]: r["rank"] for r in graph_pagerank(spark, SF_DIR).collect()}
    ex = {
        r["partkey"]: r["rank_micro"]
        for r in graph_pagerank_exact(spark, SF_DIR).collect()
    }
    assert set(fl) == set(ex)
    # each iteration loses <1 unit per directed edge (r div deg
    # remainder) plus <2 per node (damping + teleport floors): bound the
    # total leaked mass by iters * (|E_directed| + 2n), i.e. ~1e-8 of
    # the 1e12 fixed-point mass on this graph
    from cdc_export_system_spark.operators.graph import _edges

    n_directed = 2 * _edges(spark, SF_DIR).count()
    total = sum(ex.values())
    leak_bound = PAGERANK_EXACT_ITERS * (n_directed + 2 * len(ex))
    assert 0 <= PR_SCALE - total <= leak_bound
    top_f = [n for n, _ in sorted(fl.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    top_e = [n for n, _ in sorted(ex.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert top_f == top_e
