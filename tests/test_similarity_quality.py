"""Quality pins for similarity search.

Sign-LSH's contract is about *close* vectors: the corpus's exact top-k
neighbors sit at cosine ~0.3 (random 64-d embeddings), where 8-bit LSH
collision probability is intentionally low. So the recall pin plants a
genuinely close neighbor (cos > 0.95) and requires the LSH path to find
it; the brute-force path is the exactness oracle elsewhere."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.similarity.lsh import lsh_topk, sim_lsh_buckets
from tests.conftest import SF_DIR

PLANTED_ID = 999_999


def _with_planted_neighbor(spark, query_vec_id=0, noise=0.02):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == query_vec_id).first()
    planted = [v + noise * ((i % 5) - 2) for i, v in enumerate(q["embedding"])]
    extra = spark.createDataFrame(
        [(PLANTED_ID, planted, q["label"])],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )
    return emb.unionByName(extra)


def test_lsh_finds_planted_close_neighbor(spark):
    emb = _with_planted_neighbor(spark)
    top = lsh_topk(emb, query_vec_id=0, k=5).collect()
    assert top, "LSH probe returned no candidates"
    assert top[0]["vec_id"] == PLANTED_ID
    assert top[0]["cos_sim"] > 0.9


def test_lsh_buckets_spread(spark):
    rows = sim_lsh_buckets(spark, SF_DIR).collect()
    n_buckets = len(rows)
    biggest = max(r["n"] for r in rows)
    total = sum(r["n"] for r in rows)
    assert n_buckets >= 16  # 256 possible; corpus should hit a good fraction
    assert biggest < 0.5 * total  # no degenerate hot bucket


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == n_clusters degenerates IVF to exact brute-force top-k:
    result must equal the sim_search_topk surface row-for-row."""
    from cdc_export_system_spark.registry import load_all
    from cdc_export_system_spark.similarity.ivf import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = [
        (r["vec_id"], r["cos_sim"])
        for r in load_all()["sim_search_topk"].fn(spark, SF_DIR).collect()
    ]
    full = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, n_clusters=8, nprobe=8).collect()
    ]
    assert full == exact


def test_ivf_finds_planted_close_neighbor(spark):
    """A near-duplicate of the query vector lands in the query's own
    inverted list, so even a 4/16 probe must surface it first."""
    from cdc_export_system_spark.similarity.ivf import ivf_topk

    emb = _with_planted_neighbor(spark)
    top = ivf_topk(emb, query_vec_id=0, k=5).collect()
    assert top, "IVF probe returned no candidates"
    assert top[0]["vec_id"] == PLANTED_ID
    assert top[0]["cos_sim"] > 0.9


def test_ivf_probe_scans_fraction(spark):
    """The probed candidate pool must be a strict subset of the corpus —
    the whole point of the inverted file is scanning nprobe/n_clusters
    of the data."""
    from cdc_export_system_spark.similarity.ivf import ivf_assign

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centroids = ivf_assign(emb)
    total = assigned.count()
    sizes = {r["cluster_id"]: r["n"] for r in
             assigned.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()}
    assert len(centroids) == 16
    probed = sum(sorted(sizes.values(), reverse=True)[:4])
    assert probed < total  # even the 4 largest lists are a proper subset


def test_mmr_rerank_matches_numpy_reference(spark):
    """The engine's greedy MMR (plain-Python folds) must reproduce an
    independent NumPy implementation: same candidate pool, same lambda,
    scores compared after the shared SIM_DECIMALS rounding."""
    import numpy as np

    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.similarity.queries import (
        MMR_K,
        MMR_LAMBDA,
        QUERY_VEC_ID,
        SIM_DECIMALS,
        TOP_K,
        sim_mmr_rerank,
        sim_search_topk,
    )
    from tests.conftest import SF_DIR

    got = sim_mmr_rerank(spark, SF_DIR).orderBy("rank").collect()
    assert len(got) == MMR_K

    cand = {
        r["vec_id"]: r["cos_sim"]
        for r in sim_search_topk(spark, SF_DIR).collect()
    }
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
        if r["vec_id"] in cand
    }

    def ncos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    pool, picked = set(cand), []
    while pool and len(picked) < MMR_K:
        scored = []
        for vid in pool:
            red = max((ncos(vecs[vid], vecs[s]) for s, _ in picked), default=0.0)
            scored.append(
                (round(MMR_LAMBDA * cand[vid] - (1 - MMR_LAMBDA) * red, SIM_DECIMALS), vid)
            )
        score, vid = max(scored, key=lambda t: (t[0], -t[1]))
        picked.append((vid, score))
        pool.remove(vid)

    assert [(r["vec_id"], r["rank"]) for r in got] == [
        (vid, i + 1) for i, (vid, _) in enumerate(picked)
    ]
    for r, (_, score) in zip(got, picked):
        assert abs(r["mmr_score"] - score) < 10 ** -(SIM_DECIMALS - 1)


def test_lsh_pruned_fallback_is_narrow(spark, monkeypatch):
    """The bucketed-layout fallback only catches table/IO failures: an
    AnalysisException falls back to the unpruned scan (with a warning),
    while a Python-side bug propagates instead of masquerading as
    silent perf degradation."""
    import warnings

    import pytest
    from pyspark.errors import AnalysisException

    from cdc_export_system_spark.similarity import lsh as lsh_mod

    def boom_analysis(*a, **k):
        raise AnalysisException("[TABLE_OR_VIEW_ALREADY_EXISTS] simulated")

    monkeypatch.setattr(lsh_mod, "lsh_topk_pruned", boom_analysis)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = lsh_mod.sim_search_lsh_pruned(spark, SF_DIR).collect()
    assert len(out) > 0  # unpruned path produced the same top-k
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "falling back to unpruned" in str(w.message)
        for w in caught
    )

    def boom_python(*a, **k):
        raise TypeError("simulated python-side bug")

    monkeypatch.setattr(lsh_mod, "lsh_topk_pruned", boom_python)
    with pytest.raises(TypeError, match="simulated python-side bug"):
        lsh_mod.sim_search_lsh_pruned(spark, SF_DIR)


def test_pq_search_recall_vs_exact(spark):
    """Two-stage PQ (8-byte ADC scan -> exact re-rank of the shortlist)
    must recover most of the exact L2 top-k, and every returned distance
    must be the exact one (the re-rank stage computes full-precision
    distances, so the approximation can only lose candidates, never
    mis-score them)."""
    import numpy as np

    from cdc_export_system_spark.registry import load_all
    from cdc_export_system_spark.similarity.pq import PQ_M
    from cdc_export_system_spark.similarity.queries import TOP_K

    got = load_all()["sim_search_pq"].fn(spark, SF_DIR).collect()
    assert len(got) == TOP_K

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    q = vecs[0]
    exact = sorted(
        (float(np.sum((v - q) ** 2)), vid) for vid, v in vecs.items() if vid != 0
    )
    exact_ids = [vid for _, vid in exact[:TOP_K]]
    recall = len({r["vec_id"] for r in got} & set(exact_ids)) / TOP_K
    assert recall >= 0.6, f"PQ recall@{TOP_K} = {recall}"
    # re-ranked distances are exact (rounded), and sorted ascending
    exact_d = dict((vid, d) for d, vid in exact)
    for r in got:
        assert abs(r["l2_dist"] - exact_d[r["vec_id"]]) < 1e-4, r
    ds = [r["l2_dist"] for r in got]
    assert ds == sorted(ds)


def test_pq_codes_are_compact(spark):
    """The corpus representation is M small ints per vector — the 32x
    memory story the operator exists for."""
    from cdc_export_system_spark.io.sources import load_table as lt
    from cdc_export_system_spark.similarity.pq import PQ_K, PQ_M, pq_encode, pq_fit

    emb = lt(spark, SF_DIR, "embeddings")
    model = pq_fit(emb, n_iter=1)
    codes = pq_encode(emb, model).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r["codes"]) == PQ_M
        assert all(0 <= c < PQ_K for c in r["codes"])


def test_pq_sampled_training_recall_vs_exact(spark):
    """The 100-TB training path (codebooks fit on a 1-in-N hash sample,
    full corpus encoded with the frozen model) must stay within the same
    recall gate as the full fit, with the same exact-distance guarantee
    from the re-rank stage — pins that bounded-sample training is a safe
    default, not a quality cliff."""
    import numpy as np

    from cdc_export_system_spark.registry import load_all
    from cdc_export_system_spark.similarity.queries import TOP_K

    got = load_all()["sim_search_pq_sampled"].fn(spark, SF_DIR).collect()
    assert len(got) == TOP_K

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    q = vecs[0]
    exact = sorted(
        (float(np.sum((v - q) ** 2)), vid) for vid, v in vecs.items() if vid != 0
    )
    exact_ids = [vid for _, vid in exact[:TOP_K]]
    recall = len({r["vec_id"] for r in got} & set(exact_ids)) / TOP_K
    assert recall >= 0.6, f"sampled-PQ recall@{TOP_K} = {recall}"
    exact_d = dict((vid, d) for d, vid in exact)
    for r in got:
        assert abs(r["l2_dist"] - exact_d[r["vec_id"]]) < 1e-4, r


def test_pq_sampled_trains_on_strict_subset(spark):
    """pq_fit_sampled's training filter must select a strict, non-empty
    subset of the corpus (the whole point of the path), and the frozen
    model must still cover all M subspaces with valid centroids."""
    from cdc_export_system_spark.io.sources import load_table as lt
    from cdc_export_system_spark.similarity.pq import (
        PQ_K, PQ_M, PQ_TRAIN_SAMPLE_MOD, pq_fit_sampled,
    )
    from pyspark.sql import functions as F

    emb = lt(spark, SF_DIR, "embeddings")
    n_total = emb.count()
    n_sample = emb.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(PQ_TRAIN_SAMPLE_MOD)) == 0
    ).count()
    assert 0 < n_sample < n_total
    model = pq_fit_sampled(emb, n_iter=1)
    rows = model.collect()
    assert {r["m"] for r in rows} == set(range(PQ_M))
    assert all(0 <= r["cid"] < PQ_K for r in rows)


def test_ivf_pq_recall_vs_exact_and_deterministic(spark):
    """IVFADC (coarse prune -> residual-PQ ADC -> exact re-rank): the
    composed pipeline must keep decent recall vs the exact L2 top-k even
    though it scans only nprobe/nlist of the corpus, every surviving
    distance must be the exact full-precision one, and a second run must
    reproduce the first bit-for-bit (seeded k-means + deterministic
    Lloyd + total tie-breaks everywhere)."""
    import numpy as np

    from cdc_export_system_spark.registry import load_all
    from cdc_export_system_spark.similarity.queries import TOP_K

    fn = load_all()["sim_search_ivf_pq"].fn
    got = fn(spark, SF_DIR).collect()
    assert len(got) == TOP_K

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    q = vecs[0]
    exact = sorted(
        (float(np.sum((v - q) ** 2)), vid) for vid, v in vecs.items() if vid != 0
    )
    exact_ids = [vid for _, vid in exact[:TOP_K]]
    recall = len({r["vec_id"] for r in got} & set(exact_ids)) / TOP_K
    assert recall >= 0.5, f"IVF-PQ recall@{TOP_K} = {recall}"
    exact_d = dict((vid, d) for d, vid in exact)
    for r in got:
        assert abs(r["l2_dist"] - exact_d[r["vec_id"]]) < 1e-4, r
    ds = [r["l2_dist"] for r in got]
    assert ds == sorted(ds)

    again = fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_ivf_pq_index_partition_pruned_scan(spark):
    """The materialized IVF-PQ index is the inverted file: the codes
    table is partitioned by cluster_id, and a probe's ``cluster_id IN
    (...)`` must surface as a PARTITION filter on the scan (directory
    pruning — nprobe/nlist of the corpus read), not a row-level
    post-scan filter. Also pins the one-time build contract: a second
    ensure call returns the same tables without rebuilding."""
    from cdc_export_system_spark.similarity.pq import (
        IVFPQ_NLIST,
        IVFPQ_NPROBE,
        ensure_ivfpq_index,
    )

    codes_tbl, model_tbl = ensure_ivfpq_index(spark, SF_DIR)
    assert (codes_tbl, model_tbl) == ensure_ivfpq_index(spark, SF_DIR)

    probe = list(range(IVFPQ_NPROBE))
    pruned = spark.table(codes_tbl).filter(F.col("cluster_id").isin(probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    # the pruned scan must report fewer input files than the full table
    n_cells = (
        spark.table(codes_tbl).select("cluster_id").distinct().count()
    )
    assert n_cells == IVFPQ_NLIST
    assert pruned.select("cluster_id").distinct().count() == IVFPQ_NPROBE

    # model table: nlist coarse rows + M*K pq rows, nothing else
    from cdc_export_system_spark.similarity.pq import PQ_K, PQ_M

    kinds = {
        r["kind"]: r["n"]
        for r in spark.table(model_tbl).groupBy("kind").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert kinds == {"coarse": IVFPQ_NLIST, "pq": PQ_M * PQ_K}
