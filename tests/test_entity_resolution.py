"""Behavioral pins for the entity-resolution family (beyond the oracle
parity sweep, which only proves Spark == DuckDB — these prove the
LINKAGE is right: multi-pass blocking recovers perturbed records, dups
collapse into their entity, survivorship rules pick the right values)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_export_system_spark.operators.entity_resolution import (
    _B_OFFSET,
    _DUP_OFFSET,
    T_MATCH,
    candidate_pairs,
    source_b,
)
from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def b_feed(spark):
    return source_b(spark, SF_DIR).cache()


def test_source_b_composition(spark, b_feed):
    """Feed derivation: ~85% of customers kept, ~5% duplicated into the
    shifted id space, id spaces disjoint, ground truth total."""
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    stats = b_feed.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("b_id") >= _DUP_OFFSET).alias("n_dup"),
        F.count_if(
            (F.col("b_id") >= _B_OFFSET) & (F.col("b_id") < _DUP_OFFSET)
        ).alias("n_base"),
    ).head()
    assert stats.n_base + stats.n_dup == stats.n
    assert 0.75 * n_cust <= stats.n_base <= 0.95 * n_cust
    assert stats.n_dup <= 0.12 * stats.n_base
    # every record's truth key exists in A
    assert stats.n == b_feed.filter(
        (F.col("b_truth") >= 0) & (F.col("b_truth") < n_cust)
    ).count()


def test_second_pass_recovers_nation_perturbed_records(spark, b_feed):
    """The point of multi-pass blocking: records whose nation code was
    mis-keyed CANNOT survive pass 1 (nation+segment equality), yet every
    clean-attribute one must still end up match-classified via the
    name-suffix pass."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    perturbed = (
        b_feed.filter(F.col("b_id") < _DUP_OFFSET)
        .join(cust, F.col("b_truth") == F.col("c_custkey"))
        .filter(
            (F.col("b_nation") != F.col("c_nationkey"))
            & (F.col("b_segment") != "UNKNOWN")
        )
        .select("b_id")
    )
    n_perturbed = perturbed.count()
    assert n_perturbed > 0, "derivation must produce nation-perturbed records"
    matched = (
        REGISTRY["er_candidate_pairs"].fn(spark, SF_DIR)
        .filter(F.col("cls") == "match")
        .join(perturbed, "b_id", "left_semi")
    )
    assert matched.count() == n_perturbed


def test_match_class_is_precise_and_high_recall(spark):
    rows = {
        r["cls"]: r
        for r in REGISTRY["er_match_metrics"].fn(spark, SF_DIR).collect()
    }
    m = rows["match"]
    assert m["precision"] == 1.0  # deterministic feed: no false matches here
    assert m["recall"] >= 0.9


def test_duplicate_copies_collapse_into_one_entity(spark, b_feed):
    """A dup copy matching its A record must land in the SAME entity as
    the base copy (3-member cluster), and survivorship must keep the
    dup's +1.0 balance (max rule)."""
    clusters = REGISTRY["er_entity_clusters"].fn(spark, SF_DIR)
    matched_dups = (
        candidate_pairs(spark, SF_DIR)
        .filter((F.col("score") >= T_MATCH) & (F.col("b_id") >= _DUP_OFFSET))
        .select(F.col("b_id"), F.col("c_custkey"))
    )
    n_matched_dups = matched_dups.count()
    tri = clusters.filter(F.col("n_b") == 2)
    assert tri.count() == n_matched_dups
    assert tri.filter(F.col("n_members") != 3).count() == 0
    if n_matched_dups:
        golden = REGISTRY["er_golden_record"].fn(spark, SF_DIR)
        dup_bal = b_feed.filter(F.col("b_id") >= _DUP_OFFSET).select(
            (F.col("b_id") - _DUP_OFFSET).alias("entity_id"),
            F.col("b_acctbal").alias("dup_bal"),
        )
        # entity_id = min member id = the A custkey = b_id - offset
        joined = golden.join(dup_bal, "entity_id").join(
            matched_dups.select(
                (F.col("b_id") - _DUP_OFFSET).alias("entity_id")
            ),
            "entity_id",
            "left_semi",
        )
        bad = joined.filter(F.col("golden_acctbal") != F.col("dup_bal")).count()
        assert bad == 0  # dup copy carries base+1.0 => it is the max


def test_one_to_one_is_bijective_and_prefers_base_copy(spark):
    oto = REGISTRY["er_one_to_one"].fn(spark, SF_DIR).cache()
    n = oto.count()
    assert oto.select("a_id").distinct().count() == n
    assert oto.select("b_id").distinct().count() == n
    # the base copy always outranks its dup (+acct agreement, 12.5 vs 10.5)
    assert oto.filter(F.col("b_id") >= _DUP_OFFSET).count() == 0
    assert oto.filter(F.col("is_true") == 0).count() == 0


def test_blocking_stats_shape(spark):
    rows = {r["pass"]: r for r in REGISTRY["er_blocking_stats"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"nation_seg_band", "suffix_band"}
    for r in rows.values():
        assert r["n_blocks"] > 0
        assert r["max_block_a"] >= 1 and r["max_block_b"] >= 1
        assert r["n_candidates"] >= 0
    # block health: no block may approach the corpus size (the quadratic
    # guard this op exists to surface)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert rows["suffix_band"]["max_block_b"] <= max(5, n_cust // 100)


def test_em_learns_separated_model(spark):
    """EM over candidate patterns + the shifted negative anchor must
    learn a SEPARATED model: every field's agreement rate under match
    (m) strictly above its rate under unmatch (u), and the prior near
    the candidate/negative mix. The first cut (no negative anchor)
    collapsed to p=0.96 with u_suffix=0.92 — this pin would have
    caught it."""
    got = {
        r["term"]: r["value_micro"]
        for r in REGISTRY["er_em_weights"].fn(spark, SF_DIR).collect()
    }
    for f in ("suffix", "nation", "segment", "acctbal"):
        assert got[f"m_{f}"] > got[f"u_{f}"] + 100_000, f
        assert got[f"m_{f}"] > 800_000, f
    assert 200_000 < got["p_match"] < 800_000
    assert got["n_pairs"] > 0


def test_em_metrics_match_class_quality(spark):
    """Classification off the LEARNED model must reach the fixed-weight
    scorer's quality: 'match' class precision >= 0.99 and recall >= 0.94
    of all B records (the EM loop is the real linker, not a demo; the
    fixed-weight scorer reads 0.956 at sf0.001 / the EM one 0.948 —
    one borderline pair apart at this corpus size)."""
    rows = {
        r["cls"]: r
        for r in REGISTRY["er_match_metrics_em"].fn(spark, SF_DIR).collect()
    }
    assert "match" in rows
    assert rows["match"]["precision"] >= 0.99
    assert rows["match"]["recall"] >= 0.94


def test_em_fit_pure_python_reference(spark):
    """The Spark fit must equal a direct pure-Python EM over the same
    pattern table (independent re-derivation, no shared helper)."""
    from cdc_export_system_spark.operators.er_em import (
        EM_ITERS, EM_M0, EM_P0, EM_S, EM_U0,
        candidate_features, negative_features, _fit_from_spark,
    )

    rows = (
        candidate_features(spark, SF_DIR)
        .unionAll(negative_features(spark, SF_DIR))
        .groupBy("g1", "g2", "g3", "g4")
        .count()
        .collect()
    )
    pats = [(r["g1"], r["g2"], r["g3"], r["g4"], r["count"]) for r in rows]
    S, p = EM_S, EM_P0
    m, u = [EM_M0] * 4, [EM_U0] * 4
    for _ in range(EM_ITERS):
        acc = []
        for g1, g2, g3, g4, cnt in pats:
            g = (g1, g2, g3, g4)
            a, b = p, S - p
            for k in range(4):
                a *= m[k] if g[k] else S - m[k]
                b *= u[k] if g[k] else S - u[k]
            acc.append((g, cnt, (a * S) // (a + b)))
        n = sum(c for _, c, _ in acc)
        sw = sum(c * w for _, c, w in acc)
        snw = sum(c * (S - w) for _, c, w in acc)
        cl = lambda x: max(1, min(S - 1, x))  # noqa: E731
        p = cl(sw // max(1, n))
        m = [cl(sum(c * w * g[k] for g, c, w in acc) * S // max(1, sw)) for k in range(4)]
        u = [cl(sum(c * (S - w) * g[k] for g, c, w in acc) * S // max(1, snw)) for k in range(4)]
    fit = _fit_from_spark(spark, SF_DIR)
    assert fit["p"] == p and fit["m"] == m and fit["u"] == u
