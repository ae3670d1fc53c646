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
