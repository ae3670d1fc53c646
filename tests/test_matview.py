"""Behavioral pins for incremental materialized-view maintenance —
the oracle sweep proves the final values; these prove the INCREMENTAL
structure (delta partitioning, state merge, self-maintainability)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def test_incremental_agg_nets_to_latest_per_key(spark):
    """The signed-delta aggregate must equal a Spark-side direct
    latest-per-key recompute (independent of the DuckDB oracle)."""
    mv = {
        r["o_orderpriority"]: (r["n_customers"], r["total_latest"])
        for r in REGISTRY["mv_incremental_agg"].fn(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    direct = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("decimal(38,6)") / 100)
            .cast("double")
            .alias("tot"),
        )
    )
    for r in direct.collect():
        assert mv[r["o_orderpriority"]] == (r["n"], r["tot"])
    assert sum(n for n, _ in mv.values()) == o.select("o_custkey").distinct().count()


def test_delta_join_terms_partition_the_join(spark):
    """The four bilinear terms must partition the full join exactly —
    their row counts sum to the direct join count, with every term
    non-empty (otherwise the test proves less than it claims)."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    full = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
    mv_total = (
        REGISTRY["mv_delta_join"].fn(spark, SF_DIR)
        .agg(F.sum("n_li")).head()[0]
    )
    assert mv_total == full
    for o_pred, l_pred in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        n = (
            o.filter((F.col("o_orderkey") % 4 == 0) == (o_pred == 0))
            .join(
                li.filter((F.col("l_orderkey") % 5 == 0) == (l_pred == 0)),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert n > 0, f"delta term ({o_pred},{l_pred}) is empty at {SF_DIR}"


def test_topk_self_maintainability_identity(spark):
    """topk(S + d) == topk(topk(S) + d): the maintained result must be
    row-identical to ranking the full table directly in Spark."""
    o = load_table(spark, SF_DIR, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    direct = (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").cast("bigint"),
            "o_totalprice",
            F.col("rk").cast("bigint"),
        )
    )
    maintained = REGISTRY["mv_topk_monotone"].fn(spark, SF_DIR)
    assert maintained.exceptAll(direct).count() == 0
    assert direct.exceptAll(maintained).count() == 0
    # and the delta batch genuinely contributes winners (the identity
    # is vacuous if no insert ever displaces state)
    new_winners = maintained.filter(F.col("o_orderkey") % 4 == 0).count()
    assert new_winners > 0


def test_stream_mv_is_batch_order_sensitive(spark):
    """The streaming MV's oracle picks latest-per-key under the BATCH
    order ((o_orderkey % 3) DESC, then key DESC) — which must differ
    from the order-insensitive shortcut (global max key per customer).
    If the two coincided, the hash could not certify that micro-batches
    were applied in order."""
    mv = {
        r["o_orderpriority"]: (r["n_customers"], r["total_latest"])
        for r in REGISTRY["stream_mv_maintenance"].fn(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    naive = {
        r["o_orderpriority"]: (r["n"], r["tot"])
        for r in (
            o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast(
                        "decimal(38,6)"
                    )
                    / 100
                )
                .cast("double")
                .alias("tot"),
            )
            .collect()
        )
    }
    assert mv != naive, (
        "streaming MV equals the order-insensitive latest — the oracle "
        "is not exercising batch ordering at this scale"
    )
    # sanity: the dimension keys and total membership agree
    assert set(mv) == set(naive)
    assert sum(n for n, _ in mv.values()) == sum(n for n, _ in naive.values())


def test_refcount_state_invariants(spark):
    rows = REGISTRY["mv_refcount_distinct"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    e = load_table(spark, SF_DIR, "events")
    inserted = (
        e.filter(F.col("value") >= 1.0)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_ins"))
    )
    ins = {r["event_type"]: r["n_ins"] for r in inserted.collect()}
    for r in rows:
        assert 0 <= r["n_active"] <= r["n_tracked"]
        # active members need at least one insert
        assert r["n_active"] <= ins.get(r["event_type"], 0)
