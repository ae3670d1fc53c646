"""Deterministic sampling operators (training-data pipeline extension).

`df.sample()` is seed-dependent on partitioning, so it can never be
oracle-checked and — worse for a pipeline — never reproduced across
reshards. Production data pipelines sample by *hashing a stable key*
instead: the sample is a pure function of the row, independent of
partition layout, cluster size, or execution order, and composable
(the 5% sample of shard A plus shard B == 5% sample of A union B).

Here the hash is Knuth's multiplicative scheme on the integer key
(exactly expressible in both engines); for string/arbitrary keys the
production form is `pmod(xxhash64(key), 1000) < rate` — same algebra,
engine-native hash. Key * 2654435761 stays well inside int64 for any
realistic key space (< 3.5e9 keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative hash


@register(
    "sample_hash",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE (o_orderkey * {KNUTH}) % 1000 < 50
    """,
    tags=("sampling",),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample: partition-layout-independent, reproducible,
    and pushed down to the scan (a plain comparison predicate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter((F.col("o_orderkey") * F.lit(KNUTH)) % 1000 < 50).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "sample_stratified_hash",
    oracle=f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderkey * {KNUTH}) % 1000 <
              CASE o_orderstatus WHEN 'F' THEN 20 WHEN 'O' THEN 50 ELSE 200 END
    """,
    tags=("sampling",),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-stratum rates (the
    `sampleBy` semantics) with the same hash scheme, so each stratum's
    sample is independently reproducible. The whole predicate is a scan
    filter: no shuffle, no per-stratum passes."""
    orders = load_table(spark, sf_dir, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "F", 20)
        .when(F.col("o_orderstatus") == "O", 50)
        .otherwise(200)
    )
    return orders.filter((F.col("o_orderkey") * F.lit(KNUTH)) % 1000 < rate).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
