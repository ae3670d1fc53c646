"""Manual bloom-filter runtime prefilter for selective fact-dim joins.

The pattern Spark's AQE injects automatically at cluster scale
(spark.sql.optimizer.runtime.bloomFilter.*) built from first principles,
because the engine must own the semantics: build a bit-packed bloom
filter of the dim-side join keys (two xxhash64 probes into an m-bit
bitmap packed into m/64 longs), ship it to the fact scan as a literal,
and drop non-matching fact rows BEFORE the shuffle. False positives cost
nothing but wasted shuffle rows — the real join still runs — so the
result is exactly the plain join (which is the oracle).

Scale: the payoff is proportional to fact-side selectivity. A 1%-selective
dim side means ~99% of the 100 TB fact shuffle disappears for 8 KB of
broadcast bitmap. The build side is one map-side-combined bit_or agg over
|dim keys| rows; the probe is two hashes + two loads per fact row, fully
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import dmulsum, register

M_BITS = 1 << 16  # 64 Ki bits -> 1024 longs -> 8 KB literal
N_WORDS = M_BITS // 64
SEEDS = (1, 2)

_DIM_PRED = "o_orderpriority = '1-URGENT'"


def bloom_build(dim: DataFrame, key_col: str) -> list[int]:
    """Bit-packed bloom bitmap of the dim keys as a list of N_WORDS longs.

    One narrow agg: explode the probe positions, bit_or the per-word
    masks. The collect is the runtime-filter injection point — the model
    (8 KB) goes driver-side exactly once, like AQE's subquery broadcast.
    """
    idx = F.explode(
        F.array(
            *[
                F.expr(f"pmod(xxhash64({key_col}, {s}), {M_BITS})")
                for s in SEEDS
            ]
        )
    ).alias("i")
    words = (
        dim.select(idx)
        .selectExpr("CAST(i div 64 AS INT) AS w", "shiftleft(CAST(1 AS BIGINT), CAST(i % 64 AS INT)) AS m")
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    bitmap = [0] * N_WORDS
    for r in words:
        bitmap[r.w] = r.mask
    return bitmap


def bloom_might_contain(bitmap: list[int], key_expr: str) -> Column:
    """Codegen-resident membership probe: two hashes, two word loads.
    ``key_expr`` is SQL text naming the probe key column/expression."""
    arr = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    conds = []
    for s in SEEDS:
        i = f"pmod(xxhash64({key_expr}, {s}), {M_BITS})"
        word = f"element_at({arr}, CAST({i} div 64 AS INT) + 1)"
        conds.append(
            f"((shiftright({word}, CAST({i} % 64 AS INT)) & CAST(1 AS BIGINT)) = 1)"
        )
    return F.expr(" AND ".join(conds))


@register(
    "join_bloom_prefilter",
    oracle=f"""
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                           * CAST(1 - l.l_discount AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE {_DIM_PRED}
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "bloom"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue with a hand-built bloom runtime filter on the
    fact scan. The bloom pass only *reduces* the rows entering the join;
    the join itself guarantees exactness, so this must equal the plain
    join the oracle runs. tests/test_plan_quality.py pins that the
    prefilter actually drops the expected non-urgent majority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = orders.filter(F.expr(_DIM_PRED)).select("o_orderkey", "o_orderpriority")
    bitmap = bloom_build(dim, "o_orderkey")
    pre = li.filter(bloom_might_contain(bitmap, "l_orderkey"))
    joined = pre.join(dim, pre.l_orderkey == dim.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dmulsum("revenue", F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")),
    )
