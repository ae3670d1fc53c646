"""Count-min sketch: bounded-memory frequency estimation as a query.

Rounds out the engine's sketch family — HLL (agg_hll_sketch,
metric_rolling_wau_hll) answers distinct-count, Misra-Gries
(agg_freq_items_mg) answers heavy-hitters with per-item counters, and
CMS answers point frequency queries with FIXED memory (d×w counters)
regardless of item domain — the structure a 100 TB URL/n-gram/token
frequency service keeps per partition and merges by cell-wise addition.

Engine extension (no reference counterpart): the reference's only
aggregation is Postgres count(*) (`/root/reference/app/services/
exports.py`); this is north-star scale machinery.

The whole sketch is pure DataFrame algebra — no UDFs: each item emits
CMS_DEPTH (row, bucket) cells via a literal array + explode (stays in
whole-stage codegen, xxhash64 is a JVM intrinsic), cells aggregate with
one map-side-combined groupBy over at most d×w distinct keys, and point
queries read back the min over d cells. Deterministic for fixed seeds,
but xxhash64 has no DuckDB equivalent ⇒ rows-only driver check; the
ε-δ guarantee (est ≥ true, est ≤ true + εn w.h.p.) is pinned exactly in
tests/test_sketches.py against the exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

CMS_DEPTH = 4  # d hash rows: P[overshoot > εn] ≤ e^-d
CMS_WIDTH = 64  # w buckets/row: ε = e/w ≈ 4.2%


def cms_cells(items: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(row, bucket, cnt) cells of the count-min sketch of ``items.item``.
    This IS the mergeable sketch: union + re-groupBy merges shards."""
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    F.pmod(F.xxhash64(F.col("item"), F.lit(d)), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for d in range(depth)
            ]
        )
    ).alias("cell")
    return (
        items.select(cell)
        .select(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Point-frequency estimates: min over the d cells each query item
    hashes to. ``queries`` needs a distinct ``item`` column; the sketch
    (≤ d×w rows) broadcasts onto the probe set."""
    probes = queries.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(F.xxhash64(F.col("item"), F.lit(d)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("item", F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est_count"))
    )


@register(
    "agg_countmin_sketch",
    tags=("sketch", "agg", "approx"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for every distinct event_type: the
    corpus folds into a d×w=256-cell sketch (one groupBy over cell keys
    — shuffle is O(d·w·partitions) regardless of stream size or item
    domain), then each distinct item reads back min over its d cells.
    est ≥ true always (collisions only add); est ≤ true + εn with
    ε = e/w at failure probability e^−d. On this 5-item domain the
    demo doubles as an exactness check — the pin test verifies both
    bounds against exact counts and exercises the lossy regime on a
    long-tail synthetic stream."""
    ev = load_table(spark, sf_dir, "events")
    items = ev.select(F.col("event_type").alias("item")).where(F.col("item").isNotNull())
    sketch = cms_cells(items)
    distinct_items = items.distinct()
    return cms_estimate(sketch, distinct_items)
