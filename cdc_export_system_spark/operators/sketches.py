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


# ---------------------------------------------------------------------------
# agg_kmv_setops — deterministic bottom-k (KMV) distinct sketch + set algebra
# ---------------------------------------------------------------------------

KMV_K = 32  # sketch size; relative error ~ 1/sqrt(k-2)
_KMV_DENOM = 281474976710656.0  # 16^12 = 2^48: hv normalizer, exact in double


@register(
    "agg_kmv_setops",
    oracle=f"""
        WITH pv AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) AS hv
            FROM events
            WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL),
        ka AS (SELECT hv FROM pv WHERE event_type = 'click'
               ORDER BY hv LIMIT {KMV_K}),
        kb AS (SELECT hv FROM pv WHERE event_type = 'purchase'
               ORDER BY hv LIMIT {KMV_K}),
        un AS (SELECT DISTINCT hv FROM (SELECT hv FROM ka
                                        UNION ALL SELECT hv FROM kb)
               ORDER BY hv LIMIT {KMV_K}),
        sa AS (SELECT count(*) AS m, max(hv) AS kth FROM ka),
        sb AS (SELECT count(*) AS m, max(hv) AS kth FROM kb),
        su AS (SELECT count(*) AS m, max(hv) AS kth FROM un),
        ic AS (SELECT count(*) AS c
               FROM un
               WHERE hv IN (SELECT hv FROM ka)
                 AND hv IN (SELECT hv FROM kb)),
        ex AS (SELECT count(DISTINCT user_id)
                      FILTER (WHERE event_type = 'click') AS ea,
                      count(DISTINCT user_id)
                      FILTER (WHERE event_type = 'purchase') AS eb,
                      count(DISTINCT user_id) AS eu
               FROM events
               WHERE event_type IN ('click', 'purchase')
                 AND user_id IS NOT NULL)
        SELECT 'click' AS segment,
               floor(CASE WHEN sa.m < {KMV_K} THEN CAST(sa.m AS DOUBLE)
                          ELSE ({KMV_K} - 1) * {_KMV_DENOM}
                               / CAST(sa.kth AS DOUBLE) END
                     * 1000000 + 0.5) / 1000000 AS est_distinct,
               CAST(ex.ea AS BIGINT) AS exact_distinct
        FROM sa, ex
        UNION ALL
        SELECT 'purchase',
               floor(CASE WHEN sb.m < {KMV_K} THEN CAST(sb.m AS DOUBLE)
                          ELSE ({KMV_K} - 1) * {_KMV_DENOM}
                               / CAST(sb.kth AS DOUBLE) END
                     * 1000000 + 0.5) / 1000000,
               CAST(ex.eb AS BIGINT)
        FROM sb, ex
        UNION ALL
        SELECT 'union',
               floor(CASE WHEN su.m < {KMV_K} THEN CAST(su.m AS DOUBLE)
                          ELSE ({KMV_K} - 1) * {_KMV_DENOM}
                               / CAST(su.kth AS DOUBLE) END
                     * 1000000 + 0.5) / 1000000,
               CAST(ex.eu AS BIGINT)
        FROM su, ex
        UNION ALL
        SELECT 'intersection',
               floor(CASE WHEN su.m = 0 THEN 0.0
                          ELSE (CAST(ic.c AS DOUBLE) / CAST(su.m AS DOUBLE))
                               * (CASE WHEN su.m < {KMV_K}
                                       THEN CAST(su.m AS DOUBLE)
                                       ELSE ({KMV_K} - 1) * {_KMV_DENOM}
                                            / CAST(su.kth AS DOUBLE) END) END
                     * 1000000 + 0.5) / 1000000,
               CAST(ex.ea + ex.eb - ex.eu AS BIGINT)
        FROM su, ic, ex
    """,
    tags=("agg", "sketch", "approx"),
)
def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k (theta-style) distinct sketch with SET ALGEBRA —
    the capability HLL lacks: distinct-user estimates for click,
    purchase, their UNION (merge = bottom-k of merged sketches) and
    their INTERSECTION (Jaccard over the union sketch x est_union),
    each beside its exact count so the report is self-validating.
    Deterministic BY CONSTRUCTION: the hash is the md5 hex head parsed
    as a 48-bit integer — identical bytes in both engines — so unlike
    the xxhash64 sketches this one is externally HASH-CHECKABLE
    (estimate and all): est = (k-1)/U_k, exact when the set fits the
    sketch (m < k).

    Scale: the only data-sized work is one distinct-combine per side
    and the exact-count aggregate kept for comparison (drop it at
    100 TB — the sketch path alone reduces each side map-side to its
    k smallest hashes; TakeOrdered, never a global sort); everything
    downstream joins k-row tables. The sketch is mergeable
    shard-by-shard exactly like the CMS cells: union partial bottom-k
    lists, re-take bottom-k."""
    k = KMV_K
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("user_id").isNotNull())
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    pv = ev.select("event_type", hv.alias("hv")).distinct()
    pv = pv.localCheckpoint(eager=True)  # one events scan; 3 sketch readers
    ka = pv.filter(F.col("event_type") == "click").select("hv").orderBy("hv").limit(k)
    kb = (
        pv.filter(F.col("event_type") == "purchase").select("hv").orderBy("hv").limit(k)
    )
    un = ka.unionAll(kb).distinct().orderBy("hv").limit(k)

    def stat(sk: DataFrame, m: str, kth: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).alias(m), F.max("hv").alias(kth)
        )

    sa, sb, su = stat(ka, "ma", "ka"), stat(kb, "mb", "kb"), stat(un, "mu", "ku")
    ic = (
        un.join(ka, "hv", "left_semi")
        .join(kb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ex = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("ea"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("eb"),
        F.countDistinct("user_id").alias("eu"),
    )
    one = (
        sa.crossJoin(sb).crossJoin(su).crossJoin(ic).crossJoin(ex)
    )  # five 1-row frames

    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731

    def est(m: str, kth: str):
        return F.when(
            F.col(m) < k, F.col(m).cast("double")
        ).otherwise(F.lit(float(k - 1)) * F.lit(_KMV_DENOM) / F.col(kth).cast("double"))

    est_u = est("mu", "ku")
    # one explode over the single combined stats row, not a 4-leg union:
    # each union leg replicated the whole five-frame pipeline — including
    # the exact-count events aggregate — four times (r11 plan sweep)
    segs = [
        F.struct(
            F.lit("click").alias("segment"),
            r6(est("ma", "ka")).alias("est_distinct"),
            F.col("ea").cast("bigint").alias("exact_distinct"),
        ),
        F.struct(
            F.lit("purchase").alias("segment"),
            r6(est("mb", "kb")).alias("est_distinct"),
            F.col("eb").cast("bigint").alias("exact_distinct"),
        ),
        F.struct(
            F.lit("union").alias("segment"),
            r6(est_u).alias("est_distinct"),
            F.col("eu").cast("bigint").alias("exact_distinct"),
        ),
        F.struct(
            F.lit("intersection").alias("segment"),
            r6(
                F.when(F.col("mu") == 0, F.lit(0.0)).otherwise(
                    (F.col("c").cast("double") / F.col("mu").cast("double")) * est_u
                )
            ).alias("est_distinct"),
            (F.col("ea") + F.col("eb") - F.col("eu")).cast("bigint").alias(
                "exact_distinct"
            ),
        ),
    ]
    return one.select(F.explode(F.array(*segs)).alias("s")).select(
        "s.segment", "s.est_distinct", "s.exact_distinct"
    )
