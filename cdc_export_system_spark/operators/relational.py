"""Scans, filters, projections, sorts, limits and set operations.

Maps SURVEY.md §2.1/§2.2/§2.6/§2.7 onto the driver star schema. Each op is
a declarative DataFrame plan so Catalyst pushes the predicate/projection
into the parquet scan (the Spark analogue of the reference's reliance on
Postgres' planner and its ``idx_users_updated_at`` index,
reference: seeds/001_schema.sql:11, app/services/exports.py:80-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.registry import register


# --- scans (reference: app/services/exports.py:80-85 full scan) ---------------

@register(
    "scan_table",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (reference full-export scan, exports.py:80-85)."""
    return load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@register(
    "scan_index_range",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    """,
    tags=("scan", "cdc"),
)
def scan_index_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan on the time column (reference exports.py:115-125: the
    watermark range predicate served by the updated_at btree; here the
    parquet row-group min/max stats serve the same pruning role)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "point_lookup",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    tags=("scan",),
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row lookup by unique key (reference watermark.py:7-9)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --- filters (reference: app/services/exports.py:82,116-122) ------------------

@register(
    "filter_eq_bool",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("filter",),
)
def filter_eq_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter on a low-cardinality flag column — the analogue of
    the reference's active-rows filter ``is_deleted == FALSE``
    (exports.py:82,120)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "filter_gt_ts",
    oracle="""
        SELECT event_id, ts, user_id
        FROM events WHERE ts > TIMESTAMP '2024-01-20 12:00:00'
    """,
    tags=("filter", "cdc"),
)
def filter_gt_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict > on the CDC time column (exports.py:119 — strictness is part
    of the reference's late-data contract)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-20 12:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id")
    )


@register(
    "filter_conj",
    oracle="""
        SELECT event_id, ts, event_type, value FROM events
        WHERE ts > TIMESTAMP '2024-01-15 00:00:00' AND event_type <> 'error'
    """,
    tags=("filter", "cdc"),
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction filter (exports.py:116-122: updated_at > wm AND NOT
    is_deleted)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        & (F.col("event_type") != "error")
    ).select("event_id", "ts", "event_type", "value")


@register(
    "filter_eq_str",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
    tags=("filter",),
)
def filter_eq_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-key equality (watermark.py:8 consumer_id lookup)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "project_columns",
    oracle="SELECT o_orderkey, o_custkey, o_orderdate FROM orders",
    tags=("project",),
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-column projection (exports.py:57-64); Catalyst prunes the scan
    to exactly these columns (ReadSchema in the physical plan)."""
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")


@register(
    "project_case_op",
    oracle="""
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN 'DELETE'
                    WHEN value < 50.0 THEN 'INSERT'
                    ELSE 'UPDATE' END AS operation
        FROM events
    """,
    tags=("project", "cdc"),
)
def project_case_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-branch conditional derived column — the shape of the reference's
    delta operation classifier (exports.py:39-45: DELETE if is_deleted,
    INSERT if created_at == updated_at, else UPDATE), phrased over the
    events table for the oracle check. The true CDC classifier lives in
    cdc.exports.classify_operation and is pinned by unit tests."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "DELETE")
        .when(F.col("value") < 50.0, "INSERT")
        .otherwise("UPDATE")
        .alias("operation"),
    )


# --- sorts / limits (reference: exports.py:83,123,159; tests LIMIT-subquery) --

@register(
    "sort_ts_asc",
    oracle="""
        SELECT event_id, ts FROM events
        WHERE event_type = 'signup' ORDER BY ts
    """,
    tags=("sort",),
)
def sort_ts_asc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order by the time column (exports.py:83 — export row order is
    part of the reference's observable output). Spark plans a range
    exchange + per-partition sort."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", "ts")
        .orderBy("ts")
    )


@register(
    "limit_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort", "limit"),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT k — Spark plans TakeOrderedAndProject (no full
    sort). Tie-break on the key keeps the result deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "limit_subquery",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
        )
    """,
    tags=("limit", "join"),
)
def limit_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT inside IN(subquery) — the reference tests' victim-row picker
    (tests/test_exports_incremental.py:18-22). IN ≡ left-semi join; the
    5-row inner side broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    top5 = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return li.join(F.broadcast(top5), "l_orderkey", "left_semi").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --- set operations (SURVEY §2.7 — engine surface, none in reference) ---------

@register(
    "setop_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) of two projected slices — no implicit dedup."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp)


@register(
    "setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): plans as a left-semi join + dedup."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "setop_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): plans as a left-anti join + dedup."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT, matching DuckDB's EXCEPT.
    return cust.subtract(supp)


@register(
    "setop_intersect_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect: keeps min(multiplicity) duplicates —
    Spark plans it as a count-tracking aggregate + join, no distinct."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersectAll(supp)


@register(
    "setop_except_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics difference: multiplicity-aware (n_left - n_right
    copies survive), unlike EXCEPT's distinct output."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


@register(
    "setop_union_missing_cols",
    oracle="""
        SELECT n_nationkey AS key, n_name AS name, n_regionkey AS regionkey
        FROM nation
        UNION ALL
        SELECT r_regionkey AS key, r_name AS name, CAST(NULL AS INT) AS regionkey
        FROM region
    """,
    tags=("setop",),
)
def setop_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-mediated union where
    absent columns surface as NULLs — the ingest-time shape for merging
    feeds with drifting schemas (same contract tests/test_source_robustness
    pins for parquet mergeSchema)."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("regionkey"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
    )
    return nation.unionByName(region, allowMissingColumns=True)


_EVENT_CATEGORY_VALUES = """(VALUES ('click', 'engagement'), ('view', 'engagement'),
            ('purchase', 'revenue'), ('signup', 'growth'),
            ('error', 'operations')) AS m(event_type, category)"""


@register(
    "sql_values_inline",
    oracle=f"""
        SELECT m.category, count(*) AS n,
               CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
        FROM events e
        JOIN {_EVENT_CATEGORY_VALUES} ON e.event_type = m.event_type
        GROUP BY m.category
    """,
    tags=("sql", "join"),
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension: the code-as-data mapping table (event
    taxonomy, country groups, tier thresholds) joined without any stored
    table — the literal rows live in the plan and broadcast for free.
    At 100 TB this is the right home for every sub-hundred-row mapping:
    versioned with the query, no storage round trip, no cache staleness.
    Identical SQL runs on both engines."""
    ev = star_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT m.category, count(*) AS n,
               CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
        FROM {ev} e
        JOIN {_EVENT_CATEGORY_VALUES} ON e.event_type = m.event_type
        GROUP BY m.category
    """)


@register(
    "sql_group_by_all",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(date_trunc('year', o_orderdate) AS DATE) AS order_year,
               count(*) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    tags=("sql", "agg"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL sugar: GROUP BY ALL / ORDER BY ALL — every
    non-aggregate select item becomes a grouping (then ordering) key.
    Spark 4 and DuckDB both support the clause, so the statement runs
    verbatim on either engine; the plan is the ordinary partial/final
    hash aggregate."""
    orders = star_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(date_trunc('year', o_orderdate) AS DATE) AS order_year,
               count(*) AS n,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
        FROM {orders}
        GROUP BY ALL
        ORDER BY ALL
    """)


@register(
    "metric_observe_inline",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS DOUBLE) / 100
                   AS total_price
        FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("sql", "agg", "observability"),
)
def metric_observe_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API: named metrics ride the SAME pass that
    produces the output rows — the audit counters every export job wants
    (rows written, value totals) at zero extra scans, where a separate
    count()+sum() query would re-read the table. The observed branch
    executes to a noop sink (full plan, nothing collected); the metrics
    arrive driver-side as one O(1) row, exactly like the reference's
    per-job rowsExported accounting (app/services/jobs.py:44-50) but
    computed inside the engine pass."""
    from pyspark.sql import Observation

    from cdc_export_system_spark.registry import _cents

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    obs = Observation("export_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents(F.col("o_totalprice"))).alias("cents"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    total = float(m["cents"]) / 100 if m["cents"] is not None else None
    return spark.createDataFrame(
        [(m["n_rows"], total)], "n_rows long, total_price double"
    )


@register(
    "plan_cached_reuse",
    oracle="""
        SELECT 'n_purchases' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'sum_value',
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        FROM events WHERE event_type = 'purchase'
    """,
    tags=("sql", "agg", "cache"),
)
def plan_cached_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit caching surface: one filtered projection cached, two
    aggregate consumers — the second consumer reads InMemoryRelation
    instead of rescanning parquet (pinned in tests/test_plan_quality.py).
    At warehouse scale this is the 'stage a hot slice once' pattern:
    MEMORY_AND_DESK storage spills gracefully, and correctness never
    depends on the cache (an evicted/unpersisted entry recomputes the
    same lineage)."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .cache()
    )
    n = base.groupBy().agg(
        F.lit("n_purchases").alias("metric"),
        F.count(F.lit(1)).cast("double").alias("value"),
    )
    s = base.groupBy().agg(
        F.lit("sum_value").alias("metric"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value"),
    )
    return n.unionByName(s)


@register(
    "sql_lateral_topn",
    oracle="""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
    tags=("sql", "join", "correlated-subquery", "topk"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True correlated LATERAL subquery (not LATERAL VIEW generators):
    each customer's top-2 orders by price, stated as a per-row subquery.
    Catalyst decorrelates it into a rank-limit — the executed plan is
    WindowGroupLimit (top-k pruned inside each partition BEFORE the full
    sort/window, Spark 3.5+) feeding one per-key window + a broadcast
    join back to customer — i.e. the hand-written window_topk_per_group
    shape, derived automatically from the declarative form. Total
    tie-break (o_orderkey) makes the LIMIT deterministic."""
    c = star_view(spark, sf_dir, "customer")
    o = star_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM {c},
        LATERAL (SELECT o_orderkey, o_totalprice FROM {o}
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """)


# ---------------------------------------------------------------------------
# plan_compaction_bins — small-files compaction planning, computed distributively
# ---------------------------------------------------------------------------

COMPACT_TARGET_ROWS = 800  # rows per compacted output unit (parameterized)


@register(
    "plan_compaction_bins",
    oracle=f"""
        WITH part AS (
            SELECT CAST(ts AS DATE) AS event_date,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events GROUP BY CAST(ts AS DATE)),
        pre AS (
            SELECT event_date, n_rows,
                   CAST(COALESCE(SUM(n_rows) OVER (ORDER BY event_date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS prefix_rows
            FROM part)
        SELECT event_date, n_rows,
               CAST(floor(prefix_rows / {COMPACT_TARGET_ROWS}) AS BIGINT)
                   AS bin_id
        FROM pre
    """,
    tags=("plan", "layout", "window"),
)
def plan_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction PLAN for a date-partitioned layout: assign each
    event_date partition to a target-size output bin by start-offset
    binning — bin_id = floor(prefix_rows / target) over the
    date-ordered prefix sum — the planning computation behind Delta/
    Iceberg OPTIMIZE-style small-file rewrites (sink_parquet_partitioned
    is the layout this plans against; adjacent dates land in the same
    bin until the target row budget fills).

    Semantics pinned: deterministic date order, bins derived from the
    EXCLUSIVE prefix sum so the result is a pure function of the
    per-date counts (a greedy first-fit would depend on iteration
    order). Scale: per-date counts are one map-side-combined aggregate
    (the axis is |dates|, metadata-sized — 10^4 rows for a 30-year
    table, NOT data-sized); the prefix sum rides a single-partition
    window over that reduced axis, the same allowlisted model-axis
    shape as the ranks construction. Nothing data-sized moves after
    the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    part = ev.groupBy(F.col("ts").cast("date").alias("event_date")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = W.orderBy("event_date").rowsBetween(W.unboundedPreceding, -1)
    return part.select(
        "event_date",
        "n_rows",
        F.floor(
            F.coalesce(F.sum("n_rows").over(w), F.lit(0))
            / COMPACT_TARGET_ROWS
        ).cast("bigint").alias("bin_id"),
    )
