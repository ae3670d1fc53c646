"""Pivot / unpivot and SQL-API queries (scalar subqueries, CTEs).

The pivot/unpivot pair is the reshape surface; the SQL-API entries show
the same Catalyst plans are reachable through spark.sql() over registered
views — parser/analyzer coverage, not just the DataFrame builder path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, register_views, star_view
from cdc_export_system_spark.registry import register


@register(
    "reshape_pivot",
    oracle="""
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_linestatus = 'O') AS O,
               count(*) FILTER (WHERE l_linestatus = 'F') AS F
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("reshape", "agg"),
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values keep the plan a
    single pass; an unlisted pivot needs a distinct-scan first)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )


@register(
    "reshape_unpivot",
    oracle="""
        SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
        FROM orders WHERE o_orderkey < 200
        UNION ALL
        SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS value
        FROM orders WHERE o_orderkey < 200
    """,
    tags=("reshape",),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures -> (measure, value) rows."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").cast("double").alias("o_custkey")
    ).unpivot(
        "o_orderkey",
        [F.col("o_totalprice").alias("totalprice"), F.col("o_custkey").alias("custkey")],
        "measure",
        "value",
    )


@register(
    "sql_scalar_subquery",
    oracle="""
        WITH m AS (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                              AS DOUBLE) / count(*) AS mean_price FROM orders)
        SELECT o_orderkey, o_totalprice
        FROM orders, m WHERE o_totalprice > 1.5 * m.mean_price
    """,
    tags=("sql", "subquery"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the SQL API (spark.sql over temp views) —
    Catalyst plans the subquery once and broadcasts the scalar."""
    register_views(spark, sf_dir, ["orders"])
    # true scalar-subquery form: Catalyst executes the subquery once and
    # folds the scalar into the filter (no nested-loop join of a 1-row CTE)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                                              AS DOUBLE) / count(*) FROM orders)
        """
    )


@register(
    "sql_cte_join",
    oracle="""
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000)
        SELECT c_mktsegment, count(*) AS n
        FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("sql", "join", "agg"),
)
def sql_cte_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join + agg through the SQL API."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000)
        SELECT c_mktsegment, count(*) AS n
        FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
        """
    )


@register(
    "sql_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("sql", "agg", "group"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via the SQL API —
    one scan, Expand feeds all three grouping sets before one shuffle."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "fn_null_handling",
    oracle="""
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_or_null,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_defaulted,
               (nullif(o_orderstatus, 'P') IS NULL) AS was_pending,
               CASE WHEN o_totalprice > 300000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket
        FROM orders WHERE o_orderkey < 400
    """,
    tags=("function", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: nullif/coalesce/IS NULL/searched CASE."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return orders.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_defaulted"),
        status_or_null.isNull().alias("was_pending"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation
    over the sorted group). approx path: agg_approx_quantile below."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "agg_approx_quantile",
    oracle=None,  # sketch-based: engine-specific estimates, rows-only check
    tags=("agg", "percentile", "approx"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) — the 100 TB path: mergeable
    sketches, one pass, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_approx")
    )


@register(
    "fn_nondeterministic",
    oracle=None,  # uuid/rand/now are nondeterministic by design: rows-only
    tags=("function",),
)
def fn_nondeterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nondeterministic scalar surface (fn_uuid
    app/main.py:43, fn_now_utc app/main.py:21, fn_rand seeder
    app/seed_users.py:47-61) — exposed in-engine; checked rows-only."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.expr("uuid()").alias("job_id"),
        F.current_timestamp().alias("now_utc"),
        F.rand(42).alias("draw"),
        (F.rand(43) < 0.03).alias("soft_delete_flag"),
    )


@register(
    "sql_lateral_topk",
    oracle="""
        SELECT n.n_name, s.c_name, s.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2) s
    """,
    tags=("sql", "join"),
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) — the
    SQL-standard spelling of per-group top-k. Catalyst decorrelates it
    into the same shuffle-on-group + in-partition sort that
    window_topk_per_group plans, so the lateral form costs nothing
    extra; no per-group re-scan of customer happens."""
    n = star_view(spark, sf_dir, "nation")
    c = star_view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT n.n_name, s.c_name, s.c_acctbal
        FROM {n} n, LATERAL (
            SELECT c_name, c_acctbal FROM {c} c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2) s
    """)


@register(
    "reshape_date_spine",
    oracle="""
        WITH bounds AS (
            SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                   CAST(max(o_orderdate) AS DATE) AS hi
            FROM orders),
        spine AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
            FROM bounds),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
            FROM orders GROUP BY 1)
        SELECT CAST(datediff('day', DATE '1992-01-01', spine.d) AS INT) AS day_num,
               COALESCE(daily.n, 0) AS n_orders
        FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    tags=("reshape", "join"),
)
def reshape_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense date spine with zero-filled gaps: sequence() the [min, max]
    date range, explode, left-join the daily counts. The spine derives
    from a 1-row global agg (broadcast), so the only real shuffle is the
    daily count's map-side-combined agg; the left join broadcasts the
    spine (|days|, tiny at any data scale — time doesn't grow with TB)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 DAY)")).alias("d")
    )
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        F.broadcast(spine)
        .join(daily, "d", "left")
        .select(
            F.datediff(F.col("d"), F.lit("1992-01-01").cast("date"))
            .cast("int")
            .alias("day_num"),
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_orders"),
        )
    )


@register(
    "reshape_pivot_dynamic",
    oracle="""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                   AS "4-NOT SPECIFIED",
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("reshape",),
)
def reshape_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with RUNTIME column discovery: no values list, so Spark runs
    the extra distinct pass to find the pivot columns, then the pivot
    itself. The oracle enumerates the (deterministic) domain. At scale
    prefer the explicit-values form (one pass); this op pins that the
    discovery path yields identical results."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority")
        .count()
        .na.fill(0)
    )


_EXISTS_SQL = """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 90000)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey AND l2.l_discount > 0.09)
"""


@register(
    "sql_exists_correlated",
    oracle=_EXISTS_SQL,
    tags=("sql", "subquery", "join"),
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL parser: Catalyst
    decorrelates both into a left-semi and a left-anti join on the
    correlation key — never a per-row subquery execution. The identical
    statement runs as the oracle."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_EXISTS_SQL)


_NAMED_WINDOW_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INT) AS order_seq,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER w AS DOUBLE) / 100 AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "sql_named_window",
    oracle=_NAMED_WINDOW_SQL,
    tags=("sql", "window"),
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause through the SQL API: two window functions
    (rank + running sum) share one ``WINDOW w AS`` definition, so the
    statement is portable ANSI and the planner reuses a single
    sort/exchange for both. The running sum rides the default
    RANGE-to-current frame, which equals ROWS here because the
    (orderdate, orderkey) order is total — both engines agree on that
    default. Exact cents under the sum."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_NAMED_WINDOW_SQL)
