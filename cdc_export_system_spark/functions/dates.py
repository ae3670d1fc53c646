"""Date/time function surface — extends the reference's timestamp ops
(isoformat, strftime stamp, now, interval arithmetic; SURVEY.md §2.8)
with the full extraction/truncation/difference family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "fn_date_extract",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS d,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
               CAST(strftime(o_orderdate, '%j') AS INTEGER) AS doy
        FROM orders WHERE o_orderkey < 500
    """,
    tags=("function", "date"),
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field extraction. DuckDB dayofweek: Sunday=0; Spark dayofweek:
    Sunday=1 — aligned by subtracting 1 on the Spark side."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@register(
    "fn_date_trunc_diff",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
               CAST(date_trunc('week', l_shipdate) AS TIMESTAMP) AS ship_week,
               CAST(datediff('day', o_orderdate, l_shipdate) AS INT) AS ship_delay_days,
               o_orderdate + INTERVAL 90 DAY AS due_date
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_orderkey < 300
    """,
    tags=("function", "date", "join"),
)
def fn_date_trunc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc granularities + datediff/months_between — the calendar
    bucketing and interval-arithmetic surface."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        F.date_trunc("week", "l_shipdate").alias("ship_week"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_delay_days"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    )


@register(
    "agg_by_month",
    oracle="""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS month_revenue
        FROM orders GROUP BY 1
    """,
    tags=("function", "date", "agg"),
)
def agg_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup — the partition-pruning friendly shape (a real
    deployment partitions the fact table by this truncation)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("month_revenue"),
        )
    )
