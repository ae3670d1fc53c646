"""TPC-H-style headline queries over the driver star schema.

These are the bench workload (BENCH_r{N}.json): multi-join, multi-agg
plans that exercise the whole physical stack — scan pruning, partial
aggregation, broadcast vs shuffle join selection, AQE. Adapted to the
driver testdata's column subset (TESTDATA.md), with decimal-exact sums so
the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.registry import (
    DEC,
    dmulsum,
    dsum,
    register,
    spark_dmulsum,
    spark_dsum,
    sql_dsum,
)


@register(
    "tpch_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity", "sum_qty")},
               {sql_dsum("l_extendedprice", "sum_base_price")},
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))
                        * CAST(1 + l_tax AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("tpch", "agg"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: one scan, map-side partial agg, 6-group
    result. The shipdate predicate pushes to parquet row-group stats.
    Single spark.sql() statement (one parse) instead of ~20 py4j
    Column-builder round trips — same plan, less build latency."""
    li = star_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {spark_dsum("l_quantity", "sum_qty")},
               {spark_dsum("l_extendedprice", "sum_base_price")},
               {spark_dmulsum("sum_disc_price", "l_extendedprice", "(1 - l_discount)")},
               {spark_dmulsum("sum_charge", "l_extendedprice", "(1 - l_discount)", "(1 + l_tax)")},
               COUNT(*) AS count_order
        FROM {li}
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)


@register(
    "tpch_q3",
    oracle="""
        SELECT l_orderkey,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    headline=True,
    tags=("tpch", "join", "agg"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: filtered customer dim broadcasts into orders,
    the joined keys then meet lineitem; top-10 via TakeOrdered."""
    cust = star_view(spark, sf_dir, "customer")
    orders = star_view(spark, sf_dir, "orders")
    li = star_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT /*+ BROADCAST(c) */
               l_orderkey,
               {spark_dmulsum("revenue", "l_extendedprice", "(1 - l_discount)")},
               o_orderdate, o_orderpriority
        FROM {orders} o
        JOIN {cust} c ON o.o_custkey = c.c_custkey
        JOIN {li} l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """)


@register(
    "tpch_q5",
    oracle="""
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    headline=True,
    tags=("tpch", "join", "agg"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table star join. All dims broadcast (the
    SQL hint pins the same plan the Column form built with F.broadcast);
    the only big shuffle is lineitem x orders on the orderkey."""
    region = star_view(spark, sf_dir, "region")
    nation = star_view(spark, sf_dir, "nation")
    supplier = star_view(spark, sf_dir, "supplier")
    customer = star_view(spark, sf_dir, "customer")
    orders = star_view(spark, sf_dir, "orders")
    li = star_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT /*+ BROADCAST(s, c, n, r) */
               n_name,
               {spark_dmulsum("revenue", "l_extendedprice", "(1 - l_discount)")}
        FROM {li} l
        JOIN {orders} o ON l.l_orderkey = o.o_orderkey
        JOIN {supplier} s ON l.l_suppkey = s.s_suppkey
        JOIN {customer} c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        JOIN {nation} n ON s.s_nationkey = n.n_nationkey
        JOIN {region} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """)


@register(
    "tpch_q6",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity < 24
    """,
    headline=True,
    tags=("tpch", "agg", "filter"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure scan+filter+agg; every predicate
    reaches the parquet reader (PushedFilters), no shuffle beyond the
    single-row final agg."""
    li = star_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT {spark_dmulsum("revenue", "l_extendedprice", "l_discount")}
        FROM {li}
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """)


@register(
    "tpch_q10_like",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    headline=True,
    tags=("tpch", "join", "agg"),
)
def tpch_q10_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (Q10 minus columns the testdata lacks)."""
    cust = star_view(spark, sf_dir, "customer")
    nation = star_view(spark, sf_dir, "nation")
    orders = star_view(spark, sf_dir, "orders")
    li = star_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT /*+ BROADCAST(c, n) */
               c_custkey, c_name,
               {spark_dmulsum("revenue", "l_extendedprice", "(1 - l_discount)")},
               n_name
        FROM {li} l
        JOIN {orders} o ON l.l_orderkey = o.o_orderkey
        JOIN {cust} c ON o.o_custkey = c.c_custkey
        JOIN {nation} n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)
