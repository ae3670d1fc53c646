"""Extended TPC-H-style query surface over the driver star schema.

The reference delegates all query execution to Postgres and issues only
point scans/filters (SURVEY.md §2.3, §3: no joins, no group-bys beyond
COUNT), so this module is engine-surface extension, not parity: it widens
the analytical coverage started in ``operators/tpch.py`` to the classic
TPC-H shapes expressible with the driver testdata's column subset
(TESTDATA.md — no partsupp table, no l_commitdate/l_receiptdate/
l_shipmode, so Q4/Q12/Q21 use shipdate-based variants and Q2/Q11/Q20
reconstruct their partsupp facts from lineitem — supply cost as the
minimum observed cents price, supply value/quantity as exact-integer
sums — keeping every threshold an integer comparison).

Every query follows the registry's exactness conventions (registry.py
docstring): monetary sums via scaled-integer cents (``dsum``/``dmulsum``),
ratios computed as exact-decimal numerator/denominator cast to double and
then combined with the identical IEEE expression tree on both engines,
conditional counts via COUNT(CASE ...) so DuckDB returns BIGINT (its
SUM(int) would come back as HUGEINT and decay to float64 in pandas).

Scale notes (100 TB posture) per query are in the docstrings: the shared
physique is "filter early → broadcast every dim → shuffle only the fact
table on its join key → partial agg before exchange", which is exactly
what Catalyst+AQE produce from these declarative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, register_views
from cdc_export_system_spark.registry import _cents, dmulsum, dsum, register, sql_dsum

# Exact 2dp-product revenue expression as DuckDB SQL (the oracle twin of
# dmulsum(price, 1-disc)); VARCHAR hop per sql_dcast rationale.
SQL_REVENUE = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
)


def _sql_cond_revenue(cond: str) -> str:
    """Exact conditional revenue sum -> correctly-rounded double."""
    return (
        "CAST(CAST(SUM(CASE WHEN "
        + cond
        + " THEN CAST(l_extendedprice AS DECIMAL(18,6))"
        " * CAST(1 - l_discount AS DECIMAL(18,6))"
        " ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)"
    )


def _cond_revenue(cond, alias: str):
    """Spark twin of _sql_cond_revenue: exact cents-product summed as
    BIGINT under a condition, widened to decimal once post-agg."""
    prod = _cents(F.col("l_extendedprice")) * _cents(F.lit(1) - F.col("l_discount"))
    return (
        (F.sum(F.when(cond, prod).otherwise(F.lit(0))).cast("decimal(38,6)") / F.lit(10_000))
        .cast("double")
        .alias(alias)
    )


def _revenue(alias: str):
    return dmulsum(alias, F.col("l_extendedprice"), F.lit(1) - F.col("l_discount"))


@register(
    "tpch_q4_like",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi-join", "agg"),
)
def tpch_q4_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (Q4, shipdate variant: testdata has no
    l_commitdate/l_receiptdate, so EXISTS tests late shipment instead).
    Physical shape: date-pruned orders scan LEFT SEMI joined to lineitem
    on the shuffle key; the EXISTS never materializes lineitem columns,
    so the shuffled payload is just (l_orderkey, l_shipdate)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_like",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
               {SQL_REVENUE} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_12')
            OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (Q7). The nation filter is
    applied to the *aliased dims before the join*, so supplier and
    customer shrink to two nations' worth of rows and broadcast; the
    disjunctive pair predicate then runs on two tiny joined columns.
    Only lineitem x orders shuffles."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    both = ("NATION_3", "NATION_12")
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .filter(F.col("supp_nation").isin(*both))
        .select("s_suppkey", "supp_nation")
    )
    customer = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("cust_nation").isin(*both))
        .select("c_custkey", "cust_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter(
            ((F.col("supp_nation") == both[0]) & (F.col("cust_nation") == both[1]))
            | ((F.col("supp_nation") == both[1]) & (F.col("cust_nation") == both[0]))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue("revenue"))
    )


@register(
    "tpch_q8_like",
    oracle=f"""
        SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
               (100.0 * {_sql_cond_revenue("n1.n_name = 'NATION_3'")})
                   / {SQL_REVENUE} AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
    """,
    tags=("tpch", "join", "agg", "ratio"),
)
def tpch_q8_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8): NATION_3 suppliers' slice of PROMO-part
    revenue sold into ASIA, per order year. Numerator and denominator are
    both exact decimal sums; the final percent is the identical
    (100*num)/den IEEE expression on both engines, so the ratio is
    bit-stable despite double division. 7-way star join: every dim
    broadcasts, the fact shuffles once on l_orderkey."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    num = _cond_revenue(F.col("supp_nation") == "NATION_3", "num")
    den = _revenue("den")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(num, den)
        .select(
            "o_year",
            ((F.lit(100.0) * F.col("num")) / F.col("den")).alias("mkt_share"),
        )
    )


@register(
    "tpch_q9_like",
    oracle=f"""
        SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
               {SQL_REVENUE} AS sum_profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, YEAR(o_orderdate)
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9 minus ps_supplycost — no partsupp table in
    the testdata, so profit reduces to discounted revenue). The LIKE
    filter shrinks part before broadcast; grouping is by supplier nation
    x order year across the whole date range."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_revenue("sum_profit"))
    )


@register(
    "tpch_q12_like",
    oracle="""
        SELECT l_linestatus,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority line counts (Q12 keyed by l_linestatus — the
    testdata has no l_shipmode). Conditional counts stay COUNT(CASE), not
    SUM(CASE): Spark's count(when) is a plain long and DuckDB's COUNT is
    BIGINT, keeping the two engines' dtypes aligned."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "agg"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13, no comment-filter — the
    testdata has no o_comment). Left outer join preserves order-less
    customers as c_count=0; two-level aggregation. At scale the second
    groupBy is on a tiny domain (distinct counts), so AQE coalesces its
    shuffle to a handful of partitions."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14",
    oracle=f"""
        SELECT (100.0 * {_sql_cond_revenue("p_type = 'PROMO'")})
                   / {SQL_REVENUE} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "join", "agg", "ratio"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (Q14): PROMO-typed parts' share of one month's
    revenue. p_type here is a flat category so the classic LIKE 'PROMO%'
    is plain equality. Same exact-ratio recipe as q8."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _cond_revenue(F.col("p_type") == "PROMO", "num"),
            _revenue("den"),
        )
        .select(((F.lit(100.0) * F.col("num")) / F.col("den")).alias("promo_revenue"))
    )


@register(
    "tpch_q15",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {SQL_REVENUE} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15): quarter revenue per supplier, keep the max.
    The revenue aggregate is computed once and reused for both the rows
    and the scalar max (Spark caches nothing here, but the agg output is
    ~|suppliers| rows, so the 1-row max side broadcasts for free).
    Revenue equality across engines is safe because both sides are the
    same exact-decimal value cast to double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(_revenue("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_like",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "distinct-agg"),
)
def tpch_q16_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (Q16 over lineitem instead of the
    absent partsupp). COUNT(DISTINCT) expands to a two-phase plan
    (dedup-shuffle then count) automatically; the negated part filters
    push into the broadcast side."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """,
    tags=("tpch", "join", "correlated-subquery"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17). The correlated AVG decorrelates
    to a per-part aggregate joined back — written that way directly here
    (what Catalyst's decorrelation would produce). The per-part limits
    are |brand parts| rows, so the back-join broadcasts. AVG is exact:
    l_quantity is integer-valued, its double sum is exact, and both
    engines divide the same two numbers."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    limits = branded.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    total = (
        branded.join(F.broadcast(limits), F.col("l_partkey") == F.col("lim_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(dsum(F.col("l_extendedprice"), "total_price"))
    )
    return total.select((F.col("total_price") / F.lit(7.0)).alias("avg_yearly"))


@register(
    "tpch_q18",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey AS big_orderkey,
                   {sql_dsum("l_quantity", "total_qty")}
            FROM lineitem GROUP BY l_orderkey)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders   ON o_orderkey = big_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE total_qty > 150
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 20
    """,
    tags=("tpch", "join", "having", "topk"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (Q18, threshold 150 sized to this datagen's
    ~4 lines/order so the HAVING keeps a few hundred orders at sf0.001).
    The heavy groupBy runs first and shrinks the fact table to qualifying
    orderkeys; orders joins that small set, customer broadcasts, and the
    top-20 is TakeOrderedAndProject with a unique o_orderkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q19_like",
    oracle=f"""
        SELECT {SQL_REVENUE} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "disjunctive-filter"),
)
def tpch_q19_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (Q19 minus shipmode/shipinstruct columns).
    The disjunction spans both tables, so it must run post-join — but
    Catalyst derives the single-table implications (brand IN, size/qty
    range unions) and pushes those to each scan, shrinking the broadcast
    and probe sides before the residual OR filter."""

    def band(brand, lo_s, hi_s, lo_q, hi_q):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo_s, hi_s)
            & F.col("l_quantity").between(lo_q, hi_q)
        )

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            band("Brand#1", 1, 15, 1, 21)
            | band("Brand#2", 10, 30, 10, 30)
            | band("Brand#3", 20, 50, 20, 40)
        )
        .agg(_revenue("revenue"))
    )


@register(
    "tpch_q22_like",
    oracle=f"""
        WITH avgbal AS (
            SELECT SUM(FLOOR(c_acctbal * 100 + 0.5)) / (COUNT(*) * 100.0) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0)
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               {sql_dsum("c_acctbal", "totacctbal")}
        FROM customer, avgbal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
    tags=("tpch", "anti-join", "scalar-subquery", "agg"),
)
def tpch_q22_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (Q22): above-average-balance customers
    with no *recent* orders, by nation (this datagen gives every customer
    historical orders, so the classic no-orders-ever predicate is scoped
    to 2000+; country code = c_nationkey, no phone column). The average
    goes through a true SQL scalar subquery — Catalyst executes it once
    and folds the scalar into the filter, instead of the nested-loop join
    a 1-row cross join would plan. The NOT EXISTS is a left-anti join
    against the date-pruned orders scan. The average is order-independent:
    exact cent sum / exact count."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(SUM(FLOOR(c_acctbal * 100 + 0.5)) AS DECIMAL(38,6)) / 100 AS tot_dec
        FROM customer
        WHERE c_acctbal > (SELECT SUM(FLOOR(c_acctbal * 100 + 0.5)) / (COUNT(*) * 100.0)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        """
    ).select(
        "cntrycode", "numcust", F.col("tot_dec").cast("double").alias("totacctbal")
    )


@register(
    "tpch_q21_like",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND o3.o_orderkey = l3.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
    """,
    tags=("tpch", "correlated-subquery", "anti-join", "agg"),
)
def tpch_q21_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (Q21, shipdate variant: no
    l_commitdate/l_receiptdate in testdata, so "late" is shipped > 60
    days after the order date) — the classic double-correlated
    EXISTS / NOT EXISTS, which the oracle states literally.

    The engine never runs the correlated form: both subqueries collapse
    into ONE per-order aggregate — n_supp = distinct suppliers on the
    order, n_late_supp = distinct LATE suppliers — because
    "EXISTS another supplier" == n_supp >= 2 and "NOT EXISTS another
    late supplier" (given l1 itself is late) == n_late_supp = 1. The
    per-order distinct sets ride collect_set (bounded by suppliers per
    order, ~7 in TPC-H), avoiding the multi-countDistinct Expand. Plan
    shape (read, not inferred): orders and supplier broadcast; the fact
    shuffles on l_orderkey twice — once un-filtered into the per-order
    aggregate, once as the LATE slice only (Catalyst pushes the
    lateness predicate into the orders join on that branch, so the
    blame-side exchange carries only the late rows); the aggregate's
    output partitioning then feeds the SMJ with no further exchange."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    rows = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = rows.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey")))
        ).alias("n_late_supp"),
    )
    blamed = (
        rows.filter("is_late")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20 likes: partsupp reconstructed from lineitem
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_like",
    oracle="""
        WITH ps AS (
            SELECT l_partkey AS pk, l_suppkey AS sk,
                   MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS cost_c
            FROM lineitem GROUP BY l_partkey, l_suppkey),
        sup AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        par AS (
            SELECT p_partkey, p_type FROM part
            WHERE p_size <= 5 AND p_type = 'LARGE'),
        j AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_c
            FROM ps
            JOIN par ON ps.pk = par.p_partkey
            JOIN sup ON ps.sk = sup.s_suppkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               CAST(cost_c AS DOUBLE) / 100 AS supplycost
        FROM (SELECT *, MIN(cost_c) OVER (PARTITION BY p_partkey) AS mn
              FROM j)
        WHERE cost_c = mn
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("tpch", "join", "window", "correlated-subquery"),
)
def tpch_q2_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (Q2) with partsupp reconstructed from
    lineitem: supply cost of (part, supplier) is the minimum observed
    extended price IN EXACT CENTS, so the correlated 'cost = min cost
    for this part among region suppliers' comparison is an integer
    equality. The correlated subquery decorrelates to a window MIN over
    the part — what Catalyst's rewrite would produce — and every
    dimension (part filter, supplier⋈nation⋈region) broadcasts; the
    only shuffle is lineitem's (partkey, suppkey) aggregate.

    Scale: |ps| ≈ distinct (part,supp) pairs, partial-agged map-side;
    the window runs on the post-filter join output (region x filtered
    parts), orders of magnitude smaller than the fact table."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(_cents(F.col("l_extendedprice"))).alias("cost_c"))
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    par = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 5) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    j = ps.join(F.broadcast(par), F.col("pk") == F.col("p_partkey")).join(
        F.broadcast(sup), F.col("sk") == F.col("s_suppkey")
    )
    mn = F.min("cost_c").over(W.partitionBy("p_partkey"))
    return (
        j.withColumn("mn", mn)
        .filter(F.col("cost_c") == F.col("mn"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("cost_c").cast("double") / 100).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q11_BASIS_POINTS = 12  # keep parts holding > 12bp (0.12%) of regional value


@register(
    "tpch_q11_like",
    oracle=f"""
        WITH sup AS (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'),
        v AS (
            SELECT l_partkey,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT))
                       AS value_c,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM lineitem JOIN sup ON l_suppkey = s_suppkey
            GROUP BY l_partkey),
        tot AS (SELECT SUM(value_c) AS total_c FROM v)
        SELECT l_partkey, CAST(value_c AS DOUBLE) / 100 AS value,
               n_lineitems
        FROM v CROSS JOIN tot
        WHERE value_c * 10000 > total_c * {Q11_BASIS_POINTS}
    """,
    tags=("tpch", "join", "agg", "having", "scalar-subquery"),
)
def tpch_q11_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (Q11) with supply value
    reconstructed from lineitem: per-part value supplied by ASIA-region
    suppliers, keeping parts above Q11_BASIS_POINTS (12bp) of the regional
    total. Value accumulates in exact cents and the HAVING threshold is
    the INTEGER cross-multiplication value·10000 > total·bp — no
    float ratio ever computed, so the cut is bit-identical at any
    partitioning.

    Scale: the supplier dim broadcasts into the scan; one |parts|-row
    shuffle; the 1-row grand total broadcasts back (scalar-subquery
    decorrelation). Cents accumulate in DECIMAL(38) headroom."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    v = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice")).cast("decimal(38,0)")).alias(
            "value_c"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    tot = v.agg(F.sum("value_c").alias("total_c"))
    return (
        v.join(F.broadcast(tot), F.lit(True))
        .filter(
            F.col("value_c") * 10000 > F.col("total_c") * F.lit(Q11_BASIS_POINTS)
        )
        .select(
            "l_partkey",
            (F.col("value_c").cast("double") / 100).alias("value"),
            "n_lineitems",
        )
    )


@register(
    "tpch_q20_like",
    oracle="""
        WITH psq AS (
            SELECT l_partkey AS pk, l_suppkey AS sk,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
            GROUP BY l_partkey, l_suppkey),
        pq AS (SELECT pk, SUM(q) AS tq FROM psq GROUP BY pk),
        dom AS (SELECT DISTINCT sk FROM psq JOIN pq USING (pk)
                WHERE 5 * q > tq)
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND s_suppkey IN (SELECT sk FROM dom)
    """,
    tags=("tpch", "join", "semi-join", "subquery"),
)
def tpch_q20_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-supplier screen (Q20's exists-chain shape) with availqty
    reconstructed from lineitem: ASIA-region suppliers who supply MORE
    THAN A FIFTH of some 'small%' part's total shipped quantity. The
    dominance test is the integer cross-multiplication 5·q > total — no
    division — and the supplier qualification is a semi-join against
    the distinct dominant-supplier set, mirroring Q20's IN-chain.

    Scale: the part-name filter pushes into the broadcast join before
    the (part,supp) aggregate; the per-part total rides a window over
    that aggregate's own partitioning (no re-aggregate, no sort-merge
    join back); the distinct supplier set is dimension-sized and
    broadcasts into the supplier semi-join."""
    par = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(par), F.col("l_partkey") == F.col("p_partkey")
    )
    from pyspark.sql import Window as W

    psq = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    # per-part total as a window over the SAME aggregate output — one
    # shuffle fewer than a re-aggregate + sort-merge join back
    dom = (
        psq.withColumn("tq", F.sum("q").over(W.partitionBy("pk")))
        .filter(5 * F.col("q") > F.col("tq"))
        .select("sk")
        .distinct()
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(dom),
            F.col("s_suppkey") == F.col("sk"),
            "left_semi",
        )
        .select("s_name", "n_name")
    )
