"""Window functions (SURVEY.md §2.5).

The reference has no window functions, but its delta-export contract —
"only the latest state of each row is exported" (reference README:335) —
is exactly the collapsed-changelog window: row_number() over
(PARTITION BY key ORDER BY time DESC) = 1. That op (`window_latest_per_key`)
is also the engine's `dedup_latest_per_key`.

Scale note: a window partitioned by a real key (user_id, l_orderkey)
shuffles once on that key and sorts within partitions — fine at 100 TB.
A window with no PARTITION BY would serialize onto one task; none here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.operators.ranks import with_global_row_number
from cdc_export_system_spark.registry import dsum, register


@register(
    "window_latest_per_key",
    oracle="""
        SELECT event_id, user_id, ts, event_type FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("window", "dedup", "cdc"),
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — the reference's collapsed-changelog semantics
    (README:335). event_id desc tie-break keeps it deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type")
    )


@register(
    "window_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
        FROM orders
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number under one total order (ties broken by
    key) — one sort serves all three rank flavors."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event,
               lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event
        FROM events
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead taps over a per-customer order-date sort — the
    previous/next-row comparison primitive."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@register(
    "window_running_sum",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
                   AS running_value
        FROM events
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame; decimal accumulation keeps the running sum
    bit-identical to the oracle at every prefix."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_topk_per_group",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal FROM customer
        QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
    tags=("window", "limit"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the distributed alternative to a global sort."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "window_ntile_dist",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile buckets + percent_rank + cume_dist.
    The ORDER BY carries the o_orderkey tie-break because ntile is
    row-position-dependent — without a total order its buckets are
    nondeterministic across engines (and across Spark reshards)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@register(
    "window_range_interval",
    oracle="""
        SELECT event_id, user_id, ts,
               count(*) OVER w7 AS cnt_7d,
               CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w7
                    AS DECIMAL(38,6)) / 100 AS DOUBLE) AS sum_value_7d
        FROM events
        WINDOW w7 AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "streaming"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: per-user trailing-7-day count and exact
    sum. RANGE frames bound by an INTERVAL are the batch dual of a
    sliding stream window — one shuffle on the partition key, an ordered
    in-partition scan, no self-join. The frame is peer-inclusive on ts
    in both engines, so ties need no extra tie-break column."""
    ev = star_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT event_id, user_id, ts,
               count(*) OVER w7 AS cnt_7d,
               CAST(CAST(SUM(FLOOR(value * 100 + 0.5)) OVER w7
                    AS DECIMAL(38,6)) / 100 AS DOUBLE) AS sum_value_7d
        FROM {ev}
        WINDOW w7 AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """)


@register(
    "window_first_last",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_orderkey) OVER w AS first_key,
               last_value(o_orderkey) OVER w AS last_key,
               nth_value(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value under an explicit full-partition
    frame (the default RANGE..CURRENT ROW frame makes last_value a
    footgun — pinned here with the frame both engines agree on). One
    shuffle + sort on o_custkey serves all three expressions."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register(
    "window_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS day_num
            FROM events),
        isl AS (
            SELECT user_id, day_num,
                   day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
                       AS grp
            FROM days)
        SELECT user_id,
               CAST(min(day_num) AS INT) AS start_day,
               CAST(max(day_num) AS INT) AS end_day,
               CAST(count(*) AS INT) AS n_days
        FROM isl GROUP BY user_id, grp
    """,
    tags=("window", "analytics"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user, via the classic day_num - row_number() island key. Day numbers
    are ints from a fixed epoch so both engines do pure integer
    arithmetic. One shuffle on user_id shared by the dedup, the window,
    and the rollup (all same key)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "day_num"
        ),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day_num")
    return (
        days.withColumn("grp", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.min("day_num").cast("int").alias("start_day"),
            F.max("day_num").cast("int").alias("end_day"),
            F.count(F.lit(1)).cast("int").alias("n_days"),
        )
        .drop("grp")
    )


@register(
    "window_mom_growth",
    oracle="""
        WITH monthly AS (
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                        AS DOUBLE) AS revenue
            FROM orders GROUP BY 1)
        SELECT ym, revenue,
               round((revenue - lag(revenue) OVER (ORDER BY ym))
                     / lag(revenue) OVER (ORDER BY ym), 6) AS mom_growth
        FROM monthly
    """,
    tags=("window", "agg", "analytics"),
)
def window_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: aggregate to the monthly series FIRST
    (map-side-combined, |months| rows), then a lag window over the tiny
    series. The unpartitioned window is safe exactly because its input is
    the aggregated series — never put one over the fact table. Revenue is
    an exact decimal sum, so both engines divide identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("ym")
    ).agg(dsum(F.col("o_totalprice"), "revenue"))
    w = W.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "ym",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@register(
    "window_moving_avg",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        OVER w AS DOUBLE)
                 / (COUNT(*) OVER w * 100.0) AS avg_last4
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame: trailing-4-order average spend per customer.
    Exact cents under the frame sum, so frame content — not float order —
    determines the value; the (orderdate, orderkey) order is total, so
    the frame is deterministic. One shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w).cast("double")
            / (F.count(F.lit(1)).over(w) * 100.0)
        ).alias("avg_last4"),
    )


EWMA_ALPHA = 0.5  # decay 1/2: every weight is an exact power of two, so the
# weighted sum is bit-identical across engines (pow(0.7,k) could differ ulps)
EWMA_SPAN = 8  # finite lookback: 0.5^8 < 0.4% — the truncated-EWMA form


@register(
    "window_ewma",
    oracle=f"""
        WITH fr AS (
            SELECT user_id, event_id, ts,
                   list(CAST(floor(value * 100 + 0.5) AS BIGINT) / 100.0) OVER w
                       AS vals
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, ts,
               floor(
                 list_aggregate(list_transform(vals,
                     (x, i) -> x * pow(1 - {EWMA_ALPHA}, len(vals) - i)), 'sum')
                 / list_aggregate(list_transform(vals,
                     (x, i) -> pow(1 - {EWMA_ALPHA}, len(vals) - i)), 'sum')
                 * 1000000000 + 0.5) / 1000000000 AS ewma
        FROM fr
    """,
    tags=("window", "frame", "ml"),
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of each user's
    event values (the smoothing feature for rate/engagement signals).
    An exact EWMA is a sequential recurrence; the standard distributed
    form truncates the tail (alpha^span < 0.4% here) so it becomes a
    bounded ROWS frame — collect the frame ONCE per row, then weight by
    recency with a JVM fold whose order is pinned by the frame order in
    both engines (a float SUM over the frame would be order-free). One
    shuffle on user_id, frame state bounded at span rows."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), W.currentRow)
    )
    cents_v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") / F.lit(100.0)
    vals = F.collect_list(cents_v).over(w)
    # Spark transform's index i is 0-based; DuckDB's is 1-based — both
    # spell weight = (1-alpha)^(n-1-k) for element k from the oldest.
    num = F.aggregate(
        F.expr(
            f"transform(__vals, (x, i) -> x * pow({1 - EWMA_ALPHA}D, size(__vals) - i - 1))"
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.expr(
            f"transform(__vals, (x, i) -> pow({1 - EWMA_ALPHA}D, size(__vals) - i - 1))"
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        ev.withColumn("__vals", vals)
        .select(
            "user_id",
            "event_id",
            "ts",
            (F.floor(num / den * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
                "ewma"
            ),
        )
    )


@register(
    "window_pareto_share",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
            FROM orders GROUP BY o_custkey),
        tot AS (SELECT SUM(rev_c) AS t, count(*) AS n FROM per_cust),
        r AS (SELECT o_custkey, rev_c,
                     row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rk,
                     SUM(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum_c
              FROM per_cust)
        SELECT CAST(rk AS INTEGER) AS revenue_rank, o_custkey,
               CAST(CAST(rev_c AS VARCHAR) AS DOUBLE) / 100 AS revenue,
               CAST(CAST(cum_c AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(tot.t AS VARCHAR) AS DOUBLE) AS cum_share,
               CAST(rk AS DOUBLE) / tot.n AS cust_frac
        FROM r CROSS JOIN tot
        WHERE rk <= 100
    """,
    tags=("window", "analytics"),
)
def window_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto) curve: customers ranked by spend,
    cumulative share of total against cumulative customer fraction —
    'the top 1% of customers drive X% of revenue'. The per-customer
    aggregate is pruned to the top 100 FIRST via orderBy+limit — a
    distributed TakeOrdered (per-partition top-100, then a 100-row
    merge), never a global sort — and only those 100 rows see the
    rank/running-sum window. The row_number and prefix sum over the
    top-k equal those over the full set because both depend only on
    preceding rows in the same total order. The 1-row total broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_c"))
    tot = per_cust.agg(
        F.sum("rev_c").alias("t"), F.count(F.lit(1)).alias("n")
    )
    top = per_cust.orderBy(F.desc("rev_c"), F.asc("o_custkey")).limit(100)
    w = W.orderBy(F.desc("rev_c"), F.asc("o_custkey"))  # 100 rows only
    r = top.select(
        "o_custkey",
        "rev_c",
        F.row_number().over(w).alias("rk"),
        F.sum("rev_c").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "cum_c"
        ),
    )
    return r.crossJoin(F.broadcast(tot)).select(
        F.col("rk").alias("revenue_rank"),
        "o_custkey",
        (F.col("rev_c").cast("double") / 100).alias("revenue"),
        (F.col("cum_c").cast("double") / F.col("t").cast("double")).alias("cum_share"),
        (F.col("rk").cast("double") / F.col("n")).alias("cust_frac"),
    )


@register(
    "agg_gini",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
            FROM orders GROUP BY o_custkey),
        r AS (SELECT rev_c,
                     row_number() OVER (ORDER BY rev_c, o_custkey) AS i
              FROM per_cust),
        s AS (SELECT count(*) AS n, SUM(rev_c) AS t,
                     SUM(CAST(i AS HUGEINT) * rev_c) AS iw
              FROM r)
        SELECT floor((2.0 * CAST(CAST(iw AS VARCHAR) AS DOUBLE)
                      / (n * CAST(CAST(t AS VARCHAR) AS DOUBLE))
                      - (n + 1.0) / n) * 1000000000 + 0.5) / 1000000000
                   AS gini
        FROM s
    """,
    tags=("agg", "stats", "analytics"),
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the concentration scalar
    behind the Pareto curve, via the rank formula
    G = 2*sum(i*x_(i))/(n*sum(x)) - (n+1)/n over ascending-sorted exact
    cents (deterministic tie-break on custkey). sum(i*x) is an exact
    integer, so the only float math is the 3-operation finalization of
    a 1-row aggregate. The global rank comes from the distributed
    two-level row numbering (operators/ranks.py) — range-partitioned
    parallel windows plus a broadcast offset table — so no stage sorts
    the whole |customers| aggregate on one task."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_c"))
    r = with_global_row_number(
        per_cust, [F.asc("rev_c"), F.asc("o_custkey")], out="i"
    ).select("rev_c", "i")
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_c").alias("t"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev_c")).alias("iw"),
    )
    n_d = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("iw").cast("double") / (n_d * F.col("t").cast("double"))
        - (n_d + F.lit(1.0)) / n_d
    )
    return s.select(
        (F.floor(gini * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias("gini")
    )


MEDIAN_FRAME = 7  # trailing-7 rolling median


@register(
    "window_rolling_median",
    oracle=f"""
        WITH fr AS (
            SELECT o_custkey, o_orderkey,
                   list(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN {MEDIAN_FRAME - 1} PRECEDING AND CURRENT ROW)
                       AS vals
            FROM orders)
        SELECT o_custkey, o_orderkey,
               (CAST(list_sort(vals)[(len(vals) + 1) // 2] AS DOUBLE)
                + CAST(list_sort(vals)[len(vals) // 2 + 1] AS DOUBLE))
                   / 200.0 AS rolling_median
        FROM fr
    """,
    tags=("window", "frame", "stats"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-order rolling median spend per customer. Median is a
    HOLISTIC aggregate — Spark refuses it over a window frame (no
    partial form exists) — so the distributed shape is the bounded
    frame-list pattern (same as window_ewma): collect the <=7-row frame,
    sort it in-expression, take the exact middle (lower+upper halved, so
    odd frames collapse to the middle element). All values are exact
    cents; the only float op is the final halving. State per row is
    bounded by the frame, and the one shuffle is the o_custkey window."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-(MEDIAN_FRAME - 1), W.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    vals = F.array_sort(F.collect_list(cents).over(w))
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ((lo.cast("double") + hi.cast("double")) / F.lit(200.0)).alias(
            "rolling_median"
        ),
    )


@register(
    "window_share_of_total",
    oracle="""
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   date_trunc('year', o_orderdate) AS year,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS revenue_cents
            FROM orders GROUP BY month, year)
        SELECT month, revenue_cents,
               CAST(revenue_cents AS DOUBLE)
                   / CAST(CAST(SUM(revenue_cents) OVER (PARTITION BY year)
                               AS BIGINT) AS DOUBLE) AS share_of_year
        FROM m
    """,
    tags=("window", "agg"),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total reporting: each month's fraction of its year's
    revenue via an unpartition-keyed window SUM — over the AGGREGATED
    monthly series (|months| rows), never the fact table, so the window
    sort is trivial at any scale. Revenue accumulates as exact cents in
    both engines; the share is one double divide of exact BIGINTs."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.date_trunc("year", F.col("o_orderdate")).alias("year"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "revenue_cents"
        )
    )
    year_total = F.sum("revenue_cents").over(W.partitionBy("year"))
    return m.select(
        "month",
        "revenue_cents",
        (F.col("revenue_cents").cast("double") / year_total.cast("double")).alias(
            "share_of_year"
        ),
    )


ROLLZ_FRAME = 10  # trailing observations (excluding the current row)


@register(
    "window_rolling_zscore",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
                   count(*) OVER fr AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER fr AS s,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       * CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER fr AS sq
            FROM events
            WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {ROLLZ_FRAME} PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, ts, value,
               round((CAST(n AS DOUBLE) * c - CAST(s AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / (CAST(n AS DOUBLE) - 1)), 6) AS roll_z
        FROM w
        WHERE n > 1 AND CAST(n AS DOUBLE) * sq > CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
    """,
    headline=True,  # the bench's pure-window representative: a
    # single-partition regression in the window family would surface
    # here first (round-4 headline addition per VERDICT r03)
    tags=("window", "stats"),
)
def window_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score: each observation against its own trailing window
    of ROLLZ_FRAME predecessors (excluding itself — no self-contamination)
    — the streaming-style drift/anomaly signal, where anomaly_zscore
    compares against the user's whole history. The frame statistics are
    EXACT integer cent sums (count/sum/sum-of-squares share one named
    window, so one exchange + sort serves all three), and the z is
    derived from those ints with identical association order in both
    engines — no frame-order float accumulation anywhere. Rows with
    degenerate trailing windows (n<=1 or zero variance) are excluded by
    integer predicates."""
    ev = load_table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLLZ_FRAME, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        c.alias("c"),
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum(c).over(fr).alias("s"),
        F.sum(c * c).over(fr).alias("sq"),
    )
    nd = F.col("n").cast("double")
    z = (nd * F.col("c") - F.col("s").cast("double")) / F.sqrt(
        nd
        * (nd * F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
        / (nd - 1)
    )
    return (
        w.filter(
            (F.col("n") > 1)
            & (nd * F.col("sq") > F.col("s").cast("double") * F.col("s").cast("double"))
        )
        .select("event_id", "user_id", "ts", "value", F.round(z, 6).alias("roll_z"))
    )


OPEN_DAYS = 30  # synthetic fulfillment horizon: order closes 30 days after placement


@register(
    "metric_open_orders_sweep",
    oracle=f"""
        WITH deltas AS (
            SELECT date_trunc('day', o_orderdate) AS day, 1 AS d FROM orders
            UNION ALL
            SELECT date_trunc('day', o_orderdate) + INTERVAL {OPEN_DAYS} DAY, -1
            FROM orders),
        g AS (SELECT day, CAST(SUM(d) AS BIGINT) AS delta
              FROM deltas GROUP BY day)
        SELECT day, delta,
               CAST(SUM(delta) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
        FROM g
    """,
    tags=("window", "analytics"),
)
def metric_open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval census: how many orders are 'open' on each day
    (placed, not yet past the 30-day (OPEN_DAYS) fulfillment horizon). The
    naive form joins every day against every overlapping interval —
    O(|days| x |orders|); the sweep emits +1/-1 boundary deltas, rolls
    them up per day map-side (the shuffle carries |days| rows), and one
    running sum turns deltas into the open count. The unpartitioned
    window runs over the REDUCED |days| domain (thousands of rows — the
    one place a global window is safe), never the order stream."""
    o = load_table(spark, sf_dir, "orders")
    opens = o.select(F.date_trunc("day", F.col("o_orderdate")).alias("day"), F.lit(1).alias("d"))
    closes = o.select(
        (F.date_trunc("day", F.col("o_orderdate")) + F.expr(f"INTERVAL {OPEN_DAYS} DAYS")).alias(
            "day"
        ),
        F.lit(-1).alias("d"),
    )
    g = opens.unionAll(closes).groupBy("day").agg(F.sum("d").cast("bigint").alias("delta"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return g.select("day", "delta", F.sum("delta").over(w).cast("bigint").alias("n_open"))


@register(
    "window_percent_rank_cume",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000
                   AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000
                   AS cume,
               ntile(10) OVER w AS decile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "percentile"),
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of every customer inside its market segment:
    percent_rank (rank−1)/(n−1), cume_dist, and decile — the trio of
    normalized-rank window functions. The ordering is made TOTAL
    (acctbal DESC, custkey) so ntile's row placement and both rank
    ratios are deterministic; the ratios are exact rationals divided
    once, rounded at 1e-6 identically in both engines. One shuffle on
    the segment key; 5 segments at any scale means salting the segment
    key (or the ranks.py two-level construction) is the documented
    refinement when a single segment outgrows one partition."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


# ---------------------------------------------------------------------------
# window_decay_score
# ---------------------------------------------------------------------------

DECAY_LAMBDA = 0.95  # per-day retention of past activity


@register(
    "window_decay_score",
    oracle=f"""
        WITH daily AS (
            SELECT user_id,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
                       AS d,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY user_id, date_trunc('day', ts)),
        anchor AS (SELECT MAX(d) AS d1 FROM daily),
        terms AS (
            SELECT user_id,
                   CAST(floor(CAST(cents AS DOUBLE)
                              * power({DECAY_LAMBDA}, a.d1 - d)
                              * 1000 + 0.5) AS BIGINT) AS t_milli
            FROM daily CROSS JOIN anchor a)
        SELECT user_id, count(*) AS n_days,
               floor(CAST(SUM(t_milli) AS DOUBLE) / 1000 + 0.5) / 100
                   AS decay_score
        FROM terms GROUP BY user_id
    """,
    tags=("window", "analytics", "ml"),
)
def window_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed spend score anchored at the
    corpus's last active day: score = Σ_d cents_d · λ^(age_d), the
    recency-weighted engagement feature every churn/propensity model
    starts from (yesterday's dollar counts ~20x a two-month-old one at
    λ=0.95/day). Each day's decayed term is computed ONCE in doubles
    from exact integer cents and an integer age, rounded to milli-cents,
    and the per-user sum runs over those integers — order-independent,
    so partitioning cannot move the score; one final divide to dollars.

    Scale: events reduce to (user, day) exact cents first (map-side
    combined); the 1-row anchor broadcasts back; the score rollup is a
    second keyed aggregate. Nothing data-sized shuffles twice, no
    window over the raw stream at all."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
        .cast("bigint")
        .alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "cents"
        )
    )
    daily = daily.localCheckpoint(eager=True)  # one events scan; two consumers
    anchor = daily.agg(F.max("d").alias("d1"))
    t_milli = F.floor(
        F.col("cents").cast("double")
        * F.pow(F.lit(DECAY_LAMBDA), (F.col("d1") - F.col("d")).cast("double"))
        * 1000
        + F.lit(0.5)
    ).cast("bigint")
    terms = daily.crossJoin(F.broadcast(anchor)).select(
        "user_id", t_milli.alias("t_milli")
    )
    return terms.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.floor(F.sum("t_milli").cast("double") / 1000 + F.lit(0.5)) / 100
        ).alias("decay_score"),
    )


@register(
    "window_global_deciles",
    oracle="""
        WITH r AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile
            FROM orders)
        SELECT CAST(decile AS INTEGER) AS decile,
               count(*) AS n_orders,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                    AS DOUBLE) AS decile_value
        FROM r GROUP BY decile
    """,
    tags=("window", "analytics", "agg"),
)
def window_global_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL decile table of order value — bucket bounds, counts, and
    exact value per decile — the revenue-concentration cut ('the top
    decile carries X% of value') that naive SQL writes as a
    partition-less ntile(10), i.e. an Exchange SinglePartition sorting
    the whole table on one task. Here the global rank rides the
    ranks.py two-level range construction (range shuffle + broadcast
    offsets, every stage parallel) and the decile comes from
    ntile_from_rank's exact SQL-standard bucket algebra — identical
    buckets to the oracle's ntile(10), no single-partition stage over
    data (the offset table is |ranges| rows, allowlisted).

    Scale: two shuffles of (price, key) pairs + a 10-row rollup; the
    same construction rfm_segmentation already runs three of."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = with_global_row_number(
        o,
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        out="rn",
        total_out="n_total",
    )
    from cdc_export_system_spark.operators.ranks import ntile_from_rank

    d = ranked.select(
        "o_totalprice",
        ntile_from_rank(F.col("rn"), F.col("n_total"), 10).alias("decile"),
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        dsum(F.col("o_totalprice"), "decile_value"),
    )


@register(
    "window_drawdown",
    oracle="""
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events),
        dd AS (
            SELECT user_id, c,
                   MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak,
                   MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                       AS draw
            FROM s)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
               CAST(MAX(draw) AS DOUBLE) / 100 AS max_drawdown,
               CAST(MAX(peak) AS DOUBLE) / 100 AS peak_value,
               CAST(MIN(c) AS DOUBLE) / 100 AS min_value
        FROM dd GROUP BY user_id
    """,
    tags=("window", "analytics", "frame"),
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user value series — the classic
    running-peak-minus-current readout (finance's risk number, equally
    the 'how far did this metric fall from its high' dashboard stat):
    per user ordered by (ts, event_id), peak = running max, drawdown =
    peak − value, reported as the series max together with the overall
    peak and trough. Values ride exact cents through the whole window,
    so the result is partition-invariant by construction.

    Scale: ONE shuffle on user_id serves both the running-max frame and
    the final per-user aggregate (same partitioning, Catalyst reuses
    the sort); payload is two bigints per row."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    frame = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dd = s.select(
        "user_id",
        "c",
        F.max("c").over(frame).alias("peak"),
        (F.max("c").over(frame) - F.col("c")).alias("draw"),
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        (F.max("draw").cast("double") / 100).alias("max_drawdown"),
        (F.max("peak").cast("double") / 100).alias("peak_value"),
        (F.min("c").cast("double") / 100).alias("min_value"),
    )


@register(
    "window_running_distinct",
    oracle="""
        WITH f AS (
            SELECT event_id, user_id, ts, event_type,
                   CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY event_type, ts, event_id)
                            IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS first_seen
            FROM events)
        SELECT event_id, user_id, ts, event_type,
               CAST(SUM(first_seen) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_types_so_far
        FROM f
    """,
    tags=("window", "analytics", "frame"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT — after each event, how many distinct
    event types has this user produced so far? The classic
    count(DISTINCT) OVER that SQL engines refuse (including Spark),
    built from two passes over ONE user_id partitioning: sorting the
    partition by (event_type, ts) marks each type's first occurrence
    with a lag comparison, then re-sorting by (ts, event_id) turns the
    running sum of first-seen flags into the running cardinality.
    Exact integers end to end.

    Scale: ONE exchange on user_id serves both windows (same partition
    key, two in-partition sorts — strictly cheaper than the naive
    (user, type) + (user) double shuffle); payload per row is one flag
    bit. This is the standard distributed running-cardinality plan."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_type = W.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    first_seen = F.when(
        ~F.lag("event_type").over(w_type).eqNullSafe(F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_time = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        first_seen.alias("first_seen"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum("first_seen").over(w_time).alias("n_types_so_far"),
    )
