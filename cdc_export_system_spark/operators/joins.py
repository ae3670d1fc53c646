"""Join surface (SURVEY.md §2.3).

The reference's only join-like operation is the watermark state lookup
(reference: app/services/exports.py:109-119 — fetch one state row, then a
parameterized filter). The engine exposes the full Spark join surface; the
physical strategy notes on each op are the 100 TB design intent:

* dimension tables (region/nation/supplier, and at real TPC-H scale part/
  customer partitions) -> broadcast hash join, no shuffle of the fact side;
* fact-fact joins (lineitem x orders) -> sort-merge with AQE free to switch
  to shuffled-hash / handle skew at runtime;
* EXISTS / NOT EXISTS -> left-semi / left-anti (never a distinct+inner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.registry import dsum, register, spark_dsum, sql_dsum


@register(
    "join_broadcast_hash",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join",),
)
def join_broadcast_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-dim equi-join with an explicit broadcast of the 5-row side."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@register(
    "join_sort_merge",
    oracle=f"""
        SELECT o_orderstatus,
               {sql_dsum("l_extendedprice", "sum_price")},
               count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    headline=True,
    tags=("join", "agg"),
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle on the key once; the
    aggregation reuses that partitioning (no second exchange on
    o_orderstatus until the final small shuffle)."""
    li = star_view(spark, sf_dir, "lineitem")
    orders = star_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderstatus,
               {spark_dsum("l_extendedprice", "sum_price")},
               COUNT(*) AS n
        FROM {li} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey
        GROUP BY o_orderstatus
    """)


@register(
    "join_left",
    oracle="""
        SELECT c_custkey, o_orderkey
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (customer -> orders): unmatched left rows survive
    with NULL right columns; AQE picks broadcast for the dim side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 400000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: probe side streams, no row duplication."""
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti — also the natural form of the seeder's
    ON CONFLICT DO NOTHING ingest (app/seed_users.py:42)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    """,
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range residual — the scalable form of a range join
    (pure inequality joins degenerate to a broadcast-nested-loop; anchoring
    on the equi-key keeps it a hash/merge join with a post-filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
    )


SALT_BUCKETS = 8


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT c_nationkey,
               count(*) AS n_orders,
               {sql_dsum("o_totalprice", "sum_price")}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: the fact side gets a deterministic salt
    (uncorrelated with the join key), the dimension side is replicated
    SALT_BUCKETS times, and the join key becomes (key, salt) — a hot
    customer's rows now spread across SALT_BUCKETS reducers instead of
    melting one. Result is provably identical to the unsalted join (the
    oracle IS the unsalted join). AQE's skewedJoin handles moderate skew
    automatically; explicit salting is the tool for pathological keys
    known in advance (the null-key firehose, the one-giant-tenant
    table). The post-join aggregate still map-side-combines per
    (nationkey) before its final 25-group exchange."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.col("o_orderkey"), F.lit(SALT_BUCKETS))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])))
    )
    return (
        orders.join(cust, (orders.o_custkey == cust.c_custkey) & (orders.salt == cust.salt))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "sum_price"))
    )


@register(
    "join_state_lookup",
    oracle="""
        SELECT event_id, ts, user_id, event_type FROM events
        WHERE ts > (SELECT max(ts) - INTERVAL 3 DAY FROM events)
    """,
    tags=("join", "cdc"),
)
def join_state_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's watermark correlation (exports.py:109-119): look up
    one state row, then filter the stream table against it. Idiomatic
    Spark: collect the scalar on the driver and inline it as a literal so
    the predicate pushes into the parquet scan (a broadcast join against a
    1-row state table would defeat pushdown)."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("m")).first()["m"]
    if wm is None:
        # no state row: the reference exports nothing (exports.py:110-113)
        return ev.filter(F.lit(False)).select("event_id", "ts", "user_id", "event_type")
    from datetime import timedelta

    cutoff = wm - timedelta(days=3)
    return ev.filter(F.col("ts") > F.lit(cutoff)).select(
        "event_id", "ts", "user_id", "event_type"
    )


@register(
    "join_null_safe",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM nation n JOIN region r
          ON nullif(n.n_regionkey, 2) IS NOT DISTINCT FROM nullif(r.r_regionkey, 2)
    """,
    tags=("join",),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics MERGE keys
    and SCD dimensions need. nullif() manufactures NULLs from the
    testdata so the NULL=NULL path is actually exercised. Spark still
    plans this as a hash join (the null-safe comparator is part of the
    key), not a nested loop."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nk = F.nullif(F.col("n_regionkey"), F.lit(2))
    rk = F.nullif(F.col("r_regionkey"), F.lit(2))
    return n.join(r, nk.eqNullSafe(rk)).select("n_nationkey", "n_name", "r_name")


@register(
    "join_interval_overlap",
    oracle="""
        WITH fulfill AS (
            SELECT o.o_orderkey, o.o_orderdate AS iv_start, e.last_ship AS iv_end
            FROM orders o
            JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
                  FROM lineitem GROUP BY l_orderkey) e
              ON o.o_orderkey = e.l_orderkey),
        q AS (SELECT DISTINCT date_trunc('quarter', o_orderdate) AS qs FROM orders)
        SELECT CAST(year(qs) * 10 + quarter(qs) AS INT) AS quarter_id,
               count(*) AS n_open_orders
        FROM fulfill JOIN q
          ON fulfill.iv_start < qs + INTERVAL 3 MONTH AND fulfill.iv_end >= qs
        GROUP BY qs
    """,
    tags=("join", "range"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: order fulfillment windows
    [o_orderdate, max(l_shipdate)] vs calendar quarters -> open orders
    per quarter. The quarter side is a tiny derived dim, so Spark plans a
    broadcast nested-loop on the overlap predicate — each fact row tests
    |quarters| intervals, no shuffle of the fact side. At 100 TB with a
    *large* interval side, the scalable form replicates each interval to
    its coarse time-bins and equi-joins on the bin (same bin-replicate
    trick as dedup LSH banding)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("iv_end"))
    fulfill = orders.join(ends, orders.o_orderkey == ends.l_orderkey).select(
        "o_orderkey", F.col("o_orderdate").alias("iv_start"), "iv_end"
    )
    quarters = orders.select(
        F.date_trunc("quarter", "o_orderdate").alias("qs")
    ).distinct()
    cond = (F.col("iv_start") < F.col("qs") + F.expr("INTERVAL 3 MONTH")) & (
        F.col("iv_end") >= F.col("qs")
    )
    return (
        fulfill.join(F.broadcast(quarters), cond)
        .groupBy("qs")
        .agg(F.count(F.lit(1)).alias("n_open_orders"))
        .select(
            (F.year("qs") * 10 + F.quarter("qs")).cast("int").alias("quarter_id"),
            "n_open_orders",
        )
    )


@register(
    "join_interval_bins",
    oracle="""
        WITH fulfill AS (
            SELECT o.o_orderkey, o.o_orderdate AS iv_start, e.last_ship AS iv_end
            FROM orders o
            JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
                  FROM lineitem GROUP BY l_orderkey) e
              ON o.o_orderkey = e.l_orderkey),
        q AS (SELECT DISTINCT date_trunc('quarter', o_orderdate) AS qs FROM orders)
        SELECT CAST(year(qs) * 10 + quarter(qs) AS INT) AS quarter_id,
               count(*) AS n_open_orders
        FROM fulfill JOIN q
          ON fulfill.iv_start < qs + INTERVAL 3 MONTH AND fulfill.iv_end >= qs
        GROUP BY qs
    """,
    tags=("join", "range"),
)
def join_interval_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable form of join_interval_overlap (same oracle, pinned
    identical): each interval is REPLICATED to the quarter bins it spans
    (explode of a sequence — map-side, fan-out = interval length in
    quarters), then a plain shuffled EQUI-join on the bin replaces the
    nested-loop overlap predicate. At 100 TB this is the difference
    between |facts| x |intervals| probe work and a hash join whose build
    side is the bin dimension. tests/test_plan_quality.py pins that no
    nested-loop appears here."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("iv_end"))
    fulfill = orders.join(ends, orders.o_orderkey == ends.l_orderkey).select(
        "o_orderkey", F.col("o_orderdate").alias("iv_start"), "iv_end"
    )
    quarters = orders.select(
        F.date_trunc("quarter", "o_orderdate").alias("qs")
    ).distinct()
    # A quarter qs overlaps [iv_start, iv_end] iff
    # trunc(iv_start) <= qs <= trunc(iv_end); the guard handles reversed
    # intervals (shipdate precedes orderdate in the synthetic data), whose
    # match set is empty once the quarters diverge.
    binned = fulfill.select(
        "o_orderkey",
        F.explode(
            F.expr(
                """
                CASE WHEN date_trunc('quarter', iv_start) <= date_trunc('quarter', iv_end)
                     THEN sequence(date_trunc('quarter', iv_start),
                                   date_trunc('quarter', iv_end), INTERVAL 3 MONTH)
                     ELSE array()
                END
                """
            )
        ).alias("bin"),
    )
    return (
        binned.join(quarters, binned.bin == quarters.qs)
        .groupBy("qs")
        .agg(F.count(F.lit(1)).alias("n_open_orders"))
        .select(
            (F.year("qs") * 10 + F.quarter("qs")).cast("int").alias("quarter_id"),
            "n_open_orders",
        )
    )


@register(
    "join_full_outer",
    oracle="""
        WITH hi AS (SELECT o_custkey, count(*) AS n_big FROM orders
                    WHERE o_totalprice > 400000 GROUP BY o_custkey),
        seg AS (SELECT c_custkey, c_mktsegment FROM customer
                WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY'))
        SELECT COALESCE(seg.c_custkey, hi.o_custkey) AS custkey,
               seg.c_mktsegment, hi.n_big
        FROM seg FULL OUTER JOIN hi ON seg.c_custkey = hi.o_custkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered/aggregated sides, preserving
    unmatched rows of both (the reconciliation shape — cdc_snapshot_diff
    is this plus change classification). Physical note: full-outer can't
    broadcast either side (unmatched build rows must surface), so Spark
    plans a sort-merge join; both inputs here are pre-reduced before the
    exchange, which is exactly what you want at 100 TB — never full-outer
    raw fact tables."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hi = (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    seg = cust.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_mktsegment")
    return seg.join(hi, seg.c_custkey == hi.o_custkey, "full_outer").select(
        F.coalesce(seg.c_custkey, hi.o_custkey).alias("custkey"),
        "c_mktsegment",
        "n_big",
    )


# ---------------------------------------------------------------------------
# join_interval_bucketed — big-big interval-overlap join via bucket blocking
# ---------------------------------------------------------------------------

IVL_GAP_S = 30 * 60  # session gap (matches analytics.SESSION_GAP_S)
IVL_WIN_S = 30 * 60  # incident half-window around each error event
IVL_BUCKET_S = 3600  # blocking bucket width; >= max interval span / few


@register(
    "join_interval_bucketed",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            <= {IVL_GAP_S} * 1000000
                        THEN 0 ELSE 1 END AS new_sess
            FROM events),
        s AS (
            SELECT user_id, ts, event_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_no
            FROM g),
        sess AS (
            SELECT user_id, session_no,
                   min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
            FROM s GROUP BY user_id, session_no),
        win AS (
            SELECT event_id AS incident_id, user_id AS err_user,
                   epoch_us(ts) - {IVL_WIN_S} * 1000000 AS w_start,
                   epoch_us(ts) + {IVL_WIN_S} * 1000000 AS w_end
            FROM events WHERE event_type = 'error'),
        hits AS (
            SELECT sess.user_id, sess.session_no,
                   count(DISTINCT win.incident_id) AS n_incidents
            FROM sess JOIN win
              ON sess.s_start <= win.w_end AND win.w_start <= sess.s_end
                 AND win.err_user <> sess.user_id
            GROUP BY sess.user_id, sess.session_no)
        SELECT sess.user_id, sess.session_no,
               CAST(sess.s_start AS BIGINT) AS s_start_us,
               COALESCE(hits.n_incidents, 0) AS n_incidents
        FROM sess LEFT JOIN hits
          ON sess.user_id = hits.user_id AND sess.session_no = hits.session_no
    """,
    tags=("join", "interval", "analytics"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big INTERVAL-OVERLAP join with no equi key, made scalable by
    bucket blocking: for every user session (gap-sessionized, same rule
    as sessionize_batch), count the distinct platform incident windows
    (±30 min around every OTHER user's error event) it overlapped — the
    incident-exposure metric an SRE review joins against conversion.

    A naive interval join is a broadcast-nested-loop (quadratic, and
    BNLJ only broadcasts); the scalable plan blocks both sides into the
    fixed-width time buckets each interval SPANS (explode a bounded
    sequence — sessions and windows both span <= 2 one-hour buckets
    here), equi-joins on the bucket id, re-checks the exact overlap
    predicate, and de-duplicates pairs found in multiple shared buckets
    via the count-DISTINCT. This is the interval-join strategy genomics
    engines and Databricks' range-join hint implement natively; Spark
    OSS lacks it, so the engine composes it from explode + hash join.

    Scale: the bucket equi-join shuffles both sides once on a key whose
    cardinality grows with the time span (no corpus self-join, no
    broadcast of a data-sized side). A bucket holding a disproportionate
    share of intervals (flash incident) is ordinary join skew — AQE
    skew-join splits it; the residual predicate keeps correctness
    independent of the blocking. Zero-overlap sessions are restored by a
    left join on the session key (same partitioning as the rollup, no
    extra exchange shape)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap_us <= IVL_GAP_S * 1_000_000, F.lit(0)).otherwise(F.lit(1))
    sess = (
        ev.withColumn("session_no", F.sum(new_sess).over(w).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min(F.unix_micros(F.col("ts"))).alias("s_start"),
            F.max(F.unix_micros(F.col("ts"))).alias("s_end"),
        )
        # two consumers (bucket explode + the zero-restoring left join):
        # materialize the reduced session table once instead of running
        # the sessionize window twice
        .localCheckpoint(eager=True)
    )
    bucket_us = IVL_BUCKET_S * 1_000_000
    sess_b = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / bucket_us),
                F.floor(F.col("s_end") / bucket_us),
            )
        ),
    )
    win = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("err_user"),
        (F.unix_micros(F.col("ts")) - IVL_WIN_S * 1_000_000).alias("w_start"),
        (F.unix_micros(F.col("ts")) + IVL_WIN_S * 1_000_000).alias("w_end"),
    )
    win_b = win.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("w_start") / bucket_us),
                F.floor(F.col("w_end") / bucket_us),
            )
        ),
    )
    # canonical-bucket attribution: a (session, incident) pair found in
    # every shared bucket is COUNTED only in the bucket containing the
    # overlap's start (floor(max(s_start, w_start))) — each true pair
    # matches exactly once, so the exact-once rollup is a plain count(*)
    # with map-side partial aggregation instead of a count(DISTINCT
    # incident) whose per-task distinct hash grows with incident density
    # (the sf1 densification run OOMed exactly there: 10x denser traffic
    # in the same time span means ~100x pairs, and the distinct map held
    # them all before the spill threshold).
    hits = (
        sess_b.join(win_b, "bucket")
        .filter(
            (F.col("s_start") <= F.col("w_end"))
            & (F.col("w_start") <= F.col("s_end"))
            & (F.col("err_user") != F.col("user_id"))
            & (
                F.col("bucket")
                == F.floor(F.greatest("s_start", "w_start") / bucket_us)
            )
        )
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_incidents"))
    )
    return (
        sess.join(hits, ["user_id", "session_no"], "left")
        .select(
            "user_id",
            "session_no",
            F.col("s_start").alias("s_start_us"),
            F.coalesce(F.col("n_incidents"), F.lit(0).cast("bigint")).alias(
                "n_incidents"
            ),
        )
    )
