"""Event-stream analytics: sessionization, funnels, cohort retention.

The reference's only event surface is the CDC changelog (reference
``app/services/exports.py``); any real consumer of such a stream runs
these three product-analytics shapes over it, so they enter the engine
surface as first-class operators over the ``events`` table:

* ``sessionize_batch`` — gap-based sessionization (new session after a
  >30-min silence), the batch dual of Structured Streaming's
  ``session_window`` (see streaming/event_windows.py).
* ``funnel_conversion`` — ordered signup→view→click→purchase funnel.
* ``cohort_retention`` — monthly cohort × activity-month retention grid.

Scale notes (100 TB posture):

* sessionize is ONE shuffle on user_id: lag + running-sum share the same
  window spec, and the per-session rollup's map-side partial aggregation
  runs on data already clustered by user_id, so the second exchange
  carries |sessions|, not |events|.
* the funnel is computed as a per-user fold (``F.aggregate``) over the
  user's time-sorted event array — one shuffle and zero joins, where the
  naive form (and the oracle) chains 4 self-joins. The fold is a JVM
  higher-order function: no Python in the loop. Per-user event lists
  must fit in task memory; for pathological power users, pre-filter to
  the funnel's event types (done here) and/or cap with a per-user limit.
* retention dedups to user-months FIRST (shuffle carries |user-months|,
  ~events/30), then resolves each user's cohort with a tiny window — the
  naive events⋈first-seen join would shuffle the full event log twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.operators.ranks import (
    ntile_from_rank,
    with_global_row_number,
    with_prefix_max,
)
from cdc_export_system_spark.registry import register, dsum, sql_dsum

SESSION_GAP_S = 30 * 60
FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


@register(
    "sessionize_batch",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            <= {SESSION_GAP_S} * 1000000
                        THEN 0 ELSE 1 END AS new_sess
            FROM events),
        s AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_no
            FROM g)
        SELECT user_id, session_no,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               {sql_dsum("value", "sum_value")}
        FROM s GROUP BY user_id, session_no
    """,
    headline=True,
    tags=("analytics", "window"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session breaks after >30 min of
    silence. lag and the running session counter share one window spec
    (single exchange + sort on user_id); the rollup groups data already
    clustered by user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap_us <= SESSION_GAP_S * 1_000_000, F.lit(0)).otherwise(F.lit(1))
    return (
        ev.withColumn("session_no", F.sum(new_sess).over(w).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
    )


@register(
    "funnel_conversion",
    oracle="""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
               WHERE e.event_type = 'view' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST(1 AS INT) AS step, 'signup' AS step_name,
               (SELECT count(*) FROM s1) AS users
        UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
    """,
    tags=("analytics",),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup→view→click→purchase (strictly increasing
    timestamps). Greedy earliest-match per stage — provably the same
    answer as the oracle's chain of sequential mins — computed as a
    per-user ``F.aggregate`` fold over the time-sorted event array: one
    shuffle, no joins, fold runs inside the JVM."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(FUNNEL_STEPS)
    )
    steps_arr = F.array(*[F.lit(s) for s in FUNNEL_STEPS])
    events_arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )

    def advance(acc, x):
        expected = F.get(steps_arr, acc["stage"])  # 0-based, null past the end
        ok = (
            (acc["stage"] < len(FUNNEL_STEPS))
            & (x["event_type"] == expected)
            & ((acc["stage"] == 0) | (x["ts"] > acc["t"]))
        )
        nxt = F.struct(
            (acc["stage"] + 1).cast("int").alias("stage"), x["ts"].alias("t")
        )
        return F.when(ok, nxt).otherwise(acc)

    per_user = ev.groupBy("user_id").agg(
        F.aggregate(events_arr, init, advance)["stage"].alias("stage")
    )
    reached = per_user.agg(
        *[
            F.coalesce(F.sum((F.col("stage") >= k).cast("bigint")), F.lit(0).cast("bigint")).alias(f"s{k}")
            for k in range(1, len(FUNNEL_STEPS) + 1)
        ]
    )
    names = {k: FUNNEL_STEPS[k - 1] for k in range(1, len(FUNNEL_STEPS) + 1)}
    stack_args = ", ".join(
        f"CAST({k} AS INT), '{names[k]}', s{k}" for k in range(1, len(FUNNEL_STEPS) + 1)
    )
    return reached.selectExpr(
        f"stack({len(FUNNEL_STEPS)}, {stack_args}) AS (step, step_name, users)"
    )


FUNNEL_WINDOW_DAYS = 3  # conversion deadline measured from the funnel entry


@register(
    "funnel_time_window",
    oracle=f"""
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
                      AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
               WHERE e.event_type = 'view' GROUP BY e.user_id, s1.t1),
        s3 AS (SELECT e.user_id, s2.t1, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
                      AND e.ts <= s2.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
               WHERE e.event_type = 'click' GROUP BY e.user_id, s2.t1),
        s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
                      AND e.ts <= s3.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST(1 AS INT) AS step, 'signup' AS step_name,
               (SELECT count(*) FROM s1) AS users
        UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
    """,
    tags=("analytics",),
)
def funnel_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed funnel (ClickHouse ``windowFunnel`` semantics, anchored):
    signup→view→click→purchase with strictly increasing timestamps where
    every later stage must land within FUNNEL_WINDOW_DAYS of the user's
    funnel ENTRY (earliest signup) — the standard product-analytics
    "converted within N days" metric, versus funnel_conversion's
    unbounded-horizon chain.

    Same single-shuffle fold as funnel_conversion — the accumulator
    additionally carries the anchor timestamp, and the advance guard
    adds the deadline test. Greedy earliest-match within a fixed
    deadline is optimal by the usual exchange argument, so the fold is
    provably equal to the oracle's chain of deadline-bounded sequential
    mins. One shuffle on user_id; no joins; the per-user event array is
    bounded by that user's event count (heavy users are the skew unit,
    identical to funnel_conversion)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(FUNNEL_STEPS)
    )
    steps_arr = F.array(*[F.lit(s) for s in FUNNEL_STEPS])
    events_arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("timestamp").alias("t"),
        F.lit(None).cast("timestamp").alias("deadline"),
    )

    def advance(acc, x):
        expected = F.get(steps_arr, acc["stage"])  # 0-based, null past the end
        ok = (
            (acc["stage"] < len(FUNNEL_STEPS))
            & (x["event_type"] == expected)
            & (
                (acc["stage"] == 0)
                | ((x["ts"] > acc["t"]) & (x["ts"] <= acc["deadline"]))
            )
        )
        nxt = F.struct(
            (acc["stage"] + 1).cast("int").alias("stage"),
            x["ts"].alias("t"),
            F.coalesce(
                acc["deadline"],
                x["ts"] + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS"),
            ).alias("deadline"),
        )
        return F.when(ok, nxt).otherwise(acc)

    per_user = ev.groupBy("user_id").agg(
        F.aggregate(events_arr, init, advance)["stage"].alias("stage")
    )
    reached = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("stage") >= k).cast("bigint")), F.lit(0).cast("bigint")
            ).alias(f"s{k}")
            for k in range(1, len(FUNNEL_STEPS) + 1)
        ]
    )
    names = {k: FUNNEL_STEPS[k - 1] for k in range(1, len(FUNNEL_STEPS) + 1)}
    stack_args = ", ".join(
        f"CAST({k} AS INT), '{names[k]}', s{k}" for k in range(1, len(FUNNEL_STEPS) + 1)
    )
    return reached.selectExpr(
        f"stack({len(FUNNEL_STEPS)}, {stack_args}) AS (step, step_name, users)"
    )


@register(
    "cohort_retention",
    oracle="""
        WITH um AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('month', ts) AS TIMESTAMP) AS m
                    FROM events),
        c AS (SELECT user_id, min(m) AS cohort FROM um GROUP BY user_id)
        SELECT c.cohort AS cohort_month, um.m AS activity_month,
               CAST(date_diff('month', c.cohort, um.m) AS INT) AS month_offset,
               count(*) AS n_users
        FROM um JOIN c ON um.user_id = c.user_id
        GROUP BY c.cohort, um.m
    """,
    tags=("analytics", "agg"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: users bucketed by first-active month,
    counted in every month they return. One shuffle on user_id carrying
    per-task partial collect_sets (months dedup map-side, so the wire
    volume is |user-months-per-task|, not |events|); the cohort month is
    then array_min of the user's month set — no window, no join back to
    events — and the final rollup's shuffle is the |cohort×month| grid."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.date_trunc("month", F.col("ts"))).alias("months")
    )
    return (
        per_user.select(
            F.array_min("months").alias("cohort_month"),
            F.explode("months").alias("activity_month"),
        )
        .groupBy("cohort_month", "activity_month")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "cohort_month",
            "activity_month",
            (F.months_between(F.col("activity_month"), F.col("cohort_month")))
            .cast("int")
            .alias("month_offset"),
            "n_users",
        )
    )


@register(
    "event_next_transitions",
    oracle="""
        WITH nx AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_type
            FROM events)
        SELECT event_type, next_type, count(*) AS n
        FROM nx WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    tags=("analytics", "window"),
)
def event_next_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (the input to next-action models and UX flow graphs). One
    shuffle on user_id for the lead window; the |types|x|types| rollup
    is map-side combined on data already clustered per user, so the
    second exchange carries at most |tasks|x25 partial rows."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "retention_nday",
    oracle="""
        WITH um AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        c AS (SELECT user_id, min(d) AS d0 FROM um GROUP BY user_id),
        f AS (SELECT um.user_id, c.d0,
                     bool_or(um.d = c.d0 + 1) AS r1,
                     bool_or(um.d > c.d0 AND um.d <= c.d0 + 7) AS r7
              FROM um JOIN c ON um.user_id = c.user_id
              GROUP BY um.user_id, c.d0)
        SELECT CAST(d0 AS TIMESTAMP) AS cohort_day, count(*) AS n_users,
               count(*) FILTER (WHERE r1) AS n_d1,
               count(*) FILTER (WHERE r7) AS n_d7
        FROM f GROUP BY d0
    """,
    tags=("analytics", "agg"),
)
def retention_nday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-1 / day-7 retention per signup-day cohort. Like
    cohort_retention, the event log collapses to per-user day SETS
    map-side (one shuffle carrying |user-days|, not |events|); both
    retention flags are then array predicates over the set — no second
    pass over events, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.col("ts").cast("date")).alias("days")
    )
    d0 = F.array_min("days")
    return (
        per_user.select(
            d0.cast("timestamp").alias("cohort_day"),
            F.array_contains("days", F.date_add(d0, 1)).alias("r1"),
            F.exists(
                "days",
                lambda d: (d > F.array_min("days"))
                & (d <= F.date_add(F.array_min("days"), 7)),
            ).alias("r7"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count_if(F.col("r1")).alias("n_d1"),
            F.count_if(F.col("r7")).alias("n_d7"),
        )
    )


@register(
    "attribution_last_touch",
    oracle="""
        WITH t AS (
            SELECT user_id, event_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_ts
            FROM events)
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               last_click_ts,
               epoch_us(ts) - epoch_us(last_click_ts) AS gap_us
        FROM t WHERE event_type = 'purchase'
    """,
    tags=("analytics", "window"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent preceding click, as a single ignore-nulls window over
    the event stream — zero joins, one shuffle on user_id. The
    stream-stream join form lives in stream_join_attribution; this is
    the batch/backfill shape (no state bound needed: the frame IS the
    lookback)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias("gap_us"),
        )
    )


@register(
    "anomaly_zscore",
    oracle="""
        WITH s AS (
            SELECT user_id, count(*) AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s_c,
                   SUM(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
                       * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sq_c
            FROM events GROUP BY user_id),
        z AS (
            SELECT e.user_id, e.event_id, e.value,
                   (CAST(s.n AS DOUBLE) * CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                      - CAST(CAST(s.s_c AS VARCHAR) AS DOUBLE))
                   / sqrt(CAST(s.n AS DOUBLE)
                          * (CAST(s.n AS DOUBLE) * CAST(CAST(s.sq_c AS VARCHAR) AS DOUBLE)
                             - CAST(CAST(s.s_c AS VARCHAR) AS DOUBLE)
                               * CAST(CAST(s.s_c AS VARCHAR) AS DOUBLE))
                          / (CAST(s.n AS DOUBLE) - 1))
                       AS zs
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE s.n > 1
              AND CAST(s.n AS DOUBLE) * CAST(CAST(s.sq_c AS VARCHAR) AS DOUBLE)
                  > CAST(CAST(s.s_c AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(s.s_c AS VARCHAR) AS DOUBLE))
        SELECT user_id, event_id, value,
               floor(zs * 1000000 + 0.5) / 1000000 AS z
        FROM z WHERE abs(zs) >= 2.5
    """,
    tags=("analytics", "stats", "ml"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event outlier flagging: |z| >= 2.5 against the user's own
    value distribution, with mean/variance from EXACT integer moments
    (cents and cents^2 — see agg_stats_exact for why Welford-merged
    stddev_samp is unusable under reshard). The per-user stats table is
    |users| rows — broadcast back onto the event scan, so the whole op
    is one shuffle (the stats groupBy) + a map-side join; the z
    expression itself is pure codegen arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s_c"),
        F.sum(c.cast("decimal(38,0)") * c).alias("sq_c"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s_c").cast("double")
    sq_d = F.col("sq_c").cast("double")
    b = n_d * sq_d - s_d * s_d  # n * sum(x^2) - sum(x)^2, in cents^2
    zs = (n_d * c - s_d) / F.sqrt(n_d * b / (n_d - F.lit(1)))
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter((F.col("n") > 1) & (b > 0))
        .withColumn("zs", zs)
        .filter(F.abs(F.col("zs")) >= 2.5)
        .select(
            "user_id",
            "event_id",
            "value",
            (F.floor(F.col("zs") * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("z"),
        )
    )


@register(
    "agg_entropy",
    oracle="""
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY user_id, event_type),
        u AS (SELECT user_id, SUM(c) AS n,
                     list_aggregate(
                         list_transform(list(CAST(c AS DOUBLE) ORDER BY event_type),
                                        x -> x * ln(x)), 'sum') AS sclc
              FROM c GROUP BY user_id)
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               floor((ln(CAST(n AS DOUBLE)) - sclc / CAST(n AS DOUBLE)) / ln(2)
                     * 1000000000 + 0.5) / 1000000000 AS entropy_bits
        FROM u
    """,
    tags=("analytics", "agg", "stats"),
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each user's event-type mix — the
    behavioral-diversity feature. Counts aggregate exactly (map-side
    combined ints); the c*ln(c) sum folds over the CATEGORY-SORTED count
    list in both engines, so the float accumulation order is pinned —
    a plain SUM(c*ln c) would be partition-order-dependent. Entropy via
    ln(n) - sum(c ln c)/n needs only the per-category counts, never the
    raw rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "c"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["c"].cast("double") * F.log(x["c"].cast("double")),
        ).alias("sclc"),
    )
    n_d = F.col("n").cast("double")
    ent = (F.log(n_d) - F.col("sclc") / n_d) / F.log(F.lit(2.0))
    return per_user.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        (F.floor(ent * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
            "entropy_bits"
        ),
    )


@register(
    "feat_user_activity",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
               count(*) FILTER (WHERE event_type = 'view') AS n_views,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
               max(ts) AS last_seen,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY user_id
    """,
    tags=("analytics", "agg", "ml"),
)
def feat_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector — the feature-store shape that
    feeds ranking/churn models: typed counts, active days, recency,
    monetary total, in ONE pass over the event log (one shuffle on
    user_id; every column is a conditional aggregate of the same scan,
    never N per-feature joins)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("event_type") == "click").alias("n_clicks"),
        F.count_if(F.col("event_type") == "view").alias("n_views"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
        F.max("ts").alias("last_seen"),
        dsum(F.col("value"), "total_value"),
    )


WAU_WINDOW_DAYS = 7


@register(
    "metric_rolling_wau",
    oracle=f"""
        WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        contrib AS (
            SELECT user_id, d + CAST(off.o AS INTEGER) AS day
            FROM ud JOIN generate_series(0, {WAU_WINDOW_DAYS - 1}) off(o) ON TRUE),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        SELECT CAST(days.day AS TIMESTAMP) AS day,
               CAST(count(DISTINCT contrib.user_id) AS BIGINT) AS wau
        FROM contrib JOIN days ON contrib.day = days.day
        GROUP BY days.day
    """,
    tags=("analytics", "agg"),
)
def metric_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the WAU curve. Windowed
    COUNT DISTINCT has no distributed window form; the scalable shape is
    the CONTRIBUTION EXPLODE: dedup to user-days (map-side sets), fan
    each user-day out to the <=7 report days it contributes to, and
    count distinct per day. Shuffle volume is 7x|user-days| key pairs —
    linear, partitionable, and it beats both the 7-way self-join (7
    scans) and a naive per-day subquery (|days| scans). Reported days
    are restricted to days with any activity — and because posexplode
    carries the offset, 'observed' is simply 'a zero-offset contribution
    exists', so the spine costs NO second scan/branch (count_if over the
    already-deduped user-days is exact)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.posexplode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), WAU_WINDOW_DAYS - 1))
        ).alias("off", "day"),
    )
    return (
        contrib.groupBy("day")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("wau"),
            F.count_if(F.col("off") == 0).alias("n_day0"),
        )
        .filter(F.col("n_day0") > 0)
        .select(F.col("day").cast("timestamp").alias("day"), "wau")
    )


@register(
    "rfm_segmentation",
    oracle="""
        WITH m AS (SELECT max(ts) AS now FROM events),
        per_user AS (
            SELECT user_id,
                   CAST(date_diff('day', max(ts), (SELECT now FROM m)) AS INTEGER)
                       AS recency_days,
                   count(*) AS frequency,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS monetary_cents
            FROM events GROUP BY user_id),
        scored AS (
            SELECT user_id, recency_days, frequency, monetary_cents,
                   ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r,
                   ntile(5) OVER (ORDER BY frequency, user_id) AS f,
                   ntile(5) OVER (ORDER BY monetary_cents, user_id) AS mo
            FROM per_user)
        SELECT user_id, recency_days, frequency, monetary_cents,
               CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(mo AS INT) AS mo,
               CASE WHEN r >= 4 AND f >= 4 AND mo >= 4 THEN 'champion'
                    WHEN r <= 2 AND f >= 4 THEN 'at_risk_loyal'
                    WHEN r >= 4 AND f <= 2 THEN 'new'
                    ELSE 'regular' END AS segment
        FROM scored
    """,
    tags=("analytics", "window", "ml"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user recency/frequency/monetary
    rolled up in ONE event-log pass (exact cents), then three exact
    ntile(5) scores over the |users|-sized aggregate. Each score is a
    distributed global row number (operators/ranks.py — range shuffle +
    parallel per-range window + broadcast offsets, never a
    single-partition sort of |users|) fed through the closed-form
    SQL-standard NTILE bucket formula, so the result is bit-identical
    to the oracle's positional ntile(5) with the user_id tie-break.
    The segment label is a pure CASE over the scores (codegen); 'best'
    quintile is 5 on every axis (recency ranked DESC: most-recent =
    highest score)."""
    ev = load_table(spark, sf_dir, "events")
    now_df = ev.agg(F.max("ts").alias("now"))  # 1 row, broadcast — no driver trip
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(now_df))
        .select(
            "user_id",
            F.datediff(F.col("now").cast("date"), F.col("last_ts").cast("date")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    ranked = per_user
    for rank_col, order in [
        ("rn_r", [F.desc("recency_days"), F.asc("user_id")]),
        ("rn_f", [F.asc("frequency"), F.asc("user_id")]),
        ("rn_mo", [F.asc("monetary_cents"), F.asc("user_id")]),
    ]:
        ranked = with_global_row_number(
            ranked, order, out=rank_col, total_out="n_users"
        )
    scored = ranked.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        ntile_from_rank(F.col("rn_r"), F.col("n_users"), 5).alias("r"),
        ntile_from_rank(F.col("rn_f"), F.col("n_users"), 5).alias("f"),
        ntile_from_rank(F.col("rn_mo"), F.col("n_users"), 5).alias("mo"),
    )
    seg = (
        F.when((F.col("r") >= 4) & (F.col("f") >= 4) & (F.col("mo") >= 4), "champion")
        .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk_loyal")
        .when((F.col("r") >= 4) & (F.col("f") <= 2), "new")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


PATH_TOPK = 25


@register(
    "event_path_topk",
    oracle=f"""
        WITH stepped AS (
            SELECT event_type AS s1,
                   lead(event_type, 1) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
                   lead(event_type, 2) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS s3
            FROM events)
        SELECT s1 || ' > ' || s2 || ' > ' || s3 AS path, count(*) AS n_paths
        FROM stepped WHERE s3 IS NOT NULL
        GROUP BY path
        ORDER BY n_paths DESC, path
        LIMIT {PATH_TOPK}
    """,
    tags=("analytics", "window"),
)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the most common 3-step event sequences, via two lead()
    taps over one per-user sort — the product-analytics 'what do users do
    next' query. Both leads share a single window spec (one exchange +
    sort on user_id); the path rollup is map-side combined over a domain
    bounded by |event_type|^3, and TakeOrderedAndProject picks the head
    with a deterministic (count, path) tie-break."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    )
    return (
        stepped.filter(F.col("s3").isNotNull())
        .select(F.concat_ws(" > ", "s1", "s2", "s3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(PATH_TOPK)
    )


@register(
    "attribution_time_to_convert",
    oracle="""
        WITH t AS (
            SELECT user_id, event_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_ts
            FROM events),
        g AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   epoch_us(ts) - epoch_us(last_click_ts) AS gap_us
            FROM t
            WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL)
        SELECT day, count(*) AS n_conv,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)
                    AS BIGINT) AS p50_gap_us,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)
                    AS BIGINT) AS p90_gap_us,
               CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us
        FROM g GROUP BY day
    """,
    tags=("analytics", "window", "percentile"),
)
def attribution_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution per day: the last-touch
    window (see attribution_last_touch) feeds discrete (ANSI
    percentile_disc) percentiles of the conversion gap — an actual
    element, so the exact-int result is engine-portable where
    interpolated quantile_cont differs in ulps at 1e11 magnitudes. One
    exchange for the per-user window, then a per-day aggregate whose
    shuffle carries |attributed purchases|; the average is an explicit
    exact-int sum / count divide so both engines produce the identical
    double."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    gaps = (
        ev.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter((F.col("event_type") == "purchase") & F.col("last_click_ts").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias("gap_us"),
        )
    )
    return gaps.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_conv"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)"
        ).alias("p50_gap_us"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)"
        ).alias("p90_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("avg_gap_us"),
    )


MAU_WINDOW_DAYS = 30


@register(
    "metric_dau_mau",
    oracle=f"""
        WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        dau AS (
            SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
            FROM ud GROUP BY d),
        contrib AS (
            SELECT user_id, d + CAST(off.o AS INTEGER) AS day
            FROM ud JOIN generate_series(0, {MAU_WINDOW_DAYS - 1}) off(o) ON TRUE),
        mau AS (
            SELECT contrib.day, CAST(count(DISTINCT contrib.user_id) AS BIGINT) AS mau
            FROM contrib JOIN dau ON contrib.day = dau.day
            GROUP BY contrib.day)
        SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, mau.mau,
               CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
        FROM dau JOIN mau ON dau.day = mau.day
    """,
    tags=("analytics", "agg"),
)
def metric_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day. Same contribution-explode shape as
    metric_rolling_wau (windowed COUNT DISTINCT has no distributed
    window form): dedup to user-days map-side, fan each user-day out to
    the <=30 report days its user counts toward via posexplode, and roll
    up ONCE — DAU is count_if(offset == 0), exact because the user-day
    table is already deduped (each user contributes exactly one
    zero-offset row per active day), the observed-day spine is
    'dau > 0', and MAU is the per-day distinct. One scan, one explode,
    one rollup; no joins, no second pass. The final ratio is a single
    divide of two exact BIGINTs."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.posexplode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), MAU_WINDOW_DAYS - 1))
        ).alias("off", "day"),
    )
    return (
        contrib.groupBy("day")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("mau"),
            F.count_if(F.col("off") == 0).cast("bigint").alias("dau"),
        )
        .filter(F.col("dau") > 0)
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


MAD_K = 3.0


@register(
    "anomaly_mad",
    oracle=f"""
        WITH med AS (
            SELECT user_id,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events GROUP BY user_id),
        dev AS (
            SELECT e.user_id, e.event_id, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med ON e.user_id = med.user_id),
        mad AS (
            SELECT user_id, min(med) AS med,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
            FROM dev GROUP BY user_id)
        SELECT d.user_id, d.event_id, d.value, m.med, m.mad,
               round(d.adev / m.mad, 6) AS score
        FROM dev d JOIN mad m ON d.user_id = m.user_id
        WHERE m.mad > 0 AND d.adev > {MAD_K} * m.mad
    """,
    tags=("analytics", "stats", "percentile"),
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    complement of anomaly_zscore for heavy-tailed values, where a single
    spike inflates the stddev and hides itself (the MAD is 50%-breakdown
    robust). percentile_disc keeps every statistic an actual data
    element, so all derived doubles are identical across engines and
    reshards (see attribution_time_to_convert). Shape: two grouped
    medians over the user key + the deviations rejoined — both stats
    tables are |users|-sized and broadcast back onto the scan (the
    anomaly_zscore pattern); membership compares exact doubles, no
    float-ordered LIMIT."""
    ev = load_table(spark, sf_dir, "events")
    # both stats tables are |users|-sized — materialize each once. The
    # un-materialized form re-derived med inside every dev consumer and
    # dev inside mad (4 events scans + 2 redundant percentile passes,
    # r11 plan sweep); with the stats pinned, the plan is the 3-scan
    # minimum this algorithm admits (med needs a pass, mad needs med,
    # the filter needs mad). The DATA-sized dev table is deliberately
    # NOT checkpointed: re-scanning parquet with pruning beats
    # materializing the full deviation stream at warehouse scale.
    med = ev.groupBy("user_id").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    ).localCheckpoint(eager=True)
    dev = ev.join(F.broadcast(med), "user_id").select(
        "user_id",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("user_id").agg(
        F.min("med").alias("med"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad"),
    ).localCheckpoint(eager=True)
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "user_id")
        .filter((F.col("mad") > 0) & (F.col("adev") > MAD_K * F.col("mad")))
        .select(
            "user_id",
            "event_id",
            "value",
            "med",
            "mad",
            F.round(F.col("adev") / F.col("mad"), 6).alias("score"),
        )
    )


@register(
    "cohort_ltv_curve",
    oracle="""
        WITH c AS (
            SELECT user_id, CAST(min(date_trunc('month', ts)) AS TIMESTAMP) AS cohort
            FROM events GROUP BY user_id),
        p AS (
            SELECT c.cohort,
                   CAST(date_diff('month', c.cohort, date_trunc('month', e.ts))
                        AS INT) AS month_offset,
                   CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'),
        g AS (
            SELECT cohort, month_offset, CAST(SUM(cents) AS BIGINT) AS rev_cents
            FROM p GROUP BY cohort, month_offset)
        SELECT cohort, month_offset, rev_cents,
               CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY month_offset
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_rev_cents
        FROM g
    """,
    tags=("analytics", "window", "agg"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime-value curve per signup cohort: purchase
    revenue bucketed by (cohort month, month offset) in exact cents,
    then a running sum over the AGGREGATED |cohorts x offsets| grid —
    the window never touches the event stream (the window_mom_growth
    rule). Cohort resolution is a |users|-sized aggregate broadcast
    onto the purchase scan."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("month", F.col("ts"))).alias("cohort")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .select(
            "cohort",
            F.months_between(F.date_trunc("month", F.col("ts")), F.col("cohort"))
            .cast("int")
            .alias("month_offset"),
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        )
    )
    g = p.groupBy("cohort", "month_offset").agg(F.sum("cents").alias("rev_cents"))
    w = (
        W.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "cohort",
        "month_offset",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("cum_rev_cents"),
    )


@register(
    "sessionize_metrics",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            <= {SESSION_GAP_S} * 1000000
                        THEN 0 ELSE 1 END AS new_sess
            FROM events),
        s AS (
            SELECT user_id, ts,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_no
            FROM g),
        sess AS (
            SELECT user_id, session_no,
                   CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day,
                   count(*) AS n_events,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
            FROM s GROUP BY user_id, session_no)
        SELECT day,
               count(*) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               count(*) FILTER (WHERE n_events = 1) AS n_bounces,
               CAST(SUM(n_events) AS BIGINT) AS total_events,
               CAST(SUM(dur_us) AS DOUBLE) / count(*) AS avg_dur_us
        FROM sess GROUP BY day
    """,
    tags=("analytics", "window", "agg"),
)
def sessionize_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality dashboard rollup: sessions, unique users, bounce
    (single-event) sessions, and mean duration per day — the query a
    product team runs on yesterday's sessionization output. Same single
    event-shuffle as sessionize_batch; the per-session rollup rides the
    user_id clustering and the daily rollup's shuffle carries |sessions|
    rows. A session belongs to the day it STARTED (min ts), so day
    boundaries never split a session's metrics. The mean duration is an
    explicit exact-int sum / count divide."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap_us <= SESSION_GAP_S * 1_000_000, F.lit(0)).otherwise(F.lit(1))
    sess = (
        ev.withColumn("session_no", F.sum(new_sess).over(w).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("day"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
        )
    )
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count_if(F.col("n_events") == 1).alias("n_bounces"),
        F.sum("n_events").alias("total_events"),
        (F.sum("dur_us").cast("double") / F.count(F.lit(1))).alias("avg_dur_us"),
    )


@register(
    "skyline_pareto_front",
    headline=True,
    oracle="""
        WITH pts AS (
            SELECT o_custkey AS cust,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS money_cents
            FROM orders GROUP BY 1)
        SELECT cust, freq, money_cents
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.freq >= p.freq AND q.money_cents >= p.money_cents
              AND (q.freq > p.freq OR q.money_cents > p.money_cents))
    """,
    tags=("analytics", "skyline", "prefix"),
)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (maximal/pareto-optimal points) over the per-customer
    (order count, revenue) plane: customers no one else beats-or-ties on
    both axes with a strict win on at least one — the multi-objective
    'best customers' query. Exact duplicates of a skyline point all
    survive (neither strictly dominates the other).

    The naive form is the oracle's NOT EXISTS — an all-pairs dominance
    check, quadratic in |customers| and planned as a nested-loop at any
    engine. Here it is three reductions and zero self-joins:

    1. ``pts``: per-customer (freq, money) — the only |orders|-sized
       shuffle;
    2. ``per_x``: max money per distinct freq (a |distinct freq| table);
    3. exclusive prefix-max of that column over freq DESC via
       :func:`with_prefix_max` — the two-level range construction, no
       single-partition sort even when x is continuous and |per_x| is
       |pts|-sized;
    4. join thresholds back: a point is on the skyline iff it carries
       its x-group's max y AND strictly beats the best y among all
       strictly-greater x.

    At 100 TB the dominance structure costs two small shuffles beyond
    the per-customer aggregate; AQE broadcasts the per_x side when tiny.
    """
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))).alias("money_cents"),
    )
    return skyline_2d(pts, x="freq", y="money_cents")


def skyline_2d(pts: DataFrame, x: str, y: str) -> DataFrame:
    """Maximizing 2-D skyline of ``pts``: rows where no other row is >=
    on both ``x`` and ``y`` and strictly greater on at least one.
    Reductions + distributed prefix-max; see skyline_pareto_front."""
    per_x = pts.groupBy(x).agg(F.max(y).alias("__ymax"))
    thr = with_prefix_max(per_x, [F.desc(x)], "__ymax", out="__gt_max")
    return (
        pts.join(thr, x)
        .filter(
            (F.col(y) == F.col("__ymax"))
            & (F.col("__gt_max").isNull() | (F.col(y) > F.col("__gt_max")))
        )
        .drop("__ymax", "__gt_max")
        .select(*pts.columns)
    )


@register(
    "sessionize_session_window",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            < {SESSION_GAP_S} * 1000000
                        THEN 0 ELSE 1 END AS new_sess
            FROM events),
        s AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_no
            FROM g)
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
               count(*) AS n_events,
               {sql_dsum("value", "sum_value")}
        FROM s GROUP BY user_id, session_no
    """,
    tags=("analytics", "window", "session"),
)
def sessionize_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` aggregate in
    batch mode — the same native operator Structured Streaming uses for
    its stateful session windows (streaming/event_windows.py), run over
    the static events table. One shuffle on (user_id, merged-window);
    session merging happens inside the aggregation operator itself, so
    unlike sessionize_batch there is no lag/running-sum window pass at
    all — Spark's UpdatingSessionsIterator merges in-sort.

    Semantics note, pinned by the oracle: session_window breaks at gap
    >= 30 min (windows are half-open [ts, ts+gap), adjacency does not
    merge), while sessionize_batch's lag formulation breaks at gap >
    30 min — the two agree everywhere except events exactly 30:00.000000
    apart, so the oracle uses strict '<' where sessionize_batch uses
    '<='. session_end is last_ts + gap by definition (the window's
    close, not the last event)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register("metric_rolling_wau_hll", headline=True, tags=("analytics", "sketch", "agg"))
def metric_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users via HLL SKETCH ALGEBRA — the
    pre-aggregation shape that replaces metric_rolling_wau's exact
    contribution explode once |user-days| is too large to reshuffle:
    build ONE mergeable sketch per day (map-side combinable, fixed
    ~2^12 bytes each), fan the <=7-day contributions out over the
    |days|-sized sketch table, and union per report day. Shuffle volume
    drops from 7x|user-days| key pairs to 7x|days| fixed-size sketches
    — at 100 TB that is the difference between reshuffling billions of
    user-day pairs and moving a few thousand kilobyte-sized sketches.
    The daily sketch table is also reusable for ANY window length (MAU,
    QAU) without rescanning raw events — the sketch-rollup property.

    Approximate (standard HLL error ~1.6% at lgConfigK=12), hence
    rows-only for the driver; accuracy vs the exact operator is pinned
    in tests/test_pipeline_ops.py (sparse-mode sketches are exact at
    fixture cardinalities)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    contrib = daily.select(
        "sk",
        F.posexplode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), WAU_WINDOW_DAYS - 1))
        ).alias("off", "day"),
    )
    return (
        contrib.groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est"),
            F.count_if(F.col("off") == 0).alias("n_day0"),
        )
        .filter(F.col("n_day0") > 0)
        .select(F.col("day").cast("timestamp").alias("day"), "wau_est")
    )


@register(
    "sessionize_dynamic_gap",
    oracle=f"""
        WITH e AS (
            SELECT user_id, ts, event_id, value,
                   epoch_us(ts) + (CASE WHEN event_type IN ('view','click')
                                        THEN 1800 ELSE 600 END) * 1000000 AS end_us
            FROM events),
        m AS (
            SELECT *, max(end_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM e),
        g AS (
            SELECT *, CASE WHEN prev_end IS NOT NULL AND epoch_us(ts) < prev_end
                           THEN 0 ELSE 1 END AS new_sess FROM m),
        s AS (
            SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS session_no FROM g)
        SELECT user_id, min(ts) AS session_start,
               make_timestamp(max(end_us)) AS session_end,
               count(*) AS n_events,
               {sql_dsum("value", "sum_value")}
        FROM s GROUP BY user_id, session_no
    """,
    tags=("analytics", "window", "session"),
)
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` with a DYNAMIC gap expression: engaged events
    (view/click) hold a session open 30 minutes, everything else 10 —
    the per-event-type timeout real product analytics wants, which the
    fixed-gap form cannot express. Each event contributes the interval
    [ts, ts + its own gap); Spark merges overlaps inside the native
    session aggregation (one (user, window) shuffle, streaming-capable).
    The oracle derives the same sessions independently as interval
    merging: new session iff ts >= running max of all PRIOR interval
    ends (a plain prefix-max — an earlier long-gap event can outlast a
    later short-gap one, which a lag-only formulation would miss)."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("view", "click"), F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "metric_event_type_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        pairs AS (
            SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type)
        SELECT type_a, type_b, count(*) AS n_users_both
        FROM pairs GROUP BY type_a, type_b
    """,
    tags=("analytics", "agg"),
)
def metric_event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral overlap matrix: for every event-type pair, how many
    distinct users perform BOTH — the co-engagement table behind
    cross-feature funnels and cannibalization checks (the user-behavior
    sibling of dedup_cross_source_overlap, same bounded-set expansion).

    Scale: one (user, type) distinct shuffle; types collapse to a
    bounded set per user (≤|event types|) and pairs expand inside each
    user group — never a users×users or events×events join (the
    oracle's ut×ut self-join is the DuckDB check, not the plan). Output
    is |types|² rows at most."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sets = ut.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    ).filter(F.size("ts") >= 2)
    pairs = sets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(ts, (x, i) ->
                    transform(slice(ts, i + 2, size(ts) - i - 1),
                              y -> struct(x AS type_a, y AS type_b))))
                """
            )
        ).alias("p")
    )
    return (
        pairs.select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users_both"))
    )


SPIKE_RATIO = 1.5  # day-over-day rate change that counts as a spike/drop


@register(
    "anomaly_rate_spike",
    oracle=f"""
        WITH d AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   count(*) AS n
            FROM events GROUP BY event_type, date_trunc('day', ts)),
        w AS (
            SELECT event_type, day, n,
                   lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
            FROM d)
        SELECT event_type, day, n, prev,
               floor(CAST(n AS DOUBLE) / CAST(prev AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS ratio,
               (CAST(n AS DOUBLE) >= CAST(prev AS DOUBLE) * {SPIKE_RATIO})
                   AS is_spike
        FROM w
        WHERE prev IS NOT NULL
          AND (CAST(n AS DOUBLE) >= CAST(prev AS DOUBLE) * {SPIKE_RATIO}
               OR CAST(n AS DOUBLE) * {SPIKE_RATIO} <= CAST(prev AS DOUBLE))
    """,
    tags=("analytics", "anomaly", "timeseries"),
)
def anomaly_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume anomalies per event type: days whose count
    jumped to ≥1.5× or fell to ≤1/1.5× of the previous active day —
    the first-line ops alarm on any ingest ('did a producer die or
    double-fire overnight'), complementing the value-level detectors
    (anomaly_zscore/anomaly_mad watch the metric, this watches the
    RATE). The spike predicate compares exact integers scaled by the
    ratio constant; the reported ratio is one divide, 1e-6-rounded.

    Scale: events collapse to the (type, day) axis first (map-side
    combined, ≤|types|×|days| rows); the lag window runs on that
    reduced axis partitioned by type — never on the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    t = d.select(
        "event_type", "day", "n", F.lag("n").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    nd, pd_ = F.col("n").cast("double"), F.col("prev").cast("double")
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return t.filter(
        (nd >= pd_ * SPIKE_RATIO) | (nd * SPIKE_RATIO <= pd_)
    ).select(
        "event_type",
        "day",
        "n",
        "prev",
        r6(nd / pd_).alias("ratio"),
        (nd >= pd_ * SPIKE_RATIO).alias("is_spike"),
    )


@register(
    "event_dwell_time",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events),
        g AS (
            SELECT event_type, count(*) AS n_gaps,
                   CAST(SUM(CAST(gap_us AS HUGEINT)) AS HUGEINT) AS total_us,
                   CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
            FROM s WHERE gap_us IS NOT NULL GROUP BY event_type)
        SELECT event_type, n_gaps,
               floor(CAST(CAST(total_us AS VARCHAR) AS DOUBLE)
                     / CAST(n_gaps AS DOUBLE) / 1000000
                     * 1000000 + 0.5) / 1000000 AS mean_gap_sec,
               CAST(max_gap_us AS DOUBLE) / 1000000 AS max_gap_sec
        FROM g
    """,
    tags=("analytics", "window", "agg"),
)
def event_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event dwell time per event type: for each event, the gap
    since the SAME USER's previous event (any type), aggregated to
    count / exact mean / max per the type of the later event — the
    engagement-cadence profile ('how long do users sit before a
    purchase vs a click'). Gap sums accumulate exact integer
    microseconds in DECIMAL(38,0); the mean is one divide at the end,
    1e-6-rounded.

    Scale: one user_id-keyed window shuffle for the lag (the sessionize
    family's exchange), then a map-side-combined rollup to |types|
    rows."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ).alias("gap_us")
    s = ev.select("event_type", gap).filter(F.col("gap_us").isNotNull())
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("total_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return g.select(
        "event_type",
        "n_gaps",
        r6(
            F.col("total_us").cast("double")
            / F.col("n_gaps").cast("double")
            / 1000000
        ).alias("mean_gap_sec"),
        (F.col("max_gap_us").cast("double") / 1000000).alias("max_gap_sec"),
    )


@register(
    "metric_new_vs_returning",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events),
        first AS (SELECT user_id, min(day) AS first_day FROM act GROUP BY user_id)
        SELECT a.day,
               count(*) AS n_active,
               CAST(SUM(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN f.first_day = a.day THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_returning
        FROM act a JOIN first f USING (user_id)
        GROUP BY a.day
    """,
    tags=("analytics", "metric", "agg"),
)
def metric_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting curve
    every product dashboard leads with (is today's traffic acquisition
    or retention?). A user is 'new' on their first active day, counted
    by attributing each (user, day) activity row against the user's
    min(day).

    Scale: events collapse to distinct (user, day) first; first-seen
    days are a user-keyed aggregate joined back on user_id (both sides
    already reduced); the rollup is |days| rows. The raw stream is
    touched once."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    act = act.localCheckpoint(eager=True)  # one events scan; two consumers
    first = act.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_flag = (F.col("first_day") == F.col("day")).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(new_flag).cast("bigint").alias("n_new"),
            F.sum(1 - new_flag).cast("bigint").alias("n_returning"),
        )
    )


BACKLOG_ASOF = "1998-08-02"  # TPC-H's canonical as-of date
AGING_BUCKET_DAYS = 180


@register(
    "orders_backlog_aging",
    oracle=f"""
        SELECT CAST(floor(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                          DATE '{BACKLOG_ASOF}') AS DOUBLE)
                          / {AGING_BUCKET_DAYS}) AS BIGINT) AS age_bucket,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                    AS DOUBLE) AS open_value
        FROM orders
        WHERE o_orderstatus = 'O' AND CAST(o_orderdate AS DATE) <= DATE '{BACKLOG_ASOF}'
        GROUP BY 1
    """,
    tags=("analytics", "agg", "filter"),
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aged into 180-day (AGING_BUCKET_DAYS) buckets at a
    fixed as-of date: how much open value is how stale — the
    accounts-receivable/fulfillment aging report, the operational
    sibling of metric_open_orders_sweep's time series. Bucket assignment
    is exact integer day arithmetic; open value is the exact-cents sum.

    Scale: a scan-side status+date filter (pushed to parquet) feeding
    one map-side-combined aggregate to the handful of age buckets."""
    o = load_table(spark, sf_dir, "orders")
    age = F.datediff(F.lit(BACKLOG_ASOF).cast("date"), F.col("o_orderdate"))
    from cdc_export_system_spark.registry import dsum

    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate") <= F.lit(BACKLOG_ASOF).cast("date"))
        )
        .groupBy(
            F.floor(age.cast("double") / AGING_BUCKET_DAYS)
            .cast("bigint")
            .alias("age_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "open_value"),
        )
    )


# ---------------------------------------------------------------------------
# attribution_position_based
# ---------------------------------------------------------------------------

ATTR_WINDOW_S = 3600  # lookback from each purchase (stream_join_attribution's 1h)


@register(
    "attribution_position_based",
    oracle=f"""
        WITH p AS (
            SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
        c AS (
            SELECT event_id AS click_id, user_id, ts AS c_ts
            FROM events WHERE event_type = 'click'),
        t AS (
            SELECT p.purchase_id, p.cents, c.click_id, c.c_ts,
                   row_number() OVER (PARTITION BY p.purchase_id
                                      ORDER BY c.c_ts, c.click_id) AS pos,
                   count(*) OVER (PARTITION BY p.purchase_id) AS n
            FROM p JOIN c
              ON p.user_id = c.user_id
             AND c.c_ts < p.p_ts
             AND c.c_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_S} SECONDS),
        wgt AS (
            SELECT purchase_id, cents, click_id, c_ts,
                   CASE WHEN n = 1 THEN 1000000
                        WHEN n = 2 THEN 500000
                        WHEN pos = 1 OR pos = n THEN 400000
                        ELSE 200000 // (n - 2)
                             + CASE WHEN pos = 2
                                    THEN 200000 % (n - 2) ELSE 0 END
                   END AS w_ppm
            FROM t)
        SELECT CAST(hour(c_ts) AS BIGINT) AS click_hour,
               CAST(count(*) AS BIGINT) AS n_touches,
               floor(CAST(SUM(cents * w_ppm) AS DOUBLE) / 100000000
                     * 1000000 + 0.5) / 1000000 AS credited_dollars
        FROM wgt GROUP BY hour(c_ts)
    """,
    tags=("analytics", "attribution", "window", "join"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-SHAPED (position-based) multi-touch attribution: each purchase
    splits its value across the user's clicks in the preceding hour —
    40% to the first touch, 40% to the last, 20% spread over the
    middles (degenerate rules: a lone click takes 100%, a pair splits
    50/50) — rolled up by click hour-of-day, the report a marketing
    mix review reads next to attribution_last_touch's winner-takes-all
    view. Weights are EXACT parts-per-million integers (the 20% middle
    share distributes by integer division with the remainder pinned to
    the first middle), credits are cents x ppm bigints, so the rollup
    is order-free integer arithmetic and the report hash-matches.

    Scale: one equi-join on user_id with the time bound as a residual
    (the scalable attribution shape — state-bounded in the streaming
    dual), one window over the per-purchase touch lists (bounded by
    clicks-per-user-hour), one |hours| rollup. Nothing data-sized
    moves twice."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    t = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_S} SECONDS")
        ),
    )
    wp = W.partitionBy("purchase_id")
    t = t.select(
        "purchase_id",
        "cents",
        "click_id",
        "c_ts",
        F.row_number().over(wp.orderBy("c_ts", "click_id")).alias("pos"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    n, pos = F.col("n"), F.col("pos")
    w_ppm = (
        F.when(n == 1, F.lit(1000000))
        .when(n == 2, F.lit(500000))
        .when((pos == 1) | (pos == n), F.lit(400000))
        .otherwise(
            F.expr("CAST(200000 div (n - 2) AS BIGINT)")
            + F.when(pos == 2, F.lit(200000) % (n - 2)).otherwise(F.lit(0))
        )
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        t.select(
            F.hour("c_ts").cast("bigint").alias("click_hour"),
            (F.col("cents") * w_ppm).alias("credit_micro"),
        )
        .groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            r6(F.sum("credit_micro").cast("double") / F.lit(100000000.0)).alias(
                "credited_dollars"
            ),
        )
    )


# ---------------------------------------------------------------------------
# event_markov_stationary_exact
# ---------------------------------------------------------------------------

MARKOV_S = 1_000_000  # fixed-point scale for transition probabilities
MARKOV_SQUARINGS = 10  # P^(2^10): rows of the power converge to π


def _markov_oracle(squarings: int = MARKOV_SQUARINGS) -> str:
    its = []
    prev = "m0"
    for t in range(1, squarings + 1):
        its.append(f"""
        m{t} AS MATERIALIZED (
            SELECT a.i, b.j, CAST(SUM(a.p * b.p) // {MARKOV_S} AS BIGINT) AS p
            FROM {prev} a JOIN {prev} b ON a.j = b.i
            GROUP BY a.i, b.j)""")
        prev = f"m{t}"
    return f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
            FROM events),
        tr AS (
            SELECT prev AS i, event_type AS j, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
        rowtot AS (SELECT i, SUM(n) AS tot FROM tr GROUP BY i),
        m0 AS MATERIALIZED (
            SELECT tr.i, tr.j,
                   CAST((CAST(tr.n AS HUGEINT) * {MARKOV_S}) // rowtot.tot
                        AS BIGINT) AS p
            FROM tr JOIN rowtot USING (i)),
        {", ".join(its)},
        anchor AS (SELECT min(i) AS i0 FROM m0)
        SELECT m.j AS state, CAST(m.p AS BIGINT) AS pi_micro,
               CAST(rowtot.tot AS BIGINT) AS n_out_transitions
        FROM {prev} m
        JOIN anchor ON m.i = anchor.i0
        JOIN rowtot ON rowtot.i = m.j
    """


@register(
    "event_markov_stationary_exact",
    oracle=_markov_oracle(),
    tags=("analytics", "graph", "iterative", "agg"),
)
def event_markov_stationary_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain (the
    long-run share of each event type a user session converges to) in
    exact fixed-point arithmetic: transition counts come from the
    lag-window sequence per user, the transition matrix quantizes to
    1e-6 integer units, and the limit P^∞ is reached by REPEATED
    SQUARING — 10 rounds give P^1024 with every entry an exact integer
    (each squaring renormalizes by div S, truncating identically in
    both engines). The emitted row is the anchor state's row of the
    converged power, i.e. π up to the 1e-6 quantization — the
    graph_pagerank_exact discipline applied to a dense 5-state chain
    (cf. event_next_transitions for the raw one-step matrix).

    Scale: one lag-window pass (single user_id shuffle) reduces the
    corpus to a |states|² count table; the squarings are model-sized
    (125-row joins). States beyond a handful would make the matrix
    sparse — same plan, keyed joins instead of dense products."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    tr = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("i"), F.col("event_type").alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rowtot = tr.groupBy("i").agg(F.sum("n").alias("tot"))
    m = (
        tr.join(rowtot, "i")
        .select(
            "i",
            "j",
            # n is volume-scaled (transition count): promote the *1e6 to
            # DECIMAL(38,0) so the quantization survives any corpus size;
            # `div` on decimal operands is exact truncating division and
            # lands back in BIGINT (p <= 1e6 by construction).
            F.expr(
                f"CAST((CAST(n AS DECIMAL(38,0)) * {MARKOV_S}) div tot"
                " AS BIGINT)"
            ).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(MARKOV_SQUARINGS):
        a, b = m.alias("a"), m.alias("b")
        m = (
            a.join(b, F.col("a.j") == F.col("b.i"))
            .groupBy(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
            .agg(
                F.expr(f"sum(a.p * b.p) div {MARKOV_S}").alias("p")
            )
            .localCheckpoint(eager=True)
        )
    anchor = m.agg(F.min("i").alias("i0"))
    rt = rowtot.select(F.col("i").alias("state"), F.col("tot"))
    return (
        m.join(F.broadcast(anchor), m.i == F.col("i0"))
        .select(F.col("j").alias("state"), F.col("p").cast("bigint").alias("pi_micro"))
        .join(F.broadcast(rt), "state")
        .select(
            "state",
            "pi_micro",
            F.col("tot").cast("bigint").alias("n_out_transitions"),
        )
    )


# ---------------------------------------------------------------------------
# anomaly_seasonal_residual
# ---------------------------------------------------------------------------

SEASONAL_MAD_K = 4  # flag hours whose |count - baseline| exceeds K * MAD


@register(
    "anomaly_seasonal_residual",
    oracle=f"""
        WITH h AS (
            SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, date_trunc('hour', ts)),
        g AS (
            SELECT event_type, dayofweek(hr) AS dow, hour(hr) AS hod,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
            FROM h GROUP BY event_type, dayofweek(hr), hour(hr)),
        dev AS (
            SELECT h.event_type, h.hr, h.n, g.med, abs(h.n - g.med) AS adev
            FROM h JOIN g ON h.event_type = g.event_type
                         AND dayofweek(h.hr) = g.dow AND hour(h.hr) = g.hod),
        mad AS (
            SELECT event_type, dayofweek(hr) AS dow, hour(hr) AS hod,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
            FROM dev GROUP BY event_type, dayofweek(hr), hour(hr))
        SELECT d.event_type, d.hr, d.n AS n_events,
               CAST(d.med AS BIGINT) AS baseline,
               CAST(m.mad AS BIGINT) AS mad,
               floor(CAST(d.adev AS DOUBLE) / m.mad * 1000000 + 0.5) / 1000000
                   AS score
        FROM dev d
        JOIN mad m ON d.event_type = m.event_type
                  AND dayofweek(d.hr) = m.dow AND hour(d.hr) = m.hod
        WHERE m.mad > 0 AND d.adev > {SEASONAL_MAD_K} * m.mad
    """,
    tags=("analytics", "anomaly", "timeseries"),
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomalies: each (event_type, hour) count
    is compared against the MEDIAN count of its own (day-of-week,
    hour-of-day) cell — the 'is this Tuesday 3pm weird for a Tuesday
    3pm' readout that survives daily/weekly cycles where
    anomaly_rate_spike's day-over-day ratio false-alarms every Monday.
    Deviations are scored in robust MAD units per cell (50%-breakdown,
    like anomaly_mad), and every statistic is percentile_disc over exact
    integers, so membership and scores are partition-invariant.

    Scale: the corpus collapses to the (type, hour) count series in ONE
    shuffle; baselines and MADs are grids of at most |types|*168 cells
    computed FROM that |hours|-sized series and broadcast back onto it —
    the raw event stream is never rejoined."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # DuckDB dayofweek() is 0=Sunday; Spark dayofweek() is 1=Sunday. The
    # cell key is materialized on the series once so the grid joins are
    # plain equi-joins (no self-join ambiguity, no re-derivation).
    h = h.select(
        "event_type",
        "hr",
        "n",
        (F.dayofweek("hr") - F.lit(1)).alias("dow"),
        F.hour("hr").alias("hod"),
    )
    # the |hours|-sized series is consumed by the baseline grid, the
    # deviation join and the final join — materialize it once, or each
    # consumer re-runs the events scan + count shuffle (4 scans in the
    # r11 plan sweep; "never rejoined" was true of the plan shape, not
    # the recomputation)
    h = h.localCheckpoint(eager=True)
    g = h.groupBy("event_type", "dow", "hod").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").alias("med")
    )
    dev = h.join(F.broadcast(g), ["event_type", "dow", "hod"]).select(
        "event_type",
        "hr",
        "dow",
        "hod",
        "n",
        "med",
        F.abs(F.col("n") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type", "dow", "hod").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), ["event_type", "dow", "hod"])
        .filter(
            (F.col("mad") > 0) & (F.col("adev") > SEASONAL_MAD_K * F.col("mad"))
        )
        .select(
            "event_type",
            "hr",
            F.col("n").alias("n_events"),
            F.col("med").cast("bigint").alias("baseline"),
            F.col("mad").cast("bigint").alias("mad"),
            (
                F.floor(
                    F.col("adev").cast("double") / F.col("mad") * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# event_transition_entropy
# ---------------------------------------------------------------------------


@register(
    "event_transition_entropy",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
            FROM events),
        c AS (SELECT prev AS state, event_type AS nxt, count(*) AS c
              FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
        s AS (SELECT state, SUM(c) AS n, CAST(count(*) AS BIGINT) AS n_next,
                     list_aggregate(
                         list_transform(list(CAST(c AS DOUBLE) ORDER BY nxt),
                                        x -> x * ln(x)), 'sum') AS sclc
              FROM c GROUP BY state)
        SELECT state, CAST(n AS BIGINT) AS n_transitions, n_next,
               floor((ln(CAST(n AS DOUBLE)) - sclc / CAST(n AS DOUBLE)) / ln(2)
                     * 1000000000 + 0.5) / 1000000000 AS entropy_bits
        FROM s
    """,
    tags=("analytics", "agg", "stats"),
)
def event_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXT-EVENT PREDICTABILITY per state: the Shannon entropy (bits)
    of each event type's outgoing transition distribution — 0 bits
    means the next action is fully determined, log2(k) means anything
    can follow; the scalar summary of the event_next_transitions matrix
    and the uncertainty complement of event_markov_stationary_exact.
    Same exactness discipline as agg_entropy: integer transition counts,
    the c*ln(c) fold runs over the CATEGORY-SORTED count list so float
    accumulation order is pinned in both engines.

    Scale: one user_id window pass reduces the corpus to the |states|^2
    count table; everything after is model-sized."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    c = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("state"), F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = c.groupBy("state").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_next"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("nxt", "c"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["c"].cast("double") * F.log(x["c"].cast("double")),
        ).alias("sclc"),
    )
    n_d = F.col("n").cast("double")
    ent = (F.log(n_d) - F.col("sclc") / n_d) / F.log(F.lit(2.0))
    return s.select(
        "state",
        F.col("n").cast("bigint").alias("n_transitions"),
        "n_next",
        (F.floor(ent * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
            "entropy_bits"
        ),
    )


# ---------------------------------------------------------------------------
# metric_concentration_shares
# ---------------------------------------------------------------------------

CONCENTRATION_PCTS = (1, 10, 50)


@register(
    "metric_concentration_shares",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey),
        r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
                   SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   count(*) OVER () AS c,
                   SUM(cents) OVER () AS s
            FROM spend),
        p AS (SELECT unnest(ARRAY{list(CONCENTRATION_PCTS)}) AS pct)
        SELECT p.pct, CAST(r.rn AS BIGINT) AS n_customers,
               CAST(r.cum AS DOUBLE) / 100 AS cum_dollars,
               CAST((r.cum * 1000000) // r.s AS BIGINT) AS share_micro
        FROM r JOIN p ON r.rn = (p.pct * r.c + 99) // 100
    """,
    tags=("analytics", "agg", "window"),
)
def metric_concentration_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE CONCENTRATION ('whale curve' checkpoints): the share of
    total order value held by the top 1% / 10% / 50% of customers —
    the Lorenz-curve readings behind 'our top 1% is X% of revenue'
    (agg_gini is the same curve integrated to one number). Customers
    rank by exact-cents spend (ties on custkey), cutoff ranks are
    ceil(p*C/100) in pure integer arithmetic, and shares are
    multiply-before-divide micro-units.

    Scale: the rank and the running total both come from the two-level
    range constructions (ranks.py) over the |customers| aggregate — a
    global order with NO single-partition sort of data-sized input; the
    oracle's bare OVER () windows are the single-node rendering. The
    3-row percentile spine and the grand totals ride the row (free from
    total_out / the offset table), so the final filter is row-local."""
    from cdc_export_system_spark.operators.ranks import (
        with_global_row_number, with_prefix_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .alias("cents")
    )
    order_cols = [F.desc("cents"), F.asc("o_custkey")]
    r = with_global_row_number(spend, order_cols, out="rn", total_out="c")
    # total_suffix: the cents grand total rides the prefix machinery's
    # offsets broadcast — the old separate r.agg(sum) consumed the
    # WHOLE ranked frame a second time (r12)
    r = with_prefix_sum(r, order_cols, ["cents"], suffix="_before",
                        materialize=False, total_suffix="__t")
    r = r.withColumn("cum", F.col("cents_before") + F.col("cents"))
    r = r.withColumn("s", F.col("cents__t"))
    pcts = F.explode(
        F.array(*[F.lit(p) for p in CONCENTRATION_PCTS])
    ).alias("pct")
    spine = r.sparkSession.range(1).select(pcts)
    return (
        r
        .join(
            F.broadcast(spine),
            F.col("rn") == F.expr("(pct * c + 99) div 100"),
        )
        .select(
            F.col("pct").cast("int").alias("pct"),
            F.col("rn").cast("bigint").alias("n_customers"),
            (F.col("cum").cast("double") / 100).alias("cum_dollars"),
            # cum * 1e6 exceeds BIGINT once total cents pass ~9.2e12 (the
            # 10x sweep hit the ANSI ArithmeticException); DECIMAL(38,0)
            # carries the product exactly and div stays integral — the
            # oracle's HUGEINT promotion is automatic
            F.expr(
                "CAST((CAST(cum AS DECIMAL(38,0)) * 1000000) div s"
                " AS BIGINT)"
            ).alias("share_micro"),
        )
    )


# ---------------------------------------------------------------------------
# sessionize_funnel_within
# ---------------------------------------------------------------------------

_SESSION_FUNNEL_STEPS = ["view", "click", "purchase"]


@register(
    "sessionize_funnel_within",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            <= {SESSION_GAP_S} * 1000000
                        THEN 0 ELSE 1 END AS new_sess
            FROM events),
        s AS (
            SELECT user_id, ts, event_type,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_no
            FROM g),
        s1 AS (SELECT user_id, session_no, min(ts) AS t FROM s
               WHERE event_type = 'view' GROUP BY user_id, session_no),
        s2 AS (SELECT s.user_id, s.session_no, min(s.ts) AS t FROM s
               JOIN s1 ON s.user_id = s1.user_id
                      AND s.session_no = s1.session_no AND s.ts > s1.t
               WHERE s.event_type = 'click' GROUP BY s.user_id, s.session_no),
        s3 AS (SELECT s.user_id, s.session_no, min(s.ts) AS t FROM s
               JOIN s2 ON s.user_id = s2.user_id
                      AND s.session_no = s2.session_no AND s.ts > s2.t
               WHERE s.event_type = 'purchase' GROUP BY s.user_id, s.session_no),
        tot AS (SELECT count(DISTINCT (user_id, session_no)) AS n FROM s)
        SELECT CAST(1 AS INT) AS step, 'view' AS step_name,
               (SELECT CAST(count(*) AS BIGINT) FROM s1) AS sessions,
               (SELECT CAST(n AS BIGINT) FROM tot) AS total_sessions
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
               (SELECT n FROM tot)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
               (SELECT n FROM tot)
    """,
    tags=("analytics", "window", "funnel"),
)
def sessionize_funnel_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WITHIN-SESSION funnel: view -> click -> purchase completed in
    order INSIDE one session — the intent-to-conversion readout product
    teams actually ship (funnel_conversion's lifetime-ordered funnel
    credits a purchase days after the click; this one requires the
    whole path within a 30-min-gap session). Steps chain by the
    min-timestamp-after-previous-step rule on (user, session) keys.

    Scale: sessions assign on ONE user_id exchange (the sessionize_batch
    window) and the sessioned frame is checkpointed once; each funnel
    step is a keyed groupBy + equi-join on (user_id, session_no) — the
    chain never rejoins raw events, and the final is a 3-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap_us <= SESSION_GAP_S * 1_000_000, F.lit(0)).otherwise(
        F.lit(1)
    )
    s = (
        ev.withColumn("session_no", F.sum(new_sess).over(w).cast("bigint"))
        .select("user_id", "session_no", "ts", "event_type")
        .localCheckpoint(eager=True)
    )
    keys = ["user_id", "session_no"]
    prev = (
        s.filter(F.col("event_type") == _SESSION_FUNNEL_STEPS[0])
        .groupBy(*keys)
        .agg(F.min("ts").alias("t"))
        .localCheckpoint(eager=True)
    )
    total = s.select(*keys).distinct().select(
        F.count(F.lit(1)).cast("bigint").alias("total_sessions")
    )
    step_counts = [
        prev.agg(F.count(F.lit(1)).cast("bigint").alias("sessions")).select(
            F.lit(1).cast("int").alias("step"),
            F.lit(_SESSION_FUNNEL_STEPS[0]).alias("step_name"),
            "sessions",
        )
    ]
    for i, step in enumerate(_SESSION_FUNNEL_STEPS[1:], start=2):
        prev = (
            s.filter(F.col("event_type") == step)
            .join(prev.withColumnRenamed("t", "t_prev"), keys)
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy(*keys)
            .agg(F.min("ts").alias("t"))
            .localCheckpoint(eager=True)
        )
        step_counts.append(
            prev.agg(F.count(F.lit(1)).cast("bigint").alias("sessions")).select(
                F.lit(i).cast("int").alias("step"),
                F.lit(step).alias("step_name"),
                "sessions",
            )
        )
    out = step_counts[0]
    for sc in step_counts[1:]:
        out = out.unionAll(sc)
    return out.crossJoin(F.broadcast(total))


# ---------------------------------------------------------------------------
# metric_mix_shift
# ---------------------------------------------------------------------------

MIX_SHIFT_M1 = "1995-03"
MIX_SHIFT_M2 = "1995-04"


@register(
    "metric_mix_shift",
    oracle=f"""
        WITH o AS (
            SELECT c.c_mktsegment AS segment,
                   strftime(o.o_orderdate, '%Y-%m') AS m,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE strftime(o.o_orderdate, '%Y-%m')
                  IN ('{MIX_SHIFT_M1}', '{MIX_SHIFT_M2}')),
        s AS (
            SELECT segment,
                   CAST(SUM(CASE WHEN m = '{MIX_SHIFT_M1}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN m = '{MIX_SHIFT_M2}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN m = '{MIX_SHIFT_M1}' THEN cents
                            ELSE 0 END) AS BIGINT) AS rev1,
                   CAST(SUM(CASE WHEN m = '{MIX_SHIFT_M2}' THEN cents
                            ELSE 0 END) AS BIGINT) AS rev2
            FROM o GROUP BY segment)
        SELECT segment, n1, n2,
               CAST(rev1 AS DOUBLE) / 100 AS rev_m1,
               CAST(rev2 AS DOUBLE) / 100 AS rev_m2,
               CAST(((n2 - n1) * CAST(rev1 AS HUGEINT) * 1000000) // n1
                    AS BIGINT) AS volume_effect_microcents,
               CAST((rev2 - rev1) * CAST(1000000 AS HUGEINT)
                    - ((n2 - n1) * CAST(rev1 AS HUGEINT) * 1000000) // n1
                    AS BIGINT) AS price_mix_effect_microcents
        FROM s WHERE n1 > 0
    """,
    tags=("analytics", "metric", "agg"),
)
def metric_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOLUME/PRICE-MIX decomposition of the month-over-month revenue
    change per market segment — the 'why did revenue move' answer every
    business review asks: volume effect = (n2 - n1) * avg_ticket_m1,
    price/mix effect = the remainder. The rational avg_ticket never
    floats: both effects are multiply-before-divide integer micro-cents
    (HUGEINT/DECIMAL(38) through the product), and they sum EXACTLY to
    the total change by construction — an accounting identity the hash
    comparison re-proves every round. Segments born in month 2 (n1 = 0,
    decomposition undefined) are excluded identically in both engines.

    Scale: one customer-dim broadcast join, one segment-keyed
    combinable aggregate over a two-month partition-prunable slice."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    m = F.date_format("o_orderdate", "yyyy-MM")
    o = (
        orders.filter(m.isin(MIX_SHIFT_M1, MIX_SHIFT_M2))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            m.alias("m"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
    )
    is1 = (F.col("m") == MIX_SHIFT_M1).cast("int")
    is2 = (F.col("m") == MIX_SHIFT_M2).cast("int")
    s = o.groupBy("segment").agg(
        F.sum(is1).cast("bigint").alias("n1"),
        F.sum(is2).cast("bigint").alias("n2"),
        F.sum(is1 * F.col("cents")).cast("bigint").alias("rev1"),
        F.sum(is2 * F.col("cents")).cast("bigint").alias("rev2"),
    )
    ve = F.expr(
        "cast(((n2 - n1) * cast(rev1 as decimal(38,0)) * 1000000) div n1"
        " as bigint)"
    )
    pe = F.expr(
        "cast((rev2 - rev1) * cast(1000000 as decimal(38,0))"
        " - ((n2 - n1) * cast(rev1 as decimal(38,0)) * 1000000) div n1"
        " as bigint)"
    )
    return s.filter(F.col("n1") > 0).select(
        "segment",
        "n1",
        "n2",
        (F.col("rev1").cast("double") / 100).alias("rev_m1"),
        (F.col("rev2").cast("double") / 100).alias("rev_m2"),
        ve.alias("volume_effect_microcents"),
        pe.alias("price_mix_effect_microcents"),
    )


# ---------------------------------------------------------------------------
# event_growth_accounting
# ---------------------------------------------------------------------------


@register(
    "event_growth_accounting",
    oracle="""
        WITH um AS (
            SELECT DISTINCT user_id,
                   (year(ts) - 1970) * 12 + month(ts) - 1 AS mi
            FROM events),
        mx AS (SELECT max(mi) AS max_mi FROM um),
        w AS (
            SELECT user_id, mi,
                   lag(mi) OVER (PARTITION BY user_id ORDER BY mi) AS prev_mi,
                   lead(mi) OVER (PARTITION BY user_id ORDER BY mi) AS next_mi
            FROM um),
        act AS (
            SELECT mi,
                   CASE WHEN prev_mi IS NULL THEN 'new'
                        WHEN prev_mi = mi - 1 THEN 'retained'
                        ELSE 'resurrected' END AS status
            FROM w),
        churn AS (
            SELECT w.mi + 1 AS mi, 'churned' AS status
            FROM w CROSS JOIN mx
            WHERE (w.next_mi IS NULL OR w.next_mi > w.mi + 1)
              AND w.mi + 1 <= mx.max_mi),
        allrows AS (SELECT * FROM act UNION ALL SELECT * FROM churn)
        SELECT CAST(DATE '1970-01-01' + to_months(CAST(mi AS INT))
                    AS TIMESTAMP) AS month,
               status, CAST(count(*) AS BIGINT) AS n_users
        FROM allrows GROUP BY mi, status
    """,
    tags=("analytics", "metric", "window"),
)
def event_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING (the Social-Capital MAU ledger): every month's
    active users split into NEW (first month ever), RETAINED (also
    active last month), RESURRECTED (active after a gap), plus the
    CHURNED count (active last month, absent this month) — the four
    numbers whose identity MAU(t) = new + retained + resurrected and
    delta-MAU = new + resurrected - churned makes growth reviews
    honest. Month arithmetic runs on an integer month index (no date
    rounding), churn attribution stops at the data's last month, and
    every count is exact.

    Scale: the corpus collapses to DISTINCT (user, month) in one
    shuffle; lag/lead ride a user-keyed window over that reduced frame;
    the 1-row max-month broadcast bounds churn attribution."""
    ev = load_table(spark, sf_dir, "events")
    um = ev.select(
        "user_id",
        ((F.year("ts") - 1970) * 12 + F.month("ts") - 1).alias("mi"),
    ).distinct()
    return growth_accounting(um)


def growth_accounting(um: DataFrame) -> DataFrame:
    """Growth-accounting core over a distinct (user_id, mi) frame —
    split out so the all-four-statuses pin can drive it with
    constructed activity (the testdata spans one month, which only
    exercises 'new')."""
    from pyspark.sql import Window as W

    w_u = W.partitionBy("user_id").orderBy("mi")
    w = um.select(
        "mi",
        F.lag("mi").over(w_u).alias("prev_mi"),
        F.lead("mi").over(w_u).alias("next_mi"),
    )
    # the lagged frame feeds the status split AND the churn leg, and
    # max(mi) reads off it too — pinned once, the (user, month) distinct
    # + window runs once instead of three times (r11 plan sweep)
    w = w.localCheckpoint(eager=True)
    mx = w.agg(F.max("mi").alias("max_mi"))
    act = w.select(
        "mi",
        F.when(F.col("prev_mi").isNull(), "new")
        .when(F.col("prev_mi") == F.col("mi") - 1, "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    churn = (
        w.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("next_mi").isNull() | (F.col("next_mi") > F.col("mi") + 1))
            & (F.col("mi") + 1 <= F.col("max_mi"))
        )
        .select((F.col("mi") + 1).alias("mi"), F.lit("churned").alias("status"))
    )
    allrows = act.unionAll(churn)
    return (
        allrows.groupBy("mi", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.to_timestamp(
                F.add_months(F.lit("1970-01-01").cast("date"), F.col("mi"))
            ).alias("month"),
            "status",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# anomaly_seasonal_esd
# ---------------------------------------------------------------------------

ESD_ROUNDS = 5  # max anomalies extracted (unrolled in the oracle)
ESD_K = 5  # robust threshold: dev > K * MAD


def _esd_oracle(rounds: int = ESD_ROUNDS, k: int = ESD_K) -> str:
    ctes = [
        """h0 AS MATERIALIZED (
            SELECT epoch_us(ts) // 3600000000 AS eh,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1)"""
    ]
    for t in range(rounds):
        ctes.append(f"""m{t} AS MATERIALIZED (
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
            FROM h{t}),
        d{t} AS MATERIALIZED (
            SELECT eh, n, abs(n - m{t}.med) AS dev FROM h{t}, m{t}),
        md{t} AS MATERIALIZED (
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
            FROM d{t}),
        c{t} AS MATERIALIZED (
            SELECT {t + 1} AS round, eh, n, dev FROM d{t}, md{t}
            WHERE dev > {k} * md{t}.mad
            ORDER BY dev DESC, eh LIMIT 1),
        h{t + 1} AS MATERIALIZED (
            SELECT eh, n FROM h{t}
            WHERE eh NOT IN (SELECT eh FROM c{t}))""")
    unions = " UNION ALL ".join(f"SELECT * FROM c{t}" for t in range(rounds))
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT CAST(round AS INT) AS round, CAST(eh AS BIGINT) AS epoch_hour,
               n AS n_events, CAST(dev AS BIGINT) AS deviation
        FROM ({unions})"""
    )


@register(
    "anomaly_seasonal_esd",
    oracle=_esd_oracle(),
    tags=("analytics", "anomaly", "iterative"),
)
def anomaly_seasonal_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE robust outlier extraction on the hourly volume series —
    the S-H-ESD shape (Twitter's AnomalyDetection): each round computes
    the MEDIAN and MAD of the REMAINING series, extracts the single
    most-deviant hour if it clears K*MAD, and recomputes — so one
    colossal spike cannot mask the next one (the masking problem that
    breaks single-pass z/MAD rules; cf. anomaly_mad). Fully
    deterministic: medians are percentile_disc data elements, the
    extraction picks (max deviation, min hour), and a round that clears
    nothing leaves the state fixed — so the oracle's full unroll equals
    the early-exiting loop.

    Scale: the corpus collapses to the |hours| axis once; each round is
    axis-sized aggregates plus a TakeOrdered-1 — O(rounds) tiny stages,
    the k-core/pagerank-exact iteration discipline."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("eh"))
        .groupBy("eh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    out = None
    for t in range(ESD_ROUNDS):
        med = h.agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").alias("med")
        )
        d = h.crossJoin(F.broadcast(med)).select(
            "eh", "n", F.abs(F.col("n") - F.col("med")).alias("dev")
        )
        mad = d.agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").alias("mad")
        )
        c = (
            d.crossJoin(F.broadcast(mad))
            .filter(F.col("dev") > ESD_K * F.col("mad"))
            .orderBy(F.desc("dev"), F.asc("eh"))
            .limit(1)
            .select(F.lit(t + 1).cast("int").alias("round"), "eh", "n", "dev")
            .localCheckpoint(eager=True)
        )
        out = c if out is None else out.unionAll(c)
        h = h.join(c.select("eh"), "eh", "left_anti").localCheckpoint(eager=True)
    return out.select(
        "round",
        F.col("eh").cast("bigint").alias("epoch_hour"),
        F.col("n").alias("n_events"),
        F.col("dev").cast("bigint").alias("deviation"),
    )


# ---------------------------------------------------------------------------
# event_type_affinity
# ---------------------------------------------------------------------------


@register(
    "event_type_affinity",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
                FROM events),
        tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM ut GROUP BY event_type),
        pair AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type)
        SELECT p.type_a, p.type_b, p.n_both, ta.n AS n_a, tb.n AS n_b,
               CAST((CAST(p.n_both AS HUGEINT) * tot.nu * 1000000)
                    // (CAST(ta.n AS HUGEINT) * tb.n)
                    AS BIGINT) AS lift_micro
        FROM pair p
        JOIN tc ta ON ta.event_type = p.type_a
        JOIN tc tb ON tb.event_type = p.type_b
        CROSS JOIN tot
    """,
    tags=("analytics", "metric", "agg"),
)
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIOR AFFINITY matrix: for every pair of event types, the
    LIFT between 'user ever does A' and 'user ever does B' —
    P(A and B) / (P(A) P(B)), > 1e6 micro meaning the behaviors
    attract, < 1e6 meaning they substitute; the user-level analogue of
    basket_association_rules' per-order lift. Multiply-before-divide
    integer micro-units, counts from one distinct (user, type)
    collapse.

    Scale: the corpus reduces to |users| x |types| flags in one
    shuffle; the pair join is keyed on user_id with |types|-bounded
    fan-out per user; marginals are a |types|-row dim joined back
    (broadcast) and the user total a 1-row cross."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().localCheckpoint(eager=True)
    tot = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("nu")
    )
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        pair.join(
            F.broadcast(tc.select(F.col("event_type").alias("type_a"),
                                  F.col("n").alias("n_a"))), "type_a"
        )
        .join(
            F.broadcast(tc.select(F.col("event_type").alias("type_b"),
                                  F.col("n").alias("n_b"))), "type_b"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            # DECIMAL products (oracle: HUGEINT): n_both*nu*1e6 and n_a*n_b
            # are the counts-squared lint class at user-count scale
            F.expr(
                "cast((cast(n_both as decimal(38,0)) * nu * 1000000)"
                " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_micro"),
        )
    )


# ---------------------------------------------------------------------------
# orders_delivery_sla
# ---------------------------------------------------------------------------

SLA_DAYS = 90  # promise: every line ships within 90 days of the order


@register(
    "orders_delivery_sla",
    oracle=f"""
        WITH l AS (
            SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP)
                       AS ship_month,
                   CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                        AS BIGINT) AS fulfil_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT ship_month, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN fulfil_days > {SLA_DAYS} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late,
               CAST((CAST(SUM(CASE WHEN fulfil_days > {SLA_DAYS} THEN 1 ELSE 0 END)
                          AS HUGEINT)
                     * 1000000) // count(*) AS BIGINT) AS late_rate_micro,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY fulfil_days)
                    AS BIGINT) AS p50_fulfil_days,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY fulfil_days)
                    AS BIGINT) AS p90_fulfil_days
        FROM l GROUP BY ship_month
    """,
    tags=("analytics", "metric", "percentile", "join"),
)
def orders_delivery_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULFILLMENT SLA dashboard by ship month: order-to-ship latency
    against a 90-day promise — late rate plus the p50/p90 latency
    tails operations actually watches (tpch_q12 counts by ship MODE;
    this tracks the promise over TIME with distribution tails). Late
    rates are multiply-before-divide micro-ints; latency percentiles
    are percentile_disc data elements — exact end to end.

    Scale: orders joins as the key-side of a fact-fact equi-join (the
    plan_bucketed_join layout makes it exchange-free at ingest); then
    one ship-month-keyed aggregate whose per-group percentile buffer
    holds one month's lines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    l = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias(
            "fulfil_days"
        ),
    )
    late = F.when(F.col("fulfil_days") > SLA_DAYS, F.lit(1)).otherwise(F.lit(0))
    return l.groupBy("ship_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.expr(
            f"cast((cast(sum(case when fulfil_days > {SLA_DAYS} then 1 else 0"
            " end) as decimal(38,0)) * 1000000) div count(*) as bigint)"
        ).alias("late_rate_micro"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY fulfil_days)")
        .cast("bigint")
        .alias("p50_fulfil_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY fulfil_days)")
        .cast("bigint")
        .alias("p90_fulfil_days"),
    )


# ---------------------------------------------------------------------------
# supplier_scorecard
# ---------------------------------------------------------------------------

SCORECARD_TOP = 20


@register(
    "supplier_scorecard",
    oracle=f"""
        WITH l AS (
            SELECT l.l_suppkey,
                   CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                   CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                        > {SLA_DAYS} AS BIGINT) AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        s AS (
            SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(SUM(cents) AS BIGINT) AS rev_cents,
                   CAST(SUM(late) AS BIGINT) AS n_late
            FROM l GROUP BY l_suppkey),
        r AS (
            SELECT s.*, su.s_name,
                   row_number() OVER (ORDER BY rev_cents DESC, l_suppkey)
                       AS rk
            FROM s JOIN supplier su ON su.s_suppkey = s.l_suppkey)
        SELECT CAST(rk AS INT) AS revenue_rank, l_suppkey, s_name, n_lines,
               CAST(rev_cents AS DOUBLE) / 100 AS revenue,
               CAST((CAST(n_late AS HUGEINT) * 1000000) // n_lines AS BIGINT)
                   AS late_rate_micro
        FROM r WHERE rk <= {SCORECARD_TOP}
    """,
    tags=("analytics", "metric", "join"),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLIER SCORECARD: the top-20 (SCORECARD_TOP) revenue suppliers with their
    fulfillment-SLA late rate — the vendor-review table combining
    orders_delivery_sla's promise metric with a revenue ranking (who
    matters AND who underdelivers). Revenue in exact cents, late rate
    multiply-before-divide micro-ints, ranking tie-broken on the key.

    Scale: one fact-fact equi-join on orderkey (bucketable at ingest),
    one supplier-keyed aggregate, the supplier dim broadcast for
    names, a TakeOrdered top-20."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        (F.datediff("l_shipdate", "o_orderdate") > SLA_DAYS)
        .cast("bigint")
        .alias("late"),
    )
    s = l.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
        F.sum("late").cast("bigint").alias("n_late"),
    )
    from pyspark.sql import Window as W

    r = (
        s.join(F.broadcast(sup), s.l_suppkey == sup.s_suppkey)
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.desc("rev_cents"), F.asc("l_suppkey"))
            ),
        )
        .filter(F.col("rk") <= SCORECARD_TOP)
    )
    return r.select(
        F.col("rk").cast("int").alias("revenue_rank"),
        "l_suppkey",
        "s_name",
        "n_lines",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        F.expr("cast((cast(n_late as decimal(38,0)) * 1000000)"
               " div n_lines as bigint)").alias(
            "late_rate_micro"
        ),
    )


# ---------------------------------------------------------------------------
# orders_rfm_segmentation
# ---------------------------------------------------------------------------

RFM_ASOF = "1998-08-02"  # as-of date for recency (TPC-H's dataset end)
RFM_Q = 5  # quintile segmentation


@register(
    "orders_rfm_segmentation",
    oracle=f"""
        WITH cust AS (
            SELECT o_custkey AS c,
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             DATE '{RFM_ASOF}') AS rec_days,
                   count(*) AS freq,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS mon_cents
            FROM orders GROUP BY o_custkey),
        n AS (SELECT count(*) AS n FROM cust),
        r AS (
            SELECT c, rec_days, freq, mon_cents,
                   row_number() OVER (ORDER BY rec_days, c) AS rr,
                   row_number() OVER (ORDER BY freq, c) AS rf,
                   row_number() OVER (ORDER BY mon_cents, c) AS rm
            FROM cust),
        q AS (
            SELECT CAST((rr - 1) * {RFM_Q} // n.n AS BIGINT) AS r_q,
                   CAST((rf - 1) * {RFM_Q} // n.n AS BIGINT) AS f_q,
                   CAST((rm - 1) * {RFM_Q} // n.n AS BIGINT) AS m_q,
                   mon_cents
            FROM r CROSS JOIN n)
        SELECT r_q, f_q, m_q,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(mon_cents) AS BIGINT) AS segment_cents
        FROM q GROUP BY r_q, f_q, m_q
    """,
    tags=("analytics", "bi", "window"),
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the retail-BI classic: per customer,
    Recency (days from last order to a fixed as-of date), Frequency
    (order count), Monetary (lifetime cents); each dimension quintiled
    over the whole customer base and the (R, F, M) segments rolled up
    with their value mass. Quintile = floor((rank-1) * 5 / n) over the
    total order (metric, custkey) — deterministic under ties, exact
    integer arithmetic, identical in both engines.

    Scale: the obvious ntile()/row_number() OVER (ORDER BY metric) is
    an Exchange SinglePartition over |customers| — banned in this
    tree. Each of the three ranks rides the ranks.py two-level range
    construction (range-partitioned local sort + a broadcast
    |ranges|-row offset table), so no stage ever holds the customer
    base on one task; the rollup reduces to <= 125 segments."""
    from cdc_export_system_spark.operators.ranks import with_global_row_number

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max("o_orderdate").cast("date")
        ).alias("rec_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("mon_cents"),
    )
    r = with_global_row_number(
        cust, [F.asc("rec_days"), F.asc("c")], out="rr", total_out="n"
    )
    r = with_global_row_number(r, [F.asc("freq"), F.asc("c")], out="rf")
    r = with_global_row_number(r, [F.asc("mon_cents"), F.asc("c")], out="rm")
    quint = lambda rank: F.expr(  # noqa: E731
        f"CAST(({rank} - 1) * {RFM_Q} div n AS BIGINT)"
    )
    return (
        r.select(
            quint("rr").alias("r_q"),
            quint("rf").alias("f_q"),
            quint("rm").alias("m_q"),
            "mon_cents",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("mon_cents").cast("bigint").alias("segment_cents"),
        )
    )


# ---------------------------------------------------------------------------
# attribution_markov_removal
# ---------------------------------------------------------------------------

MARKOV_ITERS = 12  # fixed-point iterations (geometric convergence; the
# chain's longest journeys here are ~tens of touches, and 12 doublings of
# absorbed mass put the integer iterate at its fixpoint for micro units)

_MK_TRANS = """
        seq AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(event_type = 'purchase' AS BIGINT) AS isp,
                   COALESCE(SUM(CAST(event_type = 'purchase' AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS jid
            FROM events),
        conv AS (
            SELECT user_id, jid, max(isp) AS converted,
                   SUM(1 - isp) AS n_touch
            FROM seq GROUP BY user_id, jid),
        t AS (
            SELECT s.user_id, s.jid, s.ts, s.event_id, s.event_type,
                   row_number() OVER (PARTITION BY s.user_id, s.jid
                                      ORDER BY s.ts, s.event_id) AS rn,
                   lead(s.event_type) OVER (PARTITION BY s.user_id, s.jid
                                            ORDER BY s.ts, s.event_id)
                       AS nxt
            FROM seq s WHERE s.isp = 0),
        trans AS (
            SELECT 'start' AS frm, event_type AS t_o FROM t WHERE rn = 1
            UNION ALL
            SELECT event_type, nxt FROM t WHERE nxt IS NOT NULL
            UNION ALL
            SELECT t.event_type,
                   CASE WHEN c.converted = 1 THEN 'conv' ELSE 'drop' END
            FROM t JOIN conv c
              ON c.user_id = t.user_id AND c.jid = t.jid
            WHERE t.nxt IS NULL
            UNION ALL
            SELECT 'start', 'conv' FROM conv
            WHERE converted = 1 AND n_touch = 0),
        tc AS (SELECT frm, t_o, CAST(count(*) AS BIGINT) AS n
               FROM trans GROUP BY frm, t_o)
"""


def _markov_oracle() -> str:
    chan = "SELECT DISTINCT t_o AS c FROM tc WHERE t_o NOT IN ('conv', 'drop')"
    setup = f"""
        WITH {_MK_TRANS},
        chans AS ({chan}),
        runs AS (SELECT c AS removed FROM chans
                 UNION ALL SELECT 'none'),
        outs AS (
            SELECT r.removed, tc.frm AS s,
                   CAST(SUM(tc.n) AS BIGINT) AS ni,
                   CAST(SUM(CASE WHEN tc.t_o = 'conv' THEN tc.n ELSE 0 END)
                        AS BIGINT) AS cv
            FROM tc CROSS JOIN runs r
            WHERE tc.frm <> r.removed
            GROUP BY r.removed, tc.frm),
        ie AS (
            SELECT r.removed, tc.frm, tc.t_o, tc.n
            FROM tc CROSS JOIN runs r
            WHERE tc.t_o NOT IN ('conv', 'drop')
              AND tc.t_o <> r.removed AND tc.frm <> r.removed),
        p0 AS (SELECT removed, s, CAST(0 AS BIGINT) AS p FROM outs)
    """
    iters = ""
    for k in range(1, MARKOV_ITERS + 1):
        iters += f""",
        p{k} AS (
            SELECT o.removed, o.s,
                   CAST((CAST(o.cv AS HUGEINT) * 1000000
                         + COALESCE(e.acc, 0)) // o.ni
                        AS BIGINT) AS p
            FROM outs o LEFT JOIN (
                SELECT ie.removed, ie.frm AS s,
                       SUM(CAST(ie.n AS HUGEINT) * p.p) AS acc
                FROM ie JOIN p{k - 1} p
                  ON p.removed = ie.removed AND p.s = ie.t_o
                GROUP BY ie.removed, ie.frm) e
              ON e.removed = o.removed AND e.s = o.s)
    """
    last = f"p{MARKOV_ITERS}"
    return f"""{setup}{iters},
        base AS (SELECT p AS b FROM {last}
                 WHERE removed = 'none' AND s = 'start'),
        rem AS (SELECT removed AS channel, p AS removed_conv_micro
                FROM {last} WHERE removed <> 'none' AND s = 'start'),
        eff AS (
            SELECT r.channel, b.b AS base_conv_micro, r.removed_conv_micro,
                   CASE WHEN b.b > r.removed_conv_micro
                        THEN b.b - r.removed_conv_micro ELSE 0 END AS effect
            FROM rem r CROSS JOIN base b),
        tot AS (SELECT SUM(effect) AS te FROM eff)
        SELECT e.channel, e.base_conv_micro, e.removed_conv_micro,
               CAST(e.effect AS BIGINT) AS removal_effect_micro,
               CAST(CASE WHEN t.te > 0
                    THEN e.effect * 1000000 // t.te ELSE 0 END AS BIGINT)
                   AS share_ppm
        FROM eff e CROSS JOIN tot t
    """


@register(
    "attribution_markov_removal",
    oracle=_markov_oracle(),
    tags=("analytics", "attribution", "ml"),
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-DRIVEN attribution by Markov removal effects — the
    model-based member of the attribution family (last_touch and
    position_based are rule-based): user event streams become journeys
    (a purchase converts and closes the journey; later events open the
    next one), journeys become a first-order Markov chain over the
    touch channels with absorbing conv/drop states, and a channel's
    credit is its REMOVAL EFFECT — how much the chain's start->conv
    probability falls when paths through that channel are failed
    (edges into it redirect to drop; out-probabilities keep their
    original denominators, so following a removed edge means losing
    the journey, the standard Anderl et al. formulation).

    Exactness: transition counts are exact integers from one
    distributed pass; the absorbing-chain solve runs MARKOV_ITERS
    rounds of the integer fixed point p_i <- (cv_i * 1e6 +
    sum_j n_ij * p_j) div n_i — truncating division in micro units,
    bit-identical to the oracle's unrolled CTE chain (the kmeans-exact
    discipline applied to an absorbing Markov chain). The solve runs
    on the collected transition matrix — a MODEL-SIZED object
    (|channels + start|^2 <= dozens of rows, the k-means-centroid
    precedent), so the driver loop is O(channels^2 x iters) integer
    ops, not a data pass.

    Scale: journey segmentation is one user_id window pass; the
    transition rollup reduces the event stream to the tiny (frm, to)
    matrix map-side. Everything after is model-sized."""
    ev = load_table(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy("ts", "event_id")
    isp = (F.col("event_type") == "purchase").cast("bigint")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        isp.alias("isp"),
        F.coalesce(
            F.sum(isp).over(wuser.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("jid"),
    )
    conv = seq.groupBy("user_id", "jid").agg(
        F.max("isp").alias("converted"),
        F.sum(F.lit(1) - F.col("isp")).alias("n_touch"),
    )
    wj = W.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    t = seq.filter(F.col("isp") == 0).select(
        "user_id",
        "jid",
        "event_type",
        F.row_number().over(wj).alias("rn"),
        F.lead("event_type").over(wj).alias("nxt"),
    )
    trans = (
        t.filter(F.col("rn") == 1)
        .select(F.lit("start").alias("frm"), F.col("event_type").alias("t_o"))
        .unionAll(
            t.filter(F.col("nxt").isNotNull()).select(
                F.col("event_type").alias("frm"), F.col("nxt").alias("t_o")
            )
        )
        .unionAll(
            t.filter(F.col("nxt").isNull())
            .join(conv, ["user_id", "jid"])
            .select(
                F.col("event_type").alias("frm"),
                F.when(F.col("converted") == 1, F.lit("conv"))
                .otherwise(F.lit("drop"))
                .alias("t_o"),
            )
        )
        .unionAll(
            conv.filter((F.col("converted") == 1) & (F.col("n_touch") == 0))
            .select(F.lit("start").alias("frm"), F.lit("conv").alias("t_o"))
        )
    )
    tc = [
        (r["frm"], r["t_o"], r["n"])
        for r in trans.groupBy("frm", "t_o")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()  # model-sized: (|channels|+1)^2 upper bound
    ]

    channels = sorted({to for _, to, _ in tc if to not in ("conv", "drop")})

    def solve(removed: str | None) -> int:
        outs: dict[str, int] = {}
        cv: dict[str, int] = {}
        for frm, to, n in tc:
            if frm == removed:
                continue
            outs[frm] = outs.get(frm, 0) + n
            if to == "conv":
                cv[frm] = cv.get(frm, 0) + n
        inner = [
            (frm, to, n)
            for frm, to, n in tc
            if to not in ("conv", "drop") and to != removed and frm != removed
        ]
        p = {s: 0 for s in outs}
        for _ in range(MARKOV_ITERS):
            acc = {s: 0 for s in outs}
            for frm, to, n in inner:
                acc[frm] += n * p.get(to, 0)
            p = {
                s: (cv.get(s, 0) * 1_000_000 + acc[s]) // outs[s] for s in outs
            }
        return p.get("start", 0)

    base = solve(None)
    effects = []
    for c in channels:
        rc = solve(c)
        effects.append((c, base, rc, max(0, base - rc)))
    te = sum(e for _, _, _, e in effects)
    rows = [
        (c, b, rc, e, (e * 1_000_000 // te) if te > 0 else 0)
        for c, b, rc, e in effects
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_micro bigint, removed_conv_micro bigint,"
        " removal_effect_micro bigint, share_ppm bigint",
    )


# ---------------------------------------------------------------------------
# event_alert_debounce
# ---------------------------------------------------------------------------

DEBOUNCE_VALUE_MIN = 90.0  # alert condition: value above this
DEBOUNCE_COOLDOWN_S = 900  # suppress same-user alerts for 15 minutes


@register(
    "event_alert_debounce",
    oracle=f"""
        WITH RECURSIVE al AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events WHERE value > {DEBOUNCE_VALUE_MIN}),
        r AS (
            SELECT user_id, event_id, us, rn, n,
                   TRUE AS emitted, us AS last_emit
            FROM al WHERE rn = 1
            UNION ALL
            SELECT al.user_id, al.event_id, al.us, al.rn, al.n,
                   al.us >= r.last_emit + {DEBOUNCE_COOLDOWN_S} * 1000000
                       AS emitted,
                   CASE WHEN al.us >= r.last_emit
                             + {DEBOUNCE_COOLDOWN_S} * 1000000
                        THEN al.us ELSE r.last_emit END AS last_emit
            FROM r JOIN al
              ON al.user_id = r.user_id AND al.rn = r.rn + 1)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_alerts,
               CAST(count(*) FILTER (WHERE emitted) AS BIGINT) AS n_emitted,
               CAST(count(*) FILTER (WHERE NOT emitted) AS BIGINT)
                   AS n_suppressed,
               CAST(min(CASE WHEN emitted THEN event_id END) AS BIGINT)
                   AS first_alert_id,
               CAST(max(last_emit) AS BIGINT) AS last_emit_us
        FROM r GROUP BY user_id
    """,
    tags=("analytics", "stateful", "events"),
)
def event_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert DEBOUNCING with a true cooldown: an alert (value above
    DEBOUNCE_VALUE_MIN) emits only if the user's last EMITTED alert is
    at least DEBOUNCE_COOLDOWN_S older — the paging-dedup rule every
    on-call stack implements. This is deliberately NOT a window
    function: whether row k emits depends on which earlier rows
    EMITTED, not merely on the previous alert (three alerts at t,
    t+10m, t+20m emit the 1st and 3rd; lag-based suppression would
    wrongly silence the 3rd) — the same self-referential recurrence
    class as ts_holt_exact, and it gets the same treatment: a grouped
    Arrow batch per user with integer microsecond state, bit-matched
    to the oracle's recursive CTE.

    Scale: ONE shuffle of the filtered alert stream on user_id into
    applyInPandas; state per series is a single int64. Limit: each
    user's full alert history lands in ONE pandas group (the cooldown
    recurrence cannot be episode-split without first knowing where
    emissions fall), so a user must fit in a task — fine for alert
    streams (alerts are a filtered minority of events); a pathological
    single-user firehose would need an upstream per-user cap."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value") > DEBOUNCE_VALUE_MIN
    )
    al = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))

    def debounce(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
        cd = DEBOUNCE_COOLDOWN_S * 1_000_000
        last = None
        n_emitted = 0
        first_id = None
        for us, eid in zip(pdf["us"], pdf["event_id"]):
            if last is None or int(us) >= last + cd:
                last = int(us)
                n_emitted += 1
                # min over ALL emitted alerts (not the temporally first):
                # matches the oracle's min(CASE WHEN emitted THEN event_id
                # END) even when event_id is not monotone with ts.
                if first_id is None or int(eid) < first_id:
                    first_id = int(eid)
        n = len(pdf)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_alerts": [n],
                "n_emitted": [n_emitted],
                "n_suppressed": [n - n_emitted],
                "first_alert_id": [first_id],
                "last_emit_us": [last],
            }
        )

    return al.groupBy("user_id").applyInPandas(
        debounce,
        schema="user_id bigint, n_alerts bigint, n_emitted bigint,"
        " n_suppressed bigint, first_alert_id bigint, last_emit_us bigint",
    )


# ---------------------------------------------------------------------------
# orders_cohort_ltv
# ---------------------------------------------------------------------------


@register(
    "orders_cohort_ltv",
    oracle="""
        WITH o AS (
            SELECT o_custkey AS c, date_trunc('month', o_orderdate) AS m,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
        coh AS (SELECT c, min(m) AS cohort FROM o GROUP BY c),
        cell AS (
            SELECT coh.cohort,
                   CAST(datediff('month', coh.cohort, o.m) AS BIGINT)
                       AS months_since,
                   CAST(SUM(o.cents) AS BIGINT) AS rev_cents,
                   CAST(count(DISTINCT o.c) AS BIGINT) AS n_active
            FROM o JOIN coh ON o.c = coh.c
            GROUP BY 1, 2),
        sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
               FROM coh GROUP BY cohort)
        SELECT CAST(cell.cohort AS TIMESTAMP) AS cohort_month,
               cell.months_since, sz.cohort_size, cell.n_active,
               cell.rev_cents,
               CAST(SUM(cell.rev_cents) OVER (PARTITION BY cell.cohort
                    ORDER BY cell.months_since) AS BIGINT) AS cum_cents,
               CAST(CAST(SUM(cell.rev_cents) OVER (PARTITION BY cell.cohort
                    ORDER BY cell.months_since) AS BIGINT)
                    // sz.cohort_size AS BIGINT) AS ltv_cents_per_cust
        FROM cell JOIN sz ON sz.cohort = cell.cohort
    """,
    tags=("analytics", "bi", "window"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curves — the BI readout behind every
    payback-period decision: customers cohorted by first-order month,
    each cohort's revenue laid out by months-since-acquisition with the
    running cumulative and the per-customer LTV (cumulative cents
    integer-divided by cohort size — exact, no drifting averages).
    cohort_retention counts ACTIVITY; this accumulates VALUE.

    Scale: one custkey rollup for the cohort map (broadcast-sized only
    if customers are; it joins back on the same key so no broadcast is
    assumed), one (cohort, month) rollup, and a window over the
    <= |months| axis per cohort. The distinct-active count rides the
    same (cohort, months_since) shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    # |customers|-sized cohort map, pinned once: the cell join AND the
    # cohort-size rollup both consume it (3 orders scans otherwise,
    # r11 plan sweep; 2 is this algorithm's floor)
    coh = o.groupBy("c").agg(F.min("m").alias("cohort")).localCheckpoint(
        eager=True
    )
    cell = (
        o.join(coh, "c")
        .groupBy(
            "cohort",
            (
                (F.year("m") - F.year("cohort")) * 12
                + (F.month("m") - F.month("cohort"))
            )
            .cast("bigint")
            .alias("months_since"),
        )
        .agg(
            F.sum("cents").cast("bigint").alias("rev_cents"),
            F.countDistinct("c").cast("bigint").alias("n_active"),
        )
    )
    sz = coh.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    wc = W.partitionBy("cohort").orderBy("months_since")
    return (
        cell.join(sz, "cohort")
        .select(
            F.col("cohort").cast("timestamp").alias("cohort_month"),
            "months_since",
            "cohort_size",
            "n_active",
            "rev_cents",
            F.sum("rev_cents").over(wc).cast("bigint").alias("cum_cents"),
            F.expr(
                "CAST(CAST(sum(rev_cents) OVER (PARTITION BY cohort"
                " ORDER BY months_since) AS BIGINT) div cohort_size"
                " AS BIGINT)"
            ).alias("ltv_cents_per_cust"),
        )
    )


# ---------------------------------------------------------------------------
# event_burst_flags
# ---------------------------------------------------------------------------

BURST_WINDOW_S = 300  # trailing window for burst detection
BURST_MIN_COUNT = 3  # errors within the window to call it a burst


@register(
    "event_burst_flags",
    oracle=f"""
        WITH err AS (
            SELECT user_id, ts, event_id, epoch_us(ts) AS us
            FROM events WHERE event_type = 'error'),
        f AS (
            SELECT user_id, ts, event_id, us,
                   count(*) OVER (PARTITION BY user_id ORDER BY us
                                  RANGE BETWEEN {BURST_WINDOW_S} * 1000000
                                  PRECEDING AND CURRENT ROW) AS w_cnt
            FROM err),
        flagged AS (SELECT * FROM f WHERE w_cnt >= {BURST_MIN_COUNT}),
        isl AS (
            SELECT user_id, us, event_id,
                   CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id)
                             <= {BURST_WINDOW_S} * 1000000
                        THEN 0 ELSE 1 END AS new_ep
            FROM flagged),
        ep AS (
            SELECT user_id, us, event_id,
                   SUM(new_ep) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) AS episode
            FROM isl)
        SELECT user_id, CAST(episode AS BIGINT) AS episode,
               CAST(count(*) AS BIGINT) AS n_flagged,
               CAST(min(us) AS BIGINT) AS first_us,
               CAST(max(us) AS BIGINT) AS last_us
        FROM ep GROUP BY user_id, episode
    """,
    tags=("analytics", "events", "window", "anomaly"),
)
def event_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ERROR-BURST episodes — the rage-click/incident-burst
    detector: an error is flagged when >= BURST_MIN_COUNT errors land
    within the trailing BURST_WINDOW_S seconds (a RANGE window over
    event time, not rows — three slow errors spread over an hour never
    flag), and flagged errors within one window-length of each other
    merge into an episode (gaps-and-islands over the flagged stream).
    Complements anomaly_rate_spike (global type-day volume): this is
    the per-entity, fine-grained sibling an abuse/UX pipeline pages on.

    Scale: ONE user_id shuffle serves the range window, the island
    numbering, and the episode rollup (same key, Catalyst reuses the
    sort); everything is integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    wr = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-BURST_WINDOW_S * 1_000_000, 0)
    )
    flagged = err.withColumn("w_cnt", F.count(F.lit(1)).over(wr)).filter(
        F.col("w_cnt") >= BURST_MIN_COUNT
    )
    wo = W.partitionBy("user_id").orderBy("us", "event_id")
    isl = flagged.withColumn(
        "new_ep",
        F.when(
            F.col("us") - F.lag("us").over(wo) <= BURST_WINDOW_S * 1_000_000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    ep = isl.withColumn("episode", F.sum("new_ep").over(wo))
    return ep.groupBy("user_id", F.col("episode").cast("bigint").alias("episode")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_flagged"),
        F.min("us").cast("bigint").alias("first_us"),
        F.max("us").cast("bigint").alias("last_us"),
    )
