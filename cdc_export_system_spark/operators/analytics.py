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


@register(
    "cohort_retention",
    oracle="""
        WITH um AS (SELECT DISTINCT user_id, date_trunc('month', ts) AS m
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
