"""Driver-checkable CDC queries, phrased over the events stream table.

The true CDC engine (users/watermarks data model, CSV sink, watermark
state) lives in cdc.exports + cdc.jobs and is pinned by pytest scenario
tests mirroring the reference's E2E suite. The DuckDB oracle can only see
the pre-registered star-schema views, so for CORRECTNESS_r{N}.json the
same three export semantics are expressed over `events`, with `ts` playing
`updated_at` and `event_type = 'error'` playing the soft-delete flag:

* full snapshot  (reference: app/services/exports.py:70-95)
* incremental    (reference: app/services/exports.py:98-135, strict >)
* delta + operation classification (reference: app/services/exports.py:138-171)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

# Fixed "watermark" literal for the oracle-checked variants: the scenario
# tests exercise the stateful protocol; here the predicate shape is pinned.
WM = "2024-01-20 00:00:00"


@register(
    "cdc_full_snapshot",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE event_type <> 'error'
    """,
    headline=True,
    tags=("cdc",),
)
def cdc_full_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full export: every live row (exports.py:80-85: is_deleted = FALSE)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") != "error")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "cdc_incremental",
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts > TIMESTAMP '{WM}' AND event_type <> 'error'
    """,
    tags=("cdc",),
)
def cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental export: strictly-after-watermark live rows
    (exports.py:115-124; strict > is the late-data contract)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") > F.lit(WM).cast("timestamp")) & (F.col("event_type") != "error")
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "cdc_delta",
    oracle=f"""
        SELECT CASE WHEN event_type = 'error' THEN 'DELETE'
                    WHEN event_type = 'signup' THEN 'INSERT'
                    ELSE 'UPDATE' END AS operation,
               event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts > TIMESTAMP '{WM}'
    """,
    headline=True,
    tags=("cdc",),
)
def cdc_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta export: after-watermark rows *including* deletes, with the
    3-way operation classification (exports.py:39-45,156-160)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts") > F.lit(WM).cast("timestamp"))
    op = (
        F.when(F.col("event_type") == "error", "DELETE")
        .when(F.col("event_type") == "signup", "INSERT")
        .otherwise("UPDATE")
    )
    return ev.select(
        op.alias("operation"), "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "cdc_changelog_stats",
    oracle="""
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CASE WHEN event_type = 'error' THEN 'DELETE'
                        WHEN event_type = 'signup' THEN 'INSERT'
                        ELSE 'UPDATE' END AS operation,
                   user_id
            FROM events)
        SELECT day, operation, count(*) AS n_changes,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
        FROM d GROUP BY day, operation
    """,
    tags=("cdc", "agg"),
)
def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC observability: per-day change-volume profile of the logical
    changelog — row counts and distinct touched keys per operation class
    (the dashboard query behind 'did yesterday's delta look normal?').
    One map-side-combined aggregate over the classified scan; the
    shuffle carries |days x operations| groups plus the per-group
    distinct-key state, never the changelog itself."""
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "DELETE")
        .when(F.col("event_type") == "signup", "INSERT")
        .otherwise("UPDATE")
    )
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            op.alias("operation"),
            "user_id",
        )
        .groupBy("day", "operation")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.countDistinct("user_id").cast("bigint").alias("n_keys"),
        )
    )


AS_OF = "2024-01-25 00:00:00"


@register(
    "cdc_point_in_time",
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts <= TIMESTAMP '{AS_OF}')
        WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("cdc", "window"),
)
def cdc_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) snapshot reconstruction from the changelog —
    the time-travel query Delta Lake answers from its log, expressed over
    a raw soft-delete changelog: restrict to changes at-or-before T,
    collapse to the latest version per key, drop keys whose latest state
    is a delete. One ts-pruned scan (the AS OF predicate reaches parquet
    row-group stats) + one keyed window; the delete filter runs AFTER
    the collapse — a key deleted before T and never reborn must NOT
    resurrect an older live version, the classic PIT-reconstruction
    bug."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit(AS_OF).cast("timestamp")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


FORGET_PERMILLE = 15  # the deterministic "erasure request" slice


@register(
    "cdc_forget_users_audit",
    oracle=f"""
        WITH req AS (SELECT DISTINCT user_id FROM events
                     WHERE (user_id * 2654435761) % 1000 < {FORGET_PERMILLE}),
        hits AS (SELECT e.user_id, e.event_type FROM events e
                 JOIN req ON e.user_id = req.user_id)
        SELECT user_id, event_type, count(*) AS n_purged
        FROM hits GROUP BY user_id, event_type
    """,
    tags=("cdc", "compliance", "anti-join"),
)
def cdc_forget_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep, audit side: for a deterministic
    hash-selected erasure-request set, the per-(user, type) counts that
    a purge would remove — the tombstone ledger a compliance pipeline
    must persist BEFORE deleting (prove what was erased without keeping
    the data). The purge itself is the LEFT ANTI complement on the same
    request set (cdc/exports.py consumers replay from the purged table);
    at lake scale both run as one pass: request keys broadcast, the
    fact table never shuffles, and the rewrite lands via
    io.parquet_sink.overwrite_partitions_dynamic on just the partitions
    containing hits. reference app/services/exports.py:110-127 — the
    consumer contract the purged feed must keep honoring."""
    from cdc_export_system_spark.operators.sampling import KNUTH

    ev = load_table(spark, sf_dir, "events")
    req = (
        ev.filter((F.col("user_id") * F.lit(KNUTH)) % 1000 < FORGET_PERMILLE)
        .select("user_id")
        .distinct()
    )
    return (
        ev.join(F.broadcast(req), "user_id")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_purged"))
    )


def purge_users(events: DataFrame, requests: DataFrame) -> DataFrame:
    """The purge itself: everything EXCEPT the requested users' rows —
    a broadcast LEFT ANTI join, so the fact side never shuffles."""
    return events.join(
        F.broadcast(requests.select("user_id").distinct()), "user_id", "left_anti"
    )
