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
                     WHERE ((user_id % 2147483648) * 2654435761) % 1000
                           < {FORGET_PERMILLE}),
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
    from cdc_export_system_spark.operators.sampling import knuth_col

    ev = load_table(spark, sf_dir, "events")
    req = (
        ev.filter(knuth_col(F.col("user_id")) % 1000 < FORGET_PERMILLE)
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


# ---------------------------------------------------------------------------
# cdc_sequence_gap_audit
# ---------------------------------------------------------------------------

GAP_BUCKET = 1000  # ids per audit bucket
GAP_DROP_MOD = 97  # simulated loss: every 97th changelog record is missing


@register(
    "cdc_sequence_gap_audit",
    oracle=f"""
        WITH feed AS (
            SELECT event_id FROM events WHERE event_id % {GAP_DROP_MOD} <> 0),
        b AS (
            SELECT event_id // {GAP_BUCKET} AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id
            FROM feed GROUP BY 1),
        w AS (
            SELECT CAST(bucket AS BIGINT) AS bucket, n, min_id, max_id,
                   max_id - min_id + 1 - n AS internal_missing,
                   COALESCE(min_id - lag(max_id) OVER (ORDER BY bucket) - 1, 0)
                       AS boundary_missing
            FROM b)
        SELECT bucket, n AS n_present, internal_missing, boundary_missing
        FROM w WHERE internal_missing > 0 OR boundary_missing > 0
    """,
    tags=("cdc", "dq"),
)
def cdc_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGELOG COMPLETENESS audit: a CDC consumer's first integrity
    question is 'did I lose records?', answered here from the dense
    event_id sequence WITHOUT sorting it globally — ids bucket by
    id div 1000, each bucket's missing count is (max - min + 1 - n)
    from plain aggregates, and cross-bucket holes surface as a lag
    comparison over the tiny BUCKET axis. The registered query audits
    a deliberately holey feed (every 97th id dropped — simulated loss)
    so the audit's positive path is exercised and hash-checked, not
    just its all-clear.

    Scale: one map-combined aggregate to |ids|/1000 bucket rows; the
    only window runs over that metadata axis (allowlisted). This is
    the two-level trick that makes exact gap detection feasible on a
    100 TB changelog where `lag(id) OVER (ORDER BY id)` would
    serialize the world onto one task."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    feed = ev.filter(F.col("event_id") % GAP_DROP_MOD != 0).select("event_id")
    b = feed.groupBy(
        F.expr(f"event_id div {GAP_BUCKET}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )
    w = b.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n",
        (F.col("max_id") - F.col("min_id") + 1 - F.col("n")).alias(
            "internal_missing"
        ),
        F.coalesce(
            F.col("min_id")
            - F.lag("max_id").over(W.orderBy("bucket"))
            - F.lit(1),
            F.lit(0),
        ).alias("boundary_missing"),
    )
    return w.filter(
        (F.col("internal_missing") > 0) | (F.col("boundary_missing") > 0)
    ).select(
        "bucket",
        F.col("n").alias("n_present"),
        "internal_missing",
        "boundary_missing",
    )
