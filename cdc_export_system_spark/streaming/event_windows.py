"""Event-time windowing over the events stream (engine surface; the
reference has no native streams — SURVEY.md §2.9 maps its batch protocol
onto these built-ins).

``stream_session_window`` is oracle-checked: session windows are
deterministic in batch mode, and DuckDB expresses the same sessionization
with the classic lag/gap-cumsum idiom, so both engines must agree on
every session boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

SESSION_GAP = "15 minutes"


@register(
    "stream_session_window",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 15 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered)
        SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 15 MINUTE AS session_end,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (15-minute inactivity gap) per user. Spark's
    session_window end = last event + gap; the oracle reproduces that
    with lag/cumsum sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_counts_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "30 minutes"
) -> DataFrame:
    """The streaming form of stream_tumbling_window: readStream over the
    events parquet with a real event-time watermark. Late rows beyond the
    watermark are dropped — the principled version of the reference's
    'strict >' data-loss contract (exports.py:119, README:335), with the
    lateness bound explicit instead of implicit."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),  # timestamp[us] in the testdata
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    ev = (
        spark.readStream.schema(schema)
        # the file source wants a directory: stream the sf dir, glob one table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
