"""Structured Streaming surface, driver-checkable entries.

The streaming CDC pipeline itself (readStream + availableNow micro-batch
incremental/delta exports, watermark checkpointing, query listener) lives
in streaming.cdc_stream and is pinned by pytest. The entries here run a
real streaming query synchronously (availableNow trigger + memory sink)
and return its result; the oracle is the equivalent batch SQL — windowed
aggregation over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register, sql_dsum


@register(
    "stream_tumbling_window",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n,
               {sql_dsum("value", "sum_value")}
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("streaming", "window", "agg"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate. Batch semantics equal
    streaming append-mode output once the watermark passes window end, so
    the batch plan is the oracle-checkable form; test_streaming pins the
    readStream variant producing identical rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "stream_sliding_window",
    oracle="""
        -- Spark's window(60m, 30m) assigns each event to the two
        -- epoch-aligned 30-minute slide starts covering it.
        SELECT TIMESTAMP '1970-01-01'
                   + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 * m.i AS BIGINT))
                   AS window_start,
               count(*) AS n
        FROM events, (SELECT unnest([0, 1]) AS i) m
        GROUP BY 1
    """,
    tags=("streaming", "window", "agg"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 60min/30min window counts (each event lands in 2 windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
