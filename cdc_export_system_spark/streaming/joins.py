"""Stream-stream joins: event-time attribution.

The reference's watermark protocol correlates one stream against static
state (reference ``app/services/exports.py:109-119``); the next step any
event pipeline takes is correlating two live streams — here the classic
attribution join: a purchase credits the click by the same user in the
preceding hour.

``click_purchase_attribution`` is the Structured Streaming form: both
sides carry event-time watermarks and the join condition bounds
``p.ts - c.ts`` to (0, 1h], which is what lets Spark expire join state —
without the time bound the state store grows forever. The watermark
delays (1h click retention beyond the purchase watermark) follow the
stream-stream join state-cleanup rule from the Structured Streaming
paper (SIGMOD 2018).

``stream_join_attribution`` is the batch dual over the events table —
same predicate, oracle-checked. At scale it is one shuffle on user_id
(equi-key) with the time bound evaluated as a post-join filter; AQE
handles user skew. A true interval join (no equi-key) would need the
range-join bucketing of operators/asof.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

ATTRIBUTION_WINDOW = "INTERVAL 1 HOUR"


def _attribution_condition():
    return (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") > F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr(ATTRIBUTION_WINDOW))
    )


def _attribution_select(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )


def click_purchase_attribution(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Streaming inner join: purchases credit same-user clicks <=1h old.

    Watermark math: a click must stay in state until the purchase
    watermark passes click.ts + 1h, so the click side's delay is the
    purchase delay + the attribution window.
    """
    c = clicks.withWatermark("ts", "2 hours").alias("c")
    p = purchases.withWatermark("ts", "1 hour").alias("p")
    return _attribution_select(c.join(p, _attribution_condition(), "inner"))


@register(
    "stream_join_attribution",
    oracle=f"""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.user_id AS user_id,
               c.ts AS click_ts, p.ts AS purchase_ts
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts > c.ts AND p.ts <= c.ts + {ATTRIBUTION_WINDOW}
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "join"),
)
def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dual of the attribution stream-stream join (same predicate,
    same output schema) — the oracle-checked face of
    ``click_purchase_attribution``."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").alias("c")
    purchases = ev.filter(F.col("event_type") == "purchase").alias("p")
    return _attribution_select(clicks.join(purchases, _attribution_condition(), "inner"))


@register(
    "stream_static_enrich",
    oracle="""
        WITH e AS (
            SELECT user_id % 1500 AS custkey, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events)
        SELECT c.c_nationkey AS nationkey, e.event_type,
               count(*) AS n_events,
               CAST(SUM(e.cents) AS BIGINT) AS cents
        FROM e JOIN customer c ON e.custkey = c.c_custkey
        GROUP BY c.c_nationkey, e.event_type
    """,
    tags=("streaming", "join", "broadcast"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a static
    dimension (customer), the join every streaming fact pipeline runs
    per micro-batch. The static side re-resolves each batch (picking up
    dim updates) and broadcasts, so the stream side never shuffles for
    the join — state-free, unlike a stream-stream join. Executed here
    through a real availableNow streaming query into a memory sink,
    then rolled up; the rollup equals the batch join exactly because
    enrichment is row-local. The synthetic custkey bridge (user_id mod
    |customers at sf0.01|) stands in for the natural key the star
    schema lacks."""
    import uuid

    from cdc_export_system_spark.io.sources import load_table as _lt

    name = f"enrich_{uuid.uuid4().hex[:12]}"
    cust = F.broadcast(_lt(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            (F.col("user_id") % 1500).alias("custkey"),
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
    )
    enriched = stream.join(cust, stream.custkey == F.col("c_custkey")).select(
        F.col("c_nationkey").alias("nationkey"), "event_type", "cents"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("nationkey", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
