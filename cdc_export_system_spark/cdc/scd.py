"""Changelog consumption patterns: SCD type-2 history and MERGE-apply.

The reference emits a changelog (delta export with operation column,
reference ``app/services/exports.py:138-171``) but never consumes one.
These two operators are the canonical downstream consumers every CDC
pipeline needs:

* ``cdc_scd2_history`` — turn the change stream into a slowly-changing-
  dimension type-2 table: one validity interval per change, closed by the
  next change of the same key, open (``is_current``) for the latest.
* ``cdc_merge_apply`` — MERGE a changelog into a prior snapshot (the
  batch equivalent of ``MERGE INTO`` / Delta upsert): latest state wins,
  deletes drop the key. This is exactly what a consumer of the
  reference's delta CSVs must do to reconstruct the table.

Scale notes: both are a single hash-partition on the key. SCD2 is one
window (shuffle on user_id, in-partition sort). MERGE-apply collapses
each side to latest-per-key first (partial row_number after the same
shuffle), then a full outer sort-merge join on user_id — the collapsed
sides are |keys|-sized, not |changes|-sized, so the join input is the
minimum possible; AQE handles key skew. The ``ts > WM`` side prunes to
the recent row groups via parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.cdc.event_queries import WM
from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


# Shared by cdc_scd2_history and the streaming maintainer
# (streaming/scd_stream.py), whose contract is bit-for-bit convergence to
# this batch recomputation — one definition, one oracle, no drift.
SCD2_ORACLE = """
    SELECT user_id, event_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM events
"""


def scd2_intervals(changes: DataFrame) -> DataFrame:
    """SCD2 interval derivation: each change opens a validity interval
    that the next change of the same key closes (event_id breaks ts ties
    so intervals are deterministic)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "cdc_scd2_history",
    oracle=SCD2_ORACLE,
    tags=("cdc", "window"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 over the full change history (see scd2_intervals)."""
    return scd2_intervals(load_table(spark, sf_dir, "events"))


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@register(
    "cdc_merge_apply",
    oracle=f"""
        WITH base AS (
            SELECT * FROM (
                SELECT user_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts <= TIMESTAMP '{WM}') WHERE rn = 1),
        chg AS (
            SELECT * FROM (
                SELECT user_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts > TIMESTAMP '{WM}') WHERE rn = 1)
        SELECT COALESCE(c.user_id, b.user_id) AS user_id,
               CASE WHEN c.user_id IS NOT NULL THEN c.ts ELSE b.ts END AS ts,
               CASE WHEN c.user_id IS NOT NULL THEN c.event_type
                    ELSE b.event_type END AS event_type,
               CASE WHEN c.user_id IS NOT NULL THEN c.value ELSE b.value END AS value
        FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
        WHERE CASE WHEN c.user_id IS NOT NULL THEN c.event_type
                   ELSE b.event_type END <> 'error'
    """,
    headline=True,
    tags=("cdc", "join"),
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a changelog (ts > WM) into the prior snapshot (ts <= WM):
    whole-row last-writer-wins per key, keys whose final state is a
    delete ('error') are dropped. Reconstructs exactly the table a
    consumer of the reference's delta exports would hold."""
    ev = load_table(spark, sf_dir, "events")
    base = _latest_per_key(ev.filter(F.col("ts") <= F.lit(WM).cast("timestamp"))).alias("b")
    chg = _latest_per_key(ev.filter(F.col("ts") > F.lit(WM).cast("timestamp"))).alias("c")
    has_chg = F.col("c.user_id").isNotNull()
    pick = lambda name: F.when(has_chg, F.col(f"c.{name}")).otherwise(F.col(f"b.{name}"))
    merged = base.join(chg, F.col("b.user_id") == F.col("c.user_id"), "full_outer").select(
        F.coalesce(F.col("c.user_id"), F.col("b.user_id")).alias("user_id"),
        pick("ts").alias("ts"),
        pick("event_type").alias("event_type"),
        pick("value").alias("value"),
    )
    return merged.filter(F.col("event_type") != "error")


@register(
    "join_scd2_pointintime",
    oracle="""
        WITH dim AS (
            SELECT user_id, event_id AS dim_event_id, value AS dim_value,
                   ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to
            FROM events WHERE event_type = 'purchase'),
        f AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click')
        SELECT f.event_id, f.user_id, f.ts, d.dim_event_id, d.dim_value
        FROM f LEFT JOIN dim d
          ON d.user_id = f.user_id
         AND f.ts >= d.valid_from
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
    tags=("cdc", "join", "window"),
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join against an SCD2 history — the
    consumption side of cdc_scd2_history: every click event is enriched
    with the purchase-state version VALID AT ITS TIMESTAMP ([valid_from,
    valid_to) containment; facts before the key's first version join
    NULL). This is the textbook type-2 lookup a warehouse runs on every
    fact load, and the interval-containment dual of join_asof (same
    answer, but driven by the maintained history table instead of a
    sort-merge backward search). Zero-width intervals (two same-ts
    versions, event_id-tiebroken) are skipped by the half-open
    containment, so each fact matches at most one version
    deterministically.

    Scale: the join is equi-keyed on user_id — one co-partitioned
    shuffle of facts and the (much smaller) version table; the interval
    predicate evaluates inside the join, and versions-per-key is
    bounded by change frequency, so no fact ever fans out."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("dim_event_id"),
            F.col("value").alias("dim_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    f = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    cond = (
        (f["user_id"] == dim["user_id"])
        & (f["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (f["ts"] < dim["valid_to"]))
    )
    return f.join(dim, cond, "left").select(
        f["event_id"], f["user_id"], f["ts"], "dim_event_id", "dim_value"
    )
