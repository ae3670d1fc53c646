"""As-of join — an operator Spark lacks natively (SURVEY.md §2.3 range
join family; the reference's watermark lookup is the 1-row special case).

Semantics: for each left row, the single right row with the greatest
right.ts <= left.ts within the same key (ties on ts broken by greatest
event_id — made explicit so the result is deterministic).

Implementation is the union + running-max window, NOT a range join:
union both sides tagged, sort once per key by (ts, side, id), and carry
the latest right row forward with a running max over an encoded
(ts, id) key. One shuffle + one sort per key — O(n log n) per key and
skew-safe, where an inequality join would degenerate to a per-key cross
product. (pd.merge_asof per group via applyInPandas is the alternative;
the window form keeps everything JVM-side.)

The (ts, id) encoding packs both into one BIGINT so a plain max() works:
offset-microseconds * 2^20 + id. Valid while offset-us < 2^43 (~278 years
from the epoch base) and id < 2^20 per key — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

EPOCH_BASE = "2024-01-01 00:00:00"
ID_BITS = 20


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    epoch_base: str = EPOCH_BASE,
) -> DataFrame:
    """left columns + matched_ts/matched_id of the as-of right row."""
    enc = (
        (F.unix_micros(F.col("__ts")) - F.unix_micros(F.lit(epoch_base).cast("timestamp")))
        * (1 << ID_BITS)
        + F.col("__rid")
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.col(right_id).alias("__rid"),
        F.lit(1).alias("__is_right"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__enc", F.when(F.col("__is_right") == 1, enc)
    )
    # right rows sort before left rows at equal ts (as-of is inclusive <=)
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", F.col("__is_right").desc(), F.col("__rid"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__match", F.max("__enc").over(w))
    out_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("__is_right") == 0)
        .withColumn(
            "matched_ts",
            # integer div: the encoded value exceeds double's exact range
            F.timestamp_micros(
                F.expr(f"__match div {1 << ID_BITS}")
                + F.unix_micros(F.lit(epoch_base).cast("timestamp"))
            ),
        )
        .withColumn("matched_id", (F.col("__match") % (1 << ID_BITS)).cast("long"))
        .select(*out_cols, "matched_ts", "matched_id")
    )


@register(
    "join_asof",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id AS k, ts, event_id,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_right,
                   event_type,
                   CASE WHEN event_type = 'view'
                        THEN (epoch_us(ts) - epoch_us(TIMESTAMP '{EPOCH_BASE}'))
                             * {1 << ID_BITS} + event_id END AS enc
            FROM events WHERE event_type IN ('purchase', 'view')),
        carried AS (
            SELECT *, max(enc) OVER (PARTITION BY k ORDER BY ts, is_right DESC, event_id
                                     ROWS UNBOUNDED PRECEDING) AS match
            FROM tagged)
        SELECT event_id, k AS user_id, ts,
               TIMESTAMP '{EPOCH_BASE}' + to_microseconds(match // {1 << ID_BITS})
                   AS matched_ts,
               CAST(match % {1 << ID_BITS} AS BIGINT) AS matched_id
        FROM carried WHERE is_right = 0
    """,
    tags=("join", "asof", "window"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's most recent view at-or-before
    it (NULL match when the user never viewed)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join(purchases, views, "user_id", "ts", "ts", "event_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    epoch_base: str = EPOCH_BASE,
) -> DataFrame:
    """Forward as-of: the EARLIEST right row with right.ts >= left.ts
    (ties on ts broken by least event_id). Mirror of asof_join: same
    union + one window, but a running MIN over the FOLLOWING frame, with
    right rows ordered after left at equal ts so 'at-or-after' is
    inclusive. Same single shuffle/sort; same skew-safety argument."""
    enc = (
        (F.unix_micros(F.col("__ts")) - F.unix_micros(F.lit(epoch_base).cast("timestamp")))
        * (1 << ID_BITS)
        + F.col("__rid")
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.col(right_id).alias("__rid"),
        F.lit(1).alias("__is_right"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__enc", F.when(F.col("__is_right") == 1, enc)
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", F.col("__is_right").asc(), F.col("__rid"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.withColumn("__match", F.min("__enc").over(w))
    out_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("__is_right") == 0)
        .withColumn(
            "matched_ts",
            F.timestamp_micros(
                F.expr(f"__match div {1 << ID_BITS}")
                + F.unix_micros(F.lit(epoch_base).cast("timestamp"))
            ),
        )
        .withColumn("matched_id", (F.col("__match") % (1 << ID_BITS)).cast("long"))
        .select(*out_cols, "matched_ts", "matched_id")
    )


@register(
    "join_asof_forward",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id AS k, ts, event_id,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_right,
                   CASE WHEN event_type = 'view'
                        THEN (epoch_us(ts) - epoch_us(TIMESTAMP '{EPOCH_BASE}'))
                             * {1 << ID_BITS} + event_id END AS enc
            FROM events WHERE event_type IN ('purchase', 'view')),
        carried AS (
            SELECT *, min(enc) OVER (PARTITION BY k ORDER BY ts, is_right, event_id
                                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                          AS match
            FROM tagged)
        SELECT event_id, k AS user_id, ts,
               TIMESTAMP '{EPOCH_BASE}' + to_microseconds(match // {1 << ID_BITS})
                   AS matched_ts,
               CAST(match % {1 << ID_BITS} AS BIGINT) AS matched_id
        FROM carried WHERE is_right = 0
    """,
    tags=("join", "asof", "window"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's next view at-or-after it
    (NULL when none follows) — the 'what did they do next' direction,
    e.g. post-purchase engagement windows."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join_forward(purchases, views, "user_id", "ts", "ts", "event_id")
