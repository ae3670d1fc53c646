"""Time-series gap filling: the hypertable-style `time_bucket_gapfill` /
`locf` / `interpolate` surface (TimescaleDB's names), Spark-first.

Shape: one shuffle on the series key; the spine is generated per key
with `sequence()` (no calendar-dim join, no cross join), and both fills
are plain window functions over the spine — everything stays in
whole-stage codegen. At 100 TB the spine explode factor is bounded by
each key's own date range, so the operator scales with the data it
describes; a global calendar spine (reshape_date_spine) is the
alternative when all keys must share one axis.

Float discipline: daily totals are exact integer cents; interpolation
is the one genuinely-float step, and both engines compute it with the
identical expression tree (prev + (next - prev) * frac) so the doubles
agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

GAPFILL_USERS = 40  # keep the registered demo's output reviewable


@register(
    "ts_gapfill_interpolate",
    oracle=f"""
        WITH daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events WHERE user_id < {GAPFILL_USERS}
            GROUP BY user_id, date_trunc('day', ts)),
        spine AS (
            SELECT user_id, unnest(generate_series(min(day), max(day),
                                                   INTERVAL 1 DAY)) AS day
            FROM daily GROUP BY user_id),
        j AS (
            SELECT s.user_id, s.day, d.cents,
                   CAST(d.cents AS DOUBLE) / 100 AS v
            FROM spine s LEFT JOIN daily d
              ON s.user_id = d.user_id AND s.day = d.day),
        w AS (
            SELECT user_id, day, v,
                   last_value(v IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
                   first_value(v IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
                   last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
                   first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
            FROM j)
        SELECT user_id, day,
               (v IS NOT NULL) AS observed,
               prev_v AS value_locf,
               CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NULL THEN next_v
                   WHEN next_v IS NULL THEN prev_v
                   ELSE prev_v + (next_v - prev_v)
                        * (CAST(date_diff('day', prev_d, day) AS DOUBLE)
                           / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
               END AS value_interp
        FROM w
    """,
    tags=("timeseries", "window", "analytics"),
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill each user's daily spend series over its own [min, max]
    day range: emit every day, flag observed ones, and fill gaps two
    ways — last-observation-carried-forward and linear interpolation
    between the surrounding observations (edges fall back to the
    nearest observed value). One shuffle on user_id; the spine, both
    fills, and the interpolation are window/sequence expressions over
    the per-user partition."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < GAPFILL_USERS)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("cents")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", (F.col("cents").cast("double") / 100).alias("v")
    )
    back = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("user_id").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.last(obs_day, ignorenulls=True).over(back).alias("prev_d"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("next_d"),
    )
    frac = F.datediff(F.col("day"), F.col("prev_d")).cast("double") / F.datediff(
        F.col("next_d"), F.col("prev_d")
    ).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return w.select(
        "user_id",
        "day",
        F.col("v").isNotNull().alias("observed"),
        F.col("prev_v").alias("value_locf"),
        interp.alias("value_interp"),
    )


@register(
    "ts_time_weighted_avg",
    oracle="""
        WITH s AS (
            SELECT user_id, ts,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            ) - epoch_us(ts) AS dur_us
            FROM events),
        g AS (
            SELECT user_id,
                   SUM(CAST(cents AS HUGEINT) * dur_us) AS wsum,
                   CAST(SUM(dur_us) AS BIGINT) AS total_us,
                   count(*) AS n_obs
            FROM s WHERE dur_us IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_obs + 1 AS n_events, total_us,
               CAST(CAST(wsum AS VARCHAR) AS DOUBLE)
                   / CAST(total_us AS DOUBLE) / 100 AS twa_value
        FROM g
    """,
    tags=("timeseries", "window", "agg"),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value signal under
    last-observation-carried-forward semantics (TimescaleDB
    `time_weight('LOCF', ...)`): each observation holds until the next
    one, so the average is sum(value_i * hold_us_i) / total_us — robust
    to irregular sampling where a plain AVG overweights bursts. The
    weighted sum accumulates as exact integers (cents x microseconds in
    a 38-digit decimal); the only float math is the final divide. One
    shuffle on user_id for the lead() window, then a map-side-combined
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias(
            "dur_us"
        ),
    ).filter(F.col("dur_us").isNotNull())
    g = s.groupBy("user_id").agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us")).alias("wsum"),
        F.sum("dur_us").cast("bigint").alias("total_us"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return g.select(
        "user_id",
        (F.col("n_obs") + 1).alias("n_events"),
        "total_us",
        (
            F.col("wsum").cast("double") / F.col("total_us").cast("double") / 100
        ).alias("twa_value"),
    )


MA_HALF = 12  # centered moving-average half-width (hours): 24h detrend


@register(
    "ts_seasonal_decompose",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n
            FROM events GROUP BY date_trunc('hour', ts)),
        tr AS (
            SELECT hour_ts, n,
                   CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend
            FROM hourly
            WINDOW w AS (ORDER BY hour_ts
                         ROWS BETWEEN {MA_HALF - 1} PRECEDING
                                  AND {MA_HALF} FOLLOWING)),
        se AS (
            SELECT *,
                   CAST(CAST(SUM(CAST(n - trend AS DECIMAL(18,6))) OVER
                             (PARTITION BY extract(hour FROM hour_ts))
                        AS VARCHAR) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY extract(hour FROM hour_ts))
                       AS seasonal
            FROM tr)
        SELECT hour_ts, n,
               floor(trend * 1000000 + 0.5) / 1000000 AS trend,
               floor(seasonal * 1000000 + 0.5) / 1000000 AS seasonal,
               floor((n - trend - seasonal) * 1000000 + 0.5) / 1000000
                   AS residual
        FROM se
    """,
    tags=("timeseries", "window", "analytics"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the hourly event-count series:
    trend = 24h centered moving average, seasonal = hour-of-day mean of
    the detrended series, residual = the rest — the anomaly-detection
    baseline every ops dashboard runs.

    Scale: events collapse to ONE row per hour in the first aggregate
    (map-side combined), so every window below operates on the
    |hours| axis — a REDUCED domain (8.8k rows/year), which is why the
    partition-less trend window is acceptable (same 'tiny' contract as
    metric_open_orders_sweep; at a multi-decade horizon the series
    would range-partition by year with the ranks.py construction).
    Float discipline: trend is an exact int sum / frame count; the
    seasonal mean folds exact DECIMAL(18,6) residuals so accumulation
    order cannot matter; outputs round at 1e-6."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("hour_ts").rowsBetween(-(MA_HALF - 1), MA_HALF)
    tr = hourly.withColumn(
        "trend", F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w)
    )
    w_h = W.partitionBy(F.hour("hour_ts"))
    se = tr.withColumn(
        "seasonal",
        F.sum((F.col("n") - F.col("trend")).cast("decimal(18,6)"))
        .over(w_h)
        .cast("double")
        / F.count(F.lit(1)).over(w_h),
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return se.select(
        "hour_ts",
        "n",
        r6(F.col("trend")).alias("trend"),
        r6(F.col("seasonal")).alias("seasonal"),
        r6(F.col("n") - F.col("trend") - F.col("seasonal")).alias("residual"),
    )
