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


# ---------------------------------------------------------------------------
# ts_resample_ohlc
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               ts, event_id, value
        FROM events),
    w AS (
        SELECT event_type, hour_ts, value,
               first_value(value) OVER (
                   PARTITION BY event_type, hour_ts ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS open_v,
               last_value(value) OVER (
                   PARTITION BY event_type, hour_ts ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS close_v
        FROM b)
    SELECT event_type, CAST(hour_ts AS TIMESTAMP) AS hour_ts,
           max(open_v) AS open_value, max(value) AS high_value,
           min(value) AS low_value, max(close_v) AS close_value,
           count(*) AS n_obs,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               AS volume
    FROM w GROUP BY event_type, hour_ts
"""


@register(
    "ts_resample_ohlc",
    oracle=_OHLC_ORACLE,
    tags=("timeseries", "agg", "analytics"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each event type's value stream into hourly OHLC bars
    (open/high/low/close + observation count + exact volume) — the
    market-data/candlestick rollup shape. Open and close are selected by
    min_by/max_by over the total (ts, event_id) ordering, so they are
    deterministic raw column values (no float arithmetic to drift); the
    oracle's window first/last_value form picks identical rows.

    One map-side-combined aggregate keyed on (event_type, hour): at
    100 TB the shuffle carries |types|x|hours| candle rows, never
    observations — min_by/max_by partials are a single (value, key)
    pair per group, so this scales exactly like a count."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_ts"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            F.min_by("value", key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", key).alias("close_value"),
            F.count(F.lit(1)).alias("n_obs"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("decimal(38,6)")
             / F.lit(100)).cast("double").alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# ts_autocorrelation
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 24

_ACF_ORACLE = f"""
    WITH hourly AS (
        SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS t,
               count(*) AS x
        FROM events GROUP BY date_trunc('hour', ts)),
    stats AS (
        SELECT count(*) AS n, SUM(CAST(x AS HUGEINT)) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS q
        FROM hourly),
    lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
        SELECT l.lag, count(*) AS m,
               SUM(CAST(a.x AS HUGEINT) * b.x) AS p,
               SUM(CAST(a.x AS HUGEINT)) AS sa,
               SUM(CAST(b.x AS HUGEINT)) AS sb
        FROM lags l
        JOIN hourly a ON true
        JOIN hourly b ON b.t = a.t + l.lag
        GROUP BY l.lag),
    f AS (
        SELECT p.lag, p.m,
               s.n * s.n * p.p - s.n * s.s * (p.sa + p.sb) + p.m * s.s * s.s
                   AS num,
               s.n * s.n * s.q - s.n * s.s * s.s AS den
        FROM pairs p CROSS JOIN stats s)
    SELECT lag, m AS n_pairs,
           floor(CAST(CAST(num AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(den AS VARCHAR) AS DOUBLE) * 1000000 + 0.5)
               / 1000000 AS acf
    FROM f
"""


@register(
    "ts_autocorrelation",
    oracle=_ACF_ORACLE,
    tags=("timeseries", "stats", "join"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1..ACF_MAX_LAG — the classic seasonality probe (a daily cycle shows
    as a peak at lag 24). Uses the standard ACF estimator with the
    global mean/variance; the algebra is expanded so numerator and
    denominator are EXACT integers (n²·P − n·S·(A+B) + m·S² over
    DECIMAL(38)), with one final double divide rounded at 1e-6 — the
    same order-independence discipline as ml_linear_regression.

    Scale: events collapse to one row per hour first, so the lag
    self-join runs on the REDUCED |hours| axis (8.8k rows/year) times
    |lags| — metadata-sized regardless of event volume. The 1-row
    global-stats broadcast is the allowlisted scalar pattern."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    ).select(
        (F.unix_timestamp("h") / 3600).cast("bigint").alias("t"), "x"
    )
    # materialize the reduced |hours| axis once: the stats scalar and both
    # join sides would otherwise each re-scan events (pruning-divergent
    # subtrees defeat exchange reuse — same fix as ml_kfold_cv)
    hourly = hourly.localCheckpoint(eager=True)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = hourly.agg(
        F.count(F.lit(1)).alias("n"),
        # operand-first casts keep the accumulator in DECIMAL(38,0); a
        # bigint Σx² wraps silently long before the documented headroom
        F.sum(d38(F.col("x"))).alias("s"),
        F.sum(d38(F.col("x")) * F.col("x")).alias("q"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = hourly.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = hourly.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(d38(F.col("xa")) * F.col("xb")).alias("p"),
            F.sum(d38(F.col("xa"))).alias("sa"),
            F.sum(d38(F.col("xb"))).alias("sb"),
        )
    )
    f = pairs.crossJoin(F.broadcast(stats)).select(
        "lag",
        F.col("m").alias("n_pairs"),
        (
            d38(F.col("n")) * d38(F.col("n")) * F.col("p")
            - d38(F.col("n")) * F.col("s") * (F.col("sa") + F.col("sb"))
            + d38(F.col("m")) * F.col("s") * F.col("s")
        ).alias("num"),
        (
            d38(F.col("n")) * d38(F.col("n")) * F.col("q")
            - d38(F.col("n")) * F.col("s") * F.col("s")
        ).alias("den"),
    )
    return f.select(
        "lag",
        "n_pairs",
        (
            F.floor(
                F.col("num").cast("double") / F.col("den").cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# ts_changepoint_cusum
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS x
        FROM events GROUP BY date_trunc('day', ts)),
    tot AS (SELECT count(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM daily),
    pre AS (
        SELECT day, x,
               row_number() OVER (ORDER BY day) AS i,
               SUM(CAST(x AS HUGEINT)) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS px
        FROM daily),
    c AS (
        SELECT p.day, p.x, t.n * p.px - p.i * t.s AS num, t.n AS n
        FROM pre p CROSS JOIN tot t),
    r AS (
        SELECT day, x, num, n,
               row_number() OVER (ORDER BY abs(num) DESC, day) AS rk
        FROM c)
    SELECT day, x,
           floor(CAST(CAST(num AS VARCHAR) AS DOUBLE) / n * 1000000 + 0.5)
               / 1000000 AS cusum,
           (rk = 1) AS is_peak
    FROM r
"""


@register(
    "ts_changepoint_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "window", "stats"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistic over the daily event-count series:
    S_t = Σ_{i<=t}(x_i − μ); the |S_t| peak marks the most likely mean
    shift (flagged is_peak, earliest-day tie-break). The statistic is
    kept exact — numerator n·prefix(x) − t·Σx as HUGEINT/DECIMAL ints,
    one final divide, 1e-6 round — so partitioning cannot move the peak.

    Scale: events reduce to one row per DAY before any window runs, so
    the prefix sum and the peak rank operate on the |days| axis (365
    rows/year) — the allowlisted reduced-domain window pattern shared
    with ts_seasonal_decompose; a multi-decade horizon would ride the
    ranks.py two-level prefix construction instead."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    ).localCheckpoint(eager=True)  # one events scan for tot + prefix branches
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    wo = W.orderBy("day")
    pre = daily.select(
        "day",
        "x",
        F.row_number().over(wo).alias("i"),
        F.sum("x").over(wo.rowsBetween(W.unboundedPreceding, 0))
        .cast("decimal(38,0)")
        .alias("px"),
    )
    c = pre.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        (F.col("n").cast("decimal(38,0)") * F.col("px")
         - F.col("i").cast("decimal(38,0)") * F.col("s")).alias("num"),
        "n",
    )
    rk = W.orderBy(F.abs(F.col("num")).desc(), "day")
    return c.withColumn("rk", F.row_number().over(rk)).select(
        "day",
        "x",
        (
            F.floor(F.col("num").cast("double") / F.col("n") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("cusum"),
        (F.col("rk") == 1).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# ts_forecast_linear
# ---------------------------------------------------------------------------

FORECAST_DAYS = 7
Z95 = 1.959963984540054  # two-sided 95% normal quantile


_FORECAST_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS t,
               CAST(count(*) AS HUGEINT) AS y
        FROM events GROUP BY date_trunc('day', ts)),
    s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, SUM(t) AS sx, SUM(y) AS sy,
               SUM(CAST(t AS HUGEINT) * t) AS sxx,
               SUM(CAST(t AS HUGEINT) * y) AS sxy,
               SUM(y * y) AS syy, MAX(t) AS tmax
        FROM daily),
    co AS (
        SELECT n, sx, sxx, tmax,
               CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS b,
               (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
               / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS a,
               (CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
               / CAST(CAST(n AS VARCHAR) AS DOUBLE)
               / (CAST(CAST(n AS VARCHAR) AS DOUBLE) - 2) AS s2
        FROM s),
    h AS (SELECT unnest(range(1, {FORECAST_DAYS} + 1)) AS h),
    f AS (
        SELECT h.h, co.tmax + h.h AS t,
               co.a + co.b * (co.tmax + h.h) AS yhat,
               sqrt(co.s2 * (1 + 1 / CAST(CAST(co.n AS VARCHAR) AS DOUBLE)
                    + (CAST(co.tmax + h.h AS DOUBLE)
                       - CAST(CAST(co.sx AS VARCHAR) AS DOUBLE)
                         / CAST(CAST(co.n AS VARCHAR) AS DOUBLE))
                      * (CAST(co.tmax + h.h AS DOUBLE)
                         - CAST(CAST(co.sx AS VARCHAR) AS DOUBLE)
                           / CAST(CAST(co.n AS VARCHAR) AS DOUBLE))
                      / (CAST(CAST(co.sxx AS VARCHAR) AS DOUBLE)
                         - CAST(CAST(co.sx AS VARCHAR) AS DOUBLE)
                           * CAST(CAST(co.sx AS VARCHAR) AS DOUBLE)
                           / CAST(CAST(co.n AS VARCHAR) AS DOUBLE))))
                   AS se
        FROM h CROSS JOIN co)
    SELECT CAST(h AS BIGINT) AS horizon,
           -- naive epoch arithmetic: to_timestamp() returns TIMESTAMPTZ and
           -- its cast to naive renders in the PROCESS time zone
           TIMESTAMP '1970-01-01'
               + to_microseconds(CAST(t AS BIGINT) * 86400000000) AS day,
           floor(yhat * 1000000 + 0.5) / 1000000 AS yhat,
           floor((yhat - {Z95!r} * se) * 1000000 + 0.5) / 1000000 AS lo95,
           floor((yhat + {Z95!r} * se) * 1000000 + 0.5) / 1000000 AS hi95
    FROM f
"""


@register(
    "ts_forecast_linear",
    oracle=_FORECAST_ORACLE,
    tags=("timeseries", "ml", "stats"),
)
def ts_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST_DAYS-ahead linear-trend forecast of the daily event
    count with 95% prediction intervals: OLS on (epoch-day, count) from
    exact integer sufficient statistics, ŷ = a + b·t, and the standard
    out-of-sample interval se² = s²(1 + 1/n + (t−x̄)²/Sxx) with
    s² = SSE/(n−2). Every input to the float expressions is an exact
    integer; both engines evaluate the identical tree, rounded at 1e-6
    (z-multiplier constant, so no distribution functions needed).

    Scale: the corpus collapses to one row per day, the 1-row suffstat
    scalar broadcasts onto the FORECAST_DAYS-row horizon spine — the
    whole forecast is O(horizon) algebra after one map-side-combined
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    ).select((F.unix_timestamp("d") / 86400).cast("bigint").alias("t"), "y")
    daily = daily.localCheckpoint(eager=True)  # one events scan
    d38 = "decimal(38,0)"
    s = daily.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        # operand-first casts: DECIMAL(38,0) accumulators (the oracle
        # sums over HUGEINT; a bigint Σy² would wrap silently first)
        F.sum(F.col("t").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("t").cast(d38) * F.col("t")).alias("sxx"),
        F.sum(F.col("t").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.max("t").alias("tmax"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    nc = F.col("n")
    s_num = (nc * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    s_den = (nc * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    b = s_num / s_den
    a = (dd("sy") - b * dd("sx")) / dd("n")
    s2 = (
        ((nc * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
         - s_num * s_num / s_den)
        / dd("n")
        / (dd("n") - 2)
    )
    co = s.select(
        "n", "sx", "sxx", "tmax", b.alias("b"), a.alias("a"), s2.alias("s2")
    )
    h = spark.range(1, FORECAST_DAYS + 1).select(F.col("id").alias("h"))
    f = h.crossJoin(F.broadcast(co))
    t = F.col("tmax") + F.col("h")
    xbar = dd("sx") / dd("n")
    sxx_c = dd("sxx") - dd("sx") * dd("sx") / dd("n")
    yhat = F.col("a") + F.col("b") * t
    se = F.sqrt(
        F.col("s2")
        * (1 + 1 / dd("n") + (t.cast("double") - xbar) * (t.cast("double") - xbar) / sxx_c)
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return f.select(
        F.col("h").cast("bigint").alias("horizon"),
        F.timestamp_seconds(t * 86400).alias("day"),
        r6(yhat).alias("yhat"),
        r6(yhat - F.lit(Z95) * se).alias("lo95"),
        r6(yhat + F.lit(Z95) * se).alias("hi95"),
    )


# ---------------------------------------------------------------------------
# ts_dow_hour_profile
# ---------------------------------------------------------------------------


@register(
    "ts_dow_hour_profile",
    oracle="""
        WITH cell AS (
            -- +1: DuckDB dayofweek is 0-based (Sunday=0); Spark's is
            -- 1-based (Sunday=1) and the dow value SURFACES here
            -- (stats_chi2_independence only aggregates over it)
            SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hr,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR)
                        AS DOUBLE) AS total_value
            FROM events GROUP BY dayofweek(ts), hour(ts)),
        tot AS (SELECT SUM(n_events) AS n FROM cell)
        SELECT c.dow, c.hr, c.n_events, c.total_value,
               floor(CAST(c.n_events AS DOUBLE) / CAST(t.n AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS share
        FROM cell c CROSS JOIN tot t
    """,
    tags=("timeseries", "analytics", "agg"),
)
def ts_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity grid: event count, exact value total,
    and each cell's share of all traffic — the seasonality fingerprint
    behind load forecasting and anomaly baselines (a cell's share is the
    expected rate its live counterpart is compared against). Counts and
    value totals are exact (cents-summed); share is one divide of exact
    ints, 1e-6-rounded identically in both engines.

    Scale: ONE map-side-combined aggregate to the ≤168-row grid; the
    1-row total broadcasts back. Nothing data-sized shuffles."""
    from cdc_export_system_spark.registry import dsum

    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        dsum(F.col("value"), "total_value"),
    )
    cell = cell.localCheckpoint(eager=True)  # <=168 rows; total derives from it
    tot = cell.agg(F.sum("n_events").alias("n"))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hr",
        "n_events",
        "total_value",
        r6(F.col("n_events").cast("double") / F.col("n").cast("double")).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# ts_downsample_lttb
# ---------------------------------------------------------------------------

LTTB_THRESHOLD = 8  # points kept per series (first + last + 6 buckets)


@register(
    "ts_downsample_lttb",
    oracle=None,  # sequential per-bucket selection — pinned against a
    # pure-Python LTTB reference in tests/test_round6_semantics.py
    tags=("ts", "pandas_udf", "downsample"),
)
def ts_downsample_lttb(
    spark: SparkSession, sf_dir: str, threshold: int = LTTB_THRESHOLD
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    every user's value series to ``threshold`` visually-representative
    points — the standard dashboard/monitoring downsampler: first and
    last points always survive; the interior splits into threshold-2
    equal-count buckets and each bucket keeps the point forming the
    largest triangle with the PREVIOUSLY KEPT point and the next
    bucket's centroid. Series at or under the threshold pass through
    whole. Deterministic: ties on area keep the earliest point, so the
    output is a pure function of the series.

    Why not SQL: the kept point feeds the next bucket's area term — a
    sequential dependency no window spec expresses. The distributed
    shape is the honest one for per-key sequential algorithms: ONE
    shuffle on user_id into Arrow-batched applyInPandas, NumPy inside,
    each series processed where it lands (the same contract as
    udaf_grouped_pandas). Per-task memory is bounded by the longest
    single series — at 100 TB a series outgrowing one task is
    pre-thinned by a coarse keyed rollup (e.g. ts_resample_ohlc's
    buckets) before LTTB runs; the group key never concentrates more
    than one user on an executor."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts"], kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= threshold:
            return pdf
        x = pdf["ts"].astype("int64").to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        keep = [0]
        n_buckets = threshold - 2
        # interior indices 1..n-2 split into equal-count buckets
        edges = [1 + (n - 2) * b // n_buckets for b in range(n_buckets + 1)]
        for b in range(n_buckets):
            lo, hi = edges[b], edges[b + 1]
            if lo >= hi:
                continue
            nlo, nhi = edges[b + 1], edges[b + 2] if b + 2 <= n_buckets else None
            if b == n_buckets - 1:
                cx, cy = x[n - 1], y[n - 1]
            else:
                cx = x[nlo:nhi].mean()
                cy = y[nlo:nhi].mean()
            ax, ay = x[keep[-1]], y[keep[-1]]
            area = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            keep.append(lo + int(np.argmax(area)))  # argmax ties -> earliest
        keep.append(n - 1)
        return pdf.iloc[keep]

    return ev.groupBy("user_id").applyInPandas(lttb, schema=ev.schema)


# ---------------------------------------------------------------------------
# ts_downsample_lttb_exact
# ---------------------------------------------------------------------------

LTTB_NB = LTTB_THRESHOLD - 2  # interior buckets


def _lttb_exact_oracle(nb: int = LTTB_NB) -> str:
    """Unrolled-CTE DuckDB mirror of the exact-integer LTTB: the nb
    sequential picks become nb chained argmax CTEs; the triangle-area
    comparison is cross-multiplied by the centroid bucket size so no
    division (and no float) ever happens."""
    # HUGEINT-promoted triangle score: ax is epoch seconds and kc a
    # volume-scaled per-user bucket count, so the cross-multiplied terms
    # (k·span(x) × span(y_cents)) leave int64 for hot users (~1e5 events
    # with wide time/value spans); one HUGEINT operand per product keeps
    # every intermediate exact at any scale (r9 int-product lint).
    score = (
        "abs((CAST(kp.ax AS HUGEINT) * ct.kc - ct.sx) * (c.y - kp.ay)"
        " - (kp.ax - c.x) * (ct.sy - CAST(kp.ay AS HUGEINT) * ct.kc))"
    )
    picks = []
    prev = "k0"
    for b in range(nb):
        picks.append(f"""
        s{b} AS (
            SELECT c.user_id, c.rn, c.x, c.y, {score} AS sc
            FROM cand c
            JOIN {prev} kp USING (user_id)
            JOIN cent ct ON ct.user_id = c.user_id AND ct.b = {b}
            WHERE c.b = {b}),
        k{b + 1} AS MATERIALIZED (
            SELECT user_id, rn, x AS ax, y AS ay FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id
                              ORDER BY sc DESC, rn) AS pr FROM s{b})
            WHERE pr = 1)""")
        prev = f"k{b + 1}"
    kept_union = " UNION ALL ".join(
        f"SELECT user_id, rn FROM k{b + 1}" for b in range(nb)
    )
    return f"""
        WITH base AS MATERIALIZED (
            SELECT user_id, ts, value,
                   CAST(floor(date_part('epoch', ts)) AS BIGINT) AS x,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events),
        big AS (SELECT * FROM base WHERE n > {LTTB_THRESHOLD}),
        cand AS MATERIALIZED (
            SELECT user_id, rn, x, y,
                   (rn - 2) * {nb} // (n - 2) AS b
            FROM big WHERE rn >= 2 AND rn <= n - 1),
        lastp AS (SELECT user_id, rn, x, y FROM big WHERE rn = n),
        cent AS MATERIALIZED (
            SELECT user_id, b - 1 AS b, CAST(count(*) AS BIGINT) AS kc,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
            FROM cand WHERE b >= 1 GROUP BY user_id, b
            UNION ALL
            SELECT user_id, {nb - 1} AS b, 1 AS kc, x AS sx, y AS sy
            FROM lastp),
        k0 AS (SELECT user_id, rn, x AS ax, y AS ay FROM big WHERE rn = 1),
        {", ".join(picks)},
        kept AS (
            SELECT user_id, rn FROM k0
            UNION ALL {kept_union}
            UNION ALL SELECT user_id, rn FROM lastp)
        SELECT b.user_id, b.ts, b.value
        FROM base b JOIN kept USING (user_id, rn)
        UNION ALL
        SELECT user_id, ts, value FROM base WHERE n <= {LTTB_THRESHOLD}
    """


@register(
    "ts_downsample_lttb_exact",
    oracle=_lttb_exact_oracle(),
    tags=("ts", "window", "downsample", "iterative"),
)
def ts_downsample_lttb_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling as EXACT integer arithmetic, in pure DataFrame
    ops — the oracle-checkable sibling of ts_downsample_lttb: x is
    epoch seconds, y is cents, the series order is totalized by
    (ts, event_id), interior points bucket by the integer map
    (rn−2)·NB div (n−2), and the triangle-area argmax compares the
    CROSS-MULTIPLIED integer score |(ax·k − Σx)(y − ay) − (ax − x)
    (Σy − ay·k)| — the centroid division is eliminated by scaling
    through the bucket size k, so every comparison is exact and the
    pick sequence is bit-identical across engines (ties to the
    earliest point). The fixed bucket count unrolls the sequential
    dependency into NB chained pick stages, each one join + one
    per-user window argmax — no Python, no applyInPandas, fully
    whole-stage-codegen.

    Scale: one shuffle on user_id establishes rn/n; each pick stage
    joins the bucket-b candidates (|data|/NB rows) against two
    model-thin per-user tables (previous pick, centroid) — AQE
    broadcasts them once users ≪ data. The score itself is computed in
    DECIMAL(38,0) (oracle: HUGEINT): its cross-multiplied terms grow as
    k·span(x)·span(y_cents) with k the per-user bucket volume, which
    leaves int64 for hot users (~1e5 events × wide spans) — caught and
    promoted by the r9 int-product lint.

    Reference: Steinarsson 2013 ("Downsampling Time Series for Visual
    Representation"), §4.2."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    wu = W.partitionBy("user_id")
    base = ev.select(
        "user_id",
        "ts",
        "value",
        F.col("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("n"),
    ).localCheckpoint(eager=True)
    big = base.filter(F.col("n") > LTTB_THRESHOLD)
    small = base.filter(F.col("n") <= LTTB_THRESHOLD)
    cand = (
        big.filter((F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 1))
        .select(
            "user_id",
            "rn",
            "x",
            "y",
            F.expr(f"(rn - 2) * {LTTB_NB} div (n - 2)").alias("b"),
        )
        .localCheckpoint(eager=True)
    )
    lastp = big.filter(F.col("rn") == F.col("n")).select(
        "user_id", "rn", "x", "y"
    )
    cent = (
        cand.filter(F.col("b") >= 1)
        .groupBy("user_id", (F.col("b") - 1).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("kc"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
        )
        .unionByName(
            lastp.select(
                "user_id",
                F.lit(LTTB_NB - 1).alias("b"),
                F.lit(1).cast("bigint").alias("kc"),
                F.col("x").alias("sx"),
                F.col("y").alias("sy"),
            )
        )
        .localCheckpoint(eager=True)
    )
    kept_prev = big.filter(F.col("rn") == 1).select(
        "user_id", "rn", F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    keeps = [kept_prev.select("user_id", "rn"), lastp.select("user_id", "rn")]
    d38 = "decimal(38,0)"
    for b in range(LTTB_NB):
        # DECIMAL(38,0)-promoted score, mirroring the oracle's HUGEINT:
        # exact integer compare at any per-user volume (see oracle note)
        sc = F.abs(
            (F.col("ax").cast(d38) * F.col("kc") - F.col("sx"))
            * (F.col("y") - F.col("ay"))
            - (F.col("ax") - F.col("x"))
            * (F.col("sy") - F.col("ay").cast(d38) * F.col("kc"))
        )
        scored = (
            cand.filter(F.col("b") == b)
            .join(kept_prev.select("user_id", "ax", "ay"), "user_id")
            .join(
                cent.filter(F.col("b") == b).select(
                    "user_id", "kc", "sx", "sy"
                ),
                "user_id",
            )
            .select("user_id", "rn", "x", "y", sc.alias("sc"))
        )
        pick = (
            scored.withColumn(
                "pr",
                F.row_number().over(
                    wu.orderBy(F.col("sc").desc(), "rn")
                ),
            )
            .filter(F.col("pr") == 1)
            .select(
                "user_id", "rn", F.col("x").alias("ax"), F.col("y").alias("ay")
            )
            .localCheckpoint(eager=True)
        )
        keeps.append(pick.select("user_id", "rn"))
        kept_prev = pick
    kept = keeps[0]
    for k in keeps[1:]:
        kept = kept.unionByName(k)
    out = base.join(kept, ["user_id", "rn"]).select("user_id", "ts", "value")
    return out.unionByName(small.select("user_id", "ts", "value"))


# ---------------------------------------------------------------------------
# ts_holt_exact
# ---------------------------------------------------------------------------

# Holt's linear smoothing with α = β = 1/4 as exact rationals:
#   l_t = (y_t + 3(l_{t-1} + b_{t-1})) div 4
#   b_t = ((l_t - l_{t-1}) + 3 b_{t-1}) div 4
# in cents, truncating division (identical in Spark-side Python ints via
# _tdiv and DuckDB //).

_HOLT_ORACLE = """
    WITH RECURSIVE s AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events),
    r AS (
        SELECT user_id, rn, n, y AS l, CAST(0 AS BIGINT) AS b
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.rn, s.n,
               (s.y + 3 * (r.l + r.b)) // 4 AS l,
               (((s.y + 3 * (r.l + r.b)) // 4) - r.l + 3 * r.b) // 4 AS b
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
    SELECT user_id, CAST(n AS BIGINT) AS n_points,
           CAST(l AS DOUBLE) / 100 AS level,
           CAST(b AS DOUBLE) / 100 AS trend,
           CAST(l + b AS DOUBLE) / 100 AS forecast1
    FROM r WHERE rn = n
"""


@register(
    "ts_holt_exact",
    oracle=_HOLT_ORACLE,
    tags=("ts", "timeseries", "window", "stateful"),
)
def ts_holt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level + trend) exponential smoothing per user
    series, in EXACT integer arithmetic: α = β = 1/4 as exact
    rationals, values in cents, every update a truncating integer
    division — so the per-series recurrence is a pure function of the
    data, bit-identical between the Arrow-batched Python loop here and
    the DuckDB RECURSIVE CTE oracle (the recursion technique covers
    arbitrary series lengths where the unrolled-CTE family needs a
    fixed depth). Series order is totalized by (ts, event_id); output
    is the final level/trend state and the one-step-ahead forecast
    l + b — the standard streaming-forecast readout.

    Why applyInPandas: the recurrence consumes its own previous output,
    which no window spec expresses; the distributed shape is ONE
    shuffle on user_id into grouped Arrow batches, integer state per
    series, nothing driver-side (the ts_downsample_lttb contract). At
    100 TB a series outgrowing one task is pre-thinned by a keyed
    rollup first (ts_resample_ohlc), exactly like LTTB."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ys = [
            int(v)
            for v in (pdf["value"] * 100 + 0.5).map(lambda x: int(x // 1))
        ]
        lvl, tr = ys[0], 0
        for y in ys[1:]:
            nl = tdiv(y + 3 * (lvl + tr), 4)
            tr = tdiv((nl - lvl) + 3 * tr, 4)
            lvl = nl
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_points": [len(ys)],
                "level": [float(lvl) / 100],
                "trend": [float(tr) / 100],
                "forecast1": [float(lvl + tr) / 100],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        holt,
        schema="user_id bigint, n_points bigint, level double,"
        " trend double, forecast1 double",
    )


# ---------------------------------------------------------------------------
# ts_acf_multi_lag
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 24  # hourly series: scan one diurnal cycle


@register(
    "ts_acf_multi_lag",
    oracle=f"""
        WITH h AS (
            SELECT epoch_us(ts) // 3600000000 AS eh,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS nn,
                   CAST(SUM(n) AS HUGEINT) AS s
            FROM h),
        den AS (
            SELECT SUM((tot.nn * CAST(h.n AS HUGEINT) - tot.s)
                       * (tot.nn * CAST(h.n AS HUGEINT) - tot.s)) AS d
            FROM h CROSS JOIN tot),
        lags AS (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS k),
        num AS (
            SELECT l.k, CAST(count(*) AS BIGINT) AS n_pairs,
                   SUM((tot.nn * CAST(a.n AS HUGEINT) - tot.s)
                       * (tot.nn * CAST(b.n AS HUGEINT) - tot.s)) AS num
            FROM lags l
            JOIN h a ON true
            JOIN h b ON b.eh = a.eh + l.k
            CROSS JOIN tot
            GROUP BY l.k)
        SELECT num.k AS lag_hours, num.n_pairs,
               floor(CAST(CAST(num.num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(den.d AS VARCHAR) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS acf
        FROM num CROSS JOIN den
    """,
    tags=("timeseries", "stats"),
)
def ts_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUTOCORRELATION FUNCTION of the hourly event-count series at
    lags 1..24 — the seasonality fingerprint (a diurnal cycle shows as
    the r_24 peak) behind every 'does this metric have a daily rhythm'
    decision; ts_autocorrelation is the single-lag scalar, this is the
    full first-cycle correlogram. Exactness: with N = series length and
    S = series sum, each centered product is multiplied through by N^2
    — (N*s_t - S)(N*s_{{t+k}} - S) is an exact HUGEINT/DECIMAL(38)
    integer — so numerators and the shared denominator are exact sums
    in any partitioning; only the final 24 ratios are doubles.

    Scale: the corpus collapses to the |hours| axis in one shuffle; the
    lag pairing is an EQUI-JOIN on the integer epoch-hour (eh = eh + k)
    after a 24-way explode of the axis — keyed, never windowed over a
    single partition, and ~24x the axis size, not the corpus. Totals
    and denominator are 1-row broadcasts (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("eh"))
        .groupBy("eh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = h.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("n").cast("decimal(38,0)").alias("s"),
    )
    dev = lambda col: (  # noqa: E731
        F.col("nn").cast("decimal(38,0)") * F.col(col).cast("decimal(38,0)")
        - F.col("s")
    )
    den = (
        h.crossJoin(F.broadcast(tot))
        .agg(F.sum(dev("n") * dev("n")).alias("d"))
    )
    a = h.select(
        "eh",
        "n",
        F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("k"),
    ).select((F.col("eh") + F.col("k")).alias("eh"), "k", F.col("n").alias("na"))
    pairs = a.join(h.withColumnRenamed("n", "nb"), "eh")
    num = (
        pairs.crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(dev("na") * dev("nb")).alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").cast("bigint").alias("lag_hours"),
        "n_pairs",
        (
            F.floor(
                F.col("num").cast("double") / F.col("d").cast("double")
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# ts_burstiness
# ---------------------------------------------------------------------------


@register(
    "ts_burstiness",
    oracle="""
        WITH d AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dt
            FROM events),
        s AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   SUM(CAST(dt AS HUGEINT)) AS s1,
                   SUM(CAST(dt AS HUGEINT) * dt) AS s2
            FROM d WHERE dt IS NOT NULL GROUP BY user_id)
        SELECT user_id, n AS n_intervals,
               CAST(floor(CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n + 0.5)
                    AS BIGINT) AS mean_gap_us,
               floor((sqrt((n * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                            - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                              * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (n - 1)))
                      - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                     / (sqrt((n * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                              - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                                * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                             / (CAST(n AS DOUBLE) * (n - 1)))
                        + CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                     * 1000000 + 0.5) / 1000000 AS burstiness
        FROM s WHERE n >= 2
    """,
    tags=("timeseries", "stats"),
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS of each user's event arrivals (Goh & Barabási 2008):
    B = (sigma - mu)/(sigma + mu) over inter-arrival gaps — B ~ -1 for
    a metronome, 0 for a Poisson process, toward +1 for bursty
    human-like trains. The behavioral-timing feature next to
    event_dwell_time's durations. Gaps are exact integer microseconds
    from one lag window; mean/variance come from (n, sum, sum-of-
    squares) HUGEINT/DECIMAL(38) suffstats; the B ratio is one
    identical double tree, 1e-6-rounded.

    Scale: ONE user_id exchange serves the lag window and the per-user
    suffstat rollup (same key); payload is a single 8-byte gap."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    d = ev.select(
        "user_id",
        (
            us - F.lag(us).over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    dt38 = F.col("dt").cast("decimal(38,0)")
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dt38).alias("s1"),
        F.sum(dt38 * F.col("dt")).alias("s2"),
    ).filter(F.col("n") >= 2)
    n = F.col("n")
    nd = n.cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mu = s1 / n
    sig = F.sqrt((n * s2 - s1 * s1) / (nd * (n - F.lit(1))))
    return s.select(
        "user_id",
        n.alias("n_intervals"),
        F.floor(mu + F.lit(0.5)).alias("mean_gap_us"),
        (
            F.floor((sig - mu) / (sig + mu) * 1_000_000 + F.lit(0.5)) / 1_000_000
        ).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# ts_peaks
# ---------------------------------------------------------------------------

PEAK_MIN_N = 5  # ignore noise-floor maxima


@register(
    "ts_peaks",
    oracle=f"""
        WITH h AS (
            SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, date_trunc('hour', ts)),
        w AS (
            SELECT event_type, hr, n,
                   lag(n) OVER (PARTITION BY event_type ORDER BY hr) AS prev_n,
                   lead(n) OVER (PARTITION BY event_type ORDER BY hr) AS next_n
            FROM h)
        SELECT event_type, hr, n, prev_n, next_n
        FROM w
        WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
          AND n > prev_n AND n > next_n AND n >= {PEAK_MIN_N}
    """,
    tags=("timeseries", "window", "anomaly"),
)
def ts_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL MAXIMA of each event type's hourly volume series — the
    'when did traffic peak' readout feeding alert review and capacity
    planning (anomaly_seasonal_residual asks 'is this hour weird for
    its weekday slot'; this asks 'is this hour a crest of its own
    neighborhood'). Strictly-greater-than-both-neighbors with a noise
    floor; series edges (no neighbor on one side) are excluded rather
    than assumed. Exact integers end to end.

    Scale: the corpus collapses to the (type, hour) axis in one
    shuffle; lag/lead ride one event_type-keyed window over that
    already-reduced series."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = W.partitionBy("event_type").orderBy("hr")
    d = h.select(
        "event_type",
        "hr",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return d.filter(
        F.col("prev_n").isNotNull()
        & F.col("next_n").isNotNull()
        & (F.col("n") > F.col("prev_n"))
        & (F.col("n") > F.col("next_n"))
        & (F.col("n") >= PEAK_MIN_N)
    )


# ---------------------------------------------------------------------------
# ts_percentile_bands
# ---------------------------------------------------------------------------


@register(
    "ts_percentile_bands",
    oracle="""
        WITH c AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events)
        SELECT hr, CAST(count(*) AS BIGINT) AS n,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS DOUBLE)
                   / 100 AS p50,
               CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY c) AS DOUBLE)
                   / 100 AS p95,
               CAST(max(c) AS DOUBLE) / 100 AS p_max
        FROM c GROUP BY hr
    """,
    tags=("timeseries", "percentile", "agg"),
)
def ts_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The p50/p95/max BAND CHART over time — the standard latency/value
    monitoring readout (median for the trend, p95 for the promise, max
    for the incident): event values banded per hour with
    percentile_disc over exact cents, so every band value is an actual
    data element and the series is partition-invariant.

    Scale: ONE hour-keyed aggregate; the per-group percentile buffer
    holds one hour's values (bounded by hourly traffic — for
    heavy-hitter hours the agg_quantiles_distributed rank construction
    per hour is the spill-proof alternative, same output contract)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.date_trunc("hour", "ts").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    return c.groupBy("hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)").cast("double")
            / 100
        ).alias("p50"),
        (
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY c)").cast("double")
            / 100
        ).alias("p95"),
        (F.max("c").cast("double") / 100).alias("p_max"),
    )


# ---------------------------------------------------------------------------
# ts_control_chart_xmr
# ---------------------------------------------------------------------------


@register(
    "ts_control_chart_xmr",
    oracle="""
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY 1),
        mr AS (
            SELECT day, x,
                   abs(x - lag(x) OVER (ORDER BY day)) AS r
            FROM d),
        t AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS s,
                   CAST(SUM(r) AS HUGEINT) AS m
            FROM mr)
        SELECT mr.day, CAST(mr.x AS DOUBLE) / 100 AS daily_total,
               CAST(CAST(t.s AS VARCHAR) AS DOUBLE) / t.n / 100 AS center,
               (abs(t.n * CAST(mr.x AS HUGEINT) - t.s) * (t.n - 1) * 100
                    > 266 * t.m * t.n) AS out_of_control,
               CASE WHEN t.n * CAST(mr.x AS HUGEINT) > t.s THEN 'above'
                    ELSE 'below' END AS side
        FROM mr CROSS JOIN t
    """,
    tags=("timeseries", "anomaly", "stats"),
)
def ts_control_chart_xmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC INDIVIDUALS (XmR) control chart over the daily revenue
    series: the center line is the mean, the control limits are
    mean +/- 2.66 * average-moving-range (Shewhart's constant for
    n=2 subgroups), and a day is out of control when it breaches them
    — the process-stability discipline behind 'is this dashboard move
    signal or noise'. The EXACTNESS move: the breach test never forms
    the limits as floats — |x - S/n| > 2.66*M/(n-1) is multiplied
    through to |n*x - S|*(n-1)*100 > 266*M*n, pure HUGEINT/DECIMAL(38)
    integer comparison, so control membership is partition-invariant;
    only the display columns are doubles.

    Scale: one day-keyed aggregate, a lag over the |days| axis
    (allowlisted metadata-axis window), a 1-row (n, S, M) broadcast."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    mr = d.select(
        "day",
        "x",
        F.abs(F.col("x") - F.lag("x").over(W.orderBy("day"))).alias("r"),
    ).localCheckpoint(eager=True)
    t = mr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum("r").cast("decimal(38,0)").alias("m"),
    )
    j = mr.crossJoin(F.broadcast(t))
    xd = F.col("x").cast("decimal(38,0)")
    breach = (
        F.abs(F.col("n") * xd - F.col("s")) * (F.col("n") - 1) * F.lit(100)
        > F.lit(266) * F.col("m") * F.col("n")
    )
    return j.select(
        "day",
        (F.col("x").cast("double") / 100).alias("daily_total"),
        (F.col("s").cast("double") / F.col("n") / 100).alias("center"),
        breach.alias("out_of_control"),
        F.when(F.col("n") * xd > F.col("s"), "above")
        .otherwise("below")
        .alias("side"),
    )


# ---------------------------------------------------------------------------
# ts_theil_sen
# ---------------------------------------------------------------------------


@register(
    "ts_theil_sen",
    oracle="""
        WITH d AS (
            SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                        AS BIGINT) AS di,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY 1),
        p AS (
            SELECT CAST((CAST(b.x - a.x AS HUGEINT) * 1000000)
                        // (b.di - a.di) AS BIGINT) AS slope_micro
            FROM d a JOIN d b ON b.di > a.di)
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_micro)
                    AS BIGINT) AS slope_micro_cents_per_day
        FROM p
    """,
    tags=("timeseries", "stats"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend of daily revenue: the median of all
    pairwise slopes — 29% breakdown (up to a third of the days can be
    corrupted before the trend lies), where ts_forecast_linear's OLS
    slope follows a single outlier day. Slopes quantize to exact
    integer micro-cents/day by multiply-before-divide; the median is
    percentile_disc over those integers, so the estimate is an actual
    pairwise slope and partition-invariant.

    Scale: the corpus collapses to the |days| axis first, so the
    'quadratic' pair join is |days|^2 — a metadata-axis cost (365^2/2
    per year), not a data cost; this is exactly why Theil-Sen is
    feasible distributed despite its O(n^2) reputation."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("unix_micros(date_trunc('day', ts)) div 86400000000").alias("di")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("x")
    ).localCheckpoint(eager=True)
    a = d.select(F.col("di").alias("di_a"), F.col("x").alias("x_a"))
    b = d.select(F.col("di").alias("di_b"), F.col("x").alias("x_b"))
    p = a.join(b, F.col("di_b") > F.col("di_a")).select(
        # DECIMAL product (oracle: HUGEINT): x is DAILY-AGGREGATED cents,
        # so (x_b - x_a) * 1e6 is volume-scaled — the ewma/theil class
        F.expr(
            "cast((cast(x_b - x_a as decimal(38,0)) * 1000000)"
            " div (di_b - di_a) as bigint)"
        ).alias("slope_micro")
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_micro)")
        .cast("bigint")
        .alias("slope_micro_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# ts_mann_kendall
# ---------------------------------------------------------------------------


@register(
    "ts_mann_kendall",
    oracle="""
        WITH d AS (
            SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                        AS BIGINT) AS di,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY 1),
        s AS (
            SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                                 WHEN b.x < a.x THEN -1 ELSE 0 END)
                        AS BIGINT) AS s
            FROM d a JOIN d b ON b.di > a.di),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        ties AS (
            SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                       AS tt
            FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY x)
            WHERE t > 1)
        SELECT n.n AS n_days, s.s AS s_stat,
               floor((CASE WHEN s.s > 0 THEN s.s - 1
                           WHEN s.s < 0 THEN s.s + 1 ELSE 0 END)
                     * sqrt(18.0)
                     / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt
                                 AS DOUBLE))
                     * 1000000 + 0.5) / 1000000 AS z
        FROM s CROSS JOIN n CROSS JOIN ties
    """,
    tags=("timeseries", "stats"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL trend test on daily revenue — the significance
    companion to ts_theil_sen's slope: S counts concordant-minus-
    discordant day pairs (pure integers, no distributional assumption),
    and the tie-corrected normal z applies the standard continuity
    correction. S, n, and the tie term are exact integer sums; the z is
    one identical double tree via multiply-through (var*18 stays
    integer, the sqrt(18) factors out).

    Scale: same posture as ts_theil_sen — the pair 'quadratic' is over
    the |days| METADATA axis, not the data; the tie scan is one
    grouped count over that axis; finals are 1-row (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("unix_micros(date_trunc('day', ts)) div 86400000000").alias("di")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("x")
    ).localCheckpoint(eager=True)
    a = d.select(F.col("di").alias("di_a"), F.col("x").alias("x_a"))
    b = d.select(F.col("di").alias("di_b"), F.col("x").alias("x_b"))
    s = a.join(b, F.col("di_b") > F.col("di_a")).agg(
        F.sum(
            F.when(F.col("x_b") > F.col("x_a"), F.lit(1))
            .when(F.col("x_b") < F.col("x_a"), F.lit(-1))
            .otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("s")
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("tt")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    sc = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(F.lit(0))
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tt")
    ).cast("double")
    z = sc * F.sqrt(F.lit(18.0)) / F.sqrt(var18)
    return j.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        (F.floor(z * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("z"),
    )


# ---------------------------------------------------------------------------
# ts_best_window
# ---------------------------------------------------------------------------

_KADANE_POS_PAD = 1_048_576  # 2^20 index pad for the (prefix, index) argmin


@register(
    "ts_best_window",
    oracle=f"""
        WITH d AS (
            SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                        AS BIGINT) AS di,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY 1),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS HUGEINT) AS s FROM d),
        r AS (
            SELECT di, x,
                   CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS idx
            FROM d),
        p AS (
            SELECT r.idx, r.di,
                   SUM(t.n * CAST(r.x AS HUGEINT) - t.s)
                       OVER (ORDER BY r.idx) AS pre
            FROM r CROSS JOIN t),
        pb AS (
            SELECT idx, di, pre,
                   least(COALESCE(min(pre * {_KADANE_POS_PAD} + idx)
                       OVER (ORDER BY idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0), 0) AS mkey
            FROM p),
        best AS (
            SELECT idx AS end_idx, di AS end_di, pre,
                   COALESCE(mkey, 0) AS mkey,
                   pre - (COALESCE(mkey, 0) - ((COALESCE(mkey, 0)
                         % {_KADANE_POS_PAD} + {_KADANE_POS_PAD})
                         % {_KADANE_POS_PAD})) / {_KADANE_POS_PAD} AS gain,
                   ((COALESCE(mkey, 0) % {_KADANE_POS_PAD}
                     + {_KADANE_POS_PAD}) % {_KADANE_POS_PAD}) + 1
                       AS start_idx
            FROM pb)
        SELECT CAST(start_idx AS BIGINT) AS start_idx,
               CAST(end_idx AS BIGINT) AS end_idx,
               CAST(gain AS BIGINT) AS centered_gain
        FROM best
        ORDER BY gain DESC, end_idx, start_idx LIMIT 1
    """,
    tags=("timeseries", "window", "analytics"),
)
def ts_best_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KADANE'S maximum-subarray as pure window algebra: the contiguous
    run of days most ABOVE the series average (values centered by the
    multiply-through n*x - S, so 'best window' is non-trivial even on
    an all-positive revenue series) — best run ending at t is
    prefix(t) - min prefix before t, with the argmin realized as an
    integer MIN over the encoded key pre*2^20 + idx (min prefix, tie
    -> earliest index; the winnowing pad trick on a signed value via
    floor-mod decode). Every quantity is an exact HUGEINT/DECIMAL(38)
    integer; the final pick is an ordered LIMIT 1 with a total
    tie-break.

    Scale: the corpus collapses to the |days| axis; both windows run
    over that metadata axis (allowlisted); the sentinel boundary
    (empty prefix = key 0) is the COALESCE, not a union."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("unix_micros(date_trunc('day', ts)) div 86400000000").alias("di")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("x")
    ).localCheckpoint(eager=True)
    t = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    r = d.withColumn(
        "idx", F.row_number().over(W.orderBy("di")).cast("bigint")
    )
    p = r.crossJoin(F.broadcast(t)).withColumn(
        "pre",
        F.sum(
            F.col("n") * F.col("x").cast("decimal(38,0)") - F.col("s")
        ).over(W.orderBy("idx")),
    )
    pad = F.lit(_KADANE_POS_PAD).cast("decimal(38,0)")
    key = F.col("pre") * pad + F.col("idx")
    # the empty-prefix sentinel (P_0 = 0, idx 0 -> key 0) must compete at
    # EVERY t, not only when the preceding window is empty
    pb = p.withColumn(
        "mkey",
        F.least(
            F.coalesce(
                F.min(key).over(
                    W.orderBy("idx").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0).cast("decimal(38,0)"),
            ),
            F.lit(0).cast("decimal(38,0)"),
        ),
    )
    # floor-mod decode of (pre, idx) from the signed key
    start_idx = F.expr(
        f"((mkey % {_KADANE_POS_PAD} + {_KADANE_POS_PAD})"
        f" % {_KADANE_POS_PAD}) + 1"
    )
    min_pre = F.expr(
        f"(mkey - ((mkey % {_KADANE_POS_PAD} + {_KADANE_POS_PAD})"
        f" % {_KADANE_POS_PAD})) / {_KADANE_POS_PAD}"
    )
    best = pb.select(
        F.col("idx").alias("end_idx"),
        (F.col("pre") - min_pre).alias("gain"),
        start_idx.alias("start_idx"),
    )
    return (
        best.orderBy(F.desc("gain"), F.asc("end_idx"), F.asc("start_idx"))
        .limit(1)
        .select(
            F.col("start_idx").cast("bigint").alias("start_idx"),
            F.col("end_idx").cast("bigint").alias("end_idx"),
            F.col("gain").cast("bigint").alias("centered_gain"),
        )
    )


# ---------------------------------------------------------------------------
# ts_ewma_crossover
# ---------------------------------------------------------------------------

EWMA_SLOW_DAYS = 7  # trailing-mean window (rows) for the slow signal
EWMA_MAX_IDX = 40  # 2^40 weight bound: see overflow note in the docstring


@register(
    "ts_ewma_crossover",
    oracle=f"""
        WITH d AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
        r AS (
            SELECT user_id, day, y,
                   row_number() OVER (PARTITION BY user_id ORDER BY day)
                       - 1 AS rn
            FROM d),
        p AS (
            SELECT user_id, day, y, rn,
                   sum(CASE WHEN rn = 0 THEN CAST(y AS HUGEINT)
                            ELSE CAST(CAST(1 AS BIGINT)
                                      << (CAST(rn AS INT) - 1) AS HUGEINT)
                                 * y END)
                       OVER (PARTITION BY user_id ORDER BY rn
                             ROWS UNBOUNDED PRECEDING) AS nfast,
                   sum(y) OVER (PARTITION BY user_id ORDER BY rn
                             ROWS BETWEEN {EWMA_SLOW_DAYS - 1} PRECEDING
                             AND CURRENT ROW) AS s7,
                   count(*) OVER (PARTITION BY user_id ORDER BY rn
                             ROWS BETWEEN {EWMA_SLOW_DAYS - 1} PRECEDING
                             AND CURRENT ROW) AS k,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM r),
        sg AS (
            SELECT user_id, rn, n, nfast, s7, k,
                   CASE WHEN CAST(nfast AS HUGEINT) * k
                             > CAST(s7 AS HUGEINT) * (CAST(1 AS BIGINT)
                                               << CAST(rn AS INT)) THEN 1
                        WHEN CAST(nfast AS HUGEINT) * k
                             < CAST(s7 AS HUGEINT) * (CAST(1 AS BIGINT)
                                               << CAST(rn AS INT)) THEN -1
                        ELSE 0 END AS sgn
            FROM p),
        c AS (
            SELECT user_id, rn, n, nfast, s7, k, sgn,
                   lag(sgn) OVER (PARTITION BY user_id ORDER BY rn) AS prev
            FROM sg)
        SELECT user_id,
               CAST(max(n) AS BIGINT) AS n_days,
               CAST(count(CASE WHEN sgn * prev = -1 THEN 1 END) AS BIGINT)
                   AS n_crossovers,
               CAST(max(CASE WHEN rn = n - 1 THEN sgn END) AS BIGINT)
                   AS last_signal,
               floor(max(CASE WHEN rn = n - 1 THEN
                       CAST(nfast AS DOUBLE)
                       / CAST(CAST(1 AS BIGINT) << CAST(rn AS INT) AS DOUBLE)
                     END) / 100 * 1000000 + 0.5) / 1000000 AS fast_final,
               floor(max(CASE WHEN rn = n - 1 THEN
                       CAST(s7 AS DOUBLE) / CAST(k AS DOUBLE)
                     END) / 100 * 1000000 + 0.5) / 1000000 AS slow_final
        FROM c GROUP BY user_id
    """,
    tags=("ts", "timeseries", "window"),
)
def ts_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast-vs-slow trend crossover per user series — the classic
    moving-average crossover signal (fast = EWMA with alpha = 1/2,
    slow = trailing 7-row mean over the daily-total series), with the
    crossover COUNT and the final signal state per user. The EWMA is
    evaluated in CLOSED FORM as pure window algebra: 2^t * s_t =
    y_0 + sum(2^(i-1) * y_i), so the fast line is an integer prefix
    sum of shift-weighted daily cents and every fast-vs-slow
    comparison is an EXACT integer sign test (nfast * k vs s7 * 2^t) —
    no float recurrences, no applyInPandas, both engines agree
    bit-for-bit (the recurrence family that genuinely needs stateful
    iteration is ts_holt_exact; alpha = 1/2 is special because the
    denominator is a power of two).

    Overflow bound: the series index is capped at EWMA_MAX_IDX = 40 so
    the BIGINT weight 2^(rn-1) itself never wraps; the weighted terms,
    the nfast prefix sum, and both sign-test products are computed in
    DECIMAL(38,0) (oracle: HUGEINT), so daily cents carry NO bound —
    2^41 * y fits decimal(38,0) for any int64 y. Horizons longer than
    41 days must re-anchor the series first — numerically, weights
    below 2^-40 are sub-ulp on the fast line anyway, so truncation to
    the trailing 41 days is the exact-arithmetic analogue of what
    double precision would silently do.

    Scale: one user_id shuffle serves the daily rollup, all four
    windows, and the final per-user collapse (same key end to end; the
    rollup reduces |events| to |user x day| first)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
    )
    wo = W.partitionBy("user_id").orderBy("day")
    r = d.withColumn("rn", F.row_number().over(wo) - 1)
    # loud guard, not silent wrap: shifting past 2^62 would corrupt the
    # sign tests (see docstring for the re-anchoring contract)
    rn_ok = F.assert_true(
        F.col("rn") <= F.lit(EWMA_MAX_IDX),
        F.lit("ts_ewma_crossover: series exceeds 41 days; re-anchor"),
    )
    wr = W.partitionBy("user_id").orderBy("rn")
    wfast = wr.rowsBetween(W.unboundedPreceding, 0)
    wslow = wr.rowsBetween(-(EWMA_SLOW_DAYS - 1), 0)
    wall = W.partitionBy("user_id")
    # the weight 2^(rn-1) stays BIGINT (rn <= 40 is guarded above), but
    # the weighted terms, prefix sum, and sign-test products run in
    # DECIMAL(38,0): with y unbounded int64 daily cents, nfast ~ 2^41*y
    # and s7*2^rn overflow BIGINT near y ~ 2^20 — the oracle promotes the
    # same expressions to HUGEINT, so both engines stay exact together
    # (same treatment as metric_concentration_shares).
    dec = "decimal(38,0)"
    term = F.when(
        F.col("rn") == 0, F.col("y").cast(dec)
    ).otherwise(
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(rn AS INT) - 1)"
            f" AS {dec}) * CAST(y AS {dec})"
        )
    )
    p = r.select(
        "user_id",
        F.when(rn_ok.isNull(), F.col("rn")).alias("rn"),
        F.sum(term).over(wfast).alias("nfast"),
        F.sum("y").over(wslow).alias("s7"),
        F.count(F.lit(1)).over(wslow).alias("k"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    den = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rn AS INT))")
    lhs = F.col("nfast") * F.col("k").cast(dec)
    rhs = F.col("s7").cast(dec) * den.cast(dec)
    sgn = (
        F.when(lhs > rhs, F.lit(1))
        .when(lhs < rhs, F.lit(-1))
        .otherwise(F.lit(0))
    )
    sg = p.withColumn("sgn", sgn).withColumn("den", den)
    c = sg.withColumn("prev", F.lag("sgn").over(wr))
    r6 = lambda col: F.floor(col / 100 * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    last = F.col("rn") == F.col("n") - 1
    return c.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.count(
            F.when(F.col("sgn") * F.col("prev") == -1, F.lit(1))
        ).cast("bigint").alias("n_crossovers"),
        F.max(F.when(last, F.col("sgn"))).cast("bigint").alias("last_signal"),
        r6(
            F.max(
                F.when(
                    last,
                    F.col("nfast").cast("double") / F.col("den").cast("double"),
                )
            )
        ).alias("fast_final"),
        r6(
            F.max(
                F.when(last, F.col("s7").cast("double") / F.col("k").cast("double"))
            )
        ).alias("slow_final"),
    )


# ---------------------------------------------------------------------------
# ts_holt_winters_exact
# ---------------------------------------------------------------------------

# Additive Holt-Winters with alpha = beta = gamma = 1/4 as exact
# rationals and season length HW_PERIOD (day-of-week), all in cents with
# truncating division — the seasonal completion of ts_holt_exact:
#   l_t = (y_t - s_{t-m} + 3 (l_{t-1} + b_{t-1}))           div 4
#   b_t = ((l_t - l_{t-1}) + 3 b_{t-1})                      div 4
#   s_t = ((y_t - l_t) + 3 s_{t-m})                          div 4
# Seeds: the first m points seed the seasonal cells s_i = y_i - l_0
# with l_0 = the truncated mean of the first season, b_0 = 0.
HW_PERIOD = 7

_HW_ORACLE = f"""
    WITH RECURSIVE g AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1),
    s AS (
        SELECT day, y,
               row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER () AS n
        FROM g),
    seed AS (
        SELECT CAST(SUM(y) // {HW_PERIOD} AS BIGINT) AS l0,
               list(CAST(y AS BIGINT) ORDER BY rn) AS ys
        FROM s WHERE rn <= {HW_PERIOD}),
    r AS (
        SELECT s.rn, s.n, s.day, s.y,
               seed.l0 AS l, CAST(0 AS BIGINT) AS b,
               -- seasonal ring buffer: cell 1 is ALWAYS the next row's
               -- season; seeded from the first season's deviations
               list_transform(seed.ys, v -> v - seed.l0) AS ring
        FROM s CROSS JOIN seed WHERE s.rn = {HW_PERIOD}
        UNION ALL
        SELECT s.rn, s.n, s.day, s.y,
               CAST((s.y - r.ring[1] + 3 * (r.l + r.b)) // 4 AS BIGINT) AS l,
               CAST((((s.y - r.ring[1] + 3 * (r.l + r.b)) // 4) - r.l
                     + 3 * r.b) // 4 AS BIGINT) AS b,
               list_append(
                   r.ring[2:],
                   CAST(((s.y
                          - (s.y - r.ring[1] + 3 * (r.l + r.b)) // 4)
                         + 3 * r.ring[1]) // 4 AS BIGINT)) AS ring
        FROM r JOIN s ON s.rn = r.rn + 1)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(l AS DOUBLE) / 100 AS level,
           CAST(b AS DOUBLE) / 100 AS trend,
           CAST(ring[1] AS DOUBLE) / 100 AS next_season,
           CAST(l + b + ring[1] AS DOUBLE) / 100 AS forecast1
    FROM r WHERE rn = n AND n >= {HW_PERIOD}
"""


@register(
    "ts_holt_winters_exact",
    oracle=_HW_ORACLE,
    tags=("ts", "timeseries", "stateful"),
)
def ts_holt_winters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive HOLT-WINTERS (level + trend + day-of-week season) on the
    global daily-cents series, in EXACT integer arithmetic — the
    seasonal completion of ts_holt_exact: alpha = beta = gamma = 1/4 as
    exact rationals, every update a truncating integer division, the
    seasonal state a rotating {HW_PERIOD}-cell ring so the recurrence
    is a pure function of the data, bit-identical between this Arrow
    batch and the oracle's recursive CTE (which rotates a DuckDB list
    the same way). Output is the final state and the one-step-ahead
    forecast l + b + s — the weekly-seasonality forecast every ops
    dashboard wants where plain Holt under-forecasts weekends.

    Why applyInPandas: three mutually-recursive state variables, one
    of them a ring buffer — no window spec expresses it (same argument
    as ts_holt_exact, plus the seasonal ring). The distributed shape:
    the event stream reduces map-side to the |days| axis, ONE tiny
    grouped batch carries the fold; a multi-series deployment keys the
    same fold by series id exactly like ts_holt_exact."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day", kind="mergesort")
        ys = [int(v) for v in pdf["y"]]
        n = len(ys)
        m = HW_PERIOD
        if n < m:
            return pd.DataFrame(
                columns=["n_days", "level", "trend", "next_season",
                         "forecast1"]
            ).astype({"n_days": "int64"})
        l0 = tdiv(sum(ys[:m]), m)
        lvl, tr = l0, 0
        ring = [y - l0 for y in ys[:m]]  # ring[0] = next row's season
        for y in ys[m:]:
            s_old = ring[0]
            nl = tdiv(y - s_old + 3 * (lvl + tr), 4)
            tr = tdiv((nl - lvl) + 3 * tr, 4)
            s_new = tdiv((y - nl) + 3 * s_old, 4)
            lvl = nl
            ring = ring[1:] + [s_new]
        return pd.DataFrame(
            {
                "n_days": [n],
                "level": [lvl / 100],
                "trend": [tr / 100],
                "next_season": [ring[0] / 100],
                "forecast1": [(lvl + tr + ring[0]) / 100],
            }
        )

    return g.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: hw(pdf),
        schema="n_days bigint, level double, trend double,"
        " next_season double, forecast1 double",
    )
