"""Gradient-boosted stumps, in-engine: the boosting OUTER loop whose
inner best-split search ml_decision_stump already exposes.

Least-squares boosting (Friedman 2001) on the events value signal:
round t fits a depth-1 regression tree to the current residuals and
adds its shrunken leaf predictions to the ensemble. Every round is two
distributed passes — a (feature, value) sufficient-statistic aggregate
(map-side combined, |values|-sized) and a CASE-expression residual
update — so the corpus is scanned O(T) times and only the T-row model
ever reaches the driver.

Exactness discipline (the repo's micro-unit rule, applied to an
iterative learner): targets are exact cents; residuals and leaf values
are micro-cents integers (leaf means double-evaluated from exact
integer sums, floor(x*1e4+0.5)-rounded BEFORE the update), and the
split score (SL^2/nL + SR^2/nR) nano-rounds before the argmax with a
total (score DESC, feature, threshold) tie-break — so the learned model
is partition-invariant and bit-stable across runs, which is what makes
the NumPy reference pin in tests/test_round6_semantics.py an equality
check rather than a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import REGISTRY, register

GBM_ROUNDS = 4
GBM_SHRINKAGE = 0.5  # learning rate nu
_MICRO = 10_000  # micro-cents per cent... (cents * 1e4 accumulator grain)


def _best_split(feat: DataFrame) -> tuple:
    """Global best (feature, threshold, leaf_left, leaf_right) for the
    current residuals: per-(feature, value) suffstats -> prefix sums on
    the value axis -> nano-rounded score argmax. ``feat`` columns:
    feature (string), v (bigint), r (bigint micro-cents residual)."""
    pv = feat.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").cast("decimal(38,0)").alias("s"),
    )
    w = W.partitionBy("feature").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot = pv.groupBy("feature").agg(
        F.sum("n").alias("tn"), F.sum("s").cast("decimal(38,0)").alias("ts")
    )
    cum = pv.select(
        "feature",
        "v",
        F.sum("n").over(w).alias("nl"),
        F.sum("s").over(w).cast("decimal(38,0)").alias("sl"),
    )
    g = cum.join(tot, "feature").filter(
        (F.col("nl") > 0) & (F.col("tn") - F.col("nl") > 0)
    )
    dd = lambda c: c.cast("double")  # noqa: E731
    nr = F.col("tn") - F.col("nl")
    sr = (F.col("ts") - F.col("sl")).cast("decimal(38,0)")
    score = dd(F.col("sl")) * dd(F.col("sl")) / dd(F.col("nl")) + dd(sr) * dd(
        sr
    ) / dd(nr)
    scored = g.select(
        "feature",
        F.col("v").alias("threshold"),
        F.floor(score / 1e12 + F.lit(0.5)).cast("decimal(38,0)").alias("score_fixed"),
        (dd(F.col("sl")) / dd(F.col("nl"))).alias("mean_l"),
        (dd(sr) / dd(nr)).alias("mean_r"),
    )
    top = (
        scored.orderBy(
            F.col("score_fixed").desc(), F.col("feature").asc(),
            F.col("threshold").asc(),
        )
        .limit(1)
        .collect()
    )
    if not top:
        return None
    t = top[0]
    # shrunken leaf values, micro-rounded BEFORE they enter the update
    leaf_l = int(t["mean_l"] * GBM_SHRINKAGE + (0.5 if t["mean_l"] >= 0 else -0.5))
    leaf_r = int(t["mean_r"] * GBM_SHRINKAGE + (0.5 if t["mean_r"] >= 0 else -0.5))
    return t["feature"], int(t["threshold"]), leaf_l, leaf_r


@register(
    "ml_gbm_stumps",
    oracle=None,  # iterative trainer — pinned against a NumPy reference
    # implementation in tests/test_round6_semantics.py
    tags=("ml", "iterative", "boosting"),
)
def ml_gbm_stumps(
    spark: SparkSession, sf_dir: str, n_rounds: int = GBM_ROUNDS
) -> DataFrame:
    """Train the boosted-stump ensemble on events (target: exact value
    cents; features: hour-of-day and day-of-week) and return the model
    table (round, feature, threshold, leaf_left, leaf_right,
    train_sse_cents2) — leaf values in micro-cents, train_sse_cents2
    the POST-update residual sum of squares in whole cents^2 (exact
    integer division — the magnitude outgrows double's 2^53 integer
    range, so a float report could never hash-match), non-increasing
    round over round (pinned).

    Scale: per round one map-side-combined (feature, value) suffstat
    aggregate over the bounded feature axes (<=31 distinct values),
    one TakeOrdered(1) argmax, one codegen CASE residual update
    checkpointed to keep lineage flat. The corpus never shuffles on a
    data-sized key; the driver holds only the T-row model."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("bigint").alias("hour"),
        F.dayofweek("ts").cast("bigint").alias("dow"),
        (F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") * _MICRO).alias(
            "r"
        ),
    ).localCheckpoint(eager=True)

    model: list[tuple[int, str, int, int, int, float]] = []
    cur = base
    for rnd in range(n_rounds):
        feat = cur.select(
            F.explode(
                F.array(
                    F.struct(F.lit("hour").alias("feature"), F.col("hour").alias("v")),
                    F.struct(F.lit("dow").alias("feature"), F.col("dow").alias("v")),
                )
            ).alias("f"),
            "r",
        ).select("f.feature", "f.v", "r")
        split = _best_split(feat)
        if split is None:
            break
        fname, thr, leaf_l, leaf_r = split
        upd = F.when(F.col(fname) <= thr, F.lit(leaf_l)).otherwise(F.lit(leaf_r))
        cur = cur.select(
            "hour", "dow", (F.col("r") - upd).alias("r")
        ).localCheckpoint(eager=True)
        sse_micro2 = cur.agg(
            F.sum(
                (F.col("r").cast("decimal(38,0)") * F.col("r")).cast("decimal(38,0)")
            ).alias("q")
        ).collect()[0]["q"]
        # micro-cents^2 -> whole cents^2 by exact integer division: the
        # magnitude (~1e16 micro^2) is beyond double's 2^53 integer range,
        # so any float-rounded report would be ulp-unstable across engines
        sse_cents2 = int(sse_micro2) // (_MICRO * _MICRO)
        model.append((rnd, fname, thr, leaf_l, leaf_r, sse_cents2))
    return spark.createDataFrame(
        model,
        "round int, feature string, threshold bigint, "
        "leaf_left bigint, leaf_right bigint, train_sse_cents2 long",
    )


def _gbm_oracle(n_rounds: int = GBM_ROUNDS) -> str:
    """Unrolled-CTE DuckDB oracle for the fixed-round trainer (the
    graph_pagerank_exact construction): each round is a suffstat CTE, a
    prefix-sum threshold scan, a LIMIT-1 argmax, and a residual-update
    CTE referencing the argmax through scalar subqueries. Exactness
    hinges on the same discipline as the Spark side: integer suffstats
    (HUGEINT), the VARCHAR hop for exact int->double casts, the
    score nano-fix before the argmax, and round-half-away-from-zero
    leaf rounding (matching Python int(x +/- 0.5) truncation)."""
    vh = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nu = GBM_SHRINKAGE
    ctes = [
        """r0 AS MATERIALIZED (
            SELECT CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 AS r
            FROM events)"""
    ]
    for t in range(n_rounds):
        score = (
            f"{vh('sl')} * {vh('sl')} / {vh('nl')}"
            f" + {vh('sr')} * {vh('sr')} / {vh('nr')}"
        )
        ctes.append(f"""f{t} AS MATERIALIZED (
            SELECT feature, v, CAST(count(*) AS HUGEINT) AS n,
                   SUM(CAST(r AS HUGEINT)) AS s
            FROM (SELECT 'hour' AS feature, hour AS v, r FROM r{t}
                  UNION ALL SELECT 'dow', dow, r FROM r{t})
            GROUP BY feature, v),
        c{t} AS (
            SELECT feature, v,
                   SUM(n) OVER w AS nl, SUM(s) OVER w AS sl,
                   SUM(n) OVER (PARTITION BY feature) AS tn,
                   SUM(s) OVER (PARTITION BY feature) AS ts
            FROM f{t}
            WINDOW w AS (PARTITION BY feature ORDER BY v
                         ROWS UNBOUNDED PRECEDING)),
        g{t} AS (
            SELECT feature, v AS threshold, nl, tn - nl AS nr,
                   sl, ts - sl AS sr
            FROM c{t} WHERE nl > 0 AND tn - nl > 0),
        s{t} AS (
            SELECT feature, threshold,
                   CAST(floor(({score}) / 1e12 + 0.5) AS HUGEINT)
                       AS score_fixed,
                   {vh('sl')} / {vh('nl')} AS mean_l,
                   {vh('sr')} / {vh('nr')} AS mean_r
            FROM g{t}),
        b{t} AS MATERIALIZED (
            SELECT feature, threshold,
                   CASE WHEN mean_l >= 0
                        THEN CAST(floor(mean_l * {nu} + 0.5) AS BIGINT)
                        ELSE -CAST(floor(-mean_l * {nu} + 0.5) AS BIGINT)
                   END AS leaf_l,
                   CASE WHEN mean_r >= 0
                        THEN CAST(floor(mean_r * {nu} + 0.5) AS BIGINT)
                        ELSE -CAST(floor(-mean_r * {nu} + 0.5) AS BIGINT)
                   END AS leaf_r
            FROM s{t}
            ORDER BY score_fixed DESC, feature, threshold LIMIT 1),
        r{t + 1} AS MATERIALIZED (
            SELECT hour, dow,
                   r - (CASE WHEN (SELECT feature FROM b{t}) = 'hour'
                             THEN CASE WHEN hour <= (SELECT threshold FROM b{t})
                                       THEN (SELECT leaf_l FROM b{t})
                                       ELSE (SELECT leaf_r FROM b{t}) END
                             ELSE CASE WHEN dow <= (SELECT threshold FROM b{t})
                                       THEN (SELECT leaf_l FROM b{t})
                                       ELSE (SELECT leaf_r FROM b{t}) END
                        END) AS r
            FROM r{t}),
        q{t} AS MATERIALIZED (SELECT SUM(CAST(r AS HUGEINT) * r) AS sq FROM r{t + 1})""")
    finals = "\n        UNION ALL ".join(
        f"""SELECT {t} AS round, b{t}.feature,
               CAST(b{t}.threshold AS BIGINT) AS threshold,
               b{t}.leaf_l AS leaf_left, b{t}.leaf_r AS leaf_right,
               CAST(q{t}.sq // 100000000 AS BIGINT) AS train_sse_cents2
        FROM b{t}, q{t}"""
        for t in range(n_rounds)
    )
    return "WITH " + ",\n        ".join(ctes) + "\n        " + finals


REGISTRY["ml_gbm_stumps"].oracle = _gbm_oracle()
