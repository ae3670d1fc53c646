"""EM-learned Fellegi-Sunter parameters (unsupervised record linkage).

The base ER family (operators/entity_resolution.py) scores candidate
pairs with FIXED agreement weights. Real linkage deployments learn the
model instead: the Fellegi-Sunter (1969) parameters — P(match) prior p
and per-field conditional agreement rates m_k = P(agree_k | match),
u_k = P(agree_k | unmatch) — fitted by the EM algorithm over the
UNLABELED candidate pairs (Winkler 1988; the Splink/fastLink loop).
This module implements that fit and re-runs the match metrics off the
learned model, turning the family from "scoring demo" into the real
linkage loop (round-9 verdict item #5).

Exact-arithmetic discipline (the ml_logistic_exact pattern): all
probabilities live in integer MICRO-units (S = 1e6) and every EM step
is integer multiply + truncating division, so the fitted parameters —
and the classifications derived from them — are bit-identical between
Spark and the unrolled-CTE DuckDB oracle at any partitioning. The
E-step responsibility for a pattern γ is

    w(γ) = a·S // (a + b),   a = p·∏_k (γ_k ? m_k : S−m_k),
                             b = (S−p)·∏_k (γ_k ? u_k : S−u_k)

(5-factor products ≤ 1e30, inside HUGEINT/Python-int headroom), and
the M-step re-estimates each parameter as a ratio of pattern-count
sums, clamped to [1, S−1] so no product ever collapses to zero.

Scale design (100 TB posture): EM's sufficient statistics are the
AGREEMENT-PATTERN COUNTS — at K = 4 binary fields there are at most
2^4 = 16 patterns at ANY data volume. One keyed aggregate over the
blocked candidate pairs produces that 16-row table; every EM iteration
then runs on 16 rows, driver-side in exact Python ints (a model-sized
transfer, same class as ml_logistic_exact's 3-integer weight vector).
No per-iteration scan, no per-iteration shuffle: the classic
"aggregate once, iterate on sufficient statistics" shape.

Classification off the learned model uses the exact likelihood ratio
num/den = ∏(γ_k ? m_k : S−m_k) / ∏(γ_k ? u_k : S−u_k) compared as
integer cross-products (num ≥ R·den), no logarithms anywhere — so the
engine and the oracle classify identically to the last pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.operators.entity_resolution import (
    ACC_TOL,
    BAND,
    _SQL_CAND,
    _a_side,
    _banded,
    _suffix4,
    source_b,
)
from cdc_export_system_spark.registry import register

EM_S = 1_000_000  # micro-unit probability scale
EM_ITERS = 5  # fixed iteration count (both engines unroll exactly this)
EM_P0, EM_M0, EM_U0 = 100_000, 900_000, 100_000  # deterministic init
R_MATCH = 1_000  # likelihood ratio >= 1000 -> 'match'
R_POSSIBLE = 1  # ratio >= 1 -> 'possible'
_FIELDS = ("suffix", "nation", "segment", "acctbal")  # g1..g4


def _tol_ok() -> F.Column:
    from cdc_export_system_spark.operators.entity_resolution import TOL

    return F.abs(F.col("b_acctbal") - F.col("c_acctbal")) <= TOL


def _sources(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The (A, B-with-suffix) linkage inputs, MATERIALIZED once. The
    EM pipeline consumes each side several times in one action (p1 +
    p2 blocking passes, the shifted negative join, and for the metrics
    query a second classification pass); un-materialized, every
    consumer re-runs the scan + regex-suffix + dup-union subtree —
    up to 3x per side per fit. Both sides are narrow projections of
    the record feed, so one localCheckpoint each is the cheap side of
    the reuse trade at any volume. Delegates to
    entity_resolution.pinned_sources — one definition of the pinned
    feeds for the whole er_* family."""
    from cdc_export_system_spark.operators.entity_resolution import (
        pinned_sources,
    )

    return pinned_sources(spark, sf_dir)


def candidate_features(
    spark: SparkSession,
    sf_dir: str,
    a: DataFrame | None = None,
    b: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs with their binary agreement pattern
    (g1..g4) and the ground-truth bit (metrics only; EM never sees it).
    Same two blocking passes as candidate_pairs; the union dedups on
    the narrow (pair, pattern, truth) projection — pattern bits are
    pure functions of the pair, so this equals dedup-on-pair.
    ``a``/``b``: pre-materialized sources from :func:`_sources` (built
    fresh when omitted)."""
    if a is None:
        a = _a_side(spark, sf_dir)
    if b is None:
        b = source_b(spark, sf_dir).withColumn(
            "b_suf", _suffix4(F.col("b_name"))
        )
    # BAND from entity_resolution, NOT a literal: the A side bands via
    # _banded (which uses BAND) — a drifted constant would band the two
    # sides inconsistently and silently drop candidate pairs.
    b_banded = b.withColumn("band", F.floor(F.col("b_acctbal") / BAND))
    a_banded = _banded(a, "c_acctbal").withColumnRenamed("band", "a_band")
    p1 = a_banded.join(
        b_banded,
        on=[
            F.col("a_band") == F.col("band"),
            F.col("b_nation") == F.col("c_nationkey"),
            F.col("b_segment") == F.col("c_mktsegment"),
        ],
    ).filter(_tol_ok())
    p2 = a_banded.join(
        b_banded,
        on=[F.col("a_band") == F.col("band"), F.col("b_suf") == F.col("a_suf")],
    ).filter(_tol_ok())
    cols = [F.col("c_custkey"), F.col("b_id"), F.col("b_truth"), *_feat_cols()]
    return p1.select(*cols).unionAll(p2.select(*cols)).distinct()


def negative_features(
    spark: SparkSession,
    sf_dir: str,
    a: DataFrame | None = None,
    b: DataFrame | None = None,
) -> DataFrame:
    """Deterministic NON-match pairs for the u-side of the fit: pair
    each A record with the B record(s) of the NEXT customer key — a
    keyed 1:1 equi-join (linear at any volume, no sampling RNG), and a
    non-match by construction (b_truth = k+1 ≠ k). This is fastLink's
    random-pair u-estimator made deterministic: good blocking yields
    candidates that are mostly TRUE matches (here ~93%), which starves
    EM of unmatch evidence and collapses the model (the first cut of
    this op learned p̂ = 0.96 and an empty 'match' class); anchoring u
    with explicit shifted pairs is the standard remedy. ``a``/``b``
    as in :func:`candidate_features`."""
    if a is None:
        a = _a_side(spark, sf_dir)
    if b is None:
        b = source_b(spark, sf_dir).withColumn(
            "b_suf", _suffix4(F.col("b_name"))
        )
    return a.join(b, F.col("b_truth") == F.col("c_custkey") + 1).select(
        F.col("c_custkey"), F.col("b_id"), F.col("b_truth"), *_feat_cols()
    )


def _feat_cols() -> list[F.Column]:
    return [
        (F.col("b_suf") == F.col("a_suf")).cast("int").alias("g1"),
        (F.col("b_nation") == F.col("c_nationkey")).cast("int").alias("g2"),
        (
            (F.col("b_segment") != "UNKNOWN")
            & (F.col("b_segment") == F.col("c_mktsegment"))
        )
        .cast("int")
        .alias("g3"),
        (F.abs(F.col("b_acctbal") - F.col("c_acctbal")) <= ACC_TOL)
        .cast("int")
        .alias("g4"),
    ]


# Oracle CTEs: candidate features (on _SQL_CAND's deduped `cand`, rows
# 1:1 with distinct pairs), the shifted negative sample, and the 16-row
# pattern counts over their union (the EM training set).
_SQL_FEAT_EXPRS = f"""
               CASE WHEN b_suf = a_suf THEN 1 ELSE 0 END AS g1,
               CASE WHEN b_nation = c_nationkey THEN 1 ELSE 0 END AS g2,
               CASE WHEN b_segment <> 'UNKNOWN'
                     AND b_segment = c_mktsegment THEN 1 ELSE 0 END AS g3,
               CASE WHEN abs(b_acctbal - c_acctbal) <= {ACC_TOL}
                    THEN 1 ELSE 0 END AS g4
"""

_SQL_FEATS = f"""
    feats AS (
        SELECT c_custkey, b_id, b_truth,
               {_SQL_FEAT_EXPRS}
        FROM cand),
    neg AS (
        SELECT a.c_custkey, bx.b_id, bx.b_truth,
               {_SQL_FEAT_EXPRS}
        FROM a JOIN bx ON bx.b_truth = a.c_custkey + 1),
    patterns AS (
        SELECT g1, g2, g3, g4, CAST(count(*) AS HUGEINT) AS cnt
        FROM (SELECT g1, g2, g3, g4 FROM feats
              UNION ALL SELECT g1, g2, g3, g4 FROM neg)
        GROUP BY g1, g2, g3, g4)
"""


def _sql_em_unrolled(iters: int = EM_ITERS) -> str:
    """w0..w{iters} CTEs: the exact integer EM, unrolled."""
    S = EM_S
    parts = [
        f"""
    w0 AS (SELECT CAST({EM_P0} AS HUGEINT) AS p,
                  CAST({EM_M0} AS HUGEINT) AS m1, CAST({EM_M0} AS HUGEINT) AS m2,
                  CAST({EM_M0} AS HUGEINT) AS m3, CAST({EM_M0} AS HUGEINT) AS m4,
                  CAST({EM_U0} AS HUGEINT) AS u1, CAST({EM_U0} AS HUGEINT) AS u2,
                  CAST({EM_U0} AS HUGEINT) AS u3, CAST({EM_U0} AS HUGEINT) AS u4)"""
    ]
    for t in range(1, iters + 1):
        am = " * ".join(
            f"(CASE WHEN g{k} = 1 THEN m{k} ELSE {S} - m{k} END)" for k in (1, 2, 3, 4)
        )
        bu = " * ".join(
            f"(CASE WHEN g{k} = 1 THEN u{k} ELSE {S} - u{k} END)" for k in (1, 2, 3, 4)
        )
        m_new = ", ".join(
            f"GREATEST(1, LEAST({S - 1}, (SUM(cnt * w * g{k}) * {S})"
            f" // GREATEST(1, SUM(cnt * w)))) AS m{k}"
            for k in (1, 2, 3, 4)
        )
        u_new = ", ".join(
            f"GREATEST(1, LEAST({S - 1}, (SUM(cnt * ({S} - w) * g{k}) * {S})"
            f" // GREATEST(1, SUM(cnt * ({S} - w))))) AS u{k}"
            for k in (1, 2, 3, 4)
        )
        parts.append(f"""
    e{t} AS (
        SELECT g1, g2, g3, g4, cnt, (a * {S}) // (a + b) AS w
        FROM (SELECT g1, g2, g3, g4, cnt,
                     p * {am} AS a,
                     ({S} - p) * {bu} AS b
              FROM patterns CROSS JOIN w{t - 1})),
    w{t} AS (
        SELECT GREATEST(1, LEAST({S - 1},
                   SUM(cnt * w) // GREATEST(1, SUM(cnt)))) AS p,
               {m_new},
               {u_new}
        FROM e{t})""")
    return ",".join(parts)


def _em_fit(patterns: list[tuple[int, int, int, int, int]]) -> dict[str, int]:
    """Driver-side EM over the <=16 (g1,g2,g3,g4,cnt) sufficient rows —
    exact Python ints, mirroring _sql_em_unrolled term for term. All
    quantities are non-negative, so Python's flooring // agrees with
    DuckDB's truncating //."""
    S = EM_S
    p = EM_P0
    m = [EM_M0] * 4
    u = [EM_U0] * 4
    clamp = lambda x: max(1, min(S - 1, x))  # noqa: E731
    for _ in range(EM_ITERS):
        sw = snw = n = 0
        swg = [0] * 4
        snwg = [0] * 4
        for g1, g2, g3, g4, cnt in patterns:
            g = (g1, g2, g3, g4)
            a = p
            b = S - p
            for k in range(4):
                a *= m[k] if g[k] else S - m[k]
                b *= u[k] if g[k] else S - u[k]
            w = (a * S) // (a + b)
            sw += cnt * w
            snw += cnt * (S - w)
            n += cnt
            for k in range(4):
                if g[k]:
                    swg[k] += cnt * w
                    snwg[k] += cnt * (S - w)
        p = clamp(sw // max(1, n))
        m = [clamp((swg[k] * S) // max(1, sw)) for k in range(4)]
        u = [clamp((snwg[k] * S) // max(1, snw)) for k in range(4)]
    return {
        "p": p,
        "m": m,
        "u": u,
        "n_pairs": sum(c for *_g, c in patterns),
    }


def _fit_from_spark(
    spark: SparkSession,
    sf_dir: str,
    a: DataFrame | None = None,
    b: DataFrame | None = None,
) -> dict[str, int]:
    if a is None or b is None:
        a, b = _sources(spark, sf_dir)
    train = candidate_features(spark, sf_dir, a, b).unionAll(
        negative_features(spark, sf_dir, a, b)
    )
    rows = (
        train.groupBy("g1", "g2", "g3", "g4")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # <= 2^4 rows at ANY volume: model-sized transfer
    )
    pats = [(r["g1"], r["g2"], r["g3"], r["g4"], r["cnt"]) for r in rows]
    return _em_fit(sorted(pats))


@register(
    "er_em_weights",
    oracle=f"""
        WITH {_SQL_CAND},
        {_SQL_FEATS},
        {_sql_em_unrolled()}
        SELECT 'p_match' AS term, CAST(p AS BIGINT) AS value_micro
        FROM w{EM_ITERS}
        UNION ALL SELECT 'm_suffix', CAST(m1 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'm_nation', CAST(m2 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'm_segment', CAST(m3 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'm_acctbal', CAST(m4 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'u_suffix', CAST(u1 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'u_nation', CAST(u2 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'u_segment', CAST(u3 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'u_acctbal', CAST(u4 AS BIGINT) FROM w{EM_ITERS}
        UNION ALL SELECT 'n_pairs', CAST(SUM(cnt) AS BIGINT) FROM patterns
    """,
    headline=True,
    tags=("er", "ml", "iterative"),
)
def er_em_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned linkage model: P(match) prior and per-field m/u
    rates after EM_ITERS exact-integer EM rounds over the unlabeled
    candidate patterns, in micro-units. One Spark aggregate builds the
    sufficient statistics; the fit itself touches 16 rows."""
    fit = _fit_from_spark(spark, sf_dir)
    rows = [("p_match", fit["p"]), ("n_pairs", fit["n_pairs"])]
    rows += [(f"m_{f}", fit["m"][k]) for k, f in enumerate(_FIELDS)]
    rows += [(f"u_{f}", fit["u"][k]) for k, f in enumerate(_FIELDS)]
    return spark.createDataFrame(rows, "term string, value_micro bigint")


@register(
    "er_match_metrics_em",
    oracle=f"""
        WITH {_SQL_CAND},
        {_SQL_FEATS},
        {_sql_em_unrolled()},
        classed AS (
            SELECT CASE WHEN num >= {R_MATCH} * den THEN 'match'
                        WHEN num >= {R_POSSIBLE} * den THEN 'possible'
                        ELSE 'nonmatch' END AS cls,
                   is_true
            FROM (SELECT
                    (CASE WHEN g1 = 1 THEN m1 ELSE {EM_S} - m1 END)
                  * (CASE WHEN g2 = 1 THEN m2 ELSE {EM_S} - m2 END)
                  * (CASE WHEN g3 = 1 THEN m3 ELSE {EM_S} - m3 END)
                  * (CASE WHEN g4 = 1 THEN m4 ELSE {EM_S} - m4 END) AS num,
                    (CASE WHEN g1 = 1 THEN u1 ELSE {EM_S} - u1 END)
                  * (CASE WHEN g2 = 1 THEN u2 ELSE {EM_S} - u2 END)
                  * (CASE WHEN g3 = 1 THEN u3 ELSE {EM_S} - u3 END)
                  * (CASE WHEN g4 = 1 THEN u4 ELSE {EM_S} - u4 END) AS den,
                    CASE WHEN b_truth = c_custkey THEN 1 ELSE 0 END AS is_true
                  FROM feats CROSS JOIN w{EM_ITERS})),
        per_cls AS (
            SELECT cls, count(*) AS n_pairs,
                   CAST(sum(is_true) AS BIGINT) AS n_true_pairs
            FROM classed GROUP BY cls)
        SELECT cls, n_pairs, n_true_pairs,
               n_true_pairs / n_pairs AS precision,
               n_true_pairs / (SELECT count(*) FROM b) AS recall
        FROM per_cls
    """,
    tags=("er", "ml", "metrics"),
)
def er_match_metrics_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er_match_metrics re-run off the LEARNED model: pairs classify by
    the exact likelihood ratio ∏(γ?m:1−m)/∏(γ?u:1−u) compared as
    integer cross-products (no logs, no thresholds tuned by hand — only
    the two ratio cutoffs). Because the pattern space is 16 cells, the
    per-pair classifier compiles to a 16-way CASE on the pattern bits
    with DRIVER-PRECOMPUTED exact classes: zero wide arithmetic in the
    scan, one keyed aggregate for the report."""
    a, b = _sources(spark, sf_dir)
    fit = _fit_from_spark(spark, sf_dir, a, b)
    S = EM_S
    m, u = fit["m"], fit["u"]

    def cls_of(bits: tuple[int, int, int, int]) -> str:
        num = den = 1
        for k in range(4):
            num *= m[k] if bits[k] else S - m[k]
            den *= u[k] if bits[k] else S - u[k]
        if num >= R_MATCH * den:
            return "match"
        if num >= R_POSSIBLE * den:
            return "possible"
        return "nonmatch"

    feats = candidate_features(spark, sf_dir, a, b)
    cls_expr = None
    for i in range(16):
        bits = (i >> 3 & 1, i >> 2 & 1, i >> 1 & 1, i & 1)
        cond = (
            (F.col("g1") == bits[0])
            & (F.col("g2") == bits[1])
            & (F.col("g3") == bits[2])
            & (F.col("g4") == bits[3])
        )
        label = F.lit(cls_of(bits))
        cls_expr = F.when(cond, label) if cls_expr is None else cls_expr.when(cond, label)
    classed = feats.select(
        cls_expr.alias("cls"),
        F.when(F.col("b_truth") == F.col("c_custkey"), 1).otherwise(0).alias("is_true"),
    )
    per_cls = classed.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("is_true").cast("bigint").alias("n_true_pairs"),
    )
    # count over the materialized b (suffix col never changes the count)
    total_b = b.agg(F.count(F.lit(1)).alias("n_b"))
    return per_cls.crossJoin(F.broadcast(total_b)).select(
        "cls",
        "n_pairs",
        "n_true_pairs",
        (F.col("n_true_pairs") / F.col("n_pairs")).alias("precision"),
        (F.col("n_true_pairs") / F.col("n_b")).alias("recall"),
    )
