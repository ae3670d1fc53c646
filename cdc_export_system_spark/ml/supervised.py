"""Supervised learning as queries: OLS, logistic regression, naive Bayes.

Reference parity: the reference (`/root/reference/app/`) has no ML
surface — these are north-star extensions ("operations a large-scale
training-data pipeline would need"), built on the engine's established
exactness discipline so they remain oracle-checkable:

* ``ml_linear_regression`` — per-group simple OLS from exact integer
  sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy). One map-side-combined
  aggregate per group; the closed form is evaluated on exact DECIMAL(38)
  integers, so the slope/intercept/R² match DuckDB bit-for-bit after the
  final double divide + 1e-6 round.
* ``ml_naive_bayes`` — multinomial NB over the documents table (class =
  lang). Scores are accumulated in exact integer MICRO-UNITS (each
  ln-term rounded to 1e-6 before summation), so the per-class sum is
  order-independent and the argmax compares exact integers — the same
  trick that keeps text_tfidf/text_pmi hash-stable.
* ``ml_logistic_regression_gd`` — fixed-iteration batch gradient
  descent; each iteration is ONE aggregate whose per-row gradient
  contributions are rounded to 1e-9 and summed as integers, making the
  trained weights identical under any partitioning. Not SQL-expressible
  (iterative) → rows-only driver check + exact NumPy replay pin in
  tests/test_ml.py.
* ``ml_ridge_normal_eq`` — multivariate ridge via the PCA-style pattern
  (similarity/pca.py): per-batch XᵀX / Xᵀy partials, driver solve of the
  (k+1)×(k+1) system, coefficients broadcast back for the training-RMSE
  pass. Rows-only + NumPy-reference pin.

Scale posture (100 TB): every operator reduces the corpus to a
model-sized sufficient statistic — O(groups) rows for OLS, O(V×C) for
NB (V capped by a min-df vocabulary threshold at scale, exactly like
MAX_SHINGLE_DF in dedup/jaccard.py), O(k²) doubles for ridge, O(k) per
GD iteration. Nothing pairwise, nothing driver-side except the model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register, sql_dcast
from cdc_export_system_spark.similarity.queries import EVAL_QUERY_ID_BOUND

D38 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# ml_linear_regression
# ---------------------------------------------------------------------------

_LINREG_ORACLE = f"""
    WITH s AS (
        SELECT event_type,
               CAST(extract(hour FROM ts) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events),
    a AS (
        SELECT event_type, count(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM s GROUP BY event_type HAVING count(*) >= 2),
    f AS (
        SELECT event_type, n,
               n * sxy - sx * sy AS s_num,
               n * sxx - sx * sx AS s_den,
               n * syy - sy * sy AS t_den,
               sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS i_num
        FROM a)
    SELECT event_type, n,
           floor({sql_dcast("s_num")} / {sql_dcast("s_den")} / 100 * 1000000
                 + 0.5) / 1000000 AS slope,
           floor({sql_dcast("i_num")} / ({sql_dcast("n")} * {sql_dcast("s_den")})
                 / 100 * 1000000 + 0.5) / 1000000 AS intercept,
           floor({sql_dcast("s_num")} * {sql_dcast("s_num")}
                 / ({sql_dcast("s_den")} * {sql_dcast("t_den")}) * 1000000
                 + 0.5) / 1000000 AS r2
    FROM f
"""


@register(
    "ml_linear_regression",
    oracle=_LINREG_ORACLE,
    tags=("ml", "agg", "stats"),
)
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type simple OLS of value (exact cents) on hour-of-day:
    slope, intercept, R² from the closed form over exact integer
    sufficient statistics. One map-side-combined aggregate — at 100 TB
    the shuffle carries |groups| rows of seven integers; the regression
    algebra runs on DECIMAL(38,0) (headroom to n≈10¹² rows/group before
    n·Σy² approaches 10³⁸), and the only float steps are the final
    divides, written as the identical expression tree in both engines."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    a = (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cast the OPERAND before summing so the accumulator itself is
            # DECIMAL(38,0) — a bigint accumulator would wrap silently
            # around Σy² ≈ 2e10 rows at cents scale (oracle casts to
            # HUGEINT before SUM for the same reason)
            F.sum(F.col("x").cast(D38)).alias("sx"),
            F.sum(F.col("y").cast(D38)).alias("sy"),
            F.sum(F.col("x").cast(D38) * F.col("x")).alias("sxx"),
            F.sum(F.col("x").cast(D38) * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast(D38) * F.col("y")).alias("syy"),
        )
        .filter(F.col("n") >= 2)
    )
    n = F.col("n").cast(D38)
    s_num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).alias("s_num")
    s_den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).alias("s_den")
    t_den = (n * F.col("syy") - F.col("sy") * F.col("sy")).alias("t_den")
    f = a.select(
        "event_type",
        "n",
        s_num,
        s_den,
        t_den,
        (
            F.col("sy") * (n * F.col("sxx") - F.col("sx") * F.col("sx"))
            - (n * F.col("sxy") - F.col("sx") * F.col("sy")) * F.col("sx")
        ).alias("i_num"),
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    dd = lambda c: c.cast("double")  # noqa: E731  (decimal→double, correctly rounded)
    return f.select(
        "event_type",
        "n",
        r6(dd(F.col("s_num")) / dd(F.col("s_den")) / 100).alias("slope"),
        r6(
            dd(F.col("i_num")) / (dd(F.col("n").cast(D38)) * dd(F.col("s_den"))) / 100
        ).alias("intercept"),
        r6(
            dd(F.col("s_num"))
            * dd(F.col("s_num"))
            / (dd(F.col("s_den")) * dd(F.col("t_den")))
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# ml_naive_bayes
# ---------------------------------------------------------------------------

TEST_FOLD = 5  # doc_id % TEST_FOLD == 0 → held-out test split

_NB_ORACLE = f"""
    WITH train AS (
        SELECT doc_id, lang, text FROM documents WHERE doc_id % {TEST_FOLD} != 0),
    test AS (
        SELECT doc_id, lang, text FROM documents WHERE doc_id % {TEST_FOLD} = 0),
    ttok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM train),
    counts AS (SELECT lang, token, count(*) AS cnt FROM ttok GROUP BY lang, token),
    vocab AS (SELECT DISTINCT token FROM ttok),
    vsize AS (SELECT count(*) AS v FROM vocab),
    cls AS (SELECT lang, count(*) AS n_docs FROM train GROUP BY lang),
    ntr AS (SELECT count(*) AS n FROM train),
    ctot AS (SELECT lang, count(*) AS tok_total FROM ttok GROUP BY lang),
    model AS (
        SELECT vb.token, c.lang,
               CAST(floor((ln(COALESCE(k.cnt, 0) + 1.0)
                           - ln(CAST(ct.tok_total + vs.v AS DOUBLE)))
                          * 1000000 + 0.5) AS BIGINT) AS lp_micro
        FROM vocab vb CROSS JOIN cls c
        JOIN ctot ct ON ct.lang = c.lang
        CROSS JOIN vsize vs
        LEFT JOIN counts k ON k.lang = c.lang AND k.token = vb.token),
    prior AS (
        SELECT c.lang,
               CAST(floor((ln(CAST(c.n_docs AS DOUBLE))
                           - ln(CAST(n.n AS DOUBLE))) * 1000000 + 0.5)
                    AS BIGINT) AS prior_micro
        FROM cls c CROSS JOIN ntr n),
    dtok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM test),
    dcnt AS (SELECT doc_id, token, count(*) AS tok_cnt FROM dtok
             GROUP BY doc_id, token),
    scores AS (
        SELECT d.doc_id, m.lang,
               p.prior_micro + SUM(d.tok_cnt * m.lp_micro) AS score_micro
        FROM dcnt d JOIN model m ON m.token = d.token
        JOIN prior p ON p.lang = m.lang
        GROUP BY d.doc_id, m.lang, p.prior_micro),
    ranked AS (
        SELECT doc_id, lang, score_micro,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score_micro DESC, lang) AS rk
        FROM scores)
    SELECT t.doc_id, t.lang AS lang_actual, r.lang AS lang_pred,
           CAST(r.score_micro AS DOUBLE) / 1000000 AS score,
           (r.lang = t.lang) AS correct
    FROM test t LEFT JOIN ranked r ON r.doc_id = t.doc_id AND r.rk = 1
"""


@register(
    "ml_naive_bayes",
    oracle=_NB_ORACLE,
    tags=("ml", "text", "join", "agg"),
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier, trained and scored in
    one query: train on doc_id % 5 != 0 (class = lang, features = space
    tokens, Laplace +1), predict the held-out fold, report prediction +
    correctness per test doc.

    Determinism: every ln-term (token log-likelihood, class log-prior)
    is rounded to integer micro-units BEFORE accumulation, so per-doc
    class scores are exact integer sums — order-independent under any
    partitioning, and the argmax is an integer comparison with a lang
    tie-break. Both engines compute ln on identical exact rationals.

    Scale: the dense model is |vocab|×|classes| rows (a model, not
    data; at web scale the vocabulary is capped by a min-df threshold
    like dedup/jaccard.py's MAX_SHINGLE_DF). Scoring shuffles only
    (doc, token, count) triples joined to the broadcast-sized model —
    the token stream is read once and never re-shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % TEST_FOLD != 0)
    test = docs.filter(F.col("doc_id") % TEST_FOLD == 0)
    return naive_bayes_classify(train, test)


def naive_bayes_classify(train: DataFrame, test: DataFrame) -> DataFrame:
    """Core multinomial-NB train+score (see ml_naive_bayes docstring).
    ``train``/``test`` need (doc_id, lang, text); class = lang. On the
    synthetic testdata the lang label is independent of the shared
    vocabulary, so held-out accuracy is chance by construction — the
    oracle hash proves the computation; the learning behavior is pinned
    on a signal-bearing constructed corpus in tests/test_ml.py."""
    ttok = train.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    # ONE training-corpus token scan: the (lang, token) count table is
    # model-sized and every other training statistic derives from it —
    # without the checkpoint, vocab/vsize/ctot/model each re-scan and
    # re-tokenize the corpus (14 scans at last audit)
    counts = ttok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    vocab = counts.select("token").distinct()
    vsize = vocab.count()
    cls = train.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).localCheckpoint(eager=True)  # one doc-level scan for priors + n_train
    n_train = sum(r["n_docs"] for r in cls.collect())  # |classes| rows
    ctot = counts.groupBy("lang").agg(F.sum("cnt").alias("tok_total"))
    micro = lambda c: F.floor(c * 1000000 + F.lit(0.5)).cast("bigint")  # noqa: E731
    model = (
        vocab.crossJoin(F.broadcast(cls.join(ctot, "lang")))
        .join(counts, ["lang", "token"], "left")
        .select(
            "token",
            "lang",
            micro(
                F.log(F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                - F.log((F.col("tok_total") + F.lit(vsize)).cast("double"))
            ).alias("lp_micro"),
        )
    )
    prior = cls.select(
        "lang",
        micro(
            F.log(F.col("n_docs").cast("double")) - F.log(F.lit(float(n_train)))
        ).alias("prior_micro"),
    )
    dcnt = (
        test.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tok_cnt"))
    )
    scores = (
        dcnt.join(F.broadcast(model), "token")
        .join(F.broadcast(prior), "lang")
        .groupBy("doc_id", "lang", "prior_micro")
        .agg(F.sum(F.col("tok_cnt") * F.col("lp_micro")).alias("ll_micro"))
        .select(
            "doc_id", "lang", (F.col("prior_micro") + F.col("ll_micro")).alias("score_micro")
        )
    )
    rk = W.partitionBy("doc_id").orderBy(F.col("score_micro").desc(), "lang")
    best = scores.withColumn("rk", F.row_number().over(rk)).filter(F.col("rk") == 1)
    return test.select("doc_id", F.col("lang").alias("lang_actual")).join(
        best, "doc_id", "left"
    ).select(
        "doc_id",
        "lang_actual",
        F.col("lang").alias("lang_pred"),
        (F.col("score_micro").cast("double") / 1000000).alias("score"),
        (F.col("lang") == F.col("lang_actual")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# ml_logistic_regression_gd
# ---------------------------------------------------------------------------

GD_ITERS = 8
GD_LR = 0.5
NANO = 1_000_000_000


def _logit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x1, x2, y): scaled quantity, scaled discount, returned-flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        (F.col("l_discount") * 10.0).alias("x2"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )


@register(
    "ml_logistic_regression_gd",
    tags=("ml", "iterative", "agg"),
)
def ml_logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary logistic regression (P[returnflag = 'R'] from scaled
    quantity and discount) by GD_ITERS steps of full-batch gradient
    descent. Each step is ONE distributed aggregate: per-row gradient
    contributions (σ(w·x) − y)·x_j are rounded to 1e-9 and summed as
    exact integers, so the training trajectory — and the final weights —
    are bit-identical under any partitioning (the same determinism
    discipline as ml_naive_bayes, applied per iteration). The weight
    update is driver-side float math on the 3-vector.

    Iterative ⇒ no SQL oracle (rows-only driver check); the exact NumPy
    replay — same rounding, same schedule — is pinned in tests/test_ml.py.

    Scale: GD_ITERS scans, each reducing to 4 integers + a count; the
    model never exceeds k doubles. Caching the feature projection
    (three doubles/row) across iterations is the standard refinement;
    at 100 TB the projected columns are what an executor cache holds."""
    feats = _logit_features(spark, sf_dir).cache()
    try:
        n = feats.count()
        if n == 0:
            return spark.createDataFrame([], "term string, value double")
        w = [0.0, 0.0, 0.0]  # bias, x1, x2
        for _ in range(GD_ITERS):
            z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("y")
            gnano = lambda c: F.sum(  # noqa: E731
                F.floor(c * NANO + F.lit(0.5)).cast("bigint")
            )
            g = feats.agg(
                gnano(err).alias("g0"),
                gnano(err * F.col("x1")).alias("g1"),
                gnano(err * F.col("x2")).alias("g2"),
            ).first()
            w = [
                w[j] - GD_LR * (g[f"g{j}"] / NANO) / n
                for j in range(3)
            ]
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        acc_row = feats.agg(
            F.sum(((z > 0).cast("int") == F.col("y")).cast("bigint")).alias("hits")
        ).first()
        rows = [
            ("w_bias", round(w[0], 9)),
            ("w_qty", round(w[1], 9)),
            ("w_disc", round(w[2], 9)),
            ("train_accuracy", round(acc_row["hits"] / n, 6)),
            ("n", float(n)),
        ]
        return spark.createDataFrame(rows, "term string, value double")
    finally:
        feats.unpersist()


# ---------------------------------------------------------------------------
# ml_ridge_normal_eq
# ---------------------------------------------------------------------------

RIDGE_LAMBDA = 1.0
_EVENT_TYPES = ("click", "error", "purchase", "signup")  # "view" = baseline


def _ridge_xy(ev: DataFrame) -> DataFrame:
    """Design matrix columns: bias, hour/24, dow/7, one-hot event types."""
    cols = [
        F.lit(1.0).alias("b"),
        (F.hour("ts") / 24.0).alias("f_hour"),
        (F.dayofweek("ts") / 7.0).alias("f_dow"),
    ] + [
        (F.col("event_type") == t).cast("double").alias(f"f_{t}") for t in _EVENT_TYPES
    ]
    return ev.select(*cols, F.col("value").alias("y"))


@register(
    "ml_ridge_normal_eq",
    tags=("ml", "agg", "feature"),
)
def ml_ridge_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate ridge regression of event value on calendar + type
    features, solved by the normal equations: the cluster reduces the
    corpus to XᵀX (k×k) and Xᵀy (k) via per-Arrow-batch NumPy partials
    (the similarity/pca.py sufficient-statistics pattern), the driver
    solves (XᵀX + λI)w = Xᵀy, and the k-vector broadcasts back for one
    scoring pass (training RMSE). Rows-only driver check (linear solve
    is not SQL); NumPy-reference parity pinned in tests/test_ml.py.

    Scale: two corpus passes, each collecting O(k²) doubles per batch —
    nothing row-scale ever reaches the driver; no shuffle at all."""
    import numpy as np

    ev = load_table(spark, sf_dir, "events")
    xy = _ridge_xy(ev)
    feat_cols = [c for c in xy.columns if c != "y"]
    k = len(feat_cols)

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            x = pdf[feat_cols].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "xtx": [(x.T @ x).ravel().tolist()],
                    "xty": [(x.T @ y).tolist()],
                    "yty": [float(y @ y)],
                }
            )

    parts = xy.mapInPandas(
        _partials, "n long, xtx array<double>, xty array<double>, yty double"
    ).collect()
    if not parts:
        return spark.createDataFrame([], "term string, value double")
    n = sum(p["n"] for p in parts)
    xtx = np.sum([np.array(p["xtx"]).reshape(k, k) for p in parts], axis=0)
    xty = np.sum([np.array(p["xty"]) for p in parts], axis=0)
    yty = float(np.sum([p["yty"] for p in parts]))
    w = np.linalg.solve(xtx + RIDGE_LAMBDA * np.eye(k), xty)
    # training RMSE from the same sufficient statistics (no third pass):
    # ||y - Xw||² = yᵀy - 2wᵀXᵀy + wᵀXᵀXw
    sse = yty - 2.0 * float(w @ xty) + float(w @ xtx @ w)
    rmse = float(np.sqrt(max(sse, 0.0) / n))
    rows = [(f"w_{c}", round(float(v), 9)) for c, v in zip(feat_cols, w)]
    rows += [("train_rmse", round(rmse, 6)), ("n", float(n))]
    return spark.createDataFrame(rows, "term string, value double")


# ---------------------------------------------------------------------------
# ml_kfold_cv
# ---------------------------------------------------------------------------

KFOLDS = 5

_KFOLD_ORACLE = f"""
    WITH s AS (
        SELECT CAST(event_id % {KFOLDS} AS BIGINT) AS fold,
               CAST(extract(hour FROM ts) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events),
    pf AS (
        SELECT fold, CAST(count(*) AS HUGEINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM s GROUP BY fold),
    tot AS (
        SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
               SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
        FROM pf),
    tr AS (
        SELECT p.fold,
               t.n - p.n AS n, t.sx - p.sx AS sx, t.sy - p.sy AS sy,
               t.sxx - p.sxx AS sxx, t.sxy - p.sxy AS sxy,
               p.n AS tn, p.sx AS tsx, p.sy AS tsy, p.sxx AS tsxx,
               p.sxy AS tsxy, p.syy AS tsyy
        FROM pf p CROSS JOIN tot t),
    co AS (
        SELECT fold, n, tn, tsx, tsy, tsxx, tsxy, tsyy,
               CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 100
                   AS b,
               (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 100
                - CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 100
                  * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
               / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS a
        FROM tr)
    SELECT fold, CAST(n AS BIGINT) AS n_train, CAST(tn AS BIGINT) AS n_test,
           floor(b * 1000000 + 0.5) / 1000000 AS slope,
           floor(a * 1000000 + 0.5) / 1000000 AS intercept,
           floor(sqrt(greatest(
                     CAST(CAST(tsyy AS VARCHAR) AS DOUBLE) / 10000
                     - 2 * a * CAST(CAST(tsy AS VARCHAR) AS DOUBLE) / 100
                     - 2 * b * CAST(CAST(tsxy AS VARCHAR) AS DOUBLE) / 100
                     + CAST(CAST(tn AS VARCHAR) AS DOUBLE) * a * a
                     + 2 * a * b * CAST(CAST(tsx AS VARCHAR) AS DOUBLE)
                     + b * b * CAST(CAST(tsxx AS VARCHAR) AS DOUBLE), 0)
                     / CAST(CAST(tn AS VARCHAR) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS test_rmse
    FROM co
"""


@register(
    "ml_kfold_cv",
    oracle=_KFOLD_ORACLE,
    headline=True,
    tags=("ml", "stats", "agg"),
)
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the hour→value OLS, entirely inside
    the engine: ONE pass computes per-fold sufficient statistics, the
    train-side statistics for each fold are TOTAL − FOLD (exact integer
    subtraction — no second scan, no per-fold retraining pass), and the
    held-out RMSE expands ‖y − a − bx‖² algebraically over the fold's
    own statistics. The cross-validation loop that costs K corpus scans
    in a naive harness is K rows of integer algebra here.

    Floats: slope/intercept/RMSE are evaluated with the identical
    expression tree in both engines from the exact suffstats; outputs
    round at 1e-6. Scale: shuffle is K rows of seven integers; the
    1-row total broadcasts back (allowlisted scalar pattern)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        (F.col("event_id") % KFOLDS).cast("bigint").alias("fold"),
        F.hour("ts").cast("bigint").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    pf = s.groupBy("fold").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        # operand-first casts: DECIMAL(38,0) accumulators, not bigint
        # (Σy² wraps silently around 2e10 rows at cents scale otherwise)
        F.sum(F.col("x").cast(D38)).alias("sx"),
        F.sum(F.col("y").cast(D38)).alias("sy"),
        F.sum(F.col("x").cast(D38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(D38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(D38) * F.col("y")).alias("syy"),
    )
    # Materialize the K-row fold table so the corpus really is scanned
    # ONCE: without this, Catalyst prunes syy out of the total's branch,
    # the two suffstat subtrees stop being identical, exchange reuse is
    # lost, and the plan re-scans events for the 1-row total.
    pf = pf.localCheckpoint(eager=True)
    tot = pf.agg(
        *[F.sum(c).alias(c) for c in ("n", "sx", "sy", "sxx", "sxy", "syy")]
    )
    t = tot.select(*[F.col(c).alias(f"t_{c}") for c in tot.columns])
    tr = pf.crossJoin(F.broadcast(t)).select(
        "fold",
        (F.col("t_n") - F.col("n")).alias("trn"),
        (F.col("t_sx") - F.col("sx")).alias("trsx"),
        (F.col("t_sy") - F.col("sy")).alias("trsy"),
        (F.col("t_sxx") - F.col("sxx")).alias("trsxx"),
        (F.col("t_sxy") - F.col("sxy")).alias("trsxy"),
        F.col("n").alias("tn"),
        F.col("sx").alias("tsx"),
        F.col("sy").alias("tsy"),
        F.col("sxx").alias("tsxx"),
        F.col("sxy").alias("tsxy"),
        F.col("syy").alias("tsyy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    b = (
        (F.col("trn") * F.col("trsxy") - F.col("trsx") * F.col("trsy")).cast("double")
        / (F.col("trn") * F.col("trsxx") - F.col("trsx") * F.col("trsx")).cast("double")
        / 100
    )
    co = tr.select(
        "fold", "trn", "tn", "tsx", "tsy", "tsxx", "tsxy", "tsyy",
        b.alias("b"),
        ((dd("trsy") / 100 - b * dd("trsx")) / dd("trn")).alias("a"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    sse = (
        dd("tsyy") / 10000
        - 2 * F.col("a") * dd("tsy") / 100
        - 2 * F.col("b") * dd("tsxy") / 100
        + dd("tn") * F.col("a") * F.col("a")
        + 2 * F.col("a") * F.col("b") * dd("tsx")
        + F.col("b") * F.col("b") * dd("tsxx")
    )
    return co.select(
        "fold",
        F.col("trn").cast("bigint").alias("n_train"),
        F.col("tn").cast("bigint").alias("n_test"),
        r6(F.col("b")).alias("slope"),
        r6(F.col("a")).alias("intercept"),
        r6(F.sqrt(F.greatest(sse, F.lit(0.0)) / dd("tn"))).alias("test_rmse"),
    )


# ---------------------------------------------------------------------------
# ml_confusion_matrix
# ---------------------------------------------------------------------------

_CONFUSION_ORACLE = f"""
    WITH nb AS ({_NB_ORACLE}),
    per_actual AS (
        SELECT lang_actual AS lang,
               CAST(count(*) AS BIGINT) AS support,
               CAST(SUM(CASE WHEN lang_pred = lang_actual THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp
        FROM nb GROUP BY lang_actual),
    per_pred AS (
        SELECT lang_pred AS lang, CAST(count(*) AS BIGINT) AS predicted
        FROM nb WHERE lang_pred IS NOT NULL GROUP BY lang_pred)
    SELECT a.lang, a.support, a.tp,
           COALESCE(p.predicted, 0) - a.tp AS fp,
           a.support - a.tp AS fn,
           CASE WHEN COALESCE(p.predicted, 0) = 0 THEN NULL
                ELSE floor(CAST(a.tp AS DOUBLE) / p.predicted * 1000000 + 0.5)
                     / 1000000 END AS precision,
           floor(CAST(a.tp AS DOUBLE) / a.support * 1000000 + 0.5)
               / 1000000 AS recall,
           CASE WHEN COALESCE(p.predicted, 0) = 0 THEN NULL
                ELSE floor(2.0 * a.tp
                           / (p.predicted + a.support) * 1000000 + 0.5)
                     / 1000000 END AS f1
    FROM per_actual a LEFT JOIN per_pred p ON p.lang = a.lang
"""


@register(
    "ml_confusion_matrix",
    oracle=_CONFUSION_ORACLE,
    tags=("ml", "stats", "quality"),
)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class evaluation of the ml_naive_bayes held-out predictions:
    support, true/false positives, false negatives, precision, recall,
    and F1 (computed as 2·tp/(predicted+support) — the harmonic-mean
    identity that avoids compounding two rounded ratios). Classes with
    zero predictions get NULL precision/F1 rather than a fake 0. The
    whole evaluation is |classes|² integer algebra over the prediction
    frame — the standard model-eval closing step, in-engine.

    Scale: inherits ml_naive_bayes's shape; the confusion rollup adds
    two |classes|-row aggregates and one broadcast join."""
    # pinned once: per_actual and per_pred both consume the prediction
    # frame, and un-materialized each re-ran the whole NB train+predict
    # pipeline (4 docs scans, r11 plan sweep)
    nb = ml_naive_bayes(spark, sf_dir).localCheckpoint(eager=True)
    return _confusion_from(nb)


def _confusion_from(nb: DataFrame) -> DataFrame:
    """Confusion rollup over a (pre-materialized) prediction frame."""
    per_actual = nb.groupBy(F.col("lang_actual").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("support"),
        # coalesce: if every prediction for a class is NULL (all held-out
        # docs OOV) the sum of all-NULL indicators is NULL, but the
        # oracle's CASE-based count is 0 — match the ELSE 0 semantics
        F.coalesce(
            F.sum((F.col("lang_pred") == F.col("lang_actual")).cast("int")),
            F.lit(0),
        ).cast("bigint").alias("tp"),
    )
    per_pred = (
        nb.filter(F.col("lang_pred").isNotNull())
        .groupBy(F.col("lang_pred").alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("predicted"))
    )
    j = per_actual.join(F.broadcast(per_pred), "lang", "left")
    pred0 = F.coalesce(F.col("predicted"), F.lit(0))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return j.select(
        "lang",
        "support",
        "tp",
        (pred0 - F.col("tp")).alias("fp"),
        (F.col("support") - F.col("tp")).alias("fn"),
        F.when(pred0 == 0, F.lit(None).cast("double"))
        .otherwise(r6(F.col("tp").cast("double") / F.col("predicted")))
        .alias("precision"),
        r6(F.col("tp").cast("double") / F.col("support")).alias("recall"),
        F.when(pred0 == 0, F.lit(None).cast("double"))
        .otherwise(
            r6(2.0 * F.col("tp") / (F.col("predicted") + F.col("support")))
        )
        .alias("f1"),
    )


# ---------------------------------------------------------------------------
# ml_decision_stump
# ---------------------------------------------------------------------------

_STUMP_ORACLE = """
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
    f AS (
        SELECT 'quantity' AS feature, q AS v, y FROM s
        UNION ALL
        SELECT 'discount' AS feature, d AS v, y FROM s),
    pv AS (
        SELECT feature, v, CAST(count(*) AS HUGEINT) AS n,
               CAST(SUM(y) AS HUGEINT) AS n1
        FROM f GROUP BY feature, v),
    tot AS (
        SELECT feature, SUM(n) AS tn, SUM(n1) AS tn1
        FROM pv GROUP BY feature),
    cum AS (
        SELECT feature, v,
               SUM(n) OVER w AS nl, SUM(n1) OVER w AS nl1
        FROM pv
        WINDOW w AS (PARTITION BY feature ORDER BY v
                     ROWS UNBOUNDED PRECEDING)),
    g AS (
        SELECT c.feature, c.v AS threshold,
               c.nl, t.tn - c.nl AS nr,
               c.nl1, t.tn1 - c.nl1 AS nr1, t.tn AS tn
        FROM cum c JOIN tot t USING (feature)
        WHERE c.nl > 0 AND t.tn - c.nl > 0),
    gi AS (
        SELECT feature, threshold, nl, nr,
               CAST(floor((
                 (CAST(CAST(nl AS VARCHAR) AS DOUBLE)
                  - (CAST(CAST(nl1 * nl1 AS VARCHAR) AS DOUBLE)
                     + CAST(CAST((nl - nl1) * (nl - nl1) AS VARCHAR) AS DOUBLE))
                    / CAST(CAST(nl AS VARCHAR) AS DOUBLE))
                 + (CAST(CAST(nr AS VARCHAR) AS DOUBLE)
                    - (CAST(CAST(nr1 * nr1 AS VARCHAR) AS DOUBLE)
                       + CAST(CAST((nr - nr1) * (nr - nr1) AS VARCHAR) AS DOUBLE))
                      / CAST(CAST(nr AS VARCHAR) AS DOUBLE))
               ) / CAST(CAST(tn AS VARCHAR) AS DOUBLE) * 1000000000 + 0.5)
               AS BIGINT) AS gini_nano,
               CASE WHEN 2 * nl1 > nl THEN 1 ELSE 0 END AS pred_left,
               CASE WHEN 2 * nr1 > nr THEN 1 ELSE 0 END AS pred_right
        FROM g),
    rk AS (
        SELECT *, row_number() OVER (PARTITION BY feature
                                     ORDER BY gini_nano, threshold) AS r
        FROM gi)
    SELECT feature, CAST(threshold AS BIGINT) AS threshold,
           CAST(gini_nano AS DOUBLE) / 1000000000 AS gini,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           CAST(pred_left AS INT) AS pred_left,
           CAST(pred_right AS INT) AS pred_right
    FROM rk WHERE r = 1
"""


@register(
    "ml_decision_stump",
    oracle=_STUMP_ORACLE,
    tags=("ml", "agg", "window"),
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive best-split search for a depth-1 decision tree (the
    boosting/random-forest inner loop, in-engine): for each feature the
    per-value class counts collapse first, cumulative prefix sums give
    every threshold's left/right class totals in one window pass, and
    weighted Gini impurity picks the best threshold per feature
    (tie-break: lowest threshold). Gini is evaluated once in doubles
    from exact integer counts and rounded to 1e-9 BEFORE the argmin, so
    the chosen split is partition-invariant.

    Scale: the only data-scale stage is the (feature, value) count
    aggregate (map-side combined); the threshold scan runs on the
    distinct-value axis — bounded here (integer domains), quantile-
    binned first for continuous features at 100 TB (the standard
    histogram-split approximation, feat_quantile_bucketize)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("d"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    # one lineitem scan: explode each row into both feature branches
    # (the UNION form scans the fact table once per feature), then
    # materialize the <=|values| count table for the tot/cum branches
    f = s.select(
        F.explode(
            F.array(
                F.struct(F.lit("quantity").alias("feature"), F.col("q").alias("v")),
                F.struct(F.lit("discount").alias("feature"), F.col("d").alias("v")),
            )
        ).alias("fv"),
        "y",
    ).select(F.col("fv.feature").alias("feature"), F.col("fv.v").alias("v"), "y")
    pv = f.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum(F.col("y").cast(D38)).alias("n1"),
    ).localCheckpoint(eager=True)
    tot = pv.groupBy("feature").agg(
        F.sum("n").alias("tn"), F.sum("n1").alias("tn1")
    )
    wc = W.partitionBy("feature").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = pv.select(
        "feature",
        "v",
        F.sum("n").over(wc).alias("nl"),
        F.sum("n1").over(wc).alias("nl1"),
    )
    g = (
        cum.join(F.broadcast(tot), "feature")
        .select(
            "feature",
            F.col("v").alias("threshold"),
            "nl",
            (F.col("tn") - F.col("nl")).alias("nr"),
            "nl1",
            (F.col("tn1") - F.col("nl1")).alias("nr1"),
            "tn",
        )
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    nl0 = F.col("nl") - F.col("nl1")
    nr0 = F.col("nr") - F.col("nr1")
    imp = (
        dd("nl")
        - ((F.col("nl1") * F.col("nl1")).cast("double") + (nl0 * nl0).cast("double"))
        / dd("nl")
    ) + (
        dd("nr")
        - ((F.col("nr1") * F.col("nr1")).cast("double") + (nr0 * nr0).cast("double"))
        / dd("nr")
    )
    gi = g.select(
        "feature",
        "threshold",
        "nl",
        "nr",
        F.floor(imp / dd("tn") * 1000000000 + F.lit(0.5)).cast("bigint").alias(
            "gini_nano"
        ),
        (2 * F.col("nl1") > F.col("nl")).cast("int").alias("pred_left"),
        (2 * F.col("nr1") > F.col("nr")).cast("int").alias("pred_right"),
    )
    rk = W.partitionBy("feature").orderBy("gini_nano", "threshold")
    return (
        gi.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") == 1)
        .select(
            "feature",
            F.col("threshold").cast("bigint").alias("threshold"),
            (F.col("gini_nano").cast("double") / 1000000000).alias("gini"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            "pred_left",
            "pred_right",
        )
    )


# ---------------------------------------------------------------------------
# ml_auc_roc
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
    WITH s AS (
        SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS score,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
    v AS (
        SELECT score, CAST(SUM(y) AS HUGEINT) AS cpos,
               CAST(SUM(1 - y) AS HUGEINT) AS cneg
        FROM s GROUP BY score),
    w AS (
        SELECT cpos, cneg, cpos + cneg AS t,
               COALESCE(SUM(cpos + cneg) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS before
        FROM v),
    agg AS (
        SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg,
               SUM(cpos * (2 * before + t + 1)) AS r2pos
        FROM w)
    SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           floor((CAST(CAST(r2pos - npos * (npos + 1) AS VARCHAR) AS DOUBLE) / 2)
                 / CAST(CAST(npos * nneg AS VARCHAR) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS auc
    FROM agg
"""


@register(
    "ml_auc_roc",
    oracle=_AUC_ORACLE,
    tags=("ml", "stats", "quality"),
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the discount score against the returned-flag label via
    the rank-sum identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with midrank
    tie handling — the ranking-quality half of the model-eval pair
    (ml_confusion_matrix is the classification half). Same exact-integer
    2·R machinery as stats_mann_whitney (AUC IS the scaled U statistic):
    scores collapse to the distinct-value axis, the pooled prefix count
    rides the ranks.py two-level prefix sum, and the single divide
    happens at the end (1e-6 round).

    Scale: one map-side-combined aggregate to |distinct scores| rows,
    one range-shuffled prefix sum, a 1-row final."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("score"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    v = s.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("cpos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("cneg"),
    ).withColumn("t", F.col("cpos") + F.col("cneg"))
    v = v.localCheckpoint(eager=True)  # one lineitem scan
    w = with_prefix_sum(v, [F.asc("score")], ["t"], suffix="_before",
                        materialize=False)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = w.agg(
        F.sum("cpos").cast(D38).alias("npos"),
        F.sum("cneg").cast(D38).alias("nneg"),
        F.sum(
            d38(F.col("cpos"))
            * (F.lit(2) * d38(F.col("t_before")) + d38(F.col("t")) + F.lit(1))
        ).alias("r2pos"),
    )
    npos = F.col("npos")
    auc = (
        (F.col("r2pos") - npos * (npos + F.lit(1))).cast("double") / 2
    ) / (npos * F.col("nneg")).cast("double")
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return agg.select(
        npos.cast("bigint").alias("n_pos"),
        F.col("nneg").cast("bigint").alias("n_neg"),
        r6(auc).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ml_pr_curve
# ---------------------------------------------------------------------------

_PR_CURVE_ORACLE = """
    WITH s AS (
        SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS score,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
    v AS (
        SELECT score, CAST(SUM(y) AS HUGEINT) AS cpos,
               CAST(SUM(1 - y) AS HUGEINT) AS cneg
        FROM s GROUP BY score),
    w AS (
        SELECT score, cpos, cneg,
               COALESCE(SUM(cpos) OVER (ORDER BY score DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + cpos AS cum_pos,
               COALESCE(SUM(cpos + cneg) OVER (ORDER BY score DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + cpos + cneg AS cum_n
        FROM v),
    tot AS (SELECT SUM(cpos) AS npos FROM v)
    SELECT w.score AS threshold,
           CAST(w.cum_pos AS BIGINT) AS tp,
           CAST(w.cum_n - w.cum_pos AS BIGINT) AS fp,
           floor(CAST(CAST(w.cum_pos AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(w.cum_n AS VARCHAR) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS prec,
           floor(CAST(CAST(w.cum_pos AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(t.npos AS VARCHAR) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS recall
    FROM w CROSS JOIN tot t
"""


@register(
    "ml_pr_curve",
    oracle=_PR_CURVE_ORACLE,
    tags=("ml", "stats", "quality"),
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve of the discount score against the
    returned-flag label: one (threshold, tp, fp, prec, recall) row per
    distinct score, scanning thresholds from the highest score down —
    the ranking-eval companion to ml_auc_roc (PR is the view that
    matters under class imbalance, where ROC flatters). tp/fp at each
    threshold are EXACT integers from the descending prefix sum over
    the distinct-score axis; precision and recall are single divides of
    those ints, 1e-6 floor-rounded with the identical expression tree
    in both engines.

    Scale: same shape as ml_auc_roc — one map-side-combined aggregate
    to |distinct scores| rows, one range-shuffled prefix sum
    (ranks.py two-level construction, no single-partition sort of the
    event stream), a 1-row total broadcast back."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("score"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    v = s.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("cpos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("cneg"),
    ).withColumn("t", F.col("cpos") + F.col("cneg"))
    v = v.localCheckpoint(eager=True)  # one lineitem scan; two consumers
    w = with_prefix_sum(
        v, [F.desc("score")], ["cpos", "t"], suffix="_b", materialize=False
    )
    tot = v.agg(F.sum("cpos").alias("npos"))
    cum_pos = F.col("cpos_b") + F.col("cpos")
    cum_n = F.col("t_b") + F.col("t")
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            cum_pos.cast("bigint").alias("tp"),
            (cum_n - cum_pos).cast("bigint").alias("fp"),
            r6(cum_pos.cast("double") / cum_n.cast("double")).alias("prec"),
            r6(cum_pos.cast("double") / F.col("npos").cast("double")).alias(
                "recall"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ml_eval_report
# ---------------------------------------------------------------------------

_EVAL_REPORT_ORACLE = f"""
    WITH nb AS ({_NB_ORACLE}),
    cm AS ({_CONFUSION_ORACLE}),
    auc AS ({_AUC_ORACLE})
    SELECT 'nb_accuracy' AS metric,
           floor(CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS value
    FROM nb
    UNION ALL
    SELECT 'nb_macro_f1' AS metric,
           floor(AVG(f1) * 1000000 + 0.5) / 1000000 AS value
    FROM cm
    UNION ALL
    SELECT 'auc_discount_returnflag' AS metric, auc AS value FROM auc
"""


@register(
    "ml_eval_report",
    oracle=_EVAL_REPORT_ORACLE,
    tags=("ml", "quality", "pipeline"),
)
def ml_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-eval scorecard as one query: held-out naive-Bayes
    accuracy, macro-averaged F1 (classes with no predictions excluded,
    matching AVG's null semantics in both engines), and the ROC AUC of
    the discount→returnflag ranking — the composed (metric, value)
    table a training pipeline logs per run. Each leg inherits its
    component's exactness discipline; the composition adds only 1-row
    aggregates and a 3-row union."""
    # ONE NB train+predict serves both the accuracy leg and the
    # confusion leg (each invoked the full pipeline separately before —
    # 6 docs scans per report, r11 plan sweep)
    nb = ml_naive_bayes(spark, sf_dir).localCheckpoint(eager=True)
    cm = _confusion_from(nb)
    auc = ml_auc_roc(spark, sf_dir)
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    acc = nb.agg(
        r6(
            # coalesce for the all-predictions-NULL corner (every held-out
            # doc OOV): sum of all-NULL indicators is NULL, oracle says 0
            F.coalesce(F.sum(F.col("correct").cast("int")), F.lit(0))
            .cast("double") / F.count(F.lit(1))
        ).alias("value")
    ).select(F.lit("nb_accuracy").alias("metric"), "value")
    macro = cm.agg(r6(F.avg("f1")).alias("value")).select(
        F.lit("nb_macro_f1").alias("metric"), "value"
    )
    auc_row = auc.select(
        F.lit("auc_discount_returnflag").alias("metric"), F.col("auc").alias("value")
    )
    return acc.unionAll(macro).unionAll(auc_row)


# ---------------------------------------------------------------------------
# ml_knn_classifier
# ---------------------------------------------------------------------------

KNN_CLF_K = 5
# pinned held-out set, matching sim_knn_join's bounded query sample
# (similarity/queries.py: EVAL_QUERY_ID_BOUND): the TRAIN side scales
# with the corpus (it is the model data); only the probe set is capped
KNN_CLF_TEST_PRED = f"vec_id % 50 = 0 AND vec_id < {EVAL_QUERY_ID_BOUND}"

_KNN_CLF_DOT = (
    "list_aggregate(list_transform(list_zip(a.embedding, q.qe),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_KNN_CLF_NORM_A = (
    "sqrt(list_aggregate(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)
_KNN_CLF_NORM_Q = (
    "sqrt(list_aggregate(list_transform(q.qe,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)

_KNN_CLF_ORACLE = f"""
    WITH q AS (
        SELECT vec_id AS qid, label AS label_actual, embedding AS qe
        FROM embeddings WHERE {KNN_CLF_TEST_PRED}),
    sims AS (
        SELECT q.qid, q.label_actual, a.label,
               round({_KNN_CLF_DOT} / ({_KNN_CLF_NORM_A} * {_KNN_CLF_NORM_Q}), 9)
                   AS cs,
               a.vec_id
        FROM embeddings a, q
        WHERE NOT ({KNN_CLF_TEST_PRED})),
    topk AS (
        SELECT qid, label_actual, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cs DESC, vec_id) AS rk
        FROM sims),
    votes AS (
        SELECT qid, label_actual, label, count(*) AS n
        FROM topk WHERE rk <= {KNN_CLF_K}
        GROUP BY qid, label_actual, label),
    win AS (
        SELECT qid, label_actual, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY n DESC, label) AS vr
        FROM votes)
    SELECT qid AS vec_id, CAST(label_actual AS INT) AS label_actual,
           CAST(label AS INT) AS label_pred,
           (label = label_actual) AS correct
    FROM win WHERE vr = 1
"""


@register(
    "ml_knn_classifier",
    oracle=_KNN_CLF_ORACLE,
    tags=("ml", "similarity", "quality"),
)
def ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification over the embeddings: each held-out
    vector (1-in-50) takes the majority label of its KNN_CLF_K nearest
    training vectors by cosine (rank ties → lowest vec_id, vote ties →
    lowest label) — the lazy-learner baseline every embedding-quality
    evaluation starts with, and the direct measure of whether the
    embedding space clusters by label at all.

    Scale: the sim_knn_join shape — the bounded held-out set broadcasts,
    the training corpus is scanned once and never shuffled; the top-k
    rank and the vote both run per-query on k-bounded rows. Similarity
    rounding at 1e-9 + total tie-breaks keep the votes engine-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    from cdc_export_system_spark.similarity.queries import cosine

    q = emb.filter(F.expr(KNN_CLF_TEST_PRED)).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("label_actual"),
        F.col("embedding").alias("qe"),
    )
    train = emb.filter(~F.expr(KNN_CLF_TEST_PRED))
    sims = train.join(F.broadcast(q), F.lit(True)).select(
        "qid",
        "label_actual",
        "label",
        F.round(cosine(F.col("embedding"), F.col("qe")), 9).alias("cs"),
        "vec_id",
    )
    rk = W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
    topk = sims.withColumn("rk", F.row_number().over(rk)).filter(
        F.col("rk") <= KNN_CLF_K
    )
    votes = topk.groupBy("qid", "label_actual", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    vr = W.partitionBy("qid").orderBy(F.col("n").desc(), "label")
    return (
        votes.withColumn("vr", F.row_number().over(vr))
        .filter(F.col("vr") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("label_actual").cast("int").alias("label_actual"),
            F.col("label").cast("int").alias("label_pred"),
            (F.col("label") == F.col("label_actual")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# ml_ridge_exact
# ---------------------------------------------------------------------------

RIDGE_EXACT_LAMBDA = 1  # integer λ on the raw (bias, hour, dow) Gram diagonal

_RIDGE_EXACT_ORACLE = f"""
    WITH s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               SUM(CAST(h AS HUGEINT)) AS sh, SUM(CAST(d AS HUGEINT)) AS sd,
               SUM(CAST(h AS HUGEINT) * h) AS shh,
               SUM(CAST(h AS HUGEINT) * d) AS shd,
               SUM(CAST(d AS HUGEINT) * d) AS sdd,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(h AS HUGEINT) * y) AS shy,
               SUM(CAST(d AS HUGEINT) * y) AS sdy,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM (SELECT CAST(extract(hour FROM ts) AS BIGINT) AS h,
                     -- +1: DuckDB dayofweek is 0-based; Spark's is 1-based
                     CAST(dayofweek(ts) + 1 AS BIGINT) AS d,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events)
        HAVING count(*) >= 1),
    m AS (
        SELECT n, sh, sd, shh, shd, sdd, sy, shy, sdy, syy,
               n + {RIDGE_EXACT_LAMBDA} AS a11, sh AS a12, sd AS a13,
               shh + {RIDGE_EXACT_LAMBDA} AS a22, shd AS a23,
               sdd + {RIDGE_EXACT_LAMBDA} AS a33
        FROM s),
    dets AS (
        SELECT m.*,
               a11 * (a22 * a33 - a23 * a23)
               - a12 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * a23 - a22 * a13) AS det,
               sy * (a22 * a33 - a23 * a23)
               - a12 * (shy * a33 - a23 * sdy)
               + a13 * (shy * a23 - a22 * sdy) AS det1,
               a11 * (shy * a33 - a23 * sdy)
               - sy * (a12 * a33 - a23 * a13)
               + a13 * (a12 * sdy - shy * a13) AS det2,
               a11 * (a22 * sdy - shy * a23)
               - a12 * (a12 * sdy - shy * a13)
               + sy * (a12 * a23 - a22 * a13) AS det3
        FROM m),
    -- HUGEINT -> DOUBLE through VARCHAR: correctly-rounded decimal parse,
    -- matching Spark's Decimal.toDouble (raw stats are < 2^53, so those
    -- cast directly)
    w AS (
        SELECT CAST(n AS DOUBLE) AS n_d,
               CAST(CAST(det1 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS w1,
               CAST(CAST(det2 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS w2,
               CAST(CAST(det3 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS w3,
               CAST(sh AS DOUBLE) AS sh_d, CAST(sd AS DOUBLE) AS sd_d,
               CAST(shh AS DOUBLE) AS shh_d, CAST(shd AS DOUBLE) AS shd_d,
               CAST(sdd AS DOUBLE) AS sdd_d, CAST(sy AS DOUBLE) AS sy_d,
               CAST(shy AS DOUBLE) AS shy_d, CAST(sdy AS DOUBLE) AS sdy_d,
               CAST(syy AS DOUBLE) AS syy_d
        FROM dets),
    fin AS (
        SELECT n_d, w1, w2, w3,
               syy_d - 2.0 * (w1 * sy_d + w2 * shy_d + w3 * sdy_d)
               + (w1 * (w1 * n_d + w2 * sh_d + w3 * sd_d)
                  + w2 * (w1 * sh_d + w2 * shh_d + w3 * shd_d)
                  + w3 * (w1 * sd_d + w2 * shd_d + w3 * sdd_d)) AS sse
        FROM w)
    SELECT 'n_rows' AS term, n_d AS value FROM fin
    UNION ALL SELECT 'train_rmse',
        floor(sqrt(greatest(sse, 0.0) / n_d) / 100 * 1000000 + 0.5) / 1000000
        FROM fin
    UNION ALL SELECT 'w_bias', floor(w1 / 100 * 1000000 + 0.5) / 1000000 FROM fin
    UNION ALL SELECT 'w_dow', floor(w3 / 100 * 1000000 + 0.5) / 1000000 FROM fin
    UNION ALL SELECT 'w_hour', floor(w2 / 100 * 1000000 + 0.5) / 1000000 FROM fin
"""


@register(
    "ml_ridge_exact",
    oracle=_RIDGE_EXACT_ORACLE,
    tags=("ml", "agg"),
)
def ml_ridge_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression of event value (cents) on (bias, hour, dow),
    solved EXACTLY in-plan — the oracle-checkable sibling of
    ml_ridge_normal_eq: the corpus reduces to the ten Gram/moment sums
    as DECIMAL(38,0) integers (one map-side-combined aggregate, exact
    and order-independent), the 3x3 system (XtX + lambda*I) w = Xty is
    solved by Cramer's rule IN INTEGER ARITHMETIC (determinants are
    exact decimal products; magnitudes <= ~1e24 at sf0.1, 1e14 of
    headroom to the 38-digit cap), and only the final three divides and
    the RMSE readout run in double — written as the identical
    expression tree in both engines, then 1e-6-rounded. No driver-side
    solve, no NumPy: the whole model is one Catalyst plan.

    Scale: one pass, |task| x 10-integer partials, a 1-row reduce —
    the same sufficient-statistic shape as ml_linear_regression
    (supervised.py:82); nothing row-scale leaves the executors."""
    L = RIDGE_EXACT_LAMBDA
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.hour("ts").cast("bigint").alias("h"),
        F.dayofweek("ts").cast("bigint").alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    a = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("h").cast(D38)).alias("sh"),
        F.sum(F.col("d").cast(D38)).alias("sd"),
        F.sum(F.col("h").cast(D38) * F.col("h")).alias("shh"),
        F.sum(F.col("h").cast(D38) * F.col("d")).alias("shd"),
        F.sum(F.col("d").cast(D38) * F.col("d")).alias("sdd"),
        F.sum(F.col("y").cast(D38)).alias("sy"),
        F.sum(F.col("h").cast(D38) * F.col("y")).alias("shy"),
        F.sum(F.col("d").cast(D38) * F.col("y")).alias("sdy"),
        F.sum(F.col("y").cast(D38) * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 1)
    lam = F.lit(L).cast(D38)
    m = a.select(
        "*",
        (F.col("n").cast(D38) + lam).alias("a11"),
        F.col("sh").alias("a12"),
        F.col("sd").alias("a13"),
        (F.col("shh") + lam).alias("a22"),
        F.col("shd").alias("a23"),
        (F.col("sdd") + lam).alias("a33"),
    )
    c = F.col
    dets = m.select(
        "*",
        (
            c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
            - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
            + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
        ).alias("det"),
        (
            c("sy") * (c("a22") * c("a33") - c("a23") * c("a23"))
            - c("a12") * (c("shy") * c("a33") - c("a23") * c("sdy"))
            + c("a13") * (c("shy") * c("a23") - c("a22") * c("sdy"))
        ).alias("det1"),
        (
            c("a11") * (c("shy") * c("a33") - c("a23") * c("sdy"))
            - c("sy") * (c("a12") * c("a33") - c("a23") * c("a13"))
            + c("a13") * (c("a12") * c("sdy") - c("shy") * c("a13"))
        ).alias("det2"),
        (
            c("a11") * (c("a22") * c("sdy") - c("shy") * c("a23"))
            - c("a12") * (c("a12") * c("sdy") - c("shy") * c("a13"))
            + c("sy") * (c("a12") * c("a23") - c("a22") * c("a13"))
        ).alias("det3"),
    )
    dd = lambda name: c(name).cast("double")  # noqa: E731  (correctly rounded)
    w = dets.select(
        dd("n").alias("n_d"),
        (dd("det1") / dd("det")).alias("w1"),
        (dd("det2") / dd("det")).alias("w2"),
        (dd("det3") / dd("det")).alias("w3"),
        dd("sh").alias("sh_d"),
        dd("sd").alias("sd_d"),
        dd("shh").alias("shh_d"),
        dd("shd").alias("shd_d"),
        dd("sdd").alias("sdd_d"),
        dd("sy").alias("sy_d"),
        dd("shy").alias("shy_d"),
        dd("sdy").alias("sdy_d"),
        dd("syy").alias("syy_d"),
    )
    fin = w.select(
        "n_d",
        "w1",
        "w2",
        "w3",
        (
            c("syy_d")
            - F.lit(2.0)
            * (c("w1") * c("sy_d") + c("w2") * c("shy_d") + c("w3") * c("sdy_d"))
            + (
                c("w1")
                * (c("w1") * c("n_d") + c("w2") * c("sh_d") + c("w3") * c("sd_d"))
                + c("w2")
                * (
                    c("w1") * c("sh_d")
                    + c("w2") * c("shh_d")
                    + c("w3") * c("shd_d")
                )
                + c("w3")
                * (
                    c("w1") * c("sd_d")
                    + c("w2") * c("shd_d")
                    + c("w3") * c("sdd_d")
                )
            )
        ).alias("sse"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    row = fin.select(
        c("n_d").alias("n_rows"),
        r6(
            F.sqrt(F.greatest(c("sse"), F.lit(0.0)) / c("n_d")) / 100
        ).alias("train_rmse"),
        r6(c("w1") / 100).alias("w_bias"),
        r6(c("w3") / 100).alias("w_dow"),
        r6(c("w2") / 100).alias("w_hour"),
    )
    return row.selectExpr(
        "stack(5, 'n_rows', n_rows, 'train_rmse', train_rmse,"
        " 'w_bias', w_bias, 'w_dow', w_dow, 'w_hour', w_hour)"
        " AS (term, value)"
    )


# ---------------------------------------------------------------------------
# ml_logistic_exact
# ---------------------------------------------------------------------------

LOGR_S = 1_000_000  # fixed-point scale for weights / sigmoid
LOGR_ITERS = 3
LOGR_LR_INV = 10  # step = gradient div (n * LOGR_LR_INV)


def _logr_sig(z: str) -> str:
    """Rational 'fast sigmoid' in S-units: S/2 + z·S div (2(S+|z|)) —
    exact integer arithmetic, truncating division in both engines."""
    return (
        f"{LOGR_S // 2} + ({z} * {LOGR_S}) // (2 * ({LOGR_S} + abs({z})))"
    )


def _logr_oracle(iters: int = LOGR_ITERS) -> str:
    grads = []
    prev = "w0"
    for t in range(1, iters + 1):
        sig = _logr_sig("z")
        grads.append(f"""
        g{t} AS (
            SELECT SUM(r) AS gb, SUM(h * r) AS gh, SUM(d * r) AS gd
            FROM (SELECT h, d, ({sig}) - y * {LOGR_S} AS r
                  FROM (SELECT h, d, y, wb + wh * h + wd * d AS z
                        FROM s CROSS JOIN {prev}))),
        w{t} AS (
            SELECT p.wb - gb // (n * {LOGR_LR_INV}) AS wb,
                   p.wh - gh // (n * {LOGR_LR_INV}) AS wh,
                   p.wd - gd // (n * {LOGR_LR_INV}) AS wd
            FROM g{t} CROSS JOIN nv CROSS JOIN {prev} p)""")
        prev = f"w{t}"
    return f"""
        WITH s AS MATERIALIZED (
            SELECT CAST(extract(hour FROM ts) AS HUGEINT) AS h,
                   CAST(dayofweek(ts) + 1 AS HUGEINT) AS d,
                   CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS HUGEINT) AS y
            FROM events),
        nv AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM s HAVING count(*) >= 1),
        w0 AS (SELECT CAST(0 AS HUGEINT) AS wb, CAST(0 AS HUGEINT) AS wh,
                      CAST(0 AS HUGEINT) AS wd),
        {", ".join(grads)},
        acc AS (
            SELECT SUM(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END) AS ok
            FROM (SELECT y, wb + wh * h + wd * d AS z
                  FROM s CROSS JOIN {prev})),
        fin AS (SELECT CAST(n AS DOUBLE) AS n_d,
                       CAST(wb AS DOUBLE) AS wb_d, CAST(wh AS DOUBLE) AS wh_d,
                       CAST(wd AS DOUBLE) AS wd_d, CAST(ok AS DOUBLE) AS ok_d
                FROM {prev} CROSS JOIN nv CROSS JOIN acc)
        SELECT 'accuracy' AS term,
               floor(ok_d / n_d * 1000000 + 0.5) / 1000000 AS value FROM fin
        UNION ALL SELECT 'n_rows', n_d FROM fin
        UNION ALL SELECT 'w_bias', wb_d / 1000000 FROM fin
        UNION ALL SELECT 'w_dow', wd_d / 1000000 FROM fin
        UNION ALL SELECT 'w_hour', wh_d / 1000000 FROM fin
    """


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Python's // floors,
    but Spark `div` and DuckDB `//` truncate; match them."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@register(
    "ml_logistic_exact",
    oracle=_logr_oracle(),
    tags=("ml", "agg", "iterative"),
)
def ml_logistic_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-style classifier (is this a 'purchase' event?) trained
    by EXACT fixed-point gradient descent — the oracle-checkable sibling
    of ml_logistic_regression_gd: weights live in 1e-6 integer units,
    the activation is the RATIONAL fast sigmoid σ̃(z) = 1/2 +
    z/(2(1+|z|)) (Elliott 1993's sigmoid-shaped rational — no exp, so
    no engine-specific libm anywhere), and each of the LOGR_ITERS
    rounds is one aggregate of integer residuals followed by the
    truncating-division step w ← w − g div (n·10). Every intermediate
    is an exact integer, so the trained weights and the training
    accuracy readout are bit-identical across engines and
    partitionings.

    Scale: per iteration ONE scan with map-side-combined 3-integer
    gradient partials (the projected (h, d, y) table is checkpointed
    once); the model is 3 integers on the driver between rounds — the
    same topology as ml_logistic_regression_gd. Gradient magnitudes are
    ≤ 23·S·n, riding DECIMAL(38,0)/HUGEINT headroom to ~1e25 rows."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.hour("ts").cast("bigint").alias("h"),
        F.dayofweek("ts").cast("bigint").alias("d"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)
    n = s.count()
    if n == 0:
        return spark.createDataFrame([], "term string, value double")
    wb = wh = wd = 0
    S = LOGR_S
    for _ in range(LOGR_ITERS):
        sig = F.lit(S // 2) + F.expr(
            f"(({wb} + {wh} * h + {wd} * d) * {S})"
            f" div (2 * ({S} + abs({wb} + {wh} * h + {wd} * d)))"
        )
        r = (sig - F.col("y") * S).cast(D38)
        row = s.agg(
            F.sum(r).alias("gb"),
            F.sum(F.col("h") * r).alias("gh"),
            F.sum(F.col("d") * r).alias("gd"),
        ).first()
        wb -= _tdiv(int(row["gb"] or 0), n * LOGR_LR_INV)
        wh -= _tdiv(int(row["gh"] or 0), n * LOGR_LR_INV)
        wd -= _tdiv(int(row["gd"] or 0), n * LOGR_LR_INV)
    z = F.lit(wb) + F.lit(wh) * F.col("h") + F.lit(wd) * F.col("d")
    ok = int(
        s.agg(
            F.sum(((z > 0) == (F.col("y") == 1)).cast("bigint")).alias("ok")
        ).first()["ok"]
        or 0
    )
    import math

    r6v = lambda v: math.floor(v * 1000000 + 0.5) / 1000000  # noqa: E731
    rows = [
        ("accuracy", r6v(float(ok) / float(n))),
        ("n_rows", float(n)),
        ("w_bias", float(wb) / 1000000),
        ("w_dow", float(wd) / 1000000),
        ("w_hour", float(wh) / 1000000),
    ]
    return spark.createDataFrame(rows, "term string, value double")


# ---------------------------------------------------------------------------
# ml_calibration_table
# ---------------------------------------------------------------------------


@register(
    "ml_calibration_table",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * 10000
                       AS pred_micro,
                   CAST(l_returnflag = 'R' AS BIGINT) AS y
            FROM lineitem),
        g AS (
            SELECT pred_micro, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM b GROUP BY pred_micro),
        t AS (
            SELECT pred_micro, n, n_pos,
                   CAST((CAST(n_pos AS HUGEINT) * 1000000) // n AS BIGINT)
                       AS rate_micro,
                   (pred_micro - (CAST(n_pos AS HUGEINT) * 1000000) // n)
                   * (pred_micro - (CAST(n_pos AS HUGEINT) * 1000000) // n)
                   * CAST(n AS HUGEINT) AS term
            FROM g)
        SELECT pred_micro, n, n_pos, rate_micro,
               CAST(term // 1000000000000000000 AS BIGINT) AS reliability_hi,
               CAST(term % 1000000000000000000 AS BIGINT) AS reliability_lo
        FROM t
    """,
    tags=("ml", "stats", "agg"),
)
def ml_calibration_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION (reliability) table for a probabilistic score — is a
    predicted 8% actually an 8%? The discount score (predicting return
    probability, as in ml_auc_roc) is binned by its distinct predicted
    values; each bin reports its size, empirical positive rate, and the
    n*(pred - rate)^2 reliability term whose sum over bins is the
    reliability component of the Brier decomposition (Murphy 1973).
    Rates and terms are floored micro-int arithmetic — exact integers,
    partition-invariant, no doubles anywhere in the output.

    The volume-scaled term is computed in DECIMAL(38,0) (int64 dies at
    ~9e6 rows per bin) but emitted as a radix-10^18 hi/lo BIGINT pair
    (`term = reliability_hi * 10^18 + reliability_lo`): DECIMAL in a
    driver-visible schema hashes differently across engines (Spark
    Decimal vs DuckDB HUGEINT canonicalization), so final schemas are
    integer/double/string only — pinned registry-wide by
    tests/test_plan_quality.py's no-decimal-final-schema lint.

    Scale: ONE map-side-combined aggregate to the |distinct scores|
    axis; everything after is per-bin integer arithmetic. With a
    continuous score, the same plan runs on floor(score * B) buckets —
    the binning is the cardinality reducer."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            (
                F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint")
                * 10_000
            ).alias("pred_micro"),
            (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
        )
        .groupBy("pred_micro")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
    )
    rate = F.expr("(cast(n_pos as decimal(38,0)) * 1000000) div n")
    t = g.select(
        "pred_micro",
        "n",
        "n_pos",
        rate.alias("rate_micro"),
        # DECIMAL(38,0) term (oracle mirrors): diff^2 <= 1e12 already,
        # but * n is volume-scaled — int64 dies at ~9e6 rows per bin.
        # Internal only: the final schema re-emits it as hi/lo BIGINTs.
        (
            (F.col("pred_micro") - rate).cast("decimal(38,0)")
            * (F.col("pred_micro") - rate)
            * F.col("n")
        ).alias("term"),
    )
    return t.select(
        "pred_micro",
        "n",
        "n_pos",
        "rate_micro",
        # hi fits bigint up to term ~ 9.2e36; lo < 10^18 by construction
        F.expr("term div 1000000000000000000").alias("reliability_hi"),
        F.expr("cast(term % 1000000000000000000 as bigint)").alias(
            "reliability_lo"
        ),
    )


# ---------------------------------------------------------------------------
# ml_uplift_qini
# ---------------------------------------------------------------------------


@register(
    "ml_uplift_qini",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 = 0 AS BIGINT) AS t,
                   CAST(max(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS score
            FROM events GROUP BY user_id),
        ax AS (
            SELECT score,
                   CAST(SUM(t) AS BIGINT) AS ct,
                   CAST(SUM(1 - t) AS BIGINT) AS cc,
                   CAST(SUM(t * y) AS BIGINT) AS yt,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS yc
            FROM u GROUP BY score),
        c AS (
            SELECT score,
                   SUM(ct) OVER w AS cum_t, SUM(cc) OVER w AS cum_c,
                   SUM(yt) OVER w AS cum_yt, SUM(yc) OVER w AS cum_yc
            FROM ax WINDOW w AS (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT score, CAST(cum_t + cum_c AS BIGINT) AS cum_n,
               CAST(cum_yt AS BIGINT) AS cum_resp_treat,
               CAST(cum_yc AS BIGINT) AS cum_resp_ctrl,
               CAST(((CAST(cum_yt AS HUGEINT) * cum_c
                      - CAST(cum_yc AS HUGEINT) * cum_t) * 1000000) // cum_c
                    AS BIGINT) AS qini_micro
        FROM c WHERE cum_c > 0
    """,
    tags=("ml", "stats", "analytics"),
)
def ml_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPLIFT-MODEL evaluation: the QINI curve (Radcliffe 2007) — at
    each targeting depth (descending score = click count, the
    propensity proxy), how many extra conversions did treating that
    prefix cause versus the control baseline scaled to the same size?
    qini(k) = Y_t(k) - Y_c(k) * N_t(k)/N_c(k), evaluated at every
    distinct score so no arbitrary decile binning and no
    order-dependent ntile over ties. All counts are exact integers off
    one descending prefix sum over the score axis; the ratio is
    multiply-before-divide micro-units (points with an empty control
    prefix are undefined and dropped identically in both engines).
    Treatment assignment is the deterministic user-parity arm of
    ab_cuped, outcome is any-purchase.

    Scale: one user_id shuffle to build (t, y, score) per user, one
    collapse to the distinct-score axis, the ranks.py prefix sums over
    that axis — the data-sized stream is never re-scanned."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("y"),
        F.sum(
            F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("score"),
    ).select(
        (F.col("user_id") % 2 == 0).cast("bigint").alias("t"), "y", "score"
    )
    ax = u.groupBy("score").agg(
        F.sum("t").cast("bigint").alias("ct"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("cc"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("yt"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("bigint").alias("yc"),
    ).localCheckpoint(eager=True)
    w = with_prefix_sum(
        ax, [F.desc("score")], ["ct", "cc", "yt", "yc"], suffix="_b",
        materialize=False,
    )
    c = w.select(
        "score",
        (F.col("ct_b") + F.col("ct")).alias("cum_t"),
        (F.col("cc_b") + F.col("cc")).alias("cum_c"),
        (F.col("yt_b") + F.col("yt")).alias("cum_yt"),
        (F.col("yc_b") + F.col("yc")).alias("cum_yc"),
    ).filter(F.col("cum_c") > 0)
    return c.select(
        "score",
        (F.col("cum_t") + F.col("cum_c")).cast("bigint").alias("cum_n"),
        F.col("cum_yt").cast("bigint").alias("cum_resp_treat"),
        F.col("cum_yc").cast("bigint").alias("cum_resp_ctrl"),
        # DECIMAL(38,0) multiply-before-divide (oracle: HUGEINT): the
        # counts-squared-times-1e6 product passes BIGINT only while
        # cum counts stay under ~3M users — the concentration-shares
        # overflow class, promoted before it can ship.
        F.expr(
            "cast(((cast(cum_yt as decimal(38,0)) * cum_c"
            " - cast(cum_yc as decimal(38,0)) * cum_t) * 1000000)"
            " div cum_c as bigint)"
        ).alias("qini_micro"),
    )


# ---------------------------------------------------------------------------
# ml_feature_corr_matrix
# ---------------------------------------------------------------------------

_CORR_FEATS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_oracle() -> str:
    cols = {f: f"CAST(floor({f} * 100 + 0.5) AS BIGINT)" for f in _CORR_FEATS}
    sums = ",\n               ".join(
        f"SUM(CAST({c} AS HUGEINT)) AS s_{f}" for f, c in cols.items()
    )
    sqs = ",\n               ".join(
        f"SUM(CAST({cols[a]} AS HUGEINT) * {cols[b]}) AS p_{a}_{b}"
        for i, a in enumerate(_CORR_FEATS)
        for b in _CORR_FEATS[i:]
    )
    pairs = []
    for i, a in enumerate(_CORR_FEATS):
        for b in _CORR_FEATS[i + 1:]:
            pairs.append(f"""
        SELECT '{a}' AS feat_a, '{b}' AS feat_b,
               floor(CAST(CAST(n * p_{a}_{b} - s_{a} * s_{b} AS VARCHAR)
                          AS DOUBLE)
                     / sqrt(CAST(CAST(n * p_{a}_{a} - s_{a} * s_{a}
                                      AS VARCHAR) AS DOUBLE)
                            * CAST(CAST(n * p_{b}_{b} - s_{b} * s_{b}
                                        AS VARCHAR) AS DOUBLE))
                     * 1000000000 + 0.5) / 1000000000 AS pearson_r
        FROM s""")
    return f"""
        WITH s AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
               {sums},
               {sqs}
            FROM lineitem)
        {" UNION ALL ".join(pairs)}
    """


@register(
    "ml_feature_corr_matrix",
    oracle=_corr_matrix_oracle(),
    tags=("ml", "stats", "agg"),
)
def ml_feature_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE Pearson correlation over the numeric feature set — the
    feature-screening matrix every training pipeline prints before
    dropping collinear columns (agg_corr_exact is the single-pair
    primitive; this emits all C(4,2) pairs). ONE combinable pass
    collects every sum and cross-product as HUGEINT/DECIMAL(38)
    integers on 2dp fixed-point features; each r is then a pure
    driver-scale double tree off that single suffstat row (1e-9
    round) — the data is scanned once no matter how many pairs.

    Scale: a single map-side-combined aggregate to ONE row; the
    C(k,2) unpivot is row-local arithmetic on that row."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = {
        f: F.floor(F.col(f) * 100 + F.lit(0.5)).cast("bigint")
        for f in _CORR_FEATS
    }
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    aggs += [F.sum(d38(c)).alias(f"s_{f}") for f, c in cents.items()]
    aggs += [
        F.sum(d38(cents[a]) * cents[b]).alias(f"p_{a}_{b}")
        for i, a in enumerate(_CORR_FEATS)
        for b in _CORR_FEATS[i:]
    ]
    s = li.agg(*aggs)
    # ONE select + explode, not a union of per-pair selects: each union
    # leg replicates the whole aggregate subtree, so the "scanned once"
    # promise above was actually 6 lineitem scans (r11 plan sweep). The
    # C(k,2) fan-out is an array over the single suffstat row.
    n = F.col("n")
    pair_structs = []
    for i, a in enumerate(_CORR_FEATS):
        for b in _CORR_FEATS[i + 1:]:
            num = (n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
                "double"
            )
            da = (n * F.col(f"p_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
                "double"
            )
            db = (n * F.col(f"p_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
                "double"
            )
            r = num / F.sqrt(da * db)
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("feat_a"),
                    F.lit(b).alias("feat_b"),
                    (F.floor(r * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
                        "pearson_r"
                    ),
                )
            )
    return s.select(F.explode(F.array(*pair_structs)).alias("p")).select(
        "p.feat_a", "p.feat_b", "p.pearson_r"
    )


# ---------------------------------------------------------------------------
# ml_feature_drift_psi
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_BIN_CENTS = 1_000_00  # fixed $1000 bins over o_totalprice


@register(
    "ml_feature_drift_psi",
    oracle=f"""
        WITH s AS (
            SELECT least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         // {_PSI_BIN_CENTS}, {_PSI_BINS - 1}) AS bin,
                   CASE WHEN (((o_orderkey + 7) % 2147483648) * 2654435761) % 1000 < 800
                        THEN 1 ELSE 0 END AS is_train
            FROM orders),
        b AS (
            SELECT bin,
                   CAST(SUM(is_train) AS BIGINT) AS n_tr,
                   CAST(SUM(1 - is_train) AS BIGINT) AS n_te
            FROM s GROUP BY bin),
        t AS (
            SELECT CAST(SUM(n_tr) AS BIGINT) AS tot_tr,
                   CAST(SUM(n_te) AS BIGINT) AS tot_te,
                   CAST(count(*) AS BIGINT) AS k,
                   list_aggregate(
                       list_transform(
                           list([CAST(n_tr AS DOUBLE), CAST(n_te AS DOUBLE)]
                                ORDER BY bin),
                           x -> ((x[1] + 0.5)
                                 / (SUM(n_tr) + 0.5 * count(*))
                                 - (x[2] + 0.5)
                                 / (SUM(n_te) + 0.5 * count(*)))
                                * ln(((x[1] + 0.5)
                                      / (SUM(n_tr) + 0.5 * count(*)))
                                     / ((x[2] + 0.5)
                                        / (SUM(n_te) + 0.5 * count(*))))),
                       'sum') AS psi
            FROM b)
        SELECT tot_tr AS n_train, tot_te AS n_test, k AS n_bins,
               floor(psi * 1000000000 + 0.5) / 1000000000 AS psi
        FROM t
    """,
    tags=("ml", "stats", "dq"),
)
def ml_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN/TEST FEATURE DRIFT via the Population Stability Index: does
    o_totalprice distribute identically across the deterministic 80/20
    hash split? A sound split shows PSI ~ 0; PSI > 0.1 means the split
    key correlates with the feature and the holdout lies — the check
    every model pipeline should run and almost none do
    (corpus_drift_psi is the corpus-level sibling; this one guards the
    SPLIT). Same pinned semantics: fixed $1000 bins (open-ended tail),
    Laplace 0.5 smoothing, the k-term sum folded in BIN ORDER so float
    accumulation is order-pinned.

    Scale: one combinable pass to |bins| x 2 counts; the PSI fold is
    model-sized."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.least(
            F.expr(
                f"cast(floor(o_totalprice * 100 + 0.5) as bigint)"
                f" div {_PSI_BIN_CENTS}"
            ),
            F.lit(_PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
        (
            (((F.col("o_orderkey") + 7) % F.lit(2147483648)) * 2654435761) % 1000 < 800
        ).cast("int").alias("is_train"),
    )
    b = s.groupBy("bin").agg(
        F.sum("is_train").cast("bigint").alias("n_tr"),
        F.sum(F.lit(1) - F.col("is_train")).cast("bigint").alias("n_te"),
    )
    t = b.agg(
        F.sum("n_tr").cast("bigint").alias("tot_tr"),
        F.sum("n_te").cast("bigint").alias("tot_te"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "bin",
                        F.col("n_tr").cast("double").alias("tr"),
                        F.col("n_te").cast("double").alias("te"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["tr"] + F.lit(0.5))
                / (F.sum("n_tr") + F.lit(0.5) * F.count(F.lit(1)))
                - (x["te"] + F.lit(0.5))
                / (F.sum("n_te") + F.lit(0.5) * F.count(F.lit(1)))
            )
            * F.log(
                (
                    (x["tr"] + F.lit(0.5))
                    / (F.sum("n_tr") + F.lit(0.5) * F.count(F.lit(1)))
                )
                / (
                    (x["te"] + F.lit(0.5))
                    / (F.sum("n_te") + F.lit(0.5) * F.count(F.lit(1)))
                )
            ),
        ).alias("psi"),
    )
    return t.select(
        F.col("tot_tr").alias("n_train"),
        F.col("tot_te").alias("n_test"),
        F.col("k").alias("n_bins"),
        (F.floor(F.col("psi") * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
            "psi"
        ),
    )


# ---------------------------------------------------------------------------
# ml_threshold_youden
# ---------------------------------------------------------------------------


@register(
    "ml_threshold_youden",
    oracle="""
        WITH s AS (
            SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS score,
                   CAST(l_returnflag = 'R' AS BIGINT) AS y
            FROM lineitem),
        v AS (
            SELECT score, CAST(SUM(y) AS BIGINT) AS cpos,
                   CAST(SUM(1 - y) AS BIGINT) AS cneg
            FROM s GROUP BY score),
        c AS (
            SELECT score,
                   SUM(cpos) OVER (ORDER BY score DESC) AS tp,
                   SUM(cneg) OVER (ORDER BY score DESC) AS fp
            FROM v),
        t AS (SELECT CAST(SUM(cpos) AS BIGINT) AS npos,
                     CAST(SUM(cneg) AS BIGINT) AS nneg FROM v),
        j AS (
            SELECT c.score, CAST(c.tp AS BIGINT) AS tp,
                   CAST(c.fp AS BIGINT) AS fp,
                   CAST(c.tp AS HUGEINT) * t.nneg
                       - CAST(c.fp AS HUGEINT) * t.npos AS j_scaled,
                   t.npos, t.nneg
            FROM c CROSS JOIN t)
        SELECT score AS threshold_cents, tp, fp,
               floor(CAST(j_scaled AS DOUBLE)
                     / (CAST(npos AS DOUBLE) * nneg) * 1000000 + 0.5)
                   / 1000000 AS youden_j
        FROM j
        ORDER BY j_scaled DESC, score DESC LIMIT 1
    """,
    tags=("ml", "stats"),
)
def ml_threshold_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMAL OPERATING POINT by Youden's J (TPR - FPR maximized) —
    where on the ROC curve to actually cut the score; the
    decision-threshold answer ml_auc_roc's ranking summary doesn't
    give. The argmax never floats: J at threshold t scales to
    tp*Nneg - fp*Npos (exact integers off a descending prefix sum over
    the distinct-score axis), ties break toward the higher threshold;
    only the reported J is a double.

    Scale: one collapse to the distinct-score axis, the ranks.py
    descending prefix sum, a 1-row totals broadcast, a TakeOrdered-1
    pick (allowlisted)."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.select(
            F.floor(F.col("l_discount") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("score"),
            (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
        )
        .groupBy("score")
        .agg(
            F.sum("y").cast("bigint").alias("cpos"),
            F.sum(F.lit(1) - F.col("y")).cast("bigint").alias("cneg"),
        )
        .localCheckpoint(eager=True)
    )
    w = with_prefix_sum(
        v, [F.desc("score")], ["cpos", "cneg"], suffix="_b",
        materialize=False,
    )
    t = v.agg(
        F.sum("cpos").cast("bigint").alias("npos"),
        F.sum("cneg").cast("bigint").alias("nneg"),
    )
    c = w.select(
        "score",
        (F.col("cpos_b") + F.col("cpos")).alias("tp"),
        (F.col("cneg_b") + F.col("cneg")).alias("fp"),
    ).crossJoin(F.broadcast(t))
    # DECIMAL products (oracle: HUGEINT): tp*Nneg is the counts-squared
    # lint class — overflows int64 near 3e9 rows on each axis
    j = c.select(
        "score",
        "tp",
        "fp",
        (
            F.col("tp").cast("decimal(38,0)") * F.col("nneg")
            - F.col("fp").cast("decimal(38,0)") * F.col("npos")
        ).alias("j_scaled"),
        "npos",
        "nneg",
    )
    return (
        j.orderBy(F.desc("j_scaled"), F.desc("score"))
        .limit(1)
        .select(
            F.col("score").alias("threshold_cents"),
            F.col("tp").cast("bigint").alias("tp"),
            F.col("fp").cast("bigint").alias("fp"),
            (
                F.floor(
                    F.col("j_scaled").cast("double")
                    / (F.col("npos").cast("double") * F.col("nneg"))
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("youden_j"),
        )
    )


# ---------------------------------------------------------------------------
# ml_brier_decomposition
# ---------------------------------------------------------------------------


@register(
    "ml_brier_decomposition",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * 10000
                       AS pred_micro,
                   CAST(l_returnflag = 'R' AS BIGINT) AS y
            FROM lineitem),
        g AS (
            SELECT pred_micro, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM b GROUP BY pred_micro),
        t AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(n_pos) AS BIGINT) AS pt,
                   SUM((pred_micro - (CAST(n_pos AS HUGEINT) * 1000000) // n)
                       * CAST(pred_micro - (CAST(n_pos AS HUGEINT) * 1000000)
                              // n AS HUGEINT)
                       * n) AS rel_sum
            FROM g),
        r AS (
            SELECT t.nt, t.pt, t.rel_sum,
                   SUM(((CAST(g.n_pos AS HUGEINT) * 1000000) // g.n
                        - (CAST(t.pt AS HUGEINT) * 1000000) // t.nt)
                       * CAST((CAST(g.n_pos AS HUGEINT) * 1000000) // g.n
                              - (CAST(t.pt AS HUGEINT) * 1000000)
                                // t.nt AS HUGEINT)
                       * g.n) AS res_sum
            FROM g CROSS JOIN t GROUP BY t.nt, t.pt, t.rel_sum)
        SELECT nt AS n, pt AS n_pos,
               floor(CAST(CAST(rel_sum AS VARCHAR) AS DOUBLE)
                     / nt / 1e12 * 1000000000 + 0.5) / 1000000000
                   AS reliability,
               floor(CAST(CAST(res_sum AS VARCHAR) AS DOUBLE)
                     / nt / 1e12 * 1000000000 + 0.5) / 1000000000
                   AS resolution,
               floor((CAST(pt AS DOUBLE) / nt) * (1 - CAST(pt AS DOUBLE) / nt)
                     * 1000000000 + 0.5) / 1000000000 AS uncertainty
        FROM r
    """,
    tags=("ml", "stats", "agg"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MURPHY (1973) DECOMPOSITION of the Brier score:
    Brier = reliability - resolution + uncertainty — is the score bad
    because the probabilities are miscalibrated (reliability), or good
    because they separate the classes (resolution), against the
    irreducible base-rate noise (uncertainty)? The 1-row summary of
    ml_calibration_table's per-bin rows. Per-bin rates are floored
    micro-ints, both quadratic sums accumulate as exact
    HUGEINT/DECIMAL(38) integers weighted by bin size, and only the
    three final normalizations are doubles (1e-9 round).

    Scale: one combinable pass to the |bins| axis, a 1-row totals
    cross, a 1-row final (allowlisted)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            (
                F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint")
                * 10_000
            ).alias("pred_micro"),
            (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
        )
        .groupBy("pred_micro")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
        .localCheckpoint(eager=True)
    )
    rate = F.expr("(cast(n_pos as decimal(38,0)) * 1000000) div n")
    t = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("n_pos").cast("bigint").alias("pt"),
        F.sum(
            (F.col("pred_micro") - rate)
            * (F.col("pred_micro") - rate).cast("decimal(38,0)")
            * F.col("n")
        ).alias("rel_sum"),
    )
    base = F.expr("(cast(pt as decimal(38,0)) * 1000000) div nt")
    r = (
        g.crossJoin(F.broadcast(t))
        .select(
            "nt",
            "pt",
            "rel_sum",
            ((rate - base) * (rate - base).cast("decimal(38,0)") * F.col("n")).alias(
                "res_term"
            ),
        )
        .groupBy("nt", "pt", "rel_sum")
        .agg(F.sum("res_term").alias("res_sum"))
    )
    nano = lambda c: F.floor(c * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000  # noqa: E731
    pb = F.col("pt").cast("double") / F.col("nt")
    return r.select(
        F.col("nt").alias("n"),
        F.col("pt").alias("n_pos"),
        nano(F.col("rel_sum").cast("double") / F.col("nt") / F.lit(1e12)).alias(
            "reliability"
        ),
        nano(F.col("res_sum").cast("double") / F.col("nt") / F.lit(1e12)).alias(
            "resolution"
        ),
        nano(pb * (F.lit(1) - pb)).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# ml_att_stratified
# ---------------------------------------------------------------------------


@register(
    "ml_att_stratified",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 = 0 AS BIGINT) AS t,
                   CAST(max(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y,
                   least(CAST(SUM(CASE WHEN event_type = 'click'
                                       THEN 1 ELSE 0 END) AS BIGINT) // 5, 9)
                       AS stratum
            FROM events GROUP BY user_id),
        s AS (
            SELECT stratum,
                   CAST(SUM(t) AS BIGINT) AS nt,
                   CAST(SUM(1 - t) AS BIGINT) AS nc,
                   CAST(SUM(t * y) AS BIGINT) AS yt,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS yc
            FROM u GROUP BY stratum),
        k AS (
            SELECT CAST(SUM(CASE WHEN nc > 0 THEN nt ELSE 0 END) AS BIGINT)
                       AS nt_matched,
                   CAST(SUM(CASE WHEN nc > 0 THEN
                       CAST(floor((CAST(yt AS DOUBLE)
                                   - CAST(nt AS DOUBLE) * yc / nc)
                                  * 1000000000 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS att_num_nano,
                   CAST(count(*) AS BIGINT) AS n_strata,
                   CAST(SUM(CASE WHEN nc = 0 THEN nt ELSE 0 END) AS BIGINT)
                       AS nt_unmatched
            FROM s)
        SELECT n_strata, nt_matched, nt_unmatched,
               floor(CAST(att_num_nano AS DOUBLE) / nt_matched / 1e9
                     * 1000000 + 0.5) / 1000000 AS att
        FROM k
    """,
    tags=("ml", "stats", "analytics"),
)
def ml_att_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVERAGE TREATMENT EFFECT ON THE TREATED by exact stratification
    on an engagement score (click-count buckets as the propensity
    strata): within each stratum, treated and control users are
    comparable, so ATT = sum_s (yt_s - nt_s * rate_c,s) / NT — the
    observational-causal counterpart of the randomized ab_* family
    (when arms AREN'T randomized, raw differences confound with
    engagement; stratification removes the score's share of it).
    Strata with no controls are reported as unmatched, never silently
    imputed. Each stratum's term floors to nano-ints before summing
    (the chi2 fold discipline), so the estimate is partition-invariant.

    Scale: one user_id shuffle, a <=10-row strata table, a 1-row final
    (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("y"),
        F.least(
            F.expr(
                "sum(case when event_type = 'click' then 1 else 0 end) div 5"
            ),
            F.lit(9).cast("bigint"),
        ).alias("stratum"),
    ).select(
        (F.col("user_id") % 2 == 0).cast("bigint").alias("t"), "y", "stratum"
    )
    s = u.groupBy("stratum").agg(
        F.sum("t").cast("bigint").alias("nt"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("nc"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("yt"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("bigint").alias("yc"),
    )
    term = F.floor(
        (
            F.col("yt").cast("double")
            - F.col("nt").cast("double") * F.col("yc") / F.col("nc")
        )
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("bigint")
    k = s.agg(
        F.sum(F.when(F.col("nc") > 0, F.col("nt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("nt_matched"),
        F.sum(F.when(F.col("nc") > 0, term).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("att_num_nano"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.when(F.col("nc") == 0, F.col("nt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("nt_unmatched"),
    )
    return k.select(
        "n_strata",
        "nt_matched",
        "nt_unmatched",
        (
            F.floor(
                F.col("att_num_nano").cast("double")
                / F.col("nt_matched")
                / F.lit(1e9)
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("att"),
    )
