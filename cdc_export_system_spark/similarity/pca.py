"""Distributed PCA over the embeddings table (north-star extension).

The scale shape mirrors cluster_kmeans / sim_search_pq: the cluster
reduces the corpus to a SMALL sufficient statistic — here the d-vector
sum and the d×d Gram matrix, accumulated per Arrow batch with NumPy and
partially aggregated (one ~(d² + d)-double row per batch) — the driver
eigendecomposes the 64×64 covariance (O(d³), microseconds), and the
top-k components broadcast back inside a vectorized projection UDF. The
corpus is read ONCE per pass (mean+Gram ride the same batch iterator),
never shuffled, and nothing larger than d² floats ever reaches the
driver.

Determinism: eigenvector sign is normalized (largest-|coefficient|
entry positive, ties to the lowest index) so the projection is unique;
numpy.linalg.eigh on a symmetric matrix is deterministic for a fixed
input. No SQL oracle exists for an eigendecomposition — driver check is
rows-only; the accuracy contract is pinned in tests/test_pca.py
(orthonormal components, descending explained variance, projection
equal to the exact NumPy reference, reconstruction error below total
variance).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

N_COMPONENTS = 4


def _suffstats(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """(sum_vec, gram, n) accumulated batch-locally, summed driver-side.
    The collect is |batches| rows of d²+d+1 doubles — a model, not data."""

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = emb.select("embedding").mapInPandas(
        _partials, "n long, s array<double>, g array<double>"
    ).collect()
    d = len(parts[0]["s"])
    n = sum(p["n"] for p in parts)
    s = np.sum([np.array(p["s"]) for p in parts], axis=0)
    g = np.sum([np.array(p["g"]).reshape(d, d) for p in parts], axis=0)
    return s, g, n


def pca_fit(emb: DataFrame, k: int = N_COMPONENTS) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components[k, d], explained_variance[k]) from one corpus
    pass + an O(d³) driver eigendecomposition."""
    s, g, n = _suffstats(emb)
    mean = s / n
    cov = g / n - np.outer(mean, mean)  # E[xxᵀ] - μμᵀ
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # sign normalization: largest-|coeff| entry positive (ties: lowest idx)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


@register(
    "feat_pca_project",
    tags=("ml", "feature", "similarity"),
)
def feat_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-N_COMPONENTS principal
    components (vec_id, pc1..pcN) — the dimensionality-reduction front
    of an embedding-dedup / visualization pipeline. Fit is one corpus
    pass (sufficient statistics above); projection is a second pass with
    the (k, d) model broadcast inside a vectorized NumPy matmul."""
    emb = load_table(spark, sf_dir, "embeddings")
    if not emb.take(1):  # schema-only input: nothing to fit
        return spark.createDataFrame(
            [], "vec_id long, " + ", ".join(f"pc{i + 1} double" for i in range(N_COMPONENTS))
        )
    mean, comps, _ = pca_fit(emb)

    def _project(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (x - mean) @ comps.T
            out = {"vec_id": pdf["vec_id"]}
            for i in range(comps.shape[0]):
                out[f"pc{i + 1}"] = proj[:, i]
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(
        _project,
        "vec_id long, " + ", ".join(f"pc{i + 1} double" for i in range(N_COMPONENTS)),
    )


# ---------------------------------------------------------------------------
# feat_pca_power_exact
# ---------------------------------------------------------------------------

PCA_SQUARINGS = 12  # G^(2^12): convergence ratio (λ2/λ1)^4096
PCA_Q = 1000  # 1e-3 coordinate quantization (keeps every product in range)
PCA_V = 1_000_000  # fixed-point scale for matrix renormalization / loadings


def _pca_power_oracle(squarings: int = PCA_SQUARINGS) -> str:
    """Unrolled-CTE DuckDB mirror of the exact-integer
    power-by-repeated-squaring. Signed integer division truncates toward
    zero in BOTH engines (DuckDB `//`, Spark `div`), so the mean
    centering and every renormalization are bit-identical without a
    positivity shift."""
    its = []
    prev = "m0"
    for t in range(1, squarings + 1):
        its.append(f"""
        p{t} AS (SELECT a.i, b.j, SUM(a.m * b.m) AS p
                 FROM {prev} a JOIN {prev} b ON a.j = b.i GROUP BY a.i, b.j),
        ms{t} AS (SELECT MAX(abs(p)) // {PCA_V} + 1 AS ms FROM p{t}),
        m{t} AS MATERIALIZED (
            SELECT i, j, CAST(p // ms AS BIGINT) AS m
            FROM p{t} CROSS JOIN ms{t})""")
        prev = f"m{t}"
    return f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, generate_subscripts(e, 1) - 1 AS pos,
                   unnest(e) AS val
            FROM (SELECT vec_id,
                         list_transform(embedding, x ->
                             CAST(floor(CAST(x AS DOUBLE) * {PCA_Q} + 0.5)
                                  AS BIGINT)) AS e
                  FROM embeddings)),
        mu AS (SELECT pos, SUM(val) // COUNT(*) AS mu FROM q GROUP BY pos),
        c AS MATERIALIZED (
            SELECT vec_id, pos, val - mu AS c FROM q JOIN mu USING (pos)),
        g AS MATERIALIZED (
            SELECT CAST(a.pos AS INT) AS i, CAST(b.pos AS INT) AS j,
                   CAST(SUM(CAST(a.c * b.c AS HUGEINT)) AS BIGINT) AS g
            FROM c a JOIN c b USING (vec_id) GROUP BY a.pos, b.pos),
        nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        gs AS (SELECT MAX(abs(g)) // {PCA_V} + 1 AS ms FROM g),
        m0 AS MATERIALIZED (
            SELECT i, j, CAST(g // ms AS BIGINT) AS m FROM g CROSS JOIN gs),
        {", ".join(its)},
        col AS (SELECT j FROM {prev} GROUP BY j
                ORDER BY SUM(abs(m)) DESC, j LIMIT 1),
        v AS MATERIALIZED (
            SELECT mm.i AS j, mm.m AS v FROM {prev} mm JOIN col USING (j)),
        uf AS (SELECT g.i, SUM(CAST(g.g AS HUGEINT) * vv.v) AS u
               FROM g JOIN v vv ON g.j = vv.j GROUP BY g.i),
        sgn AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
                FROM v ORDER BY abs(v) DESC, j LIMIT 1),
        st AS (SELECT SUM(CAST(vv.v AS HUGEINT) * uf.u) AS vu,
                      SUM(CAST(vv.v AS HUGEINT) * vv.v) AS vvq
               FROM v vv JOIN uf ON vv.j = uf.i)
        SELECT vv.j AS pos, CAST(vv.v * s AS BIGINT) AS loading_q,
               floor(CAST(CAST(vu AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(vvq AS VARCHAR) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS ev6,
               floor(CAST(CAST(vu AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(vvq AS VARCHAR) AS DOUBLE)
                     / CAST(n AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS var6
        FROM v vv CROSS JOIN sgn CROSS JOIN st CROSS JOIN nv
    """


@register(
    "feat_pca_power_exact",
    oracle=_pca_power_oracle(),
    tags=("feature", "ml", "iterative", "similarity"),
)
def feat_pca_power_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction by POWER ITERATION VIA REPEATED SQUARING
    in exact fixed-point arithmetic — the oracle-checkable sibling of
    feat_pca_project's eigh. Coordinates quantize to 1e-3 integer
    units; dimension means center by truncating integer division (Spark
    `div` and DuckDB `//` both truncate toward zero, so no positivity
    shift is needed); the 64×64 Gram accumulates as exact integers.
    Because the embedding spectrum is nearly flat (λ2/λ1 ≈ 0.99 on the
    test corpus), plain power iteration would need ~500 rounds — so the
    operator SQUARES the matrix instead: 12 rounds of M ← (M·M) div
    norm give the direction of G^4096 applied to the dominant column,
    with every renormalization an exact integer division (entries stay
    ≤ 1e6 scale, products ≤ 6.4e13 — bigint-safe). The extracted
    column (largest |column sum|, ties low) is the converged top
    eigenvector; its Rayleigh quotient against the ORIGINAL Gram is the
    eigenvalue, read out with two correctly-rounded casts, one divide
    and a 1e-6 round. Bit-identical across engines and partitionings;
    direction accuracy is pinned against NumPy eigh in
    tests/test_pca.py. Sign canonicalized: largest-|loading| dimension
    positive (ties to the lower index), the float PCA convention.

    Returns one row per dimension: loading in 1e-6 units, the integer
    Gram's top eigenvalue (ev6) and its per-vector variance (var6).

    Scale: one scan builds the d² Gram via a map-side-combined
    |d²|-key aggregate (per-row outer product, no data-side join); the
    12 squarings run on the 4096-row checkpointed matrix — model-sized
    work independent of corpus size. At petabyte row counts the Gram
    sums ride DECIMAL(38,0)/HUGEINT headroom in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * PCA_Q + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("e"),
    )
    lf = q.select("vec_id", F.posexplode("e").alias("pos", "val"))
    mu = lf.groupBy("pos").agg(F.expr("sum(val) div count(*)").alias("mu"))
    mu_arr = (
        mu.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
        .select(F.transform(F.col("pm"), lambda s: s["mu"]).alias("mu_arr"))
    )
    cdf = q.join(F.broadcast(mu_arr), F.lit(True)).select(
        "vec_id",
        F.zip_with(F.col("e"), F.col("mu_arr"), lambda a, b: a - b).alias("c"),
    )
    # Gram: one scan, per-row outer product via double posexplode, then a
    # |d²|-key map-side-combined aggregate — no data-side join.
    pairs = cdf.select(
        F.posexplode("c").alias("i", "ci"), F.col("c").alias("carr")
    ).select("i", "ci", F.posexplode("carr").alias("j", "cj"))
    g = (
        pairs.groupBy("i", "j")
        .agg(
            F.sum((F.col("ci") * F.col("cj")).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("g")
        )
        .localCheckpoint(eager=True)
    )
    n_df = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def renorm(df: DataFrame, col: str) -> DataFrame:
        ms = df.agg(
            (F.expr(f"max(abs({col})) div {PCA_V}") + F.lit(1)).alias("ms")
        )
        return (
            df.join(F.broadcast(ms), F.lit(True))
            .select(
                "i", "j", F.expr(f"{col} div ms").cast("bigint").alias("m")
            )
            .localCheckpoint(eager=True)
        )

    m = renorm(g, "g")
    for _ in range(PCA_SQUARINGS):
        a, b = m.alias("a"), m.alias("b")
        p = (
            a.join(b, F.col("a.j") == F.col("b.i"))
            .groupBy(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
            .agg(F.sum(F.col("a.m") * F.col("b.m")).alias("p"))
        )
        m = renorm(p, "p")

    colsel = (
        m.groupBy("j")
        .agg(F.sum(F.abs(F.col("m"))).alias("cs"))
        .orderBy(F.col("cs").desc(), "j")
        .limit(1)
        .select("j")
    )
    v = m.join(F.broadcast(colsel), "j").select(
        F.col("i").alias("j"), F.col("m").alias("v")
    )
    uf = (
        g.join(v, "j")
        .groupBy("i")
        .agg(F.sum(F.col("g").cast("decimal(38,0)") * F.col("v")).alias("u"))
    )
    sgn = (
        v.orderBy(F.abs(F.col("v")).desc(), "j")
        .limit(1)
        .select(
            F.when(F.col("v") < 0, F.lit(-1)).otherwise(F.lit(1)).alias("s")
        )
    )
    st = v.join(uf, v.j == uf.i).agg(
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("u")).alias("vu"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("vvq"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    return (
        v.join(F.broadcast(sgn), F.lit(True))
        .join(F.broadcast(st), F.lit(True))
        .join(F.broadcast(n_df), F.lit(True))
        .select(
            F.col("j").alias("pos"),
            (F.col("v") * F.col("s")).cast("bigint").alias("loading_q"),
            r6(dd("vu") / dd("vvq")).alias("ev6"),
            r6(dd("vu") / dd("vvq") / dd("n")).alias("var6"),
        )
    )
