"""K-means over the embeddings table — DataFrame-native Lloyd iterations.

The broadcast-model pattern: centroids are a k x dim model (tiny), the
data never moves. Each iteration is (1) broadcast the centroids, (2) one
scan assigning every vector to its nearest centroid via a JVM-side fold
over a posexploded centroid join — no Python in the loop, (3) one
|k x dim|-sized shuffle recomputing elementwise means. That is exactly
MLlib's distributed k-means shape, built here from first-principles
DataFrame ops so the engine owns the semantics.

* ``cluster_kmeans_assign`` — ONE assignment step against deterministic
  seed centroids (vec_id < k), oracle-checked exactly: the squared-L2
  fold runs left-to-right in double in both engines, ties break to the
  lowest centroid id.
* ``cluster_kmeans_iterate`` — 5 full Lloyd iterations (rows-only check:
  iterative refinement is not one SQL statement); convergence and
  centroid math are pinned against a NumPy replica in
  tests/test_kmeans.py.

Scale: per iteration the data-side cost is one scan + one map-side
combined |k x dim| agg; the driver holds only k x dim doubles. The
collect-then-broadcast of the model between iterations is the standard
iterative-ML topology (it is what breaks the SQL-expressibility, not a
distributed-design compromise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, load_table_fanned
from cdc_export_system_spark.registry import register

K = 8
N_ITER = 5
DIST_DECIMALS = 9


def sq_dist(a: Column, b: Column) -> Column:
    """Left-to-right double fold of squared L2 distance between arrays."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast centroids, min_by over the
    per-centroid distance — ties to the lowest centroid id via the
    (dist, cid) struct ordering."""
    joined = emb.crossJoin(F.broadcast(centroids))
    d = sq_dist(F.col("embedding"), F.col("centroid"))
    best = F.min_by(
        F.struct(F.col("cid"), d.alias("d")), F.struct(d.alias("d"), F.col("cid"))
    )
    return (
        joined.groupBy("vec_id")
        .agg(best.alias("best"))
        .select(
            "vec_id",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.d").alias("sq_dist"),
        )
    )


@register(
    "cluster_kmeans_assign",
    oracle=f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS centroid
                   FROM embeddings WHERE vec_id < {K}),
        d AS (
            SELECT e.vec_id, c.cid,
                   list_aggregate(list_transform(list_zip(e.embedding, c.centroid),
                       p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                          * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')
                       AS sq
            FROM embeddings e CROSS JOIN c)
        SELECT vec_id, cid AS cluster_id, round(sq, {DIST_DECIMALS}) AS sq_dist
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY sq, cid) AS rn FROM d)
        WHERE rn = 1
    """,
    tags=("similarity", "ml"),
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step against seed centroids (vec_id < K)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    out = _assign(emb.select("vec_id", "embedding"), centroids)
    return out.select(
        "vec_id", "cluster_id", F.round("sq_dist", DIST_DECIMALS).alias("sq_dist")
    )


def kmeans_fit(
    emb: DataFrame, k: int = K, n_iter: int = N_ITER
) -> tuple[list, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns (centroids, assignment df).

    Centroid update is distributed: posexplode each vector once per
    iteration, mean per (cluster, position) — a |k x dim| shuffle — then
    rebuild arrays with array_agg sorted by position. Only the k x dim
    model ever reaches the driver.
    """
    spark = emb.sparkSession
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    assigned = None
    for _ in range(n_iter):
        assigned = _assign(emb.select("vec_id", "embedding"), centroids)
        upd = (
            emb.join(assigned, "vec_id")
            .select("cluster_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                F.col("cluster_id").alias("cid"),
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias(
                    "centroid"
                ),
            )
        )
        rows = upd.collect()  # k x dim model -> driver -> broadcast next round
        centroids = spark.createDataFrame(rows, schema=upd.schema)
    return centroids.collect(), assigned


@register(
    "cluster_kmeans_iterate",
    oracle=None,  # iterative refinement: rows-only driver check; NumPy-pinned in tests
    tags=("similarity", "ml"),
)
def cluster_kmeans_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sizes + within-cluster SSE after N_ITER Lloyd iterations."""
    emb = load_table_fanned(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit(emb.select("vec_id", "embedding"))
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum("sq_dist"), 6).alias("sse"),
        )
        .orderBy("cluster_id")
    )
