"""IVF (inverted-file) approximate nearest-neighbor search.

North-star extension (BASELINE.json: "similarity search ... designed for
100 TB scale"); no counterpart exists in the reference. Complements the
sign-LSH path (similarity/lsh.py) with the other classic ANN layout:

1. **Train**: k-means centroids over the corpus (distributed via
   ``pyspark.ml.clustering.KMeans``; at warehouse scale you train on a
   sample — the estimator already accepts one).
2. **Assign**: one pass tags every vector with its nearest-centroid
   ``cluster_id``. At 100 TB this table is written *partitioned by*
   ``cluster_id`` so the directory layout IS the inverted file.
3. **Probe**: a query ranks the (tiny, driver-resident) centroid set,
   picks the ``nprobe`` nearest lists, and brute-forces cosine only
   inside them — with the partitioned layout that is partition pruning,
   i.e. the scan reads ``nprobe / n_clusters`` of the corpus and no
   shuffle happens at all: filter -> vectorized dot -> TakeOrdered.

Accuracy contract: ``nprobe == n_clusters`` degenerates to exact
brute-force top-k (pinned in tests against ``sim_search_topk``); smaller
``nprobe`` trades recall for the scan fraction. Registered as a
rows-only driver query (approximate results have no SQL oracle); local
tests pin full-probe exactness and planted-neighbor recall.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register
from cdc_export_system_spark.similarity.queries import (
    QUERY_VEC_ID,
    SIM_DECIMALS,
    TOP_K,
    cosine,
)

N_CLUSTERS = 16
N_PROBE = 4
SEED = 42


def ivf_assign(emb: DataFrame, n_clusters: int = N_CLUSTERS, seed: int = SEED,
               max_iter: int = 5) -> tuple[DataFrame, list[list[float]]]:
    """Train centroids and tag each vector with its inverted-list id.

    Returns (assigned_df with a ``cluster_id`` column, centroid list).
    The centroid set is k vectors — driver-resident by design; that is
    the piece every IVF implementation keeps in memory.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(vecs)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed("prediction", "cluster_id")
        .drop("features")
    )
    return assigned, [list(map(float, c)) for c in model.clusterCenters()]


def _rank_centroids(qvec: list[float], centroids: list[list[float]]) -> list[int]:
    """Cluster ids sorted by centroid cosine similarity to the query
    (driver-side: the centroid table is k rows by construction)."""
    qn = math.sqrt(sum(x * x for x in qvec)) or 1.0

    def sim(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(qvec, c)) / (qn * cn)

    return sorted(range(len(centroids)), key=lambda i: (-sim(centroids[i]), i))


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    n_clusters: int = N_CLUSTERS,
    nprobe: int = N_PROBE,
    seed: int = SEED,
) -> DataFrame:
    """Approximate cosine top-k for the embedding of ``query_vec_id``.

    The candidate filter is ``cluster_id IN (probed)`` — on a
    cluster_id-partitioned corpus that is pure partition pruning, so the
    probe-side plan is scan(nprobe lists) -> dot -> TakeOrdered with no
    exchange."""
    qrow = emb.filter(F.col("vec_id") == query_vec_id).first()
    if qrow is None:
        # empty corpus / unknown query id: no lists to train or probe —
        # return the empty result with the contract schema (KMeans.fit
        # on zero rows would raise, and there is nothing to rank anyway)
        return emb.select(
            "vec_id",
            "label",
            F.lit(0).cast("int").alias("cluster_id"),
            F.lit(0.0).alias("cos_sim"),
        ).filter(F.lit(False))
    qvec = [float(x) for x in qrow["embedding"]]
    assigned, centroids = ivf_assign(emb, n_clusters=n_clusters, seed=seed)
    probe = _rank_centroids(qvec, centroids)[:nprobe]
    q = F.lit(qvec).cast("array<float>")
    return (
        assigned.filter(F.col("cluster_id").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            "cluster_id",
            F.round(cosine(F.col("embedding"), q), SIM_DECIMALS).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


@register("sim_search_ivf", tags=("similarity", "ann"))
def sim_search_ivf(spark, sf_dir: str) -> DataFrame:
    """IVF ANN top-k over embeddings: probe the 4 nearest of 16 inverted
    lists (~25% scan fraction). Approximate — driver check is rows-only;
    exactness is pinned locally via the nprobe == n_clusters degeneracy."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb)


# ---------------------------------------------------------------------------
# sim_search_ivf_exact
# ---------------------------------------------------------------------------

N_PROBE_EXACT = 3


def _ivf_exact_oracle() -> str:
    """DuckDB mirror: the shared exact-Lloyd CTE chain trains the coarse
    quantizer; probing ranks centroids by exact integer distance to the
    query and the candidate top-k compares exact integer distances."""
    from cdc_export_system_spark.similarity.kmeans import (
        KM_EXACT_ITERS,
        _km_exact_ctes,
    )

    last = KM_EXACT_ITERS + 1
    idist = (
        "list_aggregate(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
    )
    return f"""
        WITH {_km_exact_ctes()},
        qv AS (SELECT q FROM q WHERE vec_id = {QUERY_VEC_ID}),
        pr AS (SELECT cid FROM (
                   SELECT c.cid, {idist.format(a="c.c", b="qv.q")} AS d
                   FROM c{KM_EXACT_ITERS} c CROSS JOIN qv)
               ORDER BY d, cid LIMIT {N_PROBE_EXACT}),
        cand AS (
            SELECT a.vec_id, a.cid,
                   CAST({idist.format(a="e.q", b="qv.q")} AS BIGINT) AS dist_q
            FROM a{last} a
            JOIN pr USING (cid)
            JOIN q e USING (vec_id)
            CROSS JOIN qv
            WHERE a.vec_id <> {QUERY_VEC_ID})
        SELECT cand.vec_id, emb.label, cand.cid AS cluster_id, cand.dist_q
        FROM cand JOIN embeddings emb ON emb.vec_id = cand.vec_id
        ORDER BY cand.dist_q, cand.vec_id
        LIMIT {TOP_K}
    """


@register(
    "sim_search_ivf_exact",
    oracle=_ivf_exact_oracle(),
    tags=("similarity", "ann"),
)
def sim_search_ivf_exact(spark, sf_dir: str) -> DataFrame:
    """IVF ANN serving as EXACT integer arithmetic — the
    oracle-checkable sibling of sim_search_ivf: the coarse quantizer is
    the shared exact-Lloyd trainer (cluster_kmeans_exact's fixed-point
    k-means — quantized coords, integer-division centroids), probing
    ranks the K centroids by exact integer squared L2 to the query
    (ties to the lower cluster id) and takes the N_PROBE_EXACT nearest
    lists, and the candidate top-k compares exact integer distances
    (ties to the lower vec_id). Approximate in RECALL exactly like any
    IVF index — the probe set bounds the scan — but every number the
    operator emits is bit-identical across engines and partitionings,
    which is what lets an ANN serving path carry a hash oracle at all.

    Scale: identical serving shape to sim_search_ivf — with the
    inverted file laid out as cluster_id partitions, the probe filter
    is partition pruning (scan nprobe/K of the corpus), then one
    JVM-side integer fold per candidate and a k-row TakeOrdered; the
    trained model is K×dim integers on the driver."""
    from cdc_export_system_spark.similarity.kmeans import (
        _q_dist,
        km_exact_fit,
    )

    q, cents, assign = km_exact_fit(spark, sf_dir)
    qv = q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qe")
    )
    pr = (
        cents.join(F.broadcast(qv), F.lit(True))
        .select("cid", _q_dist(F.col("c"), F.col("qe")).alias("d"))
        .orderBy("d", "cid")
        .limit(N_PROBE_EXACT)
        .select("cid")
    )
    assigned = assign(cents)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        assigned.join(F.broadcast(pr), "cid")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(q, "vec_id")
        .join(F.broadcast(qv), F.lit(True))
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            _q_dist(F.col("q"), F.col("qe")).cast("bigint").alias("dist_q"),
        )
        .join(emb, "vec_id")
        .select("vec_id", "label", "cluster_id", "dist_q")
        .orderBy("dist_q", "vec_id")
        .limit(TOP_K)
    )
