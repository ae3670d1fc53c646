"""Semantic deduplication (SemDeDup, Abbas et al. 2023).

The embedding-space analogue of MinHash near-dedup: cluster the corpus
embeddings with k-means, then within each cluster drop all but one of
every pair of semantically near-identical documents (cosine above a
threshold). The k-means clusters play the role the LSH bands play for
MinHash — they bound the quadratic comparison to same-cluster pairs, so
the corpus is never self-joined. At the paper's scale (LAION/C4), k is
grown with the corpus so the expected cluster size stays constant and
the within-cluster pairwise work stays linear overall; the cluster
assignment itself is the one corpus-wide pass (ivf/kmeans shapes already
audited scale-safe in this repo).

Not SQL-expressible (iterative Lloyd refinement) => rows-only driver
check; the exact keep-set is pinned against a NumPy replica of the full
pipeline in tests/test_semdedup.py, the same discipline as
cluster_kmeans_iterate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register
from cdc_export_system_spark.similarity.kmeans import kmeans_fit
from cdc_export_system_spark.similarity.queries import cosine

# Cosine threshold in 1e-6 units: pairs at or above it are duplicates.
# 0.35 sits in the top ~0.2% of this corpus's pair-cosine distribution
# (max 0.51) — the same regime the paper's 0.9x thresholds occupy on
# real embeddings, adapted to the synthetic table's geometry (the repo's
# dedup_embedding_cosine uses 0.4 on the same data for pair REPORTING;
# the gate here is deliberately a little wider so the drop set is
# non-trivial). Comparing the micro-int keeps the decision exact.
SEMDEDUP_TAU_MICRO = 350_000


def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept corpus after SemDeDup: vec_id, label, cluster_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit(emb.select("vec_id", "embedding"))
    # materialized once: both triangle sides AND the final anti-join
    # consume the assigned corpus; un-materialized, each re-ran the
    # embeddings scan + assignment fold (6 scans per call, r11 plan
    # sweep). Materializing the assignment is what the SemDeDup paper
    # pipeline does between its stages anyway.
    tagged = emb.join(
        assigned.select("vec_id", "cluster_id"), "vec_id"
    ).localCheckpoint(eager=True)

    # triangle sub-blocking inside each cluster (see triangle_sides):
    # joining on the cluster alone caps parallelism at k reduce tasks
    from cdc_export_system_spark.similarity.queries import (
        triangle_pair_filter,
        triangle_sides,
    )

    ta, tb = triangle_sides(
        tagged.select("cluster_id", "vec_id", "embedding"),
        "vec_id",
        extra_keys=("cluster_id",),
    )
    a = ta.select(
        "cluster_id", "_tj", "_blk_a",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
    )
    b = tb.select(
        "cluster_id", "_tj", "_blk_b",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
    )
    cos_micro = F.floor(cosine(F.col("ea"), F.col("eb")) * 1_000_000 + F.lit(0.5))
    # exactly-once unordered pairs; keep-lowest => drop greatest(id_a, id_b)
    drop = (
        a.join(b, ["cluster_id", "_tj"])
        .filter(triangle_pair_filter())
        .filter(cos_micro >= SEMDEDUP_TAU_MICRO)
        .select(F.greatest("id_a", "id_b").alias("vec_id"))
        .distinct()
    )
    return tagged.join(drop, "vec_id", "left_anti").select(
        "vec_id", "label", "cluster_id"
    )


@register(
    "dedup_semantic_semdedup",
    oracle=None,  # iterative k-means: rows-only; keep-set NumPy-pinned in tests
    tags=("dedup", "similarity", "ml", "pipeline"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-blocked embedding-cosine dedup, keep-lowest.

    Pipeline: one k-means assignment pass (model-sized centroids on the
    driver, exactly like sim_search_ivf), a within-cluster pair scan
    with the cosine evaluated as a JVM-side zip_with fold, and a LEFT
    ANTI probe of the drop set — no corpus self-join, no Python in the
    hot path. Output is the KEPT corpus (vec_id, label, cluster_id);
    the drop rule is the repo's canonical deterministic keep-lowest
    (doc_b of every (a < b) duplicate pair drops)."""
    return semdedup_keep(spark, sf_dir)


# ---------------------------------------------------------------------------
# dedup_semantic_exact
# ---------------------------------------------------------------------------

# τ = 0.35 as the exact rational 35/100: cos(a,b) >= τ  <=>
# dot > 0 AND 10000·dot² >= 1225·|a|²·|b|²  — integer cross-multiplication.
SEMDEDUP_TAU_NUM2 = 1225  # 35²
SEMDEDUP_TAU_DEN2 = 10000  # 100²


def _semdedup_exact_oracle() -> str:
    from cdc_export_system_spark.similarity.kmeans import (
        KM_EXACT_ITERS,
        KM_OFF,
        _km_exact_ctes,
    )

    last = KM_EXACT_ITERS + 1
    idot = (
        "list_aggregate(list_transform(list_zip({a}, {b}),"
        " p -> p[1] * p[2]), 'sum')"
    )
    return f"""
        WITH {_km_exact_ctes()},
        qu AS MATERIALIZED (
            SELECT q.vec_id, a.cid,
                   list_transform(q.q, v -> v - {KM_OFF}) AS u,
                   CAST({idot.format(
                       a=f"list_transform(q.q, v -> v - {KM_OFF})",
                       b=f"list_transform(q.q, v -> v - {KM_OFF})")}
                        AS HUGEINT) AS n2
            FROM q JOIN a{last} a USING (vec_id)),
        drp AS (
            SELECT DISTINCT b.vec_id
            FROM qu a JOIN qu b ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE CAST({idot.format(a="a.u", b="b.u")} AS HUGEINT) > 0
              AND {SEMDEDUP_TAU_DEN2}
                  * CAST({idot.format(a="a.u", b="b.u")} AS HUGEINT)
                  * CAST({idot.format(a="a.u", b="b.u")} AS HUGEINT)
                  >= {SEMDEDUP_TAU_NUM2} * a.n2 * b.n2)
        SELECT e.vec_id, e.label, CAST(qu.cid AS BIGINT) AS cluster_id
        FROM qu
        JOIN embeddings e ON e.vec_id = qu.vec_id
        WHERE qu.vec_id NOT IN (SELECT vec_id FROM drp)
    """


@register(
    "dedup_semantic_exact",
    oracle=_semdedup_exact_oracle(),
    tags=("dedup", "similarity", "ml", "pipeline"),
)
def dedup_semantic_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in EXACT integer arithmetic — the oracle-checkable
    sibling of dedup_semantic_semdedup: clusters come from the shared
    exact-Lloyd trainer (cluster_kmeans_exact), and the within-cluster
    duplicate gate cos(a,b) ≥ 0.35 is decided WITHOUT computing a
    cosine: dot > 0 and 10000·dot² ≥ 1225·|a|²·|b|² — the threshold as
    an exact rational, cross-multiplied so no division, sqrt, or float
    touches the decision. Keep-lowest (every b of a duplicate (a < b)
    pair drops), so the kept corpus is a pure function of the data,
    bit-identical across engines and partitionings.

    Scale: identical blocking shape to the float pipeline — k-means
    bounds the pairwise scan to same-cluster pairs (k grows with the
    corpus to pin expected cluster size); per-vector squared norms are
    precomputed once; the drop set is a distinct vec_id stream anti-
    joined back. Squared-dot magnitudes ride DECIMAL(38)/HUGEINT."""
    from cdc_export_system_spark.similarity.kmeans import KM_OFF, km_exact_fit

    q, cents, assign = km_exact_fit(spark, sf_dir)
    assigned = assign(cents).select("vec_id", "cid")
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qu = (
        q.join(assigned, "vec_id")
        .select(
            "vec_id",
            "cid",
            F.transform(F.col("q"), lambda v: v - KM_OFF).alias("u"),
        )
        .select(
            "vec_id",
            "cid",
            "u",
            idot(F.col("u"), F.col("u")).cast("decimal(38,0)").alias("n2"),
        )
        .localCheckpoint(eager=True)
    )
    # triangle sub-blocking inside each cluster: joining on cid alone
    # caps parallelism at k reduce tasks for a pair stream that is
    # quadratic in cluster size (the 10x scaling run measured 15.5x
    # wall time through that bottleneck); with triangle_sides each
    # cluster's pairs spread over B(B+1)/2 tasks, every unordered pair
    # met exactly once. Keep-lowest drops greatest(id_a, id_b) — the
    # pair predicate is symmetric, so block-order roles are free.
    from cdc_export_system_spark.similarity.queries import (
        triangle_pair_filter,
        triangle_sides,
    )

    ta, tb = triangle_sides(qu, "vec_id", extra_keys=("cid",))
    a = ta.select(
        "cid",
        "_tj",
        "_blk_a",
        F.col("vec_id").alias("id_a"),
        F.col("u").alias("ua"),
        F.col("n2").alias("na2"),
    )
    b = tb.select(
        "cid",
        "_tj",
        "_blk_b",
        F.col("vec_id").alias("id_b"),
        F.col("u").alias("ub"),
        F.col("n2").alias("nb2"),
    )
    dot = idot(F.col("ua"), F.col("ub")).cast("decimal(38,0)")
    drop = (
        a.join(b, ["cid", "_tj"])
        .filter(triangle_pair_filter())
        .filter(
            (dot > 0)
            & (
                F.lit(SEMDEDUP_TAU_DEN2) * dot * dot
                >= F.lit(SEMDEDUP_TAU_NUM2) * F.col("na2") * F.col("nb2")
            )
        )
        .select(F.greatest("id_a", "id_b").alias("vec_id"))
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        qu.join(drop, "vec_id", "left_anti")
        .join(emb, "vec_id")
        .select("vec_id", "label", F.col("cid").cast("bigint").alias("cluster_id"))
    )
