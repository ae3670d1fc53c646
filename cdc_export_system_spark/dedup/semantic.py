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
    tagged = emb.join(assigned.select("vec_id", "cluster_id"), "vec_id")

    a = tagged.select(
        F.col("cluster_id").alias("cl_a"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
    )
    b = tagged.select(
        F.col("cluster_id").alias("cl_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
    )
    cos_micro = F.floor(cosine(F.col("ea"), F.col("eb")) * 1_000_000 + F.lit(0.5))
    # canonical a < b pairs within a cluster; keep-lowest => drop every doc_b
    drop = (
        a.join(b, (F.col("cl_a") == F.col("cl_b")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cos_micro >= SEMDEDUP_TAU_MICRO)
        .select(F.col("vec_b").alias("vec_id"))
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
