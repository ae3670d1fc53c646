"""Near-duplicate cluster formation: connected components over the
verified MinHash/LSH pair graph (north-star dedup extension).

Pair generation (dedup_minhash_verified) finds edges; an actual dedup
pass must collapse each connected component to one canonical document.
This is the step most naive pipelines get wrong at scale — transitive
closure cannot be a self-join chain. Here it is iterative min-label
propagation with pointer jumping (label <- label of label), the
DataFrame form of the hash-to-min + path-shortcut algorithm from
"Connected Components in MapReduce and Beyond" (Kiveris et al.) —
converges in O(log n) rounds on the component diameter.

Scale notes (100 TB posture):
* each round is two hash joins + one min-aggregate on the EDGE set, not
  the corpus — edges are near-dup pairs, orders of magnitude smaller
  than the input;
* `localCheckpoint()` truncates the lineage every round, otherwise the
  iterated plan grows exponentially and the driver, not the data,
  becomes the bottleneck (on a cluster: `checkpoint()` to HDFS/S3 so
  executors can be lost);
* convergence check is a `limit(1).count()` on the changed-label set —
  an early-exit probe, not a full materialization.

The DuckDB oracle computes the same fixpoint declaratively with a
recursive CTE (reachability -> min reachable id), so the two engines
agree on every (doc_id, cluster_id) row exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.dedup.minhash import (
    JACCARD_THRESHOLD,
    _sql_band_exprs,
    _sql_signature_cte,
    dedup_minhash_verified,
)
from cdc_export_system_spark.registry import register


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """(u, v) edge list -> (node, label) with label = min node id of the
    component. Deterministic; O(log n) rounds via pointer jumping."""
    e = edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint()
    labels = (
        e.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # hash-to-min: pull the minimum label across the neighborhood
        nbr = (
            e.join(labels.withColumnRenamed("node", "v2"), e.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, labels.node == nbr.u, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer jumping: label <- label(label), halves chain depth
        lab2 = stepped.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
        stepped = (
            stepped.join(lab2, stepped.label == lab2.n2, "left")
            .select("node", F.coalesce("l2", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            stepped.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = stepped
        if changed == 0:
            break
    return labels


@register(
    "dedup_cluster_cc",
    oracle=f"""
        WITH RECURSIVE {_sql_signature_cte()},
        bands AS ({_sql_band_exprs()}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
        pairs AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN tok ta ON ta.doc_id = c.doc_a
            JOIN tok tb ON tb.doc_id = c.doc_b
            WHERE CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
                    / (len(ta.shingles) + len(tb.shingles)
                       - len(list_intersect(ta.shingles, tb.shingles)))
                  >= {JACCARD_THRESHOLD}),
        e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
        r AS (SELECT u, u AS m FROM (SELECT DISTINCT u FROM e) nodes
              UNION
              SELECT e.u, r.m FROM e JOIN r ON r.u = e.v)
        SELECT u AS doc_id, min(m) AS cluster_id FROM r GROUP BY u
    """,
    tags=("dedup", "minhash", "lsh", "iterative"),
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup endgame: LSH candidates -> Jaccard-verified pairs ->
    connected components -> (doc_id, cluster_id = canonical min doc id).
    Keep `doc_id == cluster_id` rows, drop the rest: that is the dedup."""
    pairs = dedup_minhash_verified(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
