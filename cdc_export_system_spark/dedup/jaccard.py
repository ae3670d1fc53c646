"""Exact n-gram Jaccard near-dup detection (north-star extension).

The exact counterpart to MinHash: distinct 3-gram shingles per doc, then
pairwise Jaccard via the inverted-index join — explode shingles, equi-join
on the shingle, count matches per pair, divide by the union size. Never a
cross join: only docs *sharing a shingle* ever meet, and the join key is
the shingle hash, so at scale the cost is sum over shingles of df^2
(bounded by de-hotting: a shingle shared by thousands of docs carries no
dedup signal, so frequent shingles are dropped, exactly like stop-words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.dedup.minhash import JACCARD_THRESHOLD, _DUCK_SHINGLES, shingles_df
from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

# Shingles appearing in more than this many docs carry no dedup signal
# and would fan the join out quadratically — drop them (df-based stop list).
MAX_SHINGLE_DF = 100

JACCARD_PAIRS_ORACLE = f"""
        WITH tok AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents),
        ex AS (SELECT doc_id, unnest(shingles) AS sh FROM tok),
        keep AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= {MAX_SHINGLE_DF}),
        sizes AS (SELECT doc_id, len(shingles) AS n FROM tok),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
            JOIN keep k ON k.sh = a.sh
            GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               floor(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) * 1000000 + 0.5)
                   / 1000000 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
    """




def _shingle_postings(spark: SparkSession, sf_dir: str):
    """(ex, sizes) for the inverted-index joins: df-capped postings keyed
    on xxhash64 of the shingle (8-byte shuffle keys, the same accepted
    2^-64 collision contract as corpus_decontaminate / the MinHash band
    digest — the oracles keep the string form) plus per-doc set sizes.
    The df cap rides a window over the hash partition (one shuffle, no
    probe-back join), and both frames materialize once — before this,
    every consuming branch re-scanned and re-shingled the corpus (5
    source scans at the round-3 audit)."""
    from pyspark.sql import Window as W

    sh = shingles_df(load_table(spark, sf_dir, "documents"))
    ex = sh.select("doc_id", F.explode("shingles").alias("sh")).select(
        "doc_id", F.xxhash64("sh").alias("gh")
    )
    ex = (
        ex.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("gh")))
        .filter(F.col("c") <= MAX_SHINGLE_DF)
        .select("doc_id", "gh")
        .localCheckpoint(eager=True)
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n")).localCheckpoint(
        eager=True
    )
    return ex, sizes


@register(
    "dedup_ngram_jaccard",
    oracle=JACCARD_PAIRS_ORACLE,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs >= 0.5 via inverted-index join."""
    ex, sizes = _shingle_postings(spark, sf_dir)
    a = ex.select(F.col("doc_id").alias("doc_a"), "gh")
    b = ex.select(F.col("doc_id").alias("doc_b"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(jac * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("jaccard"),
        )
    )


CONTAINMENT_THRESHOLD = 0.8


@register(
    "dedup_containment",
    oracle=f"""
        WITH tok AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents),
        ex AS (SELECT doc_id, unnest(shingles) AS sh FROM tok),
        keep AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= {MAX_SHINGLE_DF}),
        sizes AS (SELECT doc_id, len(shingles) AS n FROM tok),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id <> b.doc_id
            JOIN keep k ON k.sh = a.sh
            GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               floor(CAST(n_common AS DOUBLE) / sa.n * 1000000 + 0.5)
                   / 1000000 AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        WHERE CAST(n_common AS DOUBLE) / sa.n >= {CONTAINMENT_THRESHOLD}
    """,
    tags=("dedup", "jaccard"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B|/|A| >= 0.8: finds documents
    SUBSUMED by another (quotes, mirrors with boilerplate, partial
    scrapes) that symmetric Jaccard misses — a doc 10% the size of its
    superset scores ~0.1 Jaccard but 1.0 containment. Same inverted-
    index join as dedup_ngram_jaccard (only docs sharing a non-stop
    shingle ever meet; directed pairs, so both containment directions
    emerge from one join), normalized by the CONTAINED side's shingle
    count only."""
    ex, sizes = _shingle_postings(spark, sf_dir)
    a = ex.select(F.col("doc_id").alias("doc_a"), "gh")
    b = ex.select(F.col("doc_id").alias("doc_b"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cont = F.col("n_common").cast("double") / F.col("na")
    return (
        inter.join(sa, "doc_a")
        .filter(cont >= CONTAINMENT_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(cont * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("containment"),
        )
    )
