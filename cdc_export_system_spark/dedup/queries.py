"""Deduplication operators (SURVEY.md §2.10 + north-star extensions).

Reference trace: the unique email constraint + ON CONFLICT DO NOTHING
ingest (reference: app/models.py:11, app/seed_users.py:42) — first-wins
keyed dedup. Extended with the LLM-pipeline family; the heavier
similarity-based members (MinHash/LSH, SimHash, n-gram Jaccard) live in
sibling modules and register their own queries.

Determinism convention: "keep the first row" is implemented as min(key)
per group — dropDuplicates() keeps an arbitrary row per partition-order,
which can't be oracle-checked, so the engine's canonical keyed dedup is
the aggregate form (same one-shuffle cost, deterministic winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY md5(lower(trim(text)))
    """,
    headline=True,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on the normalized fingerprint.
    One shuffle on the 32-byte digest, never on the document text — at
    100 TB the exchange carries fingerprints, not payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_upsert_key",
    oracle="""
        SELECT source, min(doc_id) AS doc_id
        FROM documents GROUP BY source
    """,
    tags=("dedup",),
)
def dedup_upsert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins keyed dedup — the ON CONFLICT DO NOTHING ingest semantics
    (app/seed_users.py:42), with min(id) as the deterministic 'first'."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(F.min("doc_id").alias("doc_id"))


@register(
    "dedup_latest_per_key",
    oracle="""
        SELECT user_id, event_id, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("dedup", "cdc", "window"),
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog collapse: latest state per key (reference README:335 —
    'only the latest state of each row is exported')."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )
