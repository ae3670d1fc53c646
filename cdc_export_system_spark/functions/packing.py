"""Sequence packing: the concat-and-chunk step of an LLM training-data
pipeline (north-star extension; no reference counterpart).

Documents are laid out in doc_id order on a single global token axis;
chunk k owns token positions [k*BUDGET, (k+1)*BUDGET). A document is
assigned to the chunk its first token lands in — the doc-level form of
concat-then-split packing.

The global running token offset is the interesting part at 100 TB: a
naive `sum() OVER (ORDER BY doc_id)` window has no PARTITION BY, so
Spark plans a single-partition sort — one task owns the whole corpus.
Instead this is a **two-level distributed prefix sum**:

1. block := doc_id div BLOCK — a deterministic coarse partition key;
2. within-block running sum: window partitioned BY BLOCK (parallel);
3. block totals: one tiny groupBy (|corpus| / BLOCK rows);
4. exclusive prefix over block totals: single-partition window over the
   tiny block table only (at 100 TB / 4k-doc blocks that is ~25M rows of
   16 bytes — still driver-free, and broadcastable);
5. broadcast-join the block offsets back; global_pos = block_offset +
   within_cum - n_tokens.

The oracle uses the naive global window — same fixpoint, different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.functions.text import tokens
from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

CHUNK_BUDGET = 1024  # tokens per packed training sequence
BLOCK = 4096  # docs per prefix-sum block


def global_token_positions(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, pos_start (global exclusive prefix sum of
    n_tokens in doc_id order) — without a global single-partition sort."""
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(BLOCK))).alias("block"),
    )
    within = t.withColumn(
        "cum_in",
        F.sum("n_tokens").over(W.partitionBy("block").orderBy("doc_id")),
    )
    block_offsets = (
        t.groupBy("block")
        .agg(F.sum("n_tokens").alias("btot"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("btot").over(W.orderBy("block").rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("block", "boff")
    )
    return within.join(F.broadcast(block_offsets), "block").select(
        "doc_id",
        "n_tokens",
        (F.col("boff") + F.col("cum_in") - F.col("n_tokens")).alias("pos_start"),
    )


@register(
    "text_pack_chunks",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                     - n_tokens AS pos_start
            FROM t)
        SELECT CAST(floor(pos_start / {CHUNK_BUDGET}) AS BIGINT) AS chunk_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM c GROUP BY 1
    """,
    tags=("text", "packing", "window"),
)
def text_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 1024-token (CHUNK_BUDGET) training chunks by global
    token offset (distributed two-level prefix sum, see module doc)."""
    docs = load_table(spark, sf_dir, "documents")
    pos = global_token_positions(docs)
    return (
        pos.withColumn(
            "chunk_id", F.floor(F.col("pos_start") / F.lit(CHUNK_BUDGET)).cast("bigint")
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
