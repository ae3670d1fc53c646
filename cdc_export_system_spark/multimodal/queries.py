"""Multimodal column plumbing (north-star extension).

Media payloads are opaque ``binary`` columns with typed metadata traveling
beside them. The decode/feature-extract step is a mapInPandas operator
(multimodal.binary_ops) whose library-dependent core is stubbed (no
image/audio libs in this container) — the Spark-side contract (schema,
batching, partitioning) is real and tested.

The oracle-checked query here exercises the binary column path end to end
with a deterministic payload derived from documents.text (utf-8 encode),
so both engines see identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS payload_bytes,
               md5(text) AS payload_md5,
               CASE WHEN octet_length(encode(text)) > 1024 THEN 'large' ELSE 'small' END
                   AS size_class
        FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata: byte length, content digest, size
    class. encode() builds the binary column; everything stays JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("payload_bytes"),
        F.md5(F.col("text")).alias("payload_md5"),
        F.when(F.length(payload) > 1024, "large").otherwise("small").alias("size_class"),
    )
