"""Multimodal binary-column operators (north-star extension).

Design: media payloads are opaque ``binary`` columns; typed metadata
(mime, width, duration, ...) travels in sibling columns. Decode /
feature-extract / resize / frame-sample are mapInPandas operators — the
payload bytes never leave the executor, Python sees them as Arrow
batches, and the output schema is declared up front.

The container has no image/audio libraries, so the actual codec call is
stubbed (`NotImplementedError`) behind an injectable decoder; a
deterministic fake decoder exercises the full Spark-side contract
(schema, batching, partition flow) in tests, and the md5-based feature
extractor below is real and oracle-checkable end to end.

Scale notes: payload columns dominate row size, so operators (a) select
payload columns as late as possible, (b) never shuffle payloads (feature
rows shuffle instead), (c) bound Arrow batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

FEATURE_SCHEMA = "doc_id long, payload_bytes long, digest string, head_hex string"


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition feature extraction over binary payloads: size, md5
    digest, first-8-bytes hex (the 'magic number' a real decoder sniffs)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": payloads.map(len),
                "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
            }
        )


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
    schema: str = "doc_id long, width int, height int, n_frames int",
) -> DataFrame:
    """Decode binary payloads with an injected codec.

    No codec libraries ship in this environment, so the default decoder
    raises NotImplementedError — the Spark plumbing (partition iteration,
    Arrow batches, declared output schema) is the deliverable; tests
    inject a deterministic fake decoder.
    """

    def _default(_: bytes) -> dict:
        raise NotImplementedError(
            "media codec not available in this environment; inject a decoder"
        )

    decode = decoder or _default

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(decoded)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(_run, schema)


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for a real image codec: derives fixed
    'dimensions' from the payload bytes."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 8,
    }


@register(
    "multimodal_extract_features",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS payload_bytes,
               md5(text) AS digest,
               hex(encode(substr(text, 1, 8))) AS head_hex_upper
        FROM documents
    """,
    tags=("multimodal", "udf"),
)
def multimodal_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary pipeline: build payloads (utf-8 bytes of the
    text — deterministic in both engines), run the mapInPandas feature
    extractor, emit metadata rows. Python's hex() is lowercase and
    DuckDB's hex() upper, so the column is uppercased on the Spark side."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = docs.mapInPandas(extract_features, FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "payload_bytes",
        "digest",
        F.upper("head_hex").alias("head_hex_upper"),
    )
