"""Multimodal binary-column operators (north-star extension).

Design: media payloads are opaque ``binary`` columns; typed metadata
(mime, width, duration, ...) travels in sibling columns. Decode /
feature-extract / resize / frame-sample are mapInPandas operators — the
payload bytes never leave the executor, Python sees them as Arrow
batches, and the output schema is declared up front.

The container has no image/audio libraries, but uncompressed formats
need none: `multimodal.codecs` ships real pure-Python PPM (P6) and
24-bit BMP parsers, and `decode_media` uses them by default — the
injectable-decoder seam (`NotImplementedError`) now fires only for
codecs with no in-tree parser (JPEG/PNG/audio). A deterministic fake
decoder additionally exercises the Spark-side contract (schema,
batching, partition flow) in tests, and the md5-based feature
extractor below is real and oracle-checkable end to end.

Scale notes: payload columns dominate row size, so operators (a) select
payload columns as late as possible, (b) never shuffle payloads (feature
rows shuffle instead), (c) bound Arrow batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
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

    The default decoder is the in-tree pure-Python codec suite
    (multimodal.codecs.sniff_decode: real PPM/P6 and 24-bit BMP
    parsers); payloads whose magic matches no in-tree codec raise
    NotImplementedError — that injectable seam remains for richer
    codecs (JPEG/PNG/audio) that need libraries this container lacks.
    """

    def _default(b: bytes) -> dict:
        from cdc_export_system_spark.multimodal.codecs import sniff_decode

        d = sniff_decode(b)
        return {
            "width": d["width"],
            "height": d["height"],
            "n_frames": d["n_frames"],
        }

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


RESIZE_BOX = 224  # aspect-fit target box (e.g. vision-model input side)


def resize_media(
    df: DataFrame,
    resizer: Callable[[bytes, int, int, int, int], bytes] | None = None,
    box: int = RESIZE_BOX,
    schema: str = "doc_id long, in_w int, in_h int, out_w int, out_h int, out_bytes long",
) -> DataFrame:
    """Aspect-fit resize of binary media with an injected codec.

    Input rows carry (doc_id, payload, in_w, in_h). The output dims are
    exact integer aspect-fit math (computed here, library-free); producing
    the resized payload itself needs a codec, so the default resizer is a
    deterministic fake whose output size is the uncompressed RGB raster
    (out_w * out_h * 3) — tests inject real/fake codecs through the same
    seam. Payload bytes never shuffle: this is a pure mapInPandas stage.
    """

    def _fake(payload: bytes, in_w: int, in_h: int, out_w: int, out_h: int) -> bytes:
        return b"\0" * (out_w * out_h * 3)

    resize = resizer or _fake

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["in_w"].astype("int64")
            h = pdf["in_h"].astype("int64")
            # floor(small_int * box / max_side) in double is exact here:
            # numerators < 2^53 and true quotients are never within an ulp
            # of an integer unless exactly integral.
            out_w = np.where(w >= h, box, np.floor(w * box / h)).astype("int64")
            out_h = np.where(w >= h, np.floor(h * box / w), box).astype("int64")
            out_bytes = [
                len(resize(bytes(p), int(iw), int(ih), int(ow), int(oh)))
                for p, iw, ih, ow, oh in zip(pdf["payload"], w, h, out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_w": w.astype("int32"),
                    "in_h": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "out_bytes": out_bytes,
                }
            )

    return df.mapInPandas(_run, schema)


FRAME_BYTES = 64  # fake codec frame size
FRAME_STRIDE = 2  # sample every 2nd frame
MAX_FRAMES = 4096  # hard cap, mirrored in the oracle's generate_series bound


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling over binary 'video' payloads: split the payload
    into FRAME_BYTES-sized frames, keep every FRAME_STRIDE-th, emit one
    row per sampled frame (doc_id, frame_idx, frame_bytes, frame_md5).
    A real codec would decode frames; the byte-chunk framing exercises
    the identical fan-out contract (1 row in -> k rows out)."""
    for pdf in batches:
        ids, idxs, sizes, digests = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = min((len(b) + FRAME_BYTES - 1) // FRAME_BYTES, MAX_FRAMES)
            for i in range(0, n, FRAME_STRIDE):
                frame = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(i)
                sizes.append(len(frame))
                digests.append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_md5": digests}
        )


@register(
    "multimodal_resize",
    oracle=f"""
        SELECT doc_id,
               CAST(64 + (length(text) * 7) % 192 AS INT) AS in_w,
               CAST(64 + (doc_id * 13) % 192 AS INT) AS in_h,
               CAST(CASE WHEN (64 + (length(text) * 7) % 192) >= (64 + (doc_id * 13) % 192)
                    THEN {RESIZE_BOX}
                    ELSE floor((64 + (length(text) * 7) % 192) * {RESIZE_BOX}.0
                               / (64 + (doc_id * 13) % 192)) END AS INT) AS out_w,
               CAST(CASE WHEN (64 + (length(text) * 7) % 192) >= (64 + (doc_id * 13) % 192)
                    THEN floor((64 + (doc_id * 13) % 192) * {RESIZE_BOX}.0
                               / (64 + (length(text) * 7) % 192))
                    ELSE {RESIZE_BOX} END AS INT) AS out_h,
               CAST(CASE WHEN (64 + (length(text) * 7) % 192) >= (64 + (doc_id * 13) % 192)
                    THEN {RESIZE_BOX} * floor((64 + (doc_id * 13) % 192) * {RESIZE_BOX}.0
                               / (64 + (length(text) * 7) % 192))
                    ELSE floor((64 + (length(text) * 7) % 192) * {RESIZE_BOX}.0
                               / (64 + (doc_id * 13) % 192)) * {RESIZE_BOX} END * 3 AS BIGINT)
                   AS out_bytes
        FROM documents
    """,
    tags=("multimodal", "udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: payload + decoded dims in, aspect-fit dims +
    resized-payload size out. The dims are derived deterministically from
    the payload (stand-in for a decoder), so the oracle can mirror the
    arithmetic exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(64) + (F.length("text") * 7) % 192).cast("int").alias("in_w"),
        (F.lit(64) + (F.col("doc_id") * 13) % 192).cast("int").alias("in_h"),
    )
    return resize_media(docs)


@register(
    "multimodal_frame_sample",
    oracle=f"""
        SELECT d.doc_id, CAST(gs.i AS INTEGER) AS frame_idx,
               CAST(length(substr(d.text, CAST(gs.i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES}))
                   AS INTEGER) AS frame_bytes,
               md5(substr(d.text, CAST(gs.i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES}))
                   AS frame_md5
        FROM documents d
        JOIN generate_series(0, {MAX_FRAMES - 1}) gs(i)
          ON gs.i * {FRAME_BYTES} < length(d.text) AND gs.i % {FRAME_STRIDE} = 0
    """,
    tags=("multimodal", "udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out: one input payload row -> one row per
    sampled frame, entirely executor-side (text is ASCII in the testdata,
    so the oracle's char-substr equals the operator's byte slicing)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(
        sample_frames, "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"
    )


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
