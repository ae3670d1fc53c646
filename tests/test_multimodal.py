"""Multimodal binary-operator pins: the codec-injection seams and the
fan-out/fan-in contracts that the oracle parity suite can't see (it only
checks the default deterministic codecs)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.multimodal.binary_ops import (
    FRAME_BYTES,
    FRAME_STRIDE,
    decode_media,
    fake_decoder,
    resize_media,
    sample_frames,
)
from tests.conftest import SF_DIR


def _payload_docs(spark, n=20):
    return (
        load_table(spark, SF_DIR, "documents")
        .limit(n)
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )


def test_decode_media_default_raises(spark):
    # no codec libs in this container: the default decoder must fail loudly,
    # not silently fabricate media properties
    df = decode_media(_payload_docs(spark, 2))
    with pytest.raises(Exception, match="NotImplementedError|codec not available"):
        df.collect()


def test_decode_media_injected_codec(spark):
    rows = decode_media(_payload_docs(spark, 10), decoder=fake_decoder).collect()
    assert len(rows) == 10
    for r in rows:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["n_frames"] <= 8


def test_resize_media_aspect_fit_and_injected_resizer(spark):
    docs = _payload_docs(spark, 30).select(
        "doc_id",
        "payload",
        (F.lit(64) + (F.length("payload") * 7) % 192).cast("int").alias("in_w"),
        (F.lit(64) + (F.col("doc_id") * 13) % 192).cast("int").alias("in_h"),
    )
    payload_len = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.length("payload").alias("n")).collect()
    }
    seen = resize_media(docs, resizer=lambda p, iw, ih, ow, oh: p[: ow + oh]).collect()
    assert len(seen) == 30
    for r in seen:
        # aspect fit: long side pinned to the box, short side scaled down
        assert max(r["out_w"], r["out_h"]) == 224
        assert r["out_w"] <= 224 and r["out_h"] <= 224
        # scaled side preserves the aspect ratio within integer truncation
        if r["in_w"] >= r["in_h"]:
            assert r["out_h"] == r["in_h"] * 224 // r["in_w"]
        else:
            assert r["out_w"] == r["in_w"] * 224 // r["in_h"]
        # the injected resizer's output size is observed, not the fake's
        assert r["out_bytes"] == min(r["out_w"] + r["out_h"], payload_len[r["doc_id"]])


def test_frame_sample_fanout_matches_python(spark):
    rows = (
        _payload_docs(spark, 15)
        .mapInPandas(sample_frames, "doc_id long, frame_idx int, frame_bytes int, frame_md5 string")
        .collect()
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").limit(15).collect()
    }
    expected = {}
    for doc_id, text in texts.items():
        b = text.encode()
        n = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
        for i in range(0, n, FRAME_STRIDE):
            frame = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
            expected[(doc_id, i)] = (len(frame), hashlib.md5(frame).hexdigest())
    got = {(r["doc_id"], r["frame_idx"]): (r["frame_bytes"], r["frame_md5"]) for r in rows}
    assert got == expected
