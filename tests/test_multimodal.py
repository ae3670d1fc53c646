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


# ---------------------------------------------------------------------------
# G.711 companding (the compressed-audio codec leg, closed in r11)
# ---------------------------------------------------------------------------


def test_g711_roundtrip_matches_closed_form_exhaustively():
    """decode(encode(x)) must equal the closed-form mirrors over the
    ENTIRE int16 domain for both laws — the property the SQL oracle of
    multimodal_audio_g711_stats replicates segment-by-segment."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        g711_alaw_decode,
        g711_alaw_encode,
        g711_mulaw_decode,
        g711_mulaw_encode,
        g711_roundtrip_alaw,
        g711_roundtrip_mulaw,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    mu = g711_mulaw_decode(g711_mulaw_encode(x)).astype(np.int64)
    al = g711_alaw_decode(g711_alaw_encode(x)).astype(np.int64)
    exp_mu = np.array(
        [g711_roundtrip_mulaw(abs(int(v))) * (1 if v >= 0 else -1) for v in x]
    )
    exp_al = np.array([g711_roundtrip_alaw(int(v)) for v in x])
    assert np.array_equal(mu, exp_mu)
    assert np.array_equal(al, exp_al)
    # companders are idempotent on their own output (quantizer fixed points)
    assert np.array_equal(g711_mulaw_decode(g711_mulaw_encode(mu.astype(np.int16))), mu)
    assert np.array_equal(g711_alaw_decode(g711_alaw_encode(al.astype(np.int16))), al)


def test_g711_known_anchor_bytes():
    """Spot anchors every conformant G.711 implementation shares:
    mu-law encodes 0 -> 0xFF and decodes 0xFF -> 0; A-law's smallest
    positive cell decodes to +8; max-magnitude cells decode to 32124
    (mu) / 32256 (A)."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        g711_alaw_decode,
        g711_mulaw_decode,
        g711_mulaw_encode,
    )

    assert int(g711_mulaw_encode(np.array([0], dtype=np.int16))[0]) == 0xFF
    assert int(g711_mulaw_decode(np.array([0xFF], dtype=np.uint8))[0]) == 0
    # mu byte 0x80 = max positive cell; A byte 0xAA (0xFF^0x55) likewise
    assert int(g711_mulaw_decode(np.array([0x80], dtype=np.uint8))[0]) == 32124
    assert int(g711_alaw_decode(np.array([0xAA], dtype=np.uint8))[0]) == 32256
    # A-law: aval 0x80 (sign|seg0|q0) ^ 0x55 = 0xD5 decodes to +8
    assert int(g711_alaw_decode(np.array([0xD5], dtype=np.uint8))[0]) == 8


def test_g711_wav_container_roundtrip_and_unknown_tag_seam():
    """The WAV chunk walk must dispatch tags 6/7 to the expanders (58+n
    closed-form size) and keep the NotImplementedError seam for tags it
    has no decoder for (e.g. IMA ADPCM 0x11)."""
    import numpy as np
    import pytest as _pytest

    from cdc_export_system_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_g711,
        g711_alaw_decode,
        g711_alaw_encode,
        g711_mulaw_decode,
        g711_mulaw_encode,
    )

    s = np.array([700, -700, 12345, -12345, 0, 31000], dtype=np.int16)
    for law, enc, dec in (
        ("mulaw", g711_mulaw_encode, g711_mulaw_decode),
        ("alaw", g711_alaw_encode, g711_alaw_decode),
    ):
        p = encode_wav_g711(8000, s, law=law)
        assert len(p) == 58 + len(s)
        d = decode_wav(p)
        assert d["encoding"] == law and d["n_frames"] == len(s)
        assert np.array_equal(d["samples"].reshape(-1), dec(enc(s)))
    # unknown compressed tag keeps the injectable seam
    p = bytearray(encode_wav_g711(8000, s, law="mulaw"))
    p[20] = 0x11  # fmt tag -> IMA ADPCM
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(p))
