"""12-bit extended sequential JPEG (ITU-T T.81 SOF1, Pq=1 DQT).

Closes the 12-BIT PRECISION leg of the codec seam (carried since r9).
12-bit JPEG is the interchange format of medical imaging (DICOM's
"JPEG Extended (Process 2 & 4)" transfer syntax) and high-bit-depth
scientific capture — corpora a 100 TB multimodal pipeline must not
seam on.

* ``encode_jpeg12`` — 12-bit 3-component YCbCr 4:4:4 from a uint16
  RGB raster (values 0..4095): level shift 2048, the 8-bit
  quantization table scaled x16 (entries up to 976, so the DQT
  carries Pq=1 16-bit values — the structural difference that makes
  12-bit files undecodable by byte-precision parsers), DC categories
  extended to 15 and AC sizes to 14 per the 12-bit table ranges in
  T.81 F.1.2 (our canonical tables are embedded in DHT as always),
  SOF1 (extended sequential) with precision 12.
* decoding — handled inside ``jpeg.decode_jpeg``: SOF1 is accepted
  with precision 8 or 12, Pq=1 DQT entries parse as big-endian
  16-bit, and the level shift / clip range / output dtype derive from
  the frame precision (uint16 raster, codec tag ``jpeg12``).

Exactness contract (mirrors the 8-bit closed form, jpeg.py:31): for a
constant-color 12-bit input every block is DC-only, so per channel

    y'  = clip(round(round(8 * (y - 2048) / 128) * 128 / 8) + 2048)

with q00 = 8*16 = 128 — expressible in DuckDB SQL and the oracle
behind ``multimodal_jpeg12_stats``.

Scale: row-local inside mapInPandas batches like every codec here;
the DCT is one numpy matmul per image's block set; payloads never
shuffle.
"""

from __future__ import annotations

import numpy as np

from cdc_export_system_spark.multimodal.jpeg import (
    QTABLE,
    ZIGZAG,
    _AC_LENGTHS,
    _BitWriter,
    _DC_LENGTHS,
    _canonical_codes,
    _dct2,
    _dht_body,
    _magnitude,
    _make_table,
    _seg,
)

# 12-bit quantization table: the 8-bit table scaled x16 keeps the same
# relative masking curve while forcing Pq=1 (entries up to 976 > 255)
QTABLE12 = QTABLE * 16

# 12-bit Huffman symbol ranges (T.81 F.1.2): DC categories 0..15, AC
# sizes 1..14 — our 8-bit lengths extended with long codes for the
# rare wide symbols (Kraft-checked by _make_table)
_DC12_LENGTHS = dict(_DC_LENGTHS)
for _cat, _len in ((12, 12), (13, 13), (14, 14), (15, 15)):
    _DC12_LENGTHS[_cat] = _len
_AC12_LENGTHS = dict(_AC_LENGTHS)
for _run in range(16):
    for _size in range(1, 15):
        _AC12_LENGTHS.setdefault(_run * 16 + _size, 11)

_DC12_BITS, _DC12_VALS = _make_table(_DC12_LENGTHS)
_AC12_BITS, _AC12_VALS = _make_table(_AC12_LENGTHS)
_DC12_CODES = _canonical_codes(_DC12_BITS, _DC12_VALS)
_AC12_CODES = _canonical_codes(_AC12_BITS, _AC12_VALS)


def _rgb_to_ycbcr12(raster: np.ndarray) -> np.ndarray:
    """12-bit JFIF color transform: same coefficients as 8-bit with
    the chroma center at 2048; rounded to integer samples BEFORE the
    DCT so the constant-color closed form stays integer-exact."""
    r = raster[..., 0].astype(np.float64)
    g = raster[..., 1].astype(np.float64)
    b = raster[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 2048.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 2048.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack(
        [np.floor(y + 0.5), np.floor(cb + 0.5), np.floor(cr + 0.5)], axis=0
    ).clip(0, 4095)


def _encode_block12(w: _BitWriter, block: np.ndarray, pred: int) -> int:
    """One zigzagged block through the 12-bit code tables; returns the
    new DC predictor (same walk as jpeg._encode_block, wider tables)."""
    dc = int(block[0])
    size, bits = _magnitude(dc - pred)
    code, length = _DC12_CODES[size]
    w.put(code, length)
    if size:
        w.put(bits, size)
    run = 0
    ac = block[1:]
    nz = np.nonzero(ac)[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for i in range(last_nz):
        v = int(ac[i])
        if v == 0:
            run += 1
            if run == 16:
                code, length = _AC12_CODES[0xF0]
                w.put(code, length)
                run = 0
            continue
        size, bits = _magnitude(v)
        code, length = _AC12_CODES[run * 16 + size]
        w.put(code, length)
        w.put(bits, size)
        run = 0
    if last_nz < 63:
        code, length = _AC12_CODES[0x00]
        w.put(code, length)
    return dc


def encode_jpeg12(width: int, height: int, raster: bytes) -> bytes:
    """12-bit extended sequential JFIF (SOF1, 4:4:4) from an RGB
    raster of little-endian uint16 samples (h*w*3 values, 0..4095,
    row-major)."""
    img = np.frombuffer(raster, dtype="<u2", count=height * width * 3)
    img = img.reshape(height, width, 3)
    if int(img.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    planes = _rgb_to_ycbcr12(img)
    mcux = -(-width // 8)
    mcuy = -(-height // 8)
    th, tw = mcuy * 8, mcux * 8

    w = _BitWriter()
    pred = [0, 0, 0]
    comp_zz = []
    for c in range(3):
        p = np.pad(
            planes[c],
            ((0, th - height), (0, tw - width)),
            mode="edge",
        )
        blocks = (
            p.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        shifted = blocks - 2048.0
        coeffs = _dct2(shifted)
        # The einsum DCT carries ~1e-12 relative error, and with
        # q00 = 128 the DC ratio 8s/128 = s/16 lands EXACTLY on a
        # floor(x+0.5) boundary whenever s % 16 == 8 — the epsilon
        # would flip the quantized DC vs the SQL closed form. The DC
        # of an orthonormal 8x8 DCT is sum/8 with an integer sum, so
        # compute it exactly: floor(sum/1024 + 0.5) is exact in
        # doubles (sum < 2^18, divisor a power of two) and is
        # literally the closed form's dcq.
        coeffs[:, 0, 0] = shifted.sum(axis=(1, 2)) / 8.0
        q = np.floor(coeffs / QTABLE12 + 0.5).astype(np.int64)
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG].reshape(mcuy, mcux, 64))
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(3):
                pred[c] = _encode_block12(w, comp_zz[c][my, mx], pred[c])
    entropy = w.flush()

    qz = QTABLE12.reshape(64)[ZIGZAG]
    dqt = bytes([0x10]) + b"".join(
        int(qz[i]).to_bytes(2, "big") for i in range(64)
    )  # Pq=1: 16-bit entries
    sof = bytes([12]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    sos = bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x00]) + bytes([3, 0x00]) \
        + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, dqt)
        + _seg(0xC1, sof)  # SOF1: extended sequential, 12-bit
        + _seg(0xC4, _dht_body(0, 0, _DC12_BITS, _DC12_VALS))
        + _seg(0xC4, _dht_body(1, 0, _AC12_BITS, _AC12_VALS))
        + _seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )


def jpeg12_constant_roundtrip(r: int, g: int, b: int) -> tuple[int, int, int]:
    """Closed-form decode(encode(constant 12-bit image)) pixel — the
    SQL-oracle mirror (same derivation as jpeg.jpeg_constant_roundtrip
    with center 2048 and q00 = 128)."""
    q00 = int(QTABLE12[0, 0])

    def rt(sample: float) -> float:
        s = np.floor(sample + 0.5) - 2048.0
        dcq = np.floor(8.0 * s / q00 + 0.5)
        return dcq * q00 / 8.0 + 2048.0

    y = rt(0.299 * r + 0.587 * g + 0.114 * b)
    cb = rt(2048.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)
    cr = rt(2048.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)
    rr = int(np.clip(np.floor(y + 1.402 * (cr - 2048.0) + 0.5), 0, 4095))
    gg = int(np.clip(np.floor(
        y - 0.344136286 * (cb - 2048.0) - 0.714136286 * (cr - 2048.0) + 0.5
    ), 0, 4095))
    bb = int(np.clip(np.floor(y + 1.772 * (cb - 2048.0) + 0.5), 0, 4095))
    return rr, gg, bb
