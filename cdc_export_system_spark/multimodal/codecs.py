"""Pure-Python image codecs for the multimodal decode seam.

The container ships no image libraries, but two classic uncompressed
formats are parseable with nothing beyond the standard library + numpy:

* **PPM (P6)** — the netpbm binary RGB raster: an ASCII header
  (``P6 <width> <height> <maxval>`` with whitespace/comment separators)
  followed by ``width*height*3`` sample bytes.
* **BMP (Windows, BITMAPINFOHEADER, BI_RGB 24-bit)** — little-endian
  binary headers, bottom-up rows padded to 4-byte boundaries.

``sniff_decode`` dispatches on the payload's magic bytes and is the
default decoder behind ``binary_ops.decode_media`` — the documented
``NotImplementedError`` seam now fires only for genuinely unknown
codecs, and real pixels flow through the Spark plumbing end to end
(reference parity: the reference system stores opaque blobs and never
decodes; this is north-star extension surface).

Scale: codecs run row-locally inside mapInPandas batches; payload bytes
never shuffle. numpy does the raster math (vectorized per image), so
the per-row Python cost is header parsing only.
"""

from __future__ import annotations

import re

import numpy as np

_PPM_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([0-9]+)")


def encode_ppm(width: int, height: int, raster: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from a row-major RGB raster."""
    if len(raster) != width * height * 3:
        raise ValueError(
            f"raster is {len(raster)} bytes; want {width}x{height}x3"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + raster


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6): header tokens may be separated by any
    whitespace and ``#`` comments per the netpbm spec. Returns width,
    height, n_frames, and the raster as a (h, w, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals = []
    for _ in range(3):  # width, height, maxval
        m = _PPM_TOKEN.match(payload, pos)
        if not m:
            raise ValueError("truncated PPM header")
        vals.append(int(m.group(1)))
        pos = m.end()
    width, height, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # exactly one whitespace byte after maxval, per spec
    n = width * height * 3
    if len(payload) - pos < n:
        raise ValueError("truncated PPM raster")
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return {
        "codec": "ppm",
        "width": width,
        "height": height,
        "n_frames": 1,
        "raster": raster.reshape(height, width, 3),
    }


def _le(n: int, size: int) -> bytes:
    return int(n).to_bytes(size, "little", signed=True)


def encode_bmp(width: int, height: int, raster: bytes) -> bytes:
    """24-bit BI_RGB Windows BMP from a row-major RGB raster (top-down
    input; stored bottom-up with 4-byte row padding, BGR sample order,
    as the format requires)."""
    if len(raster) != width * height * 3:
        raise ValueError(
            f"raster is {len(raster)} bytes; want {width}x{height}x3"
        )
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR within pixel
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = b"".join(
        bgr[r].tobytes() + b"\0" * pad for r in range(height)
    )
    data_offset = 14 + 40
    file_size = data_offset + len(rows)
    header = (
        b"BM" + _le(file_size, 4) + b"\0\0\0\0" + _le(data_offset, 4)
        + _le(40, 4) + _le(width, 4) + _le(height, 4)  # positive: bottom-up
        + _le(1, 2) + _le(24, 2) + _le(0, 4)           # planes, bpp, BI_RGB
        + _le(len(rows), 4) + _le(2835, 4) + _le(2835, 4)
        + _le(0, 4) + _le(0, 4)
    )
    return header + rows


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed (BI_RGB) BMP with a 40+ byte DIB
    header. Handles bottom-up (height > 0) and top-down (height < 0)
    storage and skips row padding. Returns the raster as (h, w, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")

    def le(off: int, size: int, signed: bool = False) -> int:
        return int.from_bytes(payload[off : off + size], "little", signed=signed)

    data_offset = le(10, 4)
    dib_size = le(14, 4)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    width = le(18, 4, signed=True)
    height_raw = le(22, 4, signed=True)
    bpp = le(28, 2)
    compression = le(30, 4)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP variant not supported (bpp={bpp}, compression={compression})"
        )
    height = abs(height_raw)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * height
    if width <= 0 or height == 0 or len(payload) < need:
        raise ValueError("truncated or degenerate BMP raster")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :row_bytes].reshape(height, width, 3)
    if height_raw > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    rgb = rows[:, :, ::-1]  # stored BGR -> RGB
    return {
        "codec": "bmp",
        "width": width,
        "height": height,
        "n_frames": 1,
        "raster": np.ascontiguousarray(rgb),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + _z.crc32(tag + body).to_bytes(4, "big")
    )


def encode_png(
    width: int, height: int, raster: bytes, *, level: int = 6
) -> bytes:
    """Truecolor 8-bit PNG (color type 2, no interlace) from a row-major
    RGB raster; every scanline uses filter type 0. ``level=0`` emits
    stored (uncompressed) deflate blocks, which makes the payload size
    a closed-form function of (w, h) — the property the decode-dims
    oracle hash-checks; the default level 6 is a normal compressed
    stream.

    The level-0 stream is assembled by ``_zlib_stored`` rather than
    ``zlib.compress(..., 0)``: maximal 65535-byte stored blocks are a
    compressor implementation detail, not a DEFLATE-format guarantee,
    so the layout the closed form (``png_payload_bytes_level0``) and
    its SQL oracle depend on is emitted by our own code."""
    import zlib as _z

    if len(raster) != width * height * 3:
        raise ValueError(
            f"raster is {len(raster)} bytes; want {width}x{height}x3"
        )
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, color 2 (RGB), no interlace
    )
    row = width * 3
    scanlines = b"".join(
        b"\x00" + raster[y * row : (y + 1) * row] for y in range(height)
    )
    idat = _zlib_stored(scanlines) if level == 0 else _z.compress(scanlines, level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _zlib_stored(data: bytes) -> bytes:
    """A zlib stream of stored (BTYPE=00) deflate blocks, each at the
    65535-byte LEN maximum — self-owned layout so the closed-form size
    (6 + D + 5*ceil(D/65535), min one block) never depends on which
    block segmentation a zlib build happens to choose at level 0.
    Decodable by any inflate implementation (including our decode_png)."""
    import zlib as _z

    out = [b"\x78\x01"]  # CMF/FLG: deflate, 32K window, checksum-valid
    n = len(data)
    nblocks = max(1, -(-n // 65535))
    for i in range(nblocks):
        chunk = data[i * 65535 : (i + 1) * 65535]
        final = 1 if i == nblocks - 1 else 0
        ln = len(chunk)
        out.append(bytes([final]))
        out.append(ln.to_bytes(2, "little"))
        out.append((ln ^ 0xFFFF).to_bytes(2, "little"))
        out.append(chunk)
    out.append(_z.adler32(data).to_bytes(4, "big"))
    return b"".join(out)


def _png_unfilter(raw: np.ndarray, height: int, row: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth).
    Rows are sequential by construction (each references the one
    above); Up is vectorized, the left-referencing filters run a
    per-byte loop over one row at a time."""
    out = np.zeros((height, row), dtype=np.uint8)
    stride = row + 1
    prev = np.zeros(row, dtype=np.int32)
    for y in range(height):
        ftype = int(raw[y * stride])
        line = raw[y * stride + 1 : (y + 1) * stride].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(row, dtype=np.int32)
            for x in range(row):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # above
                if ftype == 1:  # Sub
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(payload: bytes) -> dict:
    """Parse an 8-bit truecolor (color type 2), non-interlaced PNG:
    chunk walk, concatenated-IDAT zlib inflate, scanline unfilter
    (all five filter types). Other color types / bit depths /
    interlacing keep the injectable NotImplementedError seam."""
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color, _comp, _filt, interlace = body[8:13]
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError(
                    "PNG variant not supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    row = width * 3
    raw = np.frombuffer(_z.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != (row + 1) * height:
        raise ValueError("PNG scanline data has wrong length")
    raster = _png_unfilter(raw, height, row, bpp=3)
    return {
        "codec": "png",
        "width": width,
        "height": height,
        "n_frames": 1,
        "raster": raster.reshape(height, width, 3),
    }


def png_payload_bytes_level0(width: int, height: int) -> int:
    """Closed-form encoded size of ``encode_png(..., level=0)``: stored
    deflate blocks make the stream length pure arithmetic — 8 (sig) +
    25 (IHDR) + 12 (IEND) + 12 (IDAT framing) + zlib header/adler (6)
    + D data bytes + 5 per stored block, D = h*(3w+1). The decode-dims
    oracle replicates this expression in SQL."""
    d = height * (3 * width + 1)
    blocks = max(1, -(-d // 65535))
    return 57 + 6 + d + 5 * blocks


def encode_wav(
    sample_rate: int, samples: np.ndarray, *, channels: int = 1
) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, 16-bit PCM little-endian.
    ``samples`` is an int16 array (interleaved if multi-channel);
    encoded size is the closed form 44 + 2 * len(samples)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    return (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


# ---------------------------------------------------------------------------
# G.711 companding (μ-law / A-law) — the classic telephony codecs, and the
# repo's COMPRESSED-audio leg of the codec matrix. Semantics follow the
# canonical public-domain Sun Microsystems g711.c (the implementation inside
# ffmpeg/sox/asterisk): 16-bit linear <-> 8-bit logarithmic, segment +
# 4-bit mantissa. The roundtrip decode(encode(x)) is closed-form integer
# arithmetic (see g711_roundtrip_*), which is what the SQL oracle mirrors.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def g711_mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> μ-law bytes (vectorized Sun g711.c linear2ulaw)."""
    x = np.asarray(samples, dtype=np.int32)
    neg = x < 0
    m = np.where(neg, -x, x)
    m = np.minimum(m, _ULAW_CLIP) + _ULAW_BIAS
    # segment = bit_length(m) - 8, m in [132, 32767] -> seg in 0..7
    seg = (
        (m > 0xFF).astype(np.int32)
        + (m > 0x1FF)
        + (m > 0x3FF)
        + (m > 0x7FF)
        + (m > 0xFFF)
        + (m > 0x1FFF)
        + (m > 0x3FFF)
    )
    uval = (seg << 4) | ((m >> (seg + 3)) & 0xF)
    mask = np.where(neg, 0x7F, 0xFF)
    return (uval ^ mask).astype(np.uint8)


def g711_mulaw_decode(data: np.ndarray) -> np.ndarray:
    """μ-law bytes -> int16 linear (Sun g711.c ulaw2linear)."""
    u = ~np.asarray(data, dtype=np.uint8)
    t = ((u.astype(np.int32) & 0x0F) << 3) + _ULAW_BIAS
    t <<= (u >> 4) & 0x07
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def g711_alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> A-law bytes (vectorized Sun g711.c linear2alaw:
    13-bit domain, seg boundaries 0x1F..0xFFF, mantissa xor 0x55)."""
    p13 = np.asarray(samples, dtype=np.int32) >> 3
    neg = p13 < 0
    m = np.where(neg, -p13 - 1, p13)
    seg = (
        (m > 0x1F).astype(np.int32)
        + (m > 0x3F)
        + (m > 0x7F)
        + (m > 0xFF)
        + (m > 0x1FF)
        + (m > 0x3FF)
        + (m > 0x7FF)
    )
    aval = (seg << 4) | ((m >> np.maximum(seg, 1)) & 0xF)
    mask = np.where(neg, 0x55, 0xD5)
    return (aval ^ mask).astype(np.uint8)


def g711_alaw_decode(data: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear (Sun g711.c alaw2linear)."""
    a = np.asarray(data, dtype=np.uint8) ^ 0x55
    q = (a.astype(np.int32) & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0, q + 8, (q + 0x108) << np.maximum(seg.astype(np.int32) - 1, 0)
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def g711_roundtrip_mulaw(m: int) -> int:
    """Closed-form |decode(encode(±m))| for a magnitude 0 <= m <= 32635
    (symmetric in sign) — the SQL-oracle mirror: v = m + 132, seg =
    bit_length(v) - 8 (>= 0), back out the quantized magnitude."""
    v = min(m, _ULAW_CLIP) + _ULAW_BIAS
    seg = max(v.bit_length() - 8, 0)
    return (((((v >> (seg + 3)) & 0xF) << 3) + _ULAW_BIAS) << seg) - _ULAW_BIAS


def g711_roundtrip_alaw(x: int) -> int:
    """Closed-form decode(encode(x)) for a SIGNED 16-bit x — A-law is
    NOT sign-symmetric (the negative path offsets by -1 in the 13-bit
    domain), so the mirror takes the signed value."""
    p13 = x >> 3
    m = -p13 - 1 if p13 < 0 else p13
    seg = max(m.bit_length() - 5, 0)
    q = (m >> max(seg, 1)) & 0xF
    t = q * 16 + 8 if seg == 0 else (q * 16 + 0x108) << (seg - 1)
    return -t if p13 < 0 else t


_WAV_G711_TAGS = {"mulaw": 7, "alaw": 6}


def encode_wav_g711(
    sample_rate: int, samples: np.ndarray, *, law: str = "mulaw"
) -> bytes:
    """RIFF/WAVE with G.711-compressed samples: format tag 7 (μ-law) or
    6 (A-law), 8 bits/sample, the spec-required 18-byte fmt chunk
    (cbSize=0) and a fact chunk carrying the frame count — so the
    closed-form container size is 58 + n bytes for n mono frames."""
    try:
        tag = _WAV_G711_TAGS[law]
    except KeyError:
        raise ValueError(f"unsupported companding law {law!r}") from None
    enc = g711_mulaw_encode if law == "mulaw" else g711_alaw_encode
    data = enc(np.asarray(samples, dtype=np.int16)).tobytes()
    n = len(data)
    return (
        b"RIFF"
        + (50 + n).to_bytes(4, "little")  # 4 (WAVE) + 26 (fmt) + 12 (fact) + 8 + n
        + b"WAVEfmt "
        + (18).to_bytes(4, "little")
        + tag.to_bytes(2, "little")
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")  # byte rate: 1 byte/frame
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits/sample
        + (0).to_bytes(2, "little")  # cbSize
        + b"fact"
        + (4).to_bytes(4, "little")
        + n.to_bytes(4, "little")
        + b"data"
        + n.to_bytes(4, "little")
        + data
    )


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — the classic 4-bit predictive codec
# (telephony, game audio, DVI). Unlike G.711's memoryless companding, ADPCM
# is a STATE MACHINE: a predictor plus an 89-entry step-size ladder evolve
# per sample, and each block restarts from a 4-byte header carrying the
# exact first sample and the running step index. decode(encode(x)) is
# deterministic integer arithmetic, so the SQL oracle can replay the whole
# state machine as a recursive CTE (see multimodal_audio_adpcm_stats).
# ---------------------------------------------------------------------------

ADPCM_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_ADPCM_INDEX_DELTA = (-1, -1, -1, -1, 2, 4, 6, 8)  # by nibble magnitude


def _adpcm_step(pred: int, index: int, sample: int) -> tuple[int, int, int]:
    """Encode one sample against (pred, index): returns (nibble,
    new_pred, new_index). The reconstruction inside mirrors the decoder
    exactly (same vpdiff), which is what keeps encoder and decoder
    state locked together."""
    step = int(ADPCM_STEPS[index])
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    vpdiff = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
        vpdiff += step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
        vpdiff += step >> 1
    if diff >= step >> 2:
        nib |= 1
        vpdiff += step >> 2
    pred = pred - vpdiff if nib & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _ADPCM_INDEX_DELTA[nib & 7]))
    return nib, pred, index


def _adpcm_decode_nibble(pred: int, index: int, nib: int) -> tuple[int, int]:
    step = int(ADPCM_STEPS[index])
    vpdiff = step >> 3
    if nib & 4:
        vpdiff += step
    if nib & 2:
        vpdiff += step >> 1
    if nib & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nib & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _ADPCM_INDEX_DELTA[nib & 7]))
    return pred, index


def encode_wav_adpcm(
    sample_rate: int, samples: np.ndarray, *, block_align: int = 256
) -> bytes:
    """RIFF/WAVE with IMA ADPCM samples: format tag 0x11, 4 bits per
    sample, mono. Each ``block_align``-byte block carries a 4-byte
    header (exact first sample int16 LE, running step index, reserved
    0) plus (block_align-4)*2 nibble-coded samples, LOW nibble first;
    the fmt chunk's cbSize=2 extension declares samplesPerBlock and a
    fact chunk carries the true frame count (the final block 0-pads)."""
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be a multiple of 4, >= 8")
    s = np.asarray(samples, dtype=np.int16).astype(int)
    spb = (block_align - 4) * 2 + 1
    n = len(s)
    index = 0
    data = bytearray()
    for b0 in range(0, max(n, 1), spb):
        block = s[b0 : b0 + spb]
        pred = int(block[0]) if len(block) else 0
        data += int(pred).to_bytes(2, "little", signed=True)
        data += bytes([index, 0])
        nibs = []
        for v in block[1:]:
            nib, pred, index = _adpcm_step(pred, index, int(v))
            nibs.append(nib)
        while len(nibs) < (block_align - 4) * 2:  # 0-pad the last block
            pred, index = _adpcm_decode_nibble(pred, index, 0)
            nibs.append(0)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            data.append(lo | (hi << 4))
    nblocks = len(data) // block_align
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    return (
        b"RIFF"
        + (52 + len(data)).to_bytes(4, "little")  # WAVE + fmt(28) + fact(12) + data hdr
        + b"WAVEfmt "
        + (20).to_bytes(4, "little")
        + (0x11).to_bytes(2, "little")  # IMA/DVI ADPCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")  # bits/sample
        + (2).to_bytes(2, "little")  # cbSize
        + spb.to_bytes(2, "little")  # samplesPerBlock
        + b"fact"
        + (4).to_bytes(4, "little")
        + n.to_bytes(4, "little")
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def _adpcm_decode_blocks(
    data: bytes, block_align: int, spb: int, n_frames: int
) -> np.ndarray:
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < block_align:
            raise ValueError("truncated ADPCM block")
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = block[2]
        if index > 88:
            raise ValueError(f"ADPCM step index {index} out of range")
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                pred, index = _adpcm_decode_nibble(pred, index, nib)
                out.append(pred)
    if len(out) < n_frames:
        raise ValueError("ADPCM data shorter than fact frame count")
    return np.array(out[:n_frames], dtype=np.int16)


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE 16-bit PCM: chunk walk (fmt then data; unknown
    chunks skipped per spec), returns sample_rate, channels, n_samples
    (frames), duration in exact microseconds, and the samples as an
    (n_frames, channels) int16 array. Compressed formats keep the
    injectable NotImplementedError seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    fact = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # mirror decode_png's strictness: a data chunk claiming more
            # bytes than remain must error, not yield a silently
            # shortened sample array / wrong n_frames
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact":
            fact = int.from_bytes(body[:4], "little")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 16:
        encoding = "pcm16"
        n_vals = len(data) // 2
        samples = np.frombuffer(data, dtype="<i2", count=n_vals)
    elif audio_format in (6, 7) and bits == 8:
        # G.711: A-law (6) / μ-law (7) — expand to 16-bit linear
        encoding = "alaw" if audio_format == 6 else "mulaw"
        raw = np.frombuffer(data, dtype=np.uint8)
        dec = g711_alaw_decode if audio_format == 6 else g711_mulaw_decode
        samples = dec(raw)
        n_vals = len(samples)
    elif audio_format == 0x11 and bits == 4:
        # IMA/DVI ADPCM — mono, block-structured, fact-counted
        encoding = "ima_adpcm"
        if channels != 1:
            raise NotImplementedError("multi-channel ADPCM")
        block_align = int.from_bytes(fmt[12:14], "little")
        if len(fmt) >= 20:
            spb = int.from_bytes(fmt[18:20], "little")
        else:
            spb = (block_align - 4) * 2 + 1
        if spb != (block_align - 4) * 2 + 1:
            raise ValueError("inconsistent ADPCM samplesPerBlock")
        max_frames = (len(data) // block_align) * spb
        n_frames = fact if fact is not None else max_frames
        samples = _adpcm_decode_blocks(data, block_align, spb, n_frames)
        n_vals = len(samples)
    else:
        raise NotImplementedError(
            f"WAV variant not supported (format={audio_format}, bits={bits})"
        )
    n_frames = n_vals // max(channels, 1)
    return {
        "codec": "wav",
        "encoding": encoding,
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_us": (n_frames * 1_000_000) // sample_rate,
        "samples": samples[: n_frames * channels].reshape(n_frames, channels),
    }


def sniff_decode(payload: bytes) -> dict:
    """Magic-byte dispatch over the in-tree codecs. Unknown codecs keep
    the documented injectable seam: NotImplementedError, so callers can
    inject a richer decoder without touching the Spark plumbing."""
    head = bytes(payload[:2])
    if head == b"P6":
        return decode_ppm(payload)
    if head == b"BM":
        return decode_bmp(payload)
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png(payload)
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE":
        return decode_wav(payload)
    if head == b"\xff\xd8":
        from cdc_export_system_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"no in-tree codec for magic {head!r}; inject a decoder"
    )


def resize_nearest(raster: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) raster — the standard
    index-mapping form: src_i = floor((dst_i + 0.5) * in/out)."""
    in_h, in_w = raster.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64).clip(0, in_h - 1)
    xs = ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64).clip(0, in_w - 1)
    return raster[np.ix_(ys, xs)]


def real_resizer(
    payload: bytes, in_w: int, in_h: int, out_w: int, out_h: int
) -> bytes:
    """A working resizer for binary_ops.resize_media's injection seam:
    decode (PPM/BMP), nearest-neighbor resample, re-encode as PPM."""
    dec = sniff_decode(payload)
    out = resize_nearest(dec["raster"], out_w, out_h)
    return encode_ppm(out_w, out_h, np.ascontiguousarray(out).tobytes())
