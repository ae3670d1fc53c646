"""Progressive JPEG (ITU-T T.81 SOF2) — spectral selection AND
successive approximation, both directions.

This closes the PROGRESSIVE leg of the codec seam (carried since r9).
Progressive files dominate web corpora (every libjpeg ``-progressive``
output, most CDN-optimized images), so a 100 TB multimodal crawl cannot
seam on them.

* ``encode_jpeg_progressive`` — 8-bit 3-component 4:4:4, an 8-scan
  script exercising BOTH progressive mechanisms: interleaved DC first
  scan at Al=1 then a DC refinement bit-scan; per-component AC first
  scans (spectral band 1..63 at Al=1, EOBn run coding) then AC
  refinement scans (correction bits, T.81 G.1.2.3). Quantization is
  shared with the sequential encoder (``jpeg._quantized_blocks``), so
  a progressive file carries bit-identical coefficients to its
  sequential sibling — the property the equality pin and the SQL
  oracle both lean on.
* ``decode_jpeg_progressive`` — the general SOF2 decoder: any scan
  script (spectral bands in any order, any Ah/Al ladder, interleaved
  DC scans, per-component AC scans with the true — not MCU-padded —
  block dims), EOBRUN carry across blocks, and the refinement
  correction-bit walk ported from the public T.81 G.2 / libjpeg
  ``decode_mcu_AC_refine`` algorithm. Restart intervals inside
  progressive scans keep an injectable ``NotImplementedError`` seam
  (our encoder never emits them; sequential DRI files decode fully).

Scale: like the sequential codec this runs row-locally inside
mapInPandas batches; the scan state (per-component coefficient grids)
is one image's blocks, never shuffled.
"""

from __future__ import annotations

import numpy as np

from cdc_export_system_spark.multimodal.jpeg import (
    QTABLE,
    ZIGZAG,
    _AC_LENGTHS,
    _BitReader,
    _BitWriter,
    _DC_BITS,
    _DC_CODES,
    _DC_VALS,
    _SUBSAMPLING,
    _build_decode_table,
    _canonical_codes,
    _dht_body,
    _huff_decode,
    _extend,
    _magnitude,
    _make_table,
    _quantized_blocks,
    _seg,
    _ycbcr_to_rgb,
    _idct2,
)

# progressive AC table = sequential symbols + EOBn (n = 1..14, RS = n<<4)
_ACP_LENGTHS = dict(_AC_LENGTHS)
for _n in range(1, 15):
    _ACP_LENGTHS[_n << 4] = 8
_ACP_BITS, _ACP_VALS = _make_table(_ACP_LENGTHS)
_ACP_CODES = _canonical_codes(_ACP_BITS, _ACP_VALS)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

# (component | None=interleaved-DC, Ss, Se, Ah, Al): one successive-
# approximation level (Al=1 first passes, then full-precision refinements)
# over DC and the whole AC band of each component.
_SCAN_SCRIPT = [
    (None, 0, 0, 0, 1),
    (0, 1, 63, 0, 1),
    (1, 1, 63, 0, 1),
    (2, 1, 63, 0, 1),
    (None, 0, 0, 1, 0),
    (0, 1, 63, 1, 0),
    (1, 1, 63, 1, 0),
    (2, 1, 63, 1, 0),
]


def _ac_point(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign reapplied (T.81 —
    'divide by 2^Al toward zero'; DC uses a plain arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


class _EobState:
    """Cross-block EOB-run accumulator for AC scans (first passes carry
    no correction bits; refinement passes buffer them until the run or
    the next symbol flushes)."""

    def __init__(self, w: _BitWriter) -> None:
        self.w = w
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run:
            n = self.run.bit_length() - 1
            code, length = _ACP_CODES[n << 4]
            self.w.put(code, length)
            if n:
                self.w.put(self.run - (1 << n), n)
            self.run = 0
        for b in self.bits:
            self.w.put(b, 1)
        self.bits = []


def _encode_dc_scan(w, zz, mcux, mcuy, ah, al) -> None:
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(3):
                t = int(zz[c][my, mx, 0]) >> al  # arithmetic shift (T.81 DC)
                if ah == 0:
                    diff = t - pred[c]
                    pred[c] = t
                    size, bits = _magnitude(diff)
                    code, length = _DC_CODES[size]
                    w.put(code, length)
                    if size:
                        w.put(bits, size)
                else:
                    w.put(t & 1, 1)  # refinement: one raw bit per block


def _encode_ac_first(w, zzc, ss, se, al) -> None:
    eob = _EobState(w)
    rows, cols = zzc.shape[:2]
    for r0 in range(rows):
        for c0 in range(cols):
            band = [_ac_point(int(v), al) for v in zzc[r0, c0, ss : se + 1]]
            nz = [k for k, v in enumerate(band) if v]
            if not nz:
                eob.run += 1
                if eob.run == 0x7FFF:
                    eob.flush()
                continue
            eob.flush()
            run = 0
            for k in range(nz[-1] + 1):
                v = band[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _ACP_CODES[0xF0]
                    w.put(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = _ACP_CODES[run * 16 + size]
                w.put(code, length)
                w.put(bits, size)
                run = 0
            if nz[-1] + 1 < len(band):
                eob.run += 1
                if eob.run == 0x7FFF:
                    eob.flush()
    eob.flush()


def _encode_ac_refine(w, zzc, ss, se, al) -> None:
    """T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine shape): newly-
    significant coefficients (|t|==1) code as (run, 1) + sign bit over
    ZERO-HISTORY positions; already-significant ones emit buffered
    correction bits after each symbol; all-quiet blocks join the EOB
    run, their correction bits buffered with it."""
    eob = _EobState(w)
    rows, cols = zzc.shape[:2]
    for r0 in range(rows):
        for c0 in range(cols):
            raw = [int(v) for v in zzc[r0, c0, ss : se + 1]]
            absv = [(-v if v < 0 else v) >> al for v in raw]
            last_new = -1
            for k, a in enumerate(absv):
                if a == 1:
                    last_new = k
            run = 0
            pend: list[int] = []  # correction bits since the last symbol
            for k in range(last_new + 1):
                a = absv[k]
                if a == 0:
                    run += 1
                    continue
                # ZRL drain at EVERY nonzero coefficient (libjpeg
                # encode_mcu_AC_refine): correction bits buffered so far
                # belong positionally BEFORE the 16-zero span, so they
                # must flush with this ZRL — draining only at newly-
                # significant coefficients puts later already-significant
                # bits on the wrong side of the symbol and desyncs the
                # decoder's walk.
                while run > 15:
                    eob.flush()
                    code, length = _ACP_CODES[0xF0]
                    w.put(code, length)
                    run -= 16
                    for b in pend:
                        w.put(b, 1)
                    pend = []
                if a > 1:  # significant in an earlier scan
                    pend.append(a & 1)
                    continue
                # newly significant (|t| == 1)
                eob.flush()
                code, length = _ACP_CODES[run * 16 + 1]
                w.put(code, length)
                w.put(1 if raw[k] > 0 else 0, 1)
                for b in pend:
                    w.put(b, 1)
                pend = []
                run = 0
            # tail: any position after the last new significance (zero-
            # history zeros AND correction bits) puts the block in the
            # EOB run — the decoder's EOB phase walks those positions
            for k in range(last_new + 1, len(absv)):
                if absv[k] > 1:
                    pend.append(absv[k] & 1)
            if last_new + 1 < len(absv):
                eob.run += 1
                eob.bits.extend(pend)
                if eob.run == 0x7FFF:
                    eob.flush()
    eob.flush()


def encode_jpeg_progressive(
    width: int, height: int, raster: bytes, scan_script=None
) -> bytes:
    """Progressive JFIF (SOF2, 4:4:4) from an RGB24 raster. Runs the
    8-scan ladder in _SCAN_SCRIPT (or an explicit ``scan_script`` of
    (comp|None, Ss, Se, Ah, Al) tuples — spectral-band splits and
    deeper successive-approximation ladders for the generality tests);
    coefficients are the SAME quantized values the sequential encoder
    emits, so decode(progressive) == decode(sequential) bit-for-bit."""
    factors = _SUBSAMPLING["444"]
    comp_blocks, mcux, mcuy = _quantized_blocks(width, height, raster, factors)
    # (rows, cols, 64) zigzag-vector coefficient grids per component
    zz = [cb.reshape(cb.shape[0], cb.shape[1], 64)[:, :, ZIGZAG] for cb in comp_blocks]

    chunks = []
    for comp, ss, se, ah, al in (scan_script or _SCAN_SCRIPT):
        w = _BitWriter()
        if comp is None:
            _encode_dc_scan(w, zz, mcux, mcuy, ah, al)
            ncomp = bytes([3]) + b"".join(
                bytes([cid, 0x00]) for cid in (1, 2, 3)
            )
        else:
            if ah == 0:
                _encode_ac_first(w, zz[comp], ss, se, al)
            else:
                _encode_ac_refine(w, zz[comp], ss, se, al)
            ncomp = bytes([1, comp + 1, 0x00])
        sos = ncomp + bytes([ss, se, ah * 16 + al])
        chunks.append(_seg(0xDA, sos) + w.flush())

    qz = bytes(int(QTABLE.reshape(64)[ZIGZAG][i]) for i in range(64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, bytes([0]) + qz)
        + _seg(0xC2, sof)  # SOF2: progressive
        + _seg(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
        + _seg(0xC4, _dht_body(1, 0, _ACP_BITS, _ACP_VALS))
        + b"".join(chunks)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_dc_scan(reader, scan, frame, htables, coef, mcux, mcuy, ah, al):
    """Interleaved (or single-component) DC scan: Ah=0 -> predicted
    diff decode at Al; Ah>0 -> one refinement bit per block."""
    h, w, comps = frame
    comp_map = {c[0]: c for c in comps}
    ns = len(scan)
    pred = [0] * ns
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for si, (cs, dct, _act) in enumerate(scan):
                cidx = next(i for i, c in enumerate(comps) if c[0] == cs)
                _cid, hi, vi, _tq = comp_map[cs]
                if ns == 1:
                    hi = vi = 1  # non-interleaved: walk the comp grid
                for dy in range(vi):
                    for dx in range(hi):
                        by, bx = my * vi + dy, mx * hi + dx
                        if ah == 0:
                            size = _huff_decode(reader, htables[(0, dct)])
                            diff = _extend(reader.bits(size), size)
                            pred[si] += diff
                            coef[cidx][by, bx, 0] = pred[si] << al
                        else:
                            if reader.bit():
                                coef[cidx][by, bx, 0] |= 1 << al


def _decode_ac_first(reader, actable, zzc, brows, bcols, ss, se, al, eobrun):
    for r0 in range(brows):
        for c0 in range(bcols):
            if eobrun[0] > 0:
                eobrun[0] -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(reader, actable)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun[0] = (1 << r) + (reader.bits(r) if r else 0) - 1
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                zzc[r0, c0, k] = _extend(reader.bits(s), s) << al
                k += 1


def _decode_ac_refine(reader, actable, zzc, brows, bcols, ss, se, al, eobrun):
    """T.81 G.2 / libjpeg decode_mcu_AC_refine: walk the band reading
    correction bits for already-significant coefficients; (run, 1)
    symbols place new ±2^Al values after `run` zero-history zeros."""
    p1 = 1 << al
    m1 = -(1 << al)
    for r0 in range(brows):
        for c0 in range(bcols):
            k = ss
            if eobrun[0] == 0:
                while k <= se:
                    rs = _huff_decode(reader, actable)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun[0] = (1 << r) + (reader.bits(r) if r else 0)
                            break  # -> EOB phase below (this block included)
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        newval = p1 if reader.bit() else m1
                    while k <= se:
                        cur = int(zzc[r0, c0, k])
                        if cur != 0:
                            if reader.bit():
                                if (cur & p1) == 0:
                                    zzc[r0, c0, k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        zzc[r0, c0, k] = newval
                    k += 1
            if eobrun[0] > 0:
                while k <= se:
                    cur = int(zzc[r0, c0, k])
                    if cur != 0:
                        if reader.bit():
                            if (cur & p1) == 0:
                                zzc[r0, c0, k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun[0] -= 1


def decode_jpeg_progressive(payload: bytes) -> dict:
    """Progressive (SOF2) JPEG -> dict with dims and an (h, w, 3) uint8
    RGB raster. Accumulates coefficients across an arbitrary scan
    script, then dequantizes + IDCTs once at EOI."""
    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    coef = None  # per-component (rows, cols, 64) zigzag coefficient grids
    geom = None  # (mcux, mcuy, hmax, vmax, per-comp true block dims)
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(d[pos + 2 : pos + 4], "big")
        body = d[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC2:  # SOF2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hmax % hi or vmax % vi:
                    raise NotImplementedError("non-integer sampling ratios")
            frame = (h, w, comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coef = []
            truedims = []
            for _cid, hi, vi, _tq in comps:
                coef.append(
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                )
                ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
                truedims.append((-(-ch // 8), -(-cw // 8)))
            geom = (mcux, mcuy, hmax, vmax, truedims)
        elif marker == 0xC4:
            b = body
            while b:
                tclass, ident = b[0] >> 4, b[0] & 15
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                htables[(tclass, ident)] = _build_decode_table(bits, vals)
                b = b[17 + n :]
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
            if restart_interval:
                raise NotImplementedError(
                    "restart intervals in progressive scans"
                )
        elif marker == 0xDA:
            if frame is None or coef is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            mcux, mcuy, hmax, vmax, truedims = geom
            h, w, comps = frame
            reader = _BitReader(d, pos + 2 + seglen)
            if ss == 0:  # DC scan (se must be 0 per spec)
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                if ns == 1:
                    cidx = next(
                        i for i, c in enumerate(comps) if c[0] == scan[0][0]
                    )
                    brows, bcols = truedims[cidx]
                    _decode_dc_scan(
                        reader, scan, frame, htables, coef, bcols, brows, ah, al
                    )
                else:
                    _decode_dc_scan(
                        reader, scan, frame, htables, coef, mcux, mcuy, ah, al
                    )
            else:  # AC scan: exactly one component (T.81 constraint)
                if ns != 1:
                    raise ValueError("interleaved AC scan is not legal")
                cs, _dct, act = scan[0]
                cidx = next(i for i, c in enumerate(comps) if c[0] == cs)
                brows, bcols = truedims[cidx]
                eobrun = [0]  # scan-local per T.81 (resets at every SOS)
                if ah == 0:
                    _decode_ac_first(
                        reader, htables[(1, act)], coef[cidx],
                        brows, bcols, ss, se, al, eobrun,
                    )
                else:
                    _decode_ac_refine(
                        reader, htables[(1, act)], coef[cidx],
                        brows, bcols, ss, se, al, eobrun,
                    )
            pos = reader.pos
            continue
        pos += 2 + seglen
    if frame is None or coef is None:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    # reconstruct: de-zigzag, dequantize, IDCT, upsample, color-convert
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        gh, gw = coef[ci].shape[:2]
        nat = np.zeros((gh, gw, 64), dtype=np.int64)
        nat[:, :, ZIGZAG] = coef[ci]
        deq = nat.reshape(-1, 8, 8) * qtables[tq]
        spatial = _idct2(deq.astype(np.float64)) + 128.0
        plane = (
            spatial.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    if len(comps) == 3:
        raster = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    elif len(comps) == 1:
        g = np.floor(planes[0] + 0.5).clip(0, 255).astype(np.uint8)
        raster = np.stack([g, g, g], axis=-1)
    else:
        raise NotImplementedError(f"{len(comps)}-component frame")
    return {
        "codec": "jpeg_progressive",
        "width": w,
        "height": h,
        "channels": 3,
        "raster": raster,
    }
