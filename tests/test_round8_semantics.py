"""Round-8 semantic pins for the ADVICE.md r07 items.

1. event_alert_debounce: first_alert_id is min(event_id) over ALL
   emitted alerts (the oracle's definition), not the id of the
   temporally-first emission — distinguishable only when event ids are
   not monotone with ts.
2. ts_ewma_crossover: the sign test runs in DECIMAL(38,0) / HUGEINT, so
   daily cents far above the old ~2^20 BIGINT product bound neither
   throw nor diverge from the oracle.
3. session: the local driver-heap default derives from MemAvailable and
   clamps to [2, 16] GiB.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cdc_export_system_spark.operators.analytics import event_alert_debounce
from cdc_export_system_spark.operators.timeseries import ts_ewma_crossover
from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import _local_driver_mem_gb
from tests.parity import compare


def test_alert_debounce_min_id_over_all_emitted(spark, tmp_path):
    """Non-monotone ids: user 7 emits at t (id=50) and t+20m (id=3);
    id=1 lands at t+5m but is SUPPRESSED. first_alert_id must be 3 —
    min over emitted alerts — not 50 (temporally first) and not 1
    (min over all alerts)."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (50, t0, 7, "error", 99.0, "{}"),
        (1, t0 + pd.Timedelta(minutes=5), 7, "error", 99.0, "{}"),
        (3, t0 + pd.Timedelta(minutes=20), 7, "error", 99.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r["user_id"]: r
        for r in event_alert_debounce(spark, str(tmp_path)).collect()
    }
    assert got[7]["n_emitted"] == 2
    assert got[7]["n_suppressed"] == 1
    assert got[7]["first_alert_id"] == 3


def test_alert_debounce_oracle_parity_non_monotone_ids(spark, tmp_path):
    """Same construction, checked END TO END against the registered
    DuckDB oracle (the r07 ADVICE scenario: ids shuffled against ts
    used to hash-match only by luck of the testdata)."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows, rid = [], 1000
    for uid in range(5):
        for k in range(6):
            rid -= 17  # ids strictly DECREASE while ts increases
            rows.append(
                (rid, t0 + pd.Timedelta(minutes=7 * k + uid), uid,
                 "error", 99.0, "{}")
            )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    res = compare(
        event_alert_debounce(spark, str(tmp_path)),
        con,
        load_all()["event_alert_debounce"].oracle,
    )
    assert res["match"], res


def test_ewma_crossover_huge_daily_cents_matches_oracle(spark, tmp_path):
    """Daily cents ~1.2e8 (>> the old ~2^20 product bound) over 41 days:
    s7 * 2^40 ~ 9e20 would have thrown ANSI ArithmeticException in
    BIGINT; with DECIMAL(38,0)/HUGEINT both engines stay exact and
    hash-identical."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows, eid = [], 0
    for uid in (1, 2):
        for d in range(41):
            for h in (2, 14):  # two events/day
                eid += 1
                # big, varying values so fast/slow actually cross
                v = 600_000.0 + 250_000.0 * ((d * 7 + h + uid * 3) % 11)
                rows.append(
                    (eid, t0 + pd.Timedelta(days=d, hours=h), uid,
                     "purchase", v, "{}")
                )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    res = compare(
        ts_ewma_crossover(spark, str(tmp_path)),
        con,
        load_all()["ts_ewma_crossover"].oracle,
    )
    assert res["match"], res
    assert res["spark_rows"] == 2


def test_ewma_crossover_still_guards_past_41_days(spark, tmp_path):
    """The rn <= 40 loud guard survives the DECIMAL rewrite: a 42-day
    series must still fail loudly (the truncation contract), not wrap."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (d + 1, t0 + pd.Timedelta(days=d), 1, "view", 10.0, "{}")
        for d in range(42)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    with pytest.raises(Exception, match="re-anchor|ASSERT"):
        ts_ewma_crossover(spark, str(tmp_path)).collect()


def test_local_driver_mem_default_clamped():
    assert 2 <= _local_driver_mem_gb() <= 16


# ---------------------------------------------------------------------------
# PNG codec (VERDICT r07 item 6): a real COMPRESSED format in-tree
# ---------------------------------------------------------------------------


def _rand_raster(w, h, seed=7):
    import numpy as np

    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (31, 17), (64, 48)])
def test_png_roundtrip_exact(w, h):
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        decode_png, encode_png, png_payload_bytes_level0, sniff_decode,
    )

    raster = _rand_raster(w, h)
    for lvl in (0, 6, 9):
        p = encode_png(w, h, raster.tobytes(), level=lvl)
        d = decode_png(p)
        assert (d["width"], d["height"], d["codec"]) == (w, h, "png")
        assert np.array_equal(d["raster"], raster)
    p0 = encode_png(w, h, raster.tobytes(), level=0)
    assert len(p0) == png_payload_bytes_level0(w, h)
    assert sniff_decode(p0)["codec"] == "png"


def test_png_level0_size_formula_past_one_stored_block():
    """D = h*(3w+1) > 65535 forces a second stored deflate block; the
    closed-form size must track the per-block 5-byte headers."""
    from cdc_export_system_spark.multimodal.codecs import (
        encode_png, png_payload_bytes_level0,
    )

    w, h = 200, 120  # D = 72120 > 65535
    raster = _rand_raster(w, h)
    p = encode_png(w, h, raster.tobytes(), level=0)
    assert len(p) == png_payload_bytes_level0(w, h)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_unfilter_all_filter_types(ftype):
    """The encoder only emits filter 0; the DECODER must reverse all
    five. Apply the forward filter by hand (per the PNG spec) and check
    the decoder reconstructs the original raster bit-exactly."""
    import zlib

    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        _PNG_SIG, _png_chunk, decode_png,
    )

    w, h = 13, 9
    raster = _rand_raster(w, h, seed=ftype)
    row = w * 3
    flat = raster.reshape(h, row).astype(np.int32)
    out = bytearray()
    prev = np.zeros(row, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        line = np.zeros(row, dtype=np.int32)
        for x in range(row):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p_ = a + b - c
                pa, pb, pc = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(ftype)
        out += bytes(line.astype(np.uint8))
        prev = cur
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload)["raster"], raster)


def test_wav_roundtrip_exact():
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        decode_wav, encode_wav, sniff_decode,
    )

    rng = np.random.RandomState(11)
    samples = rng.randint(-32768, 32767, 777, dtype=np.int16)
    p = encode_wav(16000, samples)
    assert len(p) == 44 + 2 * 777
    d = decode_wav(p)
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (16000, 1, 777)
    assert d["duration_us"] == 777 * 1_000_000 // 16000
    assert np.array_equal(d["samples"].reshape(-1), samples)
    assert sniff_decode(p)["codec"] == "wav"


def test_wav_stereo_and_chunk_skip():
    """Interleaved stereo frames reshape to (n, 2); an unknown chunk
    (LIST) before data is skipped per the RIFF spec, including the
    odd-size word-alignment pad."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import decode_wav, encode_wav

    inter = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)  # 3 frames x 2ch
    p = encode_wav(8000, inter, channels=2)
    d = decode_wav(p)
    assert d["channels"] == 2 and d["n_frames"] == 3
    assert np.array_equal(d["samples"], inter.reshape(3, 2))
    # splice an odd-sized LIST chunk between fmt and data
    head, rest = p[:36], p[36:]
    lst = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded
    d2 = decode_wav(head + lst + rest)
    assert np.array_equal(d2["samples"], inter.reshape(3, 2))


def test_wav_unsupported_variant_keeps_seam():
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import decode_wav, encode_wav

    p = bytearray(encode_wav(8000, np.zeros(4, dtype=np.int16)))
    p[20:22] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(NotImplementedError, match="WAV variant"):
        decode_wav(bytes(p))


def test_png_unsupported_variants_keep_seam():
    from cdc_export_system_spark.multimodal.codecs import (
        _PNG_SIG, _png_chunk, decode_png,
    )

    # grayscale (color type 0) keeps the injectable seam
    ihdr = (5).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes(
        [8, 0, 0, 0, 0]
    )
    payload = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="PNG variant"):
        decode_png(payload)
