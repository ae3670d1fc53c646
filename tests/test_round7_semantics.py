"""Round-7 semantic pins: new guards and operators added this round."""

from __future__ import annotations

import pytest

from cdc_export_system_spark.dedup.substring import (
    WINNOW_K,
    winnow_fingerprints,
)


def test_winnowing_oversize_doc_fails_loudly(spark):
    """A document with >= 2^20 grams must FAIL the job (assert_true),
    not silently select corrupted fingerprints: the (2^20 - pos) pad
    would go negative and break the string-MIN tie-break ordering.
    Pins the advisor-flagged guard (dedup/substring.py)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    n_tokens = (1 << 20) + WINNOW_K  # grams = tokens - K + 1 > 2^20
    big = spark.range(1).selectExpr(
        "CAST(id AS BIGINT) AS doc_id",
        f"array_join(transform(sequence(1, {n_tokens}),"
        " i -> CAST(i % 97 AS STRING)), ' ') AS text",
    )
    with pytest.raises(SparkRuntimeException, match="_POS_PAD"):
        winnow_fingerprints(big).count()


def test_winnowing_guard_transparent_for_valid_docs(spark):
    """The guard must be a no-op on in-bound documents: fingerprints of
    a small constructed doc are identical to the hand-derivable set."""
    doc = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    rows = winnow_fingerprints(doc).collect()
    assert rows, "valid doc must still yield fingerprints"
    assert all(1 <= r["pos"] <= 5 for r in rows)


# ---------------------------------------------------------------------------
# pure-Python image codecs (multimodal/codecs.py)
# ---------------------------------------------------------------------------


def _checker_raster(w, h):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = ((x + y) % 2 * 255).astype(np.uint8)
    g = (x * 7 % 256).astype(np.uint8)
    b = (y * 13 % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (7, 1)])
def test_ppm_roundtrip_exact(w, h):
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import decode_ppm, encode_ppm

    raster = _checker_raster(w, h)
    d = decode_ppm(encode_ppm(w, h, raster.tobytes()))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
    assert np.array_equal(d["raster"], raster)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (4, 4)])
def test_bmp_roundtrip_exact(w, h):
    """BMP storage is bottom-up, BGR, 4-byte padded — the decoder must
    undo all three. Widths 1/2/3 exercise every pad size (1..3 bytes)."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import decode_bmp, encode_bmp

    raster = _checker_raster(w, h)
    payload = encode_bmp(w, h, raster.tobytes())
    assert payload[:2] == b"BM"
    stride = (w * 3 + 3) // 4 * 4
    assert len(payload) == 54 + stride * h
    d = decode_bmp(payload)
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["raster"], raster)


def test_ppm_header_comments_and_whitespace():
    """netpbm headers permit comments and arbitrary whitespace between
    tokens — a real parser handles them; a hardcoded-split one breaks."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import decode_ppm

    raster = _checker_raster(3, 2).tobytes()
    payload = b"P6 # comment\n# full line\n 3\t2 # dims\n255\n" + raster
    d = decode_ppm(payload)
    assert (d["width"], d["height"]) == (3, 2)
    assert np.array_equal(d["raster"].tobytes(), raster)


def test_sniff_decode_unknown_magic_keeps_seam():
    from cdc_export_system_spark.multimodal.codecs import sniff_decode

    # The seam probe migrates as real decoders land: PNG gained one in
    # round 8, JPEG in round 9 — so the injectable seam is now
    # exercised by compressed-audio magics, which remain out of tree.
    with pytest.raises(NotImplementedError):
        sniff_decode(b"OggS ogg garbage")
    with pytest.raises(NotImplementedError):
        sniff_decode(b"ID3\x04 mp3 garbage")
    # and a real-but-corrupt JPEG now reaches the REAL decoder and
    # fails loudly there, not through the seam
    with pytest.raises(ValueError):
        sniff_decode(b"\xff\xd8\xff\xe0 jpeg garbage")


def test_decode_media_default_real_codecs(spark):
    """decode_media with NO injected decoder must now decode real BMP
    and PPM payloads through the Spark plumbing (VERDICT r06 item 7:
    the NotImplementedError seam is reachable only for unknown codecs)."""
    from cdc_export_system_spark.multimodal.binary_ops import decode_media
    from cdc_export_system_spark.multimodal.codecs import encode_bmp, encode_ppm

    rows = [
        (1, bytearray(encode_ppm(4, 3, _checker_raster(4, 3).tobytes()))),
        (2, bytearray(encode_bmp(5, 2, _checker_raster(5, 2).tobytes()))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["n_frames"])
           for r in decode_media(df).collect()}
    assert got == {1: (4, 3, 1), 2: (5, 2, 1)}


def test_resize_real_codec_end_to_end(spark):
    """resize_media with the REAL resizer: decode -> nearest-neighbor ->
    re-encode PPM; output payload must itself decode to the target dims
    and solid-color images must survive resampling byte-exactly."""
    import numpy as np

    from cdc_export_system_spark.multimodal.codecs import (
        decode_ppm,
        encode_ppm,
        real_resizer,
        resize_nearest,
    )

    solid = np.full((6, 8, 3), 77, dtype=np.uint8)
    out_payload = real_resizer(encode_ppm(8, 6, solid.tobytes()), 8, 6, 4, 3)
    d = decode_ppm(out_payload)
    assert (d["width"], d["height"]) == (4, 3)
    assert np.all(d["raster"] == 77)
    # nearest-neighbor must pick true source pixels (membership property)
    src = _checker_raster(8, 6)
    out = resize_nearest(src, 4, 3)
    src_px = {tuple(p) for row in src for p in row}
    assert all(tuple(p) in src_px for row in out for p in row)


# ---------------------------------------------------------------------------
# triangle block-partitioned self-join (similarity/queries.py)
# ---------------------------------------------------------------------------


def test_triangle_sides_exactly_once_pairs(spark):
    """Every unordered pair must meet in EXACTLY one task after the
    triangle_pair_filter — no lost pairs (coverage) and no double
    counting (the bug class the scheme's role asymmetry exists to
    prevent). Checked against the brute-force pair set."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from cdc_export_system_spark.similarity.queries import (
        triangle_pair_filter,
        triangle_sides,
    )

    n = 57  # not a multiple of the block count: uneven blocks
    df = spark.range(n).select(F.col("id").alias("vid"))
    ta, tb = triangle_sides(df, "vid", n_blocks=4)
    a = ta.select("_tj", "_blk_a", F.col("vid").alias("id_a"))
    b = tb.select("_tj", "_blk_b", F.col("vid").alias("id_b"))
    got = (
        a.join(b, "_tj")
        .filter(triangle_pair_filter())
        .select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
        )
        .collect()
    )
    pairs = [(r["lo"], r["hi"]) for r in got]
    assert len(pairs) == len(set(pairs)), "a pair met in more than one task"
    assert set(pairs) == set(combinations(range(n), 2)), "pairs lost"


def test_ewma_crossover_matches_float_replica(spark):
    """ts_ewma_crossover's integer sign tests vs a float EWMA replica on
    the real sf0.001 series: the exact rational fast line equals the
    float recurrence to ~1 ulp, so away from exact ties every sign and
    crossover count must agree."""
    import pandas as pd

    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.timeseries import (
        EWMA_SLOW_DAYS,
        ts_ewma_crossover,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in ts_ewma_crossover(spark, sf).collect()}

    ev = load_table(spark, sf, "events").select("user_id", "ts", "value").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = (ev["value"] * 100 + 0.5).map(lambda x: int(x // 1))
    daily = (
        ev.groupby(["user_id", "day"], as_index=False)["cents"].sum()
        .sort_values(["user_id", "day"])
    )
    for uid, g in daily.groupby("user_id"):
        ys = list(g["cents"])
        fast = ys[0]
        signs = []
        for t, y in enumerate(ys):
            if t:
                fast = fast / 2 + y / 2
            lo = max(0, t - (EWMA_SLOW_DAYS - 1))
            win = ys[lo : t + 1]
            slow = sum(win) / len(win)
            signs.append(0 if fast == slow else (1 if fast > slow else -1))
        crossings = sum(
            1 for p, s in zip(signs, signs[1:]) if p * s == -1
        )
        row = got[uid]
        assert row["n_days"] == len(ys)
        assert row["n_crossovers"] == crossings, (uid, signs)
        assert row["last_signal"] == signs[-1]
        assert abs(row["fast_final"] - fast / 100) < 1e-6


def test_markov_removal_hand_case(spark, tmp_path):
    """Constructed journeys with a hand-derivable answer: every
    converting path goes through 'click', so removing click must zero
    the conversion probability and click takes the whole share; 'view'
    appears only on non-converting paths, so its removal effect is 0."""
    import pandas as pd

    from cdc_export_system_spark.operators.analytics import (
        attribution_markov_removal,
    )

    # user 1: click -> purchase (converts)   user 2: view (drops)
    # user 3: click -> purchase (converts)   user 4: view (drops)
    rows = []
    eid = 0
    for uid, types in [(1, ["click", "purchase"]), (2, ["view"]),
                       (3, ["click", "purchase"]), (4, ["view"])]:
        for i, et in enumerate(types):
            eid += 1
            rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                         uid, et, 1.0, "{}"))
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet")
    got = {r["channel"]: r for r in
           attribution_markov_removal(spark, str(tmp_path)).collect()}
    # base: 2 of 4 journeys convert -> 500000 micro
    assert got["click"]["base_conv_micro"] == 500_000
    assert got["click"]["removed_conv_micro"] == 0
    assert got["click"]["removal_effect_micro"] == 500_000
    assert got["click"]["share_ppm"] == 1_000_000
    assert got["view"]["removal_effect_micro"] == 0
    assert got["view"]["share_ppm"] == 0


def test_alert_debounce_not_lag_suppression(spark, tmp_path):
    """The docstring's defining case: alerts at t, t+10m, t+20m with a
    15-minute cooldown emit the 1st and 3rd — lag-based suppression
    (silence anything within 15m of the PREVIOUS ALERT) would wrongly
    silence the 3rd because its predecessor is only 10m away."""
    import pandas as pd

    from cdc_export_system_spark.operators.analytics import (
        event_alert_debounce,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, t0, 7, "error", 99.0, "{}"),
        (2, t0 + pd.Timedelta(minutes=10), 7, "error", 99.0, "{}"),
        (3, t0 + pd.Timedelta(minutes=20), 7, "error", 99.0, "{}"),
        (4, t0, 8, "view", 10.0, "{}"),  # below threshold: not an alert
    ]
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet")
    got = {r["user_id"]: r for r in
           event_alert_debounce(spark, str(tmp_path)).collect()}
    assert set(got) == {7}
    assert got[7]["n_alerts"] == 3
    assert got[7]["n_emitted"] == 2  # t and t+20m; t+10m suppressed
    assert got[7]["n_suppressed"] == 1
    assert got[7]["first_alert_id"] == 1
