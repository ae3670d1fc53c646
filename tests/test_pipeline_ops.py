"""Algorithmic pins for the training-pipeline operators added beyond the
oracle surface: connected components on adversarial graph shapes, packing
conservation invariants, hash-sampling composability."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_export_system_spark.dedup.cluster import connected_components
from cdc_export_system_spark.functions.packing import (
    CHUNK_BUDGET,
    global_token_positions,
)
from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.operators.sampling import KNUTH
from tests.conftest import SF_DIR


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = connected_components(df).collect()
    return {r["node"]: r["label"] for r in rows}


def test_cc_path_graph(spark):
    # a 16-node path is the worst case for plain min-propagation
    # (diameter 15); pointer jumping must still converge inside max_iter
    labels = _cc(spark, [(i, i + 1) for i in range(15)])
    assert labels == {i: 0 for i in range(16)}


def test_cc_two_components_and_star(spark):
    edges = [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    labels = _cc(spark, edges)
    assert {k: v for k, v in labels.items() if k < 10} == {1: 1, 2: 1, 3: 1}
    assert {k: v for k, v in labels.items() if k >= 10} == {10: 10, 11: 10, 12: 10, 13: 10}


def test_packing_conserves_tokens_and_order(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pos = global_token_positions(docs).orderBy("doc_id").collect()
    # exclusive prefix sum: each doc starts where the previous ended
    expect = 0
    for r in pos:
        assert r["pos_start"] == expect
        expect += r["n_tokens"]
    # chunk axis covers every token exactly once
    total_tokens = sum(r["n_tokens"] for r in pos)
    from cdc_export_system_spark.functions.packing import text_pack_chunks

    chunks = text_pack_chunks(spark, SF_DIR).collect()
    assert sum(c["chunk_tokens"] for c in chunks) == total_tokens
    # every chunk's doc range is disjoint and ordered
    spans = sorted((c["chunk_id"], c["first_doc"], c["last_doc"]) for c in chunks)
    for (_, _, last), (_, first, _) in zip(spans, spans[1:]):
        assert first > last


def test_hash_sample_is_partition_invariant(spark):
    orders = load_table(spark, SF_DIR, "orders")
    pred = (F.col("o_orderkey") * F.lit(KNUTH)) % 1000 < 50
    base = {r["o_orderkey"] for r in orders.filter(pred).select("o_orderkey").collect()}
    resharded = {
        r["o_orderkey"]
        for r in orders.repartition(17).filter(pred).select("o_orderkey").collect()
    }
    assert base == resharded and len(base) > 0


def test_chunk_budget_respected_for_multi_doc_chunks(spark):
    # any chunk holding >1 doc must have started those docs inside the
    # budget window: first doc's start is within [k*B, (k+1)*B)
    docs = load_table(spark, SF_DIR, "documents")
    pos = global_token_positions(docs)
    bad = pos.filter(
        F.floor(F.col("pos_start") / CHUNK_BUDGET)
        != (F.col("pos_start") - F.pmod(F.col("pos_start"), CHUNK_BUDGET)) / CHUNK_BUDGET
    ).count()
    assert bad == 0


def test_hll_sketch_estimate_accuracy(spark):
    """The merged HLL union estimate must sit within 5% of the exact
    distinct count (sparse-mode sketches are exact at fixture scale)."""
    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.registry import load_all
    from tests.conftest import SF_DIR

    row = load_all()["agg_hll_sketch"].fn(spark, SF_DIR).first()
    exact = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert abs(row["merged_estimate"] - exact) <= max(1, 0.05 * exact)
    # union estimate <= sum of per-type estimates (distinct users overlap)
    assert row["merged_estimate"] <= row["sum_of_type_estimates"]


def test_mg_lossy_regime_bounds(spark):
    """Misra-Gries under real counter pressure: 1 heavy item among 400
    distinct tail items with capacity 8. The heavy hitter must survive
    with est <= true and undercount <= n/(capacity+1)."""
    from cdc_export_system_spark.functions.pandas_udfs import mg_heavy_hitters

    rows = [("hot",)] * 600 + [(f"tail{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {
        r["item"]: r["est_count"]
        for r in mg_heavy_hitters(df, capacity=8, support=0.3).collect()
    }
    n = 1000
    assert "hot" in got
    assert got["hot"] <= 600
    assert 600 - got["hot"] <= n / (8 + 1)


def test_mg_support_thresholds_on_exact_n(spark):
    """The support threshold divides by the EXACT stream size, not the
    merged-estimate total (which loses the compressed-away tail mass).
    Tail-heavy stream, n=1000, support 30%: 'warm' (true count 260,
    est <= true) can never reach 0.30 * 1000 = 300, so it must NOT be
    reported — under the old merged-total denominator (tail mass
    compressed away, total far below n) warm's estimate could clear the
    effective threshold and surface as a false positive."""
    from cdc_export_system_spark.functions.pandas_udfs import mg_heavy_hitters

    rows = [("hot",)] * 320 + [("warm",)] * 260 + [(f"tail{i}",) for i in range(420)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {
        r["item"]: r["est_count"]
        for r in mg_heavy_hitters(df, capacity=8, support=0.30).collect()
    }
    # est is a lower bound: warm (26% of n) and every tail item are out
    assert "warm" not in got
    assert all(not k.startswith("tail") for k in got)
    # anything reported must genuinely clear support * exact-n as an estimate
    assert all(v >= 300 for v in got.values())


def test_compression_quality_matches_zlib(spark):
    import zlib

    from cdc_export_system_spark.functions.pandas_udfs import (
        COMPRESSION_MIN_RATIO,
        text_compression_quality,
    )

    got = text_compression_quality(spark, SF_DIR).collect()
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_DIR, "documents").collect()}
    assert len(got) == len(docs)
    for r in got:
        raw = docs[r["doc_id"]].encode("utf-8")
        assert r["orig_bytes"] == len(raw)
        assert r["comp_bytes"] == len(zlib.compress(raw, 6))
        if r["orig_bytes"] > 0:
            assert r["keep"] == (r["comp_ratio"] >= COMPRESSION_MIN_RATIO)
        else:
            assert r["comp_ratio"] is None and r["keep"] is False


def test_compression_quality_empty_and_null_docs(spark):
    """Edge semantics: empty string is compressed for real (zlib's 8-byte
    empty stream), NULL text yields NULL comp_bytes; both carry NULL
    comp_ratio and keep=false instead of reading as 'pathologically
    repetitive'."""
    import zlib

    from cdc_export_system_spark.functions.pandas_udfs import (
        with_compression_quality,
    )

    df = spark.createDataFrame(
        [(1, "hello world, hello world"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in with_compression_quality(df, "doc_id", "text").collect()}
    assert rows[1]["comp_bytes"] == len(zlib.compress(b"hello world, hello world", 6))
    assert rows[1]["keep"] == (rows[1]["comp_ratio"] >= 0.35)
    assert rows[2]["orig_bytes"] == 0
    assert rows[2]["comp_bytes"] == len(zlib.compress(b"", 6)) == 8
    assert rows[2]["comp_ratio"] is None and rows[2]["keep"] is False
    assert rows[3]["comp_bytes"] is None
    assert rows[3]["comp_ratio"] is None and rows[3]["keep"] is False


def test_rolling_wau_hll_tracks_exact(spark):
    """Sketch-rollup WAU must track the exact contribution-explode WAU
    within standard HLL error (exact here: sparse-mode sketches)."""
    from cdc_export_system_spark.operators.analytics import (
        metric_rolling_wau,
        metric_rolling_wau_hll,
    )

    exact = {r["day"]: r["wau"] for r in metric_rolling_wau(spark, SF_DIR).collect()}
    est = {r["day"]: r["wau_est"] for r in metric_rolling_wau_hll(spark, SF_DIR).collect()}
    assert set(est) == set(exact)
    for day, wau in exact.items():
        assert abs(est[day] - wau) <= max(1, 0.05 * wau), (day, est[day], wau)


def test_skyline_matches_bruteforce_random(spark):
    """skyline_2d vs the quadratic dominance definition on seeded random
    point sets, including duplicate points (both survive) and ties on
    one axis."""
    import random

    from cdc_export_system_spark.operators.analytics import skyline_2d

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        pts = [(i, rng.randrange(0, 40), rng.randrange(0, 40)) for i in range(250)]
        pts += [(1000 + i, 20, 20) for i in range(3)]  # exact duplicates
        df = spark.createDataFrame(pts, "id long, x int, y int").repartition(5)
        got = {(r["id"]) for r in skyline_2d(df, "x", "y").collect()}
        expect = {
            pid
            for pid, px, py in pts
            if not any(
                qx >= px and qy >= py and (qx > px or qy > py)
                for _, qx, qy in pts
            )
        }
        assert got == expect, (seed, got ^ expect)
