"""Independent semantic pins for the round-6 operators: each checks the
Spark implementation against a from-scratch pure-Python computation on
the same data (not against the operator's own oracle SQL), so a shared
misunderstanding between the Spark code and its oracle cannot hide.
"""

from __future__ import annotations

import collections

import duckdb

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR


def _words(spark):
    rows = load_table(spark, SF_DIR, "documents").select("text").collect()
    out = []
    for r in rows:
        out.extend(w for w in r["text"].strip().lower().split() if w)
    return out


def _ref_bpe(words: list[str], n_merges: int):
    """Textbook BPE trainer (Sennrich et al. 2016), no end-of-word
    marker: count adjacent symbol pairs over the distinct-word vocab
    weighted by word frequency, merge the (count DESC, left ASC,
    right ASC) argmax left-to-right non-overlapping, repeat."""
    vocab = collections.Counter(words)
    seqs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((rank, left, right, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    """The distributed trainer's merge table must equal the textbook
    single-machine trainer's, rank for rank, count for count — and a
    second run must reproduce it bit-for-bit."""
    fn = load_all()["text_bpe_train_merges"].fn
    got = [tuple(r) for r in fn(spark, SF_DIR).orderBy("rank").collect()]
    want = _ref_bpe(_words(spark), 8)
    assert got == want
    again = [tuple(r) for r in fn(spark, SF_DIR).orderBy("rank").collect()]
    assert again == got


def test_bpe_first_merge_is_pair_counts_top_row(spark):
    """No end-of-word marker means merge #1 must be exactly
    text_bpe_pair_counts' most-frequent pair."""
    reg = load_all()
    top = reg["text_bpe_pair_counts"].fn(spark, SF_DIR).first()
    first = reg["text_bpe_train_merges"].fn(spark, SF_DIR).orderBy("rank").first()
    assert first["left"] + first["right"] == top["pair"]
    assert first["pair_count"] == top["pair_count"]


def test_interval_join_matches_bruteforce(spark):
    """join_interval_bucketed vs an independent O(n^2) Python overlap
    scan (sessionize + windows recomputed from scratch): bucketing and
    multi-bucket dedup must not change any per-session count."""
    fn = load_all()["join_interval_bucketed"].fn
    got = {
        (r["user_id"], r["session_no"]): r["n_incidents"]
        for r in fn(spark, SF_DIR).collect()
    }

    ev = sorted(
        load_table(spark, SF_DIR, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
        .collect(),
        key=lambda r: (r["user_id"], r["us"], r["event_id"]),
    )
    sessions: dict[tuple, list[int]] = {}
    prev_user, prev_us, sess_no = None, None, 0
    for r in ev:
        if r["user_id"] != prev_user:
            sess_no = 1
        elif r["us"] - prev_us > 1800 * 1_000_000:
            sess_no += 1
        prev_user, prev_us = r["user_id"], r["us"]
        sessions.setdefault((r["user_id"], sess_no), []).append(r["us"])
    wins = [
        (r["event_id"], r["user_id"], r["us"] - 1800 * 1_000_000,
         r["us"] + 1800 * 1_000_000)
        for r in ev
        if r["event_type"] == "error"
    ]
    want = {}
    for (uid, sno), uss in sessions.items():
        a, b = min(uss), max(uss)
        want[(uid, sno)] = sum(
            1 for (_id, wu, ws, we) in wins if wu != uid and a <= we and ws <= b
        )
    assert got == want


def test_compaction_bins_contract(spark):
    """plan_compaction_bins: bins are contiguous in date order, each
    bin's input starts strictly inside the target budget (start-offset
    rule), and row counts reconcile with the raw table."""
    from cdc_export_system_spark.operators.relational import COMPACT_TARGET_ROWS

    rows = (
        load_all()["plan_compaction_bins"].fn(spark, SF_DIR)
        .orderBy("event_date")
        .collect()
    )
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    prefix = 0
    for r in rows:
        assert r["bin_id"] == prefix // COMPACT_TARGET_ROWS
        prefix += r["n_rows"]
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)


def test_fk_orphans_detects_planted_orphan(spark, tmp_path):
    """A planted orphan FK and a planted NULL FK must show up in
    exactly the right edge's counters (the audit is not vacuous)."""
    import shutil

    src = SF_DIR
    dst = tmp_path / "sf"
    dst.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * REPLACE (CASE WHEN rowid = 0 THEN 999999999
                                   WHEN rowid = 1 THEN NULL
                                   ELSE o_custkey END AS o_custkey)
            FROM (SELECT *, row_number() OVER (ORDER BY o_orderkey) - 1
                      AS rowid FROM read_parquet('{src}/orders.parquet'))
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    con.close()
    got = {
        r["edge"]: (r["n_null_fk"], r["n_orphans"])
        for r in load_all()["dq_fk_orphans"].fn(spark, str(dst)).collect()
    }
    nulls, orphans = got["orders.o_custkey->customer"]
    assert nulls >= 1 and orphans >= 1
    # untouched edges stay clean
    assert got["nation.n_regionkey->region"] == (0, 0)


def test_lttb_matches_reference_downsampler(spark):
    """ts_downsample_lttb vs a from-scratch pure-Python LTTB (plain
    loops, no pandas): identical kept-point sets per user, pass-through
    for short series, endpoints always kept."""
    from cdc_export_system_spark.operators.timeseries import LTTB_THRESHOLD

    fn = load_all()["ts_downsample_lttb"].fn
    got: dict = {}
    for r in fn(spark, SF_DIR).collect():
        got.setdefault(r["user_id"], set()).add((r["ts"], r["value"]))

    series: dict = {}
    for r in (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "value", "event_id")
        .collect()
    ):
        series.setdefault(r["user_id"], []).append(
            (r["ts"], r["value"], r["event_id"])
        )

    def ref_lttb(pts, threshold):
        pts = sorted(pts, key=lambda p: p[0])
        n = len(pts)
        if n <= threshold:
            return {(p[0], p[1]) for p in pts}
        x = [p[0].timestamp() * 1e9 for p in pts]
        y = [p[1] for p in pts]
        nb = threshold - 2
        edges = [1 + (n - 2) * b // nb for b in range(nb + 1)]
        keep = [0]
        for b in range(nb):
            lo, hi = edges[b], edges[b + 1]
            if lo >= hi:
                continue
            if b == nb - 1:
                cx, cy = x[n - 1], y[n - 1]
            else:
                nlo, nhi = edges[b + 1], edges[b + 2]
                cx = sum(x[nlo:nhi]) / (nhi - nlo)
                cy = sum(y[nlo:nhi]) / (nhi - nlo)
            ax, ay = x[keep[-1]], y[keep[-1]]
            best, best_area = lo, -1.0
            for i in range(lo, hi):
                area = abs((ax - cx) * (y[i] - ay) - (ax - x[i]) * (cy - ay))
                if area > best_area:
                    best, best_area = i, area
            keep.append(best)
        keep.append(n - 1)
        return {(pts[i][0], pts[i][1]) for i in keep}

    assert set(got) == set(series)
    for uid, pts in series.items():
        want = ref_lttb(pts, LTTB_THRESHOLD)
        assert got[uid] == want, f"user {uid}"
        srt = sorted(pts, key=lambda p: p[0])
        assert (srt[0][0], srt[0][1]) in got[uid]
        assert (srt[-1][0], srt[-1][1]) in got[uid]


def test_kmv_sketch_is_mergeable_and_bounded(spark):
    """KMV's scale contract: per-shard bottom-k sketches merged
    (union -> re-take bottom-k) must equal the sketch built directly
    over the whole set, and the registered estimates must sit within
    the theoretical relative-error envelope of the exact counts."""
    from pyspark.sql import functions as F

    from cdc_export_system_spark.operators.sketches import KMV_K

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("user_id").isNotNull())
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    hvs = ev.select(hv.alias("hv")).distinct()
    direct = [r["hv"] for r in hvs.orderBy("hv").limit(KMV_K).collect()]
    shard_a = hvs.filter(F.col("hv") % 2 == 0).orderBy("hv").limit(KMV_K)
    shard_b = hvs.filter(F.col("hv") % 2 == 1).orderBy("hv").limit(KMV_K)
    merged = [
        r["hv"]
        for r in shard_a.unionAll(shard_b)
        .distinct()
        .orderBy("hv")
        .limit(KMV_K)
        .collect()
    ]
    assert merged == direct

    rows = {
        r["segment"]: r
        for r in load_all()["agg_kmv_setops"].fn(spark, SF_DIR).collect()
    }
    for seg, r in rows.items():
        exact = r["exact_distinct"]
        if exact < KMV_K:
            assert r["est_distinct"] == float(exact), seg
        else:
            # 5-sigma envelope of the (k-1)/U_k estimator
            tol = 5 * exact / ((KMV_K - 2) ** 0.5)
            assert abs(r["est_distinct"] - exact) <= tol, (seg, r)


def test_bpe_encode_matches_reference_encoder(spark):
    """corpus_bpe_encode vs encoding every document with the reference
    trainer's merge list applied rank-by-rank in pure Python."""
    fn = load_all()["corpus_bpe_encode"].fn
    got = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
        for r in fn(spark, SF_DIR).collect()
    }

    merges = _ref_bpe(_words(spark), 8)

    def encode_len(word: str) -> int:
        syms = list(word)
        for _rank, left, right, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {}
    nchars = {}
    for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        ws = [w for w in r["text"].strip().lower().split() if w]
        if ws:
            want[r["doc_id"]] = (len(ws), sum(encode_len(w) for w in ws))
            nchars[r["doc_id"]] = sum(len(w) for w in ws)
    assert got == want
    # bounds, not compression: a word is >= 1 subword (lower) and BPE
    # never emits more symbols than characters (upper); strict n_bpe <
    # chars would require at least one merge to apply to every doc,
    # which the trained merge list does not guarantee
    for doc, (n_ws, n_bpe) in got.items():
        assert n_ws <= n_bpe <= nchars[doc]


def test_gbm_stumps_matches_reference_and_descends(spark):
    """ml_gbm_stumps vs a from-scratch Python least-squares booster
    using the same micro-unit discipline: identical model table
    (feature, threshold, leaf values, SSE) round for round, and the
    post-round train SSE must be non-increasing."""
    import math

    from cdc_export_system_spark.ml.boosting import (
        GBM_ROUNDS,
        GBM_SHRINKAGE,
        _MICRO,
    )

    got = [
        tuple(r)
        for r in load_all()["ml_gbm_stumps"].fn(spark, SF_DIR).orderBy("round").collect()
    ]

    rows = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "CAST(hour(ts) AS BIGINT) AS hour",
            "CAST(dayofweek(ts) AS BIGINT) AS dow",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    data = [(r["hour"], r["dow"], r["cents"] * _MICRO) for r in rows]

    def best_split(data):
        cand = []
        for fi, fname in ((0, "hour"), (1, "dow")):
            stats = {}
            for rec in data:
                v, r = rec[fi], rec[2]
                n, s = stats.get(v, (0, 0))
                stats[v] = (n + 1, s + r)
            vals = sorted(stats)
            tn = sum(n for n, _ in stats.values())
            ts = sum(s for _, s in stats.values())
            nl = sl = 0
            for v in vals:
                nl += stats[v][0]
                sl += stats[v][1]
                nr, sr = tn - nl, ts - sl
                if nl == 0 or nr == 0:
                    continue
                score = float(sl) * float(sl) / nl + float(sr) * float(sr) / nr
                fixed = math.floor(score / 1e12 + 0.5)
                cand.append((-fixed, fname, v, float(sl) / nl, float(sr) / nr))
        if not cand:
            return None
        cand.sort(key=lambda c: (c[0], c[1], c[2]))
        _neg, fname, thr, ml, mr = cand[0]
        leaf_l = int(ml * GBM_SHRINKAGE + (0.5 if ml >= 0 else -0.5))
        leaf_r = int(mr * GBM_SHRINKAGE + (0.5 if mr >= 0 else -0.5))
        return fname, thr, leaf_l, leaf_r

    want = []
    cur = data
    for rnd in range(GBM_ROUNDS):
        sp = best_split(cur)
        if sp is None:
            break
        fname, thr, leaf_l, leaf_r = sp
        fi = 0 if fname == "hour" else 1
        cur = [
            (h, d, r - (leaf_l if (h, d)[fi] <= thr else leaf_r))
            for h, d, r in cur
        ]
        sse = sum(r * r for _h, _d, r in cur) // (_MICRO * _MICRO)
        want.append((rnd, fname, thr, leaf_l, leaf_r, sse))

    assert got == want
    sses = [g[5] for g in got]
    assert all(a >= b for a, b in zip(sses, sses[1:]))


def test_k_core_matches_reference_peeling(spark):
    """graph_k_core vs a pure-Python peeling on the same edge list: the
    k-core is unique, so the surviving node set and in-core degrees
    must match exactly; every survivor must have degree >= k."""
    from cdc_export_system_spark.operators.graph import K_CORE_K, _edges

    got = {
        r["node"]: r["core_degree"]
        for r in load_all()["graph_k_core"].fn(spark, SF_DIR).collect()
    }

    edges = {(r["pa"], r["pb"]) for r in _edges(spark, SF_DIR).collect()}
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= K_CORE_K}
        pruned = {(a, b) for a, b in edges if a in keep and b in keep}
        if pruned == edges:
            break
        edges = pruned
    want: dict = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    want = {n: d for n, d in want.items() if d >= K_CORE_K}
    assert got == want
    assert all(d >= K_CORE_K for d in got.values())


def test_position_attribution_conserves_value(spark):
    """U-shaped weights must sum to exactly 1,000,000 ppm per purchase
    (integer remainder pinned to the first middle), so attribution
    conserves each converted purchase's value to the micro-unit: the
    op's total credited micro-cents equal the exact cents x 1e6 of
    every purchase with at least one in-window click."""
    from pyspark.sql import functions as F

    from cdc_export_system_spark.operators.analytics import ATTR_WINDOW_S

    rows = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "event_id", "user_id", "event_type", "unix_micros(ts) AS us",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    clicks = [(r["user_id"], r["us"]) for r in rows if r["event_type"] == "click"]
    total_micro = 0
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        n = sum(
            1
            for (u, us) in clicks
            if u == r["user_id"] and us < r["us"]
            and us >= r["us"] - ATTR_WINDOW_S * 1_000_000
        )
        if n > 0:
            total_micro += r["cents"] * 1_000_000

    got = (
        load_all()["attribution_position_based"].fn(spark, SF_DIR)
        .agg(F.sum(F.col("credited_dollars") * 100 * 1_000_000))
        .first()[0]
    )
    # per-hour 1e-6 rounding of dollars can move each bucket < 1 micro-cent
    assert abs(got - total_micro) < 200, (got, total_micro)


def test_winnowing_guarantee_and_density(spark):
    """The two published winnowing properties (Schleimer et al. 2003),
    pinned on constructed documents: (1) GUARANTEE — two documents
    sharing a token run of length >= WINNOW_K + WINNOW_W - 1 share at
    least one recorded fingerprint; (2) DENSITY — the number of selected
    fingerprints is a small fraction of the gram count (expected
    2/(w+1)), never the full gram stream."""
    from cdc_export_system_spark.dedup.substring import (
        WINNOW_K, WINNOW_W, winnow_fingerprints,
    )

    run = " ".join(f"shared{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + run + " delta epsilon zeta"),
            (2, "one two three four five " + run + " six seven"),
            (3, " ".join(f"uniq{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # guarantee: docs 1 and 2 share the run -> share a fingerprint
    assert by_doc[1] & by_doc[2], "shared run produced no shared fingerprint"
    # the all-unique doc shares nothing with either
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # density: doc 3 has 60 tokens -> 57 grams; expected ~2/(w+1) density,
    # so selections must be well under half the grams
    n_grams = 60 - WINNOW_K + 1
    assert len(by_doc[3]) < n_grams / 2, (len(by_doc[3]), n_grams)
    # positions are within the gram range and fingerprints are md5-shaped
    assert all(1 <= r.pos <= n_grams for r in fps if r.doc_id == 3)
    assert all(len(r.fp) == 32 for r in fps)
