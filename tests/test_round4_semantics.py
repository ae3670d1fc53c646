"""Semantic pins for the round-4 operators: hand-built micro-datasets
where the right answer is computable independently (NumPy or by eye).
The DuckDB oracle sweep proves Spark and DuckDB AGREE; these prove the
agreed answer is the CORRECT one — the defense against a formula bug
shipped identically to both engines."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _events_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_anova_matches_numpy(spark, tmp_path):
    """stats_anova_oneway's F on a 3-group micro-table equals the
    textbook computation (scipy-free: direct sum-of-squares algebra on
    the same cents-exact values)."""
    from datetime import datetime

    from cdc_export_system_spark.operators.stats_tests import stats_anova_oneway

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0, 8.0], "c": [10.0, 20.0]}
    rows, eid = [], 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((eid, 1, g, datetime(2024, 1, 1, eid % 24), v))
            eid += 1
    d = _events_dir(spark, tmp_path, rows)
    got = stats_anova_oneway(spark, d).first()

    cents = {g: np.array([round(v * 100) for v in vs]) for g, vs in groups.items()}
    allv = np.concatenate(list(cents.values()))
    gmean = allv.mean()
    ssb = sum(len(v) * (v.mean() - gmean) ** 2 for v in cents.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in cents.values())
    k, n = len(cents), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["n_groups"] == k and got["n_rows"] == n
    assert abs(got["f_stat"] - f_ref) < 1e-4
    assert abs(got["ss_between"] - ssb / 10000) < 1e-3  # cents² -> dollars²
    assert abs(got["ss_within"] - ssw / 10000) < 1e-3


def test_pr_curve_matches_manual(spark):
    """ml_pr_curve's rows on the real table satisfy the defining
    identities against an independent NumPy recomputation: tp/fp are the
    descending cumulative label counts, precision = tp/(tp+fp),
    recall = tp/P, recall is monotone nondecreasing as the threshold
    falls, and the final recall is 1."""
    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.ml.supervised import ml_pr_curve

    got = {r["threshold"]: r for r in ml_pr_curve(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    ).collect()
    s = np.array([r["s"] for r in li])
    y = np.array([r["y"] for r in li])
    P = int(y.sum())
    for t, row in got.items():
        tp = int(y[s >= t].sum())
        fp = int((s >= t).sum()) - tp
        assert row["tp"] == tp and row["fp"] == fp, t
        assert abs(row["prec"] - tp / (tp + fp)) < 1e-5
        assert abs(row["recall"] - tp / P) < 1e-5
    recs = [r["recall"] for _, r in sorted(got.items(), reverse=True)]
    assert recs == sorted(recs) and abs(recs[-1] - 1.0) < 1e-9


def test_decay_score_matches_manual(spark, tmp_path):
    """window_decay_score on a 2-user micro-series equals the hand
    computation: anchor = last active day, score = Σ cents·0.95^age
    (each day's term rounded to milli-cents first)."""
    from datetime import datetime

    from cdc_export_system_spark.operators.windows import (
        DECAY_LAMBDA, window_decay_score,
    )

    rows = [
        (1, 10, "click", datetime(2024, 1, 1), 10.00),
        (2, 10, "click", datetime(2024, 1, 1), 5.00),   # same day, sums first
        (3, 10, "click", datetime(2024, 1, 11), 2.00),  # age 0 at anchor
        (4, 20, "click", datetime(2024, 1, 6), 100.00),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in window_decay_score(spark, d).collect()}

    def term(cents, age):
        return math.floor(cents * (DECAY_LAMBDA ** age) * 1000 + 0.5)

    # anchor day = 2024-01-11 (global max)
    u10 = term(1500, 10) + term(200, 0)
    u20 = term(10000, 5)
    for uid, milli, ndays in ((10, u10, 2), (20, u20, 1)):
        exp = math.floor(milli / 1000 + 0.5) / 100
        assert got[uid]["n_days"] == ndays
        assert abs(got[uid]["decay_score"] - exp) < 1e-9, uid


def test_readability_matches_manual(spark, tmp_path):
    """text_readability on a hand-counted document: 8 words, 2
    sentences, syllables = vowel-group runs, Flesch plugged directly
    into the formula."""
    from cdc_export_system_spark.functions.text import text_readability

    text = "the cat sat on a mat. it was happy!"
    d = _docs_dir(spark, tmp_path, [(1, text, "en", "src0", len(text))])
    got = text_readability(spark, d).first()
    # words: the cat sat on a mat. it was happy!  -> 9 tokens
    words = 9
    sents = 2
    # vowel groups in lower(text): e,a,a,o,a,a,i,a,a  (by regex [aeiouy]+)
    import re

    syll = len(re.findall(r"[aeiouy]+", text.lower()))
    f_ref = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
    assert got["n_words"] == words
    assert got["n_sents"] == sents
    assert got["n_syll"] == syll
    assert abs(got["flesch"] - math.floor(f_ref * 1e6 + 0.5) / 1e6) < 1e-9


def test_value_histogram_bins_are_exact(spark, tmp_path):
    """agg_value_histogram bin assignment on boundary values: exactly
    $50.00 lands in bin 1 ([50, 100)), $49.99 in bin 0."""
    from datetime import datetime

    from cdc_export_system_spark.operators.aggregates import agg_value_histogram

    rows = [
        (1, 1, "a", datetime(2024, 1, 1), 49.99),
        (2, 1, "a", datetime(2024, 1, 1), 50.00),
        (3, 1, "a", datetime(2024, 1, 1), 0.00),
        (4, 1, "a", datetime(2024, 1, 1), 149.99),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {r["bin_id"]: r for r in agg_value_histogram(spark, d).collect()}
    assert got[0]["n_events"] == 2 and got[0]["bin_lo"] == 0.0 and got[0]["bin_hi"] == 50.0
    assert got[1]["n_events"] == 1
    assert got[2]["n_events"] == 1
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-5


def test_funnel_stages_are_monotone(spark):
    """pipeline_dedup_funnel invariants on the real corpus: stages only
    shrink, raw pct is 1, and the exact-dedup stage equals the distinct
    fingerprint count."""
    from cdc_export_system_spark.dedup.queries import pipeline_dedup_funnel
    from cdc_export_system_spark.io.sources import load_table

    rows = {r["stage"]: r for r in pipeline_dedup_funnel(spark, SF_DIR).collect()}
    assert rows["raw"]["pct_docs_of_raw"] == 1.0
    assert rows["raw"]["n_docs"] >= rows["exact_dedup"]["n_docs"] >= rows["near_dedup"]["n_docs"]
    n_fp = (
        load_table(spark, SF_DIR, "documents")
        .select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .distinct()
        .count()
    )
    assert rows["exact_dedup"]["n_docs"] == n_fp


def test_scd2_pointintime_matches_manual(spark, tmp_path):
    """join_scd2_pointintime on a hand-built history: clicks before the
    first purchase join NULL; at/after a purchase timestamp they join
    that version until the next purchase."""
    from datetime import datetime

    from cdc_export_system_spark.cdc.scd import join_scd2_pointintime

    t = lambda d, h: datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        (1, 1, "click", t(1, 0), 0.0),      # before any purchase -> NULL
        (2, 1, "purchase", t(2, 0), 10.0),  # version A
        (3, 1, "click", t(2, 0), 0.0),      # exactly at A's valid_from -> A
        (4, 1, "click", t(3, 0), 0.0),      # inside A -> A
        (5, 1, "purchase", t(4, 0), 20.0),  # version B
        (6, 1, "click", t(5, 0), 0.0),      # after B -> B
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {r["event_id"]: r for r in join_scd2_pointintime(spark, d).collect()}
    assert got[1]["dim_event_id"] is None
    assert got[3]["dim_event_id"] == 2 and got[3]["dim_value"] == 10.0
    assert got[4]["dim_event_id"] == 2
    assert got[6]["dim_event_id"] == 5 and got[6]["dim_value"] == 20.0


def test_effect_sizes_match_numpy(spark, tmp_path):
    """stats_effect_sizes' d and g on a micro-table equal the textbook
    pooled-variance computation on the same cents-exact values."""
    from datetime import datetime

    from cdc_export_system_spark.operators.stats_tests import (
        ARM_A, ARM_B, stats_effect_sizes,
    )

    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0]
    rows, eid = [], 0
    for arm, vals in ((ARM_A, a), (ARM_B, b)):
        for v in vals:
            rows.append((eid, 1, arm, datetime(2024, 1, 1, eid % 24), v))
            eid += 1
    # a decoy arm that must be excluded
    rows.append((eid, 1, "decoy", datetime(2024, 1, 1), 999.0))
    d = _events_dir(spark, tmp_path, rows)
    got = stats_effect_sizes(spark, d).first()

    ca = np.array([round(v * 100) for v in a], dtype=float)
    cb = np.array([round(v * 100) for v in b], dtype=float)
    na, nb = len(ca), len(cb)
    mean_diff = (ca.mean() - cb.mean()) / 100
    sp = math.sqrt(
        (((ca - ca.mean()) ** 2).sum() + ((cb - cb.mean()) ** 2).sum())
        / (na + nb - 2)
    ) / 100
    d_ref = mean_diff / sp
    g_ref = d_ref * (1 - 3 / (4 * (na + nb) - 9))
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["mean_diff"] - mean_diff) < 1e-6
    assert abs(got["cohens_d"] - d_ref) < 1e-4
    assert abs(got["hedges_g"] - g_ref) < 1e-4


def test_benjamini_hochberg_matches_numpy(spark):
    """stats_benjamini_hochberg's rejection set on the real table equals
    an independent NumPy BH step-up run on the op's own p-surrogates
    (and those p-surrogates equal 1/(1+z²) recomputed from raw values)."""
    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.stats_tests import (
        stats_benjamini_hochberg,
    )

    got = stats_benjamini_hochberg(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    ).collect()
    c = np.array([r["c"] for r in ev], dtype=float)
    keys = [(r["event_type"], r["hr"]) for r in ev]
    gmean, gvar = c.mean(), c.var()  # population variance, matching the op
    p_ref = {}
    for k in set(keys):
        gc = np.array([v for kk, v in zip(keys, c) if kk == k])
        z2 = len(gc) * (gc.mean() - gmean) ** 2 / gvar
        p_ref[k] = round(1.0 / (1.0 + z2) * 1e9)
    # independent BH step-up at q = 0.05 on the reference p-values
    order = sorted(p_ref, key=lambda k: (p_ref[k], k))
    m = len(order)
    i_max = max(
        (i for i, k in enumerate(order, 1) if p_ref[k] * 20 * m <= i * 10**9),
        default=0,
    )
    rejected_ref = set(order[:i_max])
    assert len(got) == m
    for r in got:
        k = (r["event_type"], r["hr"])
        assert r["p_nano"] == p_ref[k], k
        assert r["rejected"] == (k in rejected_ref), k


def test_woe_iv_matches_numpy(spark):
    """feat_woe_iv on the real table equals the direct WoE/IV formulas
    recomputed from raw per-category class counts."""
    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.aggregates import feat_woe_iv

    got = {r["category"]: r for r in feat_woe_iv(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    from collections import Counter

    pos, neg = Counter(), Counter()
    for r in orders:
        (pos if r["o_orderstatus"] == "F" else neg)[r["o_orderpriority"]] += 1
    tp, tn = sum(pos.values()), sum(neg.values())
    assert set(got) == set(pos) | set(neg)
    for cat, r in got.items():
        assert r["n_pos"] == pos[cat] and r["n_neg"] == neg[cat]
        woe = math.log((pos[cat] / tp) / (neg[cat] / tn))
        assert abs(r["woe"] - woe) < 1e-6
        assert abs(r["iv_term"] - (pos[cat] / tp - neg[cat] / tn) * woe) < 1e-6


def test_bpe_pair_counts_match_python(spark, tmp_path):
    """text_bpe_pair_counts on a micro-corpus equals a by-hand pair
    count: pairs weighted by word occurrences, positions overlapping."""
    from cdc_export_system_spark.functions.text import text_bpe_pair_counts

    rows = [
        (0, "aaa ab", "en", "s", 6),   # aaa -> aa twice (overlap), ab -> ab
        (1, "ab aaa x", "en", "s", 8),  # single-char word contributes nothing
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {r["pair"]: (r["pair_count"], r["n_words"]) for r in
           text_bpe_pair_counts(spark, d).collect()}
    # word counts: aaa x2, ab x2, x x1
    assert got == {"aa": (4, 1), "ab": (2, 1)}


def test_oov_rate_matches_python(spark):
    """text_oov_rate on the real table equals a pure-Python top-100
    vocab + per-source OOV recount."""
    from collections import Counter

    from cdc_export_system_spark.functions.text import text_oov_rate
    from cdc_export_system_spark.io.sources import load_table

    got = {r["source"]: r for r in text_oov_rate(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    occ = [(r["source"], w) for r in docs
           for w in r["text"].strip().lower().split() if w]
    cnt = Counter(w for _, w in occ)
    vocab = {w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
    per = {}
    for s, w in occ:
        n, o = per.get(s, (0, 0))
        per[s] = (n + 1, o + (w not in vocab))
    assert set(got) == set(per)
    for s, (n, o) in per.items():
        assert got[s]["n_tokens"] == n and got[s]["n_oov"] == o
        assert abs(got[s]["oov_rate"] - o / n) < 1e-6


def test_char_ngram_profile_matches_python(spark):
    """text_char_ngram_lang_profile equals a pure-Python trigram count
    + rank over the same normalization."""
    from collections import Counter, defaultdict

    from cdc_export_system_spark.functions.text import (
        text_char_ngram_lang_profile,
    )
    from cdc_export_system_spark.io.sources import load_table

    got = defaultdict(dict)
    for r in text_char_ngram_lang_profile(spark, SF_DIR).collect():
        got[r["lang"]][r["rnk"]] = (r["tri"], r["n"])
    docs = load_table(spark, SF_DIR, "documents").select("lang", "text").collect()
    cnt = defaultdict(Counter)
    for r in docs:
        b = r["text"].strip().lower()
        for i in range(len(b) - 2):
            cnt[r["lang"]][b[i:i + 3]] += 1
    for lang, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        ref = {i + 1: kv for i, kv in enumerate(top)}
        assert got[lang] == ref, lang


def test_vocab_coverage_matches_python(spark):
    """text_vocab_coverage equals a pure-Python sort + cumulative-mass
    recount at every target."""
    from collections import Counter

    from cdc_export_system_spark.functions.text import text_vocab_coverage
    from cdc_export_system_spark.io.sources import load_table

    got = {r["target_permille"]: r for r in
           text_vocab_coverage(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    cnt = Counter(w for r in docs for w in r["text"].strip().lower().split() if w)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    t = sum(cnt.values())
    for p in (500, 900, 950, 990):
        cum = 0
        for k, (_, c) in enumerate(ordered, 1):
            cum += c
            if cum * 1000 >= p * t:
                break
        assert got[p]["vocab_size"] == k, p
        assert got[p]["covered_tokens"] == cum, p
        assert abs(got[p]["covered_share"] - cum / t) < 1e-6, p


def test_benford_digits_match_python(spark):
    """dq_benford_digits equals a pure-Python digit recount and the
    closed-form Benford shares."""
    from collections import Counter

    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.quality import dq_benford_digits

    got = {r["digit"]: r for r in dq_benford_digits(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders").select("o_totalprice").collect()
    cnt = Counter(int(str(int(math.floor(r["o_totalprice"])))[0]) for r in orders)
    n = sum(cnt.values())
    assert set(got) == set(cnt)
    for d, c in cnt.items():
        e = math.log10(1 + 1 / d)
        assert got[d]["n_obs"] == c
        assert abs(got[d]["share"] - c / n) < 1e-6
        assert abs(got[d]["benford_expected"] - e) < 1e-6
        assert abs(got[d]["chi2_term"] - (c - n * e) ** 2 / (n * e)) < 1e-4


def test_js_divergence_matches_python(spark):
    """corpus_js_divergence equals a pure-Python two-distribution JS
    computation per source, and is bounded by [0, ln 2]."""
    from collections import Counter

    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.quality import (
        PSI_REF_SOURCE, corpus_js_divergence,
    )

    got = {r["source"]: r["js_divergence"] for r in
           corpus_js_divergence(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    cnt = {}
    for r in docs:
        c = cnt.setdefault(r["source"], Counter())
        for w in r["text"].strip().lower().split():
            if w:
                c[w] += 1
    q = cnt[PSI_REF_SOURCE]
    tq = sum(q.values())
    for s, p in cnt.items():
        if s == PSI_REF_SOURCE:
            continue
        tp = sum(p.values())
        js = 0.0
        for w in set(p) | set(q):
            pi, qi = p.get(w, 0) / tp, q.get(w, 0) / tq
            mi = (pi + qi) / 2
            if pi:
                js += 0.5 * pi * math.log(pi / mi)
            if qi:
                js += 0.5 * qi * math.log(qi / mi)
        assert abs(got[s] - js) < 1e-5, s
        assert -1e-9 <= got[s] <= math.log(2) + 1e-9


def test_power_analysis_matches_numpy(spark):
    """stats_power_analysis equals the closed-form sample-size formula
    recomputed from raw cents values."""
    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.stats_tests import (
        ARM_A, ARM_B, Z_ALPHA_2, Z_BETA, stats_power_analysis,
    )

    got = stats_power_analysis(spark, SF_DIR).first()
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    a = np.array([round(r["value"] * 100) for r in ev
                  if r["event_type"] == ARM_A], dtype=float)
    b = np.array([round(r["value"] * 100) for r in ev
                  if r["event_type"] == ARM_B], dtype=float)
    mean_diff = (a.mean() - b.mean()) / 100
    var_pooled = (((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()) \
        / (len(a) + len(b) - 2) / 10000
    n_ref = math.ceil(2 * (Z_ALPHA_2 + Z_BETA) ** 2 * var_pooled / mean_diff ** 2)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["mean_diff"] - mean_diff) < 1e-6
    assert abs(got["var_pooled"] - var_pooled) < 1e-4
    assert got["n_required_per_arm"] == n_ref


def _orders_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return d


def test_bootstrap_ci_matches_numpy(spark, tmp_path):
    """stats_bootstrap_ci's deterministic Poisson draws, replicate means,
    and interpolated CI bounds reproduced independently in NumPy from
    the published hash recipe — pins the resampling itself, not just
    Spark/DuckDB agreement."""
    from datetime import datetime

    from cdc_export_system_spark.operators.stats_tests import (
        BOOT_R,
        BOOT_SALT,
        _KNUTH,
        _POIS1_CDF,
        stats_bootstrap_ci,
    )

    prices = [101.37, 250.00, 999.99, 12.01, 55.55, 730.25, 480.10, 63.49]
    rows = [
        (k + 1, 1, "O", p, datetime(2024, 1, 1), "1-URGENT")
        for k, p in enumerate(prices)
    ]
    d = _orders_dir(spark, tmp_path, rows)
    got = stats_bootstrap_ci(spark, d).first()

    cents = np.array([round(p * 100) for p in prices], dtype=np.int64)
    keys = np.arange(1, len(prices) + 1, dtype=np.int64)

    def cnt(k: int, r: int) -> int:
        u = ((k + (r + 1) * BOOT_SALT) * _KNUTH) % 10000
        for i, t in enumerate(_POIS1_CDF):
            if u < t:
                return i
        return 5

    means = []
    for r in range(BOOT_R):
        w = np.array([cnt(int(k), r) for k in keys], dtype=np.int64)
        if w.sum() > 0:
            means.append((w * cents).sum() / w.sum() / 100)
    lo, med, hi = np.percentile(np.array(means), [2.5, 50, 97.5])

    assert got["n_replicates"] == BOOT_R
    assert abs(got["point_mean"] - cents.mean() / 100) < 1e-4
    assert abs(got["ci_lo"] - lo) < 1e-4
    assert abs(got["ci_median"] - med) < 1e-4
    assert abs(got["ci_hi"] - hi) < 1e-4
    # the CI must bracket the point estimate on this well-behaved sample
    assert got["ci_lo"] < got["point_mean"] < got["ci_hi"]


def test_funnel_time_window_deadline_semantics(spark, tmp_path):
    """Hand-built users exercising every deadline edge: full conversion
    inside the window, a purchase just past the deadline, out-of-order
    steps, and an event exactly AT the deadline (inclusive)."""
    from datetime import datetime, timedelta

    from cdc_export_system_spark.operators.analytics import (
        FUNNEL_WINDOW_DAYS,
        funnel_time_window,
    )

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    win = timedelta(days=FUNNEL_WINDOW_DAYS)
    rows = []
    eid = [0]

    def ev(user, etype, ts):
        eid[0] += 1
        rows.append((eid[0], user, etype, ts, 1.0))

    # user 1: all four steps inside the window -> depth 4
    ev(1, "signup", t0)
    ev(1, "view", t0 + timedelta(hours=1))
    ev(1, "click", t0 + timedelta(hours=2))
    ev(1, "purchase", t0 + timedelta(days=1))
    # user 2: purchase 1s past the deadline -> depth 3
    ev(2, "signup", t0)
    ev(2, "view", t0 + timedelta(hours=1))
    ev(2, "click", t0 + timedelta(hours=2))
    ev(2, "purchase", t0 + win + timedelta(seconds=1))
    # user 3: view BEFORE signup only -> depth 1 (strict ordering)
    ev(3, "view", t0 - timedelta(hours=1))
    ev(3, "signup", t0)
    # user 4: view exactly AT the deadline -> counts (inclusive bound)
    ev(4, "signup", t0)
    ev(4, "view", t0 + win)
    # user 5: no signup at all -> depth 0, in no step count
    ev(5, "view", t0)
    ev(5, "purchase", t0 + timedelta(hours=1))

    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["step_name"]: r["users"] for r in funnel_time_window(spark, d).collect()
    }
    assert got == {"signup": 4, "view": 3, "click": 2, "purchase": 1}


def test_dsir_importance_resample_matches_numpy(spark, tmp_path):
    """corpus_importance_resample's log importance weights recomputed
    independently (NumPy, add-one smoothed unigram LMs) on a micro-corpus
    — and the doc written in the target's vocabulary must out-weigh the
    doc written off-vocabulary."""
    from cdc_export_system_spark.operators.sampling import (
        DSIR_SALT,
        DSIR_TARGET,
        KNUTH,
        corpus_importance_resample,
    )

    # target domain speaks {aa bb}; candidate 10 mimics it, candidate 11
    # speaks {zz ww} which the target has never seen
    rows = [
        (1, "aa bb aa bb", "en", DSIR_TARGET, 11),
        (2, "bb aa aa", "en", DSIR_TARGET, 8),
        (10, "aa bb bb", "en", "srcX", 8),
        (11, "zz ww zz", "en", "srcX", 8),
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in corpus_importance_resample(spark, d).collect()}
    assert set(got) == {10, 11}

    # independent recomputation
    import collections

    docs = {i: txt.split() for i, txt, *_ in rows}
    tgt = [t for i in (1, 2) for t in docs[i]]
    cand = [t for i in (10, 11) for t in docs[i]]
    tf_t, tf_c = collections.Counter(tgt), collections.Counter(cand)
    vocab = set(tf_t) | set(tf_c)
    nt, nc, v = len(tgt), len(cand), len(vocab)
    for i in (10, 11):
        lw = sum(
            math.log((tf_t[t] + 1) / (nt + v)) - math.log((tf_c[t] + 1) / (nc + v))
            for t in docs[i]
        )
        assert abs(got[i]["log_w"] - lw) < 1e-6, (i, got[i]["log_w"], lw)
        u = (((i + DSIR_SALT) * KNUTH) % 10000 + 0.5) / 10000
        gumbel = -math.log(-math.log(u))
        assert abs(got[i]["sel_key"] - (lw + gumbel)) < 1e-6
    assert got[10]["log_w"] > got[11]["log_w"]
