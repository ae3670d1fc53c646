"""Semantic pins for the round-3 corpus ops: exact duplicated-substring
span recovery (dedup_exact_substring) and PSI drift (corpus_drift_psi),
each on a hand-built micro-corpus where the right answer is computable
by eye. The DuckDB oracle sweep covers the real corpus; these pin the
edge semantics the corpus may never exercise."""

from __future__ import annotations

import pytest

from cdc_export_system_spark.dedup.substring import dedup_exact_substring
from tests.conftest import SF_DIR
from cdc_export_system_spark.operators.quality import corpus_drift_psi


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _w(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def _spans(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    }


def test_shared_prefix_recovered_as_one_span(spark, tmp_path):
    """Two docs sharing a 10-token prefix: every seed inside the run is
    duplicated, so coverage merges to one span of exactly the run."""
    shared = _w(10, "s")
    rows = [
        (1, f"{shared} {_w(12, 'a')}", "en", "src0", 0),
        (2, f"{shared} {_w(12, 'b')}", "en", "src0", 0),
    ]
    out = dedup_exact_substring(spark, _docs_dir(spark, tmp_path, rows))
    assert _spans(out) == {(1, 1, 10, 10), (2, 1, 10, 10)}


def test_intra_document_repeat_detected(spark, tmp_path):
    """An 8-gram occurring twice WITHIN one doc counts as duplicated
    (corpus-wide count >= 2 makes no inter/intra distinction)."""
    rep = _w(8, "r")
    rows = [(1, f"{rep} {_w(9, 'mid')} {rep}", "en", "src0", 0)]
    out = dedup_exact_substring(spark, _docs_dir(spark, tmp_path, rows))
    # tokens 1-8 and 18-25 are the two copies; the unique 9-token gap
    # (> 0 uncovered positions) keeps them separate islands
    assert _spans(out) == {(1, 1, 8, 8), (1, 18, 25, 8)}


def test_short_docs_and_sub_seed_overlap_below_floor(spark, tmp_path):
    """Docs shorter than SEED_LEN yield no grams; a shared run shorter
    than SEED_LEN is below the detection floor — both produce no spans."""
    rows = [
        (1, _w(5, "x"), "en", "src0", 0),
        (2, f"{_w(7, 'c')} {_w(10, 'd')}", "en", "src0", 0),
        (3, f"{_w(7, 'c')} {_w(10, 'e')}", "en", "src0", 0),
    ]
    out = dedup_exact_substring(spark, _docs_dir(spark, tmp_path, rows))
    assert _spans(out) == set()


def test_psi_zero_for_identical_and_positive_for_shifted(spark, tmp_path):
    """PSI is exactly 0 against an identically-binned source (including
    the reference itself) and strictly positive for a shifted one."""
    rows = (
        [(i, "t", "en", "src0", 30 + 10 * (i % 3)) for i in range(30)]
        + [(100 + i, "t", "en", "src1", 30 + 10 * (i % 3)) for i in range(30)]
        + [(200 + i, "t", "en", "src2", 500) for i in range(30)]
    )
    out = {
        r["source"]: r["psi"]
        for r in corpus_drift_psi(spark, _docs_dir(spark, tmp_path, rows)).collect()
    }
    assert out["src0"] == 0.0
    assert out["src1"] == 0.0  # same histogram, different doc ids
    assert out["src2"] > 0.25  # fully shifted into the open-ended bin
    assert all(v >= 0 for v in out.values())  # PSI is non-negative


def test_psi_missing_reference_source_yields_empty(spark, tmp_path):
    """No reference slice in the input -> empty report (never a crash or
    a silently-wrong unsmoothed division)."""
    rows = [(i, "t", "en", "srcX", 100) for i in range(5)]
    out = corpus_drift_psi(spark, _docs_dir(spark, tmp_path, rows))
    assert out.count() == 0


# --- property pin: spans == brute force on any corpus ------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from cdc_export_system_spark.dedup.substring import SEED_LEN  # noqa: E402

_SEGMENT = st.lists(
    st.sampled_from("abcde"), min_size=3, max_size=12
).map(lambda toks: [f"w{t}" for t in toks])
_POOL = st.lists(_SEGMENT, min_size=2, max_size=4)


@st.composite
def _corpus(draw):
    """Docs concatenated from a shared segment pool, so duplicated runs
    of varying lengths (including > SEED_LEN and sub-seed) actually
    occur, unlike uniformly random tokens."""
    pool = draw(_POOL)
    n_docs = draw(st.integers(min_value=1, max_value=5))
    docs = []
    for _ in range(n_docs):
        picks = draw(
            st.lists(st.integers(0, len(pool) - 1), min_size=1, max_size=4)
        )
        docs.append([tok for i in picks for tok in pool[i]])
    return docs


def _brute_spans(docs):
    """Reference implementation: duplicated SEED_LEN-gram seeds ->
    covered positions -> maximal islands, in plain Python."""
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - SEED_LEN + 1):
            grams[tuple(toks[i : i + SEED_LEN])] += 1
    spans = set()
    for doc_id, toks in enumerate(docs):
        cov = set()
        for i in range(len(toks) - SEED_LEN + 1):
            if grams[tuple(toks[i : i + SEED_LEN])] >= 2:
                cov.update(range(i + 1, i + SEED_LEN + 1))  # 1-based
        for p in sorted(cov):
            if p - 1 in cov:
                continue
            q = p
            while q + 1 in cov:
                q += 1
            spans.add((doc_id, p, q, q - p + 1))
    return spans


def _brute_scrub(docs):
    """Reference scrub: tokens minus covered positions, per doc."""
    spans = _brute_spans(docs)
    out = {}
    for doc_id, toks in enumerate(docs):
        cov = set()
        for d, p, q, _ in spans:
            if d == doc_id:
                cov.update(range(p, q + 1))
        kept = [t for i, t in enumerate(toks, start=1) if i not in cov]
        out[doc_id] = (" ".join(kept), len(cov))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus())
def test_substring_spans_and_scrub_match_brute_force(spark, tmp_path_factory, docs):
    from cdc_export_system_spark.dedup.substring import dedup_substring_scrub

    tmp = tmp_path_factory.mktemp("sub")
    rows = [
        (i, " ".join(toks), "en", "src0", 0) for i, toks in enumerate(docs)
    ]
    d = _docs_dir(spark, tmp, rows)
    assert _spans(dedup_exact_substring(spark, d)) == _brute_spans(docs)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup_substring_scrub(spark, d).collect()
    }
    assert got == _brute_scrub(docs)


def test_scrub_removes_exactly_the_duplicated_spans(spark, tmp_path):
    """Scrub = original minus covered positions: the shared 10-token
    prefix disappears from both docs, unique tails survive verbatim, a
    dup-free doc passes through unchanged, and n_removed equals the
    span-length sum per doc."""
    from cdc_export_system_spark.dedup.substring import dedup_substring_scrub

    shared, tail_a, tail_b = _w(10, "s"), _w(12, "a"), _w(12, "b")
    rows = [
        (1, f"{shared} {tail_a}", "en", "src0", 0),
        (2, f"{shared} {tail_b}", "en", "src0", 0),
        (3, _w(15, "z"), "en", "src0", 0),
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup_substring_scrub(spark, d).collect()
    }
    assert got == {
        1: (tail_a, 10),
        2: (tail_b, 10),
        3: (_w(15, "z"), 0),
    }


def test_substring_seed_len_knob(spark):
    """Non-default seed_len: a larger seed raises the detection floor, so
    the span set shrinks (subset of covered positions) and every reported
    span is at least seed_len long."""
    from cdc_export_system_spark.dedup.substring import dedup_exact_substring

    base = dedup_exact_substring(spark, SF_DIR)
    wide = dedup_exact_substring(spark, SF_DIR, seed_len=12)
    assert all(r.span_len >= 12 for r in wide.collect())
    base_cov = base.selectExpr("sum(span_len) AS c").first()["c"] or 0
    wide_cov = wide.selectExpr("sum(span_len) AS c").first()["c"] or 0
    assert wide_cov <= base_cov  # higher floor never covers more


def test_upsample_weights_mix_knob(spark):
    """Non-default target mix: overriding the permille table changes
    target_share/weight and the curation gate (unlisted sources drop)."""
    from cdc_export_system_spark.operators.sampling import corpus_upsample_weights

    df = corpus_upsample_weights(spark, SF_DIR, {"src0": 700, "src1": 300})
    rows = {r.source: r for r in df.collect()}
    assert set(rows) <= {"src0", "src1"}
    if "src0" in rows:
        assert abs(rows["src0"].target_share - 0.7) < 1e-9


def test_token_budget_knob(spark):
    """Non-default token budget: a smaller budget takes a prefix of the
    same deterministic order."""
    from cdc_export_system_spark.operators.sampling import corpus_token_budget_sample

    small = corpus_token_budget_sample(spark, SF_DIR, token_budget=500)
    big = corpus_token_budget_sample(spark, SF_DIR, token_budget=2000)
    s_ids = {r.doc_id for r in small.collect()}
    b_ids = {r.doc_id for r in big.collect()}
    assert s_ids <= b_ids and len(s_ids) <= len(b_ids)
