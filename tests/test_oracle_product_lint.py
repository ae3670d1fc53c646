"""Oracle-side BIGINT-product overflow ratchet (VERDICT r08 item 4).

The Spark-side sibling (`tests/test_int_product_lint.py`) proves every
registered query's plan keeps volume-scaled integer products out of
bare int64 arithmetic. This sweep proves the same property for the
DuckDB oracle TEXTS, via `tests/lint_oracle_products.scan_oracle` —
DuckDB's own parser + typed probes, so the type inference matches the
binder that actually runs the oracles.

Every flag below is audited: the justification is a magnitude bound by
CONSTRUCTION (fixed-width hash, modulus fold, quantized unit, domain
cardinality, per-row/per-doc quantity), never "the testdata is small".
Where the Spark allowlist has the same query, the justification is the
same math on the other engine. Volume-scaled products get an explicit
HUGEINT operand cast in the oracle text instead of an allowlist entry
(the r9 fixes: LTTB pick scores, Markov micro-probability promotions).
"""

from __future__ import annotations

import pytest

from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.lint_oracle_products import _load_base_schemas, scan_oracle

REGISTRY = load_all()

# ---------------------------------------------------------------------------
# query -> (expected flag kinds, justification). Kinds compare as SETS:
# an unlisted flagged query fails; a listed query that lints clean fails
# as stale. See the Spark-side allowlist for the shared-math entries.
# ---------------------------------------------------------------------------

_KNUTH = "Knuth fold: (x %% 2^31) * 2654435761 <= 5.71e18 < 2^63"
_MINHASH = "minhash perm a*h+b: a < 2^31, h < 2^32 (md5 prefix) -> < 2^63-2^32"
_QUANT = "quantized component products (<= 2e6 micro each): <= 4e12 per term"
_TOKLP = "tok_cnt (per-doc) * lp_micro (<= 30e6): per-doc bounded"

_ALLOWED: dict[str, tuple[set, str]] = {
    # --- deterministic hash sampling / decontamination (Knuth folds)
    "cdc_forget_users_audit": ({"big-literal"}, _KNUTH),
    "corpus_importance_resample": ({"big-literal"}, _KNUTH),
    "corpus_mix_weighted": ({"big-literal"}, _KNUTH),
    "corpus_decontaminate": ({"big-literal"}, _KNUTH),
    "corpus_decontaminate_bloom": ({"big-literal"}, _KNUTH),
    "corpus_decontaminate_report": ({"big-literal"}, _KNUTH),
    "ml_feature_drift_psi": ({"big-literal"}, _KNUTH),
    "pipeline_pretraining_corpus": ({"big-literal"}, _KNUTH),
    "sample_hash": ({"big-literal"}, _KNUTH),
    "sample_split_train_test": ({"big-literal"}, _KNUTH),
    "sample_stratified_hash": ({"big-literal"}, _KNUTH),
    "source_python_changefeed": ({"big-literal"}, _KNUTH),
    "source_python_changefeed_pushdown": ({"big-literal"}, _KNUTH),
    "source_python_changefeed_stream": ({"big-literal"}, _KNUTH),
    "text_pii_scrub": ({"big-literal"}, "Knuth-style fold with *7919 (tiny)"),
    "feat_hash_crosses": ({"big-literal"},
                          "(key %% 2^31) * 1000003 <= 2.1e15 — folded cross"),
    "stats_bootstrap_ci": ({"big-literal", "col-x-col"},
                           "(r+1)*1000003 with r < BOOT_R=100 (<= 1.01e8) "
                           "feeding a %% 2^31 fold; cnt (Poisson cap 5) * "
                           "row cents — both mirrored from the Spark list"),
    # --- entity-resolution feed derivation: mod-bounded Knuth mix
    # ((k % 999983) * 2654435761 + salt) % 1000 <= 2.66e15 by
    # construction (mod precedes the multiply), data-size independent.
    "er_blocking_stats": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_candidate_pairs": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_match_metrics": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_one_to_one": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_entity_clusters": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_golden_record": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    # er_em: same inherited feed mix; the EM recursion itself is all
    # explicit HUGEINT (5-factor micro-unit products <= 1e30 < 1.7e38)
    "er_em_weights": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    "er_match_metrics_em": ({"big-literal"}, "mod-999983-bounded Knuth mix"),
    # --- geo: quadratic coordinate maps (x*x with x = k % 999983 <
    # 1e6 -> a·x² <= 5e12) and squared distances (coords < 1.2e7 µdeg
    # -> Δ² < 1.45e14) — all domain-bounded by construction.
    "geo_point_in_polygon": (
        {"col-x-col", "big-literal"},
        "x² coord map (x < 1e6 domain); radius literal 30000*(6..15) "
        "<= 4.6e5; ray-cast cross products with |Δcoord| < 3.4e7 µdeg "
        "-> |t| < 1.2e15; dir*radius <= 10*4.6e5; 0/1 inside * coord"),
    "geo_contains_join": (
        {"col-x-col", "big-literal"},
        "same bounds as geo_point_in_polygon; 0/1 inside * point_id "
        "(custkey domain)"),
    "geo_cell_index": ({"col-x-col"}, "x² coord map, x < 1e6 (domain)"),
    "geo_bbox_by_nation": ({"col-x-col"}, "x² coord map, x < 1e6 (domain)"),
    "geo_near_join": ({"col-x-col"},
                      "x² coord map + Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_near_join_salted": ({"col-x-col"},
                             "same oracle as geo_near_join (salting is "
                             "physical-plan-only)"),
    "geo_near_join_adaptive": ({"col-x-col"},
                               "same oracle as geo_near_join (tile "
                               "refinement is physical-plan-only)"),
    "geo_knn": ({"col-x-col"},
                "x² coord map + Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_knn_pruned": ({"col-x-col"},
                       "same oracle as geo_knn (ring pruning is "
                       "physical-plan-only)"),
    "geo_knn_adaptive": ({"col-x-col"},
                         "same oracle as geo_knn (adaptive-tile "
                         "pruning is physical-plan-only)"),
    # --- privacy: group_size * n_groups(group_size) == the number of
    # ROWS living in groups of that size, which is <= count(*) of the
    # table by identity — bounded by the row count itself.
    "privacy_k_anonymity": ({"col-x-col"},
                            "size * groups-of-size == rows-in-size <= n"),
    # --- minhash universal hashing
    "dedup_minhash_signature": ({"big-literal"}, _MINHASH),
    "dedup_minhash_lsh": ({"big-literal"}, _MINHASH),
    "dedup_minhash_verified": ({"big-literal"}, _MINHASH),
    "dedup_minhash_accuracy": ({"big-literal"}, _MINHASH),
    "dedup_minhash_incremental": ({"big-literal"}, _MINHASH),
    "dedup_cluster_cc": ({"big-literal"}, _MINHASH),
    "pipeline_dedup_funnel": ({"big-literal"}, _MINHASH),
    # --- per-pair / per-doc bounded micro promotions
    "dedup_method_agreement": ({"big-literal"},
                               "shared fingerprints per PAIR * 1e6; per-doc "
                               "fingerprint count guarded (winnowing guard)"),
    "dedup_threshold_sweep": ({"big-literal"}, "same per-pair shared * 1e6"),
    "dedup_winnowing_overlap": ({"big-literal"}, "same per-pair shared * 1e6"),
    "corpus_gopher_filter": ({"big-literal", "col-x-col"},
                             "per-doc token counts * <= 1000 rule literals"),
    "multimodal_wav_stats": ({"big-literal"},
                             "per-file n_frames * 1e6: RIFF chunk size "
                             "bounds frames < 2^32 -> < 4.3e15"),
    "multimodal_decode_dims": ({"col-x-col"},
                               "pixel geometry products, w/h < 2^16 headers"),
    "multimodal_tile_plan": ({"big-literal", "col-x-col"},
                             "tile geometry bounded by w,h <= 2048"),
    "multimodal_jpeg_stats": ({"col-x-col"},
                              "n_match = w*h with w <= 47, h <= 39 by "
                              "the generator's modulus"),
    "multimodal_jpeg420_stats": ({"col-x-col"},
                                 "same oracle as multimodal_jpeg_stats "
                                 "(constant planes box-average to "
                                 "themselves; only the codec tag differs)"),
    "multimodal_jpeg_rst_stats": ({"col-x-col"},
                                  "same oracle as multimodal_jpeg_stats "
                                  "(restart markers change entropy "
                                  "framing, never coefficients)"),
    "multimodal_jpeg_progressive_stats": (
        {"col-x-col"},
        "same oracle as multimodal_jpeg_stats (both encoders share "
        "_quantized_blocks, so progressive carries bit-identical "
        "coefficients; only the codec tag differs)"),
    "multimodal_jpeg12_stats": (
        {"col-x-col"},
        "n_match = w*h with w <= 47, h <= 39 by the generator's "
        "modulus (12-bit closed form, center 2048 / q00 128)"),
    "multimodal_jpeg_lossless_stats": (
        {"col-x-col"},
        "gradient-sum closed forms: w <= 47, h <= 39, channel offsets "
        "< 100 -> every sum < 47*39*183 < 3.4e5"),
    "multimodal_audio_adpcm_stats": (
        {"col-x-col"},
        "ADPCM state replay: 0/1 threshold indicators (b4/b2/b1) * "
        "step <= 32767 (89-entry ladder max); vpdiff <= 2*step+7 < "
        "65542; everything else mod-bounded by the generator"),
    "multimodal_audio_g711_stats": ({"col-x-col", "shiftleft"},
                                    "n <= 499 frames * |rt| <= 32124 "
                                    "(G.711 dequantized max) < 1.7e7; "
                                    "1 << seg bounded by seg <= 7 (CASE "
                                    "range construction)"),
    # --- 0/1 indicator products
    "ab_proportion_ztest": ({"col-x-col"}, "0/1 treatment * 0/1 outcome"),
    "ml_uplift_qini": ({"col-x-col"}, "0/1 treatment * 0/1 outcome"),
    "ml_att_stratified": ({"col-x-col"}, "0/1 indicator products"),
    # --- row-value-bounded quantization (value scale, not volume scale)
    "agg_value_histogram": ({"big-literal"},
                            "bin_id * width: bin_id = value div width is "
                            "row-value-bounded"),
    "attribution_position_based": ({"col-x-col"},
                                   "per-order conversion cents * <= 1e6 "
                                   "position weight"),
    "ml_calibration_table": ({"big-literal"},
                             "floor(discount*100)*1e4 with discount in "
                             "[0,1] -> <= 1e6 by domain"),
    "ml_brier_decomposition": ({"big-literal"}, "same discount quantization"),
    "ml_gbm_stumps": ({"big-literal"},
                      "floor(value*100+5)*1e4: row-value-bounded "
                      "(int64-safe to value ~ 9.2e12)"),
    "window_rolling_zscore": ({"col-x-col"},
                              "cents^2 row product summed over a bounded "
                              "window frame"),
    "sessionize_dynamic_gap": ({"big-literal"},
                               "CASE(1800|600) * 1e6 <= 1.8e9 — constant "
                               "branches, CASE just hides the fold"),
    "stream_sliding_window": ({"big-literal"},
                              "1800 * window index: epoch-bounded"),
    "ts_forecast_linear": ({"big-literal"},
                           "day index * 86.4e9 us/day: int64-safe to "
                           "~2262 (the timestamp horizon itself)"),
    # --- quantized fixed-point model arithmetic (dim-bounded)
    "cluster_kmeans_exact": ({"col-x-col"}, _QUANT),
    "sim_search_ivf_exact": ({"col-x-col"}, _QUANT),
    "sim_search_pq_exact": ({"col-x-col"}, _QUANT),
    "sim_search_ivf_pq_exact": ({"col-x-col"}, _QUANT),
    "feat_pca_power_exact": ({"col-x-col"}, _QUANT),
    "dedup_semantic_exact": ({"col-x-col"}, _QUANT),
    "sim_mmr_rerank_exact": ({"col-x-col"}, _QUANT),
    # --- per-doc language-model scoring
    "ml_confusion_matrix": ({"col-x-col"}, _TOKLP),
    "ml_eval_report": ({"col-x-col"}, _TOKLP),
    "ml_naive_bayes": ({"col-x-col"}, _TOKLP),
    # --- domain-cardinality / window-bounded statistics
    "stats_chi2_independence": ({"col-x-col"},
                                "(r-1)(c-1) df over DISTINCT types x "
                                "weekdays — domain cardinality"),
    "stats_benjamini_hochberg": ({"big-literal", "col-x-col"},
                                 "p_rank <= m_tests (domain-bounded) * 1e9; "
                                 "p_nano*20*m safe to m ~ 4.6e8"),
    "ts_mann_kendall": ({"col-x-col"},
                        "n(n-1)(2n+5) with n = per-user DAYS — int64-safe "
                        "to n ~ 1.6e6 days"),
    "ts_autocorrelation": ({"col-x-col"},
                           "n^2 with n = per-user day count (same bound)"),
    "ts_ewma_crossover": ({"shiftleft", "col-x-col"},
                          "2^rn guarded rn <= 40; sgn*prev in {-1,0,1}"),
    "event_markov_stationary_exact": ({"col-x-col"},
                                      "squaring terms p*p <= 1e12 (p <= 1e6 "
                                      "micro-probs); the volume-scaled "
                                      "n*1e6 is HUGEINT since r9"),
    "attribution_markov_removal": ({"big-literal"},
                                   "removal effect (<= 1e6 micro) * 1e6 "
                                   "<= 1e12; the volume-scaled cv*1e6 and "
                                   "n*p paths are HUGEINT since r9"),
    "metric_concentration_shares": ({"col-x-col"},
                                    "pct spine (<= 100) * rank-range count: "
                                    "linear in rows, safe to ~9e16 rows"),
    # --- bit tricks
    "fn_bitwise_conditional": ({"shiftleft"}, "(key & 15) << 3 <= 120"),
}

_BASE = _load_base_schemas(SF_DIR)

_WITH_ORACLE = sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)


def test_allowlist_subset_of_registry():
    stale = set(_ALLOWED) - set(_WITH_ORACLE)
    assert not stale, f"allowlisted but not oracle-carrying: {sorted(stale)}"


def test_lint_self_check_flags_and_clears():
    """The lint must flag a bare volume-scaled product and clear its
    HUGEINT rewrite (the exact edit the ratchet is meant to force)."""
    bad = """
        SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) * 1000000 AS x
        FROM lineitem
    """
    flags, unresolved = scan_oracle(bad, _BASE)
    assert {f.kind for f in flags} == {"big-literal"} and not unresolved
    good = """
        SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS HUGEINT) * 1000000 AS x
        FROM lineitem
    """
    flags, unresolved = scan_oracle(good, _BASE)
    assert flags == [] and not unresolved
    # DuckDB's SUM(BIGINT) auto-promotes to HUGEINT, so a bare SUM(...)*lit
    # is genuinely safe there (unlike Spark, where sum(long) stays long —
    # the exact asymmetry this oracle-side lint exists to track).
    promoted = """
        SELECT SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               * 1000000 AS x
        FROM lineitem
    """
    flags, unresolved = scan_oracle(promoted, _BASE)
    assert flags == [] and not unresolved

    # col-x-col: two data-scaled columns multiply bare -> flag
    pair = "SELECT doc_id * n_chars AS x FROM documents"
    assert {f.kind for f in scan_oracle(pair, _BASE)[0]} == {"col-x-col"}


def test_lint_type_inference_tracks_duckdb():
    """DuckDB semantics the inference MUST get right: / is DOUBLE,
    SUM(int) promotes to HUGEINT, // stays integral."""
    div = "SELECT (doc_id / 3) * n_chars AS x FROM documents"
    assert scan_oracle(div, _BASE)[0] == []  # double multiply — clean
    summed = "SELECT SUM(n_chars) * 1000000 AS x FROM documents"
    assert scan_oracle(summed, _BASE)[0] == []  # HUGEINT * lit — clean
    idiv = "SELECT (doc_id // 3) * n_chars AS x FROM documents"
    assert {f.kind for f in scan_oracle(idiv, _BASE)[0]} == {"col-x-col"}


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_no_unreviewed_oracle_int64_products(name):
    flags, unresolved = scan_oracle(REGISTRY[name].oracle, _BASE)
    assert not unresolved, (
        f"{name}: oracle lint could not type {unresolved[:5]} — extend "
        "tests/lint_oracle_products.py (unknowns must not pass silently)"
    )
    kinds = {f.kind for f in flags}
    assert "unknown-type" not in kinds, (
        f"{name}: multiply with unresolved operand type: "
        f"{[f.site for f in flags if f.kind == 'unknown-type'][:3]}"
    )
    if name in _ALLOWED:
        expected, _reason = _ALLOWED[name]
        assert kinds, (
            f"{name} is allowlisted for {expected} but now lints clean — "
            "remove the stale allowlist entry"
        )
        assert kinds <= expected, (
            f"{name}: new un-audited flag kinds {kinds - expected}: "
            f"{[(f.kind, f.site[:90]) for f in flags][:5]}"
        )
    else:
        assert not kinds, (
            f"{name}: un-reviewed integral product in oracle SQL: "
            f"{[(f.kind, f.site[:90]) for f in flags][:5]} — add an explicit "
            "HUGEINT/DECIMAL operand cast or allowlist with a proven bound"
        )
