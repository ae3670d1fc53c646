"""BIGINT-product overflow ratchet (VERDICT r07 item 2).

Walks every registered query's optimized plan (tests/lint_int_products)
for integral Multiply/ShiftLeft expressions whose magnitude is not
provably inside int64. Every hit must be in _ALLOWED below with a
justification — a magnitude bound by CONSTRUCTION (fixed-width hash,
guarded index, quantized unit, domain cardinality), never by "the
testdata is small". Anything volume-scaled gets the DECIMAL(38,0) /
HUGEINT treatment instead (this round: as-of packing, Knuth-hash key
folds, qini/youden/kappa/mcnemar/affinity/clustering/skew/brier/
calibration/theil-sen/rake/vocab-coverage/rank-normalize/hash-crosses
— see the round-8 SCALING.md addendum).

The round-7 motivation: `metric_concentration_shares` shipped a
cents-sum * 1e6 BIGINT product that only overflowed at sf1 — caught by
measurement, not review. This lint is the review that would have
caught it: its pre-fix form (cum cents * 1e6) flags as `big-literal`.

Materialization boundaries: eagerly-materialized localCheckpoint
segments — and intermediates the query collects driver-side — hide
their expressions from the final optimized plan as LogicalRDD scans,
so the sweep scans at EVERY boundary: localCheckpoint / collect /
toPandas are wrapped to lint the segment's optimized plan right before
materializing it for real. History: r8 tried identity-stubbing the
checkpoint via pyspark.sql.DataFrame, but that is the abstract base —
the concrete pyspark.sql.classic.dataframe.DataFrame shadows the
patch, so the r8 scan silently saw only the post-checkpoint tail. The
r9 boundary scan (prompted by the oracle-side lint disagreeing with
this one) surfaced ten queries' hidden segments, including genuinely
volume-scaled arithmetic: the LTTB pick score (epoch-seconds x
per-user bucket count x cents) and the Markov micro-probability
promotions — all now DECIMAL(38,0)/HUGEINT on both engines.
"""

from __future__ import annotations

import pytest

from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.lint_int_products import scan_df, scan_plan_json

REGISTRY = load_all()


@pytest.fixture(scope="module", autouse=True)
def _uncached_plans(spark):
    """Another test's df.cache() makes Catalyst substitute
    InMemoryRelation into matching optimized-plan fragments, HIDING
    their expressions from this sweep (the cache sibling of the r9
    localCheckpoint blind spot — first seen when test_geo's cached kNN
    frame made geo_knn 'lint clean' in full-suite order only). The
    sweep must always scan the real expression trees."""
    spark.catalog.clearCache()

# query -> (expected flag kinds, justification). Kinds are compared as
# SETS: a query producing a kind not listed here fails; a listed query
# producing NO flags fails as stale.
_ALLOWED: dict[str, tuple[set, str]] = {
    # --- MinHash universal hashing: (a*h + b) % P with a odd < 2^31,
    # h a 32-bit md5 prefix, b < 2^31. max(a*h + b) = (2^31-1)(2^32-1)
    # + 2^31-1 = 2^63 - 2^32 < 2^63-1: proven, data-independent (the
    # operands are fixed-width hashes, not data magnitudes). The band
    # digest m*P + m < 2^62 is documented at dedup/minhash.py:157.
    "dedup_minhash_signature": ({"col-x-col"}, "a*h+b < 2^63-2^32, fixed-width"),
    "dedup_minhash_lsh": ({"big-literal", "col-x-col"}, "minhash perm + band digest"),
    "dedup_minhash_verified": ({"big-literal", "col-x-col"},
                               "minhash perm + band digest (checkpointed "
                               "segment, visible since the r9 scan fix)"),
    "dedup_minhash_accuracy": ({"big-literal", "col-x-col"},
                               "minhash perm + band digest (checkpointed)"),
    "dedup_minhash_incremental": ({"big-literal", "col-x-col"},
                                  "minhash perm + band digest"),
    "pipeline_dedup_funnel": ({"big-literal", "col-x-col"},
                              "minhash perm + band digest (checkpointed)"),
    "dedup_cluster_cc": ({"big-literal", "col-x-col"},
                         "minhash perm + band digest (checkpointed)"),
    # --- CDF-fed MV maintenance: sign * cents with sign in {-1, +1}
    # and cents = floor(o_totalprice*100+0.5) <= ~6e7 (TPC-H totalprice
    # < 600k) — |product| == cents, no growth at any scale.
    "mv_from_txn_changes": ({"col-x-col"}, "sign(+/-1) * cents <= 6e7"),
    # --- rolling-hash / bloom-filter bit arithmetic: shiftleft wraps by
    # JVM definition (no ANSI throw) and the wrap IS the hash mixing;
    # shift amounts are literals < 64.
    "corpus_decontaminate": ({"shiftleft"}, "rolling-hash/bloom shifts"),
    "corpus_decontaminate_bloom": ({"shiftleft"}, "rolling-hash/bloom shifts"),
    "corpus_decontaminate_report": ({"shiftleft"}, "rolling-hash/bloom shifts"),
    "dedup_exact_substring": ({"shiftleft"}, "8-byte gram packing shifts"),
    "dedup_substring_scrub": ({"shiftleft"}, "8-byte gram packing shifts"),
    "fn_bitwise_conditional": ({"shiftleft"}, "(key & 15) << 3 <= 120"),
    # --- guarded / window-bounded series arithmetic
    "ts_ewma_crossover": ({"shiftleft", "col-x-col"},
                          "2^rn guarded rn<=40 (assert_true); sgn*prev in {-1,0,1}"),
    "ts_mann_kendall": ({"col-x-col", "big-literal"},
                        "n(n-1)(2n+5) with n = per-user DAYS, window-bounded; "
                        "int64-safe to n ~ 1.6e6 days (~4400 years)"),
    # --- domain-cardinality-bounded counts
    "stats_chi2_independence": ({"col-x-col"},
                                "(r-1)(c-1) df product over DISTINCT event "
                                "types x weekdays — domain cardinality"),
    "stats_benjamini_hochberg": ({"col-x-col", "big-literal"},
                                 "p_nano <= 1e9+1 times m_tests (hypothesis "
                                 "count, domain-bounded); safe to m ~ 4.6e8"),
    # --- per-row / per-doc bounded quantities (do not grow with corpus)
    "ml_naive_bayes": ({"col-x-col"}, "tok_cnt (per-doc) * lp_micro (<=30e6)"),
    "ml_confusion_matrix": ({"col-x-col"}, "tok_cnt (per-doc) * lp_micro"),
    "ml_eval_report": ({"col-x-col"}, "tok_cnt (per-doc) * lp_micro"),
    "ml_att_stratified": ({"col-x-col"}, "0/1 indicator products"),
    "metric_mix_shift": ({"col-x-col"}, "0/1 indicator * row cents"),
    "attribution_position_based": ({"col-x-col"},
                                   "row-level conversion cents * <=1e6 CASE "
                                   "weight — per-order, not cumulative"),
    "metric_concentration_shares": ({"col-x-col"},
                                    "pct spine (<=100) * rank-range count; "
                                    "the cents*1e6 path is DECIMAL since r7"),
    "corpus_gopher_filter": ({"big-literal", "col-x-col"},
                             "per-doc token counts * <=1000 rule literals"),
    "dedup_winnowing_overlap": ({"big-literal"},
                                "shared fingerprints per pair * 1e6; "
                                "per-doc fingerprints guarded (winnowing "
                                "oversize-doc guard, dedup/substring.py)"),
    "agg_value_histogram": ({"big-literal"},
                            "bin_id * bin width: bin_id = value div width "
                            "is row-value-bounded, not volume-scaled"),
    "ts_forecast_linear": ({"big-literal"},
                           "(tmax + h) * 86400: day index * seconds/day — "
                           "epoch-bounded (int64-safe for ~10^13 days)"),
    "multimodal_tile_plan": ({"col-x-col", "big-literal"},
                             "tile geometry products bounded by w,h <= 2048 "
                             "(hash dims folded mod 2^31 since r8)"),
    # --- fixed-point quantized model arithmetic (micro-units, dim-bounded)
    "cluster_kmeans_exact": ({"col-x-col"},
                             "quantized component diffs (<=2e6 micro) "
                             "squared: <= 4e12 per term"),
    "sim_search_ivf_exact": ({"col-x-col"}, "quantized component diff^2"),
    "sim_search_pq_exact": ({"col-x-col"}, "quantized component products"),
    "sim_search_ivf_pq_exact": ({"col-x-col"}, "quantized component products"),
    "feat_pca_power_exact": ({"col-x-col"},
                             "quantized eigenvector component * sign flip"),
    "dedup_semantic_exact": ({"col-x-col", "big-literal"},
                             "quantized component products + triangle block "
                             "ids (* 8, block count bounded by B)"),
    # --- exact-money row products (registry.dmulsum convention): the
    # per-row FLOOR(x*100)*FLOOR(y*100) multiply is row-value-bounded
    # (~1e11 for price*discount-scale, ~1e13 with tax), far inside
    # int64; the volume-scaled part — the SUM accumulator — is a
    # radix-2^22 hi/lo BIGINT pair since r9 (each sum bounded by
    # n_group * 4.2e6, safe to ~2.2e12 rows/group), merged in DECIMAL
    # on the final row (oracle: DECIMAL/HUGEINT).
    "tpch_q1": ({"col-x-col"}, "dmulsum row product; hi/lo pair accumulator"),
    "mv_delta_join": ({"col-x-col"},
                      "dmulsum row product (open hi/lo partial state "
                      "merged across the four bilinear delta terms)"),
    "tpch_q3": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q5": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q6": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q7_like": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q8_like": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q9_like": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q10_like": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q14": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q15": ({"col-x-col"}, "dmulsum row product"),
    "tpch_q19_like": ({"col-x-col"}, "dmulsum row product"),
    "join_bloom_prefilter": ({"col-x-col", "shiftleft"},
                             "dmulsum row product + bloom bit shifts "
                             "(collected segment, visible since r9)"),
    "agg_weighted_avg": ({"col-x-col"}, "dmulsum row product (price*qty)"),
    "feat_standardize": ({"col-x-col"},
                         "cents^2 row product (value-bounded); sum-of-"
                         "squares accumulator DECIMAL since r8"),
    "window_rolling_zscore": ({"col-x-col"},
                              "cents^2 row product summed over a "
                              "ROLLZ_FRAME-row bounded window frame"),
    "ml_calibration_table": ({"big-literal"},
                             "score quantization floor(disc*100)*1e4 with "
                             "disc in [0,1] — <= 1e6 by domain"),
    "rfm_segmentation": ({"col-x-col"},
                         "(n %% 5) * (n/5 + 1): linear in row count, "
                         "int64-safe to ~1e18 rows"),
    # --- checkpointed/collected segments made visible by the r9 scan fix
    "dedup_method_agreement": ({"big-literal"},
                               "shared fingerprints per PAIR * 1e6; per-doc "
                               "count guarded (winnowing oversize guard)"),
    "dedup_threshold_sweep": ({"big-literal"},
                              "same per-pair shared * 1e6 bound"),
    "event_markov_stationary_exact": ({"col-x-col"},
                                      "squaring terms p*p <= 1e12 (p <= 1e6 "
                                      "micro-probs by construction); the "
                                      "volume-scaled n*1e6 is DECIMAL(38,0) "
                                      "since r9"),
    "ml_brier_decomposition": ({"big-literal"},
                               "floor(discount*100)*1e4 with discount in "
                               "[0,1] -> <= 1e6 by domain"),
    "ml_gbm_stumps": ({"big-literal"},
                      "floor(value*100+5)*1e4: row-value-bounded "
                      "(int64-safe to value ~ 9.2e12)"),
    "ml_logistic_exact": ({"big-literal"},
                          "weight literals bounded by construction "
                          "(|w| <= ITERS * 2.3e6 — each step is grad div "
                          "(n*10) with |residual| <= S/2 and features "
                          "h <= 23, d <= 7), so z*S <= ~2e14"),
    "ml_uplift_qini": ({"col-x-col"}, "0/1 treatment * 0/1 outcome"),
    "sim_mmr_rerank_exact": ({"col-x-col"},
                             "quantized component products (<= 2e6 micro)"),
    "window_global_deciles": ({"col-x-col"},
                              "(n %% 10) * (n/10 + 1): linear in rows"),
    "stats_bootstrap_ci": ({"col-x-col", "big-literal"},
                           "(r+1)*BOOT_SALT with r < BOOT_R=100 (<=1.01e8, "
                           "then folded mod 2^31 for the Knuth mix); "
                           "cnt (Poisson(1) capped at 5) * row cents"),
    # NOTE: the er_* feed derivation's Knuth mix ((k % 999983) *
    # 2654435761) needs NO entry here — the lint's bound propagation
    # proves the mod-bounded product <= 2.66e15 and clears it. The
    # DuckDB-side lint cannot propagate that bound, so the ORACLE
    # allowlist (tests/test_oracle_product_lint.py) does carry er_*
    # entries.
    # --- geo: squared Euclidean distance in µdeg. Coordinates are
    # DOMAIN-bounded by construction (lat_u/lon_u = mix2 * 12 <
    # 1.2e7 µdeg — a 12°x12° region; real-world coords cap at 1.8e8
    # µdeg), so Δ² < 1.44e14 (3.3e16 at planet scale) << 2^63,
    # independent of data volume.
    "geo_point_in_polygon": ({"col-x-col", "big-literal"},
                             "ray-cast cross products: |Δcoord| < "
                             "3.4e7 µdeg (point/vertex domain; vertices "
                             "= center + dir*radius <= 1.2e7 + 10*4.6e5"
                             "*10) -> |t| < 1.2e15 << 2^63; dir*radius "
                             "and 0/1 inside * coord are domain-bounded"),
    "geo_contains_join": ({"col-x-col", "big-literal"},
                          "same ray-cast bounds as geo_point_in_polygon "
                          "(|t| < 1.2e15); 0/1 inside * point_id "
                          "(custkey < 1.5e7 at sf100)"),
    "geo_near_join": ({"col-x-col"}, "Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_near_join_salted": ({"col-x-col"},
                             "Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_knn": ({"col-x-col"}, "Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_knn_pruned": ({"col-x-col"},
                       "Δ² with coords < 1.2e7 µdeg (domain)"),
    "geo_knn_adaptive": ({"col-x-col", "big-literal"},
                         "Δ² and tile-mindist dx²+dy² with coords "
                         "< 1.2e7 µdeg (domain); cell*CELL(=3e5) "
                         "< 1.2e7, ti*ts <= CELL, sub*ns <= 16 — tile "
                         "geometry bounded by the coordinate DOMAIN"),
    "geo_near_join_adaptive": ({"col-x-col", "big-literal"},
                               "Δ² with coords < 1.2e7 µdeg (domain); "
                               "cell*CELL(=3e5) < 1.2e7, tile index "
                               "ti*ts <= CELL, sub*ns <= 16 — all tile "
                               "geometry bounded by the coordinate "
                               "DOMAIN, not data volume"),
}


def test_lint_catches_the_concentration_shares_class(spark):
    """The motivating bug: cum-cents * 1e6 in BIGINT (the r7
    metric_concentration_shares form) must FLAG; its DECIMAL(38,0)
    rewrite must NOT."""
    from pyspark.sql import functions as F

    from cdc_export_system_spark.io.sources import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    bad = li.agg((F.sum(cents) * F.lit(1_000_000)).alias("x"))
    assert {f["kind"] for f in scan_df(bad)} == {"big-literal"}
    good = li.agg(
        (F.sum(cents).cast("decimal(38,0)") * F.lit(1_000_000)).alias("x")
    )
    assert scan_df(good) == []


def test_lint_bound_propagation_clears_folded_knuth(spark):
    """(key % 2^31) * KNUTH is provably < 2^63 and must lint clean;
    the unfolded key * KNUTH must flag."""
    from pyspark.sql import functions as F

    from cdc_export_system_spark.io.sources import load_table
    from cdc_export_system_spark.operators.sampling import KNUTH, knuth_col

    orders = load_table(spark, SF_DIR, "orders")
    assert scan_df(orders.select(knuth_col(F.col("o_orderkey")))) == []
    unfolded = orders.select(F.col("o_orderkey") * F.lit(KNUTH))
    assert {f["kind"] for f in scan_df(unfolded)} == {"big-literal"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unreviewed_int64_products(spark, name, monkeypatch):
    # Scan at EVERY materialization boundary (see module doc): each
    # localCheckpoint / collect / toPandas segment is linted right before
    # it materializes, then materializes for real — identity-stubbing the
    # checkpoint instead would blow up iterative self-join lineage
    # exponentially, and patching pyspark.sql.DataFrame (the abstract
    # base) does nothing at all: the concrete class is
    # pyspark.sql.classic.dataframe.DataFrame, which defines these
    # methods itself (the r8 "transparent scan" bug — it silently hid
    # every checkpointed segment, including the LTTB pick score).
    import pyspark.sql.classic.dataframe as _cdf

    segment_flags: list[dict] = []

    def _scan_now(df):
        try:
            segment_flags.extend(
                scan_plan_json(
                    df._jdf.queryExecution().optimizedPlan().toJSON()
                )
            )
        except Exception as exc:  # inference gaps must fail, not hide
            segment_flags.append({"kind": f"scan-error:{exc}"[:120]})

    orig_ckpt = _cdf.DataFrame.localCheckpoint
    orig_collect = _cdf.DataFrame.collect
    orig_topandas = _cdf.DataFrame.toPandas
    monkeypatch.setattr(
        _cdf.DataFrame,
        "localCheckpoint",
        lambda self, eager=True: (_scan_now(self), orig_ckpt(self, eager))[1],
    )
    monkeypatch.setattr(
        _cdf.DataFrame,
        "collect",
        lambda self: (_scan_now(self), orig_collect(self))[1],
    )
    monkeypatch.setattr(
        _cdf.DataFrame,
        "toPandas",
        lambda self: (_scan_now(self), orig_topandas(self))[1],
    )
    flags = scan_df(REGISTRY[name].fn(spark, SF_DIR)) + segment_flags
    kinds = {f["kind"] for f in flags}
    if name in _ALLOWED:
        expected, _reason = _ALLOWED[name]
        assert kinds, (
            f"{name} is allowlisted for {expected} but now lints clean — "
            "remove the stale entry"
        )
        assert kinds <= expected, (
            f"{name} produced unreviewed flag kinds {kinds - expected}; "
            f"flags: {flags}"
        )
    else:
        assert not kinds, (
            f"{name} has unreviewed integral products {flags}; either give "
            "them the DECIMAL(38,0)/HUGEINT treatment or allowlist with a "
            "proven bound in _ALLOWED"
        )
