"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, from the
engine's query registry (cdc_export_system_spark.registry).
``oracle_sql()`` — matching DuckDB SQL for the hash comparison; ops whose
semantics are not SQL-expressible are omitted (rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_export_system_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cdc_export_system_spark.operators.tpch import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


# The external correctness driver verifies a ~50-entry prefix of
# ``queries()`` per round, so the dict is ordered to rotate hard driver
# coverage across the whole registry (the exact count is
# ``len(load_all())``; tests/test_entry_contract.py pins the rotation
# invariants) over successive rounds:
# (1) this round's priority block — previously hash-FAILed queries
# (retry) plus never-driver-checked representatives of every north-star
# family (dedup / similarity / text / multimodal / analytics /
# streaming / tpch / pandas-UDF); (2) the remaining never-checked
# queries in registry order; (3) queries already driver-green in an
# earlier round, last.
_PRIORITY = [
    # new this round (fresh oracle deserves a first external row)
    "multimodal_wav_stats",
    # ROUND-8 LEAD (VERDICT r07 item 1): the never-externally-checked
    # BENCH HEADLINERS — a headliner with no external correctness row
    # is the worst evidence gap left.
    "agg_quantiles_distributed", "agg_freq_items_mg", "metric_rolling_wau_hll",
    "dedup_exact_substring", "text_winnowing_fingerprint",
    # their close siblings in the same never-checked families
    "dedup_winnowing_overlap", "dedup_substring_scrub",
    "dedup_edit_distance_verify", "corpus_gopher_filter",
    # the dq_* suite (verdict-named, 8)
    "dq_checks", "dq_benford_digits", "dq_fk_orphans", "dq_null_profile",
    "dq_reconciliation", "dq_outlier_iqr", "dq_key_skew_report",
    "corpus_drift_psi",
    # the graph tail (verdict-named, 5)
    "graph_k_core", "graph_label_propagation", "graph_adamic_adar",
    "graph_clustering_coefficient", "graph_assortativity",
    # stats_* / ab_* tail (19)
    "stats_chi2_independence", "stats_ks_test", "stats_mann_whitney",
    "stats_anova_oneway", "stats_benjamini_hochberg", "stats_effect_sizes",
    "stats_bootstrap_ci", "ab_cuped", "ab_proportion_ztest",
    "stats_spearman_rank", "stats_wilson_ci", "stats_power_analysis",
    "stats_brown_forsythe", "stats_mcnemar", "stats_wilcoxon_signed_rank",
    "stats_qq_points", "stats_runs_test", "stats_cohens_kappa",
    "ab_ratio_delta_method",
    # ml_* tail (17)
    "ml_confusion_matrix", "ml_auc_roc", "ml_pr_curve", "ml_gbm_stumps",
    "ml_calibration_table", "ml_decision_stump", "ml_eval_report",
    "ml_logistic_regression_gd", "ml_ridge_normal_eq", "ml_uplift_qini",
    "ml_feature_corr_matrix", "ml_feature_drift_psi", "ml_threshold_youden",
    "ml_brier_decomposition", "ml_att_stratified", "ml_knn_classifier",
    "ml_map_at_k",
    # tail risk-buffer if the driver prefix runs past ~58: remaining
    # never-checked headliner-adjacent ops
    "ts_theil_sen", "tpch_q21_like", "join_interval_bucketed",
    "sessionize_session_window", "agg_weighted_median", "agg_trimmed_mean",
]


def _round_order(registry) -> list[str]:
    import glob
    import json

    # every query already driver-GREEN in ANY earlier round goes last, so
    # the ~50-entry verified prefix always lands on fresh (or previously
    # failed, i.e. since-fixed) queries
    checked: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                for name, row in json.load(f).items():
                    green = row.get("hash_match") is True or (
                        row.get("err") == "no_oracle" and row.get("spark_rows") is not None
                    )
                    if green:
                        checked.add(name)
        except (OSError, ValueError, AttributeError):
            pass
    prio = [n for n in _PRIORITY if n in registry and n not in checked]
    prio_set = set(prio)
    rest = [n for n in registry if n not in prio_set and n not in checked]
    tail = [n for n in registry if n in checked]
    return prio + rest + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()
    return {name: registry[name].fn for name in _round_order(registry)}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _round_order(registry)
        if registry[name].oracle is not None
    }
