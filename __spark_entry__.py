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
    # ROUND-7 LEAD (VERDICT r06 item 3): json_extract_props — the last
    # §2 operator with no external driver row after six rounds — plus
    # its json siblings.
    "json_extract_props", "json_group_agg", "json_variant_extract",
    # round-7 additions (fresh oracles deserve a first external row)
    "multimodal_decode_dims", "recsys_covisitation", "ts_ewma_crossover",
    "corpus_perplexity_buckets", "orders_rfm_segmentation", "ab_sequential_sprt",
    "attribution_markov_removal", "event_alert_debounce",
    "ts_holt_winters_exact", "orders_cohort_ltv", "event_burst_flags",
    # the round-6 exact-sibling family: their unrolled-CTE / Cramer /
    # repeated-squaring oracles are the riskiest SQL in the repo and
    # deserve external confirmation (13)
    "sim_search_ivf_exact", "sim_search_pq_exact", "sim_search_ivf_pq_exact",
    "cluster_kmeans_exact", "sim_mmr_rerank_exact", "feat_pca_power_exact",
    "ml_ridge_exact", "ml_logistic_exact", "ts_downsample_lttb_exact",
    "ts_holt_exact", "event_markov_stationary_exact", "graph_ppr_exact",
    "dedup_semantic_exact",
    # windows tail (5)
    "window_percent_rank_cume", "window_decay_score", "window_global_deciles",
    "window_drawdown", "window_running_distinct",
    # metric / event / funnel / retention / sessionize / attribution (16)
    "metric_dau_mau", "metric_rolling_wau", "metric_new_vs_returning",
    "metric_mix_shift", "metric_concentration_shares",
    "metric_event_type_overlap", "event_path_topk", "event_dwell_time",
    "event_growth_accounting", "event_next_transitions", "funnel_conversion",
    "funnel_time_window", "retention_nday", "sessionize_batch",
    "attribution_last_touch", "attribution_position_based",
    # ml_* (8)
    "ml_kfold_cv", "ml_naive_bayes", "ml_confusion_matrix", "ml_auc_roc",
    "ml_pr_curve", "ml_gbm_stumps", "ml_calibration_table",
    "ml_decision_stump",
    # stats_* / ab_* (11)
    "stats_chi2_independence", "stats_ks_test", "stats_mann_whitney",
    "stats_anova_oneway", "stats_benjamini_hochberg", "stats_effect_sizes",
    "stats_bootstrap_ci", "ab_cuped", "ab_proportion_ztest",
    "stats_spearman_rank", "stats_wilson_ci",
    # tail risk-buffer if the driver prefix runs past 55: headline
    # never-checked representatives
    "agg_quantiles_distributed", "dedup_exact_substring",
    "text_winnowing_fingerprint", "dedup_winnowing_overlap",
    "corpus_gopher_filter", "dq_checks", "ts_theil_sen", "tpch_q21_like",
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
