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
    # ROUND-9 LEAD (VERDICT r8 #1): the r8 hash-FAIL, now re-emitted
    # with a driver-stable hi/lo BIGINT final schema — retry first.
    "ml_calibration_table",
    # The last never-checked bench headliner (VERDICT r8 #2).
    "skyline_pareto_front",
    # TPC-H tails — the reconstructed-partsupp family's first external row
    "tpch_q2_like", "tpch_q11_like", "tpch_q20_like", "tpch_q21_like",
    # NEW in r9 (each locally parity-green; external row on landing):
    # the transaction-log table format, the JPEG codec query, and the
    # state-API-v1 ledger stream
    "txn_table_merge_read", "txn_table_time_travel", "txn_table_merge_stats",
    "stream_cdc_logtable_merge", "multimodal_jpeg_stats",
    "stream_ledger_state_v1",
    # NEW in r9 (late-round): entity resolution / record linkage and
    # incremental materialized-view maintenance (each locally
    # parity-green at sf0.001 + sf0.01; external row on landing)
    "er_blocking_stats", "er_candidate_pairs", "er_match_metrics",
    "er_one_to_one", "er_entity_clusters", "er_golden_record",
    "mv_incremental_agg", "mv_delta_join", "mv_topk_monotone",
    "mv_refcount_distinct", "stream_mv_maintenance",
    "geo_cell_index", "geo_near_join", "geo_knn", "geo_bbox_by_nation",
    "privacy_k_anonymity", "privacy_l_diversity", "privacy_uniqueness_risk",
    # reshape family (verdict-named)
    "reshape_pivot", "reshape_unpivot", "reshape_date_spine",
    "reshape_pivot_dynamic",
    # sampling family (verdict-named)
    "sample_hash", "sample_stratified_hash", "sample_split_train_test",
    "sample_uniform_per_group",
    # corpus-pipeline tail (12)
    "corpus_mix_weighted", "corpus_token_budget_sample",
    "corpus_upsample_weights", "corpus_shard_assignment",
    "corpus_importance_resample", "corpus_interleave_order",
    "corpus_temperature_weights", "corpus_decontaminate_report",
    "corpus_quality_report", "corpus_inverted_index",
    "corpus_js_divergence", "corpus_bpe_encode",
    # ml_* tail (9)
    "ml_uplift_qini", "ml_feature_corr_matrix", "ml_feature_drift_psi",
    "ml_threshold_youden", "ml_brier_decomposition", "ml_att_stratified",
    "ml_ridge_normal_eq", "ml_knn_classifier", "ml_map_at_k",
    # ts_* family (10)
    "ts_theil_sen", "ts_mann_kendall", "ts_dow_hour_profile",
    "ts_acf_multi_lag", "ts_percentile_bands", "ts_control_chart_xmr",
    "ts_burstiness", "ts_peaks", "ts_best_window", "ts_downsample_lttb",
    # anomaly family (5)
    "anomaly_zscore", "anomaly_mad", "anomaly_rate_spike",
    "anomaly_seasonal_residual", "anomaly_seasonal_esd",
    # sessionization (3)
    "sessionize_session_window", "sessionize_dynamic_gap",
    "sessionize_funnel_within",
    # tail risk-buffer if the driver prefix runs past ~50
    "agg_weighted_median", "agg_trimmed_mean", "join_interval_bucketed",
    "dedup_minhash_accuracy", "sim_rrf_fusion", "text_bm25_topk",
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
