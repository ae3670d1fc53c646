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
# coverage across the whole registry (297 queries as of round 3) over
# successive rounds:
# (1) this round's priority block — previously hash-FAILed queries
# (retry) plus never-driver-checked representatives of every north-star
# family (dedup / similarity / text / multimodal / analytics /
# streaming / tpch / pandas-UDF); (2) the remaining never-checked
# queries in registry order; (3) queries already driver-green in an
# earlier round, last.
_PRIORITY = [
    # round-3 lead: the two UDF reps queued twice but cut off by the
    # driver's ~50-entry prefix, plus the last-commit op from round 2
    "udaf_grouped_pandas", "udtf_lateral_chunks", "udf_map_in_pandas",
    "dedup_minhash_incremental",
    # joins family — zero driver rows before round 3
    "join_left", "join_semi", "join_anti", "join_range", "join_full_outer",
    "join_null_safe", "join_state_lookup", "join_skew_salted",
    "join_interval_overlap", "join_interval_bins", "join_bloom_prefilter",
    "join_asof", "join_asof_forward", "join_asof_nearest", "join_asof_tolerance",
    # windows family — zero driver rows before round 3
    "window_latest_per_key", "window_lag_lead", "window_running_sum",
    "window_topk_per_group", "window_range_interval", "window_first_last",
    "window_gaps_islands", "window_mom_growth", "window_moving_avg",
    "window_ewma", "window_rolling_median", "window_rolling_zscore",
    # tpch suite — only q1/q3 driver-checked so far
    "tpch_q4_like", "tpch_q5", "tpch_q6", "tpch_q7_like", "tpch_q8_like",
    "tpch_q9_like", "tpch_q10_like", "tpch_q12_like", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16_like", "tpch_q17", "tpch_q18", "tpch_q19_like",
    "tpch_q22_like",
    # round-2 additions still driver-unverified
    "dedup_incremental_batch", "corpus_decontaminate_bloom",
    "dedup_embedding_lsh", "sim_search_lsh_pruned", "agg_freq_items_mg",
    "text_compression_quality",
    # round-3 additions: queued behind the block above, so they lead the
    # round-4 prefix once the driver greens the entries ahead of them
    "ml_linear_regression", "ml_naive_bayes", "ml_kfold_cv",
    "ml_logistic_regression_gd", "ml_ridge_normal_eq",
    "stats_chi2_independence", "stats_ks_test", "stats_mann_whitney",
    "ts_resample_ohlc", "ts_autocorrelation", "ts_changepoint_cusum",
    "window_percent_rank_cume", "feat_target_encode", "graph_shortest_hops",
    "agg_countmin_sketch", "sink_parquet_partitioned",
    "corpus_token_budget_sample", "multimodal_audio_vad_segments",
    "sim_recall_at_k", "text_bigram_logprob", "dedup_minhash_accuracy",
    "ts_forecast_linear", "ml_confusion_matrix", "ml_decision_stump",
    "ml_auc_roc", "ml_eval_report", "ml_knn_classifier",
    "corpus_upsample_weights",
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
