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
    # ROUND-5 LEAD: the stream_* family — the Structured-Streaming heart
    # of the north star ("Structured Streaming for CDC"), 6 real
    # micro-batch queries that have never had an external row.
    "stream_stateful_profile", "stream_dedup_watermark", "stream_cdc_scd2",
    "stream_session_window", "stream_static_enrich", "stream_export_csv",
    # text_* — the largest zero-external-row north-star family (20)
    "text_lang_id", "text_ngram_freq", "text_tfidf", "text_chunk_dedup",
    "text_hash_embedding", "text_unigram_logprob", "text_repetition_score",
    "text_pmi_collocations", "text_bigram_logprob", "text_readability",
    "text_novelty_score", "text_langid_confusion", "text_bpe_pair_counts",
    "text_oov_rate", "text_char_ngram_lang_profile", "text_vocab_coverage",
    "text_clean_normalize", "text_pii_scrub", "text_term_freq",
    "text_compression_quality",
    # sim_* / cluster_* — the ANN + clustering stack (11), incl. the
    # billion-scale IVF-PQ composite (rows-only, recall-pinned)
    "sim_pairwise_by_label", "sim_range_search", "sim_mmr_rerank",
    "sim_search_lsh_pruned", "sim_recall_at_k", "sim_search_ivf",
    "sim_search_pq", "sim_search_pq_sampled", "sim_search_ivf_pq",
    "cluster_kmeans_assign", "cluster_kmeans_iterate",
    # graph_* (6)
    "graph_triangle_count", "graph_degree_topk", "graph_pagerank",
    "graph_shortest_hops", "graph_common_neighbors", "graph_pagerank_exact",
    # ts_* (8)
    "ts_gapfill_interpolate", "ts_time_weighted_avg", "ts_seasonal_decompose",
    "ts_resample_ohlc", "ts_autocorrelation", "ts_changepoint_cusum",
    "ts_forecast_linear", "ts_dow_hour_profile",
    # stats_* (8) — incl. the round-5 zero-replicate guard fix
    "stats_chi2_independence", "stats_ks_test", "stats_mann_whitney",
    "stats_anova_oneway", "stats_benjamini_hochberg", "stats_effect_sizes",
    "stats_power_analysis", "stats_bootstrap_ci",
    # tail risk-buffer if the driver prefix runs past 59: ml_* +
    # metric/analytics representatives
    "ml_naive_bayes", "ml_kfold_cv", "ml_confusion_matrix", "ml_auc_roc",
    "metric_dau_mau", "metric_rolling_wau", "funnel_conversion",
    "sessionize_batch",
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
