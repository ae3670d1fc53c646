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
# coverage across the whole 237-query registry over successive rounds:
# (1) this round's priority block — previously hash-FAILed queries
# (retry) plus never-driver-checked representatives of every north-star
# family (dedup / similarity / text / multimodal / analytics /
# streaming / tpch / pandas-UDF); (2) the remaining never-checked
# queries in registry order; (3) queries already driver-green in an
# earlier round, last.
_PRIORITY = [
    # retries: hash-FAILed in round 1, root-caused (HUGEINT / DATE-type
    # oracle divergence) and fixed
    "sql_group_by_all", "profile_table",
    # dedup family
    "dedup_exact", "dedup_upsert_key", "dedup_latest_per_key", "dedup_keep_best",
    "corpus_decontaminate", "dedup_minhash_signature", "dedup_minhash_lsh",
    "dedup_minhash_verified", "dedup_cluster_cc", "dedup_simhash",
    "dedup_simhash_banded_pairs", "dedup_ngram_jaccard", "dedup_containment",
    "dedup_embedding_cosine",
    # similarity family
    "sim_search_topk", "sim_search_lsh", "sim_lsh_buckets", "sim_knn_join",
    "sim_centroid_per_label", "sim_random_projection",
    # text / LLM-pipeline family
    "text_token_count", "text_quality_score", "text_stats", "text_fingerprint",
    "text_pack_chunks", "pipeline_pretraining_corpus",
    # multimodal family
    "multimodal_binary_meta", "multimodal_phash_near_dup", "multimodal_resize",
    "multimodal_frame_sample", "multimodal_extract_features",
    # analytics / windows rewritten or dtype-fixed this round
    "rfm_segmentation", "window_pareto_share", "agg_gini", "window_share_of_total",
    "window_ntile_dist", "window_rank", "sessionize_metrics", "cohort_ltv_curve",
    "attribution_time_to_convert", "cohort_retention", "cdc_changelog_stats",
    # streaming family
    "stream_tumbling_window", "stream_sliding_window", "stream_join_attribution",
    # tpch + pandas-UDF representatives
    "tpch_q1", "tpch_q3",
    "udf_scalar_pandas", "udaf_grouped_pandas", "udtf_lateral_chunks",
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
