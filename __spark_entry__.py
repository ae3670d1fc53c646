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
    # ROUND-4 LEAD: the reference's own core — the CDC export trio and
    # every other cdc_* query. These are the semantics the repo exists
    # to reproduce (reference app/services/exports.py:70-171) and after
    # three rounds they still have zero external driver rows.
    "cdc_full_snapshot", "cdc_incremental", "cdc_delta",
    "cdc_point_in_time", "cdc_forget_users_audit", "cdc_scd2_history",
    "cdc_merge_apply", "cdc_snapshot_diff", "cdc_incremental_agg",
    "cdc_compact_changelog",
    # fn_* suites — 24 oracle-carrying scalar-function batteries, never
    # driver-checked (cheap, zero-risk, drains the largest backlog family)
    "fn_ts_isoformat", "fn_ts_strftime_compact", "fn_str_replace",
    "fn_ts_arith", "fn_bool_ts_eq", "fn_math_suite",
    "fn_bitwise_conditional", "fn_try_suite", "fn_string_suite",
    "fn_like_regexp", "fn_hash_suite", "fn_edit_distance", "fn_url_suite",
    "fn_format_pad", "fn_base64_suite", "fn_date_extract",
    "fn_date_trunc_diff", "fn_array_suite", "fn_array_fold",
    "fn_explode_posexplode", "fn_map_suite", "fn_struct_suite",
    "fn_null_handling", "fn_nondeterministic",
    # sql_* single-statement forms — never driver-checked
    "sql_scalar_subquery", "sql_cte_join", "sql_grouping_sets",
    "sql_lateral_topk", "sql_lateral_topn", "sql_exists_correlated",
    "sql_named_window", "sql_recursive_cte",
    # source_* connectors — round-trip + pushdown + changefeed family
    "source_csv_roundtrip", "source_json_roundtrip", "source_orc_roundtrip",
    "source_schema_evolution", "source_python_changefeed",
    "source_python_changefeed_pushdown", "source_python_changefeed_stream",
    # tail risk-buffer if the driver prefix runs longer than 49: the ml/
    # stats/ts ops queued in r03 but cut off by the prefix
    "ml_linear_regression", "ml_naive_bayes", "ml_kfold_cv",
    "stats_chi2_independence", "stats_ks_test", "stats_mann_whitney",
    "ts_resample_ohlc", "ts_forecast_linear",
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
