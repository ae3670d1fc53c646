"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 registers here as a named query builder
(``fn(spark, sf_dir) -> DataFrame``) plus, when SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py``
exposes the registry to the correctness driver; ``bench.py`` times the
headline subset; tests iterate it for local parity checking.

Conventions that keep the oracle hash-stable:

* Every computed column is aliased identically in Spark and SQL.
* Double aggregations go through ``DECIMAL(18,6)`` so the sum is exact
  integer arithmetic in both engines (order-independent), then cast back
  to double — bit-identical results regardless of partitioning.
* Timestamp columns are only compared under a UTC session.
* Any top-k/limit query carries a total tie-breaking ORDER BY.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> driver does rows-only check
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "cdc_export_system_spark.operators.relational",
    "cdc_export_system_spark.operators.aggregates",
    "cdc_export_system_spark.operators.joins",
    "cdc_export_system_spark.operators.windows",
    "cdc_export_system_spark.operators.tpch",
    "cdc_export_system_spark.operators.asof",
    "cdc_export_system_spark.similarity.lsh",
    "cdc_export_system_spark.functions.scalars",
    "cdc_export_system_spark.functions.strings",
    "cdc_export_system_spark.functions.dates",
    "cdc_export_system_spark.functions.collections",
    "cdc_export_system_spark.operators.reshape",
    "cdc_export_system_spark.functions.text",
    "cdc_export_system_spark.functions.json_fns",
    "cdc_export_system_spark.functions.pandas_udfs",
    "cdc_export_system_spark.multimodal.binary_ops",
    "cdc_export_system_spark.cdc.event_queries",
    "cdc_export_system_spark.dedup.queries",
    "cdc_export_system_spark.dedup.minhash",
    "cdc_export_system_spark.dedup.simhash",
    "cdc_export_system_spark.dedup.jaccard",
    "cdc_export_system_spark.similarity.queries",
    "cdc_export_system_spark.multimodal.queries",
    "cdc_export_system_spark.streaming.queries",
    "cdc_export_system_spark.streaming.event_windows",
]


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY


# --- shared SQL/Spark helpers -------------------------------------------------

DEC = "decimal(18,6)"


def dsum(col, alias: str):
    """Exact, order-independent sum of a double column (see module doc)."""
    from pyspark.sql import functions as F

    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    # The VARCHAR hop matters: DuckDB's decimal->double cast is not
    # correctly rounded (off by ulps on ~17-digit sums), its string->double
    # (strtod) is. Spark's decimal->double is correctly rounded already.
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS {alias}"


def sql_dcast(sum_expr: str) -> str:
    """Correctly-rounded DuckDB decimal->double cast (VARCHAR hop)."""
    return f"CAST(CAST({sum_expr} AS VARCHAR) AS DOUBLE)"
