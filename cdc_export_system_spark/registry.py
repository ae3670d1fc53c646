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
    "cdc_export_system_spark.operators.tpch_extended",
    "cdc_export_system_spark.operators.asof",
    "cdc_export_system_spark.operators.analytics",
    "cdc_export_system_spark.similarity.lsh",
    "cdc_export_system_spark.functions.scalars",
    "cdc_export_system_spark.functions.strings",
    "cdc_export_system_spark.functions.dates",
    "cdc_export_system_spark.functions.collections",
    "cdc_export_system_spark.operators.reshape",
    "cdc_export_system_spark.functions.text",
    "cdc_export_system_spark.functions.cleaning",
    "cdc_export_system_spark.functions.json_fns",
    "cdc_export_system_spark.functions.pandas_udfs",
    "cdc_export_system_spark.multimodal.binary_ops",
    "cdc_export_system_spark.cdc.event_queries",
    "cdc_export_system_spark.cdc.scd",
    "cdc_export_system_spark.dedup.queries",
    "cdc_export_system_spark.dedup.minhash",
    "cdc_export_system_spark.dedup.cluster",
    "cdc_export_system_spark.operators.sampling",
    "cdc_export_system_spark.operators.graph",
    "cdc_export_system_spark.functions.packing",
    "cdc_export_system_spark.dedup.simhash",
    "cdc_export_system_spark.dedup.substring",
    "cdc_export_system_spark.dedup.jaccard",
    "cdc_export_system_spark.dedup.semantic",
    "cdc_export_system_spark.similarity.queries",
    "cdc_export_system_spark.similarity.ivf",
    "cdc_export_system_spark.similarity.pq",
    "cdc_export_system_spark.multimodal.queries",
    "cdc_export_system_spark.io.format_roundtrip",
    "cdc_export_system_spark.io.bucketed",
    "cdc_export_system_spark.io.python_source",
    "cdc_export_system_spark.streaming.queries",
    "cdc_export_system_spark.streaming.scd_stream",
    "cdc_export_system_spark.streaming.event_windows",
    "cdc_export_system_spark.streaming.joins",
    "cdc_export_system_spark.streaming.tws",
    "cdc_export_system_spark.streaming.export_stream",
    "cdc_export_system_spark.cdc.diff",
    "cdc_export_system_spark.operators.recursive",
    "cdc_export_system_spark.operators.timeseries",
    "cdc_export_system_spark.operators.quality",
    "cdc_export_system_spark.io.zorder",
    "cdc_export_system_spark.similarity.kmeans",
    "cdc_export_system_spark.similarity.pca",
    "cdc_export_system_spark.operators.bloom_join",
    "cdc_export_system_spark.ml.supervised",
    "cdc_export_system_spark.operators.sketches",
    "cdc_export_system_spark.io.partitioned",
    "cdc_export_system_spark.operators.stats_tests",
    "cdc_export_system_spark.ml.boosting",
    "cdc_export_system_spark.io.txn_queries",
    "cdc_export_system_spark.operators.entity_resolution",
    "cdc_export_system_spark.operators.matview",
    "cdc_export_system_spark.streaming.mv_stream",
    "cdc_export_system_spark.operators.geo",
    "cdc_export_system_spark.operators.privacy",
    "cdc_export_system_spark.operators.er_em",
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


def _cents(col):
    """Exact scaled integer of a 2dp monetary double: floor(x*100 + 0.5).

    Pure double arithmetic + long result, so it stays inside whole-stage
    codegen; F.round() on a double routes through BigDecimal per row.
    Half-up-for-positives is unambiguous here: the inputs are monetary
    values with exactly 2 decimal digits (representation error ~1e-9 of a
    cent, never at a tie).
    """
    from pyspark.sql import functions as F

    return F.floor(col * F.lit(100) + F.lit(0.5))


def dsum(col, alias: str):
    """Exact, order-independent sum of a 2dp monetary double column.

    Sums exact cents as BIGINT (map-side combinable, codegen-resident)
    and widens to decimal only on the post-aggregation row — value-
    identical to the oracle's SUM(CAST(x AS DECIMAL(18,6))) because the
    inputs carry exactly 2 decimal digits. The all-decimal form this
    replaces was ~5x slower: a sum above precision 18 leaves Spark's
    long-backed Decimal for the BigDecimal slow path on every row.
    """
    from pyspark.sql import functions as F

    return (F.sum(_cents(col)).cast("decimal(38,6)") / F.lit(100)).cast("double").alias(alias)


def dmulsum(alias: str, *factors):
    """Exact sum(product of 2dp factors) — the TPC-H revenue shape
    sum(price * (1-disc) [* (1+tax)]). The product of k exact
    cent-values stays a BIGINT per row (row-bounded: ~1e11 for two
    factors, ~1e13 for three — whole-stage codegen keeps the hot
    multiply on longs). A bare SUM(long) of ~1e13-scale row products
    crosses 2^63 near a ~9e5-row group (sf-sub-1 on a single group)
    and ANSI mode kills the query (round-8 int-product lint), but the
    round-8 DECIMAL(38,0) accumulator cost ~40% on q1's agg stage
    (measured sf0.1 min-of-5: 0.487 s -> 0.293 s with this form).

    So: a radix-2^22 hi/lo BIGINT PAIR accumulator, merged in DECIMAL
    only on the post-aggregation row (<= |groups| rows):
        sum(p) == 2^22 * sum(p >> 22) + sum(p & (2^22-1))   (exact)
    Bounds (ANSI throws loudly beyond them): p <= ~1e13 (3 factors),
    so p>>22 <= 2.4e6 and p&mask < 4.2e6 — both BIGINT sums survive to
    ~2.2e12 rows PER GROUP (~sf 300,000 on q1's six groups; a 100 TB
    lineitem is ~sf 100,000 total). Both sums are plain long adds
    inside whole-stage codegen; the DuckDB oracle accumulates in
    DECIMAL/HUGEINT and stays value-identical."""
    from pyspark.sql import functions as F

    prod = _cents(factors[0])
    for f in factors[1:]:
        prod = prod * _cents(f)
    radix = 1 << 22
    hi = F.sum(F.shiftright(prod, 22)).cast("decimal(38,0)")
    lo = F.sum(prod.bitwiseAND(F.lit(radix - 1))).cast("decimal(38,0)")
    return (
        ((hi * F.lit(radix) + lo).cast("decimal(38,6)") / F.lit(100 ** len(factors)))
        .cast("double")
        .alias(alias)
    )


def spark_dsum(expr: str, alias: str) -> str:
    """Spark-SQL text form of dsum() — identical expression tree, so the
    single-statement SQL queries below produce the same plan (and hash)
    as the Column-builder form."""
    return (
        f"CAST(CAST(SUM(FLOOR({expr} * 100 + 0.5)) AS DECIMAL(38,6)) / 100 AS DOUBLE)"
        f" AS {alias}"
    )


def spark_dmulsum(alias: str, *exprs: str) -> str:
    """Spark-SQL text form of dmulsum() (same radix-2^22 hi/lo BIGINT
    pair accumulator with the DECIMAL merge on the final row — see
    dmulsum for the bound math)."""
    prod = " * ".join(f"FLOOR({e} * 100 + 0.5)" for e in exprs)
    return (
        f"CAST(CAST(CAST(SUM(({prod}) >> 22) AS DECIMAL(38,0)) * 4194304"
        f" + CAST(SUM(({prod}) & 4194303) AS DECIMAL(38,0))"
        f" AS DECIMAL(38,6)) / {100 ** len(exprs)} AS DOUBLE)"
        f" AS {alias}"
    )


def sql_dsum(expr: str, alias: str) -> str:
    # The VARCHAR hop matters: DuckDB's decimal->double cast is not
    # correctly rounded (off by ulps on ~17-digit sums), its string->double
    # (strtod) is. Spark's decimal->double is correctly rounded already.
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS {alias}"


def sql_dcast(sum_expr: str) -> str:
    """Correctly-rounded DuckDB decimal->double cast (VARCHAR hop)."""
    return f"CAST(CAST({sum_expr} AS VARCHAR) AS DOUBLE)"
