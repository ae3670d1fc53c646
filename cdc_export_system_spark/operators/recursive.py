"""Recursive CTE surface (Spark 4 ``WITH RECURSIVE``).

The reference has no hierarchies, but a complete SQL query surface needs
iterative-closure queries (org charts, BOM explosions, graph reachability
— the workloads the reference would delegate to Postgres's own
``WITH RECURSIVE``). Spark 4 executes these as an iterative union-loop
over the recursion, each step a normal Catalyst-planned join.

The hierarchy here is synthesized deterministically from ``nation``: each
nation's parent is the next-lower nationkey in its region (region head =
root), so the recursion walks per-region chains and the oracle agrees
structurally.

Scale: each recursion step is one broadcast-able join of the frontier
against the parent map; depth is bounded by the longest chain (here
|nations-per-region|). For unbounded-depth graphs at 100 TB prefer the
pointer-jumping form (dedup/cluster.py's connected components) — O(log n)
rounds instead of O(depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_export_system_spark.io.sources import star_view
from cdc_export_system_spark.registry import register

_ORACLE = """
    WITH RECURSIVE parent AS (
        SELECT n_nationkey, n_regionkey,
               lag(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey)
                   AS parent_key
        FROM nation
    ),
    walk AS (
        SELECT n_nationkey, n_regionkey, n_nationkey AS root_key, CAST(0 AS INT) AS depth
        FROM parent WHERE parent_key IS NULL
        UNION ALL
        SELECT p.n_nationkey, p.n_regionkey, w.root_key, CAST(w.depth + 1 AS INT) AS depth
        FROM parent p JOIN walk w ON p.parent_key = w.n_nationkey
    )
    SELECT n_nationkey, n_regionkey, root_key, depth FROM walk
"""


@register(
    "sql_recursive_cte",
    oracle=_ORACLE,
    tags=("sql", "recursive"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive hierarchy walk: root + depth for every node of the
    per-region parent chains, via Spark 4's ``WITH RECURSIVE``. The SQL
    text is engine-portable — the oracle runs the identical statement."""
    nation = star_view(spark, sf_dir, "nation")
    return spark.sql(_ORACLE.replace("FROM nation", f"FROM {nation}"))
