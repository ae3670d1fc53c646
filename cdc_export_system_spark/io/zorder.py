"""Z-order (Morton) multi-dimensional clustering layout.

The reference's one physical-layout decision is the btree on
``users(updated_at)`` (reference: seeds/001_schema.sql:11) — a 1-D
clustering that serves exactly one predicate column. At warehouse scale
the analogous decision is *file* clustering: parquet keeps min/max stats
per file/row-group, so sorting the data before writing decides which
predicates can skip IO. A plain sort serves one column; interleaving the
bits of two (or more) key columns — the Z-order curve used by Delta
Lake's OPTIMIZE ZORDER and ClickHouse's mortonEncode — gives *both*
columns locality, so selective filters on either (or both) prune files.

Two pieces:

* ``zorder_value`` / ``sort_zorder`` — the Morton encoding as a pure
  JVM-side expression (bit-test + add; no UDF), oracle-checkable since
  the arithmetic form is engine-portable SQL.
* ``zorder_write`` — repartitionByRange on the z-value + sort within
  partitions + parquet write: every output file owns a disjoint z-range
  (pinned by tests/test_zorder.py), hence disjoint rectangles in key
  space, hence file-level pruning for either key column.

Scale: repartitionByRange samples the z-distribution and gives each of N
writers a contiguous z-slice — one shuffle, fully parallel, no global
sort bottleneck. 8 bits/dimension = 65,536 grid cells is plenty for
file-level pruning (files >> cells at 100 TB remains false: cells >>
files is what pruning needs, and 64Ki cells over ~1e5 files holds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import star_view
from cdc_export_system_spark.registry import register

BITS = 8  # per dimension: 16-bit z-values, 256x256 grid


def zorder_expr(xe: str, ye: str, bits: int = BITS) -> str:
    """Engine-portable SQL text interleaving the low ``bits`` bits of two
    non-negative integer expressions (x -> even bit positions, y -> odd).
    Bit-test + constant add only — the same text parses in Spark and
    DuckDB and stays inside whole-stage codegen."""
    terms = []
    for k in range(bits):
        terms.append(f"(CASE WHEN ({xe} & {1 << k}) <> 0 THEN {1 << (2 * k)} ELSE 0 END)")
        terms.append(f"(CASE WHEN ({ye} & {1 << k}) <> 0 THEN {1 << (2 * k + 1)} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_Z = zorder_expr("(p_partkey % 256)", "(p_size % 256)")
_SQL = f"""
    SELECT p_partkey, p_size, CAST({_Z} AS BIGINT) AS zvalue
    FROM part
    ORDER BY zvalue, p_partkey
    LIMIT 200
"""


@register(
    "sort_zorder",
    oracle=_SQL,
    tags=("layout", "sort"),
)
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (p_partkey, p_size) — the clustering key a
    z-ordered write of ``part`` would range-partition on. Identical SQL
    text runs as the oracle."""
    part = star_view(spark, sf_dir, "part")
    return spark.sql(_SQL.replace("FROM part", f"FROM {part}"))


def zorder_write(
    df: DataFrame, x_col: str, y_col: str, path: str, n_files: int = 8, bits: int = BITS
) -> None:
    """Write ``df`` z-order-clustered on (x_col, y_col): each output file
    covers a disjoint z-range (disjoint key-space rectangle), so parquet
    footer min/max stats prune files for predicates on either column."""
    z = F.expr(zorder_expr(f"(CAST({x_col} AS BIGINT) % {1 << bits})",
                           f"(CAST({y_col} AS BIGINT) % {1 << bits})"))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
