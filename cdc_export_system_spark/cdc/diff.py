"""Snapshot-diff CDC: derive a changelog by comparing two key snapshots.

The reference *emits* changelogs from a mutation-tracked table (soft
delete + updated_at bump, reference: app/services/exports.py:138-171).
The inverse problem — you only have two full snapshots and must derive
the INSERT/UPDATE/DELETE stream between them — is the other standard CDC
acquisition mode (what AWS DMS / Debezium snapshot mode / Delta MERGE
sources do when the upstream has no change tracking).

``cdc_snapshot_diff`` implements it as ONE full-outer join on the
primary key:

* key only in the new snapshot  -> INSERT
* key only in the old snapshot  -> DELETE
* key in both, value changed    -> UPDATE
* key in both, value unchanged  -> dropped (no change event)

Scale: the diff is a single co-partitioned shuffle on the key — at 100 TB
both snapshots land bucketed by key (io/bucketed.py) and the full-outer
join runs exchange-free; unchanged rows (the overwhelming majority in a
daily diff) are filtered *before* anything is written downstream.

The two snapshots here are deterministic slices of ``orders`` (modulus
predicates), so the op is oracle-checkable on the shared testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

# Membership + mutation rules for the two synthetic snapshots.
_OLD_PRED = "o_orderkey % 5 <> 0"
_NEW_PRED = "o_orderkey % 7 <> 0"
_MUTATE_PRED = "o_orderkey % 3 = 0"  # these keys changed value between snapshots


@register(
    "cdc_snapshot_diff",
    oracle=f"""
        WITH snap_old AS (
            SELECT o_orderkey, o_totalprice AS total
            FROM orders WHERE {_OLD_PRED}),
        snap_new AS (
            SELECT o_orderkey,
                   CASE WHEN {_MUTATE_PRED} THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS total
            FROM orders WHERE {_NEW_PRED})
        SELECT CASE WHEN a.o_orderkey IS NULL THEN 'INSERT'
                    WHEN b.o_orderkey IS NULL THEN 'DELETE'
                    ELSE 'UPDATE' END AS operation,
               COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               a.total AS old_total,
               b.total AS new_total
        FROM snap_old a FULL OUTER JOIN snap_new b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.total <> b.total
    """,
    tags=("cdc", "join"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two snapshots via one full-outer join on the key.

    Value equality is exact (same doubles on both sides — the mutated
    value is a single IEEE multiply, bit-identical in any engine), so
    "unchanged" rows drop deterministically.
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.expr(_OLD_PRED)).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("old_total")
    )
    new = orders.filter(F.expr(_NEW_PRED)).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(F.expr(_MUTATE_PRED), F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("new_total"),
    )
    joined = old.join(new, F.col("k_old") == F.col("k_new"), "full_outer")
    return joined.filter(
        F.col("k_old").isNull()
        | F.col("k_new").isNull()
        | (F.col("old_total") != F.col("new_total"))
    ).select(
        F.when(F.col("k_old").isNull(), F.lit("INSERT"))
        .when(F.col("k_new").isNull(), F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("operation"),
        F.coalesce(F.col("k_old"), F.col("k_new")).alias("o_orderkey"),
        "old_total",
        "new_total",
    )
