"""Partitioned parquet sink — the warehouse-scale output path.

The reference's only sink is a single CSV file (reference
``app/services/exports.py:85-170``); at 100 TB the engine needs the lake
layout instead: parquet partitioned by a low-cardinality derived key so
(a) writers fan out per partition, (b) readers prune whole directories
before any IO (``PartitionFilters`` in the scan, distinct from row-group
``PushedFilters``), (c) downstream jobs can process partitions
independently.

Design rules encoded here:

* Partition column must be LOW cardinality (date/month bucket, region),
  never a high-cardinality key — one directory per value.
* ``maxRecordsPerFile`` bounds file size; without it one skewed
  partition value writes one giant file.
* The writer repartitions by the partition column first, so each task
  writes one directory (no small-files explosion from every task
  touching every partition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write df as parquet partitioned by partition_cols.

    Repartitioning on the partition columns co-locates each output
    directory's rows in one task: without it, every task holds open a
    writer per partition value (memory) and emits a file per (task,
    value) pair (small-files problem at cluster scale).
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_events_by_month(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Materialize events partitioned by event month (low cardinality:
    one directory per month)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_month", F.date_format("ts", "yyyy-MM")
    )
    path = os.path.join(out_dir, "events_by_month")
    write_partitioned(ev, path, ["event_month"])
    return path


def read_pruned_month(spark: SparkSession, path: str, month: str) -> DataFrame:
    """Read one month back; the equality filter on the partition column
    becomes a directory-level PartitionFilter — non-matching months are
    never opened."""
    return spark.read.parquet(path).filter(F.col("event_month") == month)


def overwrite_partitions_dynamic(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Replace ONLY the partition directories present in ``df``, leaving
    every sibling partition untouched — the incremental lake-refresh
    write (re-land one day/month after a correction) that a plain
    ``mode("overwrite")`` cannot express: static overwrite mode truncates
    the WHOLE table root first.

    ``partitionOverwriteMode=dynamic`` is runtime-settable but session-
    scoped, so it is set for the duration of this write and restored
    after — callers' static-overwrite semantics elsewhere are unaffected.
    reference app/services/exports.py:87 rewrites the single CSV per
    export; this is that operation's shape at lake scale."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)
