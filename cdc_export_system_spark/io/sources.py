"""Parquet sources for the driver star schema (+ generic table loading).

Reading is plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning (the Spark analogue of the
reference's reliance on the Postgres planner + its ``updated_at`` index,
reference: ``seeds/001_schema.sql:11``).

The one special case: ``events.parquet`` stores ``ts`` as parquet INT64
TIMESTAMP(NANOS), which Spark cannot map to TimestampType. With
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long; the
testdata carries no sub-microsecond bits, so the conversion
``timestamp_micros(ns / 1000)`` is lossless and matches what DuckDB sees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.schemas import STAR_TABLES
from cdc_export_system_spark.session import ensure_engine_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table; normalizes events.ts to TimestampType."""
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed double's exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the star schema as temp views for the SQL surface."""
    for name in tables or STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
