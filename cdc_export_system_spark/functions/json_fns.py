"""JSON extraction over the events.props column (SURVEY.md §2.10
``json_extract_props``).

The reference has no JSON surface; this is the engine extension for the
testdata's semi-structured column. ``from_json`` with a declared schema is
the scalable form — it parses once into a struct the optimizer can prune,
unlike repeated ``get_json_object`` calls which re-parse per field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    tags=("json", "function"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props JSON with a declared schema and project a typed field."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k"),
    )


@register(
    "json_group_agg",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def json_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an extracted JSON field (integer sum — exact)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k")
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "json_variant_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CAST(NULL AS INT) AS missing_field
        FROM events WHERE event_id < 500
    """,
    tags=("json", "variant"),
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse once
    into the binary variant encoding, then typed path extraction —
    the open-format answer to schema-on-read JSON at scale (single parse,
    columnar-shredded access, no per-query string re-parse). try_variant_get
    returns NULL for absent paths instead of failing mid-job."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_field"),
    )
