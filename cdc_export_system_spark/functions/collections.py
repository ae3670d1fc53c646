"""Array/map (collection) function surface — engine extension; the
testdata's tokens/embeddings exercise Spark's higher-order functions,
which run JVM-side (no Python) and mirror DuckDB's list lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "fn_array_suite",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS INTEGER) AS n_unique,
               array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(trim(text), '\\s+')))[1:5], ',') AS first5_sorted,
               list_contains(regexp_split_to_array(trim(text), '\\s+'), 'spark') AS has_spark,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> length(t) > 5)) AS INTEGER) AS n_long_tokens
        FROM documents
    """,
    tags=("function", "array"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/distinct/sort/slice/contains/filter over token arrays."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_sorted"
        ),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
    )


@register(
    "fn_array_fold",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                    'sum'), 9) AS comp_sum,
               round(list_aggregate(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9) AS sq_norm,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
        FROM embeddings WHERE vec_id < 100
    """,
    tags=("function", "array", "similarity"),
)
def fn_array_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate/transform folds over embedding vectors — the primitives
    the similarity ops compose (dot products, norms)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 9
        ).alias("comp_sum"),
        F.round(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            9,
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_explode_posexplode",
    oracle="""
        SELECT doc_id, u.tok, u.pos
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
                     CAST(generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) - 1
                         AS INTEGER) AS pos
              FROM documents WHERE doc_id < 20) u(doc_id, tok, pos)
    """,
    tags=("function", "array"),
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array -> (pos, element) rows, the lateral-flatten op."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select("doc_id", F.posexplode(toks).alias("pos", "tok")).select(
        "doc_id", "tok", "pos"
    )


@register(
    "fn_map_suite",
    oracle="""
        SELECT event_id,
               'e,u' AS keys_sorted,
               user_id AS u_val,
               CAST(CAST(user_id > 500 AS INT) + CAST(event_id > 500 AS INT)
                    AS INT) AS n_big,
               user_id + event_id AS sum_vals,
               user_id * 2 AS doubled_u
        FROM events
    """,
    tags=("function", "map"),
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map / map_keys / element_at / map_filter /
    transform_values / map_values + fold — all JVM higher-order
    functions. The oracle states each result positionally (DuckDB MAPs
    differ enough dialect-wise that the *values* are the contract)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("u"), F.col("user_id"), F.lit("e"), F.col("event_id")
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "u").alias("u_val"),
        F.size(F.map_filter(m, lambda k, v: v > 500)).alias("n_big"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("sum_vals"),
        F.element_at(F.transform_values(m, lambda k, v: v * 2), "u").alias("doubled_u"),
    )


@register(
    "fn_struct_suite",
    oracle="""
        SELECT event_id,
               event_id AS id_field,
               value AS v_field,
               (value < 50 OR (value = 50 AND event_id < user_id)) AS a_lt_b,
               CASE WHEN value < 50 OR (value = 50 AND event_id <= user_id)
                    THEN event_id ELSE user_id END AS min_struct_id,
               user_id AS nested_uid
        FROM events
    """,
    tags=("function", "struct"),
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: construction (named fields), field access,
    lexicographic struct comparison, array_sort over structs (min-of-pair
    via ordering), and nesting with a two-level field path. Like
    fn_map_suite, the oracle states every result positionally — struct
    VALUES are the contract; the field-wise comparison semantics are
    spelled out as the equivalent boolean expression."""
    ev = load_table(spark, sf_dir, "events")
    a = F.struct(F.col("value").alias("v"), F.col("event_id").alias("id"))
    b = F.struct(F.lit(50.0).alias("v"), F.col("user_id").alias("id"))
    nested = F.struct(a.alias("inner"), F.col("user_id").alias("uid"))
    pair_min = F.get(F.array_sort(F.array(a, b)), 0)
    return ev.select(
        "event_id",
        a["id"].alias("id_field"),
        nested["inner"]["v"].alias("v_field"),
        (a < b).alias("a_lt_b"),
        pair_min["id"].alias("min_struct_id"),
        nested["uid"].alias("nested_uid"),
    )
