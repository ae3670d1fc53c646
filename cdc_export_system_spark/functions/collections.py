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
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_unique,
               array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(trim(text), '\\s+')))[1:5], ',') AS first5_sorted,
               list_contains(regexp_split_to_array(trim(text), '\\s+'), 'spark') AS has_spark,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> length(t) > 5)) AS n_long_tokens
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
               len(embedding) AS dim,
               round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                    'sum'), 9) AS comp_sum,
               round(list_aggregate(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9) AS sq_norm,
               len(list_filter(embedding, x -> x > 0)) AS n_positive
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
                     generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) - 1
                         AS pos
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
