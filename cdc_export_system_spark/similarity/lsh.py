"""Random-hyperplane LSH for cosine similarity search — the scale path.

Brute force compares the query against every vector (fine per-query, but
quadratic for all-pairs / batch workloads). Sign-LSH assigns each vector
a B-bit bucket (sign of the dot product with B fixed random hyperplanes);
cosine-close vectors collide with high probability, so search only probes
the query's bucket plus its Hamming-1 neighbors (multi-probe).

One pass over the data computes bucket ids (scan + B dot products, no
shuffle); the probe is then a bucket equi-join — at 100 TB the bucketed
table would be written bucketBy(bucket) so probes touch only matching
files. Recall/latency trades via B and the probe radius.

Hyperplanes are frozen literals from a seeded LCG, so the DuckDB oracle
(generated SQL, same left-to-right double folds) is value-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register
from cdc_export_system_spark.schemas import EMBEDDING_DIM
from cdc_export_system_spark.similarity.queries import SIM_DECIMALS, TOP_K, cosine

N_PLANES = 8


def _lcg_planes(n: int, dim: int, seed: int = 0x91A5EED) -> list[list[float]]:
    """n deterministic pseudo-random unit-ish hyperplanes (LCG uniforms)."""
    x = seed
    planes = []
    for _ in range(n):
        row = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            row.append(round(x / float(1 << 31) - 0.5, 9))
        planes.append(row)
    return planes


PLANES = _lcg_planes(N_PLANES, EMBEDDING_DIM)


def _plane_dot(vec: Column, plane: list[float]) -> Column:
    lit = F.array(*[F.lit(v) for v in plane])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bucket_id(vec: Column) -> Column:
    """B-bit sign bucket of an embedding column."""
    out = F.lit(0)
    for i, plane in enumerate(PLANES):
        out = out + F.when(_plane_dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("int")


def _sql_plane_dot(vec_expr: str, plane: list[float]) -> str:
    lit = "[" + ", ".join(f"{v!r}" for v in plane) + "]"
    return (
        f"list_aggregate(list_transform(list_zip({vec_expr}, {lit}),"
        " p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum')"
    )


def _sql_bucket(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN {_sql_plane_dot(vec_expr, plane)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "sim_lsh_buckets",
    oracle=f"""
        SELECT {_sql_bucket("embedding")} AS bucket, count(*) AS n
        FROM embeddings GROUP BY 1
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket histogram — the partition layout the scale path relies on."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(bucket_id(F.col("embedding")).alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "sim_search_lsh",
    oracle=f"""
        WITH q AS (SELECT embedding, {_sql_bucket("embedding")} AS qbucket
                   FROM embeddings WHERE vec_id = 0),
        cand AS (
            SELECT a.vec_id, a.label, a.embedding, q.embedding AS qe
            FROM embeddings a, q
            WHERE a.vec_id <> 0
              AND bit_count(CAST(xor(CAST({_sql_bucket("a.embedding")} AS BIGINT),
                                     CAST(q.qbucket AS BIGINT)) AS BIT)) <= 1)
        SELECT vec_id, label,
               round(list_aggregate(list_transform(list_zip(embedding, qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(qe,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     {SIM_DECIMALS}) AS cos_sim
        FROM cand
        ORDER BY cos_sim DESC, vec_id
        LIMIT {TOP_K}
    """,
    tags=("similarity", "lsh"),
)
def sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: probe the query bucket and Hamming<=1
    neighbors, exact cosine re-rank on candidates only (see lsh_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, query_vec_id=0)


def lsh_topk(emb: DataFrame, query_vec_id: int, k: int = TOP_K, radius: int = 1) -> DataFrame:
    """Approximate top-k: probe the query's bucket and Hamming<=radius
    neighbors (multi-probe), exact cosine re-rank on candidates only.

    Recall contract: sign-LSH preserves *close* vectors — for cosine
    ~0.9 the 8-bit collision probability at radius 1 is ~0.95, but for
    weakly-similar vectors (cos ~0.3) it drops below 0.15 by design.
    tests/test_similarity_quality.py pins this with a planted neighbor.
    """
    bucketed = emb.withColumn("bucket", bucket_id(F.col("embedding")))
    qrow = bucketed.filter(F.col("vec_id") == query_vec_id).select("embedding", "bucket").first()
    if qrow is None:
        # empty corpus / unknown query id: nothing to probe
        return emb.select(
            "vec_id", "label", F.lit(0.0).alias("cos_sim")
        ).filter(F.lit(False))
    qvec, qbucket = F.lit(qrow["embedding"]).cast("array<float>"), qrow["bucket"]
    cand = bucketed.filter(
        (F.col("vec_id") != query_vec_id)
        & (F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbucket)).cast("long")) <= radius)
    )
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), qvec), SIM_DECIMALS).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )
