"""Quality pins for similarity search.

Sign-LSH's contract is about *close* vectors: the corpus's exact top-k
neighbors sit at cosine ~0.3 (random 64-d embeddings), where 8-bit LSH
collision probability is intentionally low. So the recall pin plants a
genuinely close neighbor (cos > 0.95) and requires the LSH path to find
it; the brute-force path is the exactness oracle elsewhere."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.similarity.lsh import lsh_topk, sim_lsh_buckets
from tests.conftest import SF_DIR

PLANTED_ID = 999_999


def _with_planted_neighbor(spark, query_vec_id=0, noise=0.02):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == query_vec_id).first()
    planted = [v + noise * ((i % 5) - 2) for i, v in enumerate(q["embedding"])]
    extra = spark.createDataFrame(
        [(PLANTED_ID, planted, q["label"])],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )
    return emb.unionByName(extra)


def test_lsh_finds_planted_close_neighbor(spark):
    emb = _with_planted_neighbor(spark)
    top = lsh_topk(emb, query_vec_id=0, k=5).collect()
    assert top, "LSH probe returned no candidates"
    assert top[0]["vec_id"] == PLANTED_ID
    assert top[0]["cos_sim"] > 0.9


def test_lsh_buckets_spread(spark):
    rows = sim_lsh_buckets(spark, SF_DIR).collect()
    n_buckets = len(rows)
    biggest = max(r["n"] for r in rows)
    total = sum(r["n"] for r in rows)
    assert n_buckets >= 16  # 256 possible; corpus should hit a good fraction
    assert biggest < 0.5 * total  # no degenerate hot bucket
