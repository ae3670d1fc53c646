"""SimHash fingerprinting (north-star extension).

32-bit SimHash over whitespace tokens: each token hashes to 32 bits (md5
prefix); per document, bit j of the fingerprint is 1 iff the sum of
(+1/-1) votes from all token hashes at position j is positive. Near-dups
have small Hamming distance between fingerprints.

Plan shape: explode tokens -> groupBy(doc_id) with 32 conditional-sum
aggregates -> fingerprint assembled from the signs. One shuffle carrying
(doc_id, 32-bit hash) pairs. Matching is a fingerprint equi-join (Hamming
distance 0) or a banded join on fingerprint bytes for distance <= k —
both plain hash joins, no pairwise scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

BITS = 32
_SPARK_H32 = "cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"
_DUCK_H32 = "CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT)"


def simhash(docs: DataFrame) -> DataFrame:
    """doc_id + 32-bit simhash fingerprint."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    ).select("doc_id", F.expr(_SPARK_H32).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(BITS)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    fp = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)),
        range(BITS),
        F.lit(0).cast("long"),
    )
    return voted.select("doc_id", fp.alias("fingerprint"))


def _sql_simhash_cte() -> str:
    votes = ",\n               ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(BITS)
    )
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(BITS))
    return f"""
        tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
                FROM documents),
        hashed AS (SELECT doc_id, {_DUCK_H32} AS h FROM tok),
        voted AS (SELECT doc_id,
               {votes}
               FROM hashed GROUP BY doc_id),
        fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fingerprint FROM voted)
    """


@register(
    "dedup_simhash",
    oracle=f"""
        WITH {_sql_simhash_cte()}
        SELECT doc_id, fingerprint FROM fp
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash fingerprints."""
    return simhash(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_banded_pairs",
    oracle=f"""
        WITH {_sql_simhash_cte()},
        bands AS (
            SELECT doc_id, fingerprint, b.i AS band,
                   (fingerprint // CAST(pow(2, b.i * 8) AS BIGINT)) % 256 AS byte
            FROM fp, (SELECT unnest([0, 1, 2, 3]) AS i) b)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(CAST(xor(a.fingerprint, b.fingerprint) AS BIT)) AS INTEGER) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.fingerprint, b.fingerprint) AS BIT)) <= 6
    """,
    tags=("dedup", "simhash", "lsh"),
)
def dedup_simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-near pairs via byte-banding: fingerprints within distance k
    share at least one of their 4 bytes when k <= 6 is rare-ish; banding
    turns the pairwise scan into 4 hash joins (same LSH trick as MinHash
    banding, specialized to Hamming space).

    A hot bucket (many docs sharing one band byte — the round-7 10x run
    measured a 14k-doc bucket, i.e. ~196M candidate pairs on ONE reduce
    task, because AQE cannot split a single join key) is spread over
    B(B+1)/2 tasks by the triangle sub-blocking helper; the result set
    is unchanged (every same-bucket pair still meets exactly once per
    bucket, and the cross-bucket DISTINCT is the same)."""
    from cdc_export_system_spark.similarity.queries import (
        triangle_pair_filter,
        triangle_sides,
    )

    # 2-col |docs| fingerprint table, pinned once: both triangle sides
    # of the band self-join consume it, and un-materialized each re-ran
    # the full tokenize + hash + bit-vote pipeline (r11 plan sweep)
    fp = simhash(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    bands = fp.select(
        "doc_id",
        "fingerprint",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("fingerprint"), i * 8).bitwiseAND(F.lit(255)).alias(
                        "byte"
                    ),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", "fingerprint", "bb.band", "bb.byte")
    ta, tb = triangle_sides(bands, "doc_id", extra_keys=("band", "byte"))
    a = ta.select(
        "band", "byte", "_tj", "_blk_a",
        F.col("doc_id").alias("id_a"), F.col("fingerprint").alias("fp_a"),
    )
    b = tb.select(
        "band", "byte", "_tj", "_blk_b",
        F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("fp_b"),
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["band", "byte", "_tj"])
        .filter(triangle_pair_filter())
        .filter(hamming <= 6)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# dedup_edit_distance_verify
# ---------------------------------------------------------------------------

EDIT_VERIFY_MAX = 30  # absolute Levenshtein ceiling for a verified near-dup


@register(
    "dedup_edit_distance_verify",
    oracle=f"""
        WITH {_sql_simhash_cte()},
        bands AS (
            SELECT doc_id, fingerprint, b.i AS band,
                   (fingerprint // CAST(pow(2, b.i * 8) AS BIGINT)) % 256 AS byte
            FROM fp, (SELECT unnest([0, 1, 2, 3]) AS i) b),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(CAST(xor(a.fingerprint, b.fingerprint)
                                       AS BIT)) AS INTEGER) AS hamming
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
            WHERE bit_count(CAST(xor(a.fingerprint, b.fingerprint) AS BIT)) <= 6)
        SELECT c.doc_a, c.doc_b, c.hamming,
               CAST(levenshtein(da.text, db.text) AS INTEGER) AS edit_dist
        FROM cand c
        JOIN documents da ON da.doc_id = c.doc_a
        JOIN documents db ON db.doc_id = c.doc_b
        WHERE levenshtein(da.text, db.text) <= {EDIT_VERIFY_MAX}
    """,
    tags=("dedup", "simhash", "verify"),
)
def dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE verification of the SimHash candidate pairs: the
    second stage every fingerprint-blocked dedup needs — banding is
    recall-oriented (byte collisions admit plenty of false candidates:
    ~10k candidates here verify down to ~25 true near-dups), so each
    candidate pair re-checks with an exact character-level Levenshtein
    bound, the strictest of the repo's verify family (exact-Jaccard in
    dedup_minhash_verified, cosine in dedup_embedding_cosine). Both
    engines run their built-in unit-cost Levenshtein, so the pair set
    and distances hash-match exactly.

    Scale: Levenshtein is O(len^2) per pair — affordable ONLY because
    it runs on the banded candidate set, never the corpus square; the
    text join probes documents by doc_id (two keyed joins on the
    bounded pair list). Two result-preserving prunes keep the verify
    affordable when banding over-admits (the round-7 10x densification
    run found the unpruned form grinding on millions of clustered-
    fingerprint candidates): (a) edit distance is lower-bounded by the
    LENGTH DIFFERENCE, so |len(a) - len(b)| > max filters before any
    DP matrix is built; (b) the DP itself runs with Spark's threshold
    form (banded O(len x max) early-exit, -1 past the bound) — both
    exclude exactly the pairs the oracle's WHERE excludes, so the pair
    set and distances still hash-match. The candidate builder inherits
    dedup_simhash_banded_pairs' plan (4 band hash-joins, no
    self-cartesian); at 100 TB you'd also cap per-bucket width (the
    banding doc covers the skew story)."""
    pairs = dedup_simhash_banded_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        pairs.join(
            docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
            "doc_a",
        )
        .join(
            docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
            "doc_b",
        )
        # exact lower bound: lev(a, b) >= |len(a) - len(b)| — prune the
        # DP entirely for pairs that cannot pass the <= max gate
        .filter(
            F.abs(F.length("ta") - F.length("tb")) <= F.lit(EDIT_VERIFY_MAX)
        )
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            # threshold form: banded DP, returns -1 when dist > max —
            # those rows fail the <= max filter exactly like the true
            # distance would
            F.levenshtein("ta", "tb", EDIT_VERIFY_MAX).alias("edit_dist"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= EDIT_VERIFY_MAX))
    )
