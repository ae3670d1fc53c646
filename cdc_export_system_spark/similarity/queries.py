"""Similarity search over the embeddings table (north-star extension).

Brute-force cosine top-k is the exact baseline: a scan + vectorized dot
product + TakeOrdered. The query vector broadcasts as a literal array, so
the plan is embarrassingly parallel — no shuffle until the final k-row
TakeOrdered. The LSH-bucketed scale path lives in similarity.lsh.

Float determinism: dot products fold left-to-right in double in both
engines; similarities are additionally rounded to 9 dp in both Spark and
the oracle so the hash comparison never hinges on the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.registry import REGISTRY, register

TOP_K = 20
QUERY_VEC_ID = 0  # the query is the embedding of vec_id 0 — same in both engines
SIM_DECIMALS = 9


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


# DuckDB mirror of the same left-to-right double fold (list_cosine_similarity
# would use its own accumulation; spelling the fold out keeps both engines on
# an identical operation sequence).
_SQL_DOT = (
    "list_aggregate(list_transform(list_zip(a.embedding, q.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_SQL_NORM_A = (
    "sqrt(list_aggregate(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)
_SQL_NORM_Q = (
    "sqrt(list_aggregate(list_transform(q.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)


@register(
    "sim_search_topk",
    oracle=f"""
        SELECT a.vec_id, a.label,
               round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}), {SIM_DECIMALS}) AS cos_sim
        FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE a.vec_id <> {QUERY_VEC_ID}
        ORDER BY cos_sim DESC, a.vec_id
        LIMIT {TOP_K}
    """,
    headline=True,
    tags=("similarity",),
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k against the vec_id=0 embedding.

    The query vector arrives via a broadcast single-row cross join (no
    driver-side .first() round trip): at any scale the 1-row side
    broadcasts and the plan stays embarrassingly parallel — scan +
    per-row fold + TakeOrdered."""
    emb = star_view(spark, sf_dir, "embeddings")
    spark_dot = (
        "aggregate(zip_with(embedding, qe, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    spark_norm_a = (
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    # qnorm is its own scalar subquery: evaluated once, not per scanned row.
    return spark.sql(f"""
        SELECT vec_id, label,
               round({spark_dot} / ({spark_norm_a} * qnorm), {SIM_DECIMALS}) AS cos_sim
        FROM (SELECT vec_id, label, embedding,
                     (SELECT embedding FROM {emb} WHERE vec_id = {QUERY_VEC_ID}) AS qe,
                     (SELECT sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
                          (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                      FROM {emb} WHERE vec_id = {QUERY_VEC_ID}) AS qnorm
              FROM {emb}
              WHERE vec_id <> {QUERY_VEC_ID})
        ORDER BY cos_sim DESC, vec_id
        LIMIT {TOP_K}
    """)


TRIANGLE_BLOCKS = 8  # sub-blocks per blocking key for all-pairs self-joins


def triangle_sides(
    df: DataFrame,
    id_col: str,
    n_blocks: int = TRIANGLE_BLOCKS,
    extra_keys: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Triangle block-partitioning for all-pairs self-joins.

    A self-join whose only equi key is the blocking key collapses to
    |distinct keys| reduce tasks — one label or k clusters means one or
    k tasks chewing a quadratic pair stream (measured: the 10x scaling
    run put sim_pairwise_by_label on 2 tasks for 54x wall time). The
    classic fix is the triangle scheme: hash every row into one of B
    sub-blocks; task (i, j) with i <= j compares block i against block
    j. A row in block x fans out as the LEFT side of tasks (x, x..B-1)
    and the RIGHT side of tasks (0..x, x), so every unordered pair
    meets in EXACTLY one task and parallelism is B(B+1)/2 per blocking
    key at a ~(B+1)/2 row-replication cost (the standard all-pairs
    trade; rows carry embeddings, so B stays modest).

    Callers join the two returned frames on `_tj` plus `extra_keys`
    (the blocking key, if any) and MUST keep only
        (_blk_a < _blk_b) | ((_blk_a = _blk_b) & (id_a < id_b))
    — cross-block pairs arrive once in block order (arbitrary id
    order: canonicalize ids with least/greatest if the output is
    id-ordered), same-block pairs arrive in both id orders.

    Both sides come back EXPLICITLY repartitioned on the join key at
    cluster parallelism: the pre-join shuffle is tiny (rows x B/2
    replication) and AQE would coalesce it to a couple of partitions,
    blind to the quadratic expansion the join emits — an explicit
    keyed repartition pins the count (AQE leaves user-specified
    partition counts alone), and the join reuses the distribution
    with no further exchange.
    """
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism * 2, 16)
    keys = [*extra_keys, "_tj"]
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    d = df.withColumn("_blk", blk)
    a = (
        d.withColumn(
            "_tj",
            F.explode(F.expr(f"transform(sequence(_blk, {n_blocks - 1}),"
                             f" j -> _blk * {n_blocks} + j)")),
        )
        .withColumnRenamed("_blk", "_blk_a")
        .repartition(n_part, *keys)
    )
    b = (
        d.withColumn(
            "_tj",
            F.explode(F.expr(f"transform(sequence(0, _blk),"
                             f" i -> i * {n_blocks} + _blk)")),
        )
        .withColumnRenamed("_blk", "_blk_b")
        .repartition(n_part, *keys)
    )
    return a, b


def triangle_pair_filter() -> F.Column:
    """The exactly-once pair predicate for triangle_sides joins (the
    caller renames its id columns to id_a / id_b)."""
    return (F.col("_blk_a") < F.col("_blk_b")) | (
        (F.col("_blk_a") == F.col("_blk_b")) & (F.col("id_a") < F.col("id_b"))
    )


@register(
    "sim_pairwise_by_label",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(a.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(b.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     {SIM_DECIMALS}) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE a.label = 3
    """,
    tags=("similarity", "join"),
)
def sim_pairwise_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise similarity: the blocking key (label) bounds
    WHICH pairs compare; triangle sub-blocking bounds WHERE they
    compute. A plain self-join on the label alone hashes every pair of
    a label onto one reducer (measured at 10x scale: 2 tasks, 54x wall
    time); triangle_sides spreads each label's pair stream over
    B(B+1)/2 tasks with every unordered pair met exactly once. Output
    ids are canonicalized (vec_a < vec_b) because cross-block pairs
    arrive in block order; cosine is symmetric so operand order is
    free."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 3)
    base = emb.select("vec_id", "embedding")
    ta, tb = triangle_sides(base, "vec_id")
    a = ta.select(
        "_tj", "_blk_a", F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = tb.select(
        "_tj", "_blk_b", F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, "_tj")
        .filter(triangle_pair_filter())
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            F.round(cosine(F.col("ea"), F.col("eb")), SIM_DECIMALS).alias("cos_sim"),
        )
    )


KNN_K = 3
# PINNED eval query set (VERDICT r07 item 4): real retrieval evals fix
# the query-set SIZE; letting it track the corpus (a bare `% 50`) makes
# every brute-force eval quadratic by construction (10x queries x 10x
# corpus = 100x sims at the 10x sweep). The id bound caps the set at
# its sf0.1 size (max vec_id 1999) so results at every test scale are
# byte-identical to the unbounded form, while sf1+ scales linearly.
EVAL_QUERY_ID_BOUND = 2000
KNN_QUERY_PRED = (
    f"vec_id % 50 = 0 AND vec_id < {EVAL_QUERY_ID_BOUND}"
)  # bounded query-point sample (broadcastable at any corpus scale)


@register(
    "sim_knn_join",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS qe
                   FROM embeddings WHERE {KNN_QUERY_PRED}),
        sims AS (
            SELECT q.q_vec_id, a.vec_id,
                   round(
                     list_aggregate(list_transform(list_zip(a.embedding, q.qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(a.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(q.qe,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     {SIM_DECIMALS}) AS cos_sim
            FROM embeddings a JOIN q ON a.vec_id <> q.q_vec_id)
        SELECT q_vec_id, vec_id, cos_sim, CAST(rn AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
              FROM sims)
        WHERE rn <= {KNN_K}
    """,
    tags=("similarity", "join"),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: exact top-k cosine neighbors for every query point in
    one pass. The query side broadcasts (it is the small side by
    construction — a sampled probe set); the corpus never shuffles until
    the per-query top-k, whose window runs over |queries| x |corpus|
    *similarity rows*, partitioned by query. At 100 TB the corpus side
    stays partition-local and the broadcast is the only data movement
    besides the top-k shuffle; beyond broadcastable query counts, the
    IVF/LSH paths (similarity.ivf / similarity.lsh) bound the pair
    generation instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(KNN_QUERY_PRED)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("qe")
    )
    sims = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), SIM_DECIMALS).alias(
                "cos_sim"
            ),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("q_vec_id", "vec_id", "cos_sim", F.col("rn").cast("int").alias("rank"))
    )


@register(
    "sim_centroid_per_label",
    oracle="""
        WITH ex AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   unnest(embedding) AS v
            FROM embeddings),
        s AS (
            SELECT label, pos, count(*) AS n,
                   SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                       AS s_micro
            FROM ex GROUP BY label, pos)
        SELECT label, CAST(pos AS INT) AS pos, n AS n_vectors,
               floor(CAST(CAST(s_micro AS VARCHAR) AS DOUBLE)
                     / (CAST(n AS DOUBLE) * 1000000.0) * 1000000000 + 0.5)
                   / 1000000000 AS centroid_c
        FROM s
    """,
    tags=("similarity", "agg", "ml"),
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector (class centroid / nearest-centroid model
    fit) as an EXACT vector aggregate: components are scaled to integer
    micro-units before summing, so the centroid is reshard-reproducible
    where a float sum's partition order is not (same argument as
    agg_stats_exact, lifted to array columns). posexplode turns the
    vector agg into a plain (label, pos) int-sum — map-side combinable,
    one shuffle of |labels| x dim partial rows per task, never the raw
    vectors. Output is the exploded (label, pos, component) grid; the
    kmeans module shows the re-assembled array form."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    )
    micro = F.floor(F.col("v").cast("double") * 1_000_000 + F.lit(0.5)).cast("bigint")
    s = ex.groupBy("label", F.col("pos0").alias("pos")).agg(
        F.count(F.lit(1)).alias("n_vectors"), F.sum(micro).alias("s_micro")
    )
    mean = F.col("s_micro").cast("double") / (
        F.col("n_vectors").cast("double") * F.lit(1_000_000.0)
    )
    return s.select(
        "label",
        (F.col("pos") + 1).cast("int").alias("pos"),  # 1-based like the oracle
        "n_vectors",
        (F.floor(mean * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
            "centroid_c"
        ),
    )


# --- seeded random projection (Johnson-Lindenstrauss reduce) -----------------

RP_IN_DIM = 64
RP_OUT_DIM = 16


def _rp_signs() -> list[list[int]]:
    """Deterministic +-1 projection matrix from md5 — the 'seed' both the
    Spark plan and the oracle SQL are generated from, so the model is
    pinned in the query text itself (no runtime randomness)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(RP_IN_DIM)
        ]
        for j in range(RP_OUT_DIM)
    ]


def _rp_oracle() -> str:
    signs = _rp_signs()
    blocks = []
    for j in range(RP_OUT_DIM):
        terms = " ".join(
            ("+" if s > 0 else "-")
            + f" CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            for i, s in enumerate(signs[j])
        )
        blocks.append(
            f"SELECT vec_id, label, CAST({j} AS INT) AS j,"
            f" CAST(CAST(({terms}) AS VARCHAR) AS DOUBLE) / 1000000.0 AS comp"
            f" FROM embeddings"
        )
    return " UNION ALL ".join(blocks)


@register(
    "sim_random_projection",
    oracle=_rp_oracle(),
    tags=("similarity", "ml"),
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection (Johnson-Lindenstrauss) 64d -> 16d: the
    cheap dimensionality reduction in front of LSH/clustering at scale.
    The +-1 matrix is a pure function of an md5 seed, embedded as
    literals in BOTH engines' query texts, so the 'random' model is
    reproducible and versionable. Components sum exact micro-ints
    (floor-scaled) per output dim, so no float-order hazard exists at
    all; output is the exploded (vec_id, j, comp) grid. Per-row work is
    16 folds over 64 JVM array slots — no shuffle before the sink."""
    emb = load_table(spark, sf_dir, "embeddings")
    signs = _rp_signs()
    cols = []
    for j in range(RP_OUT_DIM):
        terms = " ".join(
            ("+" if s > 0 else "-")
            + f" CAST(floor(CAST(get(embedding, {i}) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            for i, s in enumerate(signs[j])
        )
        cols.append(
            F.expr(f"CAST(({terms}) AS DOUBLE) / 1000000.0").alias(f"c{j}")
        )
    wide = emb.select("vec_id", "label", *cols)
    pairs = ", ".join(f"CAST({j} AS INT), c{j}" for j in range(RP_OUT_DIM))
    return wide.selectExpr(
        "vec_id", "label", f"stack({RP_OUT_DIM}, {pairs}) AS (j, comp)"
    )


SIM_RADIUS = 0.25


@register(
    "sim_range_search",
    oracle=f"""
        SELECT a.vec_id, a.label,
               round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}), {SIM_DECIMALS}) AS cos_sim
        FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE a.vec_id <> {QUERY_VEC_ID}
          AND round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}), {SIM_DECIMALS})
              >= {SIM_RADIUS}
    """,
    tags=("similarity",),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: every vector with cosine >=
    SIM_RADIUS of the query — the other half of the vector-search API
    beside top-k (dedup thresholds, recall-oriented retrieval). Same
    broadcast-1-row + scan + fold plan as sim_search_topk but with a
    pure filter instead of TakeOrdered: no ordering state at all, so
    the scan parallelizes perfectly and row membership is decided on
    the ROUNDED similarity (6 dp) — boundary ulps cannot flip a row in
    or out between engines or reshards."""
    emb = star_view(spark, sf_dir, "embeddings")
    spark_dot = (
        "aggregate(zip_with(embedding, qe, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    spark_norm_a = (
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    return spark.sql(f"""
        SELECT vec_id, label, cos_sim FROM (
            SELECT vec_id, label,
                   round({spark_dot} / ({spark_norm_a} * qnorm), {SIM_DECIMALS}) AS cos_sim
            FROM (SELECT vec_id, label, embedding,
                         (SELECT embedding FROM {emb} WHERE vec_id = {QUERY_VEC_ID}) AS qe,
                         (SELECT sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
                              (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                          FROM {emb} WHERE vec_id = {QUERY_VEC_ID}) AS qnorm
                  FROM {emb}
                  WHERE vec_id <> {QUERY_VEC_ID}))
        WHERE cos_sim >= {SIM_RADIUS}
    """)


MMR_LAMBDA = 0.7
MMR_K = 5


@register("sim_mmr_rerank", tags=("similarity", "rerank"))
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified rerank — the serving-side
    second stage every retrieval pipeline bolts onto a top-k search:
    pick MMR_K results that trade off relevance to the query against
    redundancy with what's already picked,
    ``argmax λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)``.

    Stage 1 is fully distributed: the exact brute-force top-TOP_K
    candidate retrieval (sim_search_topk's scan + fold + TakeOrdered
    plan) joined back to its vectors. Stage 2 collects the TOP_K
    candidate rows — a k × dim serving-model payload (20×64 floats),
    the same legitimate O(k·d) driver transfer as the k-means model —
    and runs the inherently sequential greedy selection driver-side on
    numpy float64 (bit-identical to the independent reference in
    tests/test_similarity_quality.py — a pure-Python sequential sum can
    differ in the last ulp, and SIM_DECIMALS rounding before the greedy
    argmax could flip a boundary pick); each pick is deterministic
    (scores rounded to SIM_DECIMALS, ties to the lower vec_id).
    Rows-only for the driver (greedy selection is not
    SQL-expressible)."""
    import numpy as np

    cands = sim_search_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = (
        cands.join(emb, "vec_id")
        .select("vec_id", "label", "cos_sim", "embedding")
        .collect()
    )

    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    norms = {vid: float(np.linalg.norm(v)) for vid, v in vecs.items()}

    def cos(i: int, j: int) -> float:
        return float(vecs[i] @ vecs[j]) / (norms[i] * norms[j])

    by_id = {r["vec_id"]: r for r in rows}
    pool = set(by_id)
    picked: list[tuple[int, float]] = []  # (vec_id, mmr_score)
    while pool and len(picked) < MMR_K:
        best_vid, best_score = None, None
        for vid in pool:
            redundancy = max(
                (cos(vid, s) for s, _ in picked),
                default=0.0,
            )
            score = round(
                MMR_LAMBDA * by_id[vid]["cos_sim"] - (1 - MMR_LAMBDA) * redundancy,
                SIM_DECIMALS,
            )
            if (
                best_score is None
                or score > best_score
                or (score == best_score and vid < best_vid)
            ):
                best_vid, best_score = vid, score
        picked.append((best_vid, best_score))
        pool.remove(best_vid)

    out = [
        (i + 1, vid, float(by_id[vid]["cos_sim"]), score)
        for i, (vid, score) in enumerate(picked)
    ]
    return spark.createDataFrame(
        out, "rank int, vec_id bigint, relevance double, mmr_score double"
    )


# ---------------------------------------------------------------------------
# sim_mmr_rerank_exact
# ---------------------------------------------------------------------------

MMR_LAMBDA_TENTHS = 7  # λ=0.7 as the exact integer pair (7, 3)


def _mmr_exact_oracle(
    top_k: int = TOP_K, k: int = MMR_K, lam: int = MMR_LAMBDA_TENTHS
) -> str:
    """Unrolled greedy MMR in DuckDB: quantize, exact-integer relevance
    top-k pool, pairwise pool dots, then k argmax selection steps as
    chained CTEs (LIMIT 1 with a total ORDER BY is the argmax)."""
    co = 10 - lam
    q = (
        "list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
    )
    steps = []
    for t in range(2, k + 1):
        steps.append(f"""
        s{t} AS (
            SELECT c.vec_id, c.rel, {lam} * c.rel - {co} * max(d.dot) AS score10
            FROM pool c
            JOIN dots d ON d.va = c.vec_id
            JOIN picked{t - 1} pk ON pk.vec_id = d.vb
            WHERE c.vec_id NOT IN (SELECT vec_id FROM picked{t - 1})
            GROUP BY c.vec_id, c.rel),
        p{t} AS (SELECT vec_id, rel, score10 FROM s{t}
                 ORDER BY score10 DESC, vec_id LIMIT 1),
        picked{t} AS (SELECT * FROM picked{t - 1}
                      UNION ALL SELECT vec_id, rel, score10, {t} FROM p{t})""")
    return f"""
        WITH qn AS MATERIALIZED (
            SELECT vec_id, {q} AS q FROM embeddings),
        qv AS (SELECT q FROM qn WHERE vec_id = {QUERY_VEC_ID}),
        rel AS (
            SELECT a.vec_id,
                   CAST(list_aggregate(list_transform(list_zip(a.q, qv.q),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS rel
            FROM qn a CROSS JOIN qv WHERE a.vec_id <> {QUERY_VEC_ID}),
        pool AS MATERIALIZED (
            SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT {top_k}),
        dots AS MATERIALIZED (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(list_aggregate(list_transform(list_zip(qa.q, qb.q),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS dot
            FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
            JOIN qn qa ON qa.vec_id = a.vec_id
            JOIN qn qb ON qb.vec_id = b.vec_id),
        p1 AS (SELECT vec_id, rel, {lam} * rel AS score10 FROM pool
               ORDER BY {lam} * rel DESC, vec_id LIMIT 1),
        picked1 AS (SELECT vec_id, rel, score10, 1 AS rank FROM p1),
        {", ".join(steps)}
        SELECT CAST(rank AS INT) AS rank, vec_id, rel AS rel_q, score10
        FROM picked{k}
    """


@register(
    "sim_mmr_rerank_exact",
    oracle=_mmr_exact_oracle(),
    tags=("similarity", "rerank"),
)
def sim_mmr_rerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance rerank as EXACT integer arithmetic —
    the oracle-checkable sibling of sim_mmr_rerank: coordinates quantize
    to 1e-6 integer units, relevance and redundancy are exact bigint
    DOT PRODUCTS (unnormalized — the determinism-first similarity
    choice: no sqrt, no division, no float anywhere), and the greedy
    objective is the integer score10 = 7·rel − 3·max_dot (λ=0.7 scaled
    by 10). Every argmax compares exact integers, ties to the lower
    vec_id, so the pick sequence is bit-identical across engines and
    partitionings.

    Stage 1 (distributed): quantized scan + exact-dot fold + TakeOrdered
    top-TOP_K pool against the broadcast query vector — sim_search_topk's
    plan in integer arithmetic. Stage 2 collects the k × dim pool (the
    legitimate serving-model payload) and runs the inherently sequential
    greedy selection driver-side in Python ints — exact, so it matches
    the SQL unrolling of the same recurrence step for step.

    Scale: the pool bound keeps stage 2 O(k²·d) on 20 vectors no matter
    the corpus; stage 1 is one scan, no shuffle before the k-row
    TakeOrdered."""
    emb = load_table(spark, sf_dir, "embeddings")
    qn = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("q"),
    )
    qv = qn.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qe")
    )
    idot = F.aggregate(
        F.zip_with(F.col("q"), F.col("qe"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pool_df = (
        qn.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv), F.lit(True))
        .select("vec_id", "q", idot.alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(TOP_K)
    )
    pool = pool_df.collect()  # k x dim serving model -> driver

    lam, co = MMR_LAMBDA_TENTHS, 10 - MMR_LAMBDA_TENTHS
    vecs = {r["vec_id"]: list(r["q"]) for r in pool}
    rel = {r["vec_id"]: int(r["rel"]) for r in pool}

    def pdot(i: int, j: int) -> int:
        return sum(a * b for a, b in zip(vecs[i], vecs[j]))

    remaining = set(vecs)
    picked: list[tuple[int, int]] = []  # (vec_id, score10)
    while remaining and len(picked) < MMR_K:
        best = None
        for vid in sorted(remaining):
            red = max((pdot(vid, s) for s, _ in picked), default=0)
            score = lam * rel[vid] - (co * red if picked else 0)
            if best is None or score > best[1]:
                best = (vid, score)
        picked.append(best)
        remaining.remove(best[0])

    out = [
        (i + 1, vid, rel[vid], score) for i, (vid, score) in enumerate(picked)
    ]
    return spark.createDataFrame(
        out, "rank int, vec_id bigint, rel_q bigint, score10 bigint"
    )


# ---------------------------------------------------------------------------
# sim_hard_negatives
# ---------------------------------------------------------------------------

HARD_NEG_K = 5
HARD_NEG_PRED = (
    f"vec_id % 50 = 7 AND vec_id < {EVAL_QUERY_ID_BOUND}"
)  # pinned anchor set (broadcastable at any corpus scale)


@register(
    "sim_hard_negatives",
    oracle=f"""
        WITH q AS (SELECT vec_id AS anchor_id, label AS anchor_label,
                          embedding AS qe
                   FROM embeddings WHERE {HARD_NEG_PRED}),
        sims AS (
            SELECT q.anchor_id, q.anchor_label, a.vec_id AS negative_id,
                   a.label AS negative_label,
                   round(
                     list_aggregate(list_transform(list_zip(a.embedding, q.qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(a.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(q.qe,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     {SIM_DECIMALS}) AS cos_sim
            FROM embeddings a JOIN q ON a.label <> q.anchor_label)
        SELECT anchor_id, anchor_label, negative_id, negative_label, cos_sim,
               CAST(rn AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos_sim DESC, negative_id) AS rn
              FROM sims)
        WHERE rn <= {HARD_NEG_K}
    """,
    tags=("similarity", "ml", "join"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD NEGATIVE MINING for contrastive training (the DPR/SimCSE
    data-prep step): for each sampled anchor, the top-k most similar
    vectors with a DIFFERENT label — the near-miss negatives that make
    a contrastive batch informative (random negatives are trivially
    easy; these sit right at the decision boundary). Same exactness
    contract as sim_knn_join: the cosine is the identical left-to-right
    double fold in both engines, ranked with a vec_id tie-break.

    Scale: anchors broadcast (sampled, bounded), the corpus never
    shuffles until the per-anchor top-k window; the label filter prunes
    pairs at the probe. Beyond broadcastable anchor counts, route the
    anchor set through the IVF index (similarity.ivf) and mine inside
    probed cells only — the standard ANN-backed mining path."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(HARD_NEG_PRED)).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("qe"),
    )
    sims = emb.join(
        F.broadcast(q), F.col("label") != F.col("anchor_label")
    ).select(
        "anchor_id",
        "anchor_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.round(cosine(F.col("embedding"), F.col("qe")), SIM_DECIMALS).alias(
            "cos_sim"
        ),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARD_NEG_K)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cos_sim",
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# sim_rrf_fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF dampening constant
RRF_DEPTH = 20  # fuse the top-20 of each leg


@register(
    "sim_rrf_fusion",
    oracle=None,  # composed below after the BM25 oracle import
    tags=("similarity", "text", "analytics"),
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL by Reciprocal Rank Fusion (Cormack et al. 2009)
    — the standard way to combine a LEXICAL ranking (text_bm25_topk
    over the documents) with a VECTOR ranking (cosine top-k against
    the vec_id=0 query embedding; ids align 1:1 with doc_id by
    construction): rrf(d) = sum over legs of 1/(60 + rank_d). Each
    leg's contribution quantizes to floor(1e9/(60+rank)) BEFORE
    summing, so the fused score is an exact integer and the fused
    order (score desc, id) never sits on a float boundary; documents
    appearing in only one leg receive that leg's term only (the
    standard convention).

    Scale: both legs are existing top-k pipelines (TakeOrdered heads);
    the fusion itself is a full outer join of two <= depth-row tables
    — driver-scale by construction, whatever the corpus size."""
    from pyspark.sql import Window as W

    from cdc_export_system_spark.functions.text import text_bm25_topk

    lex = (
        text_bm25_topk(spark, sf_dir)
        .filter(F.col("rank") <= RRF_DEPTH)
        .select(F.col("doc_id").alias("id"), F.col("rank").alias("r_lex"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    sims = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), SIM_DECIMALS).alias(
                "cos_sim"
            ),
        )
    )
    vec = (
        sims.withColumn(
            "r_vec",
            F.row_number().over(W.orderBy(F.desc("cos_sim"), F.asc("vec_id"))),
        )
        .filter(F.col("r_vec") <= RRF_DEPTH)
        .select(F.col("vec_id").alias("id"), "r_vec")
    )
    fused = lex.join(vec, "id", "full_outer").select(
        "id",
        (
            F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + r_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + r_vec)"), F.lit(0)
            )
        ).alias("rrf_nano"),
        "r_lex",
        "r_vec",
    )
    return fused.select(
        "id",
        "rrf_nano",
        F.col("r_lex").cast("int").alias("rank_lexical"),
        F.col("r_vec").cast("int").alias("rank_vector"),
        F.row_number()
        .over(W.orderBy(F.desc("rrf_nano"), F.asc("id")))
        .cast("int")
        .alias("fused_rank"),
    )


def _rrf_oracle() -> str:
    from cdc_export_system_spark.functions.text import BM25_TOPK_ORACLE

    return f"""
        WITH lex AS (
            SELECT doc_id AS id, rank AS r_lex
            FROM ({BM25_TOPK_ORACLE}) WHERE rank <= {RRF_DEPTH}),
        sims AS (
            SELECT a.vec_id,
                   round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}),
                         {SIM_DECIMALS}) AS cos_sim
            FROM embeddings a,
                 (SELECT embedding FROM embeddings
                  WHERE vec_id = {QUERY_VEC_ID}) q
            WHERE a.vec_id <> {QUERY_VEC_ID}),
        vec AS (
            SELECT vec_id AS id, CAST(rn AS INT) AS r_vec
            FROM (SELECT vec_id, row_number() OVER (
                      ORDER BY cos_sim DESC, vec_id) AS rn FROM sims)
            WHERE rn <= {RRF_DEPTH}),
        fused AS (
            SELECT COALESCE(lex.id, vec.id) AS id,
                   CAST(COALESCE(1000000000 // ({RRF_K} + r_lex), 0)
                        + COALESCE(1000000000 // ({RRF_K} + r_vec), 0)
                        AS BIGINT) AS rrf_nano,
                   r_lex, r_vec
            FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
        SELECT id, rrf_nano,
               CAST(r_lex AS INT) AS rank_lexical,
               CAST(r_vec AS INT) AS rank_vector,
               CAST(row_number() OVER (ORDER BY rrf_nano DESC, id) AS INT)
                   AS fused_rank
        FROM fused
    """


REGISTRY["sim_rrf_fusion"].oracle = _rrf_oracle()


# ---------------------------------------------------------------------------
# sim_ndcg_at_k
# ---------------------------------------------------------------------------

NDCG_K = 10


@register(
    "sim_ndcg_at_k",
    oracle=f"""
        WITH q AS (SELECT embedding, label AS qlabel FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID}),
        sims AS (
            SELECT a.vec_id,
                   CAST(a.label = q.qlabel AS BIGINT) AS rel,
                   round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}),
                         {SIM_DECIMALS}) AS cos_sim
            FROM embeddings a, q
            WHERE a.vec_id <> {QUERY_VEC_ID}),
        top AS (
            SELECT rel, CAST(rn AS BIGINT) AS rn
            FROM (SELECT rel, row_number() OVER (
                      ORDER BY cos_sim DESC, vec_id) AS rn FROM sims)
            WHERE rn <= {NDCG_K}),
        npos AS (
            SELECT least(CAST(SUM(rel) AS BIGINT), {NDCG_K}) AS p
            FROM sims),
        dcg AS (
            SELECT list_aggregate(
                       list_transform(list(CAST(rel AS DOUBLE) ORDER BY rn),
                                      x -> x), 'sum') AS hits,
                   list_aggregate(
                       list_transform(
                           list([CAST(rel AS DOUBLE), CAST(rn AS DOUBLE)]
                                ORDER BY rn),
                           x -> x[1] / (ln(x[2] + 1) / ln(2.0))),
                       'sum') AS dcg
            FROM top),
        idcg AS (
            SELECT list_aggregate(
                       list_transform(list(CAST(i AS DOUBLE) ORDER BY i),
                                      x -> 1 / (ln(x + 1) / ln(2.0))),
                       'sum') AS idcg
            FROM npos, unnest(range(1, npos.p + 1)) AS r(i))
        SELECT CAST(dcg.hits AS BIGINT) AS relevant_in_topk,
               npos.p AS ideal_hits,
               floor(dcg.dcg / idcg.idcg * 1000000000 + 0.5) / 1000000000
                   AS ndcg
        FROM dcg CROSS JOIN idcg CROSS JOIN npos
    """,
    tags=("similarity", "ml", "stats"),
)
def sim_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the cosine ranking against label relevance (a
    neighbor is relevant when it shares the query's label) — the
    position-weighted ranking-quality metric that sim_recall_at_k's
    set-based recall misses: a relevant hit at rank 1 is worth
    log-factors more than at rank 10. Both the DCG and the ideal DCG
    fold in RANK ORDER (the order-pinning discipline), log2 is written
    as ln/ln(2) identically in both engines, and the final ratio
    rounds at 1e-9.

    Scale: one corpus scan against the broadcast query vector, a
    TakeOrdered head, and constant-size folds; the ideal DCG comes
    from a generated 1..p spine, never a second data pass."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe"), F.col("label").alias("qlabel")
    )
    sims = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (F.col("label") == F.col("qlabel")).cast("bigint").alias("rel"),
            F.round(cosine(F.col("embedding"), F.col("qe")), SIM_DECIMALS).alias(
                "cos_sim"
            ),
        )
        .localCheckpoint(eager=True)
    )
    top = (
        sims.withColumn(
            "rn",
            F.row_number()
            .over(W.orderBy(F.desc("cos_sim"), F.asc("vec_id")))
            .cast("bigint"),
        )
        .filter(F.col("rn") <= NDCG_K)
        .select("rel", "rn")
    )
    npos = sims.agg(
        F.least(F.sum("rel").cast("bigint"), F.lit(NDCG_K).cast("bigint")).alias(
            "p"
        )
    )
    ln2 = F.log(F.lit(2.0))
    dcg = top.agg(
        F.sum("rel").cast("bigint").alias("hits"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rn").alias("rn"),
                        F.col("rel").cast("double").alias("rel"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + x["rel"] / (F.log(x["rn"].cast("double") + F.lit(1)) / ln2),
        ).alias("dcg"),
    )
    idcg = npos.select(
        "p",
        F.aggregate(
            F.expr("sequence(1, int(p))"),
            F.lit(0.0),
            lambda acc, i: acc
            + F.lit(1.0) / (F.log(i.cast("double") + F.lit(1)) / ln2),
        ).alias("idcg"),
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            F.col("hits").alias("relevant_in_topk"),
            F.col("p").alias("ideal_hits"),
            (
                F.floor(
                    F.col("dcg") / F.col("idcg") * 1_000_000_000 + F.lit(0.5)
                )
                / 1_000_000_000
            ).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# ml_map_at_k
# ---------------------------------------------------------------------------

MAP_K = 10


@register(
    "ml_map_at_k",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
                   FROM embeddings WHERE {KNN_QUERY_PRED}),
        sims AS (
            SELECT q.qid, a.vec_id,
                   CAST(a.label = q.qlabel AS BIGINT) AS rel,
                   round(
                     list_aggregate(list_transform(list_zip(a.embedding, q.qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(a.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(q.qe,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     {SIM_DECIMALS}) AS cos_sim
            FROM embeddings a JOIN q ON a.vec_id <> q.qid),
        ranked AS (
            SELECT qid, rel,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY cos_sim DESC, vec_id) AS rn
            FROM sims),
        rtot AS (
            SELECT qid, least(CAST(SUM(rel) AS BIGINT), {MAP_K}) AS r
            FROM sims GROUP BY qid),
        hits AS (
            SELECT qid, rn,
                   SUM(rel) OVER (PARTITION BY qid ORDER BY rn) AS cum_rel,
                   rel
            FROM ranked WHERE rn <= {MAP_K}),
        ap AS (
            SELECT h.qid,
                   CASE WHEN rtot.r > 0 THEN
                       list_aggregate(
                           list_transform(
                               list([CAST(h.rel AS DOUBLE),
                                     CAST(h.cum_rel AS DOUBLE),
                                     CAST(h.rn AS DOUBLE)] ORDER BY h.rn),
                               x -> x[1] * x[2] / x[3]), 'sum') / rtot.r
                   ELSE NULL END AS ap
            FROM hits h JOIN rtot ON h.qid = rtot.qid
            GROUP BY h.qid, rtot.r)
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN ap IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_scoreable,
               floor(list_aggregate(
                         list_transform(
                             list(COALESCE(ap, 0.0) ORDER BY qid), x -> x),
                         'sum')
                     / SUM(CASE WHEN ap IS NOT NULL THEN 1 ELSE 0 END)
                     * 1000000000 + 0.5) / 1000000000 AS map_at_k
        FROM ap
    """,
    tags=("ml", "similarity", "stats"),
)
def ml_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN AVERAGE PRECISION @ 10 over the sampled anchor set — the
    multi-query ranking benchmark (sim_ndcg_at_k scores ONE query;
    retrieval evals report the mean): per anchor, AP@10 sums
    precision-at-each-relevant-hit over the top 10 (cosine ranking,
    label relevance, denominator min(R, 10)); MAP averages the
    per-anchor APs. Double accumulation is pinned TWICE — each AP
    folds in RANK order, the mean folds in ANCHOR order — so the
    result survives any partitioning; anchors with zero relevant
    candidates are excluded from the mean identically in both engines.

    Scale: the anchor set broadcasts (bounded, the sim_knn_join
    contract); per-anchor ranking is one window on the anchor key; APs
    and the mean are constant-size folds."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(KNN_QUERY_PRED)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    sims = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        (F.col("label") == F.col("qlabel")).cast("bigint").alias("rel"),
        F.round(cosine(F.col("embedding"), F.col("qe")), SIM_DECIMALS).alias(
            "cos_sim"
        ),
    ).localCheckpoint(eager=True)
    ranked = sims.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        ),
    )
    rtot = sims.groupBy("qid").agg(
        F.least(F.sum("rel").cast("bigint"), F.lit(MAP_K).cast("bigint")).alias(
            "r"
        )
    )
    hits = (
        ranked.filter(F.col("rn") <= MAP_K)
        .withColumn(
            "cum_rel",
            F.sum("rel").over(W.partitionBy("qid").orderBy("rn")),
        )
        .select("qid", "rn", "rel", "cum_rel")
    )
    ap = (
        hits.groupBy("qid")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("rn").alias("rn"),
                            F.col("rel").cast("double").alias("rel"),
                            F.col("cum_rel").cast("double").alias("cum"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc
                + x["rel"] * x["cum"] / x["rn"].cast("double"),
            ).alias("ap_num")
        )
        .join(rtot, "qid")
        .select(
            "qid",
            F.when(F.col("r") > 0, F.col("ap_num") / F.col("r")).alias("ap"),
        )
    )
    out = ap.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.col("ap").isNotNull().cast("int")).cast("bigint").alias(
            "n_scoreable"
        ),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "qid", F.coalesce(F.col("ap"), F.lit(0.0)).alias("ap")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["ap"],
        ).alias("ap_sum"),
    )
    return out.select(
        "n_queries",
        "n_scoreable",
        (
            F.floor(
                F.col("ap_sum") / F.col("n_scoreable") * 1_000_000_000
                + F.lit(0.5)
            )
            / 1_000_000_000
        ).alias("map_at_k"),
    )
