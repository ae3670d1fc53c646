"""Entity resolution / record linkage: multi-pass blocking ->
Fellegi-Sunter-style scoring -> 1-1 matching -> entity clustering ->
survivorship (golden records).

North-star extension (no reference counterpart — the reference's only
"linkage" is the users PK; SURVEY.md §2.10 family). Record linkage is
a core LLM-training-data operation: reconciling the same logical
entity (author, site, document source) across ingest feeds before
dedup/attribution, with NO shared key — exactly the Fellegi-Sunter
(1969, JASA) probabilistic model this module implements.

The second source ("CRM feed B") derives DETERMINISTICALLY from
``customer`` so both engines build the identical corpus and ground
truth is known, which makes precision/recall an exact, oracle-checked
output rather than an estimate:

* ~15% of customers are absent from B (hash-dropped),
* ~10% have a perturbed nation code (wrong-key entry),
* ~10% have segment 'UNKNOWN' (missing attribute),
* ~5% appear TWICE (second copy with a shifted surrogate id and a
  +1.0 balance) — the classic duplicate-feed hazard,
* balances are rounded to whole units (floor(x+0.5)), names are
  reformatted (lowercase, '#' -> ' ') — format drift between systems.

The "hash" is a mod-bounded Knuth mix ``((k % 999983) * 2654435761 +
salt) % 1000`` chosen because it is bit-identical in Spark and DuckDB
integer arithmetic and its product is bounded by construction
(999982 * 2654435761 ~ 2.7e15 << 2^63, data-size independent — see
tests/test_int_product_lint.py allowlist).

Scale design (100 TB posture):

* Blocking is the whole game: candidate pairs come from TWO keyed
  equi-joins (nation+segment+balance-band; name-suffix+balance-band),
  never a cross join. The balance tolerance (|diff| <= 2) is made
  equi-joinable by exploding each left record to its <=2 candidate
  256-unit bands — the same banding trick as the LSH families, so the
  shuffle key carries the tolerance and the non-equi predicate is a
  residual filter, not a join strategy.
* Block growth is the documented honesty gap of any fixed-cardinality
  blocking key: the suffix pass keys on 4 name digits x ~45 balance
  bands (~450k keys); past ~10^8 records per key-space you widen the
  suffix, exactly as you widen LSH bands. The `er_blocking_stats` op
  exists to MEASURE that (max block size per pass) as a first-class
  query, because ER pipelines die by silent block explosion, not by
  scoring cost.
* Scoring/classification is pure per-row expression work (weights are
  exactly-representable doubles, so the agreement sum is
  order-independent and bit-identical across engines).
* Clustering reuses the O(log n)-round pointer-jumping connected
  components from dedup/cluster.py (edges only, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.dedup.cluster import connected_components
from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

# Fellegi-Sunter agreement/disagreement weights (log-likelihood-ratio
# shaped; exactly-representable doubles so 4-term sums are exact).
W_SUF_A, W_SUF_D = 8.0, -2.0
W_NAT_A, W_NAT_D = 3.0, -1.0
W_SEG_A, W_SEG_D = 1.5, -0.5
W_ACC_A, W_ACC_D = 2.0, -2.0
T_MATCH = 10.0  # score >= T_MATCH        -> 'match'
T_POSSIBLE = 4.0  # T_POSSIBLE <= s < T_M -> 'possible'
BAND = 256.0  # balance blocking band width
TOL = 2.0  # balance join tolerance (covers rounding 0.5 + dup shift 1.0)
ACC_TOL = 0.75  # balance AGREEMENT tolerance (true rounding only)

_B_OFFSET = 1_000_000  # B surrogate id space
_DUP_OFFSET = 2_000_000  # duplicate-copy id space


def _mix(k: F.Column, salt: int) -> F.Column:
    """Deterministic 0..999 bucket; identical in Spark and DuckDB.

    The salt perturbs the MULTIPLIER, not the sum — an additive salt
    only shifts the bucket interval, leaving every salted predicate a
    nested interval of the same mixed value (the first cut of this
    derivation had its "duplicates" nested inside the nation-perturbed
    ∩ segment-unknown slice for exactly that reason)."""
    return ((k % 999983) * F.lit(2654435761 + salt)) % 1000


def _sql_mix(expr: str, salt: int) -> str:
    return f"((({expr} % 999983) * {2654435761 + salt}) % 1000)"


def _suffix4(name_col: F.Column) -> F.Column:
    """Last 4 digits of the record's name, as a string (leading zeros
    kept) — the linker sees only the rendered name, never the key."""
    digits = F.regexp_replace(name_col, "[^0-9]", "")
    return F.substring(digits, -4, 4)


def _sql_suffix4(expr: str) -> str:
    return f"right(regexp_replace({expr}, '[^0-9]', '', 'g'), 4)"


def source_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived CRM feed B: (b_id, b_name, b_nation, b_segment,
    b_acctbal, b_truth). b_truth is ground truth for METRICS only —
    no linkage op may join on it."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base = (
        c.filter(_mix(k, 11) < 850)
        .select(
            (k + _B_OFFSET).alias("b_id"),
            F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit(" "))).alias("b_name"),
            F.when(_mix(k, 23) < 100, (F.col("c_nationkey") + 7) % 25)
            .otherwise(F.col("c_nationkey"))
            .cast("int")
            .alias("b_nation"),
            F.when(_mix(k, 37) < 100, F.lit("UNKNOWN"))
            .otherwise(F.col("c_mktsegment"))
            .alias("b_segment"),
            F.floor(F.col("c_acctbal") + 0.5).cast("double").alias("b_acctbal"),
            k.alias("b_truth"),
        )
    )
    dups = (
        base.filter(_mix(F.col("b_truth"), 53) < 50)
        .select(
            (F.col("b_truth") + _DUP_OFFSET).alias("b_id"),
            "b_name",
            "b_nation",
            "b_segment",
            (F.col("b_acctbal") + 1.0).alias("b_acctbal"),
            "b_truth",
        )
    )
    return base.unionAll(dups)


# The same feed in DuckDB SQL (CTE body, expects `customer` view).
_SQL_B = f"""
    b_base AS (
        SELECT c_custkey + {_B_OFFSET} AS b_id,
               lower(replace(c_name, '#', ' ')) AS b_name,
               CAST(CASE WHEN {_sql_mix('c_custkey', 23)} < 100
                    THEN (c_nationkey + 7) % 25 ELSE c_nationkey END AS INT)
                   AS b_nation,
               CASE WHEN {_sql_mix('c_custkey', 37)} < 100
                    THEN 'UNKNOWN' ELSE c_mktsegment END AS b_segment,
               CAST(floor(c_acctbal + 0.5) AS DOUBLE) AS b_acctbal,
               c_custkey AS b_truth
        FROM customer
        WHERE {_sql_mix('c_custkey', 11)} < 850),
    b AS (
        SELECT * FROM b_base
        UNION ALL
        SELECT b_truth + {_DUP_OFFSET}, b_name, b_nation, b_segment,
               b_acctbal + 1.0, b_truth
        FROM b_base WHERE {_sql_mix('b_truth', 53)} < 50)
"""

# A-side (customer) with the linker-visible name suffix.
_SQL_A = f"""
    a AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal,
               {_sql_suffix4('c_name')} AS a_suf
        FROM customer)
"""

# Candidate pairs: union of the two blocking passes, deduped, with
# agreement features and the Fellegi-Sunter score.
_SQL_CAND = f"""
    {_SQL_B},
    {_SQL_A},
    bx AS (SELECT b.*, {_sql_suffix4('b_name')} AS b_suf FROM b),
    p1 AS (
        SELECT a.c_custkey, a.c_nationkey, a.c_mktsegment, a.c_acctbal,
               a.a_suf, bx.b_id, bx.b_truth, bx.b_nation, bx.b_segment,
               bx.b_acctbal, bx.b_suf
        FROM a JOIN bx
          ON bx.b_nation = a.c_nationkey
         AND bx.b_segment = a.c_mktsegment
         AND abs(bx.b_acctbal - a.c_acctbal) <= {TOL}),
    p2 AS (
        SELECT a.c_custkey, a.c_nationkey, a.c_mktsegment, a.c_acctbal,
               a.a_suf, bx.b_id, bx.b_truth, bx.b_nation, bx.b_segment,
               bx.b_acctbal, bx.b_suf
        FROM a JOIN bx
          ON bx.b_suf = a.a_suf
         AND abs(bx.b_acctbal - a.c_acctbal) <= {TOL}),
    cand AS (SELECT DISTINCT * FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
    scored AS (
        SELECT c_custkey, b_id, b_truth,
               CASE WHEN b_suf = a_suf THEN {W_SUF_A} ELSE {W_SUF_D} END
             + CASE WHEN b_nation = c_nationkey THEN {W_NAT_A} ELSE {W_NAT_D} END
             + CASE WHEN b_segment = 'UNKNOWN' THEN 0.0
                    WHEN b_segment = c_mktsegment THEN {W_SEG_A}
                    ELSE {W_SEG_D} END
             + CASE WHEN abs(b_acctbal - c_acctbal) <= {ACC_TOL}
                    THEN {W_ACC_A} ELSE {W_ACC_D} END AS score
        FROM cand)
"""


def _a_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.withColumn("a_suf", _suffix4(F.col("c_name")))


def _banded(df: DataFrame, bal_col: str) -> DataFrame:
    """Explode to the <=2 bands a record can share with any partner
    within TOL — the equi-joinable form of the balance tolerance."""
    return df.withColumn(
        "band",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col(bal_col) - TOL) / BAND),
                    F.floor((F.col(bal_col) + TOL) / BAND),
                )
            )
        ),
    )


def pinned_sources(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The (A, B-with-suffix) linkage inputs, MATERIALIZED once. Every
    multi-consumer er_* query pins these narrow projections instead of
    re-running the scan + regex-suffix + dup-union subtree per
    consumer (2x per blocking pass, plus the survivorship record feed
    in er_golden_record)."""
    a = _a_side(spark, sf_dir).localCheckpoint(eager=True)
    b = (
        source_b(spark, sf_dir)
        .withColumn("b_suf", _suffix4(F.col("b_name")))
        .localCheckpoint(eager=True)
    )
    return a, b


def candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    a: DataFrame | None = None,
    b: DataFrame | None = None,
) -> DataFrame:
    """Blocked, deduped, scored candidate pairs (both passes).

    Both sides are MATERIALIZED once (localCheckpoint): the two
    blocking passes below each consume a and b, and without
    materialization each pass re-runs the scan + regex-suffix +
    dup-union subtree — 2x per side per call, at any volume.
    ``a``/``b``: pre-materialized frames from :func:`pinned_sources`
    (built fresh when omitted) — callers that also consume the record
    feeds themselves pass them in so one pin serves every consumer."""
    if a is None or b is None:
        a, b = pinned_sources(spark, sf_dir)
    b_banded = b.withColumn("band", F.floor(F.col("b_acctbal") / BAND))

    tol_ok = F.abs(F.col("b_acctbal") - F.col("c_acctbal")) <= TOL
    a_banded = _banded(a, "c_acctbal").withColumnRenamed("band", "a_band")
    p1 = (
        a_banded.join(
            b_banded,
            on=[
                F.col("a_band") == F.col("band"),
                F.col("b_nation") == F.col("c_nationkey"),
                F.col("b_segment") == F.col("c_mktsegment"),
            ],
        )
        .filter(tol_ok)
    )
    p2 = (
        a_banded.join(
            b_banded,
            on=[F.col("a_band") == F.col("band"), F.col("b_suf") == F.col("a_suf")],
        )
        .filter(tol_ok)
    )
    # Score is a pure function of the pair's attributes, which are
    # themselves functions of the ids — so compute it ROW-LOCALLY in
    # each pass and dedup the multi-pass union on the narrow
    # (a, b, truth, score) projection: the dedup shuffle carries 4
    # columns instead of the 11-attribute pair row (~3x narrower at
    # 100 TB, same result set; measured 1.59 -> 1.13 s at sf0.1).
    score = (
        F.when(F.col("b_suf") == F.col("a_suf"), W_SUF_A).otherwise(W_SUF_D)
        + F.when(F.col("b_nation") == F.col("c_nationkey"), W_NAT_A).otherwise(W_NAT_D)
        + F.when(F.col("b_segment") == "UNKNOWN", 0.0)
        .when(F.col("b_segment") == F.col("c_mktsegment"), W_SEG_A)
        .otherwise(W_SEG_D)
        + F.when(
            F.abs(F.col("b_acctbal") - F.col("c_acctbal")) <= ACC_TOL, W_ACC_A
        ).otherwise(W_ACC_D)
    )
    cols = ["c_custkey", "b_id", "b_truth"]
    p1s = p1.select(*cols, score.alias("score"))
    p2s = p2.select(*cols, score.alias("score"))
    return p1s.unionAll(p2s).distinct()


@register(
    "er_blocking_stats",
    oracle=f"""
        WITH {_SQL_B},
        {_SQL_A},
        bx AS (SELECT b.*, {_sql_suffix4('b_name')} AS b_suf,
                      CAST(floor(b_acctbal / {BAND}) AS BIGINT) AS band
               FROM b),
        a_bands AS (
            SELECT a.*, unnest(list_distinct([
                       CAST(floor((c_acctbal - {TOL}) / {BAND}) AS BIGINT),
                       CAST(floor((c_acctbal + {TOL}) / {BAND}) AS BIGINT)]))
                   AS band
            FROM a),
        s1 AS (
            SELECT 'nation_seg_band' AS pass,
                   (SELECT count(*) FROM (SELECT DISTINCT b_nation, b_segment,
                                                 band FROM bx)) AS n_blocks,
                   (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM a_bands
                        GROUP BY c_nationkey, c_mktsegment, band)) AS max_block_a,
                   (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM bx
                        GROUP BY b_nation, b_segment, band)) AS max_block_b,
                   (SELECT count(*) FROM a_bands a JOIN bx
                        ON bx.b_nation = a.c_nationkey
                       AND bx.b_segment = a.c_mktsegment
                       AND bx.band = a.band
                       AND abs(bx.b_acctbal - a.c_acctbal) <= {TOL})
                       AS n_candidates),
        s2 AS (
            SELECT 'suffix_band' AS pass,
                   (SELECT count(*) FROM (SELECT DISTINCT b_suf, band FROM bx))
                       AS n_blocks,
                   (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM a_bands
                        GROUP BY a_suf, band)) AS max_block_a,
                   (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM bx
                        GROUP BY b_suf, band)) AS max_block_b,
                   (SELECT count(*) FROM a_bands a JOIN bx
                        ON bx.b_suf = a.a_suf AND bx.band = a.band
                       AND abs(bx.b_acctbal - a.c_acctbal) <= {TOL})
                       AS n_candidates)
        SELECT pass, CAST(n_blocks AS BIGINT) AS n_blocks,
               CAST(max_block_a AS BIGINT) AS max_block_a,
               CAST(max_block_b AS BIGINT) AS max_block_b,
               CAST(n_candidates AS BIGINT) AS n_candidates
        FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
    """,
    tags=("er", "blocking", "agg"),
)
def er_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-health report, one row per blocking pass: number of
    blocks, the largest block on each side, and the candidate pairs
    the pass generates. THE op to run before an ER job at scale — a
    max_block in the millions means the pass degenerates to a
    quadratic join and the key must be widened (more digits / narrower
    bands), exactly like widening LSH bands."""
    # materialized once: the per-pass stats below consume each side
    # four times (block count, two max-block aggregates, candidate
    # count) x two passes — 8 re-evaluations without the checkpoint
    a = _a_side(spark, sf_dir).localCheckpoint(eager=True)
    b = (
        source_b(spark, sf_dir)
        .withColumn("b_suf", _suffix4(F.col("b_name")))
        .localCheckpoint(eager=True)
    )
    bx = b.withColumn("band", F.floor(F.col("b_acctbal") / BAND))
    ab = _banded(a, "c_acctbal")
    tol_ok = F.abs(F.col("b_acctbal") - F.col("c_acctbal")) <= TOL

    def pass_stats(name, a_keys, b_keys, join_cond):
        n_blocks = bx.select(*b_keys).distinct().agg(
            F.count(F.lit(1)).alias("n_blocks")
        )
        max_a = (
            ab.groupBy(*a_keys).agg(F.count(F.lit(1)).alias("cnt"))
            .agg(F.max("cnt").alias("max_block_a"))
        )
        max_b = (
            bx.groupBy(*b_keys).agg(F.count(F.lit(1)).alias("cnt"))
            .agg(F.max("cnt").alias("max_block_b"))
        )
        n_cand = (
            ab.join(bx, on=join_cond).filter(tol_ok)
            .agg(F.count(F.lit(1)).alias("n_candidates"))
        )
        return (
            n_blocks.crossJoin(F.broadcast(max_a))
            .crossJoin(F.broadcast(max_b))
            .crossJoin(F.broadcast(n_cand))
            .select(
                F.lit(name).alias("pass"),
                F.col("n_blocks").cast("bigint"),
                F.col("max_block_a").cast("bigint"),
                F.col("max_block_b").cast("bigint"),
                F.col("n_candidates").cast("bigint"),
            )
        )

    s1 = pass_stats(
        "nation_seg_band",
        ["c_nationkey", "c_mktsegment", "band"],
        ["b_nation", "b_segment", "band"],
        [
            F.col("b_nation") == F.col("c_nationkey"),
            F.col("b_segment") == F.col("c_mktsegment"),
            bx.band == ab.band,
        ],
    )
    s2 = pass_stats(
        "suffix_band",
        ["a_suf", "band"],
        ["b_suf", "band"],
        [F.col("b_suf") == F.col("a_suf"), bx.band == ab.band],
    )
    return s1.unionAll(s2)


@register(
    "er_candidate_pairs",
    oracle=f"""
        WITH {_SQL_CAND}
        SELECT CAST(c_custkey AS BIGINT) AS a_id,
               CAST(b_id AS BIGINT) AS b_id,
               CAST(score AS DOUBLE) AS score,
               CASE WHEN score >= {T_MATCH} THEN 'match'
                    WHEN score >= {T_POSSIBLE} THEN 'possible'
                    ELSE 'nonmatch' END AS cls,
               CAST(CASE WHEN b_truth = c_custkey THEN 1 ELSE 0 END AS BIGINT)
                   AS is_true
        FROM scored
    """,
    headline=True,
    tags=("er", "join", "blocking"),
)
def er_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every blocked candidate pair with its agreement score, the
    Fellegi-Sunter 3-way classification, and (because ground truth is
    derivable here) the truth bit — the review queue an ER operator
    hands to a clerical-review UI."""
    cand = candidate_pairs(spark, sf_dir)
    return cand.select(
        F.col("c_custkey").cast("bigint").alias("a_id"),
        F.col("b_id").cast("bigint"),
        "score",
        F.when(F.col("score") >= T_MATCH, "match")
        .when(F.col("score") >= T_POSSIBLE, "possible")
        .otherwise("nonmatch")
        .alias("cls"),
        F.when(F.col("b_truth") == F.col("c_custkey"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_true"),
    )


@register(
    "er_match_metrics",
    oracle=f"""
        WITH {_SQL_CAND},
        classed AS (
            SELECT CASE WHEN score >= {T_MATCH} THEN 'match'
                        WHEN score >= {T_POSSIBLE} THEN 'possible'
                        ELSE 'nonmatch' END AS cls,
                   CASE WHEN b_truth = c_custkey THEN 1 ELSE 0 END AS is_true
            FROM scored),
        per_cls AS (
            SELECT cls, count(*) AS n_pairs,
                   CAST(sum(is_true) AS BIGINT) AS n_true_pairs
            FROM classed GROUP BY cls)
        SELECT cls, n_pairs, n_true_pairs,
               n_true_pairs / n_pairs AS precision,
               n_true_pairs / (SELECT count(*) FROM b) AS recall
        FROM per_cls
    """,
    tags=("er", "agg", "metrics"),
)
def er_match_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class linkage quality: pair counts, true-pair counts, exact
    precision, and class-wise recall (denominator = every B record,
    each of which has exactly one true partner in A). This is the
    oracle-checked version of the eval every real ER deployment
    estimates from labeled samples."""
    cand = candidate_pairs(spark, sf_dir)
    classed = cand.select(
        F.when(F.col("score") >= T_MATCH, "match")
        .when(F.col("score") >= T_POSSIBLE, "possible")
        .otherwise("nonmatch")
        .alias("cls"),
        F.when(F.col("b_truth") == F.col("c_custkey"), 1).otherwise(0).alias("is_true"),
    )
    per_cls = classed.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("is_true").cast("bigint").alias("n_true_pairs"),
    )
    total_b = source_b(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_b"))
    return per_cls.crossJoin(F.broadcast(total_b)).select(
        "cls",
        "n_pairs",
        "n_true_pairs",
        (F.col("n_true_pairs") / F.col("n_pairs")).alias("precision"),
        (F.col("n_true_pairs") / F.col("n_b")).alias("recall"),
    )


@register(
    "er_one_to_one",
    oracle=f"""
        WITH {_SQL_CAND},
        m AS (SELECT c_custkey, b_id, b_truth, score FROM scored
              WHERE score >= {T_MATCH}),
        ranked AS (
            SELECT m.*,
                   row_number() OVER (PARTITION BY c_custkey
                                      ORDER BY score DESC, b_id) AS ra,
                   row_number() OVER (PARTITION BY b_id
                                      ORDER BY score DESC, c_custkey) AS rb
            FROM m)
        SELECT CAST(c_custkey AS BIGINT) AS a_id,
               CAST(b_id AS BIGINT) AS b_id, CAST(score AS DOUBLE) AS score,
               CAST(CASE WHEN b_truth = c_custkey THEN 1 ELSE 0 END AS BIGINT)
                   AS is_true
        FROM ranked WHERE ra = 1 AND rb = 1
    """,
    tags=("er", "window", "matching"),
)
def er_one_to_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy reciprocal-best 1-1 assignment: keep a match pair iff it
    is the best-scoring partner for BOTH sides (ties broken by id).
    Two keyed window ranks — the distributed stand-in for Hungarian
    assignment that every production linker actually ships. Duplicate
    B copies lose here by id tie-break, so each entity keeps one link."""
    cand = candidate_pairs(spark, sf_dir).filter(F.col("score") >= T_MATCH)
    ra = W.partitionBy("c_custkey").orderBy(F.col("score").desc(), F.col("b_id"))
    rb = W.partitionBy("b_id").orderBy(F.col("score").desc(), F.col("c_custkey"))
    return (
        cand.withColumn("ra", F.row_number().over(ra))
        .withColumn("rb", F.row_number().over(rb))
        .filter((F.col("ra") == 1) & (F.col("rb") == 1))
        .select(
            F.col("c_custkey").cast("bigint").alias("a_id"),
            F.col("b_id").cast("bigint"),
            "score",
            F.when(F.col("b_truth") == F.col("c_custkey"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_true"),
        )
    )


# Shared SQL tail: match edges + recursive-CTE connected components
# (reachability -> min reachable id), mirroring dedup/cluster.py.
_SQL_CC = f"""
    m AS (SELECT c_custkey, b_id FROM scored WHERE score >= {T_MATCH}),
    e AS (SELECT c_custkey AS u, b_id AS v FROM m
          UNION SELECT b_id, c_custkey FROM m),
    r AS (SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e) nodes
          UNION
          SELECT e.u, r.lbl FROM e JOIN r ON r.u = e.v),
    labels AS (SELECT u AS node, min(lbl) AS entity_id FROM r GROUP BY u)
"""


@register(
    "er_entity_clusters",
    oracle=f"""
        WITH RECURSIVE {_SQL_CAND},
        {_SQL_CC}
        SELECT CAST(entity_id AS BIGINT) AS entity_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(count(*) FILTER (WHERE node < {_B_OFFSET}) AS BIGINT)
                   AS n_a,
               CAST(count(*) FILTER (WHERE node >= {_B_OFFSET}) AS BIGINT)
                   AS n_b
        FROM labels GROUP BY entity_id
    """,
    tags=("er", "graph", "iterative"),
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the match graph -> one entity id per
    connected component (min member id, i.e. the A key), with member
    counts per source. Duplicate B copies land in the same entity as
    their base copy because both match the same A record — the graph
    step is what turns pairwise linkage into entity IDS."""
    edges = (
        candidate_pairs(spark, sf_dir)
        .filter(F.col("score") >= T_MATCH)
        .select(F.col("c_custkey").alias("doc_a"), F.col("b_id").alias("doc_b"))
    )
    labels = connected_components(edges)
    return labels.groupBy(F.col("label").alias("entity_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.count_if(F.col("node") < _B_OFFSET).cast("bigint").alias("n_a"),
        F.count_if(F.col("node") >= _B_OFFSET).cast("bigint").alias("n_b"),
    ).select(F.col("entity_id").cast("bigint"), "n_members", "n_a", "n_b")


@register(
    "er_golden_record",
    oracle=f"""
        WITH RECURSIVE {_SQL_CAND},
        {_SQL_CC},
        members AS (
            SELECT l.entity_id, r.node, r.name, r.segment, r.acctbal
            FROM labels l JOIN (
                SELECT c_custkey AS node, c_name AS name,
                       c_mktsegment AS segment, c_acctbal AS acctbal
                FROM customer
                UNION ALL
                SELECT b_id, b_name, b_segment, b_acctbal FROM b
            ) r ON r.node = l.node)
        SELECT CAST(entity_id AS BIGINT) AS entity_id,
               min(name) FILTER (WHERE node < {_B_OFFSET}) AS golden_name,
               max(acctbal) AS golden_acctbal,
               min(segment) FILTER (WHERE segment <> 'UNKNOWN')
                   AS golden_segment,
               CAST(count(*) AS BIGINT) AS n_members
        FROM members GROUP BY entity_id
    """,
    tags=("er", "agg", "survivorship"),
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: collapse each entity to ONE golden record with
    explicit, deterministic precedence rules — name from the system of
    record (source A; min as tie-break), balance = max across copies
    (most-recently-credited wins in this feed: the B dup copy carries
    the +1 adjustment), segment = lexicographic-min non-UNKNOWN. The
    MDM 'merge' step, expressed as one grouped aggregate over the
    cluster labels (no per-entity loop).

    One :func:`pinned_sources` materialization serves BOTH the pair
    generation and the survivorship record feed — previously the
    record union re-read customer + rebuilt the B feed on top of
    candidate_pairs' own pins (r11 verdict #5: 3 customer-projection
    scans -> 1 materialization per side)."""
    a, b = pinned_sources(spark, sf_dir)
    edges = (
        candidate_pairs(spark, sf_dir, a=a, b=b)
        .filter(F.col("score") >= T_MATCH)
        .select(F.col("c_custkey").alias("doc_a"), F.col("b_id").alias("doc_b"))
    )
    labels = connected_components(edges).select(
        "node", F.col("label").alias("entity_id")
    )
    recs = a.select(
        F.col("c_custkey").alias("node"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    ).unionAll(
        b.select(
            F.col("b_id").alias("node"),
            F.col("b_name").alias("name"),
            F.col("b_segment").alias("segment"),
            F.col("b_acctbal").alias("acctbal"),
        )
    )
    return (
        labels.join(recs, "node")
        .groupBy("entity_id")
        .agg(
            F.min(F.when(F.col("node") < _B_OFFSET, F.col("name"))).alias(
                "golden_name"
            ),
            F.max("acctbal").alias("golden_acctbal"),
            F.min(F.when(F.col("segment") != "UNKNOWN", F.col("segment"))).alias(
                "golden_segment"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
        .select(
            F.col("entity_id").cast("bigint"),
            "golden_name",
            "golden_acctbal",
            "golden_segment",
            "n_members",
        )
    )
