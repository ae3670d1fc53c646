"""Deduplication operators (SURVEY.md §2.10 + north-star extensions).

Reference trace: the unique email constraint + ON CONFLICT DO NOTHING
ingest (reference: app/models.py:11, app/seed_users.py:42) — first-wins
keyed dedup. Extended with the LLM-pipeline family; the heavier
similarity-based members (MinHash/LSH, SimHash, n-gram Jaccard) live in
sibling modules and register their own queries.

Determinism convention: "keep the first row" is implemented as min(key)
per group — dropDuplicates() keeps an arbitrary row per partition-order,
which can't be oracle-checked, so the engine's canonical keyed dedup is
the aggregate form (same one-shuffle cost, deterministic winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import REGISTRY, register


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY md5(lower(trim(text)))
    """,
    headline=True,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on the normalized fingerprint.
    One shuffle on the 32-byte digest, never on the document text — at
    100 TB the exchange carries fingerprints, not payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_upsert_key",
    oracle="""
        SELECT source, min(doc_id) AS doc_id
        FROM documents GROUP BY source
    """,
    tags=("dedup",),
)
def dedup_upsert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins keyed dedup — the ON CONFLICT DO NOTHING ingest semantics
    (app/seed_users.py:42), with min(id) as the deterministic 'first'."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(F.min("doc_id").alias("doc_id"))


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT * FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   floor(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                         / (sqrt(list_aggregate(list_transform(a.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                            * sqrt(list_aggregate(list_transform(b.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                         * 1000000 + 0.5) / 1000000 AS cos_sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE cos_sim >= 0.4
    """,
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label so the pairwise
    comparison runs within blocks only (the embedding analogue of LSH
    bucketing; swap the label for an LSH bucket id for unlabeled data —
    similarity.lsh provides exactly that bucketer). The label alone is
    ~10 join keys, i.e. ~10 reduce tasks for a pair stream quadratic in
    label size (the round-7 10x run measured 598 s through that
    bottleneck) — triangle sub-blocking inside each label spreads every
    label's pairs over B(B+1)/2 tasks with an identical result set
    (ids canonicalized; cosine is symmetric)."""
    from cdc_export_system_spark.similarity.queries import (
        cosine,
        triangle_pair_filter,
        triangle_sides,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ta, tb = triangle_sides(
        emb.select("vec_id", "label", "embedding"), "vec_id",
        extra_keys=("label",),
    )
    a = ta.select(
        "label", "_tj", "_blk_a",
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
    )
    b = tb.select(
        "label", "_tj", "_blk_b",
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
    )
    sim = F.floor(cosine(F.col("ea"), F.col("eb")) * 1_000_000 + F.lit(0.5)) / 1_000_000
    return (
        a.join(b, ["label", "_tj"])
        .filter(triangle_pair_filter())
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
    )


def _emb_lsh_oracle() -> str:
    from cdc_export_system_spark.similarity.lsh import _sql_bucket

    return f"""
        SELECT * FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   floor(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                         / (sqrt(list_aggregate(list_transform(a.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                            * sqrt(list_aggregate(list_transform(b.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                         * 1000000 + 0.5) / 1000000 AS cos_sim
            FROM embeddings a JOIN embeddings b
              ON {_sql_bucket("a.embedding")} = {_sql_bucket("b.embedding")}
             AND a.vec_id < b.vec_id
        ) WHERE cos_sim >= 0.4
    """


@register(
    "dedup_embedding_lsh",
    oracle=_emb_lsh_oracle(),
    tags=("dedup", "similarity", "lsh"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding_cosine for UNLABELED corpora: the blocking key is
    the sign-LSH bucket (similarity.lsh, same 8 frozen hyperplanes as
    the search path) instead of a label column. The self-join shuffles
    on the 2^B bucket ids — pairwise work is within-bucket only, never
    corpus x corpus. Recall note: radius-0 blocking misses near-dups
    whose signs differ on >=1 plane; raise B with multiple tables or
    band the bits (dedup/minhash.py's banding) when recall matters more
    than cost. A skewed bucket (mass near one hyperplane cell) is the
    LSH analogue of a hot key — salt it or split planes, same remedy as
    any skewed join."""
    from cdc_export_system_spark.similarity.lsh import bucket_id
    from cdc_export_system_spark.similarity.queries import cosine

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_id(F.col("embedding"))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("bucket").alias("ba"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bb"), F.col("embedding").alias("eb")
    )
    sim = F.floor(cosine(F.col("ea"), F.col("eb")) * 1_000_000 + F.lit(0.5)) / 1_000_000
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )


@register(
    "dedup_latest_per_key",
    oracle="""
        SELECT user_id, event_id, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("dedup", "cdc", "window"),
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog collapse: latest state per key (reference README:335 —
    'only the latest state of each row is exported')."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


@register(
    "dedup_keep_best",
    oracle="""
        SELECT doc_id, lang, n_chars FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY md5(lower(trim(text)))
            ORDER BY n_chars DESC, doc_id) = 1
    """,
    tags=("dedup", "window"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection: group exact duplicates by content
    fingerprint (md5 of normalized text) and keep the highest-quality
    member (longest, doc_id tie-break). The partition key is the 128-bit
    digest, so the shuffle distributes uniformly even when one document
    dominates the corpus; payload text rides the exchange once."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    w = W.partitionBy(fp).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (north-star extension; cf. PAPERS.md — standard
# LLM-pretraining hygiene: drop training docs sharing a long n-gram with the
# held-out eval set).

DECON_NGRAM = 8  # long n-grams: common phrases don't false-positive
DECON_EVAL_PERMILLE = 20  # the deterministic 2% "benchmark" slice

_DUCK_TOKS8 = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_DUCK_NGRAMS8 = (
    f"CASE WHEN len({_DUCK_TOKS8}) < {DECON_NGRAM}"
    f" THEN [array_to_string({_DUCK_TOKS8}, ' ')]"
    f" ELSE list_distinct(list_transform("
    f"      range(1, len({_DUCK_TOKS8}) - {DECON_NGRAM} + 2),"
    f"      i -> array_to_string({_DUCK_TOKS8}[i:i+{DECON_NGRAM}-1], ' '))) END"
)


def _rotl_term(arr: str, idx: str, k: int) -> str:
    """SQL text for rotl({arr}[{idx}+k], 13k mod 64) — the per-offset
    rotation of the gram-hash combine (13 coprime to 64 ⇒ distinct
    rotations for every offset < 64). Shared with dedup/substring.py's
    collision contract."""
    r = (13 * k) % 64
    cell = f"{arr}[{idx} + {k}]"
    if r == 0:
        return cell
    return f"(shiftleft({cell}, {r}) | shiftrightunsigned({cell}, {64 - r}))"


# n-gram KEYS without gram strings: hash each token once, xor-combine
# per-offset rotations over the window (short docs fold the whole hash
# array with a rotating accumulator). Same round-3 goal — 8-byte probe
# keys — but the ~50-byte gram string now never exists at all (round 4;
# isolated A/B at sf0.1: 0.87 -> 0.77 s, hits identical).
_SPARK_NGRAM_HASHES8 = (
    f"CASE WHEN size(h) < {DECON_NGRAM}"
    f" THEN array(aggregate(h, cast(0 as bigint),"
    f"      (acc, x) -> (shiftleft(acc, 13) | shiftrightunsigned(acc, 51)) ^ x))"
    f" ELSE array_distinct(transform(sequence(1, size(h) - {DECON_NGRAM} + 1),"
    f"      i -> "
    + " ^ ".join(_rotl_term("h", "i - 1", k) for k in range(DECON_NGRAM))
    + ")) END"
)


def _decon_gram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, gh): the distinct-per-doc hashed n-gram stream both
    decontaminate variants probe on."""
    th = docs.select(
        "doc_id",
        F.expr(r"transform(split(lower(trim(text)), '\\s+'), x -> xxhash64(x))")
        .alias("h"),
    )
    return th.select("doc_id", F.explode(F.expr(_SPARK_NGRAM_HASHES8)).alias("gh"))


@register(
    "corpus_decontaminate",
    oracle=f"""
        WITH ng AS (SELECT doc_id, {_DUCK_NGRAMS8} AS ngrams FROM documents),
        ex AS (SELECT doc_id, unnest(ngrams) AS g FROM ng),
        eval_g AS (SELECT DISTINCT g FROM ex
                   WHERE ((doc_id % 2147483648) * 2654435761) % 1000
                         < {DECON_EVAL_PERMILLE})
        SELECT ex.doc_id, count(*) AS n_hits
        FROM ex JOIN eval_g ON ex.g = eval_g.g
        WHERE ((ex.doc_id % 2147483648) * 2654435761) % 1000 >= {DECON_EVAL_PERMILLE}
        GROUP BY ex.doc_id
    """,
    headline=True,
    tags=("dedup", "pipeline", "text"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    8-token n-gram with the (deterministic-hash-sampled) eval slice.
    The eval n-gram set is tiny relative to the corpus — broadcast it,
    so the training scan never shuffles: flagging is a map-side semi
    join probing a hashed set of eval n-grams. Long n-grams keep the
    false-positive rate near zero (a shared 8-gram is quotation, not
    coincidence). Returns flagged doc_ids + hit counts; the clean
    corpus is the anti-join complement of this result.

    The probe keys are hashed n-grams built FROM per-token hashes
    (_SPARK_NGRAM_HASHES8): the ~50-byte gram string never exists — each
    token is xxhash64'd once and the window key is a bitwise rotation
    combine — so the eval-distinct exchange, the broadcast table, and
    the probe all carry 8-byte longs (same accepted ~2^-64 collision
    contract as the MinHash band digest — a collision adds one spurious
    hit)."""
    from cdc_export_system_spark.io.sources import load_table_fanned
    from cdc_export_system_spark.operators.sampling import knuth_col

    # fanned: the n-gram build is the CPU wall on a small single-split
    # scan (no-op at warehouse scale, io/sources.py:fan_out)
    docs = load_table_fanned(spark, sf_dir, "documents")
    ex = _decon_gram_hashes(docs)
    is_eval = knuth_col(F.col("doc_id")) % 1000 < DECON_EVAL_PERMILLE
    eval_g = ex.filter(is_eval).select("gh").distinct()
    return (
        ex.filter(~is_eval)
        .join(F.broadcast(eval_g), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


_DECON_ORACLE = REGISTRY["corpus_decontaminate"].oracle


@register(
    "corpus_decontaminate_bloom",
    oracle=_DECON_ORACLE,
    tags=("dedup", "pipeline", "text", "bloom"),
)
def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_decontaminate's 100 TB fallback: when the distinct eval
    n-gram set outgrows executor memory (corpus_decontaminate broadcasts
    it verbatim), summarize it as a fixed-8 KB bloom bitmap
    (operators/bloom_join.py) probed map-side over the training n-gram
    stream, then run the exact join only on the bloom survivors. False
    positives cost shuffled candidate rows, never correctness — the
    exact join rechecks them — so the result (and oracle) is identical
    to corpus_decontaminate. The verify join is SHUFFLE_HASH-hinted (not
    broadcast): in the regime where this variant matters the eval set
    doesn't fit in memory — an un-hinted join lets Catalyst broadcast it
    at test scale, which would silently revert to the plan this variant
    exists to avoid (pinned in tests/test_plan_quality.py). The
    survivor-side shuffle it pays instead is proportional to the (tiny)
    true-hit + false-positive volume, since the bloom probe runs
    map-side below the exchange."""
    from cdc_export_system_spark.operators.bloom_join import (
        bloom_build,
        bloom_might_contain,
    )
    from cdc_export_system_spark.operators.sampling import knuth_col

    docs = load_table(spark, sf_dir, "documents")
    ex = _decon_gram_hashes(docs)
    is_eval = knuth_col(F.col("doc_id")) % 1000 < DECON_EVAL_PERMILLE
    eval_g = ex.filter(is_eval).select("gh").distinct()
    bitmap = bloom_build(eval_g, "gh")
    return (
        ex.filter(~is_eval)
        .filter(bloom_might_contain(bitmap, "gh"))
        .join(eval_g.hint("shuffle_hash"), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


@register(
    "dedup_incremental_batch",
    oracle="""
        WITH fp AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
             batch AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
        SELECT b.fp AS fp, min(b.doc_id) AS accept_doc_id,
               count(*) AS batch_copies
        FROM batch b
        WHERE NOT EXISTS (
            SELECT 1 FROM fp i WHERE i.doc_id % 2 = 0 AND i.fp = b.fp)
        GROUP BY b.fp
    """,
    tags=("dedup", "incremental"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a NEW batch of documents (odd doc_ids
    stand in for today's arrivals) is admitted only where its content
    fingerprint is absent from the already-ingested corpus index (even
    doc_ids), then first-wins deduped *within* the batch — the steady-
    state shape of a production corpus builder, where yesterday's corpus
    is never rescanned as text, only its fingerprint index is probed.

    Scale posture: both sides reduce to 32-byte digests before any
    exchange; the index side arrives pre-distinct (one groupBy on the
    digest), the probe is a LEFT ANTI hash join on the digest, and the
    within-batch collapse rides the same key. At 100 TB the index
    probe is the only large join, and it is exactly the bloom-
    prefilterable shape of join_bloom_prefilter (operators/
    bloom_join.py) when the index outgrows a broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
    index = fp.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()
    batch = fp.filter(F.col("doc_id") % 2 == 1)
    return (
        batch.join(index, "fp", "left_anti")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("accept_doc_id"),
            F.count(F.lit(1)).alias("batch_copies"),
        )
    )


@register(
    "dedup_cross_source_overlap",
    oracle="""
        WITH fps AS (
            SELECT DISTINCT md5(lower(trim(text))) AS fp, source
            FROM documents),
        pairs AS (
            SELECT a.fp, a.source AS source_a, b.source AS source_b
            FROM fps a JOIN fps b
              ON a.fp = b.fp AND a.source < b.source)
        SELECT source_a, source_b, count(*) AS n_shared_fps
        FROM pairs GROUP BY source_a, source_b
    """,
    tags=("dedup", "pipeline", "quality"),
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct content fingerprints appear in BOTH — the first
    question a data-mixing recipe asks (double-counting a crawl that
    two sources both ingested silently upweights it; the overlap matrix
    is what you weight against, and it is the cross-SOURCE sibling of
    corpus_decontaminate's train/eval gate).

    Scale: one fingerprint-only shuffle (the text never moves after the
    row-local md5), sources collapse to a bounded set per fingerprint
    (≤|sources|), and pairs expand inside each group — the corpus is
    never self-joined (the oracle's fps×fps join is the DuckDB check,
    not the plan). Output is |sources|² rows at most."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"), "source")
        .distinct()
    )
    buckets = (
        d.groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(ss, (x, i) ->
                    transform(slice(ss, i + 2, size(ss) - i - 1),
                              y -> struct(x AS source_a, y AS source_b))))
                """
            )
        ).alias("p")
    )
    return (
        pairs.select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


@register(
    "corpus_decontaminate_report",
    oracle=f"""
        WITH hits AS ({_DECON_ORACLE}),
        train AS (
            SELECT doc_id, source FROM documents
            WHERE ((doc_id % 2147483648) * 2654435761) % 1000
                  >= {DECON_EVAL_PERMILLE})
        SELECT t.source,
               count(*) AS n_train_docs,
               CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               CAST(COALESCE(SUM(h.n_hits), 0) AS BIGINT) AS total_hits,
               floor(CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / count(*) * 1000000 + 0.5) / 1000000 AS flag_rate
        FROM train t LEFT JOIN hits h USING (doc_id)
        GROUP BY t.source
    """,
    tags=("dedup", "pipeline", "text", "quality"),
)
def corpus_decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The run-report over corpus_decontaminate: per SOURCE, how many
    training documents exist, how many are contamination-flagged, the
    total n-gram hit count, and the flag rate — the one-page answer to
    'which ingest is leaking the benchmark' that decides whether a
    source is dropped or scrubbed. Composes the flagged set with the
    doc→source dimension and rolls up; sources with zero flags still
    report (LEFT join, CASE-counted).

    Scale: inherits corpus_decontaminate's broadcast-probe shape; the
    additional join keys on doc_id against the flagged set (bounded by
    contamination, typically tiny) and the rollup is |sources| rows."""
    from cdc_export_system_spark.io.sources import load_table as _lt
    from cdc_export_system_spark.operators.sampling import knuth_col

    flagged = corpus_decontaminate(spark, sf_dir)
    train = (
        _lt(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .filter(knuth_col(F.col("doc_id")) % 1000 >= DECON_EVAL_PERMILLE)
    )
    j = train.join(flagged, "doc_id", "left")
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    flagged_n = F.sum(F.col("n_hits").isNotNull().cast("int"))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train_docs"),
        flagged_n.cast("bigint").alias("n_flagged"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).cast("bigint").alias("total_hits"),
        r6(flagged_n.cast("double") / F.count(F.lit(1))).alias("flag_rate"),
    )


@register(
    "pipeline_dedup_funnel",
    oracle=None,  # composed below at import (needs minhash CTE strings)
    tags=("pipeline", "dedup", "minhash", "quality"),
)
def pipeline_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup FUNNEL report: corpus size after each attrition stage —
    raw → exact dedup (first-wins by content fingerprint) → near-dup
    removal (MinHash-verified pairs, keep the lower doc_id) — as
    (stage, n_docs, n_tokens, pct_docs_of_raw) rows. This is the
    one-page number every dedup run is judged by ('we dropped 12% exact
    and another 7% near'), composing dedup_exact and
    dedup_minhash_verified into the accounting view.

    Near-dup drop rule: any doc appearing as doc_b of a verified pair
    (pairs are canonical doc_a < doc_b) is dropped — a deterministic
    per-pair keep-lowest rule. Note this is NOT cluster-keep-min on
    transitively-closed components: a non-min member that only ever
    appears as doc_a survives (pairs (2,4),(3,4) keep both 2 and 3,
    where dedup_cluster_cc's keep-min would keep only 2), so the
    reported near-dup attrition is a lower bound on what the
    component-level policy removes. Scale: inherits the component shapes (fingerprint-only
    shuffle; banded LSH + bounded verify via the materialized signature
    table); the funnel adds three 1-row aggregates and a broadcast of
    the raw total."""
    from cdc_export_system_spark.dedup.minhash import dedup_minhash_verified

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    docs = docs.localCheckpoint(eager=True)  # one scan; three stage consumers
    keep_exact = docs.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    ex = docs.join(keep_exact, "doc_id").select("doc_id", "n_tok")
    drop_near = (
        dedup_minhash_verified(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    nr = ex.join(drop_near, "doc_id", "left_anti")

    def stage(df, ord_, label):
        return df.agg(
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.lit(label).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )

    funnel = (
        stage(docs, 0, "raw")
        .unionAll(stage(ex, 1, "exact_dedup"))
        .unionAll(stage(nr, 2, "near_dedup"))
    )
    raw = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return funnel.crossJoin(F.broadcast(raw)).select(
        "stage_ord",
        "stage",
        "n_docs",
        "n_tokens",
        r6(F.col("n_docs").cast("double") / F.col("n_raw").cast("double")).alias(
            "pct_docs_of_raw"
        ),
    )


def _funnel_oracle() -> str:
    from cdc_export_system_spark.dedup.minhash import (
        JACCARD_THRESHOLD, _sql_band_exprs, _sql_signature_cte,
    )

    return f"""
        WITH {_sql_signature_cte()},
        bands AS ({_sql_band_exprs()}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
        jac AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN tok ta ON ta.doc_id = c.doc_a
            JOIN tok tb ON tb.doc_id = c.doc_b
            WHERE CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
                  / (len(ta.shingles) + len(tb.shingles)
                     - len(list_intersect(ta.shingles, tb.shingles)))
                  >= {JACCARD_THRESHOLD}),
        dropn AS (SELECT DISTINCT doc_b AS doc_id FROM jac),
        dtok AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                 FROM documents),
        fp AS (SELECT md5(lower(trim(text))) AS f, min(doc_id) AS keep
               FROM documents GROUP BY md5(lower(trim(text)))),
        exd AS (SELECT d.doc_id, d.n_tok FROM dtok d
               JOIN fp ON fp.keep = d.doc_id),
        nr AS (SELECT e.doc_id, e.n_tok FROM exd e
               LEFT JOIN dropn dr ON dr.doc_id = e.doc_id
               WHERE dr.doc_id IS NULL),
        raw AS (SELECT count(*) AS n_raw FROM dtok),
        f AS (
            SELECT 0 AS stage_ord, 'raw' AS stage, count(*) AS n_docs,
                   CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens
            FROM dtok
            UNION ALL
            SELECT 1, 'exact_dedup', count(*),
                   CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM exd
            UNION ALL
            SELECT 2, 'near_dedup', count(*),
                   CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM nr)
        SELECT CAST(f.stage_ord AS INTEGER) AS stage_ord, f.stage, f.n_docs,
               f.n_tokens,
               floor(CAST(f.n_docs AS DOUBLE) / CAST(r.n_raw AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS pct_docs_of_raw
        FROM f CROSS JOIN raw r
    """


# bind the composed oracle post-definition (the minhash CTE builders are
# import-time siblings; registering inline would create an import cycle)
REGISTRY["pipeline_dedup_funnel"].oracle = _funnel_oracle()
