"""Deterministic sampling operators (training-data pipeline extension).

`df.sample()` is seed-dependent on partitioning, so it can never be
oracle-checked and — worse for a pipeline — never reproduced across
reshards. Production data pipelines sample by *hashing a stable key*
instead: the sample is a pure function of the row, independent of
partition layout, cluster size, or execution order, and composable
(the 5% sample of shard A plus shard B == 5% sample of A union B).

Here the hash is Knuth's multiplicative scheme on the integer key
(exactly expressible in both engines); for string/arbitrary keys the
production form is `pmod(xxhash64(key), 1000) < rate` — same algebra,
engine-native hash. The key is folded mod 2^31 BEFORE the multiply
(round-8 int-product lint): a bare key * 2654435761 left int64 at key
~3.5e9 — ANSI exception territory at 100 TB id spaces — while
(key % 2^31) * 2654435761 <= 5.7e18 < 2^63 for ANY key, and is the
identity transform for every key below 2^31 (all current testdata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative hash
KEY_FOLD = 1 << 31  # pre-reduction keeping key*KNUTH inside int64 for any key


def knuth_sql(key_expr: str) -> str:
    """DuckDB/ANSI form of the overflow-safe Knuth hash (nonneg keys)."""
    return f"((({key_expr}) % {KEY_FOLD}) * {KNUTH})"


def knuth_col(key: Column) -> Column:
    """Spark form; bit-identical to knuth_sql for nonnegative keys."""
    return (key % F.lit(KEY_FOLD)) * F.lit(KNUTH)


@register(
    "sample_hash",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE {knuth_sql('o_orderkey')} % 1000 < 50
    """,
    tags=("sampling",),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample: partition-layout-independent, reproducible,
    and pushed down to the scan (a plain comparison predicate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(knuth_col(F.col("o_orderkey")) % 1000 < 50).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "sample_stratified_hash",
    oracle=f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE {knuth_sql('o_orderkey')} % 1000 <
              CASE o_orderstatus WHEN 'F' THEN 20 WHEN 'O' THEN 50 ELSE 200 END
    """,
    tags=("sampling",),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-stratum rates (the
    `sampleBy` semantics) with the same hash scheme, so each stratum's
    sample is independently reproducible. The whole predicate is a scan
    filter: no shuffle, no per-stratum passes."""
    orders = load_table(spark, sf_dir, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "F", 20)
        .when(F.col("o_orderstatus") == "O", 50)
        .otherwise(200)
    )
    return orders.filter(knuth_col(F.col("o_orderkey")) % 1000 < rate).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


SPLIT_SALT = 7  # decorrelates the split hash from any other sampling hash


@register(
    "sample_split_train_test",
    oracle=f"""
        SELECT doc_id, source,
               CASE WHEN {knuth_sql(f'doc_id + {SPLIT_SALT}')} % 1000 < 800 THEN 'train'
                    WHEN {knuth_sql(f'doc_id + {SPLIT_SALT}')} % 1000 < 900 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    tags=("sampling", "pipeline"),
)
def sample_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: a pure function
    of the document key, so the split survives reshards, incremental
    appends, and engine changes — and a doc can never leak across splits
    between pipeline runs. Zero shuffle: the label is a scan-side
    expression. The salt decorrelates it from other hash-sampling ops on
    the same key."""
    docs = load_table(spark, sf_dir, "documents")
    b = knuth_col(F.col("doc_id") + SPLIT_SALT) % 1000
    return docs.select(
        "doc_id",
        "source",
        F.when(b < 800, "train").when(b < 900, "val").otherwise("test").alias("split"),
    )


# target keep-rates per mille for the corpus mixture (default: downsample)
MIX_RATES = {"src0": 1000, "src1": 700, "src2": 400}
MIX_DEFAULT_RATE = 150


@register(
    "corpus_mix_weighted",
    oracle=f"""
        SELECT source,
               count(*) AS n_kept,
               CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS chars_kept
        FROM documents
        WHERE {knuth_sql('doc_id')} % 1000 <
              CASE source WHEN 'src0' THEN {MIX_RATES['src0']}
                          WHEN 'src1' THEN {MIX_RATES['src1']}
                          WHEN 'src2' THEN {MIX_RATES['src2']}
                          ELSE {MIX_DEFAULT_RATE} END
        GROUP BY source
    """,
    tags=("sampling", "pipeline"),
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing — the LLM-pretraining 'data recipe' op:
    per-source target rates (upweight curated sources, downsample the
    crawl) applied as deterministic hash sampling, so the mixture is
    exactly reproducible and composes across incremental ingests. The
    whole recipe is one scan predicate (no shuffle until the reporting
    agg); changing weights re-selects supersets/subsets, never a
    disjoint re-roll."""
    from cdc_export_system_spark.registry import dsum

    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("source") == "src0", MIX_RATES["src0"])
    for s, r in list(MIX_RATES.items())[1:]:
        rate = rate.when(F.col("source") == s, r)
    rate = rate.otherwise(MIX_DEFAULT_RATE)
    return (
        docs.filter(knuth_col(F.col("doc_id")) % 1000 < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            dsum(F.col("n_chars").cast("double"), "chars_kept"),
        )
    )


# per-group deterministic sample size
GROUP_SAMPLE_K = 25


@register(
    "sample_uniform_per_group",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
        SELECT doc_id, source, n_chars FROM r WHERE rk <= {GROUP_SAMPLE_K}
    """,
    tags=("sampling", "pipeline"),
)
def sample_uniform_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source uniform sample, the distributed reservoir:
    rank by a keyed hash (md5 of the key — identical bytes in both
    engines) inside each source and keep the first k. Deterministic and
    reshard-invariant where rand()-based reservoirs are neither; one
    shuffle on source. At 100 TB the win is the same as window_topk:
    per-partition partial top-k before the exchange (Spark's WindowExec
    with a rank filter prunes via TopK pushdown under AQE), so the wire
    carries ~k rows per task, not the group."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("doc_id", "source", "n_chars")
    )


TOKEN_BUDGET = 3000  # greedy prefix budget for the registered demo


@register(
    "corpus_token_budget_sample",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY k, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS before
            FROM d)
        SELECT doc_id, n_tokens,
               CAST(before + n_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE before < {TOKEN_BUDGET}
    """,
    tags=("sampling", "text", "pipeline"),
)
def corpus_token_budget_sample(
    spark: SparkSession, sf_dir: str, token_budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Draw a corpus sample that hits a TOKEN budget, not a document
    count — the shape every pretraining data recipe needs ("give me
    3,000 tokens of this source"): documents are taken greedily in a
    deterministic pseudo-random order (md5 of doc_id — engine-portable,
    unlike xxhash64) until the running token total crosses the budget;
    the crossing document is included, so the sample always covers the
    budget. Selection depends only on (hash, doc_id) — reproducible
    across runs, partitionings, and engines.

    Scale: token counts are row-local; the running total rides the
    ranks.py two-level prefix-sum (range shuffle on the hash order +
    broadcast range offsets) — no global-window single-partition sort.
    The budget filter then prunes to the sample; at 100 TB this reads
    every doc's token COUNT but never moves document text."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    # one documents scan: the (id, count, hash) projection is a few
    # bytes/doc; materializing it keeps the prefix-sum branches off the
    # text column entirely
    docs = docs.localCheckpoint(eager=True)
    c = with_prefix_sum(docs, [F.asc("k"), F.asc("doc_id")], ["n_tokens"], suffix="_b",
                        materialize=False)
    return (
        c.filter(F.col("n_tokens_b") < token_budget)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens_b") + F.col("n_tokens")).alias("cum_tokens"),
        )
    )


# target token shares for the curated training mix; sources not listed
# are excluded from the mix (the inner join below is the curation gate)
MIX_TARGET_PERMILLE = {"src0": 400, "src1": 300, "src2": 200, "src3": 50, "src4": 50}


@register(
    "corpus_upsample_weights",
    oracle=f"""
        WITH tok AS (
            SELECT source,
                   SUM(CAST(len(string_split(text, ' ')) AS HUGEINT)) AS n_tokens
            FROM documents GROUP BY source),
        tot AS (SELECT SUM(n_tokens) AS total FROM tok),
        tgt AS (
            SELECT * FROM (VALUES
                {", ".join(f"('{s}', {p})" for s, p in sorted(MIX_TARGET_PERMILLE.items()))}
            ) AS t(source, target_permille))
        SELECT k.source, CAST(k.n_tokens AS BIGINT) AS n_tokens,
               floor(CAST(CAST(k.n_tokens AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(t.total AS VARCHAR) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS natural_share,
               CAST(g.target_permille AS DOUBLE) / 1000 AS target_share,
               floor(CAST(g.target_permille AS DOUBLE) / 1000
                     / (CAST(CAST(k.n_tokens AS VARCHAR) AS DOUBLE)
                        / CAST(CAST(t.total AS VARCHAR) AS DOUBLE))
                     * 1000000 + 0.5) / 1000000 AS weight
        FROM tok k
        JOIN tgt g ON g.source = k.source
        CROSS JOIN tot t
    """,
    tags=("sampling", "text", "pipeline"),
)
def corpus_upsample_weights(
    spark: SparkSession,
    sf_dir: str,
    mix_target_permille: dict[str, int] | None = None,
) -> DataFrame:
    """Per-source up/down-sampling weights that turn the corpus's natural
    token mix into a TARGET mix — the number every data-mixing recipe
    (epochs per source) is derived from: weight = target_share /
    natural_share, so weight > 1 means the source repeats (epochs) and
    weight < 1 means it subsamples. Token counts are exact integers;
    shares and weights are single divides of exact ints rounded at 1e-6
    with the identical expression tree in both engines.

    Scale: ONE corpus scan reducing to |sources| rows of token totals
    (map-side combined); the target table is a literal broadcast. The
    weights feed sample_hash-style deterministic application (weight<1 ⇒
    hash-threshold subsample; weight>1 ⇒ floor(w) epochs + fractional
    hash-threshold tail) without ever re-scanning this rollup.

    ``mix_target_permille`` overrides the curated target mix (source ->
    permille of the final token budget; unlisted sources are excluded);
    the registered query binds the oracle-matched default table."""
    if mix_target_permille is None:
        mix_target_permille = MIX_TARGET_PERMILLE
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        # operand cast BEFORE the sum: DECIMAL(38,0) accumulator (token
        # totals at 100 TB genuinely exceed what a bigint would hold only
        # in pathological cases, but the oracle sums over HUGEINT and the
        # documented contract is decimal headroom end-to-end)
        F.sum(F.size(F.split(F.col("text"), " ")).cast("decimal(38,0)"))
        .alias("n_tokens")
    )
    tot = tok.agg(F.sum("n_tokens").alias("total"))
    tgt = docs.sparkSession.createDataFrame(
        sorted(mix_target_permille.items()), "source string, target_permille int"
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    nat = F.col("n_tokens").cast("double") / F.col("total").cast("double")
    tshare = F.col("target_permille").cast("double") / 1000
    return (
        tok.join(F.broadcast(tgt), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            r6(nat).alias("natural_share"),
            tshare.alias("target_share"),
            r6(tshare / nat).alias("weight"),
        )
    )


SHARD_TOKEN_BUDGET = 600  # tokens per output shard for the registered demo


@register(
    "corpus_shard_assignment",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY k, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS before
            FROM d)
        SELECT CAST(before // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id,
               count(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        FROM c GROUP BY before // {SHARD_TOKEN_BUDGET}
    """,
    tags=("sampling", "text", "pipeline", "layout"),
)
def corpus_shard_assignment(
    spark: SparkSession, sf_dir: str, shard_token_budget: int = SHARD_TOKEN_BUDGET
) -> DataFrame:
    """Greedy contiguous token-balanced sharding: documents are laid out
    in the deterministic hash order (md5 of doc_id — the same
    engine-portable order as corpus_token_budget_sample) and cut into
    shards of ~shard_token_budget tokens (shard = exclusive-prefix div
    budget, so a document spanning a boundary belongs to the shard its
    start falls in). This is the writer-side plan every training-data
    exporter needs — equal-token shards, not equal-document shards, so
    downstream readers get balanced work. Output is the per-shard
    rollup (id, docs, exact token total); the row-level assignment is
    the same frame before the rollup.

    Scale: token counts are row-local; the running total rides the
    ranks.py two-level prefix sum (range shuffle + broadcast offsets —
    no single-partition sort); the rollup is map-side combined. The
    hash order also means shard contents are reproducible across runs
    and engines."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    docs = docs.localCheckpoint(eager=True)  # one scan; bytes/doc projection
    c = with_prefix_sum(
        docs, [F.asc("k"), F.asc("doc_id")], ["n_tokens"], suffix="_b",
        materialize=False,
    )
    return (
        c.select(
            F.expr(f"n_tokens_b div {shard_token_budget}").alias("shard_id"),
            "n_tokens",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_importance_resample (DSIR)
# ---------------------------------------------------------------------------

DSIR_TARGET = "src0"  # the target-domain slice the selection aims to match
DSIR_K = 100  # documents to select
DSIR_SALT = 60013  # decorrelates the Gumbel hash from every other sampling op


@register(
    "corpus_importance_resample",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents),
        t AS (SELECT * FROM tok WHERE token <> ''),
        vocab AS (
            SELECT token,
                   SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS tf_t,
                   SUM(CASE WHEN source <> '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS tf_c
            FROM t GROUP BY token),
        tot AS (
            SELECT SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS nt,
                   SUM(CASE WHEN source <> '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS nc,
                   (SELECT count(*) FROM vocab) AS v
            FROM t),
        term AS (
            SELECT t.doc_id, t.pos,
                   ln(CAST(vocab.tf_t + 1 AS DOUBLE))
                   - ln(CAST(vocab.tf_c + 1 AS DOUBLE)) AS term
            FROM t JOIN vocab ON t.token = vocab.token
            WHERE t.source <> '{DSIR_TARGET}'),
        d AS (
            SELECT doc_id, count(*) AS n_tokens,
                   list_aggregate(list(term ORDER BY pos), 'sum') AS s
            FROM term GROUP BY doc_id),
        keyed AS (
            SELECT d.doc_id, d.n_tokens,
                   d.s + CAST(d.n_tokens AS DOUBLE)
                         * (ln(CAST(tot.nc + tot.v AS DOUBLE))
                            - ln(CAST(tot.nt + tot.v AS DOUBLE))) AS log_w,
                   -ln(-ln(({knuth_sql(f'd.doc_id + {DSIR_SALT}')} % 10000 + 0.5)
                           / 10000)) AS g
            FROM d CROSS JOIN tot)
        SELECT doc_id, n_tokens,
               floor(log_w * 1000000000 + 0.5) / 1000000000 AS log_w,
               floor((log_w + g) * 1000000000 + 0.5) / 1000000000 AS sel_key
        FROM keyed
        ORDER BY log_w + g DESC, doc_id
        LIMIT {DSIR_K}
    """,
    tags=("sampling", "pipeline", "text"),
)
def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    pick the K out-of-domain documents whose token distribution best
    matches a target domain, by importance weight under add-one-smoothed
    unigram LMs of target vs corpus, sampled without replacement via the
    Gumbel-top-k trick. The Gumbel noise here is DETERMINISTIC (the
    repo's Knuth-hash uniform fed through -ln(-ln(u))), which makes the
    selection a pure function of the data — reproducible across
    reshards and oracle-checkable, the same discipline as sample_hash.

    Exactness: tf/N/V are exact ints; each token's term is
    ln(tf_t+1)-ln(tf_c+1) (bit-identical across engines); the per-doc
    sum folds in TOKEN-POSITION order (array_sort fold here, list(ORDER
    BY pos) there) pinning float accumulation order; the top-k carries a
    doc_id tiebreak.

    Scale: one |vocab| aggregate (map-side combined), vocab broadcast
    back onto the token stream, one |tokens|->|docs| keyed reduce, then
    a distributed TakeOrderedAndProject for the top-k — no global sort,
    no all-pairs, nothing driver-side beyond the 3 scalar totals. This
    is the n-gram-hash variant of the DSIR paper's pipeline (their
    hashed-ngram features; unigrams here) and the natural pretraining
    data-mixing companion to corpus_token_budget_sample."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    is_t = F.col("source") == DSIR_TARGET
    vocab = tok.groupBy("token").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("tf_t"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("tf_c"),
    )
    totals = vocab.agg(
        F.sum("tf_t").alias("nt"), F.sum("tf_c").alias("nc"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    # Empty corpus: the sums are NULL and v == 0 — every downstream frame
    # is already empty, so only the scalar coercion needs the guard.
    nt = int(totals["nt"] or 0)
    nc = int(totals["nc"] or 0)
    v = int(totals["v"] or 0)
    if v == 0:
        # log(nt+v) would be log(0); short-circuit to the (empty) keyed shape.
        return tok.select(
            F.col("doc_id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("log_w"),
            F.lit(0.0).alias("sel_key"),
        ).limit(0)

    term = (
        tok.filter(~is_t)
        .join(F.broadcast(vocab), "token")
        .select(
            "doc_id",
            "pos",
            (
                F.log((F.col("tf_t") + 1).cast("double"))
                - F.log((F.col("tf_c") + 1).cast("double"))
            ).alias("term"),
        )
    )
    d = term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("s"),
    )
    log_w = F.col("s") + F.col("n_tokens").cast("double") * (
        F.log(F.lit(float(nc + v))) - F.log(F.lit(float(nt + v)))
    )
    u01 = (knuth_col(F.col("doc_id") + DSIR_SALT) % 10000 + 0.5) / 10000
    g = -F.log(-F.log(u01))
    keyed = d.select(
        "doc_id",
        "n_tokens",
        log_w.alias("log_w_raw"),
        (log_w + g).alias("key_raw"),
    )
    r9 = lambda c: F.floor(c * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000  # noqa: E731
    return (
        keyed.orderBy(F.col("key_raw").desc(), "doc_id")
        .limit(DSIR_K)
        .select(
            "doc_id",
            "n_tokens",
            r9(F.col("log_w_raw")).alias("log_w"),
            r9(F.col("key_raw")).alias("sel_key"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_interleave_order
# ---------------------------------------------------------------------------


@register(
    "corpus_interleave_order",
    oracle="""
        WITH r AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS within_rank
            FROM documents)
        SELECT doc_id, source, within_rank,
               row_number() OVER (ORDER BY within_rank, source, doc_id)
                   AS global_order
        FROM r
    """,
    tags=("corpus", "sampling", "window"),
)
def corpus_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-ORDER INTERLEAVE: the deterministic round-robin mix that
    spreads every source evenly through the training stream (epoch
    position = take each source's next-best doc in turn) — the standard
    defense against source-ordered parquet producing a curriculum
    nobody chose. Docs rank within their source (longest first, the
    simple quality proxy; swap in text_quality_score upstream), and the
    global order sorts by (within_rank, source, doc_id): row 1 of every
    source, then row 2, and so on. Fully deterministic integers.

    Scale: one source-keyed window, then the global position comes from
    the two-level range row-number construction (ranks.py) — a total
    order WITHOUT a single-partition sort, which is exactly what a 100
    TB 'write the corpus in training order' job needs; the oracle's
    bare row_number() OVER (ORDER BY ...) is the single-node rendering
    of the same total order."""
    from cdc_export_system_spark.operators.ranks import with_global_row_number

    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        )
        .cast("bigint")
        .alias("within_rank"),
    )
    out = with_global_row_number(
        r,
        [F.asc("within_rank"), F.asc("source"), F.asc("doc_id")],
        out="global_order",
    )
    return out.select(
        "doc_id",
        "source",
        "within_rank",
        F.col("global_order").cast("bigint").alias("global_order"),
    )


# ---------------------------------------------------------------------------
# corpus_temperature_weights
# ---------------------------------------------------------------------------

MIX_TEMPERATURE_ALPHA = 0.3  # XLM-R's multilingual sampling exponent


@register(
    "corpus_temperature_weights",
    oracle=f"""
        WITH s AS (
            SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
            FROM documents GROUP BY source),
        tt AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM s),
        sx AS (
            SELECT s.source, s.mass,
                   CAST(s.mass AS DOUBLE) / tt.total AS p
            FROM s CROSS JOIN tt),
        z AS (
            SELECT list_aggregate(
                       list_transform(list(p ORDER BY source),
                                      x -> pow(x, {MIX_TEMPERATURE_ALPHA})),
                       'sum') AS z
            FROM sx)
        SELECT sx.source, sx.mass,
               floor(sx.p * 1000000 + 0.5) / 1000000 AS share,
               floor(pow(sx.p, {MIX_TEMPERATURE_ALPHA}) / z.z * 1000000 + 0.5)
                   / 1000000 AS temp_share,
               floor(pow(sx.p, {MIX_TEMPERATURE_ALPHA}) / z.z / sx.p
                     * 1000000 + 0.5) / 1000000 AS weight
        FROM sx CROSS JOIN z
    """,
    tags=("corpus", "sampling"),
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE SAMPLING weights (the mBERT/XLM-R multilingual
    balancing rule): target share q_i is proportional to p_i^alpha with
    alpha < 1, flattening the natural mix so low-resource sources
    repeat and the crawl head shrinks — unlike corpus_upsample_weights,
    which needs a hand-written target mix, the recipe here DERIVES from
    the corpus itself with one knob. The normalizer Z = sum p^alpha
    folds over the SOURCE-SORTED share list (the agg_entropy
    order-pinning trick) so the only float accumulation has one fixed
    order in both engines; outputs round at 1e-6.

    Scale: one groupBy source over the scan, then everything is
    |sources|-row arithmetic with a 1-row (total, Z) broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    ).localCheckpoint(eager=True)
    tot = s.agg(F.sum("mass").cast("bigint").alias("total"))
    st = s.crossJoin(F.broadcast(tot))
    z = st.agg(
        F.max("total").alias("total"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("source", F.col("mass").cast("double").alias("mass"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + F.pow(
                x["mass"] / F.col("total").cast("double"),
                F.lit(MIX_TEMPERATURE_ALPHA),
            ),
        ).alias("z"),
    )
    p = F.col("mass").cast("double") / F.col("total")
    q = F.pow(p, F.lit(MIX_TEMPERATURE_ALPHA)) / F.col("z")
    mic = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return s.crossJoin(F.broadcast(z)).select(
        "source",
        "mass",
        mic(p).alias("share"),
        mic(q).alias("temp_share"),
        mic(q / p).alias("weight"),
    )
