"""Text analysis over the documents table (north-star extension ops:
language-ID, quality scoring, token counting, fingerprinting).

The reference has no text surface (BASELINE.json north_star mandates
these). Everything here is built-in column expressions — split/filter/
regexp run inside whole-stage codegen, so at 100 TB this is a pure scan
pipeline with no Python in the hot path and no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table, load_table_fanned
from cdc_export_system_spark.registry import register

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Order matters: ties resolve in this priority order.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ein", "zu", "mit"],
    "es": ["el", "la", "de", "y", "que", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
}

# A BPE-ish pre-tokenizer: word pieces, digit runs, single punctuation.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


def _stop_count(toks: Column, words: list[str]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(__toks, t -> t IN ({lst})))")


def _sql_stop_count(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t IN ({lst})))"


@register(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_ish,
               CAST(length(text) AS INTEGER) AS n_chars_computed
        FROM documents
    """,
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        # F.lit pattern, not an expr string: SQL string literals eat backslashes
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias("n_bpe_ish"),
        F.length("text").alias("n_chars_computed"),
    )


@register(
    "text_lang_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_stop_count(STOPWORDS['en'])} AS sc_en,
                   {_sql_stop_count(STOPWORDS['de'])} AS sc_de,
                   {_sql_stop_count(STOPWORDS['es'])} AS sc_es,
                   {_sql_stop_count(STOPWORDS['fr'])} AS sc_fr
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN greatest(sc_en, sc_de, sc_es, sc_fr) = 0 THEN 'und'
                    WHEN sc_en >= greatest(sc_de, sc_es, sc_fr) THEN 'en'
                    WHEN sc_de >= greatest(sc_es, sc_fr) THEN 'de'
                    WHEN sc_es >= sc_fr THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    """,
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (deterministic heuristic; the testdata
    text is synthetic so this pins the op's plumbing, not linguistics)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("__toks", tokens(F.col("text")))
    scored = docs.select(
        "doc_id",
        "lang",
        *[_stop_count(F.col("__toks"), ws).alias(f"sc_{lg}") for lg, ws in STOPWORDS.items()],
    )
    g = F.greatest("sc_en", "sc_de", "sc_es", "sc_fr")
    pred = (
        F.when(g == 0, "und")
        .when(F.col("sc_en") >= F.greatest("sc_de", "sc_es", "sc_fr"), "en")
        .when(F.col("sc_de") >= F.greatest("sc_es", "sc_fr"), "de")
        .when(F.col("sc_es") >= F.col("sc_fr"), "es")
        .otherwise("fr")
    )
    return scored.select("doc_id", "lang", pred.alias("lang_pred"))


@register(
    "text_quality_score",
    oracle=f"""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars_q,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INTEGER) AS n_punct,
               CAST({_sql_stop_count(STOPWORDS['en'])} AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+')) AS mean_token_len
        FROM documents
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features — the usual
    cheap pre-filters of an LLM data pipeline."""
    docs = load_table(spark, sf_dir, "documents").withColumn("__toks", tokens(F.col("text")))
    n_tokens = F.size(F.col("__toks"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).alias("n_punct"),
        (_stop_count(F.col("__toks"), STOPWORDS["en"]).cast("double") / n_tokens).alias(
            "stopword_ratio"
        ),
        (F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens).alias(
            "mean_token_len"
        ),
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id, md5(lower(trim(text))) AS fp
        FROM documents
    """,
    tags=("text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 of case/whitespace-normalized
    text) — the join key for exact near-copy detection across shards."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))


@register(
    "text_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    tags=("text", "agg"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by language (SURVEY §2.10 text_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_ngram_freq",
    oracle="""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        grams AS (
            SELECT t[i] || ' ' || t[i + 1] AS bigram
            FROM toks, unnest(range(1, len(t))) AS r(i))
        SELECT bigram, count(*) AS cnt
        FROM grams GROUP BY bigram
        ORDER BY cnt DESC, bigram LIMIT 50
    """,
    tags=("text", "agg"),
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigram frequency. The bigram list is built with a
    zip of the token array against its own tail (transform over indices)
    — all JVM higher-order functions; explode feeds a map-side-combined
    hash aggregate, so the shuffle carries |bigram vocabulary| not
    |token pairs|; TakeOrderedAndProject picks the head."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.get(toks, i + 1)),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(50)
    )


TFIDF_TOP_PER_SOURCE = 10


@register(
    "text_tfidf",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM documents),
        tf AS (SELECT source, token, count(*) AS tf FROM tok
               WHERE token <> '' GROUP BY source, token),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
               WHERE token <> '' GROUP BY token),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.source, tf.token, tf.tf, df.df,
                   round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
        SELECT source, token, tf, df, tfidf
        FROM (SELECT *, row_number() OVER (PARTITION BY source
                        ORDER BY tfidf DESC, token) AS rn
              FROM scored)
        WHERE rn <= {TFIDF_TOP_PER_SOURCE}
    """,
    tags=("text",),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF distinguishing terms per source: corpus-wide document
    frequency joined to per-source term frequency, top-k per source.

    Shuffle budget: one explode (map-side, no shuffle), one |source x
    token| tf agg, one |token| df agg (both map-side combined), then the
    df side — O(vocab) rows — joins the tf side; N is a broadcast scalar.
    The final window runs over the |source x token| grid, never the token
    stream. idf uses the smoothed ln((N+1)/(df+1)); tf and df are exact
    ints in both engines, so the double product matches bit-for-bit and
    the 6 dp rounding is cosmetic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # driver scalar, broadcast into the expression
    scored = tf.join(df, "token").select(
        "source",
        "token",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_PER_SOURCE)
        .drop("rn")
    )


CHUNK_TOKENS = 12


@register(
    "text_chunk_dedup",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        chunks AS (
            SELECT doc_id, u['pos'] AS pos, u['chunk'] AS chunk FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT) + 1),
                           i -> {{'pos': CAST(i AS INT),
                                  'chunk': array_to_string(
                                      toks[(i - 1) * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS}],
                                      ' ')}})) AS u
                FROM tok)),
        ranked AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
            FROM chunks)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
               floor(count(*) FILTER (WHERE rn = 1) * 1000000.0 / count(*) + 0.5)
                   / 1000000 AS keep_ratio
        FROM ranked GROUP BY doc_id
    """,
    tags=("text", "dedup"),
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup — the LLM-corpus pass that removes repeated
    boilerplate *within* otherwise-unique documents: split each doc into
    fixed-size token chunks, keep only the globally-first occurrence of
    each chunk (first = lowest (doc_id, pos) — deterministic), report the
    per-doc survival ratio.

    Scale: the only shuffle keys are chunk *strings* (at production scale,
    hash them first — same plan shape as dedup/minhash.py's digests);
    keep-first is one window over the chunk groups, and the per-doc
    rollup reuses nothing heavier than a |chunks| exchange. No pairwise
    comparison ever materializes."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"""
                transform(sequence(1, CAST(ceil(size(split(text, ' ')) / {CHUNK_TOKENS}.0) AS INT)),
                          i -> concat_ws(' ', slice(split(text, ' '),
                                                    (i - 1) * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})))
                """
            )
        ).alias("pos0", "chunk"),
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "chunk")
    w = W.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("bigint")).alias("n_kept"),
        (
            F.floor(
                F.sum((F.col("rn") == 1).cast("bigint")) * 1000000.0
                / F.count(F.lit(1))
                + 0.5
            )
            / 1000000
        ).alias("keep_ratio"),
    )


HASH_DIM = 16  # feature-hashing bucket count (power of two)


@register(
    "text_hash_embedding",
    oracle=f"""
        SELECT doc_id,
               array_to_string(list_transform(range(0, {HASH_DIM}), j ->
                   CAST(len(list_filter(
                       list_transform(string_split(text, ' '), tok ->
                           CAST(CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT)
                                AS BIGINT) % {HASH_DIM}),
                       h -> h = j)) AS INT)), ',') AS vec
        FROM documents WHERE doc_id < 200
    """,
    tags=("text", "ml"),
)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer: token -> md5-prefix hash -> bucket,
    dense count vector per document — fixed dimensionality with no
    vocabulary to build or broadcast (the property that matters at
    100 TB: no global dictionary state, pure map). All JVM higher-order
    functions; the same md5-prefix hash scheme as dedup/minhash.py, so
    both engines bucket identically."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.expr(
            f"""
            array_join(transform(sequence(0, {HASH_DIM - 1}), j ->
                CAST(size(filter(
                    transform(split(text, ' '), tok ->
                        cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)
                            % {HASH_DIM}),
                    h -> h = j)) AS INT)), ',')
            """
        ).alias("vec"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents),
        t AS (SELECT * FROM tok WHERE token <> ''),
        vocab AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
        n AS (SELECT count(*) AS total FROM t),
        lp AS (
            SELECT t.doc_id, t.pos,
                   ln(CAST(vocab.tf AS DOUBLE)) - ln(CAST(n.total AS DOUBLE)) AS lp
            FROM t JOIN vocab ON t.token = vocab.token CROSS JOIN n),
        d AS (
            SELECT doc_id, count(*) AS n_tokens,
                   list_aggregate(list(lp ORDER BY pos), 'sum') AS s
            FROM lp GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               floor(-s / CAST(n_tokens AS DOUBLE) * 1000000000 + 0.5)
                   / 1000000000 AS avg_nll
        FROM d
    """,
    tags=("text", "ml"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own unigram LM — the classic cheap perplexity-style quality filter
    (high avg_nll = rare-token soup, low = boilerplate). tf and the
    token total are exact ints, so each token's ln(tf)-ln(N) matches
    bit-for-bit across engines; the per-doc sum folds in TOKEN-POSITION
    order in both (array_sort fold here, list(ORDER BY pos) there) so
    the float accumulation order is pinned. Scale: one |vocab| agg
    (map-side combined), vocab broadcast back onto the token stream —
    the per-doc rollup is the only shuffle carrying |tokens| rows, and
    it reduces to |docs|."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
        )
        .filter(F.col("token") != "")
    )
    # |vocab|-sized, pinned once; the corpus token total is the SUM of
    # its term frequencies — the old tok.count() action re-ran the
    # whole tokenize pass a third time (r11 plan sweep)
    vocab = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    total = vocab.agg(F.sum("tf")).head()[0] or 0
    lp = tok.join(F.broadcast(vocab), "token").select(
        "doc_id",
        "pos",
        (F.log(F.col("tf").cast("double")) - F.log(F.lit(float(total)))).alias("lp"),
    )
    d = lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("s"),
    )
    avg_nll = -F.col("s") / F.col("n_tokens").cast("double")
    return d.select(
        "doc_id",
        "n_tokens",
        (F.floor(avg_nll * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias(
            "avg_nll"
        ),
    )


@register(
    "text_repetition_score",
    oracle="""
        WITH t AS (SELECT doc_id,
                          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                   FROM documents),
        ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        tf AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
        uni AS (SELECT doc_id, SUM(c) AS n, count(*) AS n_distinct, max(c) AS top_c
                FROM tf GROUP BY doc_id),
        bi AS (SELECT t.doc_id,
                      len(list_transform(range(1, len(toks)), 
                          i -> toks[i] || ' ' || toks[i+1])) AS n_bigrams,
                      len(list_distinct(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1]))) AS n_distinct_bigrams
               FROM t WHERE len(toks) >= 2)
        SELECT uni.doc_id,
               CAST(uni.n_distinct AS DOUBLE) / CAST(uni.n AS DOUBLE)
                   AS distinct_token_ratio,
               CAST(uni.top_c AS DOUBLE) / CAST(uni.n AS DOUBLE)
                   AS top_token_share,
               CAST(bi.n_bigrams - bi.n_distinct_bigrams AS DOUBLE)
                   / CAST(bi.n_bigrams AS DOUBLE) AS dup_bigram_frac
        FROM uni JOIN bi ON uni.doc_id = bi.doc_id
    """,
    tags=("text", "ml"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters in the Gopher-rules style:
    distinct-token ratio, most-frequent-token share, and duplicate-
    bigram fraction — the cheap signals that catch boilerplate loops
    and keyboard-mash documents before any model-based scoring. All
    three are ratios of EXACT per-document integer counts (token
    multiset stats via one in-doc groupBy; bigram stats via a JVM-side
    self-zip, no explode of bigram strings off the executor), so the
    doubles are single divides of identical ints in both engines.
    Per-doc group cardinality is bounded by doc length; the only
    shuffle keys are (doc_id, token) then doc_id."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    ex = docs.select("doc_id", F.explode("toks").alias("tok"))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    uni = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    bigrams = F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),"
        " (x, y) -> concat(x, ' ', y))"
    )
    bi = docs.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )
    return uni.join(bi, "doc_id").select(
        "doc_id",
        (F.col("n_distinct").cast("double") / F.col("n").cast("double")).alias(
            "distinct_token_ratio"
        ),
        (F.col("top_c").cast("double") / F.col("n").cast("double")).alias(
            "top_token_share"
        ),
        (
            (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("dup_bigram_frac"),
    )


PMI_MIN_PAIR_COUNT = 5


@register(
    "text_pmi_collocations",
    oracle=f"""
        WITH toks AS (
            SELECT regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        uni AS (
            SELECT tok, count(*) AS c_tok
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
        bi AS (
            SELECT t[i] AS tok_a, t[i + 1] AS tok_b, count(*) AS c_ab
            FROM toks, unnest(range(1, len(t))) AS r(i)
            GROUP BY tok_a, tok_b),
        tot AS (
            SELECT (SELECT CAST(sum(c_tok) AS BIGINT) FROM uni) AS n_uni,
                   (SELECT CAST(sum(c_ab) AS BIGINT) FROM bi) AS n_bi)
        SELECT tok_a, tok_b, c_ab, ua.c_tok AS c_a, ub.c_tok AS c_b,
               round(ln((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)
                         * CAST(n_uni AS DOUBLE))
                        / (CAST(n_bi AS DOUBLE) * CAST(ua.c_tok AS DOUBLE)
                           * CAST(ub.c_tok AS DOUBLE))), 6) AS pmi
        FROM bi
        JOIN uni ua ON bi.tok_a = ua.tok
        JOIN uni ub ON bi.tok_b = ub.tok
        CROSS JOIN tot
        WHERE c_ab >= {PMI_MIN_PAIR_COUNT}
    """,
    tags=("text", "agg"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: pointwise mutual information of adjacent
    token pairs, PMI = ln(P(a,b) / (P(a)P(b))) — the classic corpus-
    statistics signal for multi-word expressions (and a tokenizer-merge
    heuristic for training-data pipelines).

    Shuffle budget: the token/bigram streams explode map-side into two
    map-side-combined hash aggregates, so the exchanges carry |vocab| and
    |bigram vocab| rows, never the token stream. Both unigram lookups are
    broadcast joins (the vocabulary is tiny relative to the corpus), and
    the corpus totals arrive as a broadcast 1-row cross join — the big
    side is never reshuffled after its aggregate. The row set is decided
    purely by the exact integer pair count (PMI_MIN_PAIR_COUNT), so no
    float-ordered LIMIT; pmi itself is one ln of a quotient of exact-int
    doubles, composed with identical association order in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
        .localCheckpoint(eager=True)  # vocab-sized; totals branch reuses it
    )
    pair_structs = F.expr(
        "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        "         slice(toks, 2, greatest(size(toks) - 1, 0)),"
        "         (x, y) -> struct(x AS tok_a, y AS tok_b))"
    )
    bi = (
        docs.select(toks.alias("toks"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=True)  # bigram-vocab-sized; totals reuse it
    )
    tot = uni.agg(F.sum("c_tok").alias("n_uni")).crossJoin(
        bi.agg(F.sum("c_ab").alias("n_bi"))
    )
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c_tok").alias("c_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c_tok").alias("c_b"))
    pmi = F.round(
        F.log(
            (
                F.col("c_ab").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
            )
            / (
                F.col("n_bi").cast("double")
                * F.col("c_a").cast("double")
                * F.col("c_b").cast("double")
            )
        ),
        6,
    )
    return (
        bi.filter(F.col("c_ab") >= PMI_MIN_PAIR_COUNT)
        .join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .crossJoin(F.broadcast(tot))
        .select("tok_a", "tok_b", "c_ab", "c_a", "c_b", pmi.alias("pmi"))
    )


POSTINGS_HEAD = 5


@register(
    "corpus_inverted_index",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents),
        pd AS (SELECT token, doc_id, count(*) AS tf_doc
               FROM tok WHERE token <> '' GROUP BY token, doc_id),
        head AS (
            SELECT token,
                   array_to_string(list_sort(list(doc_id)), ',') AS postings_head
            FROM (SELECT token, doc_id,
                         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
                  FROM pd)
            WHERE rn <= {POSTINGS_HEAD} GROUP BY token)
        SELECT pd.token AS token,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf_doc) AS BIGINT) AS tf,
               head.postings_head AS postings_head
        FROM pd JOIN head ON pd.token = head.token
        GROUP BY pd.token, head.postings_head
    """,
    tags=("text", "search", "agg"),
)
def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — the IR primitive behind corpus search and
    contamination lookups: per token, document frequency, total term
    frequency, and the head of the sorted posting list.

    Scale posture: the token stream collapses FIRST to the (token,
    doc_id) grid (map-side combined count), so every later stage is
    bounded by |vocab x touched-docs|, never the raw token stream. The
    posting head is row_number-truncated BEFORE any collect — a stopword
    posting list at 100 TB is |corpus|-sized, and an unbounded
    collect_set on it is executor-OOM by construction; the full postings
    would stream to a doc_id-bucketed sink instead, with this head kept
    as the serving summary. Three keyed exchanges total, each narrower
    than the last."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf_doc"))
    head = (
        per_doc.withColumn(
            "rn", F.row_number().over(W.partitionBy("token").orderBy("doc_id"))
        )
        .filter(F.col("rn") <= POSTINGS_HEAD)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf_doc").alias("tf")
    )
    return stats.join(head, "token").select("token", "df", "tf", "postings_head")


@register(
    "corpus_quality_report",
    oracle=f"""
        WITH feat AS (
            SELECT source,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                       AS n_punct,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   md5(lower(trim(text))) AS fp,
                   CASE WHEN {_sql_stop_count(STOPWORDS['en'])} > 0
                        THEN 1 ELSE 0 END AS has_en_stop
            FROM documents)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens,
               round(CAST(sum(n_punct) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6)
                   AS punct_ratio,
               round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6)
                   AS dup_rate,
               round(CAST(sum(has_en_stop) AS DOUBLE) / count(*), 6)
                   AS en_stopword_rate
        FROM feat GROUP BY source
    """,
    tags=("text", "quality", "agg", "pipeline"),
)
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard in ONE scan: document counts,
    mean length, punctuation density, exact-duplicate rate, and English
    stopword coverage — the report a data curation team reviews before
    admitting a source into the training mix.

    Scale posture: every per-doc feature is a row-local codegen
    expression over one pass; the only shuffle is the |sources| groupBy
    (map-side combined, countDistinct on the 32-byte fingerprint rides
    the same exchange as a partial-distinct aggregate). All numerators/
    denominators are exact integers before a single double division, so
    the DuckDB oracle matches bit-for-bit at 6 dp."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", tokens(F.col("text"))
    )
    feat = docs.select(
        "source",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0))
        .cast("long")
        .alias("n_punct"),
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        (_stop_count(F.col("__toks"), STOPWORDS["en"]) > 0)
        .cast("int")
        .alias("has_en_stop"),
    )
    n = F.count(F.lit(1))
    return feat.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.round(F.sum("n_tokens").cast("double") / n, 6).alias("avg_tokens"),
        F.round(
            F.sum("n_punct").cast("double") / F.sum("n_chars").cast("double"), 6
        ).alias("punct_ratio"),
        F.round(
            F.lit(1.0) - F.countDistinct("fp").cast("double") / n, 6
        ).alias("dup_rate"),
        F.round(F.sum("has_en_stop").cast("double") / n, 6).alias(
            "en_stopword_rate"
        ),
    )


@register(
    "text_bigram_logprob",
    oracle="""
        WITH tok AS (
            SELECT doc_id, CAST(r.i AS BIGINT) AS pos, t.toks[r.i] AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) t,
                 unnest(range(1, len(t.toks) + 1)) AS r(i)
            WHERE t.toks[r.i] <> ''),
        bg AS (
            -- lead() over the empty-filtered token stream: consecutive
            -- surviving tokens pair even across a run of empty splits
            -- (consecutive spaces), matching the Spark lead() semantics
            SELECT doc_id, w1, w2 FROM (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                FROM tok) s
            WHERE w2 IS NOT NULL),
        bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        uc AS (SELECT w AS w1, count(*) AS c1 FROM tok GROUP BY w),
        v AS (SELECT count(DISTINCT w) AS vsize FROM tok),
        lp AS (
            SELECT g.doc_id,
                   CAST(floor((ln(bc.c2 + 1.0)
                               - ln(CAST(uc.c1 + v.vsize AS DOUBLE)))
                              * 1000000 + 0.5) AS BIGINT) AS lp_micro
            FROM bg g
            JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
            JOIN uc ON uc.w1 = g.w1
            CROSS JOIN v)
        SELECT doc_id, count(*) AS n_bigrams,
               floor(-CAST(SUM(lp_micro) AS DOUBLE) / count(*) + 0.5)
                   / 1000000 AS avg_nll
        FROM lp GROUP BY doc_id
    """,
    tags=("text", "ml"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own add-one-smoothed BIGRAM LM — the next step up from
    text_unigram_logprob in the perplexity-filter ladder (captures word
    order: scrambled boilerplate scores badly here while the unigram
    model can't tell). p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V); each bigram's
    ln-term is rounded to integer micro-units before the per-doc sum
    (the ml_naive_bayes determinism discipline), so scores are exact
    integer sums divided once.

    Scale: bigrams form via a self-join on (doc_id, pos+1) — one keyed
    shuffle of the token stream; the bigram/unigram count tables are
    vocabulary-sized (min-df capped at web scale) and broadcast back
    onto the stream. The per-doc rollup is the only other shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "w")
    ).filter(F.col("w") != "").select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "w"
    )
    # bigrams via lead() — ONE doc_id shuffle of the token stream; the
    # equivalent positional self-join shuffles it twice and re-scans the
    # corpus per side (5 source scans at the round-3 audit)
    wnext = F.lead("w").over(W.partitionBy("doc_id").orderBy("pos"))
    bg = (
        tok.select("doc_id", F.col("w").alias("w1"), wnext.alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    # model-sized count tables materialize once; unigram counts also
    # provide the vocabulary, so no further corpus passes are needed
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).localCheckpoint(
        eager=True
    )
    uc = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .withColumnRenamed("w", "w1")
        .localCheckpoint(eager=True)
    )
    vsize = uc.count()  # |vocab| from the materialized unigram table
    lp_micro = F.floor(
        (
            F.log(F.col("c2") + F.lit(1.0))
            - F.log((F.col("c1") + F.lit(vsize)).cast("double"))
        )
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    lp = (
        bg.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uc), "w1")
        .select("doc_id", lp_micro.alias("lp_micro"))
    )
    return lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.floor(
                -F.sum("lp_micro").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            )
            / 1000000
        ).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# text_readability
# ---------------------------------------------------------------------------


@register(
    "text_readability",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                        w -> w <> '')) AS BIGINT) AS n_words,
                   CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                        s -> trim(s) <> '')) AS BIGINT) AS n_sents,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS n_syll
            FROM documents)
        SELECT doc_id, n_words, n_sents, n_syll,
               floor((206.835
                      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
                      - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)))
                     * 1000000 + 0.5) / 1000000 AS flesch
        FROM f WHERE n_words > 0 AND n_sents > 0
    """,
    tags=("text", "quality"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from three integer counts —
    words (non-empty whitespace splits), sentences (non-empty [.!?]+
    segments), and syllables approximated as vowel-group runs (the
    standard cheap proxy; exact syllabification needs a dictionary).
    A quality-filter feature alongside text_stats' ratios: boilerplate
    and OCR noise score far off the prose band. The score is one float
    expression over the three exact ints, evaluated identically in both
    engines, 1e-6 floor-rounded; zero-word/zero-sentence docs are
    excluded rather than scored on a division by zero.

    Scale: all three counts are row-local regex/split expressions in
    whole-stage codegen — a pure map over the corpus, no shuffle at
    all until a consumer aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    ).cast("bigint")
    n_sents = F.size(
        F.filter(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s) != "")
    ).cast("bigint")
    n_syll = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    f = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        - F.lit(84.6) * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
    )
    return f.filter((F.col("n_words") > 0) & (F.col("n_sents") > 0)).select(
        "doc_id", "n_words", "n_sents", "n_syll", r6(flesch).alias("flesch")
    )


# ---------------------------------------------------------------------------
# text_novelty_score
# ---------------------------------------------------------------------------


@register(
    "text_novelty_score",
    oracle="""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents),
        bg AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS g
            FROM toks, unnest(range(1, len(t))) AS r(i)),
        firsts AS (SELECT g, min(doc_id) AS first_doc FROM bg GROUP BY g)
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               floor(CAST(SUM(CASE WHEN f.first_doc = b.doc_id
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000 + 0.5) / 1000000 AS novelty
        FROM bg b JOIN firsts f USING (g)
        GROUP BY b.doc_id
    """,
    tags=("text", "dedup", "quality"),
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram NOVELTY under ingestion order (doc_id): the
    fraction of a doc's distinct bigrams whose FIRST corpus occurrence
    is this doc — the contribution score a curation pipeline uses to
    rank near-redundant continuations ('this page adds 3% new phrasing')
    where binary dedup only says keep/drop. Counts are exact set
    integers; novelty is one divide, 1e-6-rounded.

    Scale: distinct (doc, bigram) pairs shuffle once on the bigram to
    compute first-occurrence attribution (min doc_id — map-side
    combined), then once more joining the attribution back; the rollup
    is doc-keyed. At 100 TB the bigram key would ride xxhash64 longs
    exactly like corpus_decontaminate's probe (the string form here
    keeps the oracle engine-portable at test scale)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    bg = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> concat(x, ' ', t[i + 1]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = bg.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    j = bg.join(firsts, "g")
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        novel.cast("bigint").alias("n_novel"),
        r6(novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_stop_count(STOPWORDS['en'])} AS sc_en,
                   {_sql_stop_count(STOPWORDS['de'])} AS sc_de,
                   {_sql_stop_count(STOPWORDS['es'])} AS sc_es,
                   {_sql_stop_count(STOPWORDS['fr'])} AS sc_fr
            FROM documents),
        pred AS (
            SELECT doc_id, lang,
                   CASE WHEN greatest(sc_en, sc_de, sc_es, sc_fr) = 0 THEN 'und'
                        WHEN sc_en >= greatest(sc_de, sc_es, sc_fr) THEN 'en'
                        WHEN sc_de >= greatest(sc_es, sc_fr) THEN 'de'
                        WHEN sc_es >= sc_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM scored)
        SELECT lang, lang_pred, count(*) AS n_docs
        FROM pred GROUP BY lang, lang_pred
    """,
    tags=("text", "ml", "quality"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion rollup: (labeled lang, predicted lang,
    count) over the whole corpus — the quality gate on text_lang_id
    itself, and the per-language error budget a filtering pipeline
    monitors before trusting the heuristic at a new corpus mix (the
    langid sibling of ml_confusion_matrix's per-class table).

    Scale: the per-doc prediction is row-local stopword counting
    (text_lang_id's exact expressions); the rollup is one
    map-side-combined aggregate to ≤|langs|² rows."""
    pred = text_lang_id(spark, sf_dir)
    return pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# text_bpe_pair_counts
# ---------------------------------------------------------------------------


@register(
    "text_bpe_pair_counts",
    oracle="""
        WITH toks AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents),
        wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
               FROM toks WHERE w <> '' GROUP BY w),
        pairs AS (
            SELECT w, cnt, substr(w, i, 2) AS pair
            FROM wc, unnest(range(1, length(w))) AS r(i)
            WHERE length(w) >= 2)
        SELECT pair,
               CAST(SUM(cnt) AS BIGINT) AS pair_count,
               CAST(count(DISTINCT w) AS BIGINT) AS n_words
        FROM pairs GROUP BY pair
        ORDER BY pair_count DESC, pair ASC LIMIT 50
    """,
    tags=("text", "tokenizer"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner loop as one distributed query: corpus-wide
    frequencies of ADJACENT CHARACTER PAIRS within words, weighted by
    word occurrence count — exactly the candidate table a byte-pair
    tokenizer trainer scans to pick its next merge (top pair first).
    Counting pairs on the DISTINCT-word axis weighted by word frequency
    (instead of exploding pairs per token occurrence) is the standard
    trainer optimization: the pair fan-out runs over |vocab| rows, not
    |corpus| tokens. Counts are exact integers; top-50 carries a total
    (count DESC, pair ASC) tie-break.

    Scale: one token-occurrence shuffle to build word counts (map-side
    combined), then the character-pair explode runs over the reduced
    |vocab| axis only — at 100 TB the vocab table is millions of rows
    while the corpus is trillions of tokens, so the quadratic-looking
    pair fan-out costs ~nothing. TakeOrdered handles the top-50 without
    a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            "w",
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("cnt").alias("pair_count"),
            F.countDistinct("w").alias("n_words"),
        )
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# text_oov_rate
# ---------------------------------------------------------------------------


@register(
    "text_oov_rate",
    oracle="""
        WITH toks AS (
            SELECT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents),
        occ AS (SELECT source, w FROM toks WHERE w <> ''),
        vocab AS (
            SELECT w FROM (
                SELECT w, count(*) AS cnt FROM occ GROUP BY w
                ORDER BY cnt DESC, w ASC LIMIT 100))
        SELECT o.source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               floor(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
                   AS oov_rate
        FROM occ o LEFT JOIN vocab v USING (w)
        GROUP BY o.source
    """,
    tags=("text", "tokenizer", "quality"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary rate against the corpus top-100
    token vocabulary — the tokenizer-coverage gate a pretraining
    pipeline runs per data source before fixing a vocab: a source whose
    OOV mass is high will fragment into unknown/byte-fallback tokens and
    deserves either more vocab budget or exclusion. Vocabulary is the
    exact top-K by occurrence count with a total (count DESC, token ASC)
    tie-break so the cut is deterministic; the rate is one divide over
    exact counts, 1e-6-rounded.

    Scale: the vocab build is one token shuffle reduced to |vocab| rows
    (map-side combined) + TakeOrdered; the membership probe is a
    BROADCAST left join against the K-row vocab — the token stream
    itself never reshuffles, and the final rollup is |sources| rows. At
    a real 100 TB run K is 32k-256k — still broadcast-sized."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = (
        occ.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(100)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    j = occ.join(F.broadcast(vocab), "w", "left")
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        r6(oov.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# text_char_ngram_lang_profile
# ---------------------------------------------------------------------------


@register(
    "text_char_ngram_lang_profile",
    oracle="""
        WITH body AS (
            SELECT lang, lower(trim(text)) AS b FROM documents),
        tri AS (
            SELECT lang, substr(b, i, 3) AS tri
            FROM body, unnest(range(1, length(b) - 1)) AS r(i)
            WHERE length(b) >= 3),
        cnt AS (
            SELECT lang, tri, CAST(count(*) AS BIGINT) AS n
            FROM tri GROUP BY lang, tri),
        ranked AS (
            SELECT *, CAST(row_number() OVER
                           (PARTITION BY lang ORDER BY n DESC, tri ASC)
                      AS BIGINT) AS rnk
            FROM cnt)
        SELECT lang, tri, n, rnk FROM ranked WHERE rnk <= 10
    """,
    tags=("text", "ml"),
)
def text_char_ngram_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile: the top-10 char 3-grams
    by frequency for each labeled language — the model-build side of
    character-n-gram language ID (Cavnar-Trenkle out-of-place ranking
    profiles; text_lang_id is the stopword-heuristic *apply* side, this
    is what training the detector on the corpus itself looks like as a
    query). Counts are exact; the per-language rank carries a total
    (count DESC, trigram ASC) tie-break so the profile is deterministic.

    Scale: the trigram explode is row-local (no shuffle), one map-side-
    combined aggregate reduces the char stream to the (lang, trigram)
    axis, and the rank window is PARTITIONED BY lang over that reduced
    axis — nothing data-sized crosses a single partition. At 100 TB the
    (lang, trigram) axis is |langs|·|alphabet|³ — model-sized."""
    docs = load_table(spark, sf_dir, "documents")
    body = docs.select("lang", F.lower(F.trim(F.col("text"))).alias("b"))
    tri = (
        body.filter(F.length("b") >= 3)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(b) - 2),"
                    " i -> substring(b, i, 3))"
                )
            ).alias("tri"),
        )
    )
    cnt = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tri").asc())
    return (
        cnt.select(
            "lang", "tri", "n", F.row_number().over(w).cast("bigint").alias("rnk")
        )
        .filter(F.col("rnk") <= 10)
    )


# ---------------------------------------------------------------------------
# text_vocab_coverage
# ---------------------------------------------------------------------------


@register(
    "text_vocab_coverage",
    oracle="""
        WITH occ AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents),
        cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
                FROM occ WHERE w <> '' GROUP BY w),
        cum AS (
            SELECT w, cnt,
                   COALESCE(SUM(cnt) OVER (ORDER BY cnt DESC, w ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS cnt_cum
            FROM cnt),
        tot AS (SELECT SUM(cnt) AS t FROM cnt),
        tgt AS (SELECT CAST(unnest([500, 900, 950, 990]) AS BIGINT)
                    AS target_permille)
        SELECT target_permille,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(max(cnt_cum + cnt) AS BIGINT) AS covered_tokens,
               floor(CAST(max(cnt_cum + cnt) AS DOUBLE) / CAST(t AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS covered_share
        FROM cum CROSS JOIN tot
        JOIN tgt ON CAST(cnt_cum AS HUGEINT) * 1000
                    < CAST(target_permille AS HUGEINT) * t
        GROUP BY target_permille, t
    """,
    tags=("text", "tokenizer", "agg"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the number of top-frequency tokens
    needed to cover 50 / 90 / 95 / 99 per-cent of corpus token mass —
    the vocab-SIZING tool that precedes text_oov_rate's fixed-K audit
    (pick K off this curve, then monitor OOV per source against it).
    For each target p the answer is rank-free exact integer algebra:
    vocab_size = |{tokens whose EXCLUSIVE cumulative mass·1000 < p·T}|
    (exactly the first rank whose inclusive mass crosses the target,
    with the (count DESC, token ASC) total tie-break), covered_tokens =
    the max inclusive mass among them; shares are one divide,
    1e-6-rounded.

    Scale: one token shuffle reduces the corpus to the |vocab| axis;
    the cumulative mass rides the two-level range construction
    (operators/ranks.with_prefix_sum — no single-partition sort over
    the vocab); the 1-row total and the 4-row target spine broadcast
    onto it, and the final is a 4-row rollup."""
    from cdc_export_system_spark.operators.ranks import with_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    cnt = occ.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    # total_suffix: the corpus token total rides the prefix machinery's
    # offsets broadcast off its INTERNAL pin — the old separate
    # cnt.agg(sum) consumed the caller's UNPINNED frame and re-ran the
    # whole tokenize + groupBy pipeline (r12)
    cum = with_prefix_sum(
        cnt, [F.col("cnt").desc(), F.col("w").asc()], ["cnt"],
        total_suffix="__t",
    ).withColumn("t", F.col("cnt__t"))
    tgt = spark.createDataFrame(
        [(500,), (900,), (950,), (990,)], "target_permille long"
    )
    j = cum.join(
        F.broadcast(tgt),
        F.col("cnt_cum").cast("decimal(38,0)") * 1000
        < F.col("target_permille").cast("decimal(38,0)") * F.col("t"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    covered = F.max(F.col("cnt_cum") + F.col("cnt"))
    return (
        j.groupBy("target_permille", "t")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            covered.cast("bigint").alias("covered_tokens"),
            r6(covered.cast("double") / F.col("t").cast("double")).alias(
                "covered_share"
            ),
        )
        .drop("t")
    )


# ---------------------------------------------------------------------------
# corpus_gopher_filter — the per-document composite quality GATE
# ---------------------------------------------------------------------------

# Gopher-style rule thresholds (Rae et al. 2021 §A1.1), adapted to the
# synthetic corpus's ranges so every rule has real variance here. All five
# comparisons are evaluated in cross-multiplied INTEGER form, so the flags
# are bit-identical across engines — no float threshold can sit on a tie.
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 5_000
GOPHER_MIN_MEAN_WL = 3  # mean word length lower bound (chars/word)
GOPHER_MAX_MEAN_WL = 10
GOPHER_MIN_DISTINCT_PERMILLE = 350  # distinct-token ratio > 0.35
GOPHER_MAX_TOP_SHARE_PERMILLE = 120  # most-frequent-token share <= 0.12
GOPHER_MIN_STOPWORD_HITS = 2  # >= 2 English stopword occurrences

_GOPHER_SW = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "corpus_gopher_filter",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        d AS (
            SELECT doc_id,
                   SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS mc,
                   SUM(length(tok) * c) AS ch,
                   SUM(CASE WHEN tok IN ({_GOPHER_SW}) THEN c ELSE 0 END) AS sw
            FROM tf GROUP BY doc_id)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_words,
               CAST(n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
                    AS INT) AS ok_len,
               CAST(ch >= {GOPHER_MIN_MEAN_WL} * n
                    AND ch <= {GOPHER_MAX_MEAN_WL} * n AS INT) AS ok_mean_wl,
               CAST(1000 * nd > {GOPHER_MIN_DISTINCT_PERMILLE} * n
                    AS INT) AS ok_distinct,
               CAST(1000 * mc <= {GOPHER_MAX_TOP_SHARE_PERMILLE} * n
                    AS INT) AS ok_top_share,
               CAST(sw >= {GOPHER_MIN_STOPWORD_HITS} AS INT) AS ok_stopwords,
               CAST(n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
                    AND ch >= {GOPHER_MIN_MEAN_WL} * n
                    AND ch <= {GOPHER_MAX_MEAN_WL} * n
                    AND 1000 * nd > {GOPHER_MIN_DISTINCT_PERMILLE} * n
                    AND 1000 * mc <= {GOPHER_MAX_TOP_SHARE_PERMILLE} * n
                    AND sw >= {GOPHER_MIN_STOPWORD_HITS} AS INT) AS keep
        FROM d
    """,
    tags=("text", "quality", "pipeline"),
)
def corpus_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document composite quality GATE in the Gopher-rules style
    (Rae et al. 2021): word-count bounds, mean-word-length bounds,
    distinct-token ratio, most-frequent-token share, and stopword
    presence — each emitted as its own 0/1 flag plus the conjunctive
    ``keep`` decision. corpus_quality_report is the per-SOURCE health
    dashboard; this is the row-level admit/reject step a pretraining
    pipeline actually applies before dedup (the natural front of
    pipeline_pretraining_corpus).

    Exactness: every feature is an exact integer (token multiset counts,
    character sums), and every threshold comparison is cross-multiplied
    into integer form (e.g. ``1000*nd > 350*n`` instead of
    ``nd/n > 0.35``) so no flag can disagree across engines by an ulp.

    Scale: one explode of the token stream, one (doc_id, token) combine,
    one doc_id reduce — identical exchange shape to
    text_repetition_score; per-doc group cardinality is bounded by doc
    length, flags are pure codegen on the reduced row. No self-joins,
    no windows, nothing driver-side."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    d = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.max("c").alias("mc"),
        F.sum(F.length("tok") * F.col("c")).alias("ch"),
        F.sum(
            F.when(F.col("tok").isin(STOPWORDS["en"]), F.col("c")).otherwise(0)
        ).alias("sw"),
    )
    ok_len = (F.col("n") >= GOPHER_MIN_WORDS) & (F.col("n") <= GOPHER_MAX_WORDS)
    ok_mwl = (F.col("ch") >= GOPHER_MIN_MEAN_WL * F.col("n")) & (
        F.col("ch") <= GOPHER_MAX_MEAN_WL * F.col("n")
    )
    ok_dis = 1000 * F.col("nd") > GOPHER_MIN_DISTINCT_PERMILLE * F.col("n")
    ok_top = 1000 * F.col("mc") <= GOPHER_MAX_TOP_SHARE_PERMILLE * F.col("n")
    ok_sw = F.col("sw") >= GOPHER_MIN_STOPWORD_HITS
    return d.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_words"),
        ok_len.cast("int").alias("ok_len"),
        ok_mwl.cast("int").alias("ok_mean_wl"),
        ok_dis.cast("int").alias("ok_distinct"),
        ok_top.cast("int").alias("ok_top_share"),
        ok_sw.cast("int").alias("ok_stopwords"),
        (ok_len & ok_mwl & ok_dis & ok_top & ok_sw).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# text_bpe_train_merges
# ---------------------------------------------------------------------------

N_BPE_MERGES = 8


def _bpe_apply_merge(syms, left: str, right: str):
    """Replace non-overlapping (left, right) adjacent occurrences in a
    symbol array left-to-right with the merged symbol — the BPE merge
    step as a whole-stage-codegen aggregate fold (carry = last symbol
    not yet committed), no Python in the loop."""
    merged = left + right
    empty = F.array().cast("array<string>")

    def step(acc, s):
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (acc["carry"] == left) & (s == right),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    return F.aggregate(
        syms,
        F.struct(empty.alias("out"), F.lit(None).cast("string").alias("carry")),
        step,
        lambda acc: F.when(
            acc["carry"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["carry"]))),
    )


@register(
    "text_bpe_train_merges",
    oracle=None,  # iterative trainer loop — pinned against a pure-Python
    # reference implementation in tests/test_round6_semantics.py
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES
) -> DataFrame:
    """TRAIN a byte-pair-encoding tokenizer (Sennrich et al. 2016): the
    full iterative merge loop whose single inner scan
    text_bpe_pair_counts exposes. Each round counts adjacent symbol
    pairs over the distinct-word vocabulary weighted by word frequency,
    picks the most frequent pair (total tie-break: count DESC, left
    ASC, right ASC — bit-stable across runs and partitionings), and
    rewrites every word's symbol sequence with the merged token
    (left-to-right non-overlapping, the standard BPE apply rule,
    implemented as a codegen aggregate fold — no Python per row). No
    end-of-word marker, matching text_bpe_pair_counts's pair axis, so
    merge #1 here IS that query's top row.

    Returns the ordered merge table (rank, left, right, pair_count) —
    the model artifact a tokenizer ships. Driver holds only this
    N-row table and the 1-row argmax per round.

    Scale: ONE corpus token shuffle builds the (word, count) vocab;
    every training round then runs on the |vocab| axis (millions of
    rows at 100 TB vs trillions of corpus tokens — the standard
    trainer optimization), checkpointed per round to keep lineage
    flat. The argmax is a TakeOrdered(1), not a global sort. Stops
    early when no pair occurs twice (count < 2 can never merge
    usefully) or the vocab is exhausted."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = wc.select(
        "cnt",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = vocab.filter(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, left, right, c))
        vocab = vocab.select(
            "cnt", _bpe_apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


# ---------------------------------------------------------------------------
# corpus_bpe_encode
# ---------------------------------------------------------------------------


@register(
    "corpus_bpe_encode",
    oracle=None,  # the encoding depends on the trained merge table —
    # pinned against the reference encoder in tests/test_round6_semantics.py
    tags=("text", "tokenizer", "corpus"),
)
def corpus_bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES
) -> DataFrame:
    """ENCODE the corpus with the trained BPE model — the apply half of
    text_bpe_train_merges, closing the tokenizer loop (train → encode →
    budget): per document, the whitespace token count, the subword
    token count under the learned merges, and the compression ratio —
    the number a data pipeline actually bills by (token budget under
    the production tokenizer, not under split-on-space).

    Shape: the merge list is MODEL-SIZED (N rows) and drives N chained
    codegen merge folds — applied once per DISTINCT word (the same
    |vocab|-axis trick as training: encode millions of distinct words,
    not trillions of token occurrences), then the per-word subword
    count joins back to the (doc, word) occurrence stream on the token
    axis and rolls up per document. Scale: one corpus token shuffle for
    occurrences, one |vocab|-keyed join (word axis — deliberately NOT
    broadcast: a real corpus vocabulary outgrows a broadcast), one
    doc_id rollup. The train pass runs first (same session) and is
    amortized across every consumer of the model."""
    merges = [
        (r["left"], r["right"])
        for r in text_bpe_train_merges(spark, sf_dir, n_merges)
        .orderBy("rank")
        .collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    words = occ.select("w").distinct()
    syms = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    for left, right in merges:
        syms = _bpe_apply_merge(syms, left, right)
    encoded = words.select("w", F.size(syms).alias("n_sub"))
    per_doc = (
        occ.join(encoded, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_ws"),
            F.sum("n_sub").alias("n_tokens_bpe"),
        )
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return per_doc.select(
        "doc_id",
        "n_tokens_ws",
        "n_tokens_bpe",
        r6(
            F.col("n_tokens_bpe").cast("double")
            / F.col("n_tokens_ws").cast("double")
        ).alias("bpe_per_ws_token"),
    )


# ---------------------------------------------------------------------------
# text_rake_keywords
# ---------------------------------------------------------------------------

RAKE_TOP_K = 3
_RAKE_STOPS = STOPWORDS["en"]
_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   generate_subscripts(regexp_split_to_array(trim(lower(text)),
                       '\\s+'), 1) - 1 AS pos,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents),
        nw AS (
            SELECT doc_id, pos, w,
                   pos - row_number() OVER (PARTITION BY doc_id
                       ORDER BY pos) AS run
            FROM w WHERE w NOT IN ({_RAKE_STOPS_SQL})),
        ph AS (SELECT doc_id, run, count(*) AS plen
               FROM nw GROUP BY doc_id, run),
        freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM nw GROUP BY w),
        deg AS (SELECT nw.w, CAST(SUM(ph.plen) AS BIGINT) AS d
                FROM nw JOIN ph USING (doc_id, run) GROUP BY nw.w),
        ws AS (SELECT freq.w,
                      CAST((CAST(deg.d AS HUGEINT) * 1000000) // freq.f
                           AS BIGINT) AS wsc
               FROM freq JOIN deg ON freq.w = deg.w),
        scored AS (
            SELECT nw.doc_id, nw.run,
                   CAST(SUM(ws.wsc) AS BIGINT) AS score_micro,
                   string_agg(nw.w, ' ' ORDER BY nw.pos) AS phrase,
                   CAST(count(*) AS BIGINT) AS n_words
            FROM nw JOIN ws ON ws.w = nw.w
            GROUP BY nw.doc_id, nw.run),
        ded AS (
            SELECT doc_id, phrase, score_micro, n_words,
                   CAST(count(*) AS BIGINT) AS n_occ
            FROM scored GROUP BY doc_id, phrase, score_micro, n_words)
        SELECT doc_id, phrase, score_micro, n_words, n_occ, rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score_micro DESC, phrase) AS rnk
            FROM ded)
        WHERE rnk <= {RAKE_TOP_K}
    """,
    tags=("text", "agg", "window"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the documents
    table: candidate phrases are maximal stopword-free word runs
    (gaps-and-islands segmentation), word scores are deg(w)/freq(w)
    with degree = Σ phrase-length over the word's occurrences, and the
    phrase score is the sum of its words' scores. Scores are quantized
    to exact integer MICRO-UNITS per word (deg·1e6 div freq — integer
    division) BEFORE summation, so the per-phrase sum is
    order-independent and the per-doc top-{RAKE_TOP_K} ranking
    (ties to the lexicographically smaller phrase) hash-matches the
    oracle under any partitioning.

    Scale: one tokenize pass; freq/deg are |vocab|-keyed aggregates
    (map-side combined) joined back by word — at corpus scale the
    vocab tables broadcast, phrase assembly shuffles on (doc, run)
    whose payload is the phrase itself, and the rank window runs on
    the |phrases|-sized scored table, never the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "w"
        ),
    )
    nw = (
        w.filter(~F.col("w").isin(_RAKE_STOPS))
        .withColumn(
            "run",
            F.col("pos")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("pos")),
        )
        .localCheckpoint(eager=True)
    )
    ph = nw.groupBy("doc_id", "run").agg(F.count(F.lit(1)).alias("plen"))
    freq = nw.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    deg = (
        nw.join(ph, ["doc_id", "run"])
        .groupBy("w")
        .agg(F.sum("plen").cast("bigint").alias("d"))
    )
    ws = freq.join(deg, "w").select(
        "w", F.expr("(cast(d as decimal(38,0)) * 1000000) div f").alias("wsc")
    )
    scored = (
        nw.join(F.broadcast(ws), "w")
        .groupBy("doc_id", "run")
        .agg(
            F.sum("wsc").cast("bigint").alias("score_micro"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
    )
    ded = scored.groupBy("doc_id", "phrase", "score_micro", "n_words").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score_micro").desc(), "phrase")
    )
    return (
        ded.withColumn("rnk", rk.cast("bigint"))
        .filter(F.col("rnk") <= RAKE_TOP_K)
    )


# ---------------------------------------------------------------------------
# text_sliding_windows
# ---------------------------------------------------------------------------

CTX_WINDOW = 32  # tokens per training window
CTX_STRIDE = 16  # window stride (50% overlap)


@register(
    "text_sliding_windows",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        w AS (
            SELECT doc_id, CAST(i AS BIGINT) AS win_start,
                   array_to_string(
                       t[i:i+{CTX_WINDOW - 1}], ' ') AS window_text,
                   CAST(least({CTX_WINDOW}, len(t) - i + 1) AS BIGINT)
                       AS n_tokens
            FROM toks,
                 unnest(range(1, greatest(len(t) - {CTX_WINDOW} + 1, 1) + 1,
                              {CTX_STRIDE})) AS r(i)
            WHERE len(t) >= 1)
        SELECT doc_id, win_start, n_tokens, md5(window_text) AS window_md5
        FROM w
    """,
    tags=("text", "corpus", "reshape"),
)
def text_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTEXT-WINDOW CREATION for LM training: each document unrolls
    into CTX_WINDOW-token windows at CTX_STRIDE (50% overlap — the
    classic strided chunking that keeps every token inside at least
    one full-context window, where text_pack_chunks instead packs
    DISJOINT spans to a token budget). The last partial window is kept
    (n_tokens < CTX_WINDOW) so no suffix is silently dropped. The
    driver-checked projection hashes the window text (md5) so the
    hash-compare stays cheap while still pinning every byte.

    Scale: pure row-local array algebra — split once, slice per
    window, NO shuffle at all (the plan is scan -> generate -> project);
    output size is len/stride ~ 2x the token count, the knob every
    training pipeline sizes consciously."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    starts = F.expr(
        f"sequence(1, greatest(size(t) - {CTX_WINDOW} + 1, 1), {CTX_STRIDE})"
    )
    w = toks.filter(F.size("t") >= 1).select(
        "doc_id",
        F.explode(starts).alias("__ws"),
        "t",
    ).select("doc_id", F.col("__ws").cast("bigint").alias("win_start"), "t")
    return w.select(
        "doc_id",
        "win_start",
        F.least(
            F.lit(CTX_WINDOW),
            F.size("t") - F.col("win_start").cast("int") + 1,
        )
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.array_join(
                F.slice(F.col("t"), F.col("win_start").cast("int"), CTX_WINDOW),
                " ",
            )
        ).alias("window_md5"),
    )


# ---------------------------------------------------------------------------
# text_bm25_topk
# ---------------------------------------------------------------------------

BM25_QUERY = ("scan", "window", "order")  # fixed query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

BM25_TOPK_ORACLE = f"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                       AS t
            FROM documents),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks
               GROUP BY doc_id),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(len) AS BIGINT) AS total_len
            FROM dl),
        tf AS (
            SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
            FROM toks WHERE t IN {BM25_QUERY} GROUP BY doc_id, t),
        df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
        terms AS (
            SELECT tf.doc_id, tf.t, tf.tf, df.df, dl.len
            FROM tf JOIN df ON tf.t = df.t JOIN dl ON tf.doc_id = dl.doc_id),
        scored AS (
            SELECT doc_id,
                   list_aggregate(
                       list_transform(
                           list([CAST(tf AS DOUBLE), CAST(df AS DOUBLE),
                                 CAST(len AS DOUBLE)] ORDER BY t),
                           x -> ln((stats.n - x[2] + 0.5) / (x[2] + 0.5) + 1)
                                * (x[1] * ({BM25_K1} + 1))
                                / (x[1] + {BM25_K1}
                                   * (1 - {BM25_B} + {BM25_B} * x[3]
                                      / (CAST(stats.total_len AS DOUBLE)
                                         / stats.n)))),
                       'sum') AS score
            FROM terms CROSS JOIN stats GROUP BY doc_id, stats.n,
                 stats.total_len)
        SELECT doc_id,
               CAST(floor(score * 1000000000 + 0.5) AS BIGINT) AS score_nano,
               CAST(rn AS INT) AS rank
        FROM (SELECT *, row_number() OVER (
                  ORDER BY floor(score * 1000000000 + 0.5) DESC, doc_id) AS rn
              FROM scored)
        WHERE rn <= {BM25_TOPK}
    """


@register(
    "text_bm25_topk",
    oracle=BM25_TOPK_ORACLE,
    tags=("text", "similarity", "agg"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 RETRIEVAL — the search-engine ranking function (Robertson &
    Walker 1994) for a fixed query, top-k documents: idf-weighted,
    saturating term frequency with length normalization (k1 = 1.2,
    b = 0.75, the Lucene defaults). Exactness: corpus stats (N, df,
    lengths) are exact integers; each document's <= |query| term scores
    fold in TERM-SORTED order (the agg_entropy order-pinning trick) so
    float accumulation is identical in both engines; ranking compares
    the NANO-ROUNDED integer score with a doc_id tie-break, so the
    top-k boundary never sits on a ulp.

    Scale: tokenize once, keep only query terms (the 3-row term filter
    prunes before any shuffle), per-(doc, term) tf + per-doc length are
    keyed aggregates, df and corpus stats are tiny broadcasts, and the
    top-k is a TakeOrdered. This is a QUERY-time scorer; the offline
    index sibling is corpus_inverted_index."""
    from pyspark.sql import Window as W

    docs = load_table_fanned(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    ).localCheckpoint(eager=True)
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("len").cast("bigint").alias("total_len"),
    )
    tf = (
        toks.filter(F.col("t").isin(*BM25_QUERY))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    terms = tf.join(F.broadcast(df), "t").join(dl, "doc_id")
    term_struct = F.struct(
        "t",
        F.col("tf").cast("double").alias("tfd"),
        F.col("df").cast("double").alias("dfd"),
        F.col("len").cast("double").alias("lend"),
    )
    scored = (
        terms.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(term_struct)).alias("ts"))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.aggregate(
                F.col("ts"),
                F.lit(0.0),
                lambda acc, x: acc
                + F.log(
                    (F.col("n") - x["dfd"] + F.lit(0.5))
                    / (x["dfd"] + F.lit(0.5))
                    + F.lit(1)
                )
                * (x["tfd"] * F.lit(BM25_K1 + 1))
                / (
                    x["tfd"]
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1 - BM25_B)
                        + F.lit(BM25_B)
                        * x["lend"]
                        / (
                            F.col("total_len").cast("double") / F.col("n")
                        )
                    )
                ),
            ).alias("score"),
        )
    )
    nano = F.floor(F.col("score") * 1_000_000_000 + F.lit(0.5)).cast("bigint")
    ranked = scored.select("doc_id", nano.alias("score_nano")).withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("score_nano"), F.asc("doc_id"))),
    )
    return ranked.filter(F.col("rank") <= BM25_TOPK).select(
        "doc_id", "score_nano", F.col("rank").cast("int").alias("rank")
    )


# ---------------------------------------------------------------------------
# corpus_perplexity_buckets
# ---------------------------------------------------------------------------

PPLX_BUCKET_W = 0.25  # avg-NLL bucket width (nats)
PPLX_MAX_BUCKET = 19  # buckets clamp to [0, 19]


@register(
    "corpus_perplexity_buckets",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents),
        t AS (SELECT * FROM tok WHERE token <> ''),
        vocab AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
        n AS (SELECT count(*) AS total FROM t),
        lp AS (
            SELECT t.doc_id, t.pos,
                   ln(CAST(vocab.tf AS DOUBLE)) - ln(CAST(n.total AS DOUBLE))
                       AS lp
            FROM t JOIN vocab ON t.token = vocab.token CROSS JOIN n),
        d AS (
            SELECT doc_id, count(*) AS n_tokens,
                   floor(-list_aggregate(list(lp ORDER BY pos), 'sum')
                         / CAST(count(*) AS DOUBLE) * 1000000000 + 0.5)
                       / 1000000000 AS avg_nll
            FROM lp GROUP BY doc_id),
        b AS (
            SELECT CAST(least(floor(avg_nll / {PPLX_BUCKET_W}),
                              {PPLX_MAX_BUCKET}) AS BIGINT) AS bucket,
                   n_tokens
            FROM d),
        tot AS (SELECT count(*) AS n_total FROM b)
        SELECT b.bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(b.n_tokens) AS BIGINT) AS sum_tokens,
               CAST(CAST(count(*) AS HUGEINT) * 1000000 // max(tot.n_total)
                    AS BIGINT)
                   AS share_ppm,
               floor(CAST(sum(b.n_tokens) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
                   AS avg_tokens
        FROM b CROSS JOIN tot GROUP BY b.bucket
    """,
    tags=("text", "corpus", "ml"),
)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality DISTRIBUTION readout: bucket every document's
    unigram average NLL (text_unigram_logprob's exact pipeline — pinned
    fold order, 1e-9 rounding BEFORE bucketing so both engines bucket
    the identical double) into fixed 0.25-nat bins and report per-bin
    doc count, corpus share, and token mass — the histogram a curation
    pass reads to pick its perplexity cut-offs, where the per-doc op
    answers 'score this document'. Bucketing a rounded double by a
    fixed width is engine-stable because both engines floor the same
    IEEE value; shares are exact micro-unit integer divisions.

    Scale: inherits the logprob plan (one |vocab| agg broadcast onto
    the token stream, one doc_id rollup) plus a |buckets|<=20 global
    agg and a 1-row broadcast total — nothing new shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    # |vocab|-sized, pinned once; the corpus token total is the SUM of
    # its term frequencies — the old tok.count() action re-ran the
    # whole tokenize pass a third time (r11 plan sweep)
    vocab = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    total = vocab.agg(F.sum("tf")).head()[0] or 0
    lp = tok.join(F.broadcast(vocab), "token").select(
        "doc_id",
        "pos",
        (F.log(F.col("tf").cast("double")) - F.log(F.lit(float(total)))).alias(
            "lp"
        ),
    )
    d = lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("s"),
    )
    avg_nll = (
        F.floor(-F.col("s") / F.col("n_tokens").cast("double") * 1_000_000_000
                + F.lit(0.5))
        / 1_000_000_000
    )
    b = d.select(
        F.least(
            F.floor(avg_nll / PPLX_BUCKET_W), F.lit(PPLX_MAX_BUCKET).cast("bigint")
        )
        .cast("bigint")
        .alias("bucket"),
        "n_tokens",
    )
    # Pin the GROUPED rollup (<= PPLX_MAX_BUCKET+1 rows), not the
    # per-doc bucket table: the doc total is the sum of the per-bucket
    # doc counts, so the tiny grouped frame serves both consumers and
    # the logprob pipeline still runs exactly once. (r11 pinned the
    # |docs|-sized table here — the one data-proportional checkpoint
    # in the registry, r11 verdict item 3; this keeps the single-pass
    # property with a strictly bounded pin.)
    grouped = (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    tot = grouped.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    return (
        grouped
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            F.expr("CAST(cast(n_docs as decimal(38,0)) * 1000000 div n_total"
                   " AS BIGINT)").alias(
                "share_ppm"
            ),
            (
                F.floor(
                    F.col("sum_tokens").cast("double")
                    / F.col("n_docs").cast("double")
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("avg_tokens"),
        )
    )
