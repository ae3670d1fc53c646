"""Corpus-cleaning operators over the documents table (north-star
training-pipeline extensions; the reference has no text surface).

All three ops are pure column-expression pipelines — regexp/split/
explode run inside whole-stage codegen, no Python in the hot path:

* ``text_clean_normalize`` — strip markup, collapse whitespace,
  lowercase: the first stage of every web-scrape ingest.
* ``text_pii_scrub`` — redact email addresses and long digit runs: the
  compliance pass before training data leaves the lake.
* ``text_term_freq`` — corpus-wide term frequency (explode + count):
  the building block for stopword discovery / vocabulary statistics;
  map-side partial aggregation makes the shuffle |vocabulary|-sized,
  not |tokens|-sized.

The testdata's documents carry no markup or PII, so the first two ops
first *construct* a deterministic dirty string from (text, doc_id) and
then clean it — the oracle reproduces both halves, so the regexes are
actually exercised, not vacuously matched against clean input.

Regex dialect notes (Java in Spark, RE2 in DuckDB): patterns here stick
to the common subset; DuckDB's ``regexp_replace`` needs the ``'g'``
flag to replace all occurrences (Spark's always does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table, star_view
from cdc_export_system_spark.registry import register

TAG_RE = "<[^>]*>"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
NUM_RE = "[0-9]{6,}"


@register(
    "text_clean_normalize",
    oracle="""
        SELECT doc_id,
               lower(trim(regexp_replace(regexp_replace(
                   '<p class="x">' || text || '</p>  <br/>' || chr(10) || 'END',
                   '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))) AS clean
        FROM documents
    """,
    tags=("text", "cleaning"),
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup strip + whitespace collapse + lowercase over a
    deterministically dirtied document body."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit('<p class="x">'), F.col("text"), F.lit("</p>  <br/>\nEND")
    )
    clean = F.lower(
        F.trim(
            F.regexp_replace(F.regexp_replace(dirty, TAG_RE, " "), "\\s+", " ")
        )
    )
    return docs.select("doc_id", clean.alias("clean"))


@register(
    "text_pii_scrub",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com ref '
                        || CAST((doc_id % 2147483648) * 7919 + 123456789
                                AS VARCHAR),
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{NUM_RE}', '<NUM>', 'g') AS scrubbed
        FROM documents
    """,
    tags=("text", "cleaning"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email + long-digit-run redaction over a deterministically
    PII-bearing document body (emails first, so an address's own digits
    never leak into the numeric pass)."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        ((F.col("doc_id") % F.lit(1 << 31)) * 7919 + 123456789).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(dirty, EMAIL_RE, "<EMAIL>"), NUM_RE, "<NUM>"
    )
    return docs.select("doc_id", scrubbed.alias("scrubbed"))


@register(
    "text_term_freq",
    oracle="""
        SELECT t.token, count(*) AS cnt
        FROM documents d,
             unnest(regexp_split_to_array(trim(d.text), '\\s+')) AS t(token)
        GROUP BY t.token
        ORDER BY cnt DESC, t.token
        LIMIT 100
    """,
    tags=("text", "agg"),
)
def text_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus term frequency. explode feeds a hash aggregate
    whose map-side partial collapses each task's tokens to its local
    vocabulary before the shuffle, then TakeOrderedAndProject picks the
    head — no global sort of the full vocabulary."""
    docs = star_view(spark, sf_dir, "documents")
    return spark.sql(f"""
        SELECT token, count(*) AS cnt
        FROM (SELECT explode(split(trim(text), '\\\\s+')) AS token FROM {docs})
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 100
    """)


# --- the composed pretraining recipe ----------------------------------------

MIN_TOKENS = 20
MAX_TOKENS = 200
PIPE_SALT = 7717


@register(
    "pipeline_pretraining_corpus",
    oracle=f"""
        WITH cleaned AS (
            SELECT doc_id, source, lang,
                   lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS clean
            FROM documents),
        scored AS (
            SELECT *, len(string_split(clean, ' ')) AS n_tok FROM cleaned),
        filtered AS (
            SELECT * FROM scored
            WHERE lang = 'en' AND n_tok BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}),
        deduped AS (
            SELECT md5(clean) AS fp, min(doc_id) AS doc_id
            FROM filtered GROUP BY md5(clean)),
        kept AS (
            SELECT f.doc_id, f.source, f.n_tok,
                   CASE WHEN (((f.doc_id + {PIPE_SALT}) % 2147483648) * 2654435761)
                             % 1000 < 900
                        THEN 'train' ELSE 'val' END AS split
            FROM filtered f JOIN deduped d ON f.doc_id = d.doc_id)
        SELECT source, split, count(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM kept GROUP BY source, split
    """,
    headline=True,
    tags=("pipeline", "text", "dedup", "sampling"),
)
def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining data recipe, end to end in ONE lazy plan:
    normalize -> language + length gate -> exact dedup (first-wins by
    min doc_id) -> leak-proof hash split -> per-(source, split) corpus
    accounting. Every stage is a narrow transformation or a digest-keyed
    aggregate, so Catalyst fuses the scan->clean->filter front into one
    codegen stage; the only shuffles are the 16-byte-fingerprint dedup
    and the final |sources x 2| rollup. This is the 'a user can run
    their whole recipe on this engine' op: each stage also exists as a
    standalone operator (text_clean_normalize, text_quality_score,
    dedup_exact, sample_split_train_test, corpus_mix_weighted)."""
    from cdc_export_system_spark.operators.sampling import knuth_col

    docs = load_table(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id",
        "source",
        "lang",
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("clean"),
    )
    scored = cleaned.withColumn("n_tok", F.size(F.split("clean", " ")))
    filtered = scored.filter(
        (F.col("lang") == "en")
        & F.col("n_tok").between(MIN_TOKENS, MAX_TOKENS)
    )
    deduped = (
        filtered.groupBy(F.md5("clean").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    split = F.when(
        knuth_col(F.col("doc_id") + PIPE_SALT) % 1000 < 900, "train"
    ).otherwise("val")
    kept = filtered.join(deduped, "doc_id").select(
        "source", "n_tok", split.alias("split")
    )
    return kept.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
