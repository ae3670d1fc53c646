"""String function surface — engine extension beyond the reference's two
string ops (sanitize/replace at app/main.py:33, isoformat serialization).
All JVM-codegen'd column expressions; each picked for identical
cross-engine semantics so the oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "fn_string_suite",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS segment_lower,
               substr(c_name, 1, 8) AS name_prefix,
               CAST(length(c_name) AS INTEGER) AS name_len,
               concat(c_name, '#', c_mktsegment) AS name_seg,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
               reverse(c_name) AS name_rev,
               CAST(strpos(c_name, 'Customer') AS INTEGER) AS pos_customer,
               trim(concat('  ', c_name, '  ')) AS name_trimmed
        FROM customer
    """,
    tags=("function", "string"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: case, trim, substring, split, concat,
    length — all whole-stage-codegen JVM expressions."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("c_name").alias("name_rev"),
        F.instr(F.col("c_name"), "Customer").alias("pos_customer"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
    )


@register(
    "fn_like_regexp",
    oracle="""
        SELECT p_partkey, p_name, p_type,
               (p_type LIKE 'PROMO%') AS is_promo,
               regexp_matches(p_name, '[0-9]$') AS ends_digit,
               regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        FROM part
    """,
    tags=("function", "string", "filter"),
)
def fn_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp family. Note the DuckDB 'g' flag: Spark's
    regexp_replace is global by default, DuckDB's replaces first-only."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        "p_type",
        F.col("p_type").like("PROMO%").alias("is_promo"),
        F.col("p_name").rlike("[0-9]$").alias("ends_digit"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "fn_hash_suite",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256
        FROM documents WHERE doc_id < 100
    """,
    tags=("function", "hash"),
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash surface: md5 / sha2 / crc32 over name+email —
    the content-addressing primitives the dedup family builds on."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "fn_edit_distance",
    oracle="""
        SELECT a.n_name AS name_a, b.n_name AS name_b,
               CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS edit_dist
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    tags=("function", "string", "dedup"),
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance over same-region nation pairs — the fuzzy-
    match primitive for record-linkage dedup. The equi component
    (region) keeps the pair generation a hash join; at scale that IS the
    pattern: block on a cheap key, run the quadratic metric only within
    blocks."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.select(
        F.col("n_name").alias("name_a"),
        F.col("n_regionkey").alias("rk_a"),
        F.col("n_nationkey").alias("key_a"),
    )
    b = nation.select(
        F.col("n_name").alias("name_b"),
        F.col("n_regionkey").alias("rk_b"),
        F.col("n_nationkey").alias("key_b"),
    )
    return (
        a.join(b, (F.col("rk_a") == F.col("rk_b")) & (F.col("key_a") < F.col("key_b")))
        .select("name_a", "name_b", F.levenshtein("name_a", "name_b").alias("edit_dist"))
    )


@register(
    "fn_url_suite",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/' || doc_id
                       || '?lang=' || lang AS url
            FROM documents)
        SELECT doc_id, url,
               split_part(split_part(url, '://', 2), '/', 1) AS host,
               split_part(substr(split_part(url, '://', 2),
                                 strpos(split_part(url, '://', 2), '/')),
                          '?', 1) AS path,
               split_part(split_part(url, 'lang=', 2), '&', 1) AS lang_param
        FROM u
    """,
    tags=("function", "string"),
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the web-crawl pipeline primitive (host for
    per-domain dedup/rate stats, path, query params). URLs synthesized
    deterministically from document columns; parse_url runs JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "fn_format_pad",
    oracle="""
        SELECT o_orderkey,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
               rpad(o_orderstatus, 4, '.') AS status_padded,
               printf('%08d/%s', o_orderkey, o_orderstatus) AS composed,
               repeat('-', CAST(o_orderkey % 5 AS INT)) AS dashes,
               reverse(o_orderpriority) AS rev_priority
        FROM orders WHERE o_orderkey < 300
    """,
    tags=("function", "string"),
)
def fn_format_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting/padding surface: lpad/rpad/printf-style format_string/
    repeat/reverse — fixed-width key formatting for file naming and
    export layouts (reference filename stamping, app/main.py:31-34)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.rpad(F.col("o_orderstatus"), 4, ".").alias("status_padded"),
        F.format_string("%08d/%s", F.col("o_orderkey"), F.col("o_orderstatus")).alias(
            "composed"
        ),
        F.repeat(F.lit("-"), (F.col("o_orderkey") % 5).cast("int")).alias("dashes"),
        F.reverse(F.col("o_orderpriority")).alias("rev_priority"),
    )


@register(
    "fn_base64_suite",
    oracle="""
        SELECT doc_id,
               to_base64(encode(text)) AS b64,
               CAST(length(to_base64(encode(text))) AS INTEGER) AS b64_len,
               text = decode(from_base64(to_base64(encode(text))))
                   AS roundtrip_ok
        FROM documents WHERE doc_id < 100
    """,
    tags=("function", "string"),
)
def fn_base64_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round trip — the binary-safe transport
    encoding every export/ingest boundary needs (payload columns in
    JSON/CSV sinks). Pure codegen string ops. Spark's base64 emits
    MIME-chunked output (CRLF every 76 chars, a JDK legacy); the
    canonical unchunked RFC 4648 form is recovered by stripping the
    line breaks — after that the bytes match any other engine's."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    b64 = F.regexp_replace(
        F.base64(F.encode(F.col("text"), "UTF-8")), r"[\r\n]", ""
    )
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.length(b64).alias("b64_len"),
        (F.col("text") == F.decode(F.unbase64(b64), "UTF-8")).alias("roundtrip_ok"),
    )
