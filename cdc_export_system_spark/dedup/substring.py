"""Exact duplicated-substring detection (north-star extension).

The span-level counterpart to document-level dedup, after Lee et al.
2022 ("Deduplicating Training Data Makes Language Models Better"):
instead of dropping whole near-duplicate documents, find the exact
token SPANS that occur more than once anywhere in the corpus and report
them as per-document removal ranges. The classic implementation is a
corpus-wide suffix array; that is a single-machine construction. The
distributed re-expression here uses fixed-length seed n-grams:

1. every length-``SEED_LEN`` token window (OVERLAPPING, stride 1 —
   unlike text_chunk_dedup's disjoint chunks) becomes a (doc, pos, gram)
   row, built entirely JVM-side (split → sequence → transform → slice);
2. a gram whose corpus-wide occurrence count is >= 2 is a duplication
   seed — any duplicated run of >= SEED_LEN tokens necessarily contains
   a duplicated seed at every in-run offset, so seed coverage recovers
   the full span (maximal runs shorter than SEED_LEN are below the
   detection floor, the standard precision/recall knob);
3. covered token positions merge into maximal spans ROW-LOCALLY: one
   doc_id groupBy collects the covered-position set (bounded by doc
   length — the same bound as the token array itself), and island
   extraction is a pure array expression over the sorted positions.
   The oracle keeps the classic gaps-and-islands window form
   (pos - row_number() per doc): same spans, independent derivation.

Scale: the only corpus-wide shuffle is keyed on xxhash64(gram) — 8
bytes instead of the ~50-byte gram text — and it happens ONCE: the
duplicated-seed test is a count over a partition-only window on the
gram hash, not a count-aggregate plus probe-back join (which would
rebuild and re-shuffle the gram stream a second time). A 64-bit
collision could mark a unique gram as duplicated (P ~ |grams|^2 / 2^65;
~1e-11 at 1e8 grams) — the same accepted-risk contract as the MinHash
band hash. Everything downstream of the seed join is keyed on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table_fanned
from cdc_export_system_spark.registry import register

# Minimum duplicated-run length (tokens) the seeds can detect; 50 in the
# paper's byte-level setting, 8 here to exercise the operator on the
# short synthetic documents. The registered queries bind this default
# (their oracles are generated from it); deployments turn the knob via
# the ``seed_len`` parameter on the operator functions below.
SEED_LEN = 8


def _covered_positions(docs: DataFrame, seed_len: int) -> DataFrame:
    """(doc_id, p) token positions covered by some corpus-duplicated
    seed_len-gram — the shared front of both substring ops: gram build,
    the single xxhash64(gram) shuffle, the partition-only duplicated-seed
    window, and the seed→position fan-out."""
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    # Gram key WITHOUT building the gram string: hash each token once,
    # then combine the window's seed_len token-hashes with xor of
    # per-offset rotations rotl(h_k, 13k mod 64) — positional (13 is
    # coprime to 64, so every offset < 64 gets a distinct rotation),
    # row-local, bitwise-only (ANSI-safe: no wraparound multiply). 23%
    # faster than array_join + xxhash64(gram) at sf0.1 (0.89 -> 0.68 s
    # isolated, seed sets bit-identical) because the ~50-byte gram
    # strings are never materialized. Collision contract unchanged in
    # kind: a structured collision needs h_a ^ h_b invariant under a
    # specific rotation (~2^-63) on top of the generic 2^-64 — both
    # absorbed by the same accepted-risk note as the MinHash band digest.
    th = toks.select(
        "doc_id",
        F.expr("transform(t, x -> xxhash64(x))").alias("h"),
        F.size("t").alias("n"),
    )

    def _rot(k: int) -> str:
        r = (13 * k) % 64
        if r == 0:
            return f"h[i - 1 + {k}]"
        return (
            f"(shiftleft(h[i - 1 + {k}], {r})"
            f" | shiftrightunsigned(h[i - 1 + {k}], {64 - r}))"
        )

    terms = " ^ ".join(_rot(k) for k in range(seed_len))
    gram_arr = F.when(
        F.col("n") >= seed_len,
        F.expr(f"transform(sequence(1, n - {seed_len} + 1), i -> {terms})"),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = (
        th.select("doc_id", F.posexplode(gram_arr).alias("pos0", "gh"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    )
    # one shuffle on gh: per-gram occurrence counts via a partition-only
    # window, instead of a count groupBy plus a probe-back join (which
    # would rebuild and re-shuffle the gram stream a second time)
    w_g = W.partitionBy("gh")
    seeds = (
        grams.withColumn("c", F.count(F.lit(1)).over(w_g))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    return seeds.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + seed_len - 1)).alias("p"),
    )


@register(
    "dedup_exact_substring",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos, array_to_string(t[i:i+{SEED_LEN - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {SEED_LEN} + 2)) AS r(i)),
        dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        seeds AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN dup USING (g)),
        cov AS (
            SELECT DISTINCT doc_id, pos + j AS p
            FROM seeds, unnest(range(0, {SEED_LEN})) AS rj(j)),
        isl AS (
            SELECT doc_id, p,
                   p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
            FROM cov)
        SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
               CAST(max(p) AS BIGINT) AS span_end,
               count(*) AS span_len
        FROM isl GROUP BY doc_id, grp
    """,
    headline=True,
    tags=("dedup", "text", "substring"),
)
def dedup_exact_substring(
    spark: SparkSession, sf_dir: str, seed_len: int = SEED_LEN
) -> DataFrame:
    """Per-document maximal duplicated token spans: (doc_id, span_start,
    span_end, span_len), positions 1-based, a span being a maximal run
    of positions covered by some corpus-duplicated seed_len-gram.
    ``seed_len`` is the detection floor / precision knob (50 in the
    paper's setting; default 8 matches the registered oracle)."""
    # fanned: a small single-row-group scan would otherwise run the
    # whole gram build on one core (no-op at warehouse scale)
    docs = load_table_fanned(spark, sf_dir, "documents")
    cov = _covered_positions(docs, seed_len)
    # islands row-locally: ONE doc_id groupBy collects the (bounded-by-
    # doc-length) covered-position set; span extraction is a pure array
    # expression over the sorted positions — vs the distinct + window +
    # groupBy formulation, which costs three exchange stages for the
    # same answer. Positions inside an island are consecutive, so
    # span_len = end - start + 1.
    spans = (
        cov.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        # 0-based indices where a new island begins (gap in positions)
        .withColumn(
            "st",
            F.expr(
                "filter(sequence(0, size(ps) - 1),"
                " i -> i = 0 OR ps[i - 1] + 1 != ps[i])"
            ),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(st) - 1), k -> struct("
                    " ps[st[k]] AS span_start,"
                    " ps[IF(k + 1 < size(st), st[k + 1] - 1, size(ps) - 1)]"
                    "   AS span_end))"
                )
            ).alias("sp"),
        )
    )
    return spans.select(
        "doc_id",
        F.col("sp.span_start").cast("bigint").alias("span_start"),
        F.col("sp.span_end").cast("bigint").alias("span_end"),
        (F.col("sp.span_end") - F.col("sp.span_start") + 1)
        .cast("bigint")
        .alias("span_len"),
    )


@register(
    "dedup_substring_scrub",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos, array_to_string(t[i:i+{SEED_LEN - 1}], ' ') AS g
            FROM toks, unnest(range(1, len(t) - {SEED_LEN} + 2)) AS r(i)),
        dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        seeds AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN dup USING (g)),
        cov AS (
            SELECT DISTINCT doc_id, pos + j AS p
            FROM seeds, unnest(range(0, {SEED_LEN})) AS rj(j)),
        covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
               -- array_join([]) is '' — a fully-scrubbed doc is ''
               coalesce(array_to_string(list_transform(
                   list_filter(range(1, len(t.t) + 1),
                               i -> c.ps IS NULL OR NOT list_contains(c.ps, i)),
                   i -> t.t[i]), ' '), '') AS clean_text,
               CAST(coalesce(len(c.ps), 0) AS BIGINT) AS n_removed
        FROM toks t LEFT JOIN covl c USING (doc_id)
    """,
    tags=("dedup", "text", "substring", "cleaning"),
)
def dedup_substring_scrub(
    spark: SparkSession, sf_dir: str, seed_len: int = SEED_LEN
) -> DataFrame:
    """The actionable form of dedup_exact_substring: every document
    rebuilt with its duplicated spans REMOVED (conservative scrub — all
    copies go; keep-one-copy is a policy layer over the same span set),
    plus the removed-token count. Span derivation is shared with the
    span query (_covered_positions, same seed_len knob); the only
    additions are a per-doc covered-position set (doc_id-keyed, bounded
    by doc length) and a row-local index-aware filter/rejoin of the
    token array — no new corpus-wide shuffle beyond the single
    gram-hash exchange."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    cov = _covered_positions(docs, seed_len)
    covl = cov.groupBy("doc_id").agg(F.collect_set("p").alias("ps"))
    joined = toks.join(covl, "doc_id", "left")
    keep = F.filter(
        "t",
        lambda x, i: F.col("ps").isNull() | ~F.array_contains("ps", i + F.lit(1)),
    )
    return joined.select(
        "doc_id",
        F.array_join(keep, " ").alias("clean_text"),
        F.when(F.col("ps").isNull(), F.lit(0))
        .otherwise(F.size("ps"))
        .cast("bigint")
        .alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# text_winnowing_fingerprint
# ---------------------------------------------------------------------------

WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 4  # winnowing window (consecutive k-grams per selection)
_POS_PAD = 1_048_576  # 2^20: position tie-break encoding bound


@register(
    "text_winnowing_fingerprint",
    headline=True,  # the fingerprint-selection primitive: per-doc windows
    # + one doc_id exchange — benched as the winnowing family representative
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(t[i:i+{WINNOW_K - 1}], ' ')) AS gh
            FROM toks, unnest(range(1, len(t) - {WINNOW_K} + 2)) AS r(i)),
        keyed AS (
            SELECT doc_id, pos,
                   gh || lpad(CAST({_POS_PAD} - pos AS VARCHAR), 7, '0') AS k
            FROM grams),
        sel AS (
            SELECT doc_id,
                   min(k) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                       AS sk,
                   count(*) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                       AS wn
            FROM keyed)
        SELECT DISTINCT doc_id,
               CAST({_POS_PAD} - CAST(substring(sk, 33, 7) AS BIGINT)
                    AS BIGINT) AS pos,
               substring(sk, 1, 32) AS fp
        FROM sel WHERE wn = {WINNOW_W}
    """,
    tags=("text", "dedup"),
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every overlapping
    WINNOW_K-token gram, slide a WINNOW_W-gram window, and record the
    window minimum (ties -> RIGHTMOST position, per the paper). The
    guarantee: any shared run of WINNOW_K + WINNOW_W - 1 tokens between
    two documents shares a recorded fingerprint, with selection density
    ~2/(w+1) — the locality property ad-hoc 'every n-th gram' sampling
    lacks. The min-with-rightmost-tie is realized as a plain string MIN
    over gh || zero-padded (2^20 - pos), so both engines select
    identical fingerprints with no struct/arg_min ordering semantics in
    play; md5-hex order is a uniform hash order, which is all winnowing
    requires.

    Scale: grams and their hashes are built row-locally from the token
    array (no explode before hashing beyond the per-doc gram list); the
    only shuffle is ONE doc_id exchange feeding both windows and the
    final distinct (same key, Catalyst reuses the sort). Document
    positions are bounded by the 2^20 pad (cap long docs upstream or
    widen the pad at ingest). Downstream near-dup detection is a
    fingerprint equi-join — |selected| ~ 2/(w+1) of grams, never a
    corpus self-join. Cf. dedup_exact_substring for the span-recovery
    sibling (engine-native xxhash64 keys there: hash VALUES never
    surface in its output, while winnowing's selections do, hence the
    portable md5 order here)."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    return winnow_fingerprints(docs)


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing core over any (doc_id, text) frame — split out so the
    semantic pin can drive it with constructed documents."""
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("t") >= WINNOW_K,
                F.expr(
                    f"transform(sequence(1, size(t) - {WINNOW_K} + 1),"
                    f" i -> array_join(slice(t, i, {WINNOW_K}), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), F.md5("g").alias("gh"))
    # loud guard: a doc with >= 2^20 grams would make the (2^20 - pos)
    # pad go negative and corrupt the string-MIN tie-break — fail the
    # job instead of selecting wrong fingerprints (widen _POS_PAD and
    # the 7-digit pad together to lift the limit)
    pos_ok = F.assert_true(
        F.col("pos") < F.lit(_POS_PAD),
        F.lit(
            "winnowing: document exceeds 2^20 - 1 grams; widen _POS_PAD"
        ),
    )
    keyed = grams.select(
        "doc_id",
        F.when(pos_ok.isNull(), F.col("pos")).alias("pos"),
        F.concat(
            F.col("gh"),
            F.lpad((F.lit(_POS_PAD) - F.col("pos")).cast("string"), 7, "0"),
        ).alias("k"),
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = keyed.select(
        "doc_id",
        F.min("k").over(w).alias("sk"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == WINNOW_W)
    return sel.select(
        "doc_id",
        (F.lit(_POS_PAD) - F.substring("sk", 33, 7).cast("bigint"))
        .cast("bigint")
        .alias("pos"),
        F.substring("sk", 1, 32).alias("fp"),
    ).distinct()


# ---------------------------------------------------------------------------
# dedup_winnowing_overlap
# ---------------------------------------------------------------------------

WINNOW_MAX_FP_DF = 10  # drop fingerprints shared by more docs (boilerplate)
WINNOW_OVERLAP_MIN = 500_000  # report pairs with overlap >= 0.5 (micro units)

WINNOW_OVERLAP_ORACLE = f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(t[i:i+{WINNOW_K - 1}], ' ')) AS gh
            FROM toks, unnest(range(1, len(t) - {WINNOW_K} + 2)) AS r(i)),
        keyed AS (
            SELECT doc_id, pos,
                   gh || lpad(CAST({_POS_PAD} - pos AS VARCHAR), 7, '0') AS k
            FROM grams),
        sel AS (
            SELECT doc_id,
                   min(k) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                       AS sk,
                   count(*) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                       AS wn
            FROM keyed),
        fps AS (
            SELECT DISTINCT doc_id, substring(sk, 1, 32) AS fp
            FROM sel WHERE wn = {WINNOW_W}),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fps
                  GROUP BY doc_id),
        rare AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING count(*) BETWEEN 2 AND {WINNOW_MAX_FP_DF}),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM fps a JOIN rare USING (fp)
            JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT p.doc_a, p.doc_b, p.shared, sa.n AS n_a, sb.n AS n_b,
               (p.shared * 1000000) // least(sa.n, sb.n) AS overlap_micro
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        WHERE (p.shared * 1000000) // least(sa.n, sb.n)
              >= {WINNOW_OVERLAP_MIN}
    """



@register(
    "dedup_winnowing_overlap",
    oracle=WINNOW_OVERLAP_ORACLE,
    tags=("dedup", "text"),
)
def dedup_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate PAIRS from shared winnowing fingerprints — the
    matching half of the MOSS pipeline: two documents are flagged when
    the fingerprints they share cover >= 50% of the smaller document's
    sketch (overlap coefficient, scored in exact integer micro-units so
    the threshold never floats). Fingerprints appearing in more than
    WINNOW_MAX_FP_DF documents are dropped before pairing — the same
    boilerplate-stopword guard as MAX_SHINGLE_DF in dedup_ngram_jaccard;
    it is ALSO what bounds the join fan-out (<= df^2 pairs per
    fingerprint), the winnowing analogue of LSH band-bucket capping.

    Scale: sketch sizes are ~2/(w+1) of gram counts, the pair stream is
    keyed on fingerprint (never a corpus self-join), and the pair rollup
    + two size joins shuffle only (doc_a, doc_b, counts). Sizes count
    the FULL sketch (pre-df-filter) so boilerplate-heavy docs aren't
    artificially similar."""
    fps = (
        text_winnowing_fingerprint(spark, sf_dir)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= WINNOW_MAX_FP_DF))
        .select("fp")
    )
    matchable = fps.join(rare, "fp")
    pairs = (
        matchable.select("fp", F.col("doc_id").alias("doc_a"))
        .join(fps.select("fp", F.col("doc_id").alias("doc_b")), "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    return (
        pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "overlap_micro",
            F.expr("(shared * 1000000) div least(n_a, n_b)"),
        )
        .filter(F.col("overlap_micro") >= WINNOW_OVERLAP_MIN)
        .select("doc_a", "doc_b", "shared", "n_a", "n_b", "overlap_micro")
    )


# ---------------------------------------------------------------------------
# dedup_method_agreement
# ---------------------------------------------------------------------------


def _agreement_oracle() -> str:
    from cdc_export_system_spark.dedup.jaccard import JACCARD_PAIRS_ORACLE

    return f"""
        WITH wp AS ({WINNOW_OVERLAP_ORACLE}),
        jp AS ({JACCARD_PAIRS_ORACLE}),
        c AS (
            SELECT CAST((SELECT count(*) FROM jp) AS BIGINT) AS n_jaccard,
                   CAST((SELECT count(*) FROM wp) AS BIGINT) AS n_winnow,
                   CAST((SELECT count(*) FROM jp JOIN wp
                         ON jp.doc_a = wp.doc_a AND jp.doc_b = wp.doc_b)
                        AS BIGINT) AS n_both)
        SELECT n_jaccard AS n_jaccard_pairs, n_winnow AS n_winnow_pairs,
               n_both,
               CASE WHEN n_jaccard > 0
                    THEN CAST((CAST(n_both AS HUGEINT) * 1000000) // n_jaccard
                              AS BIGINT)
               END AS winnow_recall_micro
        FROM c
    """


@register(
    "dedup_method_agreement",
    oracle=_agreement_oracle(),
    tags=("dedup", "text", "dq"),
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-METHOD VALIDATION of the near-dup stack: exact shingle
    Jaccard >= 0.5 (dedup_ngram_jaccard — the expensive ground truth)
    versus the winnowing-overlap detector — how many true near-dup
    pairs does winnowing recover (recall), and how many extra pairs
    does it flag? The methodology audit a multi-detector pipeline
    publishes before trusting the cheap detector at scale; the same
    shape as dedup_minhash_accuracy, applied across METHODS instead of
    across exact-vs-sketch.

    Scale: both legs are the existing pair pipelines unchanged
    (fingerprint-keyed, never corpus self-joins); agreement is one
    pair-keyed join of two reduced pair sets; finals are 1-row counts
    (allowlisted)."""
    from cdc_export_system_spark.dedup.jaccard import dedup_ngram_jaccard

    jp = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    wp = (
        dedup_winnowing_overlap(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_j = jp.agg(F.count(F.lit(1)).cast("bigint").alias("n_jaccard"))
    n_w = wp.agg(F.count(F.lit(1)).cast("bigint").alias("n_winnow"))
    n_b = jp.join(wp, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both")
    )
    return (
        n_j.crossJoin(F.broadcast(n_w))
        .crossJoin(F.broadcast(n_b))
        .select(
            F.col("n_jaccard").alias("n_jaccard_pairs"),
            F.col("n_winnow").alias("n_winnow_pairs"),
            "n_both",
            F.when(
                F.col("n_jaccard") > 0,
                F.expr("(cast(n_both as decimal(38,0)) * 1000000) div n_jaccard"),
            ).alias("winnow_recall_micro"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_threshold_sweep
# ---------------------------------------------------------------------------

SWEEP_THRESHOLDS = (500_000, 600_000, 700_000, 800_000, 900_000, 1_000_000)


@register(
    "dedup_threshold_sweep",
    oracle=f"""
        WITH wp AS ({{W}}),
        th AS (SELECT unnest(ARRAY{list(SWEEP_THRESHOLDS)}) AS threshold)
        SELECT CAST(th.threshold AS BIGINT) AS threshold_micro,
               CAST(count(wp.doc_a) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT wp.doc_a) + count(DISTINCT wp.doc_b)
                    AS BIGINT) AS n_doc_slots
        FROM th LEFT JOIN wp ON wp.overlap_micro >= th.threshold
        GROUP BY th.threshold
    """.replace("{W}", WINNOW_OVERLAP_ORACLE),
    tags=("dedup", "dq", "text"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THRESHOLD TUNING curve for the winnowing detector: how many
    near-dup pairs (and how many involved document slots) survive at
    each overlap cutoff from 0.5 to 1.0 — the attrition-vs-strictness
    readout a curation team consults before committing a dedup
    threshold corpus-wide, computed from ONE pass of the pair pipeline
    (the sweep is a 6-row spine joined onto the already-reduced pair
    table, not six reruns).

    Scale: the pair table is winnowing's output (fingerprint-keyed,
    bounded); the sweep join is |thresholds| x |pairs| of tiny rows."""
    wp = dedup_winnowing_overlap(spark, sf_dir).localCheckpoint(eager=True)
    th = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
        ).alias("threshold")
    )
    j = th.join(
        wp, wp.overlap_micro >= th.threshold, "left"
    )
    return j.groupBy("threshold").agg(
        F.count("doc_a").cast("bigint").alias("n_pairs"),
        (
            F.countDistinct("doc_a") + F.countDistinct("doc_b")
        ).cast("bigint").alias("n_doc_slots"),
    ).select(
        F.col("threshold").cast("bigint").alias("threshold_micro"),
        "n_pairs",
        "n_doc_slots",
    )
