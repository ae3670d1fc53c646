"""Data-quality check suite — the dbt-test / Great-Expectations surface
as one engine operator: every rule is a conditional aggregate, so the
whole suite is ONE pass over each checked table (no per-rule scans),
map-side combined, shuffling only the handful of violation counters.

Rule classes covered: not-null, uniqueness (exact, via distinct-count
equality), accepted-values, range, cross-column monotonicity, and
referential integrity (anti-join cardinality). At 100 TB the
uniqueness and RI rules are the only ones that shuffle (distinct /
join on the key); everything else rides the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register


@register(
    "dq_checks",
    oracle="""
        WITH o AS (
            SELECT count(*) AS n,
                   count(*) FILTER (WHERE o_custkey IS NULL) AS null_cust,
                   count(*) FILTER (WHERE o_totalprice <= 0) AS nonpos_price,
                   count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                       AS bad_status,
                   count(*) - count(DISTINCT o_orderkey) AS dup_orderkey
            FROM orders),
        ri AS (
            SELECT count(*) AS orphan_orders
            FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        li AS (
            SELECT count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                       AS qty_out_of_range,
                   count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                       AS bad_discount,
                   count(*) FILTER (WHERE l_shipdate < o_orderdate)
                       AS ship_before_order
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT v.* FROM (
            SELECT 'orders.o_custkey_not_null' AS rule,
                   CAST(o.null_cust AS BIGINT) AS violations FROM o
            UNION ALL SELECT 'orders.o_totalprice_positive',
                   CAST(o.nonpos_price AS BIGINT) FROM o
            UNION ALL SELECT 'orders.o_orderstatus_accepted_values',
                   CAST(o.bad_status AS BIGINT) FROM o
            UNION ALL SELECT 'orders.o_orderkey_unique',
                   CAST(o.dup_orderkey AS BIGINT) FROM o
            UNION ALL SELECT 'orders.o_custkey_refs_customer',
                   CAST(ri.orphan_orders AS BIGINT) FROM ri
            UNION ALL SELECT 'lineitem.l_quantity_in_1_50',
                   CAST(li.qty_out_of_range AS BIGINT) FROM li
            UNION ALL SELECT 'lineitem.l_discount_in_0_1',
                   CAST(li.bad_discount AS BIGINT) FROM li
            UNION ALL SELECT 'lineitem.no_ship_before_order',
                   CAST(li.ship_before_order AS BIGINT) FROM li
        ) v
    """,
    tags=("quality", "agg", "join"),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the whole rule suite and return (rule, violations) rows — the
    contract a CI gate consumes (suite green iff max(violations) = 0).
    The orders rules compute in ONE aggregate pass; referential
    integrity is a broadcast anti-join count; the lineitem rules ride a
    single orders join (broadcast at test scale, SMJ at warehouse
    scale)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    # orphan detection rides the SAME orders pass as the column rules:
    # a left join against the distinct customer key adds no rows, and a
    # null match IS an orphan — one scan instead of the separate
    # anti-join pass (r11 plan sweep: 3 orders scans -> 2). The
    # distinct() makes the join provably non-expanding even if the
    # customer feed itself carried duplicate keys — this op is the
    # data-quality checker, so it must not assume the inputs pass the
    # checks (r11 advice); one extra dedup on the broadcast side.
    oc = o.join(
        F.broadcast(c.select("c_custkey").distinct()),
        o.o_custkey == F.col("c_custkey"),
        "left",
    )
    o_stats = oc.agg(
        F.count_if(F.col("o_custkey").isNull()).alias("null_cust"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpos_price"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        F.count_if(F.col("c_custkey").isNull()).alias("orphan_orders"),
    )
    li_stats = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count_if(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).alias("qty_out_of_range"),
            F.count_if(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ).alias("bad_discount"),
            F.count_if(F.col("l_shipdate") < F.col("o_orderdate")).alias(
                "ship_before_order"
            ),
        )
    )
    def unpivot(stats: DataFrame, mapping: list[tuple[str, str]]) -> DataFrame:
        # stack() the 1-row stats frame so each source aggregate is
        # computed once, not once per rule row
        args = ", ".join(f"'{rule}', CAST({col} AS BIGINT)" for col, rule in mapping)
        return stats.selectExpr(
            f"stack({len(mapping)}, {args}) AS (rule, violations)"
        )

    return (
        unpivot(
            o_stats,
            [
                ("null_cust", "orders.o_custkey_not_null"),
                ("nonpos_price", "orders.o_totalprice_positive"),
                ("bad_status", "orders.o_orderstatus_accepted_values"),
                ("dup_orderkey", "orders.o_orderkey_unique"),
                ("orphan_orders", "orders.o_custkey_refs_customer"),
            ],
        )
        .unionAll(
            unpivot(
                li_stats,
                [
                    ("qty_out_of_range", "lineitem.l_quantity_in_1_50"),
                    ("bad_discount", "lineitem.l_discount_in_0_1"),
                    ("ship_before_order", "lineitem.no_ship_before_order"),
                ],
            )
        )
    )


# --- distribution drift (PSI) ------------------------------------------------

PSI_REF_SOURCE = "src0"  # reference slice: the already-admitted corpus source
PSI_NBINS = 10
PSI_BIN_WIDTH = 60  # n_chars per bin; last bin open-ended


@register(
    "corpus_drift_psi",
    oracle=f"""
        WITH b AS (
            SELECT source,
                   least(CAST(floor(n_chars / {PSI_BIN_WIDTH}) AS INT),
                         {PSI_NBINS - 1}) AS bin
            FROM documents),
        cnt AS (SELECT source, bin, count(*) AS c FROM b GROUP BY source, bin),
        grid AS (
            SELECT s.source, g.bin
            FROM (SELECT DISTINCT source FROM documents) s,
                 unnest(range(0, {PSI_NBINS})) AS g(bin)),
        filled AS (
            SELECT grid.source, grid.bin, coalesce(cnt.c, 0) AS c
            FROM grid LEFT JOIN cnt
              ON grid.source = cnt.source AND grid.bin = cnt.bin),
        tot AS (SELECT source, sum(c) AS tot FROM filled GROUP BY source),
        p AS (
            SELECT f.source, f.bin,
                   (f.c + 0.5) / (t.tot + {PSI_NBINS} * 0.5) AS p
            FROM filled f JOIN tot t USING (source)),
        r AS (SELECT bin, p AS q FROM p WHERE source = '{PSI_REF_SOURCE}'),
        term AS (
            SELECT p.source, p.bin, (p.p - r.q) * ln(p.p / r.q) AS term
            FROM p JOIN r USING (bin))
        SELECT source,
               floor(list_aggregate(list(term ORDER BY bin), 'sum')
                     * 1000000000 + 0.5) / 1000000000 AS psi
        FROM term GROUP BY source
    """,
    tags=("quality", "stats", "drift"),
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the reference source — the drift monitor a
    curation pipeline runs before admitting a new crawl slice into the
    training mix (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    Semantics pinned for cross-engine parity: fixed-width n_chars bins
    (open-ended last bin), Laplace 0.5 smoothing so empty bins
    contribute finitely, and the 10-term sum folds in BIN ORDER on both
    engines (array_sort + F.aggregate here, list(... ORDER BY bin)
    there) so float accumulation is order-pinned, same as agg_entropy.

    Scale: one scan + a |sources|x|bins| groupBy (map-side combined);
    everything after the first aggregate operates on the tiny
    (source, bin) grid, with the 10-row reference joined by broadcast.
    The bin grid is produced by exploding a literal sequence per source
    — no cartesian join, no driver round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    bin_col = F.least(
        F.floor(F.col("n_chars") / F.lit(PSI_BIN_WIDTH)),
        F.lit(PSI_NBINS - 1).cast("bigint"),
    ).cast("int")
    cnt = docs.groupBy(F.col("source"), bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=True)  # one docs scan: grid/tot/ref all derive
    grid = (
        cnt.select("source")
        .distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(PSI_NBINS - 1))).alias("bin"),
        )
    )
    filled = grid.join(cnt, ["source", "bin"], "left").fillna(0, ["c"])
    tot = filled.groupBy("source").agg(F.sum("c").alias("tot"))
    p = filled.join(tot, "source").withColumn(
        "p", (F.col("c") + F.lit(0.5)) / (F.col("tot") + F.lit(PSI_NBINS * 0.5))
    )
    refp = p.filter(F.col("source") == PSI_REF_SOURCE).select(
        "bin", F.col("p").alias("q")
    )
    term = p.join(F.broadcast(refp), "bin").withColumn(
        "term", (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    )
    return term.groupBy("source").agg(
        (
            F.floor(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("bin", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                )
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000000.0)
        ).alias("psi")
    )


# ---------------------------------------------------------------------------
# dq_benford_digits
# ---------------------------------------------------------------------------


@register(
    "dq_benford_digits",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders),
        cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
                FROM d GROUP BY digit),
        tot AS (SELECT SUM(n_obs) AS n FROM cnt)
        SELECT digit, n_obs,
               floor(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS share,
               floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)
                     * 1000000 + 0.5) / 1000000 AS benford_expected,
               floor((CAST(n_obs AS DOUBLE)
                      - CAST(n AS DOUBLE)
                        * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
                     * (CAST(n_obs AS DOUBLE)
                        - CAST(n AS DOUBLE)
                          * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
                     / (CAST(n AS DOUBLE)
                        * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
                     * 1000000 + 0.5) / 1000000 AS chi2_term
        FROM cnt CROSS JOIN tot
    """,
    tags=("quality", "stats"),
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the order amounts: observed
    leading-digit shares vs the log10(1+1/d) law, with a per-digit
    chi-square contribution — the classic forensic data-quality screen
    for fabricated or truncated monetary columns (a capped or generated
    amount column bends the digit curve long before range checks fire).
    The leading digit is taken from the EXACT integer part (string head
    of the floored bigint — no float log tricks), counts are exact, and
    the expected-share/chi-square expressions are the identical double
    tree in both engines, 1e-6-rounded per digit row.

    Scale: one scan reduced map-side to <=9 digit rows; the 1-row total
    broadcasts back (allowlisted scalar). Nothing else moves."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    cnt = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = cnt.agg(F.sum("n_obs").alias("n"))
    j = cnt.crossJoin(F.broadcast(tot))
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    expected = F.log(F.lit(1.0) + F.lit(1.0) / dd("digit")) / F.log(F.lit(10.0))
    exp_n = dd("n") * expected
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return j.select(
        "digit",
        "n_obs",
        r6(dd("n_obs") / dd("n")).alias("share"),
        r6(expected).alias("benford_expected"),
        r6((dd("n_obs") - exp_n) * (dd("n_obs") - exp_n) / exp_n).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# corpus_js_divergence
# ---------------------------------------------------------------------------

_JS_ORACLE = f"""
    WITH occ AS (
        SELECT source,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents),
    cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM occ WHERE w <> '' GROUP BY source, w),
    tots AS (SELECT source, SUM(c) AS tot FROM cnt GROUP BY source),
    ref AS (SELECT w, c AS cq FROM cnt WHERE source = '{PSI_REF_SOURCE}'),
    reftot AS (SELECT SUM(cq) AS totq FROM ref),
    srcs AS (SELECT DISTINCT source FROM cnt
             WHERE source <> '{PSI_REF_SOURCE}'),
    pairs AS (
        SELECT s.source, r.w, 0 AS c, r.cq
        FROM srcs s CROSS JOIN ref r
        WHERE NOT EXISTS (SELECT 1 FROM cnt c2
                          WHERE c2.source = s.source AND c2.w = r.w)
        UNION ALL
        SELECT c.source, c.w, c.c, COALESCE(r.cq, 0) AS cq
        FROM cnt c LEFT JOIN ref r USING (w)
        WHERE c.source <> '{PSI_REF_SOURCE}'),
    term AS (
        SELECT p.source,
               CAST(floor(
                   (0.5 * (CASE WHEN p.c > 0 THEN
                       (CAST(p.c AS DOUBLE) / CAST(t.tot AS DOUBLE))
                       * ln((CAST(p.c AS DOUBLE) / CAST(t.tot AS DOUBLE))
                            / ((CAST(p.c AS DOUBLE) / CAST(t.tot AS DOUBLE)
                                + CAST(p.cq AS DOUBLE) / CAST(rt.totq AS DOUBLE))
                               / 2.0)) ELSE 0.0 END)
                    + 0.5 * (CASE WHEN p.cq > 0 THEN
                       (CAST(p.cq AS DOUBLE) / CAST(rt.totq AS DOUBLE))
                       * ln((CAST(p.cq AS DOUBLE) / CAST(rt.totq AS DOUBLE))
                            / ((CAST(p.c AS DOUBLE) / CAST(t.tot AS DOUBLE)
                                + CAST(p.cq AS DOUBLE) / CAST(rt.totq AS DOUBLE))
                               / 2.0)) ELSE 0.0 END))
                   * 1000000000 + 0.5) AS BIGINT) AS t_nano
        FROM pairs p
        JOIN tots t USING (source)
        CROSS JOIN reftot rt)
    SELECT source,
           floor(CAST(SUM(t_nano) AS DOUBLE) / 1000 + 0.5) / 1000000
               AS js_divergence
    FROM term GROUP BY source
"""


@register(
    "corpus_js_divergence",
    oracle=_JS_ORACLE,
    tags=("quality", "stats", "drift", "text"),
)
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of every source's TOKEN distribution
    against the reference source — the vocabulary-level drift gate that
    complements corpus_drift_psi's length-histogram view (PSI sees a
    crawl slice getting longer; JS sees it changing WHAT IT SAYS). JS =
    ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2, bounded in [0, ln 2], no
    smoothing needed: a token absent from one side contributes its
    finite ½p·ln2 mass through the other. Each token's term is one
    double expression over exact counts, rounded to 1e-9 BEFORE the
    per-source sum (the chi-square micro-unit discipline), so the float
    fold is order-free integers and partitioning cannot move the score.

    Scale: one token shuffle to (source, token) counts; the reference
    distribution joins on the token axis (token-keyed shuffle join —
    the ref side is vocab-sized, NOT broadcast, because a real corpus
    vocabulary outgrows a broadcast); tokens the source is missing come
    from a |sources|×|ref-vocab| anti-join grid on the same reduced
    axis. Finals are |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    cnt = (
        occ.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # one docs scan: ref/tots/grid derive
    )
    tots = cnt.groupBy("source").agg(F.sum("c").alias("tot"))
    ref = cnt.filter(F.col("source") == PSI_REF_SOURCE).select(
        "w", F.col("c").alias("cq")
    )
    reftot = ref.agg(F.sum("cq").alias("totq"))
    others = cnt.filter(F.col("source") != PSI_REF_SOURCE)
    srcs = others.select("source").distinct()
    missing = (
        srcs.crossJoin(ref)
        .join(others.select("source", "w"), ["source", "w"], "left_anti")
        .select("source", "w", F.lit(0).cast("bigint").alias("c"), "cq")
    )
    present = others.join(ref, "w", "left").select(
        "source", "w", "c", F.coalesce(F.col("cq"), F.lit(0)).alias("cq")
    )
    pairs = present.unionByName(missing)
    j = pairs.join(tots, "source").crossJoin(F.broadcast(reftot))
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    p = dd("c") / dd("tot")
    q = dd("cq") / dd("totq")
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * F.when(F.col("c") > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.lit(0.5) * F.when(F.col("cq") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    t_nano = F.floor(term * 1000000000 + F.lit(0.5)).cast("bigint")
    return (
        j.select("source", t_nano.alias("t_nano"))
        .groupBy("source")
        .agg(
            (
                F.floor(F.sum("t_nano").cast("double") / 1000 + F.lit(0.5)) / 1000000
            ).alias("js_divergence")
        )
    )


# ---------------------------------------------------------------------------
# dq_fk_orphans — referential-integrity audit of the whole star schema
# ---------------------------------------------------------------------------

# (edge label, child table, fk column, parent table, pk column). The
# lineitem edges share one child scan below; the list is the schema's
# complete FK graph (reference seeds the same star via app/seeds).
_FK_EDGES = [
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS edge,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(count(*) FILTER (WHERE {fk} IS NULL) AS BIGINT) AS n_null_fk,
           CAST(count(*) FILTER (WHERE {fk} IS NOT NULL
                AND {fk} NOT IN (SELECT {pk} FROM {parent})) AS BIGINT)
               AS n_orphans
    FROM {child}"""
    for label, child, fk, parent, pk in _FK_EDGES
)


@register(
    "dq_fk_orphans",
    oracle=_FK_ORACLE,
    tags=("quality", "join", "anti"),
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of EVERY foreign-key edge in the star
    schema: per edge, the child row count, NULL-FK count, and orphan
    count (non-NULL FK with no parent row) — the one report that tells
    an ingest pipeline which upstream extract dropped rows. dq_checks
    spot-checks one edge as a CI rule; this is the schema-wide audit.

    Scale: each child table is scanned ONCE per edge group — the three
    lineitem edges share a single scan with three left joins (the true
    dimensions region/nation/part/supplier broadcast; the data-sized
    parents orders/customer join co-keyed SMJ under AQE). Orphan
    detection is a LEFT join + count_if(parent IS NULL), so the parent
    side reduces to its distinct key column before the join and only
    |edges| counter rows ever reach the driver."""
    small_dims = {"region", "nation", "part", "supplier"}
    out = None
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for label, child, fk, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((label, fk, parent, pk))
    for child, edges in by_child.items():
        df = load_table(spark, sf_dir, child)
        aggs = []
        for i, (label, fk, parent, pk) in enumerate(edges):
            pdf = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            df = df.join(
                F.broadcast(pdf) if parent in small_dims else pdf,
                F.col(fk) == F.col(f"__pk{i}"),
                "left",
            )
            aggs.append((label, fk, f"__pk{i}"))
        stats = df.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.count_if(F.col(fk).isNull()).alias(f"null{i}")
                for i, (_, fk, _pk) in enumerate(aggs)
            ],
            *[
                F.count_if(F.col(fk).isNotNull() & F.col(pk).isNull()).alias(
                    f"orph{i}"
                )
                for i, (_, fk, pk) in enumerate(aggs)
            ],
        )
        args = ", ".join(
            f"'{label}', n_child, CAST(null{i} AS BIGINT), CAST(orph{i} AS BIGINT)"
            for i, (label, _fk, _pk) in enumerate(aggs)
        )
        rows = stats.selectExpr(
            f"stack({len(aggs)}, {args}) AS (edge, n_child, n_null_fk, n_orphans)"
        )
        out = rows if out is None else out.unionAll(rows)
    return out


# ---------------------------------------------------------------------------
# dq_null_profile — long-form per-column completeness / cardinality profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

_NULL_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CASE WHEN count(*) = 0 THEN 0.0
                ELSE floor(CAST(count(*) FILTER (WHERE {c} IS NULL) AS DOUBLE)
                           / count(*) * 1000000 + 0.5) / 1000000
           END AS pct_null
    FROM events"""
    for c in _PROFILE_COLS
)


@register(
    "dq_null_profile",
    oracle=_NULL_PROFILE_ORACLE,
    tags=("quality", "agg", "profile"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness + cardinality profile of the events
    stream in LONG form — (column_name, n_rows, n_nulls, n_distinct,
    pct_null) — the per-ingest snapshot a data catalog stores per
    column (profile_table is the wide 1-row cousin over orders). NULL
    share is 1e-6-rounded from exact counts.

    Scale: one aggregate over one scan. The six exact count-distincts
    expand map-side (Spark's multi-distinct Expand multiplies the scan
    rows by |columns| before the partial aggregate); at 100 TB swap
    them for approx_count_distinct — same call shape, sketch-mergeable,
    no Expand (agg_approx_distinct is the registered accuracy-pinned
    variant of that trade)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count_if(F.col(c).isNull()).alias(f"nn_{c}")
            for c in _PROFILE_COLS
        ],
        *[F.countDistinct(F.col(c)).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    args = ", ".join(
        f"'{c}', n_rows, CAST(nn_{c} AS BIGINT), CAST(nd_{c} AS BIGINT), "
        # empty-table guard: 0/0 is an ANSI divide-by-zero error
        f"CASE WHEN n_rows = 0 THEN 0.0 ELSE "
        f"floor(CAST(nn_{c} AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000 END"
        for c in _PROFILE_COLS
    )
    return stats.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {args}) "
        "AS (column_name, n_rows, n_nulls, n_distinct, pct_null)"
    )


# ---------------------------------------------------------------------------
# dq_reconciliation — cross-table aggregate reconciliation audit
# ---------------------------------------------------------------------------


@register(
    "dq_reconciliation",
    oracle="""
        WITH li AS (
            SELECT l_orderkey,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                       AS li_cents
            FROM lineitem GROUP BY l_orderkey),
        d AS (
            SELECT o.o_orderstatus,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       - li.li_cents AS delta_cents,
                   li.l_orderkey IS NULL AS missing
            FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (WHERE missing) AS BIGINT) AS n_no_lineitems,
               CAST(count(*) FILTER (WHERE NOT missing
                    AND abs(delta_cents) <= 1) AS BIGINT) AS n_reconciled,
               CAST(COALESCE(SUM(delta_cents) FILTER (WHERE NOT missing), 0)
                    AS BIGINT) AS sum_delta_cents,
               CAST(COALESCE(MAX(abs(delta_cents)) FILTER (WHERE NOT missing), 0)
                    AS BIGINT) AS max_abs_delta_cents
        FROM d GROUP BY o_orderstatus
    """,
    tags=("quality", "join", "agg"),
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table AGGREGATE RECONCILIATION: does each order header's
    total match its lineitem rollup (extendedprice x (1-discount) x
    (1+tax))? The audit every finance-grade warehouse runs between a
    summary table and its detail table after ingest — reported per
    order status as counts of headerless/reconciled orders plus the
    exact signed drift, so a broken extract shows up as a number, not
    a hunch. All money flows through the exact-cents discipline
    (identical floor(x*100+0.5) trees in both engines, bigint sums),
    so the report hash-matches bit-for-bit.

    Scale: one lineitem scan reduced map-side to |orders| rollup rows,
    one co-keyed LEFT join (SMJ under AQE at warehouse scale), one
    |statuses| rollup. Nothing else moves."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    li_cents = (
        li.select(
            "l_orderkey",
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
                * 100
                + F.lit(0.5)
            ).cast("bigint").alias("c"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("c").alias("li_cents"))
    )
    d = o.join(li_cents, o.o_orderkey == li_cents.l_orderkey, "left").select(
        "o_orderstatus",
        (
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            - F.col("li_cents")
        ).alias("delta_cents"),
        F.col("l_orderkey").isNull().alias("missing"),
    )
    not_missing = ~F.col("missing")
    return d.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("missing")).alias("n_no_lineitems"),
        F.count_if(not_missing & (F.abs(F.col("delta_cents")) <= 1)).alias(
            "n_reconciled"
        ),
        F.coalesce(
            F.sum(F.when(not_missing, F.col("delta_cents"))), F.lit(0)
        ).cast("bigint").alias("sum_delta_cents"),
        F.coalesce(
            F.max(F.when(not_missing, F.abs(F.col("delta_cents")))), F.lit(0)
        ).cast("bigint").alias("max_abs_delta_cents"),
    )


# ---------------------------------------------------------------------------
# dq_outlier_iqr
# ---------------------------------------------------------------------------


@register(
    "dq_outlier_iqr",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events),
        q AS (
            SELECT event_type,
                   percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS q1,
                   percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS q3
            FROM c GROUP BY event_type)
        SELECT c.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN 2 * c.c < 2 * q.q1 - 3 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               CAST(SUM(CASE WHEN 2 * c.c > 2 * q.q3 + 3 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(min(q.q1) AS DOUBLE) / 100 AS q1,
               CAST(min(q.q3) AS DOUBLE) / 100 AS q3
        FROM c JOIN q ON c.event_type = q.event_type
        GROUP BY c.event_type
    """,
    tags=("dq", "stats", "percentile"),
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type: values beyond
    [q1 - 1.5*IQR, q3 + 1.5*IQR] counted per tail — the boxplot rule,
    the third member of the outlier toolkit (anomaly_zscore is
    moment-based, anomaly_mad is median-absolute). The half in 1.5*IQR
    never becomes a float: the fence test is multiplied through by 2
    (2c < 2q1 - 3*IQR), so membership is pure integer comparison on
    exact cents, and the quartiles are percentile_disc data elements.

    Scale: one event_type shuffle for the |types|-row quartile table,
    broadcast back onto the scan, one combinable count pass."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    c = ev.select("event_type", cents.alias("c"))
    q = c.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    low = 2 * F.col("c") < 2 * F.col("q1") - 3 * iqr
    high = 2 * F.col("c") > 2 * F.col("q3") + 3 * iqr
    return (
        c.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(low.cast("int")).cast("bigint").alias("n_low"),
            F.sum(high.cast("int")).cast("bigint").alias("n_high"),
            (F.min("q1").cast("double") / 100).alias("q1"),
            (F.min("q3").cast("double") / 100).alias("q3"),
        )
    )


# ---------------------------------------------------------------------------
# dq_key_skew_report
# ---------------------------------------------------------------------------

SKEW_TOP_K = 20


@register(
    "dq_key_skew_report",
    oracle=f"""
        WITH k AS (
            SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_orderkey),
        t AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM k),
        top AS (
            SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key) AS rk
            FROM k)
        SELECT top.rk AS rank, top.key, top.cnt,
               CAST((CAST(top.cnt AS HUGEINT) * 1000000) // t.n_rows AS BIGINT)
                   AS share_micro,
               CAST((CAST(top.cnt AS HUGEINT) * t.n_keys * 1000000) // t.n_rows
                    AS BIGINT) AS skew_x_micro
        FROM top CROSS JOIN t
        WHERE top.rk <= {SKEW_TOP_K}
    """,
    tags=("dq", "agg", "analytics"),
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW diagnostics — the report you run before deciding
    between a plain shuffle join, salting, or AQE skew handling: the
    top-k heaviest join keys with each key's share of all rows and its
    skew factor (count / average-count, in exact integer micro-units
    via multiply-before-divide). A skew_x of 1,000,000 means perfectly
    uniform; the salting threshold is a straight integer comparison on
    this column.

    Scale: one map-combined count to the |keys| axis, a TakeOrdered
    top-k (never a global sort), and a 1-row totals broadcast. The
    report is O(k) rows regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=True)
    t = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = (
        k.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(SKEW_TOP_K)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("key"))).cast("bigint"),
        )
    )
    return top.crossJoin(F.broadcast(t)).select(
        "rank",
        "key",
        "cnt",
        F.expr("(cast(cnt as decimal(38,0)) * 1000000) div n_rows").alias(
            "share_micro"
        ),
        # DECIMAL (oracle: HUGEINT): cnt*n_keys*1e6 is rows*keys-scaled
        F.expr(
            "(cast(cnt as decimal(38,0)) * n_keys * 1000000) div n_rows"
        ).alias("skew_x_micro"),
    )
