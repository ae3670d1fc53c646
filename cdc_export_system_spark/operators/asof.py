"""As-of join — an operator Spark lacks natively (SURVEY.md §2.3 range
join family; the reference's watermark lookup is the 1-row special case).

Semantics: for each left row, the single right row with the greatest
right.ts <= left.ts within the same key (ties on ts broken by greatest
event_id — made explicit so the result is deterministic).

Implementation is the union + running-max window, NOT a range join:
union both sides tagged, sort once per key by (ts, side, id), and carry
the latest right row forward with a running max over an encoded
(ts, id) key. One shuffle + one sort per key — O(n log n) per key and
skew-safe, where an inequality join would degenerate to a per-key cross
product. (pd.merge_asof per group via applyInPandas is the alternative;
the window form keeps everything JVM-side.)

The (ts, id) encoding packs both into one DECIMAL(38,0) so a plain
max() works: offset-microseconds * 2^20 + id (oracle: HUGEINT). The
round-8 int-product lint caught the original BIGINT packing: its real
horizon was offset-us < 2^43 — about 101 DAYS past the epoch base, not
the "~278 years" the old comment claimed (a seconds-vs-micros slip) —
after which both engines raise on overflow. DECIMAL(38,0) holds
offset-us * 2^20 for ~4.7e12 years; the id < 2^20 per-key contract is
unchanged and still asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

EPOCH_BASE = "2024-01-01 00:00:00"
ID_BITS = 20
_ENC_DEC = "decimal(38,0)"


def _enc_col(ts_col: str, rid_col: str, epoch_base: str):
    """(offset-us, id) packed into DECIMAL(38,0): overflow-free at any
    realistic time horizon (see module docstring)."""
    off = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lit(epoch_base).cast("timestamp")
    )
    return off.cast(_ENC_DEC) * F.lit(1 << ID_BITS) + F.col(rid_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    epoch_base: str = EPOCH_BASE,
) -> DataFrame:
    """left columns + matched_ts/matched_id of the as-of right row."""
    enc = _enc_col("__ts", "__rid", epoch_base)
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.col(right_id).alias("__rid"),
        F.lit(1).alias("__is_right"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__enc", F.when(F.col("__is_right") == 1, enc)
    )
    # right rows sort before left rows at equal ts (as-of is inclusive <=)
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", F.col("__is_right").desc(), F.col("__rid"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__match", F.max("__enc").over(w))
    out_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("__is_right") == 0)
        .withColumn(
            "matched_ts",
            # integer div: the encoded value exceeds double's exact range
            F.timestamp_micros(
                F.expr(f"__match div {1 << ID_BITS}")
                + F.unix_micros(F.lit(epoch_base).cast("timestamp"))
            ),
        )
        .withColumn("matched_id", (F.col("__match") % (1 << ID_BITS)).cast("long"))
        .select(*out_cols, "matched_ts", "matched_id")
    )


@register(
    "join_asof",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id AS k, ts, event_id,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_right,
                   event_type,
                   CASE WHEN event_type = 'view'
                        THEN CAST(epoch_us(ts)
                                  - epoch_us(TIMESTAMP '{EPOCH_BASE}')
                                  AS HUGEINT)
                             * {1 << ID_BITS} + event_id END AS enc
            FROM events WHERE event_type IN ('purchase', 'view')),
        carried AS (
            SELECT *, max(enc) OVER (PARTITION BY k ORDER BY ts, is_right DESC, event_id
                                     ROWS UNBOUNDED PRECEDING) AS match
            FROM tagged)
        SELECT event_id, k AS user_id, ts,
               TIMESTAMP '{EPOCH_BASE}' + to_microseconds(
                   CAST(match // {1 << ID_BITS} AS BIGINT))
                   AS matched_ts,
               CAST(match % {1 << ID_BITS} AS BIGINT) AS matched_id
        FROM carried WHERE is_right = 0
    """,
    headline=True,
    tags=("join", "asof", "window"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's most recent view at-or-before
    it (NULL match when the user never viewed)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join(purchases, views, "user_id", "ts", "ts", "event_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    epoch_base: str = EPOCH_BASE,
) -> DataFrame:
    """Forward as-of: the EARLIEST right row with right.ts >= left.ts
    (ties on ts broken by least event_id). Mirror of asof_join: same
    union + one window, but a running MIN over the FOLLOWING frame, with
    right rows ordered after left at equal ts so 'at-or-after' is
    inclusive. Same single shuffle/sort; same skew-safety argument."""
    enc = _enc_col("__ts", "__rid", epoch_base)
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.col(right_id).alias("__rid"),
        F.lit(1).alias("__is_right"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "__enc", F.when(F.col("__is_right") == 1, enc)
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", F.col("__is_right").asc(), F.col("__rid"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.withColumn("__match", F.min("__enc").over(w))
    out_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("__is_right") == 0)
        .withColumn(
            "matched_ts",
            F.timestamp_micros(
                F.expr(f"__match div {1 << ID_BITS}")
                + F.unix_micros(F.lit(epoch_base).cast("timestamp"))
            ),
        )
        .withColumn("matched_id", (F.col("__match") % (1 << ID_BITS)).cast("long"))
        .select(*out_cols, "matched_ts", "matched_id")
    )


@register(
    "join_asof_forward",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id AS k, ts, event_id,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_right,
                   CASE WHEN event_type = 'view'
                        THEN CAST(epoch_us(ts)
                                  - epoch_us(TIMESTAMP '{EPOCH_BASE}')
                                  AS HUGEINT)
                             * {1 << ID_BITS} + event_id END AS enc
            FROM events WHERE event_type IN ('purchase', 'view')),
        carried AS (
            SELECT *, min(enc) OVER (PARTITION BY k ORDER BY ts, is_right, event_id
                                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                          AS match
            FROM tagged)
        SELECT event_id, k AS user_id, ts,
               TIMESTAMP '{EPOCH_BASE}' + to_microseconds(
                   CAST(match // {1 << ID_BITS} AS BIGINT))
                   AS matched_ts,
               CAST(match % {1 << ID_BITS} AS BIGINT) AS matched_id
        FROM carried WHERE is_right = 0
    """,
    tags=("join", "asof", "window"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's next view at-or-after it
    (NULL when none follows) — the 'what did they do next' direction,
    e.g. post-purchase engagement windows."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join_forward(purchases, views, "user_id", "ts", "ts", "event_id")


@register(
    "join_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        ranked AS (
            SELECT p.event_id, p.user_id, p.ts,
                   c.ts AS nearest_ts, c.event_id AS nearest_id,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                                CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                                CASE WHEN c.ts <= p.ts THEN -c.event_id
                                     ELSE c.event_id END
                   ) AS rn
            FROM p LEFT JOIN c ON p.user_id = c.user_id)
        SELECT event_id, user_id, ts, nearest_ts, nearest_id,
               epoch_us(nearest_ts) - epoch_us(ts) AS signed_gap_us
        FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "window"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: for each purchase, the user's click closest in
    time in EITHER direction (ties to the earlier side, then the as-of
    tie-break of each side). The scale shape composes both as-of
    directions from ONE union + ONE sort: backward candidate = running
    max over the preceding frame, forward candidate = running min over
    the following frame — the two window aggregates share the sort order,
    so a single exchange and a single per-key sort serve both. The
    per-row comparison then picks the nearer candidate with no join at
    all, where the naive form (and the oracle) cross-matches every
    purchase against every click of the user and ranks by absolute gap.

    At equal timestamps rights sort before lefts, so backward is
    inclusive (gap 0) and forward strict — equivalent, since a gap-0
    backward match beats any forward one under the tie rule."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("purchase", "click"))
    is_right = (F.col("event_type") == "click").cast("int")
    enc = _enc_col("ts", "event_id", EPOCH_BASE)
    tagged = base.select(
        "event_id",
        "user_id",
        "ts",
        is_right.alias("__is_right"),
        F.when(is_right == 1, enc).alias("__enc"),
    )
    order = W.partitionBy("user_id").orderBy(
        "ts", F.col("__is_right").desc(), "event_id"
    )
    carried = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "__is_right",
        F.max("__enc")
        .over(order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("__b"),
        F.min("__enc")
        .over(order.rowsBetween(W.currentRow, W.unboundedFollowing))
        .alias("__f"),
    ).filter(F.col("__is_right") == 0)
    base_us = F.unix_micros(F.lit(EPOCH_BASE).cast("timestamp"))
    b_ts = F.timestamp_micros(F.expr(f"__b div {1 << ID_BITS}") + base_us)
    f_ts = F.timestamp_micros(F.expr(f"__f div {1 << ID_BITS}") + base_us)
    b_gap = F.unix_micros(F.col("ts")) - F.unix_micros(b_ts)
    f_gap = F.unix_micros(f_ts) - F.unix_micros(F.col("ts"))
    use_b = F.col("__b").isNotNull() & (F.col("__f").isNull() | (b_gap <= f_gap))
    nearest_ts = F.when(use_b, b_ts).otherwise(f_ts)
    nearest_enc = F.when(use_b, F.col("__b")).otherwise(F.col("__f"))
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        nearest_ts.alias("nearest_ts"),
        (nearest_enc % (1 << ID_BITS)).cast("long").alias("nearest_id"),
        (F.unix_micros(nearest_ts) - F.unix_micros(F.col("ts"))).alias("signed_gap_us"),
    )


ASOF_TOLERANCE = "INTERVAL 6 HOUR"
ASOF_TOLERANCE_US = 6 * 3600 * 1_000_000


@register(
    "join_asof_tolerance",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id AS k, ts, event_id,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_right,
                   CASE WHEN event_type = 'view'
                        THEN CAST(epoch_us(ts)
                                  - epoch_us(TIMESTAMP '{EPOCH_BASE}')
                                  AS HUGEINT)
                             * {1 << ID_BITS} + event_id END AS enc
            FROM events WHERE event_type IN ('purchase', 'view')),
        carried AS (
            SELECT *, max(enc) OVER (PARTITION BY k ORDER BY ts, is_right DESC, event_id
                                     ROWS UNBOUNDED PRECEDING) AS match
            FROM tagged),
        decoded AS (
            SELECT event_id, k AS user_id, ts,
                   TIMESTAMP '{EPOCH_BASE}' + to_microseconds(
                   CAST(match // {1 << ID_BITS} AS BIGINT))
                       AS m_ts,
                   CAST(match % {1 << ID_BITS} AS BIGINT) AS m_id
            FROM carried WHERE is_right = 0)
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= {ASOF_TOLERANCE_US}
                    THEN m_ts END AS matched_ts,
               CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= {ASOF_TOLERANCE_US}
                    THEN m_id END AS matched_id
        FROM decoded
    """,
    tags=("join", "asof", "window"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join (pandas merge_asof's ``tolerance``):
    the most recent view at-or-before each purchase, but only if it is
    within 6 hours — older matches become NULL (stale state must not
    attribute). Same single union + sort + running-max plan as join_asof;
    the tolerance is a pure post-projection CASE, so the bound costs
    nothing and the window state stays O(1) per key. (A pre-filter could
    not express this: which right rows are 'too old' depends on each
    left row's own timestamp.)"""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    matched = asof_join(purchases, views, "user_id", "ts", "ts", "event_id")
    in_tol = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
    ) <= ASOF_TOLERANCE_US
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("matched_ts")).alias("matched_ts"),
        F.when(in_tol, F.col("matched_id")).alias("matched_id"),
    )
