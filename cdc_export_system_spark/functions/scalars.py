"""Scalar function surface (SURVEY.md §2.8).

The reference's scalar functions are Python driver-side: isoformat
timestamp serialization (reference: app/services/exports.py:52-53),
filename stamping (app/main.py:32), consumer-id sanitization
(app/main.py:33), timestamp arithmetic and clamping in the seeder
(app/seed_users.py:48-58). Here they are JVM-side column expressions so
they run inside whole-stage codegen, never a Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

# .isoformat() of a UTC-aware Python datetime: microseconds + +00:00 offset
# (exports.py:52-53). DuckDB's %f prints 6-digit micros; we append the fixed
# UTC offset explicitly in both engines.
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
COMPACT_FMT = "yyyyMMdd'T'HHmmss'Z'"  # filename stamp (app/main.py:32)


def iso_utc(col: Column) -> Column:
    """ISO-8601 serialization matching datetime.isoformat() under UTC."""
    return F.concat(F.date_format(col, ISO_FMT), F.lit("+00:00"))


def compact_stamp(col: Column) -> Column:
    """%Y%m%dT%H%M%SZ filename stamp (app/main.py:32)."""
    return F.date_format(col, COMPACT_FMT)


def sanitize_id(col: Column) -> Column:
    """Consumer-id sanitization: spaces -> underscores (app/main.py:33)."""
    return F.regexp_replace(col, " ", "_")


@register(
    "fn_ts_isoformat",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS ts_iso
        FROM events WHERE event_id < 100
    """,
    tags=("function",),
)
def fn_ts_isoformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp -> ISO-8601 string (exports.py:52-53 CSV serialization)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select("event_id", iso_utc(F.col("ts")).alias("ts_iso"))


@register(
    "fn_ts_strftime_compact",
    oracle="""
        SELECT event_id, strftime(ts, '%Y%m%dT%H%M%SZ') AS stamp
        FROM events WHERE event_id < 100
    """,
    tags=("function",),
)
def fn_ts_strftime_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compact filename stamp %Y%m%dT%H%M%SZ
    (app/main.py:32) as date_format."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select("event_id", compact_stamp(F.col("ts")).alias("stamp"))


@register(
    "fn_str_replace",
    oracle="""
        SELECT o_orderkey, replace(o_orderpriority, ' ', '_') AS sanitized
        FROM orders WHERE o_orderkey < 200
    """,
    tags=("function",),
)
def fn_str_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String sanitize (app/main.py:33 ' '->'_')."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select("o_orderkey", sanitize_id(F.col("o_orderpriority")).alias("sanitized"))


@register(
    "fn_ts_arith",
    oracle="""
        SELECT event_id,
               ts + INTERVAL 3 DAY AS ts_plus3d,
               least(ts + INTERVAL 3 DAY, TIMESTAMP '2024-01-31 00:00:00') AS ts_clamped
        FROM events WHERE event_id < 100
    """,
    tags=("function",),
)
def fn_ts_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp +interval and clamp (seeder update-lag logic,
    app/seed_users.py:48-58: updated_at = created_at + U(0..3d) clamped
    to now)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    plus = F.col("ts") + F.expr("INTERVAL 3 DAYS")
    clamp = F.least(plus, F.lit("2024-01-31 00:00:00").cast("timestamp"))
    return ev.select("event_id", plus.alias("ts_plus3d"), clamp.alias("ts_clamped"))


@register(
    "fn_bool_ts_eq",
    oracle="""
        SELECT event_id,
               (event_type = 'click') AS is_click,
               (date_trunc('day', ts) = TIMESTAMP '2024-01-15 00:00:00') AS is_jan15
        FROM events WHERE event_id < 200
    """,
    tags=("function",),
)
def fn_bool_ts_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality comparisons of the kind driving the delta operation
    classifier (exports.py:40-42)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        (F.col("event_type") == "click").alias("is_click"),
        (F.date_trunc("day", F.col("ts")) == F.lit("2024-01-15 00:00:00").cast("timestamp")).alias(
            "is_jan15"
        ),
    )


@register(
    "fn_math_suite",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_rounded,
               CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
               abs(l_extendedprice - 30000.0) AS dist_from_30k,
               CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
        FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("function",),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic scalar surface (round/floor/abs/mod) — all codegen'd."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor(x*100+0.5)/100, not round(): Spark rounds the shortest
        # string repr of a double (HALF_UP), DuckDB the binary value —
        # they disagree on .xx5 ties. This form is pure IEEE in both.
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100).alias(
            "net_rounded"
        ),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_from_30k"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@register(
    "fn_bitwise_conditional",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 4096 AS bor,
               xor(o_orderkey, o_custkey) AS bxor,
               (o_orderkey & 15) << 3 AS shl,
               o_orderkey >> 4 AS shr,
               CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
                    ELSE 'other' END AS status_class,
               nullif(o_orderstatus, 'O') AS status_or_null,
               coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_coalesced,
               greatest(o_totalprice, 100000.0) AS hi,
               least(o_totalprice, 100000.0) AS lo
        FROM orders
    """,
    tags=("function", "scalar"),
)
def fn_bitwise_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (&,|,^,shifts) and conditional (CASE/nullif/coalesce/
    greatest/least) scalar surface — all codegen-resident expressions."""
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(c).alias("bxor"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 3).alias("shl"),
        F.shiftright(k, 4).alias("shr"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "filled")
        .otherwise("other")
        .alias("status_class"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("none")).alias(
            "status_coalesced"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("lo"),
    )


@register(
    "fn_try_suite",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / NULLIF(l_quantity - 25, 0) AS price_per_extra,
               TRY_CAST(l_returnflag AS INT) AS flag_as_int,
               TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS line_roundtrip,
               CAST(NULL AS BIGINT) AS overflow_sum
        FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    tags=("function", "scalar"),
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-handling surface: try_divide / try_cast / try_add
    return NULL instead of failing — the semantics a 100 TB pipeline
    needs (one malformed row must not kill a 10-hour job). The oracle
    spells the same semantics with NULLIF / TRY_CAST / a known-overflow
    NULL."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "price_per_extra"
        ),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("line_roundtrip"),
        F.expr("try_add(CAST(9223372036854775807 AS BIGINT), l_orderkey + 1)").alias(
            "overflow_sum"
        ),
    )
