"""Privacy-audit operators: k-anonymity, l-diversity, and
quasi-identifier uniqueness risk.

North-star extension: a training-data pipeline that exports user
records (the reference's whole purpose — `app/services/exports.py`
ships consumer CSVs of user rows) owes its operators an answer to
"how re-identifiable is this export?". These are the three standard
audit queries (Sweeney's k-anonymity, Machanavajjhala's l-diversity,
and raw QI-combination uniqueness), each a plain grouped aggregate —
cheap enough to run on every export.

Quasi-identifiers here: (nation, market segment, coarse balance
bucket) on `customer`; the "sensitive" attribute for l-diversity is
the market segment under the coarser (nation, bucket) QI. At 100 TB
these are two-level keyed aggregations (QI group -> distribution
rollup) with map-side combine; nothing shuffles more than the QI
group axis, and the output is O(distinct group sizes), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.registry import register

BUCKET = 1000.0  # balance coarsening for the QI


def _qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / BUCKET).cast("bigint").alias("bal_bucket"),
    )


_SQL_QI = f"""
    qi AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / {BUCKET}) AS BIGINT) AS bal_bucket
        FROM customer)
"""


@register(
    "privacy_k_anonymity",
    oracle=f"""
        WITH {_SQL_QI},
        groups AS (
            SELECT count(*) AS group_size
            FROM qi GROUP BY c_nationkey, c_mktsegment, bal_bucket)
        SELECT CAST(group_size AS BIGINT) AS group_size,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(group_size * count(*) AS BIGINT) AS n_rows
        FROM groups GROUP BY group_size
    """,
    tags=("privacy", "agg"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymity census: histogram of QI-group sizes. A release
    is k-anonymous iff min(group_size) >= k; the rows in size-1 groups
    are exactly re-identifiable. Two keyed aggregates; the second runs
    on the |groups| axis."""
    groups = (
        _qi(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return groups.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        (F.col("group_size") * F.count(F.lit(1))).cast("bigint").alias("n_rows"),
    ).select(F.col("group_size").cast("bigint"), "n_groups", "n_rows")


@register(
    "privacy_l_diversity",
    oracle=f"""
        WITH {_SQL_QI},
        groups AS (
            SELECT c_nationkey, bal_bucket,
                   count(DISTINCT c_mktsegment) AS l
            FROM qi GROUP BY c_nationkey, bal_bucket)
        SELECT CAST(l AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS n_groups
        FROM groups GROUP BY l
    """,
    tags=("privacy", "agg"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census under the coarser (nation, bucket) QI with
    market segment as the sensitive attribute: how many QI groups
    carry only l distinct sensitive values. l = 1 groups leak the
    sensitive attribute outright even when k-anonymous."""
    groups = (
        _qi(spark, sf_dir)
        .groupBy("c_nationkey", "bal_bucket")
        .agg(F.countDistinct("c_mktsegment").alias("l"))
    )
    return groups.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups")
    ).select(F.col("l").cast("bigint"), "n_groups")


@register(
    "privacy_uniqueness_risk",
    oracle=f"""
        WITH {_SQL_QI},
        u1 AS (SELECT count(*) AS uniq FROM (
                   SELECT 1 FROM qi GROUP BY c_nationkey
                   HAVING count(*) = 1)),
        u2 AS (SELECT count(*) AS uniq FROM (
                   SELECT 1 FROM qi GROUP BY c_nationkey, c_mktsegment
                   HAVING count(*) = 1)),
        u3 AS (SELECT count(*) AS uniq FROM (
                   SELECT 1 FROM qi
                   GROUP BY c_nationkey, c_mktsegment, bal_bucket
                   HAVING count(*) = 1)),
        n AS (SELECT count(*) AS total FROM qi)
        SELECT v.qi_set, CAST(v.uniq AS BIGINT) AS n_unique_rows,
               v.uniq / n.total AS share
        FROM (SELECT 'nation' AS qi_set, uniq FROM u1
              UNION ALL SELECT 'nation+segment', uniq FROM u2
              UNION ALL SELECT 'nation+segment+bucket', uniq FROM u3) v, n
    """,
    tags=("privacy", "agg"),
)
def privacy_uniqueness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness risk ladder: how many records become unique as the
    adversary's QI knowledge widens. The share column is the canonical
    re-identification risk estimate per QI set — the number that
    decides whether an export needs further coarsening."""
    # the narrow QI projection feeds the total and all three ladder
    # rungs — materialized once instead of four customer scans (r11
    # plan sweep)
    qi = _qi(spark, sf_dir).localCheckpoint(eager=True)
    total = qi.agg(F.count(F.lit(1)).alias("total"))

    def uniq(label, keys):
        return (
            qi.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == 1)
            .agg(F.count(F.lit(1)).alias("uniq"))
            .select(F.lit(label).alias("qi_set"), "uniq")
        )

    ladder = (
        uniq("nation", ["c_nationkey"])
        .unionAll(uniq("nation+segment", ["c_nationkey", "c_mktsegment"]))
        .unionAll(
            uniq(
                "nation+segment+bucket",
                ["c_nationkey", "c_mktsegment", "bal_bucket"],
            )
        )
    )
    return ladder.crossJoin(F.broadcast(total)).select(
        "qi_set",
        F.col("uniq").cast("bigint").alias("n_unique_rows"),
        (F.col("uniq") / F.col("total")).alias("share"),
    )
