"""Partitioned-sink pins: directory layout, round-trip fidelity, and —
the scale-critical property — partition pruning visible in the physical
plan (PartitionFilters at the scan, not just row-group PushedFilters)."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from cdc_export_system_spark.io.parquet_sink import (
    read_pruned_month,
    write_events_by_month,
)
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR


def test_partitioned_write_layout_roundtrip_and_pruning(spark, tmp_path):
    path = write_events_by_month(spark, SF_DIR, str(tmp_path))

    # one directory per month value, hive-style
    months = sorted(d for d in os.listdir(path) if d.startswith("event_month="))
    assert months, "no partition directories written"

    # round trip: same rows as source
    src_n = load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(path).count() == src_n

    # pruning: the month filter must land in PartitionFilters and the
    # pruned scan must read only that directory's rows
    month = months[0].split("=", 1)[1]
    df = read_pruned_month(spark, path, month)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf and "event_month" in pf[0], plan

    expected = (
        load_table(spark, SF_DIR, "events")
        .filter(F.date_format("ts", "yyyy-MM") == month)
        .count()
    )
    assert df.count() == expected


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A fact table partitioned on the join key + a filtered broadcast dim
    must plan a dynamic-partition-pruning subquery on the fact scan: at
    100 TB this is the difference between scanning every date partition
    and only the dim-selected ones."""
    from cdc_export_system_spark.io.sources import load_table

    fact_path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_DIR, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(fact_path)

    dim_path = str(tmp_path / "status_dim")
    spark.createDataFrame(
        [("O", "keep"), ("F", "drop"), ("P", "drop")], ["status", "category"]
    ).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    # a *selective equality* predicate on the dim side is what the DPP rule
    # looks for (a bare boolean-attribute filter does not qualify)
    dim = spark.read.parquet(dim_path).filter("category = 'keep'")
    joined = fact.join(dim, fact.o_orderstatus == dim.status)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result is the expected partition only
    assert joined.select("o_orderstatus").distinct().collect()[0][0] == "O"


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """Re-landing one day must replace exactly that day's directory:
    siblings untouched, the touched day fully swapped (no stale rows
    merged in) — where a plain static overwrite of the same frame would
    instead have truncated the whole table root."""
    from cdc_export_system_spark.io.parquet_sink import overwrite_partitions_dynamic
    from cdc_export_system_spark.io.sources import load_table
    from tests.conftest import SF_DIR

    from cdc_export_system_spark.io.parquet_sink import write_partitioned

    daily = load_table(spark, SF_DIR, "events").withColumn(
        "event_day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(daily, path, ["event_day"])
    before = spark.read.parquet(path)
    days = sorted(r["event_day"] for r in before.select("event_day").distinct().collect())
    assert len(days) >= 2, "fixture needs >= 2 days"
    target, keep = days[0], days[1:]
    before_keep = before.filter(F.col("event_day").isin(keep)).count()

    # re-land the target day with values doubled (a correction)
    fixed = daily.filter(F.col("event_day") == target).withColumn(
        "value", F.col("value") * 2
    )
    n_fixed = fixed.count()
    overwrite_partitions_dynamic(fixed, path, ["event_day"])

    after = spark.read.parquet(path)
    assert after.filter(F.col("event_day").isin(keep)).count() == before_keep
    got = after.filter(F.col("event_day") == target)
    assert got.count() == n_fixed
    # the corrected values landed (no stale copy of the day survives)
    orig_sum = (
        daily.filter(F.col("event_day") == target)
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s"))
        .collect()[0]["s"]
    )
    new_sum = got.agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s")).collect()[0]["s"]
    assert new_sum == orig_sum * 2
    # conf restored (session unchanged for later static writes)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") != "dynamic"


def test_dynamic_partition_overwrite_with_empty_frame_is_a_noop(spark, tmp_path):
    """An empty correction frame (the quiet-hours case) must leave every
    existing partition in place — dynamic mode only replaces partitions
    PRESENT in the incoming data, and none are."""
    from cdc_export_system_spark.io.parquet_sink import (
        overwrite_partitions_dynamic,
        write_partitioned,
    )
    from cdc_export_system_spark.io.sources import load_table
    from tests.conftest import SF_DIR

    daily = load_table(spark, SF_DIR, "events").withColumn(
        "event_day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(daily, path, ["event_day"])
    n_before = spark.read.parquet(path).count()
    overwrite_partitions_dynamic(daily.limit(0), path, ["event_day"])
    assert spark.read.parquet(path).count() == n_before
