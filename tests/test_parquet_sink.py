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
