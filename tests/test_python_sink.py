"""Pins for the custom Python DataSourceWriter CSV sink
(io/python_sink.py): staged parts, manifest publication, abort hygiene."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_export_system_spark.io.python_sink import register_csvdir
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR


def _manifest(path: str) -> dict[str, int]:
    with open(os.path.join(path, "_SUCCESS")) as f:
        rows = [line.strip().split(",") for line in f if line.strip()]
    return {name: int(n) for name, n in rows}


def test_distributed_csv_write_publishes_manifest(spark, tmp_path):
    register_csvdir(spark)
    out = str(tmp_path / "out")
    os.makedirs(out)
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .filter(F.col("event_id") < 1000)
        .repartition(4)
    )
    ev.write.format("csvdir").mode("append").option("path", out).save()
    man = _manifest(out)
    assert sum(man.values()) == 1000
    parts = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert sorted(parts) == sorted(man)
    assert not any(f.startswith("_staging") for f in os.listdir(out))
    # round trip: the published parts contain exactly the input rows
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 1000
    assert back.select("event_id").distinct().count() == 1000
    # byte contract: timestamps isoformat (T separator, microseconds)
    sample = back.select("ts").first()["ts"]
    assert "T" in sample


def test_failed_write_leaves_no_output(spark, tmp_path):
    register_csvdir(spark)
    out = str(tmp_path / "out_fail")
    os.makedirs(out)

    @F.udf("long")
    def boom(x):
        raise RuntimeError("induced task failure")

    df = load_table(spark, SF_DIR, "events").select(boom(F.col("event_id")).alias("x"))
    with pytest.raises(Exception):
        df.write.format("csvdir").mode("append").option("path", out).save()
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert [f for f in os.listdir(out) if f.endswith(".csv")] == []


def test_overwrite_replaces_previous_publication(spark, tmp_path):
    register_csvdir(spark)
    out = str(tmp_path / "out_ow")
    os.makedirs(out)
    ev = load_table(spark, SF_DIR, "events").select("event_id").limit(100).coalesce(1)
    ev.write.format("csvdir").mode("append").option("path", out).save()
    first = set(_manifest(out))
    ev.write.format("csvdir").mode("overwrite").option("path", out).save()
    man = _manifest(out)
    assert sum(man.values()) == 100
    parts = {f for f in os.listdir(out) if f.endswith(".csv")}
    assert parts == set(man) and not (parts & first)
