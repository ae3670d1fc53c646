"""Pins small-file compaction (lossless, file count near target) and the
parquet aggregate-pushdown scan path (MIN/MAX/COUNT served from footer
stats — at 100 TB a metadata-only query)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cdc_export_system_spark.io.compact import compact_parquet, dir_bytes
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR


def test_compaction_reduces_files_losslessly(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, SF_DIR, "orders")
    orders.repartition(32).write.parquet(src)  # the small-files disease
    assert len(glob.glob(f"{src}/*.parquet")) == 32

    # target sized to produce a couple of files from this tiny input
    target = max(1, dir_bytes(src) // 2)
    n = compact_parquet(spark, src, dst, target_bytes=target)
    out_files = glob.glob(f"{dst}/*.parquet")
    assert len(out_files) == n <= 4

    # lossless: same multiset of rows
    a = orders.groupBy("o_orderstatus").count().collect()
    b = spark.read.parquet(dst).groupBy("o_orderstatus").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_parquet_aggregate_pushdown_serves_minmax_from_footers(spark, tmp_path):
    p = str(tmp_path / "orders_plain")
    load_table(spark, SF_DIR, "orders").write.parquet(p)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    # aggregate pushdown is a DataSource-v2 capability; route parquet to v2
    v1_list = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "csv,json,orc,text,avro")
    try:
        agg = spark.read.parquet(p).agg(
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [MIN(o_totalprice), MAX(o_totalprice), COUNT(*)]" in plan
        row = agg.collect()[0]
        ref = load_table(spark, SF_DIR, "orders").agg(
            F.min("o_totalprice"), F.max("o_totalprice"), F.count(F.lit(1))
        ).collect()[0]
        assert (row.lo, row.hi, row.n) == tuple(ref)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.set("spark.sql.sources.useV1SourceList", v1_list)
