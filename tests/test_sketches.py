"""ε-δ contract pins for the count-min sketch (operators/sketches.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_export_system_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    agg_countmin_sketch,
    cms_cells,
    cms_estimate,
)
from cdc_export_system_spark.io.sources import load_table
from tests.conftest import SF_DIR


def test_cms_bounds_on_testdata(spark):
    """est ≥ true for every item (one-sided error), and est ≤ true + εn
    with ε = e/w — on the 5-item event_type domain collisions are
    unlikely but the bound must hold regardless."""
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(exact.values())
    eps = math.e / CMS_WIDTH
    got = {r["item"]: r["est_count"] for r in agg_countmin_sketch(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for item, true in exact.items():
        assert got[item] >= true, item
        assert got[item] <= true + eps * n, (item, got[item], true, n)


def test_cms_lossy_regime_long_tail(spark):
    """A 500-item zipf-ish domain over w=64 buckets forces collisions:
    the sketch must stay one-sided (never undercount) and keep every
    estimate within εn of truth; heavy items must still rank above the
    tail when thresholded at the εn noise floor."""
    rows = []
    for i in range(500):
        reps = 200 if i < 3 else (1 + i % 5)
        rows.extend((f"item_{i}",) for _ in range(reps))
    df = spark.createDataFrame(rows, "item string")
    n = df.count()
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(cms_cells(df), df.distinct()).collect()
    }
    eps = math.e / CMS_WIDTH
    assert set(est) == set(exact)
    overshoots = 0
    for item, true in exact.items():
        assert est[item] >= true, item
        if est[item] > true + eps * n:
            overshoots += 1
    # P[overshoot > εn] ≤ e^-d per item; allow the expected tail
    assert overshoots <= len(exact) * math.exp(-CMS_DEPTH) * 3 + 1
    # the three planted heavy hitters clear the noise floor
    heavy = {k for k, v in est.items() if v >= 200}
    assert {"item_0", "item_1", "item_2"} <= heavy


def test_cms_merge_equals_single_pass(spark):
    """Sketch mergeability: cells built on two disjoint shards, unioned
    and re-aggregated, equal the single-pass sketch cell-for-cell."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("item")
    )
    full = {(r["row"], r["bucket"]): r["cnt"] for r in cms_cells(ev).collect()}
    a = cms_cells(ev.limit(0).unionAll(ev).filter(F.crc32(F.col("item")) % 2 == 0))
    b = cms_cells(ev.filter(F.crc32(F.col("item")) % 2 == 1))
    merged_df = (
        a.unionAll(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    merged = {(r["row"], r["bucket"]): r["cnt"] for r in merged_df.collect()}
    assert merged == full
