"""Behavioral pins for the privacy-audit family."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_export_system_spark.registry import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def test_k_anonymity_census_conserves_rows(spark):
    hist = REGISTRY["privacy_k_anonymity"].fn(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r["n_rows"] for r in hist) == n
    for r in hist:
        assert r["n_rows"] == r["group_size"] * r["n_groups"]


def test_l_diversity_bounded_by_domain(spark):
    rows = REGISTRY["privacy_l_diversity"].fn(spark, SF_DIR).collect()
    n_seg = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_mktsegment").distinct().count()
    )
    assert all(1 <= r["l"] <= n_seg for r in rows)


def test_uniqueness_monotone_in_qi_width(spark):
    rows = {
        r["qi_set"]: r
        for r in REGISTRY["privacy_uniqueness_risk"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"nation", "nation+segment", "nation+segment+bucket"}
    # widening the adversary's QI can only create MORE unique records
    assert (
        rows["nation"]["n_unique_rows"]
        <= rows["nation+segment"]["n_unique_rows"]
        <= rows["nation+segment+bucket"]["n_unique_rows"]
    )
    for r in rows.values():
        assert 0.0 <= r["share"] <= 1.0
