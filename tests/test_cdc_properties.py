"""Property-based pins (hypothesis) for the CDC invariants that are the
reference's *spec* (SURVEY.md §5): operation classification is total and
exclusive, the watermark filter is strictly `>`, and empty batches never
advance state or produce files — for arbitrary row populations, not just
the seeded fixtures."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from cdc_export_system_spark.cdc.exports import (
    classify_operation,
    run_incremental_export,
)
from cdc_export_system_spark.schemas import USERS_SCHEMA
from cdc_export_system_spark.state.watermark import WatermarkStore

BASE = datetime(2024, 1, 1)

# (created_offset_s, update_lag_s, is_deleted)
row_st = st.tuples(
    st.integers(0, 900), st.integers(0, 900), st.booleans()
)
rows_st = st.lists(row_st, min_size=0, max_size=12)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def make_users(spark, rows):
    data = [
        (
            i,
            f"user {i}",
            f"u{i}@example.com",
            BASE + timedelta(seconds=c),
            BASE + timedelta(seconds=c + lag),
            bool(d),
        )
        for i, (c, lag, d) in enumerate(rows)
    ]
    return spark.createDataFrame(data, USERS_SCHEMA)


@PROP_SETTINGS
@given(rows=rows_st)
def test_operation_classification_total_and_exclusive(spark, rows):
    got = (
        make_users(spark, rows)
        .withColumn("operation", classify_operation())
        .select("id", "operation", "is_deleted", "created_at", "updated_at")
        .collect()
    )
    assert len(got) == len(rows)
    for r in got:
        # exactly one class, and exactly the reference's priority order
        # (exports.py:39-45): deleted wins, then created==updated.
        if r["is_deleted"]:
            assert r["operation"] == "DELETE"
        elif r["created_at"] == r["updated_at"]:
            assert r["operation"] == "INSERT"
        else:
            assert r["operation"] == "UPDATE"


_EXAMPLE_SEQ = iter(range(10**9))


@PROP_SETTINGS
@given(rows=rows_st, wm_off=st.integers(0, 1800))
def test_incremental_is_strictly_greater_and_live_only(spark, tmp_path, rows, wm_off):
    # tmp_path is function-scoped while @given runs many examples inside
    # one call — paths keyed only on the drawn values collide between
    # examples (a prior example's CSV breaks a later empty-batch
    # assertion), so every example gets a fresh sequence number.
    seq = next(_EXAMPLE_SEQ)
    users = make_users(spark, rows)
    store = WatermarkStore(spark, str(tmp_path / f"s{seq}"))
    wm = BASE + timedelta(seconds=wm_off)
    store.upsert("c", wm)
    out = str(tmp_path / f"o{seq}.csv")
    n, new_wm = run_incremental_export(users, store, "c", out)
    want = [
        (i, c, lag)
        for i, (c, lag, d) in enumerate(rows)
        if not d and BASE + timedelta(seconds=c + lag) > wm
    ]
    assert n == len(want)
    if want:
        # watermark candidate == max updated_at of exported rows, never
        # the watermark itself (strict >)
        assert new_wm == max(BASE + timedelta(seconds=c + lag) for _, c, lag in want)
        assert new_wm > wm
        assert os.path.exists(out)
    else:
        # empty batch: no file, no candidate watermark
        assert new_wm is None
        assert not os.path.exists(out)


@PROP_SETTINGS
@given(rows=rows_st)
def test_no_watermark_exports_nothing(spark, tmp_path, rows):
    users = make_users(spark, rows)
    store = WatermarkStore(spark, str(tmp_path / f"empty{len(rows)}"))
    out = str(tmp_path / "never.csv")
    n, new_wm = run_incremental_export(users, store, "missing-consumer", out)
    assert (n, new_wm) == (0, None)
    assert not os.path.exists(out)


@PROP_SETTINGS
@given(rows=rows_st)
def test_delta_partitions_into_classes(spark, rows):
    """Delta classes partition the after-watermark rows: |DELETE| +
    |INSERT| + |UPDATE| == |batch| for any population."""
    users = make_users(spark, rows).withColumn("operation", classify_operation())
    counts = {
        r["operation"]: r["n"]
        for r in users.groupBy("operation").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(counts.values()) == len(rows)
    assert set(counts) <= {"DELETE", "INSERT", "UPDATE"}


def test_snapshot_diff_changelog_roundtrip(spark):
    """CDC algebra: apply(diff(A, B), A) == B. The changelog emitted by
    cdc_snapshot_diff, merged into the old snapshot (delete DELETEs,
    upsert INSERTs/UPDATEs), must reconstruct the new snapshot exactly —
    the invariant every downstream changelog consumer relies on."""
    from pyspark.sql import functions as F

    from cdc_export_system_spark.cdc.diff import (
        _MUTATE_PRED, _NEW_PRED, _OLD_PRED, cdc_snapshot_diff,
    )
    from cdc_export_system_spark.io.sources import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    snap_old = orders.filter(F.expr(_OLD_PRED)).select(
        "o_orderkey", F.col("o_totalprice").alias("total")
    )
    snap_new = orders.filter(F.expr(_NEW_PRED)).select(
        "o_orderkey",
        F.when(F.expr(_MUTATE_PRED), F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("total"),
    )
    log = cdc_snapshot_diff(spark, SF_DIR)

    # merge: drop DELETEd and UPDATEd keys from A, add new values from log
    dead_or_changed = log.filter(F.col("operation").isin("DELETE", "UPDATE")).select(
        F.col("o_orderkey").alias("k")
    )
    kept = snap_old.join(
        dead_or_changed, snap_old.o_orderkey == F.col("k"), "left_anti"
    )
    added = log.filter(F.col("operation").isin("INSERT", "UPDATE")).select(
        "o_orderkey", F.col("new_total").alias("total")
    )
    rebuilt = kept.unionByName(added)

    assert rebuilt.exceptAll(snap_new).isEmpty()
    assert snap_new.exceptAll(rebuilt).isEmpty()
