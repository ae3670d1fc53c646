"""Source-connector robustness: schema evolution across parquet files and
malformed-row handling on CSV ingest — the failure modes a 100 TB ingest
hits daily (a new producer adds a column; one bad row must not kill the
job, echoing the reference's transactional all-or-nothing job wrapper but
at per-row granularity)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T


def test_parquet_merge_schema_evolution(spark, tmp_path):
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.mode("append").parquet(d)
    # v2 of the producer adds a column
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", True).parquet(d)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None  # old files surface the new column as NULL
    assert rows[2].score == 9.5
    # and filters on the evolved column still push down / evaluate
    assert merged.filter(F.col("score") > 9).count() == 1


def test_csv_permissive_and_dropmalformed(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,10.5\n"
        "2,notanumber,3.25\n"  # malformed qty
        "3,7,1.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("qty", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    permissive = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = permissive.collect()
    assert len(rows) == 3  # nothing dropped; the bad row is quarantined
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 1 and bad[0].id == 2 and bad[0].qty is None

    dropped = (
        spark.read.schema(
            T.StructType(schema.fields[:3])
        )
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {r.id for r in dropped.collect()} == {1, 3}


def test_hostile_session_timezone_still_matches_oracle(spark, duck):
    """The driver hands us ITS session; if that session runs in a non-UTC
    zone, every timestamp-bearing query would silently shift. load_table
    must re-assert UTC (ensure_engine_conf) on each call, so even a
    session someone switched to America/New_York matches the oracle."""
    import sys

    sys.path.insert(0, "tests")
    from parity import compare, duck_register

    from cdc_export_system_spark.registry import load_all
    from tests.conftest import SF_DIR

    reg = load_all()
    duck_register(duck, SF_DIR)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in (
            "agg_by_month",
            "sessionize_batch",
            "fn_ts_isoformat",
            # round-3 timestamp-bearing ops: hour-of-day features and
            # hour/day truncations must survive a poisoned session zone
            "ml_linear_regression",
            "ts_resample_ohlc",
            "ts_changepoint_cusum",
            "stats_chi2_independence",
        ):
            spec = reg[name]
            r = compare(spec.fn(spark, SF_DIR), duck, spec.oracle)
            assert r["match"], f"{name} under hostile TZ: {r['detail']}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_cached_view_queries_survive_per_query_repoisoning(spark, duck):
    """The memoized temp-view paths (star_view, the minhash fanned view)
    skip load_table on a cache hit — they must re-assert the engine
    confs THEMSELVES, or a session poisoned to a non-UTC zone between
    queries shifts timestamp literals and rendered outputs. Warm the
    caches under UTC, then poison before every query — each must still
    match its oracle (the exact 5-query failure set of the round-3
    hostile sweep, plus a fanned-view representative)."""
    import sys

    sys.path.insert(0, "tests")
    from parity import compare, duck_register

    from cdc_export_system_spark.registry import load_all
    from tests.conftest import SF_DIR

    reg = load_all()
    duck_register(duck, SF_DIR)
    names = [
        "sql_group_by_all", "tpch_q3", "tpch_q6", "tpch_q10_like",
        "window_range_interval", "dedup_minhash_lsh",
    ]
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for n in names:  # warm the view caches on the clean session
        reg[n].fn(spark, SF_DIR).count()
    try:
        for n in names:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            r = compare(reg[n].fn(spark, SF_DIR), duck, reg[n].oracle)
            assert r["match"], f"{n} after cache-hit repoisoning: {r['detail']}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
