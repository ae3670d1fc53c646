"""Pins for the custom Python DataSource connector (io/python_source.py):
pushdown planning happens driver-side in the reader object, so the
pruning contract is assertable in-process without spying on executors."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from cdc_export_system_spark.io.python_source import (
    DEFAULT_ROWS,
    ChangeFeedReader,
    register_changefeed,
    row_at,
)


def _reader(**opts) -> ChangeFeedReader:
    return ChangeFeedReader({k: str(v) for k, v in opts.items()})


def test_push_filters_absorbs_seq_range_and_returns_rest():
    r = _reader(rows=1000, partitions=4)
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("seq",), 600),
                LessThan(("seq",), 900),
                EqualTo(("op",), "INSERT"),  # not absorbable
            ]
        )
    )
    assert rest == [EqualTo(("op",), "INSERT")]
    parts = r.partitions()
    assert min(p.start for p in parts) == 600
    assert max(p.end for p in parts) == 900
    covered = sorted((p.start, p.end) for p in parts)
    # contiguous, non-overlapping cover of [600, 900)
    assert covered[0][0] == 600 and covered[-1][1] == 900
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2


def test_push_filters_fully_pruned_window():
    r = _reader(rows=1000, partitions=4)
    list(r.pushFilters([GreaterThanOrEqual(("seq",), 2000)]))
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 0


def test_rows_are_pure_function_of_seq():
    assert row_at(42) == row_at(42)
    ops = {row_at(i)[1] for i in range(200)}
    assert ops == {"INSERT", "UPDATE", "DELETE"}


def test_end_to_end_rows_match_closed_form(spark):
    register_changefeed(spark)
    got = (
        spark.read.format("changefeed")
        .load()
        .filter(F.col("seq") < 200)
        .orderBy("seq")
        .collect()
    )
    assert len(got) == 200
    for r in got:
        seq, op, user_id, amount, ts = row_at(r.seq)
        assert (r.op, r.user_id, r.amount) == (op, user_id, amount)
        # row_at yields aware-UTC (r8 TZ hardening); collect() renders
        # naive wall time in the UTC session — same instant
        assert r.ts == ts.replace(tzinfo=None)


def test_partitioned_scan_covers_every_row_exactly_once(spark):
    register_changefeed(spark)
    df = spark.read.format("changefeed").option("partitions", "7").load()
    n = df.count()
    n_distinct = df.select("seq").distinct().count()
    assert n == DEFAULT_ROWS and n_distinct == DEFAULT_ROWS


def test_stream_reader_offsets_partition_the_feed():
    from cdc_export_system_spark.io.python_source import (
        STREAM_BATCH_ROWS,
        ChangeFeedStreamReader,
    )

    r = ChangeFeedStreamReader({"rows": "2500"})
    off = r.initialOffset()
    seen = []
    while int(off["seq"]) < 2500:
        rows, off = r.read(off)
        seen.extend(rows)
    assert len(seen) == 2500
    assert [t[0] for t in seen] == list(range(2500))
    # replay between committed offsets regenerates identical rows
    replay = list(r.readBetweenOffsets({"seq": 1000}, {"seq": 2000}))
    assert replay == seen[1000:2000]
    assert len(replay) == STREAM_BATCH_ROWS
