"""Custom connector via Spark 4's Python DataSource API — the engine's
"another source format" surface, exercised end to end.

``ChangeFeedDataSource`` is a partitioned, filter-pushdown-capable batch
source modeling an upstream CDC change feed (the role the reference's
Postgres `users` table plays, reference: ``app/seed_users.py:21-62``,
re-expressed as a connector instead of a seeded table). Rows are a pure
closed-form function of the row index — no RNG state, no I/O — so:

* every InputPartition is independently computable (embarrassingly
  parallel, any executor, any retry — idempotent by construction);
* the DuckDB oracle reproduces the exact rows from ``range(n)`` with the
  same integer arithmetic, making a *custom connector* hash-checkable;
* ``pushFilters`` prunes whole partitions driver-side when the query
  constrains ``seq`` (the sequence number — a change feed's natural
  cursor), the Python-source analogue of parquet row-group pruning.
  Unsupported predicates are returned to Spark to evaluate post-scan,
  per the API contract.

Scale posture: a real feed connector would map partitions to
broker/shard offsets; the partition-pruning-by-cursor shape is exactly
how a 100 TB backfill avoids re-reading closed offsets.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

KNUTH = 2654435761  # Knuth multiplicative hash constant (shared with sampling)
N_USERS = 1000
TS_BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
TS_SPREAD_S = 30 * 24 * 3600  # 30-day feed window (reference seeder spread)

DEFAULT_ROWS = 5000
DEFAULT_PARTS = 8

SCHEMA = "seq bigint, op string, user_id bigint, amount double, ts timestamp"


def row_at(i: int) -> tuple:
    """The change record at sequence number i (pure function). The seq
    is folded mod 2^31 before the Knuth multiply so the SQL oracle
    (int64) and this pure-Python form (unbounded ints) stay identical
    at any feed length (see sampling.py KEY_FOLD)."""
    k = (i % 2147483648) * KNUTH
    m = k % 100
    op = "DELETE" if m < 3 else ("INSERT" if m < 53 else "UPDATE")
    user_id = k % N_USERS
    amount = (k % 1_000_000) / 100
    # yield the timestamp timezone-AWARE (UTC): a naive datetime is
    # interpreted through the PYTHON WORKER's process time zone during
    # Arrow conversion, shifting every ts by the host offset on a
    # non-UTC box (caught by the round-8 hostile-TZ simulation)
    ts = TS_BASE + dt.timedelta(seconds=k % TS_SPREAD_S)
    return (i, op, user_id, amount, ts)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class ChangeFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("partitions", DEFAULT_PARTS))
        self.lo = 0  # half-open pushed cursor window [lo, hi)
        self.hi = self.n_rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb range predicates on `seq` (tightening the cursor
        window used for partition planning); yield back everything else
        for Spark to evaluate."""
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("seq",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("seq",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("seq",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("seq",):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_RangePartition(0, 0)]  # fully pruned; one empty split
        per = max(1, -(-(hi - lo) // self.n_parts))
        return [
            _RangePartition(s, min(s + per, hi)) for s in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield row_at(i)


STREAM_BATCH_ROWS = 1000  # rows surfaced per micro-batch


class ChangeFeedStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed streaming form of the feed: the offset dict carries
    the next unread sequence number — exactly a change feed's cursor. A
    replay between two committed offsets (readBetweenOffsets) regenerates
    the identical rows, which is the exactly-once recovery contract; the
    engine-side watermark protocol (cdc/exports.py) is this same idea
    persisted across jobs."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", DEFAULT_ROWS))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = int(start["seq"])
        hi = min(lo + STREAM_BATCH_ROWS, self.n_rows)
        # a list_iterator (not a bare generator): the runner calls next()
        # on it AND pickles the prefetched rows for executors — a
        # generator fails the pickle, a bare list fails the next()
        return iter([row_at(i) for i in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_at(i) for i in range(int(start["seq"]), int(end["seq"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing upstream to acknowledge: the feed is closed-form


class ChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "changefeed"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ChangeFeedReader:
        return ChangeFeedReader(self.options)

    def simpleStreamReader(self, schema) -> ChangeFeedStreamReader:
        return ChangeFeedStreamReader(self.options)


def register_changefeed(spark) -> None:
    from cdc_export_system_spark.session import ensure_engine_conf

    # a session we did not build (the correctness driver's) needs the
    # python filterPushdown conf or a pushFilters-bearing reader errors
    ensure_engine_conf(spark)
    spark.dataSource.register(ChangeFeedDataSource)


def _oracle_rows(extra_where: str = "") -> str:
    """DuckDB replica of row_at() over range(DEFAULT_ROWS)."""
    return f"""
        SELECT i AS seq,
               CASE WHEN ((i % 2147483648) * {KNUTH}) % 100 < 3 THEN 'DELETE'
                    WHEN ((i % 2147483648) * {KNUTH}) % 100 < 53 THEN 'INSERT'
                    ELSE 'UPDATE' END AS op,
               ((i % 2147483648) * {KNUTH}) % {N_USERS} AS user_id,
               CAST(((i % 2147483648) * {KNUTH}) % 1000000 AS DOUBLE) / 100 AS amount,
               TIMESTAMP '2024-01-01 00:00:00'
                   + to_seconds(CAST(((i % 2147483648) * {KNUTH}) % {TS_SPREAD_S}
                                 AS BIGINT)) AS ts
        FROM range({DEFAULT_ROWS}) t(i) {extra_where}
    """


# --- registered queries -----------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from cdc_export_system_spark.registry import register  # noqa: E402


@register(
    "source_python_changefeed",
    oracle=f"""
        WITH feed AS ({_oracle_rows()})
        SELECT op, count(*) AS n_changes,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(floor(amount * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS amount_cents,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM feed GROUP BY op
    """,
    tags=("source", "connector", "python-datasource"),
)
def source_python_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the custom Python DataSource (8 parallel partitions)
    rolled up per operation — proves the connector's values, types, and
    partitioned read path are all exactly right (the oracle recomputes
    the closed-form feed in SQL)."""
    register_changefeed(spark)
    feed = spark.read.format("changefeed").load()
    return feed.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.floor(F.col("amount") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "amount_cents"
        ),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


CURSOR_FROM = 3000  # resume point: replay the feed tail only


@register(
    "source_python_changefeed_pushdown",
    oracle=f"""
        WITH feed AS ({_oracle_rows(f"WHERE i >= {CURSOR_FROM}")})
        SELECT user_id, count(*) AS n_changes,
               max(seq) AS last_seq
        FROM feed WHERE op <> 'DELETE'
        GROUP BY user_id
    """,
    tags=("source", "connector", "python-datasource", "pushdown"),
)
def source_python_changefeed_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor-resume read: the `seq >= 3000` (CURSOR_FROM) predicate is absorbed by
    pushFilters and prunes partitions before any executor runs (pinned
    in tests/test_python_source.py by planning the reader in-process);
    the op filter is NOT absorbed and comes back to Spark to evaluate —
    both halves of the pushdown contract in one query."""
    register_changefeed(spark)
    feed = spark.read.format("changefeed").load()
    return (
        feed.filter((F.col("seq") >= CURSOR_FROM) & (F.col("op") != "DELETE"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.max("seq").alias("last_seq"),
        )
    )


@register(
    "source_python_changefeed_stream",
    oracle=f"""
        WITH feed AS ({_oracle_rows()})
        SELECT user_id, count(*) AS n_changes,
               CAST(SUM(CAST(floor(amount * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS amount_cents,
               max(seq) AS last_seq
        FROM feed GROUP BY user_id
    """,
    tags=("source", "connector", "python-datasource", "streaming"),
)
def source_python_changefeed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector's STREAMING path: readStream over the custom source
    drains the whole feed through offset-managed micro-batches
    (1000 rows — STREAM_BATCH_ROWS — per offset step, availableNow trigger,
    append memory sink) and rolls the drained rows up per user. The
    rollup equals the batch closed form exactly — micro-batch boundaries
    carry no semantics — which is the oracle check that the offset
    bookkeeping neither drops nor duplicates rows."""
    import time
    import uuid

    register_changefeed(spark)
    name = f"feed_{uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format("changefeed")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    # drain: the simple stream reader surfaces STREAM_BATCH_ROWS per
    # micro-batch (availableNow would stop at the first prefetched
    # offset), so run the trigger loop until the cursor reaches the end
    deadline = time.monotonic() + 120
    try:
        while time.monotonic() < deadline:
            if spark.table(name).count() >= DEFAULT_ROWS:
                break
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.floor(F.col("amount") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "amount_cents"
            ),
            F.max("seq").alias("last_seq"),
        )
    )
