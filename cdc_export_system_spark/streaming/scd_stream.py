"""Streaming SCD type-2 maintenance: the dimension-history table kept
current by the change stream itself.

Batch ``cdc_scd2_history`` (cdc/scd.py) recomputes the full interval
table from all changes; this module maintains it INCREMENTALLY: each
micro-batch touches only the keys it contains — open intervals of
touched keys are re-derived from (their prior rows + the new changes),
untouched keys pass through untouched. That per-key locality is the
whole point at 100 TB: a day's changes touch a sliver of the key space,
so the merge cost is O(|touched keys' history| + |batch|), never
O(|dimension|), and at scale the state rewrite below becomes a
partition-overwrite of the touched key buckets instead of a full copy.

Replay-safe: the merge dedupes on (user_id, event_id) after unioning
prior rows with the batch, so a micro-batch that dies after the state
swap and replays under the same epoch converges to the same table —
matching the CDC stream's exactly-once discipline
(tests/test_streaming.py crash pin).

reference: app/services/exports.py:138-171 — the delta export's consumer
is exactly who maintains a table like this from the change feed.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_export_system_spark.registry import register

_CHANGE_COLS = ["user_id", "event_id", "event_type", "value", "ts"]


def _intervals(changes: DataFrame) -> DataFrame:
    """SCD2 interval derivation (same window as cdc_scd2_history)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply_batch(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Merge one micro-batch of changes into the SCD2 state.

    Only the batch's keys are re-windowed; every other key's intervals
    are passed through by a LEFT ANTI probe. Idempotent under replay
    (event_id dedupe)."""
    batch = batch.select(_CHANGE_COLS)
    if state is None:
        return _intervals(batch)
    touched = batch.select("user_id").distinct()
    untouched = state.join(touched, "user_id", "left_anti")
    prior = (
        state.join(touched, "user_id", "semi")
        .select(
            "user_id", "event_id", "event_type", "value",
            F.col("valid_from").alias("ts"),
        )
    )
    merged = prior.unionByName(batch).dropDuplicates(["user_id", "event_id"])
    return untouched.unionByName(_intervals(merged))


def run_scd2_stream(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain `source` (a streaming DF of change rows) into the SCD2
    state table at `state_dir`, one atomic directory swap per
    micro-batch."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        has_state = os.path.isdir(state_dir)
        state = spark.read.parquet(state_dir) if has_state else None
        out = scd2_apply_batch(state, batch_df)
        staged = f"{state_dir}.__stage__{uuid.uuid4().hex}"
        out.write.mode("overwrite").parquet(staged)
        old = f"{state_dir}.__old__{uuid.uuid4().hex}"
        if has_state:
            os.replace(state_dir, old)
        os.replace(staged, state_dir)
        if has_state:
            shutil.rmtree(old, ignore_errors=True)

    q = (
        source.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "stream_cdc_scd2",
    oracle="""
        SELECT user_id, event_id, event_type, value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   AS is_current
        FROM events
    """,
    tags=("streaming", "cdc", "window"),
)
def stream_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 dimension maintained by a REAL streaming query (file
    source + availableNow + foreachBatch incremental merge), then read
    back. Same oracle as cdc_scd2_history: however the source splits the
    feed into micro-batches, the converged table must equal the batch
    recomputation bit-for-bit (the multi-batch split is pinned in
    tests/test_streaming.py)."""
    import tempfile

    base = tempfile.mkdtemp(prefix="scd2_stream_")
    # declared schema — same pattern as stream_stateful_profile
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(*_CHANGE_COLS)
    )
    state_dir = os.path.join(base, "state")
    run_scd2_stream(spark, stream, state_dir, os.path.join(base, "ckpt"))
    if not os.path.isdir(state_dir):
        # source matched no files (schema-only fixture): empty dimension
        return spark.createDataFrame(
            [],
            "user_id long, event_id long, event_type string, value double, "
            "valid_from timestamp, valid_to timestamp, is_current boolean",
        )
    out = spark.read.parquet(state_dir).select(
        "user_id", "event_id", "event_type", "value",
        "valid_from", "valid_to", "is_current",
    )
    # schema parity with the batch oracle regardless of source casts
    return out.withColumn("value", F.col("value").cast("double"))
