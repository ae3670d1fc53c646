"""Custom stateful streaming operator via applyInPandasWithState.

The engine's extension point for operators Spark's built-ins can't
express: arbitrary per-key state evolving across micro-batches. Example
operator: a per-user running profile (event count, value sum, last seen)
emitted on every update — the streaming analogue of the reference's
per-consumer watermark row, generalized to any keyed accumulator.

State is a tuple per user; Spark shuffles each micro-batch by key once
and hands per-key pandas DataFrames to the function — Arrow-batched, so
the Python boundary costs per batch, not per row.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents (values carry 2 decimal digits): the
        # accumulated sum is order- and batching-independent, so the
        # emitted double equals the batch oracle bit-for-bit
        cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [cents / 100.0],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running profile over a stream of events (update mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
