"""transformWithStateInPandas (state API v2) — executable only where
google.protobuf works (the v2 state server's wire protocol); this
container ships a broken protobuf, so the execution test skips and the
construction-level contract is pinned instead."""

from __future__ import annotations

import pytest

from cdc_export_system_spark.streaming.tws import (
    EventLedgerProcessor,
    event_ledger_stream,
    stream_tws_event_ledger,
    tws_available,
)
from tests.conftest import SF_DIR
from tests.parity import compare, duck_register


def test_processor_contract_shape():
    p = EventLedgerProcessor()
    assert callable(p.init) and callable(p.handleInputRows) and callable(p.close)


def test_ledger_semantics_execute_on_state_v1(spark, duck):
    """The ledger semantics EXECUTE in this container: the same fold
    (_fold_ledger) and emission the v2 processor uses, run end-to-end
    on applyInPandasWithState against the identical batch oracle. The
    only piece this cannot execute is Spark's v2 protobuf state-server
    transport, which is Spark's code, not ours (docs/TWS_ENV.md)."""
    from cdc_export_system_spark.streaming.tws import (
        _TWS_ORACLE,
        stream_ledger_state_v1,
    )

    duck_register(duck, SF_DIR)
    res = compare(stream_ledger_state_v1(spark, SF_DIR), duck, _TWS_ORACLE)
    assert res["match"], res["detail"]


@pytest.mark.skipif(not tws_available(), reason="google.protobuf absent from container (docs/TWS_ENV.md)")
def test_tws_ledger_matches_batch_oracle(spark, duck):
    from cdc_export_system_spark.streaming.tws import _TWS_ORACLE

    duck_register(duck, SF_DIR)
    res = compare(stream_tws_event_ledger(spark, SF_DIR), duck, _TWS_ORACLE)
    assert res["match"], res["detail"]


@pytest.mark.skipif(not tws_available(), reason="google.protobuf absent from container (docs/TWS_ENV.md)")
def test_tws_stream_builds(spark):
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    df = event_ledger_stream(stream)
    assert df.isStreaming
