"""HTTP facade E2E — the reference's four-route REST contract over a
live socket (ports of tests/test_health.py + the export-trigger shapes
of tests/test_exports_*.py, minus Postgres)."""

from __future__ import annotations

import http.client
import json
import threading
import time

import pytest

from cdc_export_system_spark.api import ExportAPI, make_server
from cdc_export_system_spark.datagen import generate_users
from cdc_export_system_spark.state.watermark import WatermarkStore


@pytest.fixture()
def served(spark, tmp_path):
    users = generate_users(spark, n_rows=500, seed=7)
    users.cache()
    users.count()
    store = WatermarkStore(spark, str(tmp_path / "state"))
    # inline execution: the 202-then-run contract itself is covered below
    # by the background server; inline makes export effects deterministic.
    api = ExportAPI(lambda: users, store, output_dir=str(tmp_path / "out"),
                    background=False)
    srv = make_server(api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, tmp_path, users
    srv.shutdown()


def _req(addr, method, path, headers=None):
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request(method, path, headers=headers or {})
    r = conn.getresponse()
    body = json.loads(r.read() or b"{}")
    conn.close()
    return r.status, body


def test_health(served):
    addr, _, _ = served
    status, body = _req(addr, "GET", "/health")
    assert status == 200 and body["status"] == "ok"


def test_export_requires_consumer_header(served):
    addr, _, _ = served
    status, body = _req(addr, "POST", "/exports/full")
    assert status == 400 and "X-Consumer-ID" in body["detail"]


def test_unknown_export_type_404(served):
    addr, _, _ = served
    status, _ = _req(addr, "POST", "/exports/nonsense",
                     {"X-Consumer-ID": "c1"})
    assert status == 404


def test_watermark_404_then_full_export_then_200(served):
    addr, tmp_path, users = served
    h = {"X-Consumer-ID": "api consumer"}

    status, _ = _req(addr, "GET", "/exports/watermark", h)
    assert status == 404  # no export yet (app/main.py:101-102)

    status, body = _req(addr, "POST", "/exports/full", h)
    assert status == 202
    assert set(body) == {"jobId", "status", "exportType", "outputFilename"}
    assert body["status"] == "started" and body["exportType"] == "full"
    # space in consumer id sanitized to _ in the filename (app/main.py:33)
    assert "_api_consumer_" in body["outputFilename"]
    assert (tmp_path / "out" / body["outputFilename"]).exists()

    status, wm = _req(addr, "GET", "/exports/watermark", h)
    assert status == 200 and wm["consumerId"] == "api consumer"
    # parses as ISO timestamp (reference test_exports_incremental.py:47)
    from datetime import datetime

    datetime.fromisoformat(wm["lastExportedAt"])


def test_incremental_before_full_exports_nothing(served):
    addr, tmp_path, _ = served
    h = {"X-Consumer-ID": "fresh"}
    status, body = _req(addr, "POST", "/exports/incremental", h)
    assert status == 202
    # no watermark => export nothing: no file, no watermark created
    # (exports.py:110-113 + empty => no file exports.py:127)
    assert not (tmp_path / "out" / body["outputFilename"]).exists()
    status, _ = _req(addr, "GET", "/exports/watermark", h)
    assert status == 404


def test_background_mode_returns_202_before_completion(spark, tmp_path):
    users = generate_users(spark, n_rows=500, seed=7)
    store = WatermarkStore(spark, str(tmp_path / "state_bg"))
    api = ExportAPI(lambda: users, store, output_dir=str(tmp_path / "out_bg"),
                    background=True)
    srv = make_server(api)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        status, body = _req(srv.server_address, "POST", "/exports/full",
                            {"X-Consumer-ID": "bg"})
        assert status == 202 and body["status"] == "started"
        # the job completes shortly after the 202 (respond-then-run)
        path = tmp_path / "out_bg" / body["outputFilename"]
        deadline = time.monotonic() + 60
        while not path.exists() and time.monotonic() < deadline:
            time.sleep(0.2)
        assert path.exists()
    finally:
        srv.shutdown()
