"""Zero-dependency HTTP facade — the reference's REST surface, verbatim.

The reference exposes its engine through four FastAPI routes
(reference app/main.py:16-107); this module reproduces that observable
contract on the stdlib only (no FastAPI/Starlette in this environment),
backed by the Spark job layer (cdc/jobs.py):

* ``GET /health`` — 200 liveness probe (app/main.py health route).
* ``POST /exports/full|incremental|delta`` — requires ``X-Consumer-ID``
  (400 without it, app/main.py:25-28), mints the job UUID + output
  filename in the route (app/main.py:43,31-34), **enqueues** the export
  on a worker thread (the Starlette BackgroundTasks analogue:
  app/main.py:46), and replies ``202 {jobId, status: "started",
  exportType, outputFilename}`` immediately (app/main.py:48-53).
  As in the reference: status is always "started", there is no
  job-status endpoint, and job state is never persisted — outcomes are
  observable via the structured log events and the output directory.
* ``GET /exports/watermark`` — ``X-Consumer-ID`` point lookup;
  404 ``{"detail": ...}`` when absent (app/main.py:94-107).

Presentation only: every route is a thin shim over ``start_export_job``
/ ``get_watermark_response``; nothing here touches Spark plans. The
server is threaded (daemon worker per job) because Spark is fine with
concurrent job submission from multiple driver threads — they share the
SparkSession exactly as the reference's threadpool shares the DB engine.
"""

from __future__ import annotations

import json
import threading
import uuid
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

from pyspark.sql import DataFrame

from cdc_export_system_spark.cdc.jobs import (
    EXPORT_TYPES,
    get_watermark_response,
    make_output_filename,
    start_export_job,
)
from cdc_export_system_spark.state.watermark import WatermarkStore


class ExportAPI:
    """Routing + handlers, independent of the socket server (testable)."""

    def __init__(
        self,
        users_provider: Callable[[], DataFrame],
        store: WatermarkStore,
        output_dir: str = "output",
        background: bool = True,
    ):
        self.users_provider = users_provider
        self.store = store
        self.output_dir = output_dir
        # background=False runs exports inline — deterministic for tests;
        # True matches the reference's respond-then-run contract.
        self.background = background

    # -- handlers (status_code, body_dict) --------------------------------

    def health(self) -> tuple[int, dict[str, Any]]:
        return 200, {
            "status": "ok",
            "time": datetime.now(timezone.utc).isoformat(),
        }

    def trigger_export(
        self, export_type: str, consumer_id: str | None
    ) -> tuple[int, dict[str, Any]]:
        if export_type not in EXPORT_TYPES:
            return 404, {"detail": f"unknown export type: {export_type}"}
        if not consumer_id:
            # app/main.py:25-28 — the header is mandatory
            return 400, {"detail": "X-Consumer-ID header is required"}
        job_id = str(uuid.uuid4())
        filename = make_output_filename(export_type, consumer_id)

        def _run() -> None:
            try:
                start_export_job(
                    self.users_provider(),
                    self.store,
                    export_type,
                    consumer_id,
                    output_dir=self.output_dir,
                    job_id=job_id,
                    filename=filename,
                )
            except Exception:
                pass  # export_failed already logged; job state is never persisted

        if self.background:
            threading.Thread(target=_run, daemon=True).start()
        else:
            _run()
        return 202, {
            "jobId": job_id,
            "status": "started",
            "exportType": export_type,
            "outputFilename": filename,
        }

    def watermark(self, consumer_id: str | None) -> tuple[int, dict[str, Any]]:
        if not consumer_id:
            return 400, {"detail": "X-Consumer-ID header is required"}
        resp = get_watermark_response(self.store, consumer_id)
        if resp is None:
            return 404, {"detail": f"no watermark for consumer '{consumer_id}'"}
        return 200, resp

    # -- routing -----------------------------------------------------------

    def route(
        self, method: str, path: str, headers: dict[str, str]
    ) -> tuple[int, dict[str, Any]]:
        consumer = headers.get("x-consumer-id")
        if method == "GET" and path == "/health":
            return self.health()
        if method == "GET" and path == "/exports/watermark":
            return self.watermark(consumer)
        if method == "POST" and path.startswith("/exports/"):
            return self.trigger_export(path.removeprefix("/exports/"), consumer)
        return 404, {"detail": "not found"}


def make_server(api: ExportAPI, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bind a threaded HTTP server for the facade (port 0 = ephemeral)."""

    class Handler(BaseHTTPRequestHandler):
        def _respond(self) -> None:
            headers = {k.lower(): v for k, v in self.headers.items()}
            status, body = api.route(self.command, self.path, headers)
            payload = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        do_GET = _respond
        do_POST = _respond

        def log_message(self, *args: Any) -> None:  # route logs live in jobs.py
            pass

    return ThreadingHTTPServer((host, port), Handler)
