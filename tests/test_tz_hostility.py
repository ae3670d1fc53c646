"""Hostile-process-timezone regression pin (round 8).

The round-8 full-registry driver simulation under TZ=America/New_York
caught three bugs the UTC-process suite could not see: DuckDB's
``to_timestamp`` rendering through the process zone (ts_forecast_linear
oracle), Spark's ORC path adjusting through the JVM DEFAULT zone
(source_orc_roundtrip), and the Python DataSource's naive datetimes
shifting through the worker zone (source_python_changefeed). This test
re-runs exactly those three ops — plus the as-of join, whose epoch
packing is timestamp arithmetic end to end — in a SUBPROCESS with a
hostile TZ and demands oracle hash-parity.

A subprocess is required: the zone must be set before the JVM and
DuckDB initialize, and the shared session fixture is already UTC.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import os, sys
os.environ["TZ"] = "America/New_York"
import time
time.tzset()
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import duckdb
from pyspark.sql import SparkSession
from cdc_export_system_spark.session import ensure_engine_conf
from cdc_export_system_spark.registry import load_all
from tests.parity import compare, duck_register

spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())
ensure_engine_conf(spark)
reg = load_all()
sf = {sf!r}
con = duckdb.connect(); duck_register(con, sf)
fails = []
for name in ["ts_forecast_linear", "source_orc_roundtrip",
              "source_python_changefeed", "join_asof"]:
    res = compare(reg[name].fn(spark, sf), con, reg[name].oracle)
    if not res["match"]:
        fails.append((name, res.get("detail", "")[:200]))
print("TZFAILS:" + repr(fails))
"""


def test_tz_hostile_parity_subprocess():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, sf="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    marker = [l for l in out.stdout.splitlines() if l.startswith("TZFAILS:")]
    assert marker, f"subprocess died:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    assert marker[0] == "TZFAILS:[]", marker[0]
