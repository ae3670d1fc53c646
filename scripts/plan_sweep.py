"""Registry-wide plan-shape sweep (optimization-round tooling).

For EVERY registered query, constructs the DataFrame at sf0.001 and
records: per-table FileScan counts (repeated scans of one table flag a
recomputed subtree or a legitimate self-join — triage by eye), exchange
/ broadcast / join-node counts, Python-boundary nodes, localCheckpoint
reuse, and construction wall time (construction-heavy ops do real work
before returning a frame). Output: one JSON file for analysis.

Run: python scripts/plan_sweep.py [out.json] [name ...]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

_PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
)


def metrics_for(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # count FileScan NODES per table (a bare file-path regex would also
    # match Location/ReadSchema detail lines and overcount)
    scans: dict[str, int] = {}
    for m in re.finditer(
        r"FileScan parquet[^\n]*?\[file:[^\]]*?/(\w+)\.parquet", plan
    ):
        t = m.group(1)
        scans[t] = scans.get(t, 0) + 1
    out = {
        "scans": scans,
        "exchanges": len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        "single_part": plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "ckpt_rdds": plan.count("localCheckpoint"),
    }
    py = {n: plan.count(n) for n in _PY_NODES if n in plan}
    if py:
        out["python"] = py
    return out


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.json"
    names = sys.argv[2:]
    registry = load_all()
    if not names:
        names = sorted(registry)
    spark = get_spark(
        app_name="plan-sweep", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            df = registry[name].fn(spark, SF_DIR)
            m = metrics_for(df)
        except Exception as e:  # noqa: BLE001
            m = {"error": str(e)[:120]}
        m["build_s"] = round(time.monotonic() - t0, 3)
        rows[name] = m
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(names)}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(rows)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
