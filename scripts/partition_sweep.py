"""Hostile partition-invariance sweep.

Runs EVERY oracle-carrying registered query and compares it bit-for-bit
against its DuckDB oracle under an adversarial ``spark.sql.shuffle.partitions``
setting — the executable form of the engine's core exactness claim:
partitioning can never move a result. Any operator whose answer depends
on partition count (floating-point sum order, non-total sort, per-partition
state leakage) fails here even when the default-partitioning parity suite
passes.

Usage:  python scripts/partition_sweep.py <num_shuffle_partitions> [sf_dir]
        (run at least one setting well below and one well above the
        test default of 8 — e.g. 5 and 64)

Prints one JSON line: {"partitions": N, "checked": n, "fails": [...]}.
Round-4 record: 321/321 green at partitions=5 and partitions=64, sf0.001.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark
from tests.parity import compare, duck_register


def main() -> int:
    parts = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name=f"partition-sweep-{parts}", master="local[8]",
        shuffle_partitions=parts,
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    duck_register(con, sf_dir)
    registry = load_all()
    fails: list[tuple[str, str]] = []
    checked = 0
    for name in sorted(registry):
        spec = registry[name]
        if spec.oracle is None:
            continue
        checked += 1
        try:
            res = compare(spec.fn(spark, sf_dir), con, spec.oracle)
            if not res["match"]:
                fails.append((name, res["detail"]))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, f"EXC {ex}"))
    print(json.dumps({"partitions": parts, "checked": checked, "fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
