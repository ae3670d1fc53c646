"""Benchmark harness: times the engine's headline queries.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Prints exactly one JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Each query executes to completion via the noop sink (full plan runs,
nothing is collected to the driver). One full unmeasured warm-up pass
(JMH-style) absorbs JVM start-up, codegen/JIT, and parquet footer reads;
each query is then measured three times (build + execute, end to end)
and the fastest pass is reported — min-of-N is the standard estimator
for the noise-free steady state on a shared host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="cdc-export-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}

    # warm-up pass: JVM, parquet footer reads, codegen/JIT — unmeasured
    for name in sorted(headline):
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(headline):
        spec = registry[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
