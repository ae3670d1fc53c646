"""Isolated A/B timer for registered queries.

Usage: python scripts/ab_query.py <reps> <name> [name ...]
One dedicated bench-shaped session (local[$SPARK_GRAFT_CPUS]); each
query gets one unmeasured warm-up then <reps> timed build+execute
passes through the noop sink (bench.py methodology). Prints one JSON
line per query: {"name":..., "min":..., "med":..., "max":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-query", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for name in names:
        fn = registry[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        samples.sort()
        print(json.dumps({
            "name": name,
            "min": round(samples[0], 4),
            "med": round(samples[len(samples) // 2], 4),
            "max": round(samples[-1], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
