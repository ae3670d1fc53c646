"""Capture .explain("formatted") for headline (or named) queries.

Usage: python scripts/capture_plans.py <outdir> [suffix] [name ...]
Writes <outdir>/<query>_<suffix>.txt for each query (default: the
headline set). Plans are captured with the same session configuration
as bench.py (local[$SPARK_GRAFT_CPUS], shuffle_partitions=cpus) so the
plan shape matches what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plan-capture", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if not names:
        names = sorted(n for n, s in registry.items() if s.headline)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
