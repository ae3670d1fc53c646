"""Window-vs-Arrow A/B for the whole ranks.py prefix machinery
(VERDICT r11 #4): with_prefix_sum, with_global_row_number,
with_prefix_max, window form vs arrow_impl, interleaved reps in one
bench-shaped session.

Usage: python scripts/ab_prefix_machinery.py [reps]
Env: SPARK_GRAFT_SF_DIR (dataset; run once at /root/testdata/sf0.1 and
once at the generated 25x dir), SPARK_GRAFT_CPUS.
Prints one JSON line per (op, impl) with min/med/max seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.operators.ranks import (
    with_global_row_number,
    with_prefix_max,
    with_prefix_sum,
)
from cdc_export_system_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="ab-prefix", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def price_axis():
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.select(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                .cast("bigint")
                .alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .localCheckpoint(eager=True)
        )

    def spend():
        orders = load_table(spark, sf_dir, "orders")
        return orders.groupBy("o_custkey").agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        ).localCheckpoint(eager=True)

    axis = price_axis()
    sp = spend()

    variants = {
        "prefix_sum:window": lambda: with_prefix_sum(
            axis, [F.asc("v")], ["cnt"], suffix="_c", materialize=False
        ),
        "prefix_sum:arrow": lambda: with_prefix_sum(
            axis, [F.asc("v")], ["cnt"], suffix="_c", materialize=False,
            arrow_impl=True,
        ),
        "row_number:window": lambda: with_global_row_number(
            sp, [F.desc("cents"), F.asc("o_custkey")], out="rn",
            total_out="n", materialize=False,
        ),
        "row_number:arrow": lambda: with_global_row_number(
            sp, [F.desc("cents"), F.asc("o_custkey")], out="rn",
            total_out="n", materialize=False, arrow_impl=True,
        ),
        "prefix_max:window": lambda: with_prefix_max(
            sp, [F.asc("o_custkey")], "cents", out="pm", materialize=False
        ),
        "prefix_max:arrow": lambda: with_prefix_max(
            sp, [F.asc("o_custkey")], "cents", out="pm", materialize=False,
            arrow_impl=True,
        ),
    }
    for fn in variants.values():
        noop(fn())
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            t0 = time.monotonic()
            noop(fn())
            samples[k].append(time.monotonic() - t0)
    for k, s in samples.items():
        s.sort()
        print(
            json.dumps(
                {
                    "name": k,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "cpus": cpus,
                    "min": round(s[0], 4),
                    "med": round(s[len(s) // 2], 4),
                    "max": round(s[-1], 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
