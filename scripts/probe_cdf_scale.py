"""Change-data-feed scale probe (round 11): CDF derivation cost must
track the REWRITTEN data, never the table.

LogTable.changes(v, v) diffs only the files commit v removed against
the files it added, so a merge confined to one key-range bucket should
yield a CDF read that is ~n_files x cheaper than one that rewrote every
bucket — at ANY table size. This probe builds a LogTable from the sf1
``orders`` (1.5M rows, 64 range buckets), applies one narrow merge
(keys inside the lowest bucket) and one full-spread merge (keys % 7),
and times the CDF read for each commit through the exact shipped code.

Usage: python scripts/probe_cdf_scale.py
Prints one JSON line per measured point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_export_system_spark.io.sources import load_table
from cdc_export_system_spark.io.txn_table import LogTable
from cdc_export_system_spark.session import get_spark

SRC = "/root/repo/testdata_sf1"
N_FILES = 64
COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"]


def timed_count(df):
    t0 = time.monotonic()
    n = df.count()
    return round(time.monotonic() - t0, 2), n


def main() -> None:
    spark = get_spark(app_name="probe-cdf-scale")
    root = tempfile.mkdtemp(prefix="cdf-probe-")
    try:
        orders = load_table(spark, SRC, "orders").select(COLS)
        n_rows = orders.count()
        t = LogTable.create(spark, root, orders, "o_orderkey",
                            n_files=N_FILES)
        mx = orders.agg(F.max("o_orderkey")).head()[0]
        k = int(mx) // N_FILES + 1
        key = F.col("o_orderkey")

        # v2: NARROW merge — keys inside the lowest bucket only
        narrow = (
            orders.filter(key < k)
            .withColumn("o_orderstatus", F.lit("X"))
            .withColumn("_deleted", F.lit(False))
        )
        _, stats_narrow = t.merge(narrow)

        # v3: FULL-SPREAD merge — keys % 7 touch every bucket
        wide = (
            orders.filter(key % 7 == 0)
            .withColumn("o_orderstatus", F.lit("Y"))
            .withColumn("_deleted", F.lit(False))
        )
        _, stats_wide = t.merge(wide)

        for label, version, stats in (
            ("cdf_narrow_1_bucket", 2, stats_narrow),
            ("cdf_wide_all_buckets", 3, stats_wide),
        ):
            timed_count(t.changes(version, version))  # warm
            w1, n_changes = timed_count(t.changes(version, version))
            w2, _ = timed_count(t.changes(version, version))
            print(
                json.dumps(
                    {
                        "probe": label,
                        "table_rows": n_rows,
                        "files_total": N_FILES,
                        "files_touched": stats["files_touched"],
                        "rows_rewritten": stats["rows_rewritten"],
                        "change_rows": n_changes,
                        "wall_s": min(w1, w2),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
