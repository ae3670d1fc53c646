"""One-shot audit: compare Spark output schema vs DuckDB oracle result types
for every oracle-carrying registered query.

The driver's correctness hash is *typed*: a DuckDB DATE vs Spark TIMESTAMP, or
a DuckDB HUGEINT (sum of ints) vs Spark BIGINT, hash-diverges even when the
values are equal.  The local pandas-based parity test is blind to both classes
(duckdb .df() widens DATE->datetime64 and HUGEINT->float64, and Python's
0 == 0.0).  This script surfaces every such divergence without executing the
Spark plans (schema is lazy) and only DESCRIBE-ing the oracles.

Run: python scripts/audit_dtypes.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from cdc_export_system_spark.registry import load_all
from cdc_export_system_spark.session import get_spark
from tests.parity import duck_register, duck_to_spark_type

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    registry = load_all()
    spark = get_spark(app_name="dtype-audit", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    duck_register(con, SF_DIR)

    bad = []
    for name, spec in sorted(registry.items()):
        if spec.oracle is None:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            duck_types = {r[0]: r[1] for r in desc}
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        if sorted(spark_types) != sorted(duck_types):
            bad.append((name, f"column sets differ: {sorted(spark_types)} vs {sorted(duck_types)}"))
            continue
        for col, dt in duck_types.items():
            want = duck_to_spark_type(dt)
            got = spark_types[col]
            if want is None:
                bad.append((name, f"col {col}: duckdb type {dt} has no stable spark mapping (spark={got})"))
            elif want != got:
                bad.append((name, f"col {col}: duckdb {dt} -> expect spark {want}, got {got}"))

    for name, msg in bad:
        print(f"{name}: {msg}")
    print(f"\n{len(bad)} mismatching (query,col) pairs across {len(set(n for n, _ in bad))} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
