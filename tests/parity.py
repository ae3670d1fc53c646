"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query's Spark plan and its oracle SQL side by side and
demands *exact* value equality after column-name sort + row sort — a
stricter local gate than the driver's order-insensitive value hash, so a
local pass implies a driver pass.
"""

from __future__ import annotations

import math
import os
from typing import Any

import pandas as pd

from cdc_export_system_spark.schemas import STAR_TABLES


#: DuckDB type name -> the Spark simpleString type the query must produce for
#: the driver's typed value-hash to agree.  ``None`` means the DuckDB type has
#: no hash-stable Spark counterpart (e.g. HUGEINT, the int128 result of
#: SUM over integers) and the oracle must cast it away explicitly.
_DUCK_TO_SPARK: dict[str, str | None] = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "UBIGINT": None,
    "HUGEINT": None,
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BOOLEAN": "boolean",
    "BLOB": "binary",
    "INTERVAL": None,
    "TIME": None,
}


def duck_to_spark_type(duck_type: str) -> str | None:
    """Map a DuckDB result-column type to the Spark ``simpleString`` type
    required for typed-hash parity; None if no stable mapping exists."""
    t = duck_type.strip().upper()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]"):
        inner = duck_to_spark_type(t[:-2])
        return None if inner is None else f"array<{inner}>"
    if t.startswith("STRUCT") or t.startswith("MAP") or t.startswith("UNION"):
        return None  # compare structurally case-by-case; not used by oracles
    return _DUCK_TO_SPARK.get(t)


def duck_register(con, sf_dir: str) -> None:
    for t in STAR_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _canon_cell(v: Any) -> Any:
    import datetime as _dt
    import numpy as np

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            # Spark toPandas renders NULL doubles as NaN, so NULL and NaN
            # are indistinguishable here; conflate them (driver-side the
            # typed hash sees true NULLs on both engines).
            return None
        return v
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return None
    return v


def _canon_rows(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def dtype_mismatches(spark_df, con, oracle: str) -> list[str]:
    """Spark output type vs DuckDB oracle result type, per column — the
    local stand-in for the driver's *typed* value hash. DuckDB types
    come from DESCRIBE (no execution); a type with no stable Spark
    mapping (HUGEINT, ...) is always a finding: the oracle must cast
    it away."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    duck_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle}").fetchall()}
    if sorted(spark_types) != sorted(duck_types):
        return [f"column sets differ: {sorted(spark_types)} vs {sorted(duck_types)}"]
    finds = []
    for col, dt in duck_types.items():
        want = duck_to_spark_type(dt)
        if want is None:
            finds.append(f"{col}: duckdb {dt} has no hash-stable spark mapping (spark={spark_types[col]})")
        elif want != spark_types[col]:
            finds.append(f"{col}: duckdb {dt} -> expect spark {want}, got {spark_types[col]}")
    return finds


def compare(spark_df, con, oracle: str) -> dict:
    sp = spark_df.toPandas()
    cur = con.execute(oracle)
    du_cols = [d[0] for d in cur.description]
    du_rows = cur.fetchall()
    result = {
        "spark_rows": len(sp),
        "duck_rows": len(du_rows),
        "spark_cols": sorted(sp.columns),
        "duck_cols": sorted(du_cols),
        "match": False,
        "detail": "",
    }
    if sorted(sp.columns) != sorted(du_cols):
        result["detail"] = "column mismatch"
        return result
    if len(sp) != len(du_rows):
        result["detail"] = "row count mismatch"
        return result
    dtypes = dtype_mismatches(spark_df, con, oracle)
    if dtypes:
        result["detail"] = "dtype mismatch: " + "; ".join(dtypes)
        return result
    sp_rows = list(sp.itertuples(index=False, name=None))
    a = _canon_rows(sp_rows, list(sp.columns))
    b = _canon_rows(du_rows, du_cols)
    if a == b:
        result["match"] = True
        return result
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    result["detail"] = f"{len(diffs)} differing rows; first: spark={diffs[0][0]} duck={diffs[0][1]}"
    return result
