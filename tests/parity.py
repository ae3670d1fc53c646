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


def duck_register(con, sf_dir: str) -> None:
    for t in STAR_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _canon_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> ISO strings, numpy scalars -> python
    out = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if isinstance(v, pd.Timestamp):
                canon_row.append(v.isoformat())
            elif v is pd.NaT:
                canon_row.append(None)
            elif pd.api.types.is_scalar(v) and pd.isna(v):
                canon_row.append(None)
            elif hasattr(v, "item"):
                canon_row.append(_canon_cell(v.item()))
            else:
                canon_row.append(_canon_cell(v))
        out.append(tuple(canon_row))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con, oracle: str) -> dict:
    sp = spark_df.toPandas()
    du = con.execute(oracle).df()
    result = {
        "spark_rows": len(sp),
        "duck_rows": len(du),
        "spark_cols": sorted(sp.columns),
        "duck_cols": sorted(du.columns),
        "match": False,
        "detail": "",
    }
    if sorted(sp.columns) != sorted(du.columns):
        result["detail"] = "column mismatch"
        return result
    if len(sp) != len(du):
        result["detail"] = "row count mismatch"
        return result
    a, b = _canon(sp), _canon(du)
    if a == b:
        result["match"] = True
        return result
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    result["detail"] = f"{len(diffs)} differing rows; first: spark={diffs[0][0]} duck={diffs[0][1]}"
    return result
