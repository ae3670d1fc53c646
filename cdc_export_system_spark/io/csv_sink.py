"""CSV export sink with the reference's byte-level contract.

Contract (reference app/services/exports.py:20-67):

* header ``id,name,email,created_at,updated_at,is_deleted``; delta exports
  prepend ``operation`` (exports.py:31,33)
* timestamps serialized with ``datetime.isoformat()`` — microseconds +
  ``+00:00`` offset (exports.py:52-53)
* booleans as Python ``True`` / ``False`` strings (exports.py:54)
* rows ordered by ``updated_at`` ascending (exports.py:83,123,159)
* zero rows => **no file at all** (exports.py:87-88,127-128,163-164)

The serialization runs JVM-side (date_format/when inside codegen); Python
never touches row data. The write commits via temp-dir + atomic rename,
which is *stronger* than the reference (it can leave a CSV behind on a
failed transaction, exports.py:90 vs jobs.py:42 — documented divergence).

Scale note: ``single_file=True`` reproduces the reference's one-file
contract via a final coalesce(1) — correct for operational exports. For
100 TB extracts pass ``single_file=False``: every task writes its own
part file in parallel and the commit renames the whole directory.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, functions as F

from cdc_export_system_spark.functions.scalars import iso_utc

_BOOL_COLS = ("is_deleted",)
_TS_COLS = ("created_at", "updated_at")


def _serialize(col_name: str, dtype: str) -> Column:
    col = F.col(col_name)
    if dtype == "timestamp":
        return iso_utc(col).alias(col_name)
    if dtype == "boolean":
        return F.when(col, "True").otherwise("False").alias(col_name)
    return col.cast("string").alias(col_name)


def write_users_csv(
    df: DataFrame,
    filepath: str,
    columns: list[str],
    order_by: str = "updated_at",
    single_file: bool = True,
) -> int:
    """Write an export CSV; returns rows written. No file when 0 rows."""
    dtypes = dict(df.dtypes)
    out = df.orderBy(order_by).select([_serialize(c, dtypes[c]) for c in columns])

    tmp_dir = f"{filepath}.__tmp__{uuid.uuid4().hex}"
    try:
        writer = (out.coalesce(1) if single_file else out).write.option("header", True).option(
            "emptyValue", ""
        )
        writer.csv(tmp_dir)
        parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*.csv")))
        # Row count from the committed files' line counts (header per part).
        n_rows = 0
        for p in parts:
            with open(p, "rb") as f:
                n_rows += sum(1 for _ in f) - 1
        if n_rows == 0:
            return 0  # empty export => no file (exports.py:87-88)
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        if single_file:
            os.replace(parts[0], filepath)
        else:
            final_dir = filepath
            staged = f"{final_dir}.__swap__{uuid.uuid4().hex}"
            os.makedirs(staged)
            for i, p in enumerate(parts):
                os.replace(p, os.path.join(staged, f"part-{i:05d}.csv"))
            if os.path.exists(final_dir):
                shutil.rmtree(final_dir)
            os.replace(staged, final_dir)
        return n_rows
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
