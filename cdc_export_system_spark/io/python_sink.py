"""Custom Python DataSource *writer*: a distributed CSV sink with a
two-phase commit — the scale-out form of the reference's CSV export
(reference ``app/services/exports.py:20-67`` writes one file from a
driver-side list; here every task streams its partition to a staged
part file and the driver publishes atomically).

Commit protocol (the part the API exists for):

1. each task writes ``_staging/<uuid>/part-<uuid>.csv`` and returns the
   file name + row count in its WriterCommitMessage;
2. ``commit`` (driver, all tasks succeeded) renames the staged parts
   into the target directory and writes a ``_SUCCESS`` manifest listing
   every part with its row count — readers treat manifest presence as
   publication (same contract as io/parquet_sink.py);
3. ``abort`` removes the staging directory — a failed job leaves no
   partial output, the Spark-side analogue of the reference's
   transaction rollback (``app/services/jobs.py:51-58``).

Task retries are safe: each attempt stages under a fresh uuid and only
files named in commit messages are published (speculative/failed
attempts are swept with the staging dir).

CSV cells follow the reference's byte contract (io/csv_sink.py):
isoformat timestamps, Python True/False booleans.

Storage note: staging + rename assumes the path is one filesystem
visible to driver and executors (true on local mode and on any shared
mount); the protocol itself is storage-agnostic — on object stores the
rename step becomes a manifest-only publish, which is exactly what the
_SUCCESS manifest already encodes.
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _PartCommit(WriterCommitMessage):
    filename: str
    n_rows: int


def _cell(v) -> str:
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return "True" if v else "False"
    if v is None:
        return ""
    return str(v)


class CsvDirWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("csvdir sink requires a path option")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.run_id = uuid.uuid4().hex[:12]
        self.staging = os.path.join(self.path, f"_staging-{self.run_id}")
        os.makedirs(self.staging, exist_ok=True)

    # executor-side: one staged part per task attempt
    def write(self, iterator: Iterator) -> _PartCommit:
        name = f"part-{uuid.uuid4().hex}.csv"
        tmp = os.path.join(self.staging, name)
        n = 0
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(self.columns)
            for row in iterator:
                w.writerow([_cell(v) for v in row])
                n += 1
        return _PartCommit(filename=name, n_rows=n)

    # driver-side: publish exactly the committed parts, atomically-ish
    def commit(self, messages) -> None:
        parts = [m for m in messages if m is not None]
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".csv") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        for m in parts:
            os.replace(
                os.path.join(self.staging, m.filename),
                os.path.join(self.path, m.filename),
            )
        manifest = "\n".join(f"{m.filename},{m.n_rows}" for m in parts)
        tmp = os.path.join(self.path, f"_SUCCESS.{self.run_id}.tmp")
        with open(tmp, "w") as f:
            f.write(manifest + ("\n" if manifest else ""))
        os.replace(tmp, os.path.join(self.path, "_SUCCESS"))
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class CsvDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "csvdir"

    def writer(self, schema, overwrite: bool) -> CsvDirWriter:
        return CsvDirWriter(self.options, schema, overwrite)


def register_csvdir(spark) -> None:
    spark.dataSource.register(CsvDirDataSource)
