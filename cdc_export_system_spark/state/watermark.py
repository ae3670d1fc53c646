"""Per-consumer watermark state — the engine's only mutable state.

Reference semantics (app/services/watermark.py:7-26, app/models.py:16-22):
one row per consumer_id (unique), ``last_exported_at`` is the high-water
``updated_at`` of the last successful export, ``updated_at`` bumps on
every upsert.

Spark has no transactional MERGE without a table format, so durability is
a snapshot-versioned directory with an atomically swapped CURRENT pointer
(the same commit idea as a Structured Streaming checkpoint's offset log):

    state_dir/
      versions/<uuid>/part-*.parquet   # immutable full snapshots
      CURRENT                          # text file naming the live version

``os.replace`` of the pointer file is atomic on POSIX, so readers see
either the old or the new snapshot, never a partial write — the batch
analogue of the reference's DB transaction (jobs.py:31-60). The state
table is tiny (one row per consumer), so full-snapshot-per-commit is the
right trade at any scale; it also gives free time travel for debugging.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from cdc_export_system_spark.schemas import WATERMARKS_SCHEMA

_CURRENT = "CURRENT"
_VERSIONS = "versions"


class WatermarkStore:
    """Keyed watermark state with atomic last-wins upserts."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(os.path.join(state_dir, _VERSIONS), exist_ok=True)

    # -- read path -------------------------------------------------------

    def _current_version(self) -> str | None:
        try:
            with open(os.path.join(self.state_dir, _CURRENT)) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def snapshot(self) -> DataFrame:
        """The live watermark table (empty DataFrame when uninitialized)."""
        version = self._current_version()
        if version is None:
            return self.spark.createDataFrame([], WATERMARKS_SCHEMA)
        path = os.path.join(self.state_dir, _VERSIONS, version)
        return self.spark.read.parquet(path)

    def get(self, consumer_id: str) -> datetime | None:
        """Point lookup (reference watermark.py:7-9). Returns None when the
        consumer has never completed an export — the caller decides the
        no-watermark policy (exports.py:110-113: export nothing)."""
        row = (
            self.snapshot()
            .filter(F.col("consumer_id") == consumer_id)
            .select("last_exported_at")
            .first()
        )
        return None if row is None else row["last_exported_at"]

    # -- write path ------------------------------------------------------

    def upsert(self, consumer_id: str, last_exported_at: datetime) -> None:
        """Insert-or-update one consumer row (reference watermark.py:11-26),
        committed atomically via the CURRENT pointer swap."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        new_row = self.spark.createDataFrame(
            [Row(consumer_id=consumer_id, last_exported_at=last_exported_at, updated_at=now)],
            WATERMARKS_SCHEMA,
        )
        merged = (
            self.snapshot().filter(F.col("consumer_id") != consumer_id).unionByName(new_row)
        )
        self._commit(merged)

    def _commit(self, df: DataFrame) -> None:
        version = uuid.uuid4().hex
        path = os.path.join(self.state_dir, _VERSIONS, version)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        tmp_pointer = os.path.join(self.state_dir, f".{_CURRENT}.{version}.tmp")
        with open(tmp_pointer, "w") as f:
            f.write(version)
        os.replace(tmp_pointer, os.path.join(self.state_dir, _CURRENT))
        self._gc(keep=version)

    def _gc(self, keep: str, retain: int = 5) -> None:
        """Drop all but the newest few snapshots (never the live one)."""
        vdir = os.path.join(self.state_dir, _VERSIONS)
        versions = sorted(
            (os.path.join(vdir, v) for v in os.listdir(vdir)),
            key=os.path.getmtime,
            reverse=True,
        )
        for stale in versions[retain:]:
            if os.path.basename(stale) != keep:
                shutil.rmtree(stale, ignore_errors=True)
