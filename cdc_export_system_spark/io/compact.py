"""Small-file compaction — the maintenance op every long-running CDC sink
needs.

Each incremental export (reference: one CSV per job) or streaming
micro-batch appends a few small files; after months a 100 TB table is
millions of KB-sized files and the scan is metadata-bound (open/footer
cost per file dwarfs row IO). Compaction rewrites a directory into
target-sized files:

* file count = ceil(bytes / target), measured from the actual on-disk
  size, so output files land near the target regardless of row width;
* round-robin repartition (no keys → no skew, no shuffle-by-value cost
  beyond the rewrite itself);
* write-to-new-directory + atomic swap is the caller's choice — the
  function never overwrites its input (same posture as the CSV sink's
  temp+rename commit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 << 20  # the classic HDFS/parquet sweet spot


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet directory ``src`` into ``dst`` with files of
    roughly ``target_bytes``. Returns the output file count. ``dst`` must
    not be ``src`` (no in-place rewrites; swap atomically after)."""
    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compact_parquet refuses in-place rewrites; write then swap")
    n_files = max(1, -(-dir_bytes(src) // target_bytes))  # ceil
    spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
