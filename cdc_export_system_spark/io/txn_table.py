"""LogTable: a transaction-log parquet table format (Delta-lake-shaped).

The reference system applies CDC batches to a Postgres table and trusts
the database for atomicity (reference: app/services/export_service.py's
session.commit()). At 100 TB there is no database — the lakehouse
answer is a TABLE FORMAT: immutable parquet data files plus an ordered
commit log that defines, for every version, exactly which files are
live. This module implements that shape with zero external
dependencies, mirroring the public Delta Lake / Iceberg design points:

* **Commit log** — ``_txn_log/<20-digit-version>.json``, one JSON-lines
  file per commit holding ``meta`` / ``add`` / ``remove`` actions.
  ``add`` carries per-file row counts and PRIMARY-KEY MIN/MAX stats.
* **Atomic commits, optimistic concurrency** — the version file is
  created with ``O_CREAT | O_EXCL`` (atomic on a POSIX filesystem; on
  an object store you would swap in a commit service or conditional
  PUT, which is exactly what Delta-on-S3 does). A loser re-reads the
  log, checks for conflicts (any file it read-or-removed that a
  concurrent commit removed), and retries or raises.
* **Snapshot isolation & time travel** — a read resolves the log at a
  version (default: latest), replays add/remove into the live file
  set, and reads ONLY those parquet files. Data files are immutable,
  so version v reads identically forever; ``read(version=v)`` is time
  travel; uncommitted writer files are invisible (crash atomicity).
* **Copy-on-write MERGE** — ``merge`` upserts/deletes a change batch by
  primary key: the batch's key range is joined against the log's
  min/max file stats, ONLY overlapping files are rewritten (plus one
  new file for inserts), everything else is carried forward untouched.
  At scale this is the difference between rewriting a 100 TB table and
  rewriting the handful of files an incremental batch touches.
* **Log checkpoints** — every ``CHECKPOINT_EVERY`` commits the resolved
  action state is also written as ``<version>.checkpoint.parquet``;
  readers start from the newest checkpoint <= the requested version,
  so log replay is O(commits since checkpoint), not O(all commits) —
  the Delta ``_last_checkpoint`` discipline.
* **Vacuum** — deletes data files no LIVE version references (i.e.
  removed at or before a horizon version); time travel to vacuumed
  versions then correctly fails fast.

Scale notes. The log itself is tiny (one small JSON per commit, stats
not data); snapshot reads hand Spark a plain parquet file list, so
column pruning / predicate pushdown / partition-sized splits all apply
unchanged. MERGE does one broadcast-range prune over FILE STATS (a
driver-side list, thousands of entries for a 100 TB table) and one
shuffle of only the touched files' rows joined against the batch.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_export_system_spark.io.atomic import link_publish

LOG_DIR = "_txn_log"
CHECKPOINT_EVERY = 10
# vacuum() also sweeps crash-orphaned artifacts — _log-*.tmp /
# _staging-* AND never-referenced part-*.parquet (a writer's staged
# data files between _write_files and _commit) — but only past this
# age so it can never race a LIVE writer that is mid-commit (commits
# take milliseconds; the horizon is hours). Part files retired by a
# COMMITTED remove-action are vacuumable at any age.
TMP_SWEEP_HORIZON_S = 3600.0


class CommitConflict(Exception):
    """Optimistic-concurrency loser with a real overlap (same files)."""


def _log_path(root: str, version: int) -> str:
    return os.path.join(root, LOG_DIR, f"{version:020d}.json")


def _ckpt_path(root: str, version: int) -> str:
    return os.path.join(root, LOG_DIR, f"{version:020d}.checkpoint.parquet")


_EXACT_STAT_TYPES = {"INT32", "INT64"}  # footer min/max exact, never truncated


def _pk_stats(md, pk: str, src: str) -> tuple:
    """(min_pk, max_pk) for a freshly staged file — from the parquet
    FOOTER statistics when the pk is an integer column (Spark always
    writes them, and integer stats are exact by spec), falling back to
    a data-page read of the pk column otherwise (string stats may be
    truncated, and a foreign writer could omit stats). The footer path
    reads zero data pages: stats collection used to be a full pk-column
    re-read per staged file — measurable at bench scale, pure waste at
    100 TB where it re-reads the whole key space once per merge."""
    idx = None
    for i in range(len(md.schema)):
        c = md.schema.column(i)
        if c.name == pk and c.physical_type in _EXACT_STAT_TYPES:
            idx = i
            break
    if idx is not None:
        mn = mx = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                mn = None
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        if mn is not None:
            return mn, mx
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    col = pq.read_table(src, columns=[pk]).column(0)
    return pc.min(col).as_py(), pc.max(col).as_py()


def _list_versions(root: str) -> list[int]:
    d = os.path.join(root, LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json"):
            out.append(int(name[:-5]))
    return sorted(out)


class Snapshot:
    def __init__(self, version: int, meta: dict, files: dict[str, dict]):
        self.version = version
        self.meta = meta
        self.files = files  # path -> add-action stats

    @property
    def paths(self) -> list[str]:
        return sorted(self.files)


class LogTable:
    """One table root. All state lives on disk; instances are cheap."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------- log --

    def _replay(self, version: int | None = None) -> Snapshot:
        versions = _list_versions(self.root)
        if not versions:
            raise FileNotFoundError(f"no LogTable at {self.root}")
        target = versions[-1] if version is None else version
        if target not in versions:
            raise ValueError(
                f"version {target} does not exist (have {versions[:3]}..)"
            )
        meta: dict = {}
        files: dict[str, dict] = {}
        start = 0
        # newest checkpoint at or below target fast-forwards the replay
        for v in reversed([v for v in versions if v <= target]):
            cp = _ckpt_path(self.root, v)
            if os.path.exists(cp):
                import pyarrow.parquet as pq

                tbl = pq.read_table(cp).to_pylist()
                for row in tbl:
                    if row["kind"] == "meta":
                        meta = json.loads(row["body"])
                    else:
                        files[row["path"]] = json.loads(row["body"])
                start = v + 1
                break
        for v in [x for x in versions if start <= x <= target]:
            with open(_log_path(self.root, v)) as f:
                for line in f:
                    action = json.loads(line)
                    if "meta" in action:
                        meta = action["meta"]
                    elif "add" in action:
                        files[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        if action["remove"]["path"] not in files:
                            raise ValueError(
                                "vacuumed or unknown file removed at "
                                f"v{v}: time travel below the vacuum "
                                "horizon is gone"
                            )
                        del files[action["remove"]["path"]]
        # a vacuumed file may still be referenced when time-traveling
        # BELOW the vacuum horizon — fail fast, not silently partial
        for path in files:
            if not os.path.exists(os.path.join(self.root, path)):
                raise ValueError(
                    f"version {target} references vacuumed file {path}"
                )
        return Snapshot(target, meta, files)

    def _commit(
        self,
        actions: list[dict],
        read_version: int,
        touched: set[str],
        max_retries: int = 20,
    ) -> int:
        """Atomically publish the next log file via link(2) election.

        The payload is written COMPLETELY (and fsynced) to a hidden
        temp name first, then ``os.link``ed to the versioned name:
        link fails with EEXIST if a concurrent winner already owns the
        version (the same exclusive election O_CREAT|O_EXCL gave), and
        — unlike writing into an O_EXCL-created file — the log entry
        appears to every reader fully formed or not at all. The
        earlier write-after-create form lost exactly that property:
        the multi-writer stress pin caught a replayer listing a
        version whose payload was not yet flushed, dropping its adds
        and then failing on the next version's removes
        (tests/test_txn_table.py::
        test_concurrent_writers_serialize_without_loss).

        On losing the race: re-validate that the winner removed no
        file we read or removed (if it did -> CommitConflict), else
        retry on top."""
        stamped = [
            {"commit": {"ts_us": time.time_ns() // 1_000}},
            *actions,
        ]
        payload = "".join(json.dumps(a, sort_keys=True) + "\n" for a in stamped)
        tmp = os.path.join(self.root, f"_log-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            attempt = read_version + 1
            for _ in range(max_retries):
                if not link_publish(tmp, _log_path(self.root, attempt)):
                    # concurrent winner: check their actions against ours
                    with open(_log_path(self.root, attempt)) as f:
                        for line in f:
                            act = json.loads(line)
                            if (
                                "remove" in act
                                and act["remove"]["path"] in touched
                            ):
                                raise CommitConflict(
                                    f"file {act['remove']['path']} was "
                                    "removed by concurrent commit "
                                    f"v{attempt}"
                                )
                    attempt += 1
                    continue
                self._maybe_checkpoint(attempt)
                return attempt
            raise CommitConflict(f"lost {max_retries} commit races")
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _maybe_checkpoint(self, version: int) -> None:
        if version % CHECKPOINT_EVERY != 0:
            return
        snap = self._replay(version)
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [{"kind": "meta", "path": "", "body": json.dumps(snap.meta)}]
        rows += [
            {"kind": "add", "path": p, "body": json.dumps(a)}
            for p, a in sorted(snap.files.items())
        ]
        tmp = _ckpt_path(self.root, version) + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(pa.Table.from_pylist(rows), tmp)
        os.replace(tmp, _ckpt_path(self.root, version))

    # ------------------------------------------------------------ data --

    def _write_files(
        self, df: DataFrame, pk: str, k: int, n_files: int
    ) -> list[dict]:
        """Write df as ONE parquet file per non-empty pk-range bucket
        (bucket = pk div k) and return add-actions with per-file pk
        min/max stats. Bucket membership is a pure function of the key,
        so file boundaries — and therefore merge pruning — are
        deterministic across runs and partitionings. Files land under a
        staging dir first; a crash before commit leaves only
        unreferenced garbage (invisible to every reader, swept by
        vacuum)."""
        staging = os.path.join(self.root, f"_staging-{uuid.uuid4().hex}")
        bucketed = df.withColumn(
            "_b", (F.col(pk) / F.lit(k)).cast("long")
        ).repartition(max(1, n_files), "_b")
        bucketed.write.mode("overwrite").partitionBy("_b").parquet(staging)
        adds = []
        import pyarrow.parquet as pq

        for bdir in sorted(os.listdir(staging)):
            if not bdir.startswith("_b="):
                continue
            bpath = os.path.join(staging, bdir)
            parts = sorted(
                p for p in os.listdir(bpath) if p.endswith(".parquet")
            )
            assert len(parts) == 1, f"bucket {bdir} split across files"
            src = os.path.join(bpath, parts[0])
            md = pq.read_metadata(src)
            if md.num_rows == 0:
                continue
            mn, mx = _pk_stats(md, pk, src)
            final = f"part-{uuid.uuid4().hex}.parquet"
            adds.append(
                {
                    "path": final,
                    "rows": md.num_rows,
                    "min_pk": mn,
                    "max_pk": mx,
                }
            )
            os.replace(src, os.path.join(self.root, final))
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return adds

    # ------------------------------------------------------------- api --

    @classmethod
    def create(
        cls, spark: SparkSession, root: str, df: DataFrame, pk: str,
        n_files: int = 8, max_pk_hint: int | None = None,
    ) -> "LogTable":
        """Create version 1 from df, bucketing rows into n_files files
        by pk range (deterministic membership: file i holds pk div K ==
        i for a fixed K), so file stats and pruning behave identically
        across runs and partitionings. ``max_pk_hint``: callers that
        already know max(pk) (or any upper bound >= it) pass it to
        skip the dedicated max-scan action — one full pass over df
        saved; bucket K only needs AN upper bound, membership stays a
        pure function of the key."""
        os.makedirs(os.path.join(root, LOG_DIR), exist_ok=True)
        t = cls(spark, root)
        hi = (
            max_pk_hint
            if max_pk_hint is not None
            else df.agg(F.max(pk)).head()[0]
        )
        k = max(1, (0 if hi is None else int(hi)) // n_files + 1)
        actions: list[dict] = [
            {
                "meta": {
                    "pk": pk,
                    "schema": df.schema.json(),
                    "bucket_k": k,
                    "n_files": n_files,
                }
            }
        ]
        for add in t._write_files(df, pk, k, n_files):
            actions.append({"add": add})
        t._commit(actions, read_version=0, touched=set())
        return t

    def read(self, version: int | None = None) -> DataFrame:
        """Resolve the snapshot (and ITS meta — schema + column mapping
        are versioned, so time travel reads every version under that
        version's own logical schema), scan the live files with the
        PHYSICAL schema, and alias physical -> logical."""
        snap = self._replay(version)
        paths = [os.path.join(self.root, p) for p in snap.paths]
        if not paths:
            return self.spark.createDataFrame([], self._schema(snap))
        phys = self.spark.read.schema(self._physical_schema(snap)).parquet(
            *paths
        )
        mapping = self._mapping(snap)
        return phys.select(
            *[
                F.col(mapping[f.name]).alias(f.name)
                for f in self._schema(snap).fields
            ]
        )

    def _schema(self, snap: Snapshot):
        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(snap.meta["schema"]))

    # -------------------------------------------- column mapping -------
    # Logical (user-facing) column names map to PHYSICAL parquet column
    # names — the Delta columnMapping design point. Data files are
    # immutable, so rename/drop are metadata-only commits: the mapping
    # changes, the files do not. Legacy logs without a mapping read as
    # identity. ``all_physical`` records every physical name ever
    # allocated so a column re-added after a drop NEVER resurrects the
    # dropped column's old data (it gets a fresh physical name).

    def _mapping(self, snap: Snapshot) -> dict[str, str]:
        m = snap.meta.get("column_mapping")
        if m is None:
            m = {f.name: f.name for f in self._schema(snap).fields}
        return m

    def _physical_schema(self, snap: Snapshot):
        from pyspark.sql.types import StructField, StructType

        mapping = self._mapping(snap)
        return StructType(
            [
                StructField(mapping[f.name], f.dataType, f.nullable)
                for f in self._schema(snap).fields
            ]
        )

    def _to_physical(self, df: DataFrame, snap: Snapshot) -> DataFrame:
        mapping = self._mapping(snap)
        return df.select(
            *[
                F.col(f.name).alias(mapping[f.name])
                for f in self._schema(snap).fields
            ]
        )

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only RENAME: the logical schema and mapping change,
        every immutable data file keeps its physical column untouched.
        Time travel below this commit still reads the old name."""
        snap = self._replay()
        schema = self._schema(snap)
        if old not in schema.fieldNames():
            raise ValueError(f"no such column {old!r}")
        if new in schema.fieldNames():
            raise ValueError(f"column {new!r} already exists")
        mapping = dict(self._mapping(snap))
        mapping[new] = mapping.pop(old)
        from pyspark.sql.types import StructField, StructType

        new_schema = StructType(
            [
                StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        meta = {
            **snap.meta,
            "schema": new_schema.json(),
            "column_mapping": mapping,
            "all_physical": sorted(
                set(snap.meta.get("all_physical", [])) | set(mapping.values())
            ),
        }
        if snap.meta["pk"] == old:
            meta["pk"] = new
        return self._commit([{"meta": meta}], snap.version, touched=set())

    def drop_column(self, name: str) -> int:
        """Metadata-only DROP: the column leaves the logical schema and
        mapping; its physical data stays in the immutable files (and
        remains readable by time travel below this commit). The primary
        key cannot be dropped."""
        snap = self._replay()
        schema = self._schema(snap)
        if name not in schema.fieldNames():
            raise ValueError(f"no such column {name!r}")
        if name == snap.meta["pk"]:
            raise ValueError("cannot drop the primary key column")
        mapping = dict(self._mapping(snap))
        retired = mapping.pop(name)
        from pyspark.sql.types import StructType

        new_schema = StructType([f for f in schema.fields if f.name != name])
        meta = {
            **snap.meta,
            "schema": new_schema.json(),
            "column_mapping": mapping,
            "all_physical": sorted(
                set(snap.meta.get("all_physical", []))
                | set(mapping.values())
                | {retired}
            ),
        }
        return self._commit([{"meta": meta}], snap.version, touched=set())

    def history(self) -> list[int]:
        return _list_versions(self.root)

    def commit_timestamps(self) -> dict[int, int]:
        """version -> commit timestamp (µs), ADJUSTED to be strictly
        monotonic in version order (effective_ts(v) = max(recorded,
        effective_ts(v-1)+1)) — the Delta Lake timestamp-adjustment
        rule, which makes "as of ts" well-defined even when a racing
        loser's clock stamped a later wall time than the next winner.
        Logs written before commit stamping fall back to file mtime."""
        out: dict[int, int] = {}
        prev = -1
        for v in _list_versions(self.root):
            ts = None
            with open(_log_path(self.root, v)) as f:
                for line in f:
                    act = json.loads(line)
                    if "commit" in act:
                        ts = int(act["commit"]["ts_us"])
                        break
            if ts is None:
                ts = int(os.path.getmtime(_log_path(self.root, v)) * 1e6)
            ts = max(ts, prev + 1)
            out[v] = ts
            prev = ts
        return out

    def version_asof(self, ts_us: int) -> int:
        """Largest version whose adjusted commit time is <= ts_us."""
        stamps = self.commit_timestamps()
        live = [v for v, t in stamps.items() if t <= ts_us]
        if not live:
            first = min(stamps.values()) if stamps else None
            raise ValueError(
                f"no commit at or before ts_us={ts_us}"
                + (f" (first commit at {first})" if first else "")
            )
        return max(live)

    def read_asof(self, ts_us: int) -> DataFrame:
        """Time travel by TIMESTAMP: resolve the as-of version from the
        commit stamps, then read that immutable snapshot."""
        return self.read(version=self.version_asof(ts_us))

    def changes(
        self, start_version: int, end_version: int | None = None
    ) -> DataFrame:
        """CHANGE DATA FEED: row-level changes made by commits
        ``start_version..end_version`` (inclusive, Delta
        ``table_changes`` semantics), derived from the copy-on-write
        log. For each commit the files it REMOVED are the pre-state
        and the files it ADDED the post-state; a primary-key diff
        classifies every key as ``insert`` / ``delete`` /
        ``update_preimage``+``update_postimage``, and rows merely
        COPIED by the rewrite (same pk, every column null-safe equal)
        are suppressed — the reader sees logical changes, not physical
        file churn. Output schema: the END version's logical schema
        plus ``_change_type`` and ``_commit_version`` (the Delta CDF
        column contract). Metadata-only commits (rename / drop /
        add-column) move no data and contribute no rows; all diffs are
        read under the END version's schema and column mapping, so a
        rename mid-range never manufactures phantom updates (physical
        names are stable).

        Scale: each commit's diff touches ONLY the files that commit
        added/removed — CDF cost is proportional to the rewritten
        data, never the table. The per-commit join runs on
        range-bucketed files whose key spans align by construction.
        This is the query-time equivalent of Delta's _change_data
        files for a format whose merges rewrite whole key-range
        buckets. Reference parity: the reference's delta export
        (app/services/export_service.py — created/updated/deleted
        since a cursor) is this same change classification computed
        from table state; cf. cdc/event_queries.py:79 (cdc_delta)."""
        from functools import reduce

        versions = _list_versions(self.root)
        if not versions:
            raise FileNotFoundError(f"no LogTable at {self.root}")
        end = versions[-1] if end_version is None else end_version
        if end not in versions or start_version not in versions:
            raise ValueError(
                f"version range [{start_version}, {end}] outside the log "
                f"(have {versions[0]}..{versions[-1]})"
            )
        if start_version > end:
            raise ValueError("start_version must be <= end_version")
        snap_e = self._replay(end)
        schema = self._schema(snap_e)
        pk = snap_e.meta["pk"]
        phys_schema = self._physical_schema(snap_e)
        mapping = self._mapping(snap_e)
        cols = [f.name for f in schema.fields]

        def _read_files(paths: list[str]) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(phys_schema).parquet(
                *[os.path.join(self.root, p) for p in paths]
            ).select(*[F.col(mapping[c]).alias(c) for c in cols])

        steps: list[DataFrame] = []
        prev_files = (
            set()
            if start_version == versions[0]
            else set(self._replay(start_version - 1).files)
        )
        for v in [x for x in versions if start_version <= x <= end]:
            cur_files = set(self._replay(v).files)
            removed = sorted(prev_files - cur_files)
            added = sorted(cur_files - prev_files)
            prev_files = cur_files
            if not removed and not added:
                continue  # metadata-only commit: no data moved
            a = _read_files(removed).alias("a")
            b = _read_files(added).alias("b")
            j = a.join(b, F.col(f"a.{pk}") == F.col(f"b.{pk}"), "full_outer")
            same = reduce(
                lambda x, y: x & y,
                [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in cols],
            )
            both = F.col(f"a.{pk}").isNotNull() & F.col(f"b.{pk}").isNotNull()

            def _emit(side: str, flt, ctype: str, ver: int = v):
                return j.filter(flt).select(
                    *[F.col(f"{side}.{c}").alias(c) for c in cols],
                    F.lit(ctype).alias("_change_type"),
                    F.lit(ver).cast("long").alias("_commit_version"),
                )

            steps.append(_emit("b", F.col(f"a.{pk}").isNull(), "insert"))
            steps.append(_emit("a", F.col(f"b.{pk}").isNull(), "delete"))
            steps.append(_emit("a", both & ~same, "update_preimage"))
            steps.append(_emit("b", both & ~same, "update_postimage"))
        if not steps:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            empty = StructType(
                [*schema.fields,
                 StructField("_change_type", StringType(), False),
                 StructField("_commit_version", LongType(), False)]
            )
            return self.spark.createDataFrame([], empty)
        result = steps[0]
        for s in steps[1:]:
            result = result.unionAll(s)
        return result

    def merge(
        self,
        changes: DataFrame,
        *,
        deleted_col: str = "_deleted",
        max_retries: int = 3,
    ) -> tuple[int, dict]:
        """Copy-on-write MERGE by primary key: rows in ``changes`` with
        ``deleted_col`` true delete their key; others upsert. Returns
        (new_version, stats) where stats records the file-pruning
        evidence: how many live files the batch's key range touched.

        Retries the whole read-rewrite-commit cycle on a losing race
        whose winner touched disjoint files would be safe to stack, but
        a true overlap raises CommitConflict to the caller."""
        # Materialize the change batch ONCE. The merge consumes it three
        # times (key-range stats, the anti-join build side, the upsert
        # leg of the rewrite) and nothing below ties those evaluations
        # together, so an un-materialized batch recomputes its whole
        # upstream subtree per use — 3x the batch's cost per merge, at
        # any scale. The batch is the DELTA (bounded relative to the
        # table), so a localCheckpoint of it is the cheap side of that
        # trade; it also freezes non-deterministic sources for free.
        # (A persist()+agg single-job variant was A/B'd in r12 and
        # measured SLOWER — cache encode plus InMemoryTableScan reads
        # cost more than the dedicated checkpoint job.)
        changes = changes.localCheckpoint(eager=True)
        return self._merge_pinned(
            changes, deleted_col=deleted_col, max_retries=max_retries
        )

    def _merge_pinned(
        self,
        changes: DataFrame,
        *,
        deleted_col: str,
        max_retries: int,
    ) -> tuple[int, dict]:
        for _ in range(max_retries):
            snap = self._replay()
            pk = snap.meta["pk"]
            lo_hi = changes.agg(
                F.min(pk).alias("lo"), F.max(pk).alias("hi")
            ).head()
            if lo_hi["lo"] is None:
                return snap.version, {
                    "files_total": len(snap.files),
                    "files_touched": 0,
                    "rows_rewritten": 0,
                }
            lo, hi = lo_hi["lo"], lo_hi["hi"]
            touched = {
                p: a
                for p, a in snap.files.items()
                if not (a["max_pk"] < lo or a["min_pk"] > hi)
            }
            schema = self._schema(snap)
            mapping = self._mapping(snap)
            if touched:
                # scan physical names, alias back to the logical schema
                base = self.spark.read.schema(
                    self._physical_schema(snap)
                ).parquet(
                    *[os.path.join(self.root, p) for p in sorted(touched)]
                ).select(
                    *[
                        F.col(mapping[f.name]).alias(f.name)
                        for f in schema.fields
                    ]
                )
            else:
                base = self.spark.createDataFrame([], schema)
            upserts = changes.filter(~F.col(deleted_col)).drop(deleted_col)
            deletes = changes.filter(F.col(deleted_col)).select(pk)
            survivors = base.join(
                F.broadcast(changes.select(pk)), pk, "left_anti"
            )
            # allowMissingColumns: after add-only schema evolution, a
            # change batch may omit (or a survivor predate) new columns
            merged = survivors.unionByName(upserts, allowMissingColumns=True)
            # fill columns the batch omitted so the physical projection
            # resolves, then write under PHYSICAL names
            for lg in mapping:
                if lg not in merged.columns:
                    merged = merged.withColumn(
                        lg, F.lit(None).cast(schema[lg].dataType)
                    )
            k = snap.meta.get("bucket_k", 1)
            n_out = snap.meta.get("n_files", max(1, len(touched)))
            actions = [{"remove": {"path": p}} for p in sorted(touched)]
            adds = self._write_files(
                self._to_physical(merged, snap), mapping[pk], k, n_out
            )
            actions += [{"add": a} for a in adds]
            try:
                v = self._commit(
                    actions, snap.version, touched=set(touched)
                )
            except CommitConflict:
                # winner overlapped us: our staged files are garbage
                # (unreferenced, vacuum sweeps them); retry on new state
                for a in adds:
                    os.remove(os.path.join(self.root, a["path"]))
                continue
            return v, {
                "files_total": len(snap.files),
                "files_touched": len(touched),
                "rows_rewritten": sum(a["rows"] for a in touched.values()),
            }
        raise CommitConflict(f"merge lost {max_retries} full cycles")

    def optimize(self, target_files: int | None = None) -> tuple[int, dict]:
        """Compaction as a COMMITTED action: rewrite the live file set
        into ``target_files`` range buckets (default: the table's
        configured n_files — re-coalescing the extra bucket files that
        out-of-range inserts accumulate). Readers never see a partial
        state: old files stay live until the single commit swaps the
        whole set, and time travel to pre-optimize versions still works
        until vacuum."""
        snap = self._replay()
        pk = snap.meta["pk"]
        n_out = target_files or snap.meta.get("n_files", 8)
        df = self.read(snap.version)
        hi = df.agg(F.max(pk)).head()[0]
        k = max(1, (0 if hi is None else int(hi)) // n_out + 1)
        adds = self._write_files(
            self._to_physical(df, snap), self._mapping(snap)[pk], k, n_out
        )
        actions: list[dict] = [
            {
                "meta": {
                    **snap.meta,
                    "bucket_k": k,
                    "n_files": n_out,
                }
            }
        ]
        actions += [{"remove": {"path": p}} for p in sorted(snap.files)]
        actions += [{"add": a} for a in adds]
        v = self._commit(actions, snap.version, touched=set(snap.files))
        return v, {
            "files_before": len(snap.files),
            "files_after": len(adds),
        }

    def add_columns(self, new_schema) -> int:
        """SCHEMA EVOLUTION (add-only): commit a widened schema. Old
        data files stay as-is; reads reconcile by filling absent
        columns with nulls (Spark's parquet reader does this given the
        table-level schema), so no data rewrite happens — the Delta
        add-column semantics. Dropping or retyping columns is refused:
        that would silently change the meaning of immutable files."""
        import json as _json

        from pyspark.sql.types import StructType

        snap = self._replay()
        old = StructType.fromJson(_json.loads(snap.meta["schema"]))
        for f in old.fields:
            match = [g for g in new_schema.fields if g.name == f.name]
            if not match or match[0].dataType != f.dataType:
                raise ValueError(
                    f"schema evolution is add-only: column {f.name!r} "
                    "missing or retyped in the new schema"
                )
        if len(new_schema.fields) == len(old.fields):
            return snap.version
        # new logical columns get physical names that NEVER collide
        # with any physical name ever allocated — re-adding a dropped
        # column must not resurrect the dropped column's old data
        mapping = dict(self._mapping(snap))
        all_physical = set(snap.meta.get("all_physical", [])) | set(
            mapping.values()
        )
        for f in new_schema.fields:
            if f.name in mapping:
                continue
            phys = f.name
            if phys in all_physical:
                phys = f"{f.name}_{uuid.uuid4().hex[:8]}"
            mapping[f.name] = phys
            all_physical.add(phys)
        actions = [
            {
                "meta": {
                    **snap.meta,
                    "schema": new_schema.json(),
                    "column_mapping": mapping,
                    "all_physical": sorted(all_physical),
                }
            }
        ]
        return self._commit(actions, snap.version, touched=set())

    def vacuum(self) -> list[str]:
        """Delete data files not referenced by the LATEST version.
        After vacuum, time travel to versions needing those files
        fails fast in _replay (documented retention=0 policy; a real
        deployment keeps a horizon).

        Also sweeps crash-orphaned writer artifacts — ``_log-*.tmp``
        commit payloads, ``_staging-*`` write dirs, and checkpoint
        temp files — that a writer killed between payload-write and
        link-election leaves behind forever (they are invisible to
        readers but accumulate; the round-9 advice item). Only
        artifacts older than TMP_SWEEP_HORIZON_S go, so an in-flight
        writer's milliseconds-old temp file is never touched."""
        import shutil

        snap = self._replay()
        live = set(snap.paths)
        # every path that ever appeared in a committed add-action: such
        # a file, once no longer live, was retired by a COMMITTED remove
        # and is vacuumable at any age. A part file in NO log action may
        # be a concurrent writer's staged output (between _write_files'
        # os.replace into root and its _commit) — those only go once
        # they age past TMP_SWEEP_HORIZON_S (the r10 advice item).
        ever_referenced: set[str] = set(live)
        for v in _list_versions(self.root):
            try:
                with open(_log_path(self.root, v)) as f:
                    for line in f:
                        action = json.loads(line)
                        if "add" in action:
                            ever_referenced.add(action["add"]["path"])
            except OSError:
                pass
        removed = []
        cutoff = time.time() - TMP_SWEEP_HORIZON_S
        for name in sorted(os.listdir(self.root)):
            path = os.path.join(self.root, name)
            if (
                name.endswith(".parquet")
                and name.startswith("part-")
                and name not in live
            ):
                try:
                    if name not in ever_referenced and (
                        os.path.getmtime(path) >= cutoff
                    ):
                        continue  # possibly a live writer's staged file
                    os.remove(path)
                    removed.append(name)
                except OSError:
                    pass  # a live writer removed/renamed it mid-sweep
                continue
            stale_tmp = (
                (name.startswith("_log-") and name.endswith(".tmp"))
                or name.startswith("_staging-")
                or ".checkpoint.parquet.tmp-" in name
            )
            if stale_tmp:
                try:
                    if os.path.getmtime(path) >= cutoff:
                        continue
                    if os.path.isdir(path):
                        shutil.rmtree(path, ignore_errors=True)
                    else:
                        os.remove(path)
                    removed.append(name)
                except OSError:
                    pass  # a live writer finished with it mid-sweep
        logdir = os.path.join(self.root, LOG_DIR)
        for name in sorted(os.listdir(logdir)):
            if ".checkpoint.parquet.tmp-" not in name:
                continue
            path = os.path.join(logdir, name)
            try:
                if os.path.getmtime(path) < cutoff:
                    os.remove(path)
                    removed.append(os.path.join(LOG_DIR, name))
            except OSError:
                pass
        return removed
