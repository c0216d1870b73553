"""A real Delta Lake transaction log (`_delta_log`) writer/reader.

Reference parity: the reference's one-line purpose is "Stream DeltaLake
tables from Kafka" (/root/reference/README.md:2). The ledgered sink in
sinks.py implements the txn SEMANTICS (idempotent commits, snapshot
reads, OPTIMIZE/VACUUM/CDF) but with a bespoke JSON-lines ledger no
other Delta client can open. This module emits the PUBLIC Delta
protocol instead (delta-io PROTOCOL.md — JSON commit files of
protocol / metaData / add / remove / txn / cdc / commitInfo actions),
so a table written here is readable by delta-rs, delta-spark, or any
independent log fold — proven by the DuckDB hand-parsed-log oracles in
queries/delta_log_ops.py (the duckdb `delta` extension is not loadable
offline in this container, so the oracle parses the log with read_json
and folds add/remove in SQL — an independent implementation of the
reader contract, not self-agreement).

Layout (exactly the public format):

    table/
      _delta_log/00000000000000000000.json   # newline-delimited actions
      _delta_log/00000000000000000001.json
      _change_data/cdc-<uuid>.parquet        # CDF rows (delete commits)
      part-<uuid>.parquet                    # data files, table root

Commit protocol: the next version file is created with O_CREAT|O_EXCL
under an exclusive flock on a sidecar — put-if-absent, the exact
atomicity contract Delta's LogStore requires of the filesystem (HDFS
atomic rename / S3 DynamoDB mutex); two writers can never both create
version N. Data files are written FIRST under uuid names (never
overwritten, never shared between commits) and published by the log
append — a crash before the append leaves unreferenced garbage that no
reader sees, the same recovery class as sinks.py's torn ledger line.

Exactly-once streaming: `txn {appId, version}` actions, the real Delta
idempotence design — foreachBatch skips a batch when its batch_id is
<= the appId's ledgered version high-water mark. Replay after recovery
is a no-op; see DeltaLogSink.

Scale: the log is METADATA — commits append O(files-touched) JSON
actions, never data-proportional work; snapshot construction folds the
action list (real Delta adds parquet checkpoints every 10 commits to
bound replay — out of scope here where logs are short, noted for the
100-TB deployment). Data-path operations (append, OPTIMIZE rewrite,
delete_where rewrite) are distributed Spark jobs; the driver only
moves/renames file metadata. delete_where rewrites ONLY the files that
contain matching rows (found via one _metadata.file_path scan with the
predicate pushed down), the copy-on-write DML Delta itself performs.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 4}
_LOG_DIR = "_delta_log"
_CDC_DIR = "_change_data"


def _now_ms() -> int:
    return int(time.time() * 1000)


class DeltaLogTable:
    """One Delta table rooted at ``path`` (see module docstring)."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # --- log plumbing ----------------------------------------------------

    def _version_files(self) -> list[tuple[int, str]]:
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json") and len(f) == 25:
                out.append((int(f[:20]), os.path.join(self.log_dir, f)))
        return sorted(out)

    def latest_version(self) -> int:
        vf = self._version_files()
        return vf[-1][0] if vf else -1

    def _actions(self, as_of_version: int | None = None):
        """Yield (version, action_dict) in commit order. The log is the
        table: every read below is a fold over this stream."""
        for v, p in self._version_files():
            if as_of_version is not None and v > as_of_version:
                break
            with open(p) as fh:
                for line in fh:
                    if line.strip():
                        yield v, json.loads(line)

    @contextlib.contextmanager
    def _commit_lock(self):
        lock_path = os.path.join(self.log_dir, "_commit.lock")
        fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _commit(self, actions: list[dict], precondition=None) -> int | None:
        """Atomically publish ``actions`` as the next version. The
        version file is created O_CREAT|O_EXCL — put-if-absent, so a
        racer targeting the same version number fails loudly instead
        of silently clobbering (Delta's core log-store requirement).
        ``precondition`` (if given) re-validates against the CURRENT
        log under the lock — returning False aborts the commit (-> None),
        the optimistic-concurrency re-check a txn replay or concurrent
        OPTIMIZE needs. Returns the committed version."""
        with self._commit_lock():
            if precondition is not None and not precondition():
                return None
            v = self.latest_version() + 1
            p = os.path.join(self.log_dir, f"{v:020d}.json")
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            try:
                payload = "".join(json.dumps(a) + "\n" for a in actions)
                os.write(fd, payload.encode())
                os.fsync(fd)
            finally:
                os.close(fd)
            return v

    # --- snapshot state ---------------------------------------------------

    def snapshot_files(self, as_of_version: int | None = None) -> list[str]:
        """Live data file paths (relative) at a version: adds minus
        removes, in first-add order — the canonical Delta snapshot
        fold."""
        live: dict[str, bool] = {}
        for _, a in self._actions(as_of_version):
            if "add" in a:
                live[a["add"]["path"]] = True
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
        return list(live)

    def txn_versions(self) -> dict[str, int]:
        """appId -> highest committed txn version (the exactly-once
        high-water mark)."""
        hw: dict[str, int] = {}
        for _, a in self._actions():
            if "txn" in a:
                t = a["txn"]
                hw[t["appId"]] = max(hw.get(t["appId"], -1), t["version"])
        return hw

    def schema(self) -> StructType | None:
        s = None
        for _, a in self._actions():
            if "metaData" in a:
                s = StructType.fromJson(json.loads(a["metaData"]["schemaString"]))
        return s

    # --- data-file staging -------------------------------------------------

    def _stage_files(self, df: DataFrame, prefix: str = "part") -> list[dict]:
        """Write ``df``'s partitions as uniquely-named parquet files in
        the table root and return their add actions (path, size,
        modificationTime, stats). Files become VISIBLE only when a
        commit references them. Stats carry numRecords + per-column
        min/max/nullCount (Delta's file-skipping stats), computed from
        the written files with one Spark agg grouped by
        _metadata.file_path — reading back what was written, never
        re-running the input plan (a nondeterministic upstream must not
        desync stats from data)."""
        spark = df.sparkSession
        tmp = os.path.join(self.path, f"tmp_stage_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        written = [
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        ]
        atomic = [
            f.name for f in df.schema.fields
            if f.dataType.typeName()
            in {"long", "integer", "short", "byte", "double", "float", "string",
                "date", "timestamp", "boolean", "decimal"}
        ]
        stats_rows: dict[str, dict] = {}
        if written:
            aggs = [F.count(F.lit(1)).alias("numRecords")]
            for c in atomic:
                aggs += [
                    F.min(c).alias(f"min__{c}"),
                    F.max(c).alias(f"max__{c}"),
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null__{c}"),
                ]
            per_file = (
                spark.read.parquet(tmp)
                .groupBy(F.col("_metadata.file_path").alias("fp"))
                .agg(*aggs)
                .collect()
            )
            for r in per_file:
                d = r.asDict()
                stats_rows[os.path.basename(d["fp"])] = d
        adds = []
        for f in sorted(written):
            final = f"{prefix}-{uuid.uuid4().hex}.parquet"
            src = os.path.join(tmp, f)
            dst = os.path.join(self.path, final)
            st_size = os.path.getsize(src)
            os.rename(src, dst)
            srow = stats_rows.get(f)
            stats = None
            if srow is not None:
                def _j(v):
                    if v is None:
                        return None
                    if hasattr(v, "isoformat"):
                        return v.isoformat()
                    if isinstance(v, (int, float, bool, str)):
                        return v
                    return str(v)

                stats = json.dumps(
                    {
                        "numRecords": srow["numRecords"],
                        "minValues": {c: _j(srow[f"min__{c}"]) for c in atomic},
                        "maxValues": {c: _j(srow[f"max__{c}"]) for c in atomic},
                        "nullCount": {c: srow[f"null__{c}"] for c in atomic},
                    }
                )
            add = {
                "path": final,
                "partitionValues": {},
                "size": st_size,
                "modificationTime": _now_ms(),
                "dataChange": True,
            }
            if stats is not None:
                add["stats"] = stats
            adds.append(add)
        shutil.rmtree(tmp, ignore_errors=True)
        return adds

    def _metadata_actions(self, df: DataFrame) -> list[dict]:
        return [
            {"protocol": dict(_PROTOCOL)},
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {"delta.enableChangeDataFeed": "true"},
                    "createdTime": _now_ms(),
                }
            },
        ]

    # --- public DML ---------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        app_id: str | None = None,
        txn_version: int | None = None,
    ) -> int | None:
        """Append ``df`` as one commit. With (app_id, txn_version) the
        commit is idempotent: a version at or below the appId's ledgered
        high-water mark is SKIPPED (returns None) — Delta's `txn` action
        exactly-once contract, the foreachBatch replay guard."""
        if app_id is not None and txn_version is not None:
            if txn_version <= self.txn_versions().get(app_id, -1):
                return None
        adds = self._stage_files(df)
        actions: list[dict] = []
        if self.latest_version() < 0:
            actions += self._metadata_actions(df)
        if app_id is not None and txn_version is not None:
            actions.append(
                {"txn": {"appId": app_id, "version": txn_version,
                         "lastUpdated": _now_ms()}}
            )
        actions += [{"add": a} for a in adds]
        actions.append(
            {
                "commitInfo": {
                    "timestamp": _now_ms(),
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append"},
                }
            }
        )
        precondition = None
        if app_id is not None and txn_version is not None:
            # Re-validate the txn high-water mark UNDER the commit lock:
            # a concurrent same-appId writer may have ledgered this
            # version while our data files were being staged (the
            # write_batch re-check discipline). Aborting leaves the
            # staged uuid files unreferenced — invisible garbage.
            def precondition():
                return txn_version > self.txn_versions().get(app_id, -1)

        return self._commit(actions, precondition)

    def optimize(self, spark, target_files: int = 2) -> int:
        """OPTIMIZE: rewrite the live snapshot as ``target_files``
        right-sized files, committed as add+remove with
        dataChange=false (bytes move, no logical row changes — CDF
        readers skip the commit entirely)."""
        live = self.snapshot_files()
        if not live:
            raise ValueError("nothing to optimize")
        df = spark.read.parquet(*[os.path.join(self.path, p) for p in live])
        adds = self._stage_files(df.repartition(target_files))
        actions = []
        for a in adds:
            a = dict(a)
            a["dataChange"] = False
            actions.append({"add": a})
        now = _now_ms()
        for p in live:
            actions.append(
                {"remove": {"path": p, "deletionTimestamp": now,
                            "dataChange": False}}
            )
        actions.append(
            {"commitInfo": {"timestamp": now, "operation": "OPTIMIZE"}}
        )
        return self._commit(actions)

    def delete_where(self, spark, predicate_sql: str) -> int:
        """Row-level DELETE (copy-on-write, the GDPR-erasure path):

        1. ONE scan with the predicate pushed down finds the files that
           contain matching rows (_metadata.file_path distinct) — cost
           scales with matches, and parquet stats prune files whose
           min/max exclude the predicate;
        2. only those files are rewritten without their matching rows
           (unaffected files are untouched metadata);
        3. one commit: remove(dataChange=true) for each affected file,
           add for each rewrite, plus a cdc action publishing the
           deleted rows under _change_data/ with
           _change_type='delete' — the Delta CDF contract for DML.

        Deleting zero rows commits nothing and returns the current
        version (Delta's DELETE no-op). Crash before the commit leaves
        unreferenced rewrite/CDC files — invisible, replay-safe."""
        live = self.snapshot_files()
        if not live:
            # DELETE over an empty snapshot is a no-op, not an error
            # (an empty-corpus table legitimately has zero live files).
            return self.latest_version()
        full = spark.read.parquet(*[os.path.join(self.path, p) for p in live])
        hit_files = [
            os.path.basename(r[0])
            for r in full.filter(F.expr(predicate_sql))
            .select(F.col("_metadata.file_path"))
            .distinct()
            .collect()
        ]
        if not hit_files:
            return self.latest_version()
        affected = spark.read.parquet(
            *[os.path.join(self.path, p) for p in hit_files]
        )
        kept = affected.filter(~F.coalesce(F.expr(predicate_sql), F.lit(False)))
        deleted = affected.filter(F.expr(predicate_sql))
        adds = self._stage_files(kept)
        # CDF rows: the deleted tuples, stamped with _change_type.
        cdc_dir = os.path.join(self.path, _CDC_DIR)
        os.makedirs(cdc_dir, exist_ok=True)
        tmp = os.path.join(self.path, f"tmp_cdc_{uuid.uuid4().hex}")
        deleted.withColumn("_change_type", F.lit("delete")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        cdc_actions = []
        for f in sorted(os.listdir(tmp)):
            if f.startswith("part-") and f.endswith(".parquet"):
                rel = f"{_CDC_DIR}/cdc-{uuid.uuid4().hex}.parquet"
                src = os.path.join(tmp, f)
                size = os.path.getsize(src)
                os.rename(src, os.path.join(self.path, rel))
                cdc_actions.append(
                    {"cdc": {"path": rel, "partitionValues": {}, "size": size,
                             "dataChange": False}}
                )
        shutil.rmtree(tmp, ignore_errors=True)
        now = _now_ms()
        actions = [{"cdc": c["cdc"]} for c in cdc_actions]
        actions += [{"add": a} for a in adds]
        actions += [
            {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
            for p in hit_files
        ]
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now,
                    "operation": "DELETE",
                    "operationParameters": {"predicate": predicate_sql},
                }
            }
        )
        return self._commit(actions)

    def vacuum(self) -> int:
        """Physically delete data files no longer in the CURRENT
        snapshot (retention 0 — the aggressive end of Delta's VACUUM;
        time travel to pre-vacuum versions subsequently raises on the
        missing files, Delta's documented behavior). Never touches
        unrecognized files outside the removed set. Returns files
        deleted."""
        live = set(self.snapshot_files())
        ever_removed = {
            a["remove"]["path"] for _, a in self._actions() if "remove" in a
        }
        n = 0
        for p in sorted(ever_removed - live):
            fp = os.path.join(self.path, p)
            if os.path.exists(fp):
                os.remove(fp)
                n += 1
        return n

    # --- reads ---------------------------------------------------------------

    def read(self, spark, as_of_version: int | None = None) -> DataFrame:
        """Snapshot read (optionally versionAsOf): fold the log, scan
        only live files. An empty snapshot reads as the schemaString's
        empty frame — the log, not the file listing, is the source of
        truth."""
        files = self.snapshot_files(as_of_version)
        if not files:
            s = self.schema()
            if s is None:
                raise ValueError("empty table with no metaData action")
            return spark.createDataFrame([], s)
        return spark.read.parquet(*[os.path.join(self.path, p) for p in files])

    def read_changes(self, spark, from_version: int, to_version: int) -> DataFrame:
        """CDF read over (from_version, to_version]: per commit, cdc
        actions win when present (DML commits publish exact change
        rows); otherwise dataChange=true adds are synthesized as
        inserts — the reader-side fallback the Delta spec defines.
        dataChange=false commits (OPTIMIZE) emit nothing."""
        if from_version > to_version:
            raise ValueError(
                f"reversed version range ({from_version}, {to_version}]"
            )
        latest = self.latest_version()
        if not (-1 <= from_version <= latest and 0 <= to_version <= latest):
            raise ValueError(
                f"version range ({from_version}, {to_version}] outside log 0..{latest}"
            )
        by_version: dict[int, dict[str, list]] = {}
        for v, a in self._actions(to_version):
            if v <= from_version:
                continue
            slot = by_version.setdefault(v, {"cdc": [], "add": []})
            if "cdc" in a:
                slot["cdc"].append(a["cdc"]["path"])
            elif "add" in a and a["add"].get("dataChange"):
                slot["add"].append(a["add"]["path"])
        parts = []
        for v in sorted(by_version):
            slot = by_version[v]
            if slot["cdc"]:
                d = spark.read.parquet(
                    *[os.path.join(self.path, p) for p in slot["cdc"]]
                )
                parts.append(d.withColumn("_commit_version", F.lit(v).cast("long")))
            elif slot["add"]:
                d = spark.read.parquet(
                    *[os.path.join(self.path, p) for p in slot["add"]]
                )
                parts.append(
                    d.withColumn("_change_type", F.lit("insert"))
                    .withColumn("_commit_version", F.lit(v).cast("long"))
                )
        if not parts:
            base = self.read(spark).limit(0)
            return base.withColumn("_change_type", F.lit("insert")).withColumn(
                "_commit_version", F.lit(0).cast("long")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


class DeltaLogSink:
    """foreachBatch adapter: exactly-once streaming append into a
    DeltaLogTable via `txn {appId, version=batch_id}` actions (the
    replay guard sinks.py implements with its bespoke ledger, here in
    the public format)."""

    def __init__(self, path: str, app_id: str):
        self.table = DeltaLogTable(path)
        self.app_id = app_id

    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        return self.table.append(df, self.app_id, batch_id) is not None

    def foreach_batch(self):
        def fn(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return fn


# --- table-as-stream source -------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _AddFilePartition(InputPartition):
    def __init__(self, abs_path: str, version: int) -> None:
        self.abs_path = abs_path
        self.version = version


class DeltaTableStreamReader(DataSourceStreamReader):
    """Streaming read FROM a DeltaLogTable (table-as-source): offsets
    are COMMIT VERSIONS — `{"v": last_planned_version}` — checkpointed
    by the engine's offset log, so a restarted query resumes from the
    version it already consumed; each micro-batch serves the
    dataChange=true add files of the next version range, one
    InputPartition per file (the scan parallelizes per file, and cost
    is O(new commits), never a table rescan — the log IS the change
    index, the same read that makes delta-spark's streaming source
    incremental). OPTIMIZE commits (dataChange=false) are skipped
    entirely. A remove with dataChange=true (a DELETE) in the range
    RAISES unless ignore_deletes is set — exactly delta-spark's
    streaming-source contract (ignoreDeletes), because silently
    skipping a delete would desync every downstream replica."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.ignore_deletes = str(options.get("ignore_deletes", "")).lower() == "true"
        self.table = DeltaLogTable(self.path)

    def initialOffset(self) -> dict:
        return {"v": -1}

    def latestOffset(self) -> dict:
        return {"v": self.table.latest_version()}

    def _range_adds(self, lo: int, hi: int) -> list[tuple[int, str]]:
        out = []
        for v, a in self.table._actions(hi):
            if v <= lo:
                continue
            if "add" in a and a["add"].get("dataChange"):
                out.append((v, a["add"]["path"]))
            elif "remove" in a and a["remove"].get("dataChange") and not self.ignore_deletes:
                raise ValueError(
                    f"commit {v} deletes data; streaming a table with "
                    "row-level deletes requires ignore_deletes=true "
                    "(or a CDF read) — refusing to silently drop them"
                )
        return out

    def partitions(self, start: dict, end: dict):
        adds = self._range_adds(start["v"], end["v"])
        if not adds:
            return [_AddFilePartition("", -1)]
        return [
            _AddFilePartition(os.path.join(self.path, p), v) for v, p in adds
        ]

    def read(self, partition):
        if partition.version < 0:
            return
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.abs_path).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # the engine's offset log is the only cursor needed


class DeltaTableStreamDataSource(DataSource):
    """``spark.readStream.format("delta_log_table")`` — schema comes
    from the table's own metaData action (schemaString), so the source
    serves whatever the log declares."""

    @classmethod
    def name(cls) -> str:
        return "delta_log_table"

    def schema(self):
        s = DeltaLogTable(self.options["path"]).schema()
        if s is None:
            raise ValueError("table has no metaData action yet")
        return s

    def streamReader(self, schema):
        return DeltaTableStreamReader(self.options)
