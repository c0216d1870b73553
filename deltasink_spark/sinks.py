"""Sinks (SURVEY.md §2.1): batch parquet, streaming append, dead-letter
routing, and the exactly-once transactional sink.

DEMOTED (r11): the transactional surface below is the BESPOKE
JSON-lines-ledger emulation of Delta's txn protocol, kept as the
documented design study + crash-matrix test subject
(tests/test_streaming.py's mid-write-kill/stale-compaction suites
exercise it directly). Every production query op now writes the REAL
public `_delta_log` protocol instead — deltasink_spark/delta_log.py
(DeltaLogTable / DeltaLogSink), whose tables any Delta client opens.
New code should not adopt ExactlyOnceParquetSink.

Reference parity: transactional Delta output is the reference's entire
sink surface ("Stream DeltaLake tables from Kafka",
/root/reference/README.md:2); the snapshot ships no code, so the txn
protocol below re-derives the public Delta `txn {appId, version}`
idempotent-commit design on Structured Streaming's batch-id replay
guarantees.

Exactly-once design (the deltasink guarantee, re-expressed without the
delta-spark package): Structured Streaming already gives us replayed
micro-batches with stable `batch_id`s after recovery (WAL'd source
offsets in the checkpoint). The sink completes the two-phase protocol
exactly the way the Delta Lake `txn {appId, version}` action does:

  1. foreachBatch(df, batch_id)
  2. if (app_id, batch_id) present in the ledger -> SKIP (replay)
  3. write batch files under a batch-scoped directory (idempotent
     overwrite of that directory only)
  4. fsync-append (app_id, batch_id, n_rows) to the ledger — the
     commit point; readers only trust ledgered batch dirs

A crash between 3 and 4 leaves an unledgered directory that the replay
overwrites — no duplicates, no loss. When delta-spark is on the
classpath, `delta_sink` uses the real `format("delta")` txn path
instead; the interface is identical.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_parquet_batch(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def split_dead_letter(df: DataFrame, ok_col: str) -> tuple[DataFrame, DataFrame]:
    """Route unparseable records to a quarantine frame (ok rows, bad rows)."""
    return df.filter(F.col(ok_col)), df.filter(~F.col(ok_col))


def _has_delta() -> bool:
    try:  # pragma: no cover - delta-spark not installed in this image
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class ConcurrentCompactionError(RuntimeError):
    """A concurrent compaction replaced part of this one's snapshot
    between planning and commit; the caller should retry."""


class ExactlyOnceParquetSink:
    """Idempotent, ledgered parquet sink for foreachBatch (see module
    docstring for the protocol)."""

    def __init__(self, base_dir: str, app_id: str):
        self.base_dir = base_dir
        self.app_id = app_id
        # Data dirs are namespaced per app so CONCURRENT writers add
        # disjoint files (the real Delta profile: writers never touch
        # each other's data; only the log append is serialized).
        self.data_dir = os.path.join(base_dir, "data", f"app_id={app_id}")
        self.ledger_path = os.path.join(base_dir, "_txn_ledger.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    def _ledger_records(self) -> list[dict]:
        """This app's committed ledger records, in commit order."""
        if not os.path.exists(self.ledger_path):
            return []
        out: list[dict] = []
        with open(self.ledger_path, "rb") as fh:
            lines = fh.read().split(b"\n")
        for i, line in enumerate(lines):
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    # A torn trailing line (crash mid-append, before the
                    # fsync commit point) is by definition uncommitted
                    # under the ledger protocol — the batch replays.
                    continue
                # Mid-file corruption is NOT the torn-tail crash case:
                # committed history is damaged, so fail loudly rather
                # than silently dropping committed batches.
                raise ValueError(
                    f"ledger corrupted mid-file at line {i + 1}: {line[:80]!r}"
                )
            if rec["app_id"] == self.app_id:
                out.append(rec)
        return out

    def committed_batches(self) -> set[int]:
        """Every batch id EVER ledgered, including batches later
        superseded by a compaction. This is deliberately the replay-
        idempotence key: a micro-batch replayed after its data was
        compacted away must still be skipped, or its rows would be
        resurrected next to the compacted copy (the reason Delta keys
        txn idempotence on the appId version watermark, not on live
        file membership)."""
        return {r["batch_id"] for r in self._ledger_records() if "batch_id" in r}

    def _visible_entries(self, as_of_version: int | None = None) -> list[tuple[str, int]]:
        """Fold the ledger into the set of LIVE data directories:
        batch records add themselves; a compaction record removes the
        entries it replaces and adds its own directory (add-and-remove
        in one commit — Delta's OPTIMIZE action). ``as_of_version``
        replays only the first N+1 records: time travel is a ledger
        prefix, exactly Delta's version-as-of read."""
        vis: list[tuple[str, int]] = []
        for i, rec in enumerate(self._ledger_records()):
            if as_of_version is not None and i > as_of_version:
                break
            if "batch_id" in rec:
                entry = ("b", rec["batch_id"])
                if entry not in vis:
                    vis.append(entry)
            else:
                replaced = {tuple(e) for e in rec["replaces"]}
                vis = [e for e in vis if e not in replaced]
                vis.append(("c", rec["compact_id"]))
        return vis

    def _entry_dir(self, entry: tuple[str, int]) -> str:
        kind, n = entry
        prefix = "batch_id" if kind == "b" else "compact_id"
        return os.path.join(self.data_dir, f"{prefix}={n}")

    def _truncate_torn_tail(self) -> None:
        """Drop a torn trailing line before appending. The torn line is
        uncommitted by protocol, so truncation loses nothing — but leaving
        it would make the next append concatenate onto it, rendering BOTH
        records unparseable and the replayed batch's data permanently
        invisible to read_committed (silent exactly-once violation)."""
        if not os.path.exists(self.ledger_path):
            return
        with open(self.ledger_path, "rb+") as fh:
            data = fh.read()
            if not data or data.endswith(b"\n"):
                return
            fh.truncate(data.rfind(b"\n") + 1)
            fh.flush()
            os.fsync(fh.fileno())

    @contextlib.contextmanager
    def _commit_lock(self):
        """Serialize the ledger commit point across CONCURRENT WRITERS
        (several apps appending to one table — Delta's multi-writer
        case, which the real format serializes with put-if-absent
        versioned log files; on a local fs an exclusive flock on a
        sidecar is the equivalent). Without it, two appends can
        interleave around a torn tail: writer B's committed line
        concatenates onto the crash residue, B's record becomes
        unparseable, and B's batch goes permanently invisible — a
        silent exactly-once violation. The lock covers torn-tail
        truncation + append only (the commit point), never the batch
        data write, so writers still write data files fully in
        parallel — exactly the real Delta concurrency profile."""
        lock_path = os.path.join(self.base_dir, "_txn_ledger.lock")
        fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        """Returns True if the batch was written, False if skipped as a
        replay of an already-committed batch."""
        if batch_id in self.committed_batches():
            return False
        batch_dir = os.path.join(self.data_dir, f"batch_id={batch_id}")
        # Stage into a UNIQUELY-NAMED directory and publish by rename
        # under the commit lock. Writing batch_dir directly would let a
        # same-(app_id, batch_id) racer's mode("overwrite") DELETE the
        # winner's already-committed files after the winner's ledger
        # append (Delta avoids the same hazard with uniquely-named data
        # files). A crash leaves an unreferenced tmp dir — invisible
        # garbage, same recovery class as a torn ledger line.
        import shutil
        import uuid as _uuid

        tmp_dir = os.path.join(self.data_dir, f"tmp_batch_{_uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp_dir)
        # Count the files actually written, not the input plan: re-running
        # df.count() would execute the micro-batch a second time, and a
        # nondeterministic upstream could make the ledgered n_rows
        # disagree with the committed rows.
        n = df.sparkSession.read.parquet(tmp_dir).count()
        with self._commit_lock():
            # Re-check under the lock: a concurrent writer sharing this
            # app_id (misconfigured, but Delta's txn action tolerates
            # the replay the same way) may have committed while the
            # data files were being written.
            if batch_id in self.committed_batches():
                shutil.rmtree(tmp_dir, ignore_errors=True)
                return False
            if os.path.isdir(batch_dir):
                # torn remnant of an earlier uncommitted attempt —
                # uncommitted by protocol, safe to clear for the rename
                shutil.rmtree(batch_dir)
            os.rename(tmp_dir, batch_dir)
            self._truncate_torn_tail()
            with open(self.ledger_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {"app_id": self.app_id, "batch_id": batch_id, "n_rows": n}
                    )
                    + "\n"
                )
                fh.flush()
                os.fsync(fh.fileno())
        return True

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        def fn(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return fn

    def read_committed(
        self,
        spark,
        merge_schema: bool = False,
        as_of_version: int | None = None,
    ) -> DataFrame:
        """Read back only ledger-committed, non-superseded data
        directories.

        ``merge_schema=True`` mirrors Delta's ``mergeSchema`` write
        option: batches committed with additional columns union into
        one widened schema (missing columns read as null) — the
        schema-evolution half of the sink contract. Off by default
        because schema merging reads every file's footer at planning
        time; homogeneous tables skip that cost.

        ``as_of_version=N`` is time travel: the table state after the
        N-th ledger commit (0-based), i.e. Delta's
        ``option("versionAsOf", N)`` — a pure metadata operation, no
        data is copied to keep old versions readable."""
        entries = self._visible_entries(as_of_version)
        if not entries:
            raise ValueError("no committed batches")
        paths = [self._entry_dir(e) for e in entries]
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def read_changes(
        self, spark, from_version: int, to_version: int
    ) -> DataFrame:
        """Change-data-feed read: every row the table gained between
        two ledger versions, stamped with Delta CDF's metadata columns
        (`_change_type`, `_commit_version`) — the "what changed since
        v3" query a downstream incremental sync runs instead of
        re-diffing snapshots.

        Versions are 0-based ledger indices, ``from_version``
        EXCLUSIVE / ``to_version`` inclusive (Delta's
        startingVersion/endingVersion read both ends; the exclusive
        start here matches the "changes since the version I already
        consumed" checkpoint idiom). Per commit:

          - a batch record's directory is the commit's insert set
            (`_change_type = 'insert'`) — the append-only fast path;
          - a compaction record rewrites bytes without changing any
            logical row, so it emits NOTHING — exactly Delta CDF's
            documented behavior for OPTIMIZE commits.

        The read is a pure ledger fold plus a parquet scan of only the
        added directories — no snapshot diff, no join; cost scales
        with the size of the CHANGES, not the table, which is the
        whole point of a change feed. Replay-idempotent by
        construction: the ledger prefix for a version range never
        changes after commit, so re-reading the same range yields the
        same rows (tests/test_streaming.py). A valid range containing
        no data-changing commits (e.g. only an OPTIMIZE) returns an
        EMPTY frame in the table's current schema — Delta CDF's
        contract; a polling sync daemon must be able to ask "anything
        since my checkpoint?" without pre-inspecting the ledger."""
        records = self._ledger_records()
        n = len(records)
        if from_version > to_version:
            raise ValueError(
                f"reversed version range ({from_version}, {to_version}]: "
                "from_version must be <= to_version"
            )
        if not (-1 <= from_version < n and 0 <= to_version < n):
            raise ValueError(
                f"version range ({from_version}, {to_version}] outside ledger 0..{n - 1}"
            )
        parts = []
        for v in range(from_version + 1, to_version + 1):
            rec = records[v]
            if "batch_id" not in rec:
                continue  # compaction: byte movement, no logical change
            d = self._entry_dir(("b", rec["batch_id"]))
            parts.append(
                spark.read.parquet(d)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(v).cast("long"))
            )
        if not parts:
            return (
                self.read_committed(spark)
                .limit(0)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(0).cast("long"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def compact(self, spark, target_files: int = 4) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the currently
        visible data as ``target_files`` right-sized files, then commit
        ONE ledger record that atomically removes the replaced entries
        and adds the compacted directory (Delta's OPTIMIZE =
        add-files + remove-files in a single log action; readers see
        either the old layout or the new one, never both). A crash
        before the ledger append leaves an unreferenced tmp_compact_*
        staging directory — invisible garbage, same recovery class as
        a torn ledger line.

        Streaming appends racing the compaction are safe: the replaced
        set is snapshotted first, so a batch committed in between is
        simply not replaced and stays visible. The rewrite itself is a
        distributed repartition — the driver only moves metadata.

        CONCURRENT compactions are resolved optimistically at the
        commit point (the write_batch discipline applied here too):
        the rewrite lands in a uniquely-named staging dir, and the
        compact_id is chosen — and the dir renamed to its final name —
        only under the commit lock against the CURRENT ledger, so two
        racers can never touch the same directory. If any snapshotted
        entry was already replaced by someone else the commit ABORTS
        (deleting its staging dir) and raises
        ConcurrentCompactionError — committing anyway would ledger the
        same source rows twice. Returns the compaction id."""
        import shutil
        import uuid as _uuid

        replaced = self._visible_entries()
        if not replaced:
            raise ValueError("nothing to compact")
        # Rewrite into a UNIQUELY-NAMED staging dir; the compact_id is
        # only chosen — and the dir only renamed to its final name —
        # UNDER the commit lock. Pre-computing the cid would make two
        # concurrent compactors write (and mode-overwrite-delete!) the
        # same shared directory before either commits.
        df = spark.read.parquet(*[self._entry_dir(e) for e in replaced])
        tmp_dir = os.path.join(self.data_dir, f"tmp_compact_{_uuid.uuid4().hex}")
        df.repartition(target_files).write.mode("overwrite").parquet(tmp_dir)
        n = spark.read.parquet(tmp_dir).count()
        with self._commit_lock():
            self._truncate_torn_tail()
            # commit-time re-validation against the CURRENT ledger
            records = self._ledger_records()
            visible_now = set(self._visible_entries())
            if not set(replaced) <= visible_now:
                shutil.rmtree(tmp_dir, ignore_errors=True)
                raise ConcurrentCompactionError(
                    "another compaction replaced part of this snapshot; retry"
                )
            taken = {r["compact_id"] for r in records if "compact_id" in r}
            cid = max(taken) + 1 if taken else 0
            out_dir = os.path.join(self.data_dir, f"compact_id={cid}")
            os.rename(tmp_dir, out_dir)
            with open(self.ledger_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "app_id": self.app_id,
                            "compact_id": cid,
                            "n_rows": n,
                            "replaces": [list(e) for e in replaced],
                        }
                    )
                    + "\n"
                )
                fh.flush()
                os.fsync(fh.fileno())
        return cid

    def vacuum(self, retain_versions: int = 0) -> int:
        """VACUUM: physically delete data directories that compaction
        superseded, keeping every directory referenced by the last
        ``retain_versions + 1`` ledger versions (retention = how far
        back time travel keeps working — Delta's VACUUM retention
        window expressed in versions instead of hours). Deletion is
        DELIBERATELY conservative: only directories that provably
        appear in some compaction's ``replaces`` list and are outside
        the retained window are removed — an unrecognized directory is
        never touched, so an in-flight writer's not-yet-ledgered batch
        (which a wall-clock retention window protects in Delta) cannot
        be deleted. The ledger itself is not rewritten: vacuum frees
        storage, it does not change any version's logical content —
        time travel PAST the retained window now raises on the missing
        files, which is exactly Delta's documented behavior. Returns
        the number of directories removed."""
        import shutil

        records = self._ledger_records()
        n = len(records)
        keep: set[tuple[str, int]] = set()
        newest = max(n - 1 - retain_versions, 0)
        for v in range(newest, n):
            keep.update(self._visible_entries(as_of_version=v))
        ever_replaced: set[tuple[str, int]] = set()
        for rec in records:
            if "replaces" in rec:
                ever_replaced.update(tuple(e) for e in rec["replaces"])
        removed = 0
        with self._commit_lock():
            for entry in sorted(ever_replaced - keep):
                d = self._entry_dir(entry)
                if os.path.isdir(d):
                    shutil.rmtree(d)
                    removed += 1
        return removed


def delta_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str,
    available_now: bool = False,
):
    """Streaming append sink with exactly-once txn semantics. Uses the
    real Delta sink when delta-spark is importable; otherwise the
    ledgered parquet emulation (same guarantee, documented protocol).
    `available_now=True` drains a bounded source and terminates (backfill
    cadence); the default is a continuous micro-batch query."""
    if _has_delta():  # pragma: no cover
        w = (
            df.writeStream.format("delta")
            .option("checkpointLocation", checkpoint)
            .option("txnAppId", app_id)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start(path)
    sink = ExactlyOnceParquetSink(path, app_id)
    w = (
        df.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
