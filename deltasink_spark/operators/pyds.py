"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The extension point a connector author uses when no JVM DataSource V2
exists for their system: a pure-Python source that still gets real
engine integration — one InputPartition per parquet row group (so the
scan parallelizes across executors like a native file scan), Arrow
RecordBatch output (columnar transfer, no per-row Python), and filter
pushdown via ``DataSourceReader.pushFilters`` (accepted filters are
applied inside the source with pyarrow.compute; everything else is
returned to Spark to evaluate).

This file demonstrates the full surface against the fixture parquet
(the backing store stands in for any external system with range-served
reads: a REST cursor API, a scan-ranged KV store, a feature service).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThanOrEqual,
    InputPartition,
)


class _RowGroup(InputPartition):
    def __init__(self, path: str, index: int) -> None:
        self.path = path
        self.index = index


class _FixtureDocsReader(DataSourceReader):
    _COLS = ["doc_id", "lang", "n_chars"]

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.min_doc_id: int | None = None

    def pushFilters(self, filters):
        """Accept `doc_id >= N`; everything else goes back to Spark.
        Accepted filters MUST be enforced in read() — Spark will not
        re-check them."""
        unsupported = []
        for f in filters:
            if (
                isinstance(f, GreaterThanOrEqual)
                and tuple(f.attribute) == ("doc_id",)
                and isinstance(f.value, int)
            ):
                # several pushed bounds must INTERSECT (keep the
                # strictest) — accepting both while enforcing only the
                # last would silently widen the result, and Spark does
                # not re-check accepted filters.
                self.min_doc_id = (
                    f.value
                    if self.min_doc_id is None
                    else max(self.min_doc_id, f.value)
                )
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroup(self.path, i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(
            partition.index, columns=self._COLS
        )
        if self.min_doc_id is not None:
            table = table.filter(pc.greater_equal(table["doc_id"], self.min_doc_id))
        yield from table.to_batches()


class FixtureDocsDataSource(DataSource):
    """``spark.read.format("fixture_docs").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "fixture_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema):
        return _FixtureDocsReader(self.options)


# --- streaming variant ----------------------------------------------------

import json as _json  # noqa: E402
import os as _os  # noqa: E402
import uuid as _uuid  # noqa: E402

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402

_CHUNK = 250  # rows admitted per micro-batch (rate limiting)
_SPLITS = 4  # partitions per micro-batch (executor parallelism)


class _RowRange(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _row_group_slices(path: str, start: int, end: int, columns=None):
    """Yield (absolute_base_row, pyarrow.Table slice) pairs covering the
    row range [start, end) — mapping the range onto row groups via
    footer metadata and reading ONLY the overlapping groups. Shared by
    every streaming reader here: reading the whole file per partition
    would cost _SPLITS full-table scans per micro-batch (the
    amplification the batch reader's read_row_group shape avoids)."""
    import pyarrow.parquet as pq

    if end <= start:
        return
    pf = pq.ParquetFile(path)
    first = 0
    for rg in range(pf.num_row_groups):
        n = pf.metadata.row_group(rg).num_rows
        lo, hi = first, first + n
        first = hi
        if hi <= start or lo >= end:
            continue
        t = pf.read_row_group(rg, columns=columns)
        s = max(start - lo, 0)
        e = min(end, hi) - lo
        yield lo + s, t.slice(s, e - s)


class _FixtureDocsStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming read over a fixture file standing in
    for any offset-addressable system (a Kafka topic, a cursorable
    API). Offsets are row positions; each micro-batch admits at most
    _CHUNK rows (latestOffset is where rate limiting lives) and is
    split into _SPLITS row-range partitions read executor-side as
    Arrow batches. commit() is the ack hook a real connector uses to
    trim its upstream cursor — here it also persists the acked
    frontier to a sidecar under ``ack_dir`` so that a POST-RESTART
    fresh instance (``_admitted`` would otherwise be 0) can never
    return a ``latestOffset`` below what the engine already committed.
    That matters because MicroBatchExecution logs whatever
    latestOffset returns as the next batch end and starts the batch
    AFTER it from that logged end — a regressed offset would make the
    engine re-plan already-delivered ranges. Without ``ack_dir``,
    rate-limited restart exactly-once is NOT guaranteed (same as a
    Kafka consumer with no committed group offsets); pass a per-query
    directory alongside the checkpoint."""

    _COLS = ["doc_id", "n_chars"]

    def __init__(self, options) -> None:
        self.path = options["path"]
        self._total: int | None = None
        self._ack_file: str | None = None
        ack_dir = options.get("ack_dir")
        if ack_dir:
            _os.makedirs(ack_dir, exist_ok=True)
            self._ack_file = _os.path.join(ack_dir, "acked-offset.json")
        self._admitted = self._load_acked()

    def _load_acked(self) -> int:
        if self._ack_file is not None and _os.path.exists(self._ack_file):
            with open(self._ack_file) as fh:
                return int(_json.load(fh)["pos"])
        return 0

    def _rows(self) -> int:
        if self._total is None:
            self._total = _parquet_row_count(self.path)
        return self._total

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # Rate limiting lives HERE (the planned range [start, end) must
        # then be served completely — clamping in partitions() would
        # silently drop rows the offset log marks consumed). A real
        # connector polls the upstream head; this one walks toward the
        # file's row count _CHUNK rows per micro-batch.
        self._admitted = min(self._rows(), self._admitted + _CHUNK)
        return {"pos": self._admitted}

    def partitions(self, start: dict, end: dict):
        # Defense-in-depth: the sidecar in commit()/_load_acked() is
        # what actually prevents a fresh post-restart instance from
        # regressing latestOffset below the committed frontier (the
        # engine logs latestOffset's return as the batch end and
        # starts the NEXT batch from that logged end, so a regressed
        # return re-plans delivered ranges). This fast-forward only
        # covers the no-ack_dir case, where the best it can do is turn
        # a stale planned range into one empty batch.
        self._admitted = max(self._admitted, start["pos"], end["pos"])
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_RowRange(self.path, lo, lo)]
        step = max(1, (hi - lo + _SPLITS - 1) // _SPLITS)
        return [
            _RowRange(self.path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition):
        for _base, piece in _row_group_slices(
            partition.path, partition.start, partition.end, columns=self._COLS
        ):
            yield from piece.to_batches()

    def commit(self, end: dict) -> None:
        # Upstream ack: persist the committed frontier (monotonic, via
        # tmp-write + atomic rename) so a restart constructs the next
        # reader at the acked position instead of 0. A real connector
        # would commit its consumer-group / cursor position here.
        if self._ack_file is None:
            return
        pos = max(int(end["pos"]), self._load_acked())
        tmp = f"{self._ack_file}.{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            fh.write(_json.dumps({"pos": pos}))
        _os.replace(tmp, self._ack_file)


class FixtureDocsStreamDataSource(DataSource):
    """``spark.readStream.format("fixture_docs_stream")``"""

    @classmethod
    def name(cls) -> str:
        return "fixture_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, n_chars bigint"

    def streamReader(self, schema):
        return _FixtureDocsStreamReader(self.options)


# --- writer variant -------------------------------------------------------

import fcntl as _fcntl  # noqa: E402
from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class _ManifestJsonWriter(DataSourceWriter):
    """Two-phase commit writer: each task streams its rows to a
    UNIQUELY-NAMED json-lines part file (never visible to readers on
    its own) and returns a WriterCommitMessage naming it; the driver's
    commit() makes ALL parts visible in one atomic rename of a
    manifest listing them — the same visibility protocol as this
    repo's ledgered-parquet sink (sinks.py) and Delta's _delta_log: a
    crashed/duplicated task's orphan part is simply never referenced,
    and abort() removes the debris. Readers resolve the manifest, so
    a write is all-or-nothing."""

    def __init__(self, options, overwrite: bool = False) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        _os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        full = _os.path.join(self.path, name)
        n = 0
        with open(full, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(path=name, rows=n)

    def commit(self, messages) -> None:
        parts = [m for m in messages if m is not None]
        job_parts = sorted(p.path for p in parts)
        job_rows = sum(p.rows for p in parts)
        manifest_path = _os.path.join(self.path, "_MANIFEST.json")
        # The append-mode merge is a read-modify-write of the committed
        # manifest; two concurrent append jobs to the same path would
        # otherwise both read the prior manifest and the last rename
        # would win, silently orphaning the other job's parts. An
        # exclusive flock on a sidecar serializes ONLY this commit
        # point (part-file writes still run fully in parallel) — the
        # same multi-writer protocol as the ledgered sink's
        # _commit_lock (sinks.py).
        lock_fd = _os.open(
            _os.path.join(self.path, "_manifest.lock"),
            _os.O_CREAT | _os.O_WRONLY,
            0o644,
        )
        try:
            _fcntl.flock(lock_fd, _fcntl.LOCK_EX)
            new_parts, new_rows = job_parts, job_rows
            # append mode UNIONS with the committed manifest — replacing
            # it with only this job's parts would silently turn append
            # into overwrite, orphaning every previously committed row.
            if not self.overwrite and _os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prior = _json.load(fh)
                new_parts = sorted(set(prior["parts"]) | set(new_parts))
                new_rows += prior["rows"]
            manifest = {"parts": new_parts, "rows": new_rows}
            tmp = _os.path.join(self.path, f"_manifest.{_uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as fh:
                fh.write(_json.dumps(manifest))
            _os.replace(tmp, manifest_path)
        finally:
            _fcntl.flock(lock_fd, _fcntl.LOCK_UN)
            _os.close(lock_fd)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self.path, m.path))
                except OSError:
                    pass


class ManifestJsonDataSource(DataSource):
    """``df.write.format("manifest_json").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "manifest_json"

    def schema(self) -> str:  # writer-only; schema comes from the frame
        return "doc_id bigint, lang string, n_chars bigint"

    def writer(self, schema, overwrite: bool):
        return _ManifestJsonWriter(self.options, overwrite=overwrite)


def read_manifest_json(spark, path: str, schema: str):
    """Read back ONLY the parts the committed manifest references
    (orphan parts from failed/speculative tasks are invisible)."""
    with open(_os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    files = [_os.path.join(path, p) for p in manifest["parts"]]
    return spark.read.schema(schema).json(files)


# --- Kafka-emulated stream source ----------------------------------------

_KAFKA_TOPIC = "events"
_KAFKA_NPART = 4  # emulated topic partition count (partition = event_id % 4)
_KAFKA_OVERLAP = 50  # rows re-delivered per slice (at-least-once injection)

# Transactional-producer emulation: rows belong to producer transactions
# of _KAFKA_TXN_BLOCK consecutive event_ids; a transaction is ABORTED
# iff its txn id % _KAFKA_TXN_ABORT_MOD == _KAFKA_TXN_ABORT_RESIDUE
# (deterministic, SQL-mirrorable). A read_committed consumer must never
# see aborted-transaction records — the broker-side filtering Kafka
# performs via the aborted-transaction index in fetch responses.
_KAFKA_TXN_BLOCK = 100
_KAFKA_TXN_ABORT_MOD = 7
_KAFKA_TXN_ABORT_RESIDUE = 3


def _kafka_txn_aborted(event_id: int) -> bool:
    return (event_id // _KAFKA_TXN_BLOCK) % _KAFKA_TXN_ABORT_MOD == (
        _KAFKA_TXN_ABORT_RESIDUE
    )


class _FixtureKafkaStreamReader(DataSourceStreamReader):
    """The events fixture served in Kafka WIRE SHAPE (key/value bytes,
    topic, partition, offset, epoch-millis timestamp) through the
    Python streaming DataSource — the broker stand-in that closes the
    reference README's "stream DeltaLake tables from Kafka" loop
    end-to-end in a broker-less environment (sources.py::kafka_source
    is the production entry; everything downstream of the record frame
    is identical code).

    Delivery is deliberately AT-LEAST-ONCE: every partition slice
    after the first re-delivers the previous _KAFKA_OVERLAP rows —
    the duplicate pattern a real consumer sees after a fetch retry or
    group rebalance — so the downstream dropDuplicatesWithinWatermark
    stage is load-bearing, not decorative. latestOffset admits the
    whole file in one range (availableNow on a Python DataSource
    snapshots ONE latestOffset prefetch as the drain target, so rate
    limiting here would strand rows; the chunked-admission variant is
    _FixtureDocsStreamReader). The wire timestamp is epoch millis
    (Kafka's actual record-timestamp encoding); stage 2 converts via
    timestamp_millis()."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self._total: int | None = None
        # isolation_level mirrors the Kafka consumer config: ABSENT =
        # the legacy non-transactional topic (every row delivered,
        # kafka_emulated_e2e's shape); "read_committed" = broker-side
        # filtering of aborted-transaction records (offsets still
        # advance over them — aborted records occupy offsets in a real
        # log, so consumers see offset GAPS, reproduced here);
        # "read_uncommitted" = transactional topic, no filtering.
        iso = options.get("isolation_level")
        if iso not in (None, "read_committed", "read_uncommitted"):
            raise ValueError(
                f"unknown isolation_level {iso!r}: expected "
                "read_committed or read_uncommitted"
            )
        self.isolation_level = iso

    def _rows(self) -> int:
        if self._total is None:
            self._total = _parquet_row_count(self.path)
        return self._total

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": self._rows()}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_RowRange(self.path, lo, lo)]
        step = max(1, (hi - lo + _SPLITS - 1) // _SPLITS)
        out = []
        for s in range(lo, hi, step):
            # slices after the first rewind by _KAFKA_OVERLAP rows:
            # duplicates land WITHIN the admitted batch, so exactness
            # of the downstream dedup never depends on watermark
            # eviction timing
            out.append(_RowRange(self.path, max(lo, s - _KAFKA_OVERLAP) if s > lo else s, min(s + step, hi)))
        return out

    def read(self, partition):
        import pyarrow as pa

        for base, t in _row_group_slices(
            partition.path, partition.start, partition.end
        ):
            ts = t.column("ts")
            if not str(ts.type).endswith("[us]"):
                ts = ts.cast(pa.timestamp("us"))
            ts_us = ts.cast(pa.int64()).to_pylist()
            eids = t.column("event_id").to_pylist()
            uids = t.column("user_id").to_pylist()
            etypes = t.column("event_type").to_pylist()
            vals = t.column("value").to_pylist()
            props = t.column("props").to_pylist()
            offsets = list(range(base, base + len(eids)))
            if self.isolation_level == "read_committed":
                # broker-side aborted-transaction filtering: offsets
                # computed FIRST so survivors keep their log positions
                # (consumers see offset gaps where aborted data sat)
                keep = [not _kafka_txn_aborted(e) for e in eids]
                eids = [x for x, k in zip(eids, keep) if k]
                ts_us = [x for x, k in zip(ts_us, keep) if k]
                uids = [x for x, k in zip(uids, keep) if k]
                etypes = [x for x, k in zip(etypes, keep) if k]
                vals = [x for x, k in zip(vals, keep) if k]
                props = [x for x, k in zip(props, keep) if k]
                offsets = [x for x, k in zip(offsets, keep) if k]
            values = [
                _json.dumps(
                    {
                        "event_id": e,
                        "ts_us": tu,
                        "user_id": u,
                        "event_type": et,
                        "value": v,
                        "props": p,
                    },
                    separators=(",", ":"),
                ).encode()
                for e, tu, u, et, v, p in zip(eids, ts_us, uids, etypes, vals, props)
            ]
            yield pa.record_batch(
                [
                    pa.array([str(e).encode() for e in eids], pa.binary()),
                    pa.array(values, pa.binary()),
                    pa.array([_KAFKA_TOPIC] * len(eids), pa.string()),
                    pa.array([e % _KAFKA_NPART for e in eids], pa.int32()),
                    pa.array(offsets, pa.int64()),
                    pa.array([tu // 1000 for tu in ts_us], pa.int64()),
                    pa.array([0] * len(eids), pa.int32()),
                ],
                names=[
                    "key",
                    "value",
                    "topic",
                    "partition",
                    "offset",
                    "timestamp",
                    "timestampType",
                ],
            )


class FixtureKafkaStreamDataSource(DataSource):
    """``spark.readStream.format("fixture_kafka_stream")``"""

    @classmethod
    def name(cls) -> str:
        return "fixture_kafka_stream"

    def schema(self) -> str:
        return (
            "key binary, value binary, topic string, partition int, "
            "offset bigint, timestamp bigint, timestampType int"
        )

    def streamReader(self, schema):
        return _FixtureKafkaStreamReader(self.options)
