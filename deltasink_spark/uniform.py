"""UniForm / icebergCompatV2 — Iceberg metadata generation for Delta
tables (delta-spark's Universal Format: the SAME parquet data files,
with an Iceberg `metadata/` tree written alongside `_delta_log` so an
Iceberg catalog/reader consumes the table without a copy).

Reference parity: delta.io UniForm (`delta.universalFormat.
enabledFormats=iceberg`, `delta.enableIcebergCompatV2=true`) and the
Apache Iceberg table spec v2 (metadata.json / manifest list /
manifest files as Avro object-container files with Iceberg's
field-id-annotated schemas).

What is generated per Delta commit on an enabled table:

- ``metadata/v<N>.metadata.json`` — format-version 2 table metadata:
  the Delta schema mapped to an Iceberg schema (field ids = the
  table's columnMapping ids when mapped, ordinals otherwise — exactly
  icebergCompatV2's rule), the snapshot list (one snapshot per Delta
  commit, sequence-number = Delta version), and the current snapshot
  pointer.
- ``metadata/snap-<id>-1-<uuid>.avro`` — the snapshot's MANIFEST LIST
  (Avro OCF, spec field ids 500-517).
- ``metadata/<uuid>-m0.avro`` — this commit's DELTA manifest: only
  the files the commit added, as ADDED entries. Prior manifests are
  carried forward in the manifest list (the spec's `existing`
  manifests); a manifest that lost files is rewritten with EXISTING
  survivors + DELETED tombstones (retained one snapshot) — so
  snapshots are `append`/`delete`/`overwrite` per the actual file
  delta and Iceberg incremental consumers see exact per-commit
  changes (``read_iceberg_changelog``).
- ``metadata/version-hint.text`` — the filesystem-catalog pointer.

Constraints enforced (icebergCompatV2's own): no deletion vectors in
the live set (Iceberg v2 would need delete files) — REFUSES loudly
rather than emit metadata Iceberg would misread; `validate_table`
runs the same checks at enable time so the property never lands on a
table the writer cannot represent. Hive partitioning maps to an
IDENTITY partition spec (field ids 1000+, typed per-file partition
values in the manifest entries). ID-LESS data files (history written
before mapping/UniForm) are covered by the spec's
`schema.name-mapping.default` table property; every mapped table's
new files carry real parquet field ids.

The Avro OCF writer/reader below implement the container format from
the Avro 1.11 spec directly (magic `Obj\\x01`, metadata map with
avro.schema/avro.codec, 16-byte sync, long-prefixed blocks) over the
zigzag primitives in operators/avro.py — hand-encoded against the
FIXED Iceberg schemas, no generic schema walker needed.

Scale: generation is O(live files) driver metadata per enabled
commit — the same order as the crc sidecar fold — and data files are
never copied or rewritten; that is UniForm's entire point at 100 TB.
"""

from __future__ import annotations

import json
import os
import uuid

from deltasink_spark.operators.avro import read_long, write_long

_MAGIC = b"Obj\x01"


def _w_str(s: str, out: bytearray) -> None:
    raw = s.encode("utf-8")
    write_long(len(raw), out)
    out += raw


def _w_bytes(b: bytes, out: bytearray) -> None:
    write_long(len(b), out)
    out += b


def avro_ocf_write(path: str, schema_json: str, records: list[bytes]) -> None:
    """Write one Avro object-container file: header (magic, metadata
    map carrying the writer schema + null codec, sync marker) and a
    single block of pre-encoded record bodies."""
    sync = os.urandom(16)
    out = bytearray(_MAGIC)
    write_long(2, out)  # metadata map: one count-prefixed block
    _w_str("avro.schema", out)
    _w_bytes(schema_json.encode("utf-8"), out)
    _w_str("avro.codec", out)
    _w_bytes(b"null", out)
    write_long(0, out)  # end of map
    out += sync
    if records:
        body = b"".join(records)
        write_long(len(records), out)
        write_long(len(body), out)
        out += body
        out += sync
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)


def avro_ocf_read(path: str) -> tuple[str, list[bytes], list[int]]:
    """Read an Avro OCF written with a KNOWN record layout: returns
    (schema json, concatenated block bodies, per-block record counts).
    Callers decode the bodies against the schema they expect —
    sufficient for the fixed Iceberg manifest schemas and for
    foreign-shape fixtures that use the same layout."""
    buf = open(path, "rb").read()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path} is not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # count-prefixed-with-size form
            _sz, pos = read_long(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = read_long(buf, pos)
            k = buf[pos : pos + kl].decode("utf-8")
            pos += kl
            vl, pos = read_long(buf, pos)
            meta[k] = buf[pos : pos + vl]
            pos += vl
    if meta.get("avro.codec", b"null") not in (b"null", b""):
        raise ValueError("only the null codec is supported")
    sync = buf[pos : pos + 16]
    pos += 16
    bodies: list[bytes] = []
    counts: list[int] = []
    while pos < len(buf):
        cnt, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        bodies.append(buf[pos : pos + size])
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt container")
        pos += 16
        counts.append(cnt)
    return meta.get("avro.schema", b"{}").decode("utf-8"), bodies, counts


# --- Iceberg schemas (table spec v2, field ids per the spec) -----------

_MANIFEST_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ],
    }
)

def _manifest_entry_schema(pfields: list[tuple[str, str, int]]) -> str:
    """The manifest_entry schema for a table whose partition spec has
    ``pfields`` = [(name, avro primitive, partition field id)] —
    identity transforms, each value an optional union (spec field ids
    1000+)."""
    import json as _j

    base = _j.loads(_MANIFEST_ENTRY_SCHEMA)
    r102 = base["fields"][4]["type"]["fields"][3]["type"]
    r102["fields"] = [
        {
            "name": n,
            "type": ["null", "int" if t == "date" else t],
            "default": None,
            "field-id": fid,
        }
        for n, t, fid in pfields
    ]
    return _j.dumps(base)


_MANIFEST_ENTRY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [],
                            },
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                    ],
                },
            },
        ],
    }
)


def _encode_manifest_list_entry(
    manifest_path: str,
    manifest_length: int,
    sequence_number: int,
    snapshot_id: int,
    added_files: int,
    added_rows: int,
    *,
    min_sequence_number: int | None = None,
    existing_files: int = 0,
    existing_rows: int = 0,
    deleted_files: int = 0,
    deleted_rows: int = 0,
    content: int = 0,
) -> bytes:
    out = bytearray()
    _w_str(manifest_path, out)
    write_long(manifest_length, out)
    write_long(0, out)  # partition_spec_id
    write_long(content, out)  # 0 = data, 1 = deletes
    write_long(sequence_number, out)
    write_long(
        sequence_number if min_sequence_number is None else min_sequence_number,
        out,
    )
    write_long(snapshot_id, out)
    write_long(added_files, out)
    write_long(existing_files, out)
    write_long(deleted_files, out)
    write_long(added_rows, out)
    write_long(existing_rows, out)
    write_long(deleted_rows, out)
    return bytes(out)


def _reencode_manifest_list_entry(e: dict) -> bytes:
    """Carry a DECODED manifest-list entry forward verbatim into the
    next snapshot's manifest list (the spec's `existing` manifests:
    the entry keeps its original added_snapshot_id and sequence
    numbers so entry-level sequence inheritance stays correct)."""
    return _encode_manifest_list_entry(
        e["manifest_path"],
        e["manifest_length"],
        e["sequence_number"],
        e["added_snapshot_id"],
        e["added_files_count"],
        e["added_rows_count"],
        min_sequence_number=e["min_sequence_number"],
        existing_files=e["existing_files_count"],
        existing_rows=e["existing_rows_count"],
        deleted_files=e["deleted_files_count"],
        deleted_rows=e["deleted_rows_count"],
        content=e.get("content", 0),
    )


def _encode_manifest_entry(
    status: int,
    snapshot_id: int,
    file_path: str,
    record_count: int,
    file_size: int,
    pvals: list[tuple[str, object]] | None = None,
    *,
    seq: int | None = None,
    file_seq: int | None = None,
    content: int = 0,
) -> bytes:
    """``pvals`` = [(avro primitive, value-or-None)] in partition-spec
    order; an unpartitioned table's partition record is zero bytes.
    ``seq``/``file_seq``: explicit (data) sequence numbers — REQUIRED
    by the spec for EXISTING/DELETED entries in a rewritten manifest
    (only ADDED entries in the manifest their snapshot wrote may
    inherit from the manifest-list entry); None writes the null
    branch (inherit). ``content``: data_file.content — 0 for data
    files, 1 for position-delete files."""
    import struct as _struct

    out = bytearray()
    write_long(status, out)
    write_long(1, out)  # snapshot_id: union branch 1 (long)
    write_long(snapshot_id, out)
    for v in (seq, file_seq):
        if v is None:
            write_long(0, out)  # null branch: inherit
        else:
            write_long(1, out)
            write_long(v, out)
    write_long(content, out)  # data_file.content: 0 data, 1 pos deletes
    _w_str(file_path, out)
    _w_str("PARQUET", out)
    for prim, v in pvals or []:
        if v is None:
            write_long(0, out)  # union branch: null
            continue
        write_long(1, out)
        if prim in ("long", "int", "date"):
            write_long(int(v), out)
        elif prim == "string":
            _w_str(str(v), out)
        elif prim == "double":
            out += _struct.pack("<d", float(v))
        elif prim == "float":
            out += _struct.pack("<f", float(v))
        elif prim == "boolean":
            out.append(1 if v in (True, "true") else 0)
        else:  # pragma: no cover - writer validates prims upstream
            raise ValueError(f"unsupported partition primitive {prim}")
    write_long(record_count, out)
    write_long(file_size, out)
    return bytes(out)


_ICEBERG_TYPES = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_schema_fields(table) -> list[dict]:
    """Delta schema -> Iceberg schema fields. Field ids are the
    table's columnMapping ids when mapped (icebergCompatV2's rule —
    the SAME ids ride the parquet files), ordinals otherwise."""
    s = table.schema()
    if s is None:
        return []
    fields = []
    for i, f in enumerate(s.fields, start=1):
        md = f.metadata or {}
        fid = int(md.get("delta.columnMapping.id", i))
        tn = f.dataType.typeName()
        if tn == "decimal":
            it = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        elif tn in _ICEBERG_TYPES:
            it = _ICEBERG_TYPES[tn]
        else:
            raise ValueError(
                f"icebergCompatV2: column {f.name} has type {tn}, which "
                "this UniForm writer does not map"
            )
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": it,
            }
        )
    return fields


_PARTITION_PRIMS = {
    "long": "long", "integer": "int", "short": "int", "byte": "int",
    "string": "string", "double": "double", "float": "float",
    "boolean": "boolean", "date": "date",
}


def _hive_pval(raw: str | None, prim: str):
    """A Delta partitionValues string -> the typed Iceberg partition
    value (None for the Hive null partition)."""
    if raw is None:
        return None
    if prim in ("long", "int"):
        return int(raw)
    if prim == "date":
        import datetime as _dt

        return (_dt.date.fromisoformat(raw) - _dt.date(1970, 1, 1)).days
    if prim == "double" or prim == "float":
        return float(raw)
    if prim == "boolean":
        return raw == "true"
    return raw


def validate_table(
    table, pending: dict[str, str] | None = None
) -> tuple[list[dict], list[tuple[str, str, int]]]:
    """UniForm preconditions, checkable WITHOUT writing: every column
    type maps to an Iceberg type, every partition column maps to an
    identity partition primitive, and deletion vectors in the live
    set are only allowed when `delta.enableIcebergCompatV2` is on
    (the writer then materializes each DV as an Iceberg v2
    position-delete file; without compatV2 an Iceberg reader would
    misread DV-masked rows as live, so the enable REFUSES). Raises
    ValueError otherwise. Returns the (schema fields, partition spec
    fields) the writer uses — set_properties runs this BEFORE durably
    enabling UniForm (``pending`` carries the about-to-be-set
    properties), so a table the writer cannot represent never gets
    the property (the post-commit hook would otherwise poison every
    later commit)."""
    fields = _iceberg_schema_fields(table)
    s_tbl = table.schema()
    by_name = {f.name: f for f in (s_tbl.fields if s_tbl else [])}
    pfields: list[tuple[str, str, int]] = []
    for i, c in enumerate(table.partition_columns()):
        f = by_name.get(c)
        tn = f.dataType.typeName() if f is not None else None
        prim = _PARTITION_PRIMS.get(tn or "")
        if prim is None:
            raise ValueError(
                f"icebergCompatV2: partition column {c} has type {tn}, "
                "which this UniForm writer cannot map to an identity "
                "partition value"
            )
        pfields.append((c, prim, 1000 + i))
    cfg = dict((table._metadata_dict() or {}).get("configuration") or {})
    cfg.update(pending or {})
    compat_v2 = (cfg.get("delta.enableIcebergCompatV2") or "").lower() == "true"
    if not compat_v2 and any(
        a.get("deletionVector") for a in table.snapshot_adds().values()
    ):
        raise ValueError(
            "UniForm without icebergCompatV2 cannot represent deletion "
            "vectors (an Iceberg reader would see DV-masked rows as "
            "live) — enable delta.enableIcebergCompatV2 so DVs map to "
            "position-delete files, or purge DVs (OPTIMIZE) first"
        )
    return fields, pfields


def _entry_file_counts(table, adds) -> dict[str, tuple[int, int, dict]]:
    """abs path -> (record count, size, raw add) for the live set."""
    out = {}
    for p, a in sorted(adds.items()):
        fp = table._abs_of_add_path(p)
        nrec = None
        st = a.get("stats")
        if st:
            try:
                nrec = json.loads(st).get("numRecords")
            except (ValueError, TypeError):
                nrec = None
        if not isinstance(nrec, int):
            # a stats-less add (legal for foreign writers): read the
            # REAL count from the parquet footer — Iceberg engines
            # trust record_count for count(*) pushdown, so writing 0
            # for a file with rows would be silently wrong metadata
            import pyarrow.parquet as _pq

            nrec = _pq.ParquetFile(fp).metadata.num_rows
        out[fp] = (nrec, int(a.get("size") or 0), a)
    return out


def _write_position_delete(
    path: str, data_file: str, positions: list[int]
) -> None:
    """One Iceberg v2 POSITION-DELETE parquet file targeting
    ``data_file``: columns file_path / pos with the spec's reserved
    field ids (2147483546 / 2147483545), rows sorted by pos."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field(
                "file_path",
                pa.string(),
                nullable=False,
                metadata={b"PARQUET:field_id": b"2147483546"},
            ),
            pa.field(
                "pos",
                pa.int64(),
                nullable=False,
                metadata={b"PARQUET:field_id": b"2147483545"},
            ),
        ]
    )
    tbl = pa.table(
        {
            "file_path": pa.array([data_file] * len(positions), pa.string()),
            "pos": pa.array(positions, pa.int64()),
        },
        schema=schema,
    )
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def write_iceberg_snapshot(table, version: int) -> str:
    """Generate the Iceberg metadata for ``table``'s state at its
    current snapshot, as Delta commit ``version``. Returns the
    metadata.json path. Hive partitioning maps to an IDENTITY
    partition spec (field ids 1000+; per-file partition values ride
    the manifest entries' typed partition struct — identity-transform
    readers materialize the column from metadata, so Hive-layout
    files that omit it stay valid Iceberg data files).

    Deletion vectors (icebergCompatV2 tables only — validate_table
    refuses otherwise): each live DV materializes as an Iceberg v2
    POSITION-DELETE parquet file (file_path + pos rows, the spec's
    reserved field ids), named by a digest of (data file, DV
    descriptor) so an unchanged DV is never rewritten; the current
    delete set rides ONE delete manifest (content=1). When the DV
    state is unchanged the previous delete manifest carries forward
    verbatim; when it changed, a fresh delete manifest replaces the
    prior ones. Per-commit delete work is O(changed DVs), KBs per
    file whatever the table size — the same bound as Delta's own DV
    read path.

    Snapshots are INCREMENTAL (Iceberg spec v2 manifest lifecycle):
    each commit writes ONE delta manifest carrying this commit's new
    files as ADDED entries; prior snapshots' manifests are carried
    forward in the manifest list verbatim (the spec's `existing`
    manifests, keeping their original added_snapshot_id and sequence
    numbers so entry-level inheritance stays correct). A manifest
    that lost files to this commit is REWRITTEN: survivors become
    EXISTING entries with explicit sequence numbers, removed files
    become DELETED entries stamped with this snapshot — retained for
    exactly one snapshot (dropped at the next carry-forward) so
    Iceberg incremental consumers see the removal. The snapshot
    summary operation is `append` / `delete` / `overwrite` per the
    actual file delta. Falls back to one full-rewrite snapshot when
    the prior metadata is unreadable or the partition spec changed."""
    fields, pfields = validate_table(table)
    adds = table.snapshot_adds()
    meta_dir = os.path.join(table.path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snapshot_id = version + 1  # snapshot ids must be unique, non-zero
    seq = version + 1
    now = int(__import__("time").time() * 1000)
    fid_of = {f["name"]: f["id"] for f in fields}
    cm = table.column_mapping() or {}
    _cm_of = cm
    cur = _entry_file_counts(table, adds)
    decode_plan = [(c, prim) for c, prim, _fid in pfields]

    def _pvals_of(a: dict) -> list[tuple[str, object]]:
        pv = a.get("partitionValues") or {}
        if not isinstance(pv, dict):
            pv = dict(pv)
        return [
            (prim, _hive_pval(pv.get(cm.get(c, c)), prim))
            for c, prim, _fid in pfields
        ]

    # ---- deletion vectors -> position-delete files -----------------
    import hashlib as _hashlib

    dv_deletes: dict[str, tuple[int, int, list]] = {}
    for fp, (_nrec, _size, a) in cur.items():
        dv = a.get("deletionVector")
        if not dv:
            continue
        positions = sorted(table._dv_positions(a))
        sig = _hashlib.sha1(
            (fp + "\x00" + json.dumps(dv, sort_keys=True)).encode("utf-8")
        ).hexdigest()
        dp = os.path.join(meta_dir, f"delete-{sig}.parquet")
        if not os.path.exists(dp):
            _write_position_delete(dp, fp, positions)
        dv_deletes[dp] = (len(positions), os.path.getsize(dp), _pvals_of(a))

    # ---- prior state: snapshots, metadata-log, and the previous
    # snapshot's manifests (for carry-forward / rewrite) -------------
    prior: list[dict] = []
    meta_log: list[dict] = []
    prev_manifests: list[dict] = []  # decoded manifest-list entries
    prev_ok = False
    prev_md: dict | None = None  # full prior metadata (schemas, logs)
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        try:
            prev_n = int(open(hint).read().strip())
            prev_path = os.path.join(meta_dir, f"v{prev_n}.metadata.json")
            prev = json.load(open(prev_path))
            prev_md = prev
            prior = prev.get("snapshots") or []
            meta_log = (prev.get("metadata-log") or []) + [
                {
                    "timestamp-ms": prev.get("last-updated-ms") or 0,
                    "metadata-file": prev_path,
                }
            ]
            if _decode_plan_of(prev) == decode_plan:
                prev_cur = prev.get("current-snapshot-id")
                prev_snap = next(
                    (
                        s
                        for s in prior
                        if s["snapshot-id"] == prev_cur
                    ),
                    None,
                )
                if prev_snap is not None:
                    _s, bodies, counts = avro_ocf_read(
                        prev_snap["manifest-list"]
                    )
                    for body, cnt in zip(bodies, counts):
                        prev_manifests.extend(
                            _decode_manifest_list(body, cnt)
                        )
                    prev_ok = True
        except (ValueError, OSError, KeyError):
            prior, meta_log, prev_manifests, prev_ok = [], [], [], False
            prev_md = None

    # ---- classify the file delta -----------------------------------
    list_entries: list[bytes] = []  # the new manifest list, in order
    claimed: set[str] = set()
    n_deleted_files = 0
    n_deleted_rows = 0
    schema_json = _manifest_entry_schema(pfields)
    prev_delete_mls: list[dict] = []
    if prev_ok:
        for m in prev_manifests:
            if m.get("content") == 1:
                # delete manifests have their own lifecycle below
                prev_delete_mls.append(m)
                continue
            try:
                _ms, mb, mc = avro_ocf_read(m["manifest_path"])
            except (OSError, ValueError):
                prev_ok = False
                break
            ent: list[dict] = []
            for body, cnt in zip(mb, mc):
                ent.extend(_decode_manifest(body, cnt, decode_plan))
            live = [e for e in ent if e["status"] != 2]
            survivors = [e for e in live if e["file_path"] in cur]
            removed = [e for e in live if e["file_path"] not in cur]
            claimed.update(e["file_path"] for e in survivors)
            had_tombstones = len(live) != len(ent)
            if not removed and not had_tombstones:
                # untouched: carry the list entry forward verbatim
                list_entries.append(_reencode_manifest_list_entry(m))
                continue
            # rewrite: survivors -> EXISTING with explicit sequence
            # numbers; this commit's removals -> DELETED stamped with
            # this snapshot; prior DELETED tombstones are dropped
            # (they were visible for exactly one snapshot)
            n_deleted_files += len(removed)
            n_deleted_rows += sum(e["record_count"] for e in removed)
            inherit_seq = m["sequence_number"]
            rewritten: list[bytes] = []
            ex_rows = 0
            for e in survivors:
                ex_rows += e["record_count"]
                rewritten.append(
                    _encode_manifest_entry(
                        0,
                        e.get("snapshot_id") or m["added_snapshot_id"],
                        e["file_path"],
                        e["record_count"],
                        e["file_size_in_bytes"],
                        pvals=[
                            (prim, e["partition"].get(name))
                            for name, prim in decode_plan
                        ],
                        seq=e.get("sequence_number", inherit_seq)
                        if e.get("sequence_number") is not None
                        else inherit_seq,
                        file_seq=e.get("file_sequence_number")
                        if e.get("file_sequence_number") is not None
                        else inherit_seq,
                    )
                )
            rm_rows = 0
            for e in removed:
                rm_rows += e["record_count"]
                rewritten.append(
                    _encode_manifest_entry(
                        2,
                        snapshot_id,
                        e["file_path"],
                        e["record_count"],
                        e["file_size_in_bytes"],
                        pvals=[
                            (prim, e["partition"].get(name))
                            for name, prim in decode_plan
                        ],
                        seq=e.get("sequence_number", inherit_seq)
                        if e.get("sequence_number") is not None
                        else inherit_seq,
                        file_seq=e.get("file_sequence_number")
                        if e.get("file_sequence_number") is not None
                        else inherit_seq,
                    )
                )
            if not rewritten:
                continue  # the whole manifest died: drop it entirely
            rw_name = f"{uuid.uuid4().hex}-m0.avro"
            rw_path = os.path.join(meta_dir, rw_name)
            avro_ocf_write(rw_path, schema_json, rewritten)
            list_entries.append(
                _encode_manifest_list_entry(
                    rw_path,
                    os.path.getsize(rw_path),
                    seq,
                    snapshot_id,
                    0,
                    0,
                    min_sequence_number=min(
                        inherit_seq, m["min_sequence_number"]
                    ),
                    existing_files=len(survivors),
                    existing_rows=ex_rows,
                    deleted_files=len(removed),
                    deleted_rows=rm_rows,
                )
            )
    if not prev_ok:
        # full-rewrite fallback: everything is ADDED in one manifest
        list_entries, claimed = [], set()
        n_deleted_files = n_deleted_rows = 0

    # ---- this commit's delta manifest (new files only) -------------
    entries = []
    added_rows = 0
    for fp in sorted(set(cur) - claimed):
        nrec, size, a = cur[fp]
        added_rows += nrec
        pv = a.get("partitionValues") or {}
        if not isinstance(pv, dict):
            pv = dict(pv)
        pvals = [
            (prim, _hive_pval(pv.get(cm.get(c, c)), prim))
            for c, prim, _fid in pfields
        ]
        entries.append(
            _encode_manifest_entry(
                1, snapshot_id, fp, nrec, size, pvals=pvals
            )
        )
    if entries:
        m_name = f"{uuid.uuid4().hex}-m0.avro"
        m_path = os.path.join(meta_dir, m_name)
        avro_ocf_write(m_path, schema_json, entries)
        list_entries.insert(
            0,
            _encode_manifest_list_entry(
                m_path,
                os.path.getsize(m_path),
                seq,
                snapshot_id,
                len(entries),
                added_rows,
            ),
        )
    # ---- the delete side: ONE manifest of position-delete files ----
    deletes_changed = False
    prev_delete_paths: set[str] = set()
    if prev_ok:
        try:
            for m in prev_delete_mls:
                _ms, mb, mc = avro_ocf_read(m["manifest_path"])
                for body, cnt in zip(mb, mc):
                    prev_delete_paths.update(
                        e["file_path"]
                        for e in _decode_manifest(body, cnt, decode_plan)
                        if e["status"] != 2
                    )
        except (OSError, ValueError):
            prev_delete_paths = set()
    if prev_ok and prev_delete_paths == set(dv_deletes):
        # DV state unchanged: carry the delete manifests forward
        list_entries.extend(
            _reencode_manifest_list_entry(m) for m in prev_delete_mls
        )
    elif dv_deletes:
        deletes_changed = True
        dent: list[bytes] = []
        d_rows = 0
        for dp in sorted(dv_deletes):
            n_pos, dsize, dpvals = dv_deletes[dp]
            d_rows += n_pos
            dent.append(
                _encode_manifest_entry(
                    1, snapshot_id, dp, n_pos, dsize,
                    pvals=dpvals, content=1,
                )
            )
        dm_path = os.path.join(meta_dir, f"{uuid.uuid4().hex}-d0.avro")
        avro_ocf_write(dm_path, schema_json, dent)
        list_entries.append(
            _encode_manifest_list_entry(
                dm_path,
                os.path.getsize(dm_path),
                seq,
                snapshot_id,
                len(dent),
                d_rows,
                content=1,
            )
        )
    elif prev_delete_paths:
        # every DV purged: the prior delete manifests simply drop out
        deletes_changed = True
    ml_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro"
    ml_path = os.path.join(meta_dir, ml_name)
    avro_ocf_write(ml_path, _MANIFEST_LIST_SCHEMA, list_entries)
    if not prev_ok:
        op = "append" if not prior else "overwrite"
    elif entries and (n_deleted_files or deletes_changed):
        op = "overwrite"
    elif n_deleted_files or deletes_changed:
        op = "delete"
    else:
        op = "append"
    total_rows = sum(nrec for nrec, _sz, _a in cur.values())
    # schema evolution (Iceberg spec): `schemas` is APPEND-ONLY — a
    # changed field list mints a fresh schema-id and prior schemas
    # stay listed, so every old snapshot still resolves the schema it
    # was written under; an unchanged schema reuses the current id
    schemas: list[dict] = [
        {"type": "struct", "schema-id": 0, "fields": fields}
    ]
    cur_schema_id = 0
    if prev_md is not None:
        prev_schemas = prev_md.get("schemas") or []
        prev_sid = prev_md.get("current-schema-id", 0)
        prev_fields = next(
            (
                s.get("fields")
                for s in prev_schemas
                if s.get("schema-id") == prev_sid
            ),
            None,
        )
        if prev_fields == fields:
            schemas, cur_schema_id = prev_schemas, prev_sid
        elif prev_schemas:
            cur_schema_id = (
                max(s.get("schema-id", 0) for s in prev_schemas) + 1
            )
            schemas = prev_schemas + [
                {
                    "type": "struct",
                    "schema-id": cur_schema_id,
                    "fields": fields,
                }
            ]
    last_col_id = max(
        (f["id"] for s in schemas for f in s.get("fields") or []),
        default=0,
    )
    # snapshot-log: the history of current-snapshot transitions —
    # accumulated, not rewritten (the spec's time-travel-by-time index)
    snap_log = (
        (prev_md.get("snapshot-log") or []) if prev_md is not None else []
    ) + [{"snapshot-id": snapshot_id, "timestamp-ms": now}]
    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now,
        "sequence-number": seq,
        "schema-id": cur_schema_id,
        "summary": {
            "operation": op,
            "added-data-files": str(len(entries)),
            "added-records": str(added_rows),
            "deleted-data-files": str(n_deleted_files),
            "deleted-records": str(n_deleted_rows),
            "total-data-files": str(len(cur)),
            "total-records": str(total_rows),
        },
        "manifest-list": ml_path,
    }
    md = {
        "format-version": 2,
        "table-uuid": (table._metadata_dict() or {}).get("id")
        or uuid.uuid4().hex,
        "location": table.path,
        "last-sequence-number": seq,
        "last-updated-ms": now,
        "last-column-id": last_col_id,
        "current-schema-id": cur_schema_id,
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": fid_of[c],
                        "field-id": fid,
                    }
                    for c, _prim, fid in pfields
                ],
            }
        ],
        "last-partition-id": 999 + len(pfields),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        # name-mapping (Iceberg spec): binds ID-LESS data files (a
        # name-mode table's pre-UniForm files, an unmapped table's
        # whole history) by the column names they actually carry —
        # physical names on a mapped table, logical otherwise; files
        # WITH parquet field ids (our mode-id/mapped writes) bind by
        # id and never consult this
        "properties": {
            "schema.name-mapping.default": json.dumps(
                [
                    {
                        "field-id": f["id"],
                        "names": sorted(
                            {f["name"], _cm_of.get(f["name"], f["name"])}
                        ),
                    }
                    for f in fields
                ]
            )
        },
        "current-snapshot-id": snapshot_id,
        "snapshots": prior + [snapshot],
        "snapshot-log": snap_log,
        "metadata-log": meta_log,
    }
    n = version + 1
    mj = os.path.join(meta_dir, f"v{n}.metadata.json")
    tmp = mj + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(md, fh)
    os.replace(tmp, mj)
    with open(hint + ".tmp", "w") as fh:
        fh.write(str(n))
    os.replace(hint + ".tmp", hint)
    return mj


# --- independent reader-side fold ---------------------------------------


def _decode_manifest_list(body: bytes, count: int) -> list[dict]:
    out = []
    pos = 0
    for _ in range(count):
        e = {}
        ln, pos = read_long(body, pos)
        e["manifest_path"] = body[pos : pos + ln].decode("utf-8")
        pos += ln
        e["manifest_length"], pos = read_long(body, pos)
        e["partition_spec_id"], pos = read_long(body, pos)
        e["content"], pos = read_long(body, pos)
        e["sequence_number"], pos = read_long(body, pos)
        e["min_sequence_number"], pos = read_long(body, pos)
        e["added_snapshot_id"], pos = read_long(body, pos)
        e["added_files_count"], pos = read_long(body, pos)
        e["existing_files_count"], pos = read_long(body, pos)
        e["deleted_files_count"], pos = read_long(body, pos)
        e["added_rows_count"], pos = read_long(body, pos)
        e["existing_rows_count"], pos = read_long(body, pos)
        e["deleted_rows_count"], pos = read_long(body, pos)
        out.append(e)
    if pos != len(body):
        raise ValueError("trailing bytes after manifest list entries")
    return out


def _decode_manifest(
    body: bytes,
    count: int,
    pfields: list[tuple[str, str]] | None = None,
) -> list[dict]:
    """``pfields`` = [(name, avro primitive)] in partition-spec order
    (empty/None for an unpartitioned spec)."""
    import struct as _struct

    out = []
    pos = 0
    for _ in range(count):
        e = {}
        e["status"], pos = read_long(body, pos)
        b, pos = read_long(body, pos)
        if b:
            e["snapshot_id"], pos = read_long(body, pos)
        b, pos = read_long(body, pos)
        if b:
            e["sequence_number"], pos = read_long(body, pos)
        b, pos = read_long(body, pos)
        if b:
            e["file_sequence_number"], pos = read_long(body, pos)
        e["content"], pos = read_long(body, pos)
        ln, pos = read_long(body, pos)
        e["file_path"] = body[pos : pos + ln].decode("utf-8")
        pos += ln
        ln, pos = read_long(body, pos)
        e["file_format"] = body[pos : pos + ln].decode("utf-8")
        pos += ln
        part = {}
        for name, prim in pfields or []:
            br, pos = read_long(body, pos)
            if not br:
                part[name] = None
                continue
            if prim in ("long", "int", "date"):
                part[name], pos = read_long(body, pos)
            elif prim == "string":
                n2, pos = read_long(body, pos)
                part[name] = body[pos : pos + n2].decode("utf-8")
                pos += n2
            elif prim == "double":
                (part[name],) = _struct.unpack_from("<d", body, pos)
                pos += 8
            elif prim == "float":
                (part[name],) = _struct.unpack_from("<f", body, pos)
                pos += 4
            elif prim == "boolean":
                part[name] = bool(body[pos])
                pos += 1
            else:
                raise ValueError(f"unsupported partition primitive {prim}")
        e["partition"] = part
        e["record_count"], pos = read_long(body, pos)
        e["file_size_in_bytes"], pos = read_long(body, pos)
        out.append(e)
    if pos != len(body):
        raise ValueError("trailing bytes after manifest entries")
    return out


def _decode_plan_of(md: dict) -> list[tuple[str, str]]:
    """The partition decode plan [(name, avro primitive)] from a
    metadata.json's DEFAULT SPEC + current schema: identity fields'
    primitives come from their source columns."""
    pfields: list[tuple[str, str]] = []
    specs = {
        sp.get("spec-id", 0): sp for sp in md.get("partition-specs") or []
    }
    spec = specs.get(md.get("default-spec-id", 0)) or {"fields": []}
    type_of = {}
    for sch in md.get("schemas") or []:
        if sch.get("schema-id") == md.get("current-schema-id", 0):
            type_of = {f["id"]: f["type"] for f in sch.get("fields") or []}
    _prim_of = {
        "long": "long", "int": "int", "date": "date", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
    }
    for f in spec.get("fields") or []:
        if f.get("transform") != "identity":
            raise ValueError(
                f"unsupported partition transform {f.get('transform')!r}"
            )
        prim = _prim_of.get(str(type_of.get(f.get("source-id"))))
        if prim is None:
            raise ValueError(
                f"cannot decode partition field {f.get('name')!r}"
            )
        pfields.append((f["name"], prim))
    return pfields


def _read_iceberg_current(table_path: str, want_content: int) -> list[dict]:
    """Fold the current snapshot's live entries of one content class
    (0 = data files, 1 = position-delete files)."""
    meta_dir = os.path.join(table_path, "metadata")
    n = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    md = json.load(open(os.path.join(meta_dir, f"v{n}.metadata.json")))
    cur = md["current-snapshot-id"]
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == cur
    )
    pfields = _decode_plan_of(md)
    _schema, bodies, counts = avro_ocf_read(snap["manifest-list"])
    manifests = []
    for body, cnt in zip(bodies, counts):
        manifests.extend(_decode_manifest_list(body, cnt))
    files: list[dict] = []
    for m in manifests:
        if m.get("content", 0) != want_content:
            continue
        _s, mb, mc = avro_ocf_read(m["manifest_path"])
        for body, cnt in zip(mb, mc):
            files.extend(
                e
                for e in _decode_manifest(body, cnt, pfields)
                if e["status"] != 2 and e["content"] == want_content
            )
    return files


def read_iceberg_live_files(table_path: str) -> list[dict]:
    """Fold the ICEBERG metadata only — version-hint -> metadata.json
    -> current snapshot -> manifest list -> manifests -> live data
    files (status != deleted). Never opens `_delta_log`: this is the
    independent path the UniForm op's round-trip proof runs. Data
    files only; a DV-carrying table's position deletes come from
    ``read_iceberg_deletes`` and must be anti-joined on
    (file_path, pos) — the Iceberg v2 merge-on-read contract."""
    return _read_iceberg_current(table_path, 0)


def read_iceberg_deletes(table_path: str) -> list[dict]:
    """The current snapshot's live POSITION-DELETE files (content=1
    manifests), from the Iceberg metadata only."""
    return _read_iceberg_current(table_path, 1)


def read_iceberg_changelog(table_path: str) -> list[dict]:
    """Per-snapshot FILE-LEVEL changelog from the Iceberg metadata
    only (never opens `_delta_log`): for each snapshot in the current
    metadata.json, ordered by sequence-number, decode only the
    manifests that snapshot itself wrote (added_snapshot_id ==
    snapshot-id) and collect its ADDED and DELETED entries — the
    incremental-consumption path real Iceberg engines run. Returns
    [{snapshot_id, sequence_number, operation, added: [entry],
    removed: [entry]}]. Folding added/removed in order reproduces the
    live set (asserted by the sink_delta_uniform_incremental op)."""
    meta_dir = os.path.join(table_path, "metadata")
    n = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    md = json.load(open(os.path.join(meta_dir, f"v{n}.metadata.json")))
    pfields = _decode_plan_of(md)
    out: list[dict] = []
    for snap in sorted(
        md.get("snapshots") or [], key=lambda s: s["sequence-number"]
    ):
        sid = snap["snapshot-id"]
        _schema, bodies, counts = avro_ocf_read(snap["manifest-list"])
        manifests: list[dict] = []
        for body, cnt in zip(bodies, counts):
            manifests.extend(_decode_manifest_list(body, cnt))
        added: list[dict] = []
        removed: list[dict] = []
        for m in manifests:
            if m["added_snapshot_id"] != sid:
                continue  # carried forward: no changes from this snapshot
            if m.get("content", 0) == 1:
                continue  # delete manifests: not part of the DATA changelog
            _s, mb, mc = avro_ocf_read(m["manifest_path"])
            for body, cnt in zip(mb, mc):
                for e in _decode_manifest(body, cnt, pfields):
                    if e["status"] == 1 and e.get("snapshot_id") == sid:
                        added.append(e)
                    elif e["status"] == 2 and e.get("snapshot_id") == sid:
                        removed.append(e)
        out.append(
            {
                "snapshot_id": sid,
                "sequence_number": snap["sequence-number"],
                "operation": (snap.get("summary") or {}).get("operation"),
                "added": added,
                "removed": removed,
            }
        )
    return out


def expire_iceberg_snapshots(
    table_path: str,
    older_than_ms: int | None = None,
    retain_last: int = 1,
    previous_versions_max: int = 100,
) -> int:
    """EXPIRE SNAPSHOTS (Iceberg's ExpireSnapshots maintenance
    action, the public `expireOlderThan`/`retainLast` semantics):
    drop snapshots whose timestamp is older than ``older_than_ms``
    (default: the spec's 5-day `history.expire.max-snapshot-age-ms`),
    always retaining the current snapshot and at least
    ``retain_last`` newest; delete the files ONLY expired snapshots
    reference — their manifest lists, then any manifest (and any
    position-delete file) no retained snapshot reaches. Data files
    are NEVER touched (they belong to the Delta log; VACUUM owns
    them). The current metadata version is rewritten in place with
    the pruned snapshot list + snapshot-log (this writer derives
    metadata version numbers from Delta commit versions, so a
    maintenance-only bump would collide with the next commit —
    documented deviation from Iceberg's fresh-metadata-per-expire).
    Returns the number of metadata files deleted. Without this, a
    long-lived UniForm table's snapshot list and manifest directory
    grow without bound — the same class of problem cleanup_log solves
    for `_delta_log`. ``previous_versions_max`` (Iceberg's
    `write.metadata.previous-versions-max`, default 100) additionally
    bounds the metadata-log chain: older v*.metadata.json files are
    unlinked (path-containment-guarded to the metadata dir) and their
    log entries dropped."""
    import time as _time

    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    if older_than_ms is None:
        older_than_ms = int(_time.time() * 1000) - 5 * 24 * 3600 * 1000
    meta_dir = os.path.join(table_path, "metadata")
    n = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    mj = os.path.join(meta_dir, f"v{n}.metadata.json")
    md = json.load(open(mj))
    snaps = sorted(
        md.get("snapshots") or [], key=lambda s: s["sequence-number"]
    )
    cur = md["current-snapshot-id"]
    keep_ids = {s["snapshot-id"] for s in snaps[-retain_last:]} | {cur}
    retained = [
        s
        for s in snaps
        if s["snapshot-id"] in keep_ids or s["timestamp-ms"] >= older_than_ms
    ]
    expired = [s for s in snaps if s not in retained]
    # metadata-log pruning (Iceberg's write.metadata.
    # previous-versions-max): keep only the newest K prior metadata
    # files; dropped entries' v*.metadata.json are unlinked — the
    # other unbounded-growth axis of a long-lived UniForm table
    meta_log = md.get("metadata-log") or []
    dropped_meta = (
        meta_log[: -previous_versions_max]
        if previous_versions_max >= 0 and len(meta_log) > previous_versions_max
        else []
    )
    if not expired and not dropped_meta:
        return 0
    deleted_meta = 0
    if dropped_meta:
        md["metadata-log"] = meta_log[len(dropped_meta):]
        for e in dropped_meta:
            p = e.get("metadata-file")
            if (
                p
                and os.path.realpath(p) != os.path.realpath(mj)
                and os.path.realpath(os.path.dirname(p))
                == os.path.realpath(meta_dir)
                and os.path.exists(p)
            ):
                os.remove(p)
                deleted_meta += 1
    if not expired:
        tmp0 = mj + f".{uuid.uuid4().hex}.tmp"
        with open(tmp0, "w") as fh:
            json.dump(md, fh)
        os.replace(tmp0, mj)
        return deleted_meta

    def _manifests_of(snap: dict) -> set[str]:
        try:
            _s, bodies, counts = avro_ocf_read(snap["manifest-list"])
        except (OSError, ValueError):
            return set()
        out: set[str] = set()
        for body, cnt in zip(bodies, counts):
            out.update(
                m["manifest_path"] for m in _decode_manifest_list(body, cnt)
            )
        return out

    kept_manifests: set[str] = set()
    for s in retained:
        kept_manifests.update(os.path.realpath(p) for p in _manifests_of(s))
    deleted = 0
    pfields = _decode_plan_of(md)
    doomed_delete_files: set[str] = set()
    kept_delete_files: set[str] = set()
    for s in expired + retained:
        keep = s in retained
        for mp in _manifests_of(s):
            rp = os.path.realpath(mp)
            if not keep and rp in kept_manifests:
                continue
            try:
                _sc, mb, mc = avro_ocf_read(mp)
                for body, cnt in zip(mb, mc):
                    for e in _decode_manifest(body, cnt, pfields):
                        if e["content"] == 1:
                            (
                                kept_delete_files
                                if keep
                                else doomed_delete_files
                            ).add(os.path.realpath(e["file_path"]))
            except (OSError, ValueError):
                pass
            if not keep and os.path.exists(mp):
                os.remove(mp)
                deleted += 1
        if not keep and os.path.exists(s["manifest-list"]):
            os.remove(s["manifest-list"])
            deleted += 1
    for dp in sorted(doomed_delete_files - kept_delete_files):
        if os.path.exists(dp):
            os.remove(dp)
            deleted += 1
    md["snapshots"] = retained
    rid = {s["snapshot-id"] for s in retained}
    md["snapshot-log"] = [
        e for e in (md.get("snapshot-log") or []) if e["snapshot-id"] in rid
    ]
    tmp = mj + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(md, fh)
    os.replace(tmp, mj)
    return deleted + deleted_meta
