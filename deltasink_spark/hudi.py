"""UniForm / hudi — Apache Hudi metadata generation for Delta tables
(`delta.universalFormat.enabledFormats=hudi`): the SAME parquet data
files, with a Hudi COPY_ON_WRITE `.hoodie/` timeline written alongside
`_delta_log` so a Hudi timeline reader consumes the table without a
copy — the hudi sibling of deltasink_spark/uniform.py's Iceberg tree.

Reference parity: delta.io UniForm's hudi target and the public Apache
Hudi table layout (hudi.apache.org/docs — table spec: `.hoodie/
hoodie.properties` table config; an ordered TIMELINE of completed
instants; `<instant>.commit` carrying `partitionToWriteStats` per the
HoodieCommitMetadata JSON shape; `<instant>.replacecommit` carrying
additionally `partitionToReplaceFileIds` — the instant class Hudi's
insert_overwrite/clustering writes when file groups are replaced).

Mapping, one Delta commit -> one completed instant:

- every Delta data file is ONE Hudi file group (fileId = the file's
  basename without extension; one base file per group — COPY_ON_WRITE,
  no log files);
- a commit that only adds files writes `<instant>.commit` whose
  partitionToWriteStats lists the new files (path relative to the
  table root, numWrites from add stats, fileSizeInBytes);
- a commit that removes files writes `<instant>.replacecommit`: the
  same write stats for files it added plus partitionToReplaceFileIds
  naming every removed file group — exactly Hudi's replace semantics;
- instants are zero-padded by Delta version so lexicographic timeline
  order == commit order (Hudi only requires monotonically increasing
  instant times).

``read_hudi_live_files`` is the independent reader: fold ONLY the
timeline (properties -> ordered instants -> write stats/replaced ids)
into the live file-group set; `_delta_log` is never opened on that
path — the round-trip proof the sink_delta_uniform_hudi op runs.

Constraints (validate_table, run BEFORE the property lands): deletion
vectors REFUSE — a COPY_ON_WRITE base file is the whole truth of its
file group, and Hudi has no sidecar to mask rows, so emitting a
timeline over DV-carrying files would serve deleted rows as live.

Scale: per-commit work is O(files touched + timeline length) of
driver-side JSON — the same class as the Iceberg writer; data files
are never copied or rewritten, which is UniForm's entire point.
"""

from __future__ import annotations

import json
import os
import uuid

_HOODIE = ".hoodie"


def _hoodie_dir(table_path: str) -> str:
    return os.path.join(table_path, _HOODIE)


def validate_table(table, pending: dict[str, str] | None = None) -> None:
    """Hudi-target preconditions, checkable WITHOUT writing: no
    deletion vectors in the live set (COPY_ON_WRITE has no row-mask
    sidecar — a timeline over DV-carrying files would serve deleted
    rows as live). Raises ValueError otherwise. set_properties runs
    this BEFORE durably enabling the hudi target."""
    del pending  # no hudi knob changes the DV verdict
    if any(
        a.get("deletionVector") for a in table.snapshot_adds().values()
    ):
        raise ValueError(
            "UniForm hudi cannot represent deletion vectors (a "
            "COPY_ON_WRITE base file is its file group's whole truth) "
            "— purge DVs (OPTIMIZE) before enabling, or use the "
            "iceberg target whose position-delete files can carry them"
        )


def _write_atomic(path: str, text: str) -> None:
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        fh.write(text)
    os.replace(tmp, path)


def _ensure_properties(table) -> None:
    """`.hoodie/hoodie.properties` — the table-config file every Hudi
    client reads first (public config names; written once)."""
    hd = _hoodie_dir(table.path)
    os.makedirs(hd, exist_ok=True)
    props = os.path.join(hd, "hoodie.properties")
    if os.path.exists(props):
        return
    name = os.path.basename(os.path.normpath(table.path)) or "table"
    lines = [
        f"hoodie.table.name={name}",
        "hoodie.table.type=COPY_ON_WRITE",
        "hoodie.table.version=6",
        "hoodie.timeline.layout.version=1",
        "hoodie.datasource.write.hive_style_partitioning=true",
    ]
    pcols = table.partition_columns()
    if pcols:
        lines.append(
            "hoodie.table.partition.fields=" + ",".join(pcols)
        )
    _write_atomic(props, "\n".join(lines) + "\n")


def _timeline_instants(table_path: str) -> list[tuple[str, str, str]]:
    """Completed instants, timeline order: (instant, action, path)."""
    hd = _hoodie_dir(table_path)
    out = []
    if not os.path.isdir(hd):
        return out
    for f in os.listdir(hd):
        for act in ("replacecommit", "commit"):
            if f.endswith("." + act):
                out.append(
                    (f[: -len(act) - 1], act, os.path.join(hd, f))
                )
                break
    return sorted(out)


def _fold_timeline(table_path: str) -> dict[str, dict]:
    """fileId -> {path, partitionPath, numWrites, fileSizeInBytes} of
    the LIVE file groups, from the timeline only."""
    live: dict[str, dict] = {}
    for _instant, act, p in _timeline_instants(table_path):
        md = json.load(open(p))
        if act == "replacecommit":
            for fids in (md.get("partitionToReplaceFileIds") or {}).values():
                for fid in fids:
                    live.pop(fid, None)
        for stats in (md.get("partitionToWriteStats") or {}).values():
            for st in stats:
                live[st["fileId"]] = st
    return live


def _file_id(rel_path: str) -> str:
    return os.path.splitext(os.path.basename(rel_path))[0]


def write_hudi_commit(table, version: int) -> str:
    """Generate the completed instant for Delta commit ``version``:
    diff the Delta live set against the timeline's own fold, write
    `<instant>.commit` (adds only) or `<instant>.replacecommit` (any
    file group replaced). Returns the instant file path."""
    validate_table(table)
    _ensure_properties(table)
    adds = table.snapshot_adds()
    cur: dict[str, dict] = {}
    for p, a in sorted(adds.items()):
        fp = table._abs_of_add_path(p)
        rel = os.path.relpath(fp, table.path)
        nrec = None
        st = a.get("stats")
        if st:
            try:
                nrec = json.loads(st).get("numRecords")
            except (ValueError, TypeError):
                nrec = None
        if not isinstance(nrec, int):
            import pyarrow.parquet as _pq

            nrec = _pq.ParquetFile(fp).metadata.num_rows
        part = os.path.dirname(rel)
        cur[_file_id(rel)] = {
            "fileId": _file_id(rel),
            "path": rel,
            "partitionPath": part,
            "numWrites": nrec,
            "fileSizeInBytes": int(a.get("size") or 0),
        }
    prev = _fold_timeline(table.path)
    added = {fid: st for fid, st in cur.items() if fid not in prev}
    removed = sorted(fid for fid in prev if fid not in cur)
    p2w: dict[str, list[dict]] = {}
    for st in added.values():
        p2w.setdefault(st["partitionPath"], []).append(st)
    md: dict = {
        "partitionToWriteStats": p2w,
        "operationType": "delete" if removed and not added else (
            "upsert" if removed else "insert"
        ),
        "totalRecordsWritten": sum(s["numWrites"] for s in added.values()),
    }
    act = "commit"
    if removed:
        act = "replacecommit"
        p2r: dict[str, list[str]] = {}
        for fid in removed:
            p2r.setdefault(prev[fid]["partitionPath"], []).append(fid)
        md["partitionToReplaceFileIds"] = p2r
    instant = f"{version + 1:017d}"
    path = os.path.join(_hoodie_dir(table.path), f"{instant}.{act}")
    _write_atomic(path, json.dumps(md, sort_keys=True))
    return path


def read_hudi_live_files(table_path: str) -> list[dict]:
    """The live file groups per the TIMELINE ONLY (never `_delta_log`)
    — each with its absolute path resolved against the table root."""
    out = []
    for st in _fold_timeline(table_path).values():
        out.append(
            {**st, "abs_path": os.path.join(table_path, st["path"])}
        )
    return sorted(out, key=lambda s: s["fileId"])
