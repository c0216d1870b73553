"""Avro binary payload codec (SURVEY.md §2 connector envelope; the
`json_parse` sibling for the other wire format a Kafka estate carries).

The production path for Avro payloads on Spark is the JVM
``from_avro``/``to_avro`` pair from the external ``spark-avro`` module;
that jar is not shipped in this sandbox (pyspark's bundled avro-*.jars
are the Hadoop mapred deps, and ``pyspark.sql.avro.functions`` raises
AVRO_NOT_LOADED). So the codec here is a spec-faithful pure-Python
implementation of the Avro BINARY ENCODING for flat records (Apache
Avro specification, "Binary encoding" — public: zigzag varint
longs/ints, length-prefixed UTF-8 strings, little-endian IEEE-754
doubles, field values concatenated in schema order with no markers),
vectorized over Arrow batches via pandas UDFs — never row-at-a-time
Python over Spark rows. ``jvm_avro_available()`` probes for the real
module so a cluster that ships spark-avro can flip to ``from_avro``
without touching callers.

Spec byte-vector tests: tests/test_avro.py pins the published
examples (zigzag 0/-1/1/-2/2 -> 00/01/02/03/04, long 64 -> 80 01,
string "foo" -> 06 66 6f 6f) so the codec is verified against the
specification, not against itself.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

# A field spec is (name, avro_type); supported primitive types below.
_TYPES = ("long", "double", "string")


def jvm_avro_available(spark) -> bool:
    """True when the external spark-avro module is loaded (then the
    JVM from_avro/to_avro functions are the preferred path)."""
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


# --- binary primitives (Avro spec, "Binary encoding") -------------------


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(n: int, out: bytearray) -> None:
    """Variable-length zigzag: 7 bits per byte, MSB = continuation."""
    n = zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(acc), pos
        shift += 7


def encode_record(values: tuple, types: tuple[str, ...]) -> bytes:
    out = bytearray()
    for v, t in zip(values, types):
        if t == "long":
            write_long(int(v), out)
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "string":
            raw = str(v).encode("utf-8")
            write_long(len(raw), out)
            out += raw
        else:  # pragma: no cover - guarded by _TYPES
            raise ValueError(f"unsupported avro type {t}")
    return bytes(out)


def decode_record(buf: bytes, types: tuple[str, ...]) -> tuple:
    pos = 0
    vals = []
    for t in types:
        if t == "long":
            v, pos = read_long(buf, pos)
        elif t == "double":
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif t == "string":
            n, pos = read_long(buf, pos)
            v = buf[pos : pos + n].decode("utf-8")
            pos += n
        else:  # pragma: no cover
            raise ValueError(f"unsupported avro type {t}")
        vals.append(v)
    if pos != len(buf):
        raise ValueError(f"trailing {len(buf) - pos} bytes after record")
    return tuple(vals)


def avro_schema_json(name: str, fields: list[tuple[str, str]]) -> str:
    """The record schema document a registry would hold for this
    payload (what from_avro would take as jsonFormatSchema)."""
    import json

    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


# --- Spark-side vectorized wrappers -------------------------------------


def encode_partition(
    fields: list[tuple[str, str]],
) -> "callable":
    """mapInPandas function: (typed columns) -> single binary `payload`
    column. Pure per-batch Python over Arrow buffers — no shuffle, no
    driver involvement."""
    names = [n for n, _ in fields]
    types = tuple(t for _, t in fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [
                encode_record(row, types)
                for row in zip(*[pdf[n] for n in names])
            ]
            yield pd.DataFrame({"payload": payload})

    return fn


def decode_partition(
    fields: list[tuple[str, str]],
) -> "callable":
    """mapInPandas function: binary `payload` column -> typed columns
    in schema order. Raises on malformed/truncated payloads (the
    dead-letter split belongs to the caller, as in sink_deadletter)."""
    names = [n for n, _ in fields]
    types = tuple(t for _, t in fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_record(b, types) for b in pdf["payload"]]
            cols = list(zip(*decoded)) if decoded else [[] for _ in names]
            yield pd.DataFrame({n: pd.Series(c) for n, c in zip(names, cols)})

    return fn


def spark_type(avro_type: str) -> str:
    return {"long": "bigint", "double": "double", "string": "string"}[avro_type]


# --- Confluent Schema Registry wire envelope ----------------------------
#
# The public Confluent wire format every registry-aware Kafka client
# writes: byte 0 = magic 0x00, bytes 1-4 = schema id (big-endian
# int32), remainder = the Avro binary body. Decoding dispatches on the
# schema id — the schema-evolution path a real estate hits when v2
# producers add a field while v1 payloads are still in the topic.

MAGIC = 0x00


def wrap_confluent(body: bytes, schema_id: int) -> bytes:
    return bytes([MAGIC]) + struct.pack(">i", schema_id) + body


def unwrap_confluent(payload: bytes) -> tuple[int, bytes]:
    if not payload or payload[0] != MAGIC:
        raise ValueError(f"bad magic byte {payload[:1]!r}")
    (schema_id,) = struct.unpack_from(">i", payload, 1)
    return schema_id, payload[5:]


def encode_confluent_partition(
    registry: dict[int, list[tuple[str, str]]],
    pick_schema: str,
) -> "callable":
    """mapInPandas encoder: wraps each row's Avro body in the Confluent
    envelope. ``pick_schema`` names an int column selecting the schema
    id per row (the producer-version mix of a live topic); each
    schema's body carries exactly its own field list."""

    all_cols = sorted({n for fields in registry.values() for n, _ in fields})
    idx = {n: i for i, n in enumerate(all_cols)}
    plans = {
        sid: ([idx[n] for n, _ in fields], tuple(t for _, t in fields))
        for sid, fields in registry.items()
    }

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            sids = pdf[pick_schema]
            for sid, row in zip(sids, zip(*[pdf[n] for n in all_cols])):
                positions, types = plans[int(sid)]
                body = encode_record(tuple(row[p] for p in positions), types)
                out.append(wrap_confluent(body, int(sid)))
            yield pd.DataFrame({"payload": out})

    return fn


def decode_confluent_partition(
    registry: dict[int, list[tuple[str, str]]],
    out_fields: list[tuple[str, str]],
) -> "callable":
    """mapInPandas decoder with per-record schema dispatch: reads the
    envelope, looks the id up in the (broadcast-by-closure) registry
    snapshot, decodes with THAT schema, and projects onto the unified
    output schema — fields a writer version didn't carry come back
    null, Avro's standard reader-schema promotion for added fields."""
    names = [n for n, _ in out_fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                sid, body = unwrap_confluent(payload)
                fields = registry[sid]
                vals = decode_record(body, tuple(t for _, t in fields))
                rec = dict(zip([n for n, _ in fields], vals))
                rows.append(tuple(rec.get(n) for n in names))
            cols = list(zip(*rows)) if rows else [[] for _ in names]
            yield pd.DataFrame({n: pd.Series(c) for n, c in zip(names, cols)})

    return fn


# --- schema-resolution compatibility (registry gate) --------------------

# Writer->reader type promotions, public Avro spec "Schema Resolution":
# the reader may widen numerics and flip string/bytes, nothing else.
_PROMOTIONS = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}

_NO_DEFAULT = object()


class SchemaCompatError(ValueError):
    """Raised by require_compat when a proposed writer schema violates
    the registry's compatibility mode — the reject path a
    registry-integrated connector takes before accepting the schema."""


def _norm_fields(fields) -> dict:
    """{name: (type, default)} from (name, type) or (name, type,
    default) field tuples."""
    out = {}
    for f in fields:
        out[f[0]] = (f[1], f[2] if len(f) > 2 else _NO_DEFAULT)
    return out


def _readable(writer_t: str, reader_t: str) -> bool:
    return writer_t == reader_t or (writer_t, reader_t) in _PROMOTIONS


def compat_report(old_fields, new_fields) -> list[tuple]:
    """Field-level compatibility classification for an old->new schema
    transition, per the Avro spec's Schema Resolution rules:

      - reader field absent from the writer schema: resolvable only if
        the READER declares a default, else an error;
      - writer field absent from the reader schema: silently ignored;
      - field present in both: the writer type must equal or promote
        to the reader type (_PROMOTIONS).

    BACKWARD = old-written data read by the NEW schema (reader=new);
    FORWARD  = new-written data read by the OLD schema (reader=old) —
    the Confluent registry's mode vocabulary. Returns one tuple per
    field, sorted by name:
    (field, change, has_default, breaks_backward, breaks_forward)
    where change in {added, removed, type_changed, unchanged} and
    has_default reports the default relevant to resolving the change
    (the reader-side default for added, the old schema's for removed,
    the new schema's for type changes)."""
    old, new = _norm_fields(old_fields), _norm_fields(new_fields)
    rows = []
    for name in sorted(set(old) | set(new)):
        if name in old and name not in new:
            has_default = old[name][1] is not _NO_DEFAULT
            # forward: reader=old expects the field in new-written data
            rows.append((name, "removed", has_default, False, not has_default))
        elif name in new and name not in old:
            has_default = new[name][1] is not _NO_DEFAULT
            # backward: reader=new expects the field in old-written data
            rows.append((name, "added", has_default, not has_default, False))
        else:
            ot, nt = old[name][0], new[name][0]
            has_default = new[name][1] is not _NO_DEFAULT
            if ot == nt:
                rows.append((name, "unchanged", has_default, False, False))
            else:
                rows.append(
                    (
                        name,
                        "type_changed",
                        has_default,
                        not _readable(ot, nt),  # backward: writer=old, reader=new
                        not _readable(nt, ot),  # forward: writer=new, reader=old
                    )
                )
    return rows


def require_compat(old_fields, new_fields, mode: str = "BACKWARD") -> list[tuple]:
    """Gate a proposed schema change: raises SchemaCompatError listing
    the violating fields when the transition breaks ``mode``
    (BACKWARD / FORWARD / FULL), else returns the compat_report. An
    unknown mode raises ValueError — a validation gate must never
    fail open on a typo'd or unsupported mode string."""
    if mode not in ("BACKWARD", "FORWARD", "FULL"):
        raise ValueError(f"unknown compatibility mode: {mode!r}")
    rows = compat_report(old_fields, new_fields)
    check_b = mode in ("BACKWARD", "FULL")
    check_f = mode in ("FORWARD", "FULL")
    bad = [r for r in rows if (check_b and r[3]) or (check_f and r[4])]
    if bad:
        raise SchemaCompatError(
            f"{mode} compatibility violated by: "
            + ", ".join(f"{r[0]} ({r[1]}, default={r[2]})" for r in bad)
        )
    return rows
