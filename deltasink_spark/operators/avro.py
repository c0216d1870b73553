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
