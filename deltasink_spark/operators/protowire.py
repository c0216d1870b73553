"""Protocol Buffers wire-format codec for flat messages (SURVEY.md §2
connector envelope — the second non-JSON Kafka payload format next to
operators/avro.py).

Spark's JVM path for this is ``from_protobuf`` from the external
spark-protobuf module (plus a compiled descriptor set); neither the
module jar nor a protobuf Python runtime ships in this sandbox, so the
codec implements the PUBLIC protobuf wire encoding directly (Protocol
Buffers encoding documentation: each field is a varint key
``(field_number << 3) | wire_type`` followed by the value; wire type 0
= base-128 varint, 1 = little-endian 64-bit, 2 = length-delimited) for
flat messages with int64 / double / string fields, vectorized over
Arrow batches via mapInPandas.

Spec byte-vector tests: tests/test_protowire.py pins the published
example (a message with field 1 = varint 150 encodes to ``08 96 01``)
so the codec is checked against the documentation, not itself.

Proto3 presence semantics are followed: zero-valued scalar fields are
omitted on the wire and decode back to the type's default (0, 0.0,
""); int64 uses the plain (not zigzag) varint with 10-byte two's-
complement negatives, exactly as `int64` fields do.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

# field spec: (name, field_number, proto_type); proto_type in
# {"int64", "double", "string"}.

_WIRE = {"int64": 0, "double": 1, "string": 2}


def write_varint(n: int, out: bytearray) -> None:
    """Base-128 varint of a NON-NEGATIVE value (callers map negative
    int64 to two's complement first, per the spec)."""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def encode_message(values: dict, fields: list[tuple[str, int, str]]) -> bytes:
    out = bytearray()
    for name, num, ptype in fields:
        v = values[name]
        if ptype == "int64":
            v = int(v)
            if v == 0:  # proto3: default values are omitted
                continue
            write_varint(num << 3 | 0, out)
            write_varint(v & 0xFFFFFFFFFFFFFFFF, out)  # two's complement
        elif ptype == "double":
            v = float(v)
            if v == 0.0:
                continue
            write_varint(num << 3 | 1, out)
            out += struct.pack("<d", v)
        elif ptype == "string":
            raw = str(v).encode("utf-8")
            if not raw:
                continue
            write_varint(num << 3 | 2, out)
            write_varint(len(raw), out)
            out += raw
        else:  # pragma: no cover
            raise ValueError(f"unsupported proto type {ptype}")
    return bytes(out)


def decode_message(buf: bytes, fields: list[tuple[str, int, str]]) -> dict:
    by_num = {num: (name, ptype) for name, num, ptype in fields}
    # proto3 defaults for absent fields
    out = {
        name: (0 if t == "int64" else 0.0 if t == "double" else "")
        for name, _, t in fields
    }
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        num, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = read_varint(buf, pos)
        elif wire == 1:
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif wire == 2:
            n, pos = read_varint(buf, pos)
            v = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            # fixed32 — only reachable for UNKNOWN fields (no declared
            # type maps to it), but an unknown-field-tolerant reader
            # must still skip over its 4 payload bytes, not die: the
            # whole point of proto schema evolution is that a v2
            # producer may add e.g. a `float` field a v1 reader never
            # heard of.
            (v,) = struct.unpack_from("<f", buf, pos)
            pos += 4
        else:
            # wire types 3/4 (groups) are deprecated-since-proto2
            # nesting markers; skipping them requires recursive
            # bracket matching no modern producer emits.
            raise ValueError(f"unsupported wire type {wire}")
        if num not in by_num:
            continue  # unknown field: skipped, per spec
        name, ptype = by_num[num]
        if ptype == "int64":
            v = int(v)
            if v >= 1 << 63:  # two's complement back to signed
                v -= 1 << 64
            out[name] = v
        elif ptype == "double":
            out[name] = float(v)
        else:
            out[name] = v.decode("utf-8")
    return out


# --- Spark-side vectorized wrappers -------------------------------------


def encode_partition(fields: list[tuple[str, int, str]]) -> "callable":
    names = [n for n, _, _ in fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [
                encode_message(dict(zip(names, row)), fields)
                for row in zip(*[pdf[n] for n in names])
            ]
            yield pd.DataFrame({"payload": payload})

    return fn


def decode_partition(fields: list[tuple[str, int, str]]) -> "callable":
    names = [n for n, _, _ in fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_message(b, fields) for b in pdf["payload"]]
            yield pd.DataFrame(
                {n: pd.Series([d[n] for d in decoded]) for n in names}
            )

    return fn


def spark_type(ptype: str) -> str:
    return {"int64": "bigint", "double": "double", "string": "string"}[ptype]
