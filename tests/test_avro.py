"""Avro binary codec tests: the codec is verified against the PUBLISHED
Apache Avro specification byte examples (not against itself), plus a
round-trip property sweep and the end-to-end op check."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from deltasink_spark.operators.avro import (
    avro_schema_json,
    decode_record,
    encode_record,
    read_long,
    write_long,
    zigzag_decode,
    zigzag_encode,
)

# Published zigzag examples from the Avro spec ("Binary encoding"):
# value 0 -> 0x00, -1 -> 0x01, 1 -> 0x02, -2 -> 0x03, 2 -> 0x04.
SPEC_ZIGZAG = [(0, 0x00), (-1, 0x01), (1, 0x02), (-2, 0x03), (2, 0x04)]


def test_spec_zigzag_examples():
    for value, encoded in SPEC_ZIGZAG:
        assert zigzag_encode(value) == encoded
        assert zigzag_decode(encoded) == value
        out = bytearray()
        write_long(value, out)
        assert bytes(out) == bytes([encoded])


def test_spec_varint_64():
    # spec example: 64 -> bytes 80 01
    out = bytearray()
    write_long(64, out)
    assert bytes(out) == b"\x80\x01"
    assert read_long(b"\x80\x01", 0) == (64, 2)


def test_spec_string_foo():
    # spec example: string "foo" -> 06 66 6f 6f (len 3 zigzag + utf8)
    assert encode_record(("foo",), ("string",)) == b"\x06foo"
    assert decode_record(b"\x06foo", ("string",)) == ("foo",)


def test_double_is_little_endian_ieee754():
    payload = encode_record((1.5,), ("double",))
    assert payload == struct.pack("<d", 1.5)
    assert decode_record(payload, ("double",)) == (1.5,)


def test_record_concatenates_fields_in_order():
    payload = encode_record((1, "foo", 2.0), ("long", "string", "double"))
    assert payload == b"\x02" + b"\x06foo" + struct.pack("<d", 2.0)


def test_trailing_bytes_rejected():
    import pytest

    with pytest.raises(ValueError, match="trailing"):
        decode_record(b"\x02\x00", ("long",))


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
)
def test_round_trip_property(n, s, d):
    types = ("long", "string", "double")
    assert decode_record(encode_record((n, s, d), types), types) == (n, s, d)


def test_schema_json_is_valid_avro_record():
    import json

    doc = json.loads(
        avro_schema_json("events", [("event_id", "long"), ("event_type", "string")])
    )
    assert doc["type"] == "record"
    assert [f["name"] for f in doc["fields"]] == ["event_id", "event_type"]
    assert [f["type"] for f in doc["fields"]] == ["long", "string"]


def test_avro_parse_end_to_end(spark, sf_small):
    from deltasink_spark import registry

    registry.load_all()
    out = registry.QUERIES["avro_parse"](spark, sf_small)
    assert [f.name for f in out.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "value",
    ]
    src = spark.read.parquet(f"{sf_small}/events.parquet")
    assert out.count() == src.count()
    # spot-check exact reconstruction on a deterministic slice
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in out.filter("event_id < 20").collect()}
    want = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in src.filter("event_id < 20").collect()
    }
    assert got == want


def test_schema_compat_gate_rejects_and_accepts():
    """require_compat must REJECT the default-less added field under
    BACKWARD (and FULL), accept it under FORWARD, and accept the
    defaulted variant everywhere — the registry gate's reject path."""
    import pytest

    from deltasink_spark.operators.avro import (
        SchemaCompatError,
        compat_report,
        require_compat,
    )

    v1 = [("event_id", "long"), ("user_id", "long"), ("value", "double")]
    v2 = v1[:2] + [("event_type", "string"), ("value", "double")]
    v2d = v1[:2] + [("event_type", "string", ""), ("value", "double")]

    with pytest.raises(SchemaCompatError, match="event_type"):
        require_compat(v1, v2, "BACKWARD")
    with pytest.raises(SchemaCompatError):
        require_compat(v1, v2, "FULL")
    require_compat(v1, v2, "FORWARD")          # old reader ignores the add
    require_compat(v1, v2d, "FULL")            # defaulted add: compatible
    # numeric promotion is one-directional: long->double only
    v2l = [(n, "long" if n == "value" else t) for n, t in v2]
    with pytest.raises(SchemaCompatError, match="value"):
        require_compat(v2, v2l, "BACKWARD")
    require_compat(v2, v2l, "FORWARD")
    # unchanged fields never appear in a verdict
    assert all(
        r[1] == "unchanged" for r in compat_report(v1, v1)
    )
