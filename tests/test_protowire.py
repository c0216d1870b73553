"""Protobuf wire codec tests: verified against the PUBLISHED encoding
examples from the Protocol Buffers documentation, plus round-trip
properties and the end-to-end ops (protobuf_parse,
avro_confluent_envelope)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from deltasink_spark.operators.protowire import (
    decode_message,
    encode_message,
    read_varint,
    write_varint,
)

FIELDS = [("a", 1, "int64"), ("b", 2, "string"), ("c", 3, "double")]


def test_spec_varint_150():
    # The canonical protobuf docs example: field 1 (varint) = 150
    # encodes to 08 96 01.
    assert encode_message({"a": 150}, [("a", 1, "int64")]) == b"\x08\x96\x01"
    assert decode_message(b"\x08\x96\x01", [("a", 1, "int64")]) == {"a": 150}


def test_spec_string_testing():
    # docs example: field 2 (string) = "testing" -> 12 07 74 65 73 74 69 6e 67
    enc = encode_message({"b": "testing"}, [("b", 2, "string")])
    assert enc == b"\x12\x07testing"
    assert decode_message(enc, [("b", 2, "string")]) == {"b": "testing"}


def test_varint_continuation_bytes():
    out = bytearray()
    write_varint(300, out)  # docs example: AC 02
    assert bytes(out) == b"\xac\x02"
    assert read_varint(b"\xac\x02", 0) == (300, 2)


def test_proto3_zero_omitted_and_defaulted():
    enc = encode_message({"a": 0, "b": "", "c": 0.0}, FIELDS)
    assert enc == b""  # all defaults: nothing on the wire
    assert decode_message(enc, FIELDS) == {"a": 0, "b": "", "c": 0.0}


def test_negative_int64_is_ten_byte_twos_complement():
    enc = encode_message({"a": -1}, [("a", 1, "int64")])
    # key byte + ten varint bytes of 2^64-1
    assert len(enc) == 11
    assert decode_message(enc, [("a", 1, "int64")]) == {"a": -1}


def test_double_field_little_endian():
    enc = encode_message({"c": 1.5}, [("c", 3, "double")])
    assert enc == b"\x19" + struct.pack("<d", 1.5)  # key = 3<<3 | 1


def test_unknown_fields_skipped():
    enc = encode_message({"a": 7, "b": "x"}, [("a", 1, "int64"), ("b", 2, "string")])
    # decode with a reader schema that only knows field 2
    assert decode_message(enc, [("b", 2, "string")]) == {"b": "x"}


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
)
def test_round_trip_property(n, s, d):
    assert decode_message(encode_message({"a": n, "b": s, "c": d}, FIELDS), FIELDS) == {
        "a": n,
        "b": s,
        "c": d,
    }


def test_confluent_envelope_wrap_unwrap():
    from deltasink_spark.operators.avro import unwrap_confluent, wrap_confluent

    body = b"\x06foo"
    payload = wrap_confluent(body, 42)
    assert payload[:5] == b"\x00\x00\x00\x00\x2a"
    assert unwrap_confluent(payload) == (42, body)

    import pytest

    with pytest.raises(ValueError, match="magic"):
        unwrap_confluent(b"\x01rest")


def test_protobuf_parse_end_to_end(spark, sf_small):
    from deltasink_spark import registry

    registry.load_all()
    out = registry.QUERIES["protobuf_parse"](spark, sf_small)
    src = spark.read.parquet(f"{sf_small}/events.parquet")
    assert out.count() == src.count()
    got = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in out.filter("event_id < 20").collect()
    }
    want = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in src.filter("event_id < 20").collect()
    }
    assert got == want


def test_confluent_envelope_end_to_end_schema_mix(spark, sf_small):
    from deltasink_spark import registry

    registry.load_all()
    out = registry.QUERIES["avro_confluent_envelope"](spark, sf_small)
    rows = {r.event_id: r for r in out.filter("event_id < 20").collect()}
    src = {
        r.event_id: r
        for r in spark.read.parquet(f"{sf_small}/events.parquet")
        .filter("event_id < 20")
        .collect()
    }
    for eid, r in rows.items():
        assert r.user_id == src[eid].user_id
        assert r.value == src[eid].value
        if eid % 2 == 1:  # v2 payload carries event_type
            assert r.event_type == src[eid].event_type
        else:  # v1 payload: field absent -> null under the reader schema
            assert r.event_type is None


def test_unknown_fixed32_field_is_skipped():
    """Schema evolution: a payload carrying an unknown fixed32 (wire
    type 5 — e.g. a v2 producer's added `float` field) must decode the
    known fields and SKIP the unknown one, not raise."""
    fields = [("a", 1, "int64")]
    payload = encode_message({"a": 7}, fields)
    # append unknown field number 9, wire type 5, 4 payload bytes
    unknown = bytes([9 << 3 | 5]) + struct.pack("<f", 1.5)
    out = decode_message(payload + unknown, fields)
    assert out == {"a": 7}
