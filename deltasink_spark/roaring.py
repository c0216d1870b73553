"""Roaring-bitmap serialization for Delta DELETION VECTORS.

Reference parity: the reference streams DeltaLake tables
(/root/reference/README.md:2); modern Delta DML uses merge-on-read
deletion vectors (protocol table feature `deletionVectors`,
minReaderVersion 3) instead of copy-on-write rewrites. This module
implements the PUBLIC byte formats a DV round-trips through, from the
published specs alone:

- 32-bit roaring bitmaps, the "portable" interchange format
  (RoaringFormatSpec: SERIAL_COOKIE_NO_RUNCONTAINER = 12346 — cookie,
  container count, descriptive header of (key, cardinality-1) uint16
  pairs, offset header, then array containers (<= 4096 values, sorted
  uint16 LE) or bitset containers (8 KiB); reads additionally accept
  SERIAL_COOKIE = 12347 streams with run containers, which foreign
  writers like delta-spark emit after runOptimize());
- the 64-bit RoaringBitmapArray in Delta's "portable" flavor
  (PROTOCOL.md: int32 LE magic 1681511377, int64 LE number of 32-bit
  bitmaps, then per bitmap an int32 LE key = high 32 bits followed by
  its 32-bit portable serialization; keys ascending);
- the on-disk DV FILE layout (PROTOCOL.md "Deletion Vector Files"):
  a 1-byte format version (1), then per stored DV a 4-byte
  BIG-ENDIAN size, the RoaringBitmapArray bytes, and a 4-byte
  big-endian CRC-32 of those bytes; the descriptor's `offset` points
  at the size field;
- Z85 encoding of the DV file's UUID for `storageType = "u"`
  descriptors (pathOrInlineDv = z85(16-byte uuid), the file living at
  `deletion_vector_<canonical-uuid>.bin`).

A DV is KBs for millions of deleted positions (the point of the
format), so serialization cost never scales with table size; DML
writers call these serializers EXECUTOR-SIDE (one applyInPandas group
per affected file — delta_log.py::delete_where_dv), so position lists
never funnel through the driver either.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347  # foreign writers with run containers
_NO_OFFSET_THRESHOLD = 4  # run-cookie streams omit offsets below this
# Container-type boundary, per RoaringFormatSpec and the Java/CRoaring
# implementations: cardinality <= 4096 is an ARRAY container (2 bytes
# per value, so exactly 8192 bytes at 4096 — the break-even point);
# only cardinality > 4096 uses the 8 KiB bitset. `<` here instead of
# `<=` would make an external reader parse garbage at exactly 4096.
_ARRAY_MAX = 4096
_MAGIC = 1681511377  # Delta RoaringBitmapArray portable magic


# --- 32-bit portable roaring -------------------------------------------------


def serialize_roaring32(values: list[int]) -> bytes:
    """Portable serialization of a 32-bit roaring bitmap holding
    ``values`` (need not be sorted; duplicates collapse). Always emits
    the no-run-container layout (cookie 12346) — run encoding is an
    optional optimization, never required for interchange."""
    containers: dict[int, set[int]] = {}
    for v in values:
        if not (0 <= v <= 0xFFFFFFFF):
            raise ValueError(f"value {v} outside uint32")
        containers.setdefault(v >> 16, set()).add(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: byte position of each container from stream start
    pos = 8 + 4 * n + 4 * n
    for k in keys:
        out += struct.pack("<I", pos)
        card = len(containers[k])
        pos += 2 * card if card <= _ARRAY_MAX else 8192
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= _ARRAY_MAX:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bits
    return bytes(out)


def deserialize_roaring32(buf: bytes, base: int = 0) -> tuple[set[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``buf[base:]``.
    Returns (values, bytes_consumed). Accepts BOTH portable cookies:
    12346 (no run containers — what this module's writer emits) and
    12347 (run containers present — what delta-spark's RoaringBitmapArray
    routinely writes after runOptimize()), so a DV written by a foreign
    Delta client folds correctly. Per RoaringFormatSpec: the run cookie
    packs (containers - 1) in its upper 16 bits, is followed by a
    run-container indicator bitset, and omits the offset header when
    there are fewer than 4 containers (NO_OFFSET_THRESHOLD)."""
    (cookie_full,) = struct.unpack_from("<I", buf, base)
    cookie = cookie_full & 0xFFFF
    run_flags = b""
    if cookie == _SERIAL_COOKIE_RUN:
        n = (cookie_full >> 16) + 1
        p = base + 4
        nb = (n + 7) // 8
        run_flags = buf[p : p + nb]
        p += nb
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, base + 4)
        p = base + 8
        has_offsets = True
    else:
        raise ValueError(f"unsupported roaring cookie {cookie}")

    def _is_run(i: int) -> bool:
        return bool(run_flags and (run_flags[i >> 3] >> (i & 7)) & 1)

    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, p)
        keys.append(k)
        cards.append(cm1 + 1)
        p += 4
    offsets: list[int] | None = None
    if has_offsets:
        offsets = list(struct.unpack_from(f"<{n}I", buf, p))
        p += 4 * n
    out: set[int] = set()
    end = p
    cp = p  # sequential cursor for offset-less streams
    for i, (k, card) in enumerate(zip(keys, cards)):
        if offsets is not None:
            cp = base + offsets[i]
        if _is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, cp)
            cp += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, cp)
                cp += 4
                out.update((k << 16) | v for v in range(start, start + len_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, cp)
            out.update((k << 16) | v for v in vals)
            cp += 2 * card
        else:
            bits = buf[cp : cp + 8192]
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    out.add((k << 16) | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
            cp += 8192
        end = max(end, cp)
    return out, end - base


# --- Delta 64-bit RoaringBitmapArray ----------------------------------------


def serialize_rbm_array(positions: list[int]) -> bytes:
    """Delta's portable RoaringBitmapArray: 64-bit positions split
    into (high-32 key -> 32-bit roaring bitmap), keys ascending."""
    by_key: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError(f"negative position {p}")
        by_key.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _MAGIC, len(by_key)))
    for k in sorted(by_key):
        out += struct.pack("<i", k)
        out += serialize_roaring32(by_key[k])
    return bytes(out)


def deserialize_rbm_array(buf: bytes) -> set[int]:
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    p = 12
    out: set[int] = set()
    for _ in range(n):
        (key,) = struct.unpack_from("<i", buf, p)
        p += 4
        vals, used = deserialize_roaring32(buf, p)
        out.update((key << 32) | v for v in vals)
        p += used
    return out


# --- DV file layout + descriptor paths ---------------------------------------


def write_dv_file(path: str, positions: list[int]) -> dict:
    """Write ONE deletion vector into a fresh DV file at ``path``
    (format version byte, BE size, data, BE crc32). Returns the
    descriptor fields: {"offset", "sizeInBytes", "cardinality"}."""
    data = serialize_rbm_array(positions)
    with open(path, "wb") as fh:
        fh.write(b"\x01")  # format version
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data)))
    return {
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }


def read_dv_file(path: str, offset: int, size_in_bytes: int) -> set[int]:
    """Read the DV at ``offset`` (which points at its 4-byte BE size
    field), verifying size and CRC-32 — the delta-spark read path."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        (size,) = struct.unpack(">i", fh.read(4))
        if size != size_in_bytes:
            raise ValueError(
                f"DV size mismatch: descriptor says {size_in_bytes}, "
                f"file says {size}"
            )
        data = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) != crc:
        raise ValueError("DV checksum mismatch")
    return deserialize_rbm_array(data)


_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(raw: bytes) -> str:
    if len(raw) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(raw), 4):
        n = int.from_bytes(raw[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[n % 85])
            n //= 85
        out += reversed(chunk)
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            n = n * 85 + _Z85_INV[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


def dv_relative_path(path_or_inline: str) -> str:
    """Resolve a storageType="u" pathOrInlineDv to the DV file's
    table-relative path: [<prefix>/]z85(uuid) -> the spec's
    `[<prefix>/]deletion_vector_<canonical-uuid>.bin`. The z85-encoded
    uuid is always the LAST 20 characters — it must be sliced by
    position, never split on '/', because '/' is itself a Z85 alphabet
    character and can legally appear INSIDE the encoding."""
    if len(path_or_inline) < 20:
        raise ValueError(f"pathOrInlineDv too short: {path_or_inline!r}")
    enc = path_or_inline[-20:]
    prefix = path_or_inline[:-20].rstrip("/")
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def new_dv_descriptor_path() -> tuple[str, str]:
    """Mint a fresh DV file identity: (pathOrInlineDv for the
    descriptor, table-relative file path)."""
    u = _uuid.uuid4()
    return z85_encode(u.bytes), f"deletion_vector_{u}.bin"
