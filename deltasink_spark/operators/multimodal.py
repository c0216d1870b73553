"""Multimodal column support (SURVEY.md §2.11 `multimodal_column`).

Design: media payloads are opaque `binary` columns bundled with typed
metadata in a struct — `struct<payload: binary, mime: string,
meta: struct<...>>`. Everything metadata-driven (routing, filtering,
batching) is Catalyst-native: predicates on struct fields push down to
parquet without touching payload bytes.

Decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. Codecs are REAL WHEN AVAILABLE: each stage
import-gates PIL (images) / av (video) and tries the real codec per
payload, falling back to a deterministic structural fake when the
library is absent OR the payload isn't decodable media. The fixture
payloads are synthetic random bytes — never decodable — so every
registered oracle runs the deterministic path in every environment,
while a codec-capable image on real media gets real decode through the
identical Arrow plumbing (schema, batch iteration, partition layout).
"""

from __future__ import annotations

import io as _io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # real image codec when the environment has it
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - absent in this sandbox
    _PIL_Image = None

try:  # real video demuxer when the environment has it
    import av as _av  # type: ignore
except ImportError:  # pragma: no cover - absent in this sandbox
    _av = None


def _looks_like_image(p: bytes) -> bool:
    """Strong magic-byte gate before attempting a real decode. A bare
    try/except PIL.open would make oracle determinism PROBABILISTIC:
    formats with weak magics (BMP's 2-byte 'BM' ~ 2^-16 per random
    payload) could parse on synthetic fixture bytes in a PIL-equipped
    environment only, hashing differently across environments. Every
    accepted signature is strong: PNG/GIF/WEBP pin >= 6 fixed bytes;
    JPEG pins 3 fixed bytes plus the full marker-class range
    0xC0-0xFE for the 4th (any JPEG's first segment marker — SOFn,
    APPn, COM, DQT... — lands there; ~2^-26 false-positive rate on
    random bytes); TIFF pins its full 4-byte header (II*\\0 / MM\\0*).
    Fixture payloads therefore deterministically take the
    structural-fake path everywhere. The accepted-format whitelist is
    exactly PNG/JPEG/GIF/WEBP/TIFF; weak-magic formats (BMP's 2-byte
    'BM') intentionally take the structural-fake path even where PIL
    could parse them — determinism over coverage."""
    return (
        p.startswith(b"\x89PNG\r\n\x1a\n")
        or (p.startswith(b"\xff\xd8\xff") and len(p) > 3 and 0xC0 <= p[3] <= 0xFE)
        or p.startswith(b"GIF87a")
        or p.startswith(b"GIF89a")
        or (p.startswith(b"RIFF") and p[8:12] == b"WEBP")
        or p.startswith(b"II*\x00")
        or p.startswith(b"MM\x00*")
    )


def _looks_like_video(p: bytes) -> bool:
    """Same strong-magic policy as _looks_like_image for containers:
    ISO-BMFF (ftyp at offset 4), Matroska/WebM EBML, RIFF/AVI."""
    return (
        p[4:8] == b"ftyp"
        or p.startswith(b"\x1aE\xdf\xa3")
        or (p.startswith(b"RIFF") and p[8:12] == b"AVI ")
    )

MEDIA_SCHEMA = "struct<payload:binary,mime:string,meta:struct<source:string,n_bytes:bigint>>"

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, ok boolean"
)


def pack_media(payload: Column, mime: Column, source: Column) -> Column:
    """Bundle payload bytes + mime + metadata into one media struct."""
    return F.struct(
        payload.alias("payload"),
        mime.alias("mime"),
        F.struct(source.alias("source"), F.length(payload).cast("bigint").alias("n_bytes")).alias(
            "meta"
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, bool]:
    """Decode a payload's (width, height, ok). Real path first: when
    PIL is importable AND the bytes are an actual image, the true
    dimensions are returned. Otherwise (library absent, or payload not
    decodable media — e.g. the synthetic fixture bytes) a deterministic
    structural fake derived from payload length keeps the pipeline
    executable end-to-end and the oracles environment-independent."""
    if payload is None:
        return (0, 0, False)
    if _PIL_Image is not None and _looks_like_image(payload):
        try:
            with _PIL_Image.open(_io.BytesIO(payload)) as im:
                return (im.width, im.height, True)
        except Exception:
            pass  # truncated/corrupt real image -> structural fake below
    n = len(payload)
    return (64 + n % 256, 64 + (n // 256) % 256, True)


RESIZED_SCHEMA = (
    "doc_id bigint, mime string, payload binary, width int, height int, n_bytes bigint"
)

FEATURES_SCHEMA = "doc_id bigint, mime string, features array<float>, n_bytes bigint"

FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame_payload binary, pts_ms bigint"


def _resize_payload(p: bytes | None, w: int, h: int) -> bytes:
    """Real PIL decode->resize->re-encode when possible; deterministic
    truncation to w*h bytes otherwise (library absent or payload not
    decodable media), so fixture oracles are environment-independent."""
    if p is None:
        return b""
    if _PIL_Image is not None and _looks_like_image(p):
        try:
            with _PIL_Image.open(_io.BytesIO(p)) as im:
                fmt = im.format or "PNG"
                buf = _io.BytesIO()
                im.resize((w, h)).save(buf, format=fmt)
                return buf.getvalue()
        except Exception:
            pass  # not real image bytes -> structural fallback below
    return bytes(p[: w * h])


def resize_media(df: DataFrame, media_col: str, id_col: str, w: int = 64, h: int = 64) -> DataFrame:
    """Arrow-batched resize stage: payload -> resized payload + dims.
    Real codec when available for the strong-magic whitelist
    PNG/JPEG/GIF/WEBP/TIFF (see _looks_like_image; other formats take
    the deterministic structural-fake path); the bytes-in/bytes-out
    plumbing (binary columns through Arrow batches) is identical on
    both paths and exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_resize_payload(p, w, h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "mime": pdf["mime"],
                    "payload": out,
                    "width": w,
                    "height": h,
                    "n_bytes": [len(o) for o in out],
                }
            )

    flat = df.select(
        F.col(id_col).alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.mime").alias("mime"),
    )
    return flat.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features(df: DataFrame, media_col: str, id_col: str, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction: payload -> fixed-dim float
    vector via a histogram projection. Real codec when available
    (PNG/JPEG/GIF/WEBP/TIFF whitelist, see _looks_like_image): a
    decodable image contributes its LUMINANCE PIXELS to the histogram
    (a real, if simple, visual feature — swap in an ONNX/torch encoder
    behind the same batch signature for production); non-decodable
    payloads (the fixtures) use raw bytes, keeping oracles
    environment-independent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def values(p: bytes) -> "np.ndarray":
            if _PIL_Image is not None and _looks_like_image(p):
                try:
                    with _PIL_Image.open(_io.BytesIO(p)) as im:
                        return np.asarray(im.convert("L"), dtype=np.uint8).ravel()
                except Exception:
                    pass  # not real image bytes -> raw-byte fallback
            return np.frombuffer(p, dtype=np.uint8)

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    feats.append([0.0] * dim)
                    continue
                arr = values(p)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                feats.append((hist / max(len(arr), 1)).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "mime": pdf["mime"],
                    "features": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    flat = df.select(
        F.col(id_col).alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.mime").alias("mime"),
    )
    return flat.mapInPandas(run, schema=FEATURES_SCHEMA)


def _demux_frames(p: bytes, every_n: int, frame_bytes: int) -> list[tuple[int, bytes, int]]:
    """(frame_no, frame_payload, pts_ms) for every Nth frame. Real av
    demux when the payload is an actual container; fixed-size chunking
    with synthetic 25fps timestamps otherwise (library absent or
    payload not decodable — the fixtures), keeping oracles
    environment-independent."""
    if _av is not None and _looks_like_video(p):
        try:
            out = []
            with _av.open(_io.BytesIO(p)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else 0.0
                for fno, frame in enumerate(container.decode(stream)):
                    if fno % every_n:
                        continue
                    pts_ms = int((frame.pts or 0) * tb * 1000) if tb else fno * 40
                    out.append((fno, bytes(frame.planes[0])[:frame_bytes], pts_ms))
            if out:
                return out
        except Exception:
            pass  # not a real container -> chunk fallback below
    n_frames = max(len(p) // frame_bytes, 1)
    return [
        (fno, bytes(p[fno * frame_bytes : (fno + 1) * frame_bytes]), fno * 40)  # 25 fps
        for fno in range(0, n_frames, every_n)
    ]


def frame_sample(
    df: DataFrame, media_col: str, id_col: str, every_n: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """One row in -> many frame rows out (the video path's table
    function shape), every Nth frame per _demux_frames (real av demux
    when possible). Row explosion happens INSIDE the Arrow batch, so
    output batches can be larger than input batches — the shape that
    matters for memory sizing at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames, pts = [], [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                if p is None:
                    continue
                for fno, payload, pts_ms in _demux_frames(p, every_n, frame_bytes):
                    ids.append(i)
                    nos.append(fno)
                    frames.append(payload)
                    pts.append(pts_ms)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_payload": frames, "pts_ms": pts}
            )

    flat = df.select(
        F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_media(df: DataFrame, media_col: str, id_col: str) -> DataFrame:
    """Arrow-batched decode stage: media struct -> typed features.
    Real codec engages only for the strong-magic whitelist
    PNG/JPEG/GIF/WEBP/TIFF (see _looks_like_image); everything else
    takes the deterministic structural-fake path. Payload bytes stay
    inside the executor; only small features exit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "ok": [d[2] for d in decoded],
                }
            )

    flat = df.select(
        F.col(id_col).alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.mime").alias("mime"),
        F.col(f"{media_col}.meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(run, schema=DECODED_SCHEMA)
