"""Multimodal column support (SURVEY.md §2.11 `multimodal_column`).

Design: media payloads are opaque `binary` columns bundled with typed
metadata in a struct — `struct<payload: binary, mime: string,
meta: struct<...>>`. Everything metadata-driven (routing, filtering,
batching) is Catalyst-native: predicates on struct fields push down to
parquet without touching payload bytes.

Decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The image/audio codecs are NOT in this
environment, so `decode_payload` ships a deterministic structural fake
(documented below) behind the same signature a real codec plugs into;
the Spark-side plumbing — schema, batch iteration, partition layout —
is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    """STUB codec: a real build imports PIL/av here. NotImplementedError
    is deliberately NOT raised — instead a deterministic structural fake
    (dimensions derived from payload length) keeps the full pipeline
    executable end-to-end in codec-less environments."""
    if payload is None:
        return (0, 0, False)
    n = len(payload)
    return (64 + n % 256, 64 + (n // 256) % 256, True)


RESIZED_SCHEMA = (
    "doc_id bigint, mime string, payload binary, width int, height int, n_bytes bigint"
)

FEATURES_SCHEMA = "doc_id bigint, mime string, features array<float>, n_bytes bigint"

FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame_payload binary, pts_ms bigint"


def resize_media(df: DataFrame, media_col: str, id_col: str, w: int = 64, h: int = 64) -> DataFrame:
    """Arrow-batched resize stage: payload -> resized payload + dims.
    STUB codec: a real build decodes with PIL and re-encodes; here the
    'resized' payload is a deterministic truncation to w*h bytes so the
    bytes-in/bytes-out plumbing (binary columns through Arrow batches)
    is exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(p[: w * h]) if p is not None else b"" for p in pdf["payload"]]
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
    vector. STUB model: a real build runs an ONNX/torch encoder per
    batch; here features are a deterministic byte-histogram projection
    (so downstream similarity ops have real input shapes to consume)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    feats.append([0.0] * dim)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
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


def frame_sample(
    df: DataFrame, media_col: str, id_col: str, every_n: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """One row in -> many frame rows out (the video path's table
    function shape). STUB demux: a real build pulls every Nth frame via
    av; here the payload is chunked into fixed-size 'frames' and every
    Nth is emitted with a synthetic presentation timestamp. Row
    explosion happens INSIDE the Arrow batch, so output batches can be
    larger than input batches — the shape that matters for memory
    sizing at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames, pts = [], [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                if p is None:
                    continue
                n_frames = max(len(p) // frame_bytes, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(i)
                    nos.append(fno)
                    frames.append(bytes(p[fno * frame_bytes : (fno + 1) * frame_bytes]))
                    pts.append(fno * 40)  # 25 fps
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_payload": frames, "pts_ms": pts}
            )

    flat = df.select(
        F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_media(df: DataFrame, media_col: str, id_col: str) -> DataFrame:
    """Arrow-batched decode stage: media struct -> typed features.
    Payload bytes stay inside the executor; only small features exit."""

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
