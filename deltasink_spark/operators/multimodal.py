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
