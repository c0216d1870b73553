"""Multimodal column queries (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    pack_media,
    resize_media,
)
from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "multimodal_column",
    oracle="""
    SELECT doc_id,
           'text/plain;doc' AS mime,
           octet_length(encode(text)) AS n_bytes,
           source
    FROM documents
    WHERE octet_length(encode(text)) > 200 AND source IN ('src0', 'src1', 'src2')
    """,
)
def multimodal_column(spark, sf_dir):
    """Build the media struct from fixture text payloads, then filter +
    project on METADATA only — the payload column is pruned out of the
    scan entirely (metadata predicates push down; check ReadSchema)."""
    d = load(spark, sf_dir, "documents")
    media = pack_media(
        F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
    )
    packed = d.select("doc_id", media.alias("media"))
    return (
        packed.filter(
            (F.col("media.meta.n_bytes") > 200)
            & F.col("media.mime").startswith("text/")
            & F.col("media.meta.source").isin("src0", "src1", "src2")
        )
        .select(
            "doc_id",
            F.col("media.mime").alias("mime"),
            F.col("media.meta.n_bytes").alias("n_bytes"),
            F.col("media.meta.source").alias("source"),
        )
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           'text/plain;doc' AS mime,
           octet_length(encode(text)) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 256 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) // 256) % 256 AS INT) AS height,
           TRUE AS ok
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_decode(spark, sf_dir):
    """Arrow-batched decode stage over the packed media column. The
    codec is a STUB, but a *deterministic* one (dims derived from
    payload length — operators/multimodal.py::_fake_decode), so the
    full mapInPandas plumbing is exactly verifiable: the oracle mirrors
    the fake's arithmetic. A real codec drops in behind the same
    signature and the op reverts to rows-only."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # NULL text cannot pack into a payload (r8 null audit) — mirrored
    media = pack_media(
        F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
    )
    packed = d.select("doc_id", media.alias("media"))
    return decode_media(packed, "media", "doc_id")


def _packed(spark, sf_dir):
    # NULL text cannot pack into a payload (r8 null audit) — each
    # consumer's oracle carries the matching WHERE text IS NOT NULL
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = pack_media(
        F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
    )
    return d.select("doc_id", media.alias("media"))


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           'text/plain;doc' AS mime,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           least(octet_length(encode(text)), 4096) AS n_bytes,
           md5(substr(text, 1, 4096)) AS payload_md5
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_resize(spark, sf_dir):
    """Arrow-batched resize stage (STUB codec: deterministic truncation
    to w*h bytes — operators/multimodal.py::resize_media). Binary
    payloads go in and out through Arrow batches; the driver-facing row
    digests the output payload to md5 (the canonicalizer cannot hash
    bytearray cells), which the oracle reproduces off the source text
    (fixture corpus is pure ASCII: byte-truncation == char-truncation,
    asserted in tests/test_properties.py)."""
    out = resize_media(_packed(spark, sf_dir), "media", "doc_id")
    return out.select(
        "doc_id", "mime", "width", "height", "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


@query(
    "multimodal_features",
    oracle="""
    WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
               WHERE text IS NOT NULL),
    h AS (SELECT doc_id, n,
                 list_transform(range(1, length(text) + 1),
                                i -> ord(substr(text, i, 1)) % 16) AS m
          FROM t)
    SELECT doc_id,
           'text/plain;doc' AS mime,
           CAST(16 AS INT) AS n_dims,
           n AS n_bytes,
           array_to_string(list_transform(range(0, 16),
                             k -> len(list_filter(m, x -> x = k))), ',') AS counts
    FROM h
    """,
)
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction (STUB model: deterministic
    byte-histogram projection — operators/multimodal.py): payload ->
    fixed-dim array<float>, the input shape for the similarity ops.
    Driver-facing output recovers the integer per-bucket counts from
    the normalized float32 features (round(f * n_bytes) is exact while
    counts << 2^23) and joins them to one string, which the oracle
    reproduces by bucketing the ASCII byte values directly — so the
    whole Arrow round-trip is value-verified. Raw array<float> output
    stays covered by tests/test_properties.py."""
    feats = extract_features(_packed(spark, sf_dir), "media", "doc_id")
    counts = F.transform(
        "features", lambda x: F.round(x * F.col("n_bytes")).cast("long")
    )
    return feats.select(
        "doc_id",
        "mime",
        F.size("features").alias("n_dims"),
        "n_bytes",
        F.concat_ws(",", counts).alias("counts"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (SELECT doc_id, text,
                      CAST(greatest(length(text) // 256, 1) AS BIGINT) AS n_frames
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(fno AS INT) AS frame_no,
           md5(substr(text, fno * 256 + 1, 256)) AS frame_md5,
           CAST(fno * 40 AS BIGINT) AS pts_ms
    FROM t, UNNEST(range(0, n_frames, 4)) AS u(fno)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (STUB demux: fixed 256-byte chunks, every 4th —
    operators/multimodal.py): one media row explodes into frame rows
    INSIDE the Arrow batch — the row-amplifying table-function shape of
    the video path. Driver-facing frames are md5-digested (bytearray
    cells are uncanonicalizable); the oracle replays the chunking as a
    lateral UNNEST over the ASCII source text."""
    frames = frame_sample(_packed(spark, sf_dir), "media", "doc_id")
    return frames.select(
        "doc_id",
        "frame_no",
        F.md5(F.col("frame_payload")).alias("frame_md5"),
        "pts_ms",
    )
