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


@query("multimodal_decode")  # stub codec -> rows-only; plumbing is real
def multimodal_decode(spark, sf_dir):
    """Arrow-batched decode stage over the packed media column (STUB
    codec, deterministic — see operators/multimodal.py)."""
    d = load(spark, sf_dir, "documents")
    media = pack_media(
        F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
    )
    packed = d.select("doc_id", media.alias("media"))
    return decode_media(packed, "media", "doc_id")


def _packed(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    media = pack_media(
        F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
    )
    return d.select("doc_id", media.alias("media"))


@query("multimodal_resize")  # stub codec -> rows-only; plumbing is real
def multimodal_resize(spark, sf_dir):
    """Arrow-batched resize stage (STUB codec, deterministic): binary
    payloads in and out through mapInPandas."""
    return resize_media(_packed(spark, sf_dir), "media", "doc_id")


@query("multimodal_features")  # stub model -> rows-only; plumbing is real
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction (STUB model): payload ->
    fixed-dim array<float>, the input shape for the similarity ops.
    Driver-facing output digests the vector to scalars (n_dims + a
    xxhash64 of its JSON form + rounded L1 norm): the harness
    canonicalizer cannot hash array cells. The raw array<float>
    output stays available via operators.multimodal.extract_features
    and is unit-tested in tests/test_properties.py."""
    feats = extract_features(_packed(spark, sf_dir), "media", "doc_id")
    return feats.select(
        "doc_id",
        "mime",
        F.size("features").alias("n_dims"),
        F.xxhash64(F.to_json("features")).alias("feat_digest"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
    )


@query("multimodal_frame_sample")  # stub demux -> rows-only; plumbing is real
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (STUB demux): one media row explodes into every
    4th fixed-size frame chunk with synthetic timestamps — the
    row-amplifying table-function shape of the video path."""
    return frame_sample(_packed(spark, sf_dir), "media", "doc_id")
