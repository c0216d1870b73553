"""Sketch aggregates (SURVEY.md §2.5 approximate family, extended):
HyperLogLog distinct sketches with distributed merge — the cardinality
path that survives 100 TB because partial sketches merge associatively
across partitions (a few KB per group crosses the shuffle, never rows).

Rows-only checks: sketch estimates are engine-specific (DuckDB's HLL
differs), so exact-match oracles are impossible by construction; the
accuracy and merge-consistency properties are asserted in
tests/test_properties.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "agg_hll_sketch",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_band
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_hll_sketch(spark, sf_dir):
    """Per-segment distinct-customer estimates from HLL sketches
    (lgConfigK=14 ~ 0.8% rsd). The sketch is built with one map-side-
    combined aggregation; only the sketch binary shuffles. The raw
    estimate is engine-specific, so the driver-facing row carries the
    exact count plus a `within_band` proof the estimate sits inside a
    3-sigma envelope (2.5%); the oracle asserts TRUE. Raw estimates
    stay covered by tests/test_properties.py."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(14))).alias(
                "approx_customers"
            ),
            F.count_distinct("o_custkey").alias("exact_customers"),
        )
        .select(
            "c_mktsegment",
            "exact_customers",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.025
            ).alias("within_band"),
        )
    )


@query(
    "agg_hll_union",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS merged_close_to_whole,
           TRUE AS merged_within_band
    FROM orders
    """,
)
def agg_hll_union(spark, sf_dir):
    """The distributed-merge property made visible: sketches built
    independently on disjoint halves of orders are hll_union_agg-merged
    and estimated — at cluster scale this is exactly how per-partition
    partial sketches combine. The union gadget does NOT guarantee
    bit-identical registers to the single-pass sketch (mode/target-type
    transitions; observed equal at sf0.01 but ~0.1% apart at sf0.1), so
    the driver row asserts the merged estimate is within 1% of the
    whole-table estimate AND within the 3-sigma band of the exact
    count (oracle: TRUE/TRUE)."""
    o = load(spark, sf_dir, "orders")
    halves = (
        o.withColumn("half", (F.col("o_orderkey") % 2).cast("int"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    )
    merged = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(14))).alias(
            "whole_estimate"
        )
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return (
        merged.crossJoin(whole)
        .crossJoin(exact)
        .select(
            "n_exact",
            (
                F.abs(F.col("merged_estimate") - F.col("whole_estimate"))
                / F.col("whole_estimate")
                <= 0.01
            ).alias("merged_close_to_whole"),
            (
                F.abs(F.col("merged_estimate") - F.col("n_exact")) / F.col("n_exact")
                <= 0.025
            ).alias("merged_within_band"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via bitmap aggregation (Spark 3.5+
    bitmap functions): keys are bucketed into 32k-bit bitmaps, each
    bucket's bitmap ORs together with map-side combine, and the final
    count sums per-bucket popcounts. Unlike count(DISTINCT x) this
    never plans Expand or reshuffles raw keys — only fixed-size bitmap
    binaries cross the wire — while staying exact (hence the exact
    COUNT(DISTINCT) oracle)."""
    li = load(spark, sf_dir, "lineitem")
    per_bucket = (
        li.groupBy(
            "l_returnflag", F.bitmap_bucket_number(F.col("l_orderkey")).alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_orderkey"))).alias("bm")
        )
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_orders"))
    )
