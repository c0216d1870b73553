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


@query("agg_hll_sketch")
def agg_hll_sketch(spark, sf_dir):
    """Per-segment distinct-customer estimates from HLL sketches
    (lgConfigK=14 ~ 0.8% rsd). The sketch is built with one map-side-
    combined aggregation; only the sketch binary shuffles."""
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
        .orderBy("c_mktsegment")
    )


@query("agg_hll_union")
def agg_hll_union(spark, sf_dir):
    """The distributed-merge property made visible: sketches built
    independently on disjoint halves of orders are hll_union_agg-merged
    and estimated — at cluster scale this is exactly how per-partition
    partial sketches combine, so merged and whole-table estimates must
    agree (asserted in tests)."""
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
    return merged.crossJoin(whole).select("merged_estimate", "whole_estimate")
