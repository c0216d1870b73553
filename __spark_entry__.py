"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 operator keyed
by op id (registered in deltasink_spark/queries/*).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deltasink_spark import registry  # noqa: E402

registry.load_all()

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return registry.QUERIES["agg_hash"](spark, SF0001)


# Driver-facing op order. The driver evaluates the first 50 ops in
# registration order per round; r1+r2 together hash-verified 82 ops.
# r3's first 50 are the ops still missing a green driver row, ranked by
# the r2 verdict's priorities:
#   1. the six r2 FAILs, fixed this round (array stringify / BIGINT
#      casts);
#   2. ten ops promoted from rows-only to exact oracles this round
#      (portable-hash simhash, deterministic hash-sampling, canonical
#      inferred schema, tolerance-band sketches, mirrored stub codecs);
#   3. the two cheap batch ops never reached by a driver budget;
#   4. the 15 real-StreamingQuery ops, never driver-checked (the r2
#      verdict's #1 missing item) — wall time cut this round
#      (availableNow drains instead of trigger timeouts; ~1-3 s each
#      warm, plus one-time streaming init on the first and ~2 s per
#      Python DataSource batch in source_memory) precisely so a
#      time-budgeted driver gets through them;
#   5. the 28 ops ADDED in r3 (training-pipeline layer + flagship
#      composition, IVF ANN,
#      layout ops, relational/agg depth) — all exact-oracle; the first
#      ~17 fit this round's budget, the rest lead r4's.
# Already-green ops fill the remaining slots in registration order.
_PRIORITY = [
    # r2 driver FAILs, fixed (6)
    "fn_array", "fn_map", "text_tokenize", "text_ngrams",
    "text_stats", "pipeline_llm_prep",
    # rows-only -> exact oracle promotions (10)
    "dedup_simhash", "sample_frac", "json_infer_schema",
    "agg_approx_distinct", "agg_hll_sketch", "agg_hll_union",
    "multimodal_decode", "multimodal_resize", "multimodal_features",
    "multimodal_frame_sample",
    # cheap batch ops never driver-checked (2)
    "scan_csv", "sink_parquet_batch",
]

# Real-StreamingQuery ops (never driver-checked) — right after the 18
# must-recheck ops so they finally get driver rows.
_STREAMING_TAIL = [
    "stream_trigger", "stream_backpressure", "sink_delta_append",
    "scan_delta", "stream_exactly_once", "join_stream_static",
    "stream_late_policy", "stream_session", "sink_delta_upsert",
    "stream_watermark", "source_kafka", "stream_stateful",
    "join_stream_stream", "source_rate", "source_memory",
]

# Ops added in r3 (SURVEY §2.14), all exact-oracle, pytest-verified at
# sf0.01 and sf0.1; ordered roughly by user impact.
_R3_NEW = [
    # training-pipeline layer (flagship composition first)
    "pipeline_training_prep",
    "doc_chunking", "tokenizer_vocab", "text_pii_scrub",
    "sample_stratified", "dedup_cluster", "seq_pack",
    "contamination_check", "data_mixture", "repetition_filter",
    # similarity / layout
    "ann_ivf", "scan_orc", "write_partitioned", "zorder_cluster",
    # relational / aggregate depth
    "agg_quantile", "agg_approx_quantile", "win_ntile", "unpivot_melt",
    "join_range_bucketed", "agg_argmax", "agg_corr", "fn_bitwise",
    "scd2_intervals", "event_sessionize", "join_null_safe",
    "fn_posexplode", "agg_bool_family", "dedup_blocked_levenshtein",
]

# TPC-H-adapted composite suite (SURVEY §2.15), added late in r3 —
# exact-oracle end-to-end plans; queue behind the single-op backlog.
_TPCH = [
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q13", "tpch_q14", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q22",
]


def _ordered_ids() -> list[str]:
    head = [op for op in _PRIORITY if op in registry.QUERIES]
    tail = [op for op in _STREAMING_TAIL if op in registry.QUERIES]
    new = [op for op in _R3_NEW if op in registry.QUERIES]
    tpch = [op for op in _TPCH if op in registry.QUERIES]
    placed = set(head) | set(tail) | set(new) | set(tpch)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + tail + new + tpch + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
