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
# registration order per round; r1-r3 together hash-verified 114 ops.
# r4's first ~51 are the ops whose driver rows are red, stale, or
# absent, per the r3 verdict's priorities:
#   1. the five r3 FAILs (all the same events-loader bug, fixed this
#      round by branching on the fixture's actual ts dtype);
#   2. the 23 formerly-green events-reading ops the same bug broke
#      after their last green row — re-verify post-fix;
#   3. the 13-query TPC-H composite suite (exact oracles, plan-tested,
#      never driver-checked — the warehouse queries a user runs first);
#   4. the analytics/vector depth ops never driver-checked
#      (queries/analytics.py + dedup_semantic / ivf_train_step).
# Then the remaining never-checked relational/agg ops, then everything
# already green in registration order.
_PRIORITY = [
    # r3 driver FAILs, fixed (5)
    "fn_map", "json_infer_schema", "scan_delta", "sink_delta_upsert",
    "sample_stratified",
    # formerly-green events ops broken by the r3 loader bug (23)
    "json_parse", "json_extract_path", "flatten_struct", "meta_columns",
    "ts_derive_partition", "cast_coerce", "join_asof", "agg_pivot",
    "agg_histogram", "win_lag_lead", "win_frame_rows", "win_frame_range",
    "win_first_last", "fn_json", "win_tumbling", "win_sliding",
    "win_session", "stream_dedup", "sink_deadletter", "ts_similarity",
    "udf_pandas", "udaf_pandas", "join_skew_salted",
]

# TPC-H-adapted composite suite (SURVEY §2.15) — exact-oracle
# end-to-end plans, never driver-checked before r4.
_TPCH = [
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q13", "tpch_q14", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q22",
]

# Analytics + vector depth ops never driver-checked (10).
_ANALYTICS = [
    "ts_resample_interp", "anomaly_zscore", "agg_mode",
    "funnel_analysis", "retention_cohort", "cdc_apply_changelog",
    "join_bloom_prefilter", "graph_pagerank", "dedup_semantic",
    "ivf_train_step",
]

# Remaining never-driver-checked relational/agg depth ops (11) — lead
# the r5 budget if r4's 50 slots run out first.
_NEVER_CHECKED_TAIL = [
    "unpivot_melt", "join_range_bucketed", "event_sessionize",
    "agg_argmax", "agg_corr", "fn_bitwise", "scd2_intervals",
    "join_null_safe", "fn_posexplode", "agg_bool_family",
    "dedup_blocked_levenshtein",
]

# Ops ADDED in r4 (TPC-H suite completion to all 22 queries + the
# training-prep depth batch), queued behind the existing never-checked
# backlog.
_R4_NEW = [
    "tpch_q1", "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
    "text_bm25", "text_unigram_logprob", "text_boilerplate_ngrams",
    "dedup_containment", "embedding_quantize", "sample_temperature",
    "agg_count_min", "ts_ewma", "sql_interface",
    "sample_bottom_k", "join_temporal_lookup", "sink_schema_evolution",
    "embedding_standardize", "agg_moments", "text_entropy",
]


def _ordered_ids() -> list[str]:
    groups = (_PRIORITY, _TPCH, _ANALYTICS, _NEVER_CHECKED_TAIL, _R4_NEW)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
