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


# Driver-facing op order. The driver evaluates the first 50 ops per
# round; r1-r4 together hash-verified 141 of the 190 registered ops.
# r5's first 49 slots are exactly the 49 ops WITHOUT a green driver
# row as of the r4 verdict:
#   1. the 13 streaming ops red since r3 (the events-loader dtype bug
#      that broke them was fixed in r4 — tables.py:104-139 — and they
#      are locally oracle-green, but the driver never re-checked them);
#   2. the 36 ops never driver-checked at all: the 9 r4-added TPC-H
#      queries, the r4 training-prep batch, the r3 relational tail,
#      and ivf_train_step (r4's slot-51 casualty).
# Slot 50 is the r5-added Avro payload op. Everything already green
# follows in registration order.
_STREAMING_RED = [
    "stream_watermark", "stream_trigger", "stream_backpressure",
    "stream_late_policy", "stream_stateful", "stream_exactly_once",
    "stream_session", "join_stream_static", "join_stream_stream",
    "sink_delta_append", "source_kafka", "source_rate", "source_memory",
]

# Never driver-checked (36), ordered: the slot-51 casualty first, then
# the r3 relational tail, then the r4 TPC-H completion, then the r4
# training-prep batch.
_NEVER_CHECKED = [
    "ivf_train_step",
    "unpivot_melt", "join_range_bucketed", "event_sessionize",
    "agg_argmax", "agg_corr", "fn_bitwise", "scd2_intervals",
    "join_null_safe", "fn_posexplode", "agg_bool_family",
    "dedup_blocked_levenshtein",
    "tpch_q1", "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
    "text_bm25", "text_unigram_logprob", "text_boilerplate_ngrams",
    "dedup_containment", "embedding_quantize", "sample_temperature",
    "agg_count_min", "ts_ewma", "sql_interface",
    "sample_bottom_k", "join_temporal_lookup", "sink_schema_evolution",
    "embedding_standardize", "agg_moments", "text_entropy",
]

# Ops ADDED in r5 — slot 50 onward; slots 51+ spill past the driver's
# 50-check budget and are the natural head of the r6 ordering (r6
# should promote whatever CORRECTNESS_r05.json leaves without a green
# row into the first 50 slots, exactly as r5 did for the r4 verdict's
# list).
_R5_NEW = [
    "avro_parse",
    "avro_confluent_envelope",
    "protobuf_parse",
    "scan_delta_time_travel",
    "sink_compact",
    "embedding_pq",
    "sim_pq_adc",
    "fn_url",
    "xml_parse",
    "scan_xml",
    "scan_text",
    "scan_binaryfile",
    "dedup_paragraph",
    "ts_rollup_multi",
    "knn_graph",
    "dedup_substring_span",
    "rollup_incremental",
    "table_stats",
    "dq_checks",
    "source_python_ds",
    "stream_python_ds",
    "json_variant",
    "sink_python_ds",
    "udf_arrow",
    "stream_transform_with_state",
    "dataset_split",
    "bpe_merge_step",
    "agg_listagg",
    "join_lateral",
    "fn_try",
    "fn_collate",
    "sql_parameterized",
    "dedup_url_canonical",
    "agg_bitmap_native",
    "pipeline_web_prep",
    "attribution_last_touch",
    "win_running_distinct",
    "sink_vacuum",
    "join_asof_forward",
    "attribution_first_touch",
    "fn_struct",
    "udaf_arrow_grouped",
    "fn_crypto",
]


def _ordered_ids() -> list[str]:
    groups = (_STREAMING_RED, _NEVER_CHECKED, _R5_NEW)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
