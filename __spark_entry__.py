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
# round. After CORRECTNESS_r05.json, 42 registered ops had never
# received a driver row (the r5-added batch minus avro_parse, which
# took r5's slot 50 and went green); r6 added 8 more ops
# (quality_gopher, text_c4_clean, dsir_select, cdc_chunk,
# text_hashing_vectorizer, quality_ccnet_bins, event_pattern_match,
# dedup_apply_keep_best), listed at the end of this group — 50
# never-checked ops fill the driver budget. The two ops added after
# the head filled (sql_pipe_syntax, sql_recursive_cte) are also
# never-checked but spill past slot 50 by necessity; they are the
# head of the r7 ordering. Everything else follows in registration
# order.
_R6_UNVERIFIED = [
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
    # r6-added training-pipeline ops
    "quality_gopher",
    "text_c4_clean",
    "dsir_select",
    "cdc_chunk",
    "text_hashing_vectorizer",
    "quality_ccnet_bins",
    "event_pattern_match",
    "dedup_apply_keep_best",
]

# With 50 never-driver-checked ops the head fills the entire driver
# budget; the oldest-green recheck resumes in r7.
_R6_RECHECK: list[str] = []

# Ops registered AFTER the r6 head filled — deterministically queued at
# slots 51+ so the r7 reordering starts exactly here (never interleaved
# with already-green ops by registration order).
_R7_SPILL = [
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "stats_poisson_bootstrap",
    "join_asof_tolerance",
    "scan_parquet_schema_merge",
    "agg_percentile_disc",
]


def _ordered_ids() -> list[str]:
    groups = (_R6_UNVERIFIED, _R6_RECHECK, _R7_SPILL)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
