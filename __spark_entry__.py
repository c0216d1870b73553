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
# round. Coverage is at its ceiling, so each round's slots are: the ops
# added this round (first driver row needed), then any ops whose
# implementation changed this round, then the stale cohort — every op
# whose latest green driver row is oldest, oldest first — filling the
# budget (overflow past slot 50 spills to the next round's rotation).

# Ops added DURING round 15 — each needs a first driver row.
_R15_NEW_THIS_ROUND: list[str] = [
    "sink_delta_uniform_incremental",
    "sink_delta_uniform_dv",
    "scan_delta_log_stats_columns",
    "sink_delta_checkpoint_protection",
    "sink_delta_uniform_hudi",
    "sink_delta_uniform_expire",
]

# Ops whose implementation changed in r15 — re-verification rows
# required: the exact-dedup keep-first became the map-side-combinable
# MIN(struct) hash-agg (skew-safe; semantics identical).
_R15_CHANGED_THIS_ROUND: list[str] = [
    "dedup_exact_hash",
    "pipeline_llm_prep",
    # UniForm writer became incremental (delta manifests, carry-forward,
    # DV position deletes) — the existing uniform op re-verifies
    "sink_delta_uniform",
    # gained the stateStore providerClass round-trip + the loud
    # asyncProgressTracking rejection pin
    "stream_progress_metrics",
]

# Stale cohort for r15: the r5-green remainder that spilled past r14's
# slot 50 (27 ops, join_stream_static onward alphabetically), then the
# full r6-green cohort (46 ops) filling the budget; overflow spills to
# r16's rotation.
_R15_STALE: list[str] = [
    # r5-green remainder
    "join_stream_static", "join_stream_stream", "join_temporal_lookup",
    "sample_bottom_k", "sample_temperature", "scd2_intervals",
    "sql_interface", "stream_backpressure", "stream_late_policy",
    "stream_stateful", "stream_trigger", "stream_watermark",
    "text_bm25", "text_boilerplate_ngrams", "text_entropy",
    "text_unigram_logprob", "tpch_q1", "tpch_q11", "tpch_q12",
    "tpch_q15", "tpch_q16", "tpch_q2", "tpch_q20", "tpch_q21",
    "tpch_q9", "ts_ewma", "unpivot_melt",
    # r6-green cohort
    "agg_bitmap_native", "agg_listagg", "attribution_first_touch",
    "attribution_last_touch", "avro_confluent_envelope",
    "bpe_merge_step", "cdc_chunk", "dataset_split", "dedup_paragraph",
    "dedup_substring_span", "dedup_url_canonical", "dq_checks",
    "dsir_select", "embedding_pq", "event_pattern_match", "fn_collate",
    "fn_crypto", "fn_struct", "fn_try", "fn_url", "join_asof_forward",
    "join_lateral", "json_variant", "knn_graph", "pipeline_web_prep",
    "protobuf_parse", "quality_ccnet_bins", "quality_gopher",
    "rollup_incremental", "scan_binaryfile", "scan_text", "scan_xml",
    "sim_pq_adc", "sink_python_ds", "source_python_ds",
    "sql_parameterized", "stream_python_ds",
    "stream_transform_with_state", "table_stats", "text_c4_clean",
    "text_hashing_vectorizer", "ts_rollup_multi", "udaf_arrow_grouped",
    "udf_arrow", "win_running_distinct", "xml_parse",
]

# Ops added DURING round 14 — each needs a first driver row.
_R14_NEW_THIS_ROUND: list[str] = [
    "sink_delta_auto_compact",
    "stream_schema_tracking",
    "scan_delta_log_id_mode",
    "join_stream_stream_right_outer",
    "sink_delta_uniform",
    "sink_delta_coordinated",
]

# Ops whose implementation changed in r14 — re-verification rows
# required: checkpoint stats_parsed/partitionValues_parsed became
# typed (real data types per the spec), deep clone gained the path
# containment guard, retention duration parsing hardened.
_R14_CHANGED_THIS_ROUND: list[str] = [
    "scan_delta_log_checkpoint",
    "scan_delta_log_stats_prune",
    "scan_delta_log_v2_checkpoint",
    "sink_delta_clone_deep",
    "sink_vacuum",
    "sink_delta_log_cleanup",
    # name-mapped staging now stamps parquet field ids (UniForm compat)
    "sink_delta_column_mapping",
    # evolution-added columns forced nullable (old files pad null)
    "sink_delta_merge_evolve",
    "sink_delta_log_schema_evolution",
    # stream reader gained schema-change detection / tracking /
    # skipChangeCommits / widening casts
    "stream_table_source",
    "stream_table_source_rate_limited",
    "stream_cdf_source",
    "cdf_incremental_sync",
]

# Stale cohort for r14: the 15-op r4-green spill from r13 (win_sliding
# onward — r13's 50 slots closed at win_session), then the oldest
# remaining cohort (the 43 r5-green rows, alphabetical). Overflow past
# slot 50 spills to r15's rotation; after this round the oldest green
# watermark clears r4 for good.
_R14_STALE: list[str] = [
    "win_sliding", "win_tumbling", "tpch_q3", "tpch_q4", "tpch_q5",
    "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q13",
    "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
    # r5-green cohort
    "agg_argmax", "agg_bool_family", "agg_corr", "agg_count_min",
    "agg_moments", "avro_parse", "dedup_blocked_levenshtein",
    "dedup_containment", "embedding_quantize", "embedding_standardize",
    "event_sessionize", "fn_bitwise", "fn_posexplode", "ivf_train_step",
    "join_null_safe", "join_range_bucketed", "join_stream_static",
    "join_stream_stream", "join_temporal_lookup", "sample_bottom_k",
    "sample_temperature", "scd2_intervals", "sql_interface",
    "stream_backpressure", "stream_late_policy", "stream_stateful",
    "stream_trigger", "stream_watermark", "text_bm25",
    "text_boilerplate_ngrams", "text_entropy", "text_unigram_logprob",
    "tpch_q1", "tpch_q11", "tpch_q12", "tpch_q15", "tpch_q16",
    "tpch_q2", "tpch_q20", "tpch_q21", "tpch_q9", "ts_ewma",
    "unpivot_melt",
]

# Ops added DURING round 13 — each needs a first driver row.
_R13_NEW_THIS_ROUND: list[str] = [
    "sink_delta_concurrent_retry",
    "sink_delta_timestamp_ntz",
    "sink_delta_variant",
    "join_stream_stream_semi",
    "ann_index_incremental",
    "sink_delta_column_defaults",
    "sink_delta_clone_deep",
]

# Ops whose implementation changed in r13 — re-verification rows
# required: every DML verb gained optimistic-concurrency re-execution
# (_occ_retry) and emits delta-spark's per-operation operationMetrics
# vocabulary; merge_when composes with identity columns; OPTIMIZE's
# row-lineage join gained the basename-ambiguity guard;
# tokenizer_vocab's top-500 became a distributed heap. All re-verified
# locally against the full contract this round.
_R13_CHANGED_THIS_ROUND: list[str] = [
    "scan_delta_log_history_metrics",
    "tokenizer_vocab",
    "sink_delta_merge_when",
    "sink_delta_identity",
    "sink_delta_update",
    "sink_delta_update_dv",
    "sink_delta_delete_where",
    "sink_delta_delete_vectors",
    "sink_delta_merge",
    "sink_delta_merge_evolve",
    "sink_delta_scd2",
    "sink_delta_replace_where",
    "sink_delta_cluster_optimize",
    "sink_delta_zorder",
    "sink_delta_row_tracking",
    "sink_vacuum",
    "sink_delta_clone",
    "pipeline_gdpr_erasure",
]

# Stale cohort for r13: the ungraded remainder of the r12 stale list
# (the r4-green cohort from fn_json onward — r12's 50 slots closed at
# flatten_struct). Graded in full this round, the oldest green
# watermark advances past r4.
_R13_STALE: list[str] = [
    "fn_json", "fn_map", "funnel_analysis",
    "graph_pagerank", "join_asof", "join_bloom_prefilter",
    "join_skew_salted", "json_extract_path", "json_infer_schema",
    "json_parse", "meta_columns", "retention_cohort",
    "sample_stratified", "sink_deadletter", "stream_dedup",
    "ts_derive_partition", "ts_resample_interp", "ts_similarity",
    "udaf_pandas", "udf_pandas", "win_first_last", "win_frame_range",
    "win_frame_rows", "win_lag_lead", "win_session", "win_sliding",
    "win_tumbling", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q13", "tpch_q14",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
]

# Ops added DURING round 12 — each needs a first driver row. They lead
# the rotation together with the r11-late _R12_NEW cohort below.
_R12_NEW_THIS_ROUND: list[str] = [
    "sink_delta_row_tracking",
    "sink_delta_liquid_cluster",
    "scan_delta_log_crc",
    "sink_delta_type_widening",
    "sink_delta_update_dv",
    "sink_delta_drop_feature",
    "sink_delta_merge_when",
    "scan_delta_log_history_metrics",
]

# Ops whose implementation changed in r12 — re-verification rows
# required: the row-tracking lineage now rides every rewrite path
# (UPDATE/DELETE/MERGE/replaceWhere/OPTIMIZE), every commit writes and
# every fold validates a .crc checksum sidecar, appends enforce/widen
# column types, compaction folds domainMetadata, cleanup reclaims
# checkpoints+sidecars+crc, the write-protocol gate re-validates under
# the commit lock, and the stream source refuses an explicit
# starting_version below the cleaned horizon. All re-verified locally
# against the full 376-op contract this round.
_R12_CHANGED_THIS_ROUND: list[str] = [
    "sink_delta_update",
    "sink_delta_delete_where",
    "sink_delta_merge",
    "sink_delta_replace_where",
    "sink_delta_cluster_optimize",
    "sink_delta_delete_vectors",
    "scan_delta_log_checkpoint",
    "scan_delta_log_compacted",
    "sink_delta_log_cleanup",
    "sink_delta_log",
    "stream_table_source",
    "pipeline_delta_ingest",
    "pipeline_gdpr_erasure",
]

# Stale cohort for r12: the 3 r3-green spills from r11, then the
# oldest remaining cohort (r4-green rows). Overflow past slot 50
# spills to r13's rotation.
_R12_STALE: list[str] = [
    "win_ntile", "write_partitioned", "zorder_cluster",
    "agg_histogram", "agg_mode", "agg_pivot", "anomaly_zscore",
    "cast_coerce", "cdc_apply_changelog", "dedup_semantic",
    "flatten_struct", "fn_json", "fn_map", "funnel_analysis",
    "graph_pagerank", "join_asof", "join_bloom_prefilter",
    "join_skew_salted", "json_extract_path", "json_infer_schema",
    "json_parse", "meta_columns", "retention_cohort",
    "sample_stratified", "sink_deadletter", "stream_dedup",
    "ts_derive_partition", "ts_resample_interp", "ts_similarity",
    "udaf_pandas", "udf_pandas", "win_first_last", "win_frame_range",
    "win_frame_rows", "win_lag_lead", "win_session", "win_sliding",
    "win_tumbling", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q13", "tpch_q14",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
]

# Ops added during round 11 — each needs a first driver row.
_R11_NEW: list[str] = [
    "sink_delta_update",
    "scan_delta_log_cdf_all_dml",
    "scan_delta_log_foreign",
    "sink_delta_log_cleanup",
    "tokenizer_wordpiece_train",
    "tokenizer_wordpiece_encode",
]

# Ops whose implementation changed in r11 — re-verification required
# (the 15 bespoke-ledger streaming ops ported onto the real
# `_delta_log` layer; delete_vectors now builds DVs executor-side;
# LPA dropped the community-size broadcast hint; late-r11:
# sink_delta_delete_where gained the pinned single-evaluation
# predicate, sink_delta_merge now rejects extra source columns /
# gained merge_schema, stream_table_source gained the post-cleanup
# initial-snapshot batch — all re-verified locally against the full
# 357-op contract, listed here for driver rows).
_R11_CHANGED = [
    "sink_delta_delete_where",
    "sink_delta_merge",
    "stream_table_source",
    "stream_exactly_once",
    "sink_delta_append",
    "sink_delta_upsert",
    "scan_delta",
    "scan_delta_time_travel",
    "sink_compact",
    "sink_vacuum",
    "sink_schema_evolution",
    "scan_delta_cdf",
    "cdf_incremental_sync",
    "sink_topic_routing",
    "stream_late_sideoutput",
    "stream_progress_metrics",
    "kafka_emulated_e2e",
    "kafka_read_committed",
    "sink_delta_delete_vectors",
    "graph_label_propagation",
]

# Stale cohort: the 27 ops whose latest green driver row is r3 (the
# r10 verdict's list) — 6 new + 20 changed + the first 24 of these
# fill the 50 slots; the last 3 (win_ntile, write_partitioned,
# zorder_cluster) spill to the FRONT of the r12 rotation along with
# the _R12_NEW cohort below.
_R11_STALE = [
    "agg_approx_quantile", "agg_hll_sketch", "agg_hll_union",
    "agg_quantile", "ann_ivf", "contamination_check", "data_mixture",
    "dedup_simhash", "doc_chunking", "multimodal_decode",
    "multimodal_features", "multimodal_frame_sample",
    "multimodal_resize", "repetition_filter", "sample_frac",
    "scan_csv", "scan_orc", "seq_pack", "sink_parquet_batch",
    "text_ngrams", "text_pii_scrub", "text_stats", "text_tokenize",
    "tokenizer_vocab", "win_ntile", "write_partitioned",
    "zorder_cluster",
]

# Ops added late in round 11, AFTER the 50-slot budget above was
# already committed to finishing the r3-stale backlog (the r10
# verdict's priority). Placed after the stale cohort so they spill to
# r12's rotation as its new cohort — each was verified THIS round by
# the full local oracle contract (sf0.01 exact compares) plus the
# empty-corpus and NULL-injection audits; the driver row lands r12.
_R12_NEW: list[str] = [
    "sink_delta_clone",
    "scan_delta_log_protocol_gate",
    "sink_delta_append_only",
    "sink_delta_merge_evolve",
    "sink_delta_scd2",
    "sink_delta_zorder",
    "stream_table_source_rate_limited",
    "scan_delta_log_v2_checkpoint",
    "sink_delta_copy_into",
    "scan_delta_log_detail",
    "sink_delta_optimize_partition",
    "scan_delta_log_domain_metadata",
    "pipeline_medallion",
    "scan_delta_log_cdf_by_timestamp",
    "sink_delta_convert",
]

# Ops whose implementation changed late in r11, after the slot budget
# closed (the BPE chain's fuse became token-exact via the sentinel
# replace — bpe_merge_step itself is single-char-stage and provably
# unaffected). Verified this round by exact sf0.01 oracle compares;
# they spill to r12's changed cohort.
_R12_CHANGED: list[str] = [
    "bpe_train",
    "tokenizer_encode",
    "tokenizer_roundtrip",
]

# Ops added during round 10 — each needed a first driver row (kept for
# ordering of the post-slot-50 spill).
_R10_NEW: list[str] = [
    "sink_delta_log",
    "scan_delta_log",
    "scan_delta_log_time_travel",
    "sink_delta_delete_where",
    "scan_delta_log_cdf",
    "stream_table_source",
    "tokenizer_unigram_train",
    "tokenizer_unigram_encode",
    "join_stream_stream_full",
    "kafka_read_committed",
    "scan_delta_log_checkpoint",
    "sink_delta_merge",
    "scan_delta_log_partition_prune",
    "sink_delta_log_schema_evolution",
    "sink_delta_restore",
    "scan_delta_log_stats_prune",
    "pipeline_delta_ingest",
    "agg_hll_intersect",
    "stream_cdf_source",
    "scan_delta_log_timestamp_travel",
    "sink_delta_cluster_optimize",
    "agg_kmv_difference",
    "scan_delta_log_multipart_checkpoint",
    "sink_delta_replace_where",
    "scan_delta_log_history",
    "agg_kmv_union",
    "sink_delta_constraint",
    "sink_delta_delete_vectors",
    "agg_theta_jaccard",
    "sink_delta_generated_partition",
    "sink_delta_column_mapping",
    "attribution_linear",
    "attribution_position_based",
    "graph_label_propagation",
    "sink_delta_identity",
    "scan_delta_log_ict_travel",
    "pipeline_gdpr_erasure",
    "scan_delta_log_compacted",
]

# Ops whose code changed in r10 — re-verification required
# (graph_kcore: fixpoint-depth guard; the events_stream_batched
# consumers: non-empty-slice staging guarantee; the read_changes
# consumers: reversed-range validation).
_R10_CHANGED = [
    "dq_referential_integrity",
    "graph_kcore",
    "stream_progress_metrics",
    "stream_session",
    "sink_topic_routing",
    "scan_delta_cdf",
    "cdf_incremental_sync",
]

# Stale cohort: every op whose latest green driver row is r3 or older
# (the r9 verdict's list), oldest first — one more rotation finishes
# the job (no op older than r5 afterwards).
_R10_STALE = [
    # r2-era
    "fn_array", "win_rank", "win_cume", "udtf_py",
    # r3-era
    "agg_approx_distinct", "agg_approx_quantile", "agg_hll_sketch",
    "agg_hll_union", "agg_quantile", "ann_ivf", "contamination_check",
    "data_mixture", "dedup_simhash", "doc_chunking",
    "multimodal_decode", "multimodal_features",
    "multimodal_frame_sample", "multimodal_resize",
    "repetition_filter", "sample_frac",
    "scan_csv", "scan_orc", "seq_pack", "sink_parquet_batch",
    "text_ngrams", "text_pii_scrub", "text_stats", "text_tokenize",
    "tokenizer_vocab", "win_ntile", "write_partitioned",
    "zorder_cluster",
]


def _ordered_ids() -> list[str]:
    groups = (
        _R15_NEW_THIS_ROUND, _R15_CHANGED_THIS_ROUND, _R15_STALE,
        _R14_NEW_THIS_ROUND, _R14_CHANGED_THIS_ROUND, _R14_STALE,
        _R13_NEW_THIS_ROUND, _R13_CHANGED_THIS_ROUND, _R13_STALE,
        _R12_NEW_THIS_ROUND, _R12_NEW, _R12_CHANGED,
        _R12_CHANGED_THIS_ROUND, _R12_STALE,
        _R11_NEW, _R11_CHANGED, _R11_STALE,
        _R10_NEW, _R10_CHANGED, _R10_STALE,
    )
    head = []
    placed = set()
    for g in groups:
        for op in g:
            if op in registry.QUERIES and op not in placed:
                head.append(op)
                placed.add(op)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
