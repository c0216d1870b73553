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

# Ops added during round 9 — each needs a first driver row.
_R9_NEW: list[str] = [
    "scan_delta_cdf",
    "sink_topic_routing",
    "stream_late_sideoutput",
    "stream_progress_metrics",
    "avro_schema_compat",
    "sql_session_variables",
    "cdf_incremental_sync",
    "stats_spearman",
    "dedup_minhash_incremental",
    "stats_kruskal_wallis",
    "text_kneser_ney_bigram",
    "ts_longest_streak",
    "dq_referential_integrity",
    "join_size_estimate_sampled",
    "event_path_topk",
    "tokenizer_roundtrip",
    "stats_levene",
    "ts_cross_correlation",
]

# Ops whose code changed in r9 — re-verification required.
_R9_CHANGED = [
    "eval_simhash_banding",
    "stats_mannwhitney_u",
    "dedup_minhash_lsh",
    "dedup_cluster",
    "dedup_apply_keep_best",
    "dedup_rate_report",
    "pipeline_llm_prep",
    "pipeline_training_prep",
    "dedup_image_phash",
    "graph_kcore",
]

# Stale cohort: latest green driver row is r2 (first 25) or r3 —
# re-verification only, so overflow past slot 50 is harmless.
_R9_STALE = [
    # r2-era
    "fn_conv", "fn_date", "fn_hash", "fn_math", "fn_regex", "fn_string",
    "scan_json", "scan_parquet", "set_except", "sim_ann_lsh",
    "sim_cosine_pairs", "sim_topk_join", "sim_topk_search",
    "text_fingerprint", "text_keyword_filter", "text_lang_id",
    "text_normalize", "text_quality", "text_tf", "text_tfidf",
    "text_token_count", "udf_scalar_py", "udtf_py", "win_cume",
    "win_rank",
    # r3-era
    "agg_approx_distinct", "agg_approx_quantile", "agg_hll_sketch",
    "agg_hll_union", "agg_quantile", "ann_ivf", "contamination_check",
    "data_mixture", "dedup_simhash", "doc_chunking",
    "fn_array", "multimodal_decode", "multimodal_features",
    "multimodal_frame_sample", "multimodal_resize",
    "repetition_filter", "sample_frac",
    "scan_csv", "scan_orc", "seq_pack", "sink_parquet_batch",
    "text_ngrams", "text_pii_scrub", "text_stats", "text_tokenize",
    "tokenizer_vocab", "win_ntile", "write_partitioned",
    "zorder_cluster",
]


def _ordered_ids() -> list[str]:
    groups = (_R9_NEW, _R9_CHANGED, _R9_STALE)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
