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
# round. Coverage is at its ceiling (254/257 green after r7), so r8's
# slots are: ops added this round (first driver row needed), then the
# 10 r7 ops re-checked (minhash_union / sample_weighted / dq_drift_psi
# / bpe_train / tokenizer_encode changed implementation this round),
# then the minhash-stack consumers touched by the star-edge recall fix,
# then the oldest-green cohort (r2-era, last checked 6 rounds ago, and
# r3-era) filling the remaining budget.

# Ops added during round 8 — each needs a first driver row.
_R8_NEW: list[str] = [
    "quality_classifier_score",
    "ann_ivf_pq_query",
    "join_stream_stream_outer",
    "dedup_image_phash",
    "quality_classifier_train",
    "sample_weighted_union",
    "agg_kmv_intersect",
    "hilbert_cluster",
    "markov_transitions",
    "stats_welch_ttest",
    "stats_chi2_independence",
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    "stats_mutual_information",
    "ts_changepoint_cusum",
    "stats_anova_oneway",
    "ts_autocorrelation",
    "graph_components",
    "graph_triangle_count",
    "rank_fusion_rrf",
    "join_interval_overlap",
    "ann_recall_at_k",
    "stats_proportions_ztest",
    "agg_exact_median_twopass",
    "intervals_merge_islands",
    "stats_mad_outliers",
    "ts_seasonal_decompose",
    "text_zipf_slope",
    "sample_stratified_neyman",
    "ts_seasonal_anomaly",
    "funnel_time_to_convert",
    "dedup_rate_report",
    "eval_langid_confusion",
    "stats_cohens_kappa",
    "eval_simhash_banding",
    "funnel_window_strict",
    "agg_exact_percentiles_multiprobe",
    "graph_kcore",
]

# r7-era ops re-checked (5 of the 10 changed code in r8).
_R8_R7_RECHECK = [
    "minhash_union",
    "sample_weighted",
    "dq_drift_psi",
    "bpe_train",
    "tokenizer_encode",
    "kafka_emulated_e2e",
    "join_asof_nearest",
    "sql_udf",
    "agg_regression",
    "scan_csv_malformed",
]

# minhash-stack consumers of the r8 star-edge change (fixture results
# unchanged by construction — the cap never fires there — but these are
# ALL the ops whose plans the change touched; the pipeline composites
# and dedup_cluster would otherwise sit past the 50-slot budget).
_R8_MINHASH_RECHECK = [
    "dedup_minhash_lsh",
    "dedup_apply_keep_best",
    "dedup_cluster",
    "pipeline_llm_prep",
    "pipeline_training_prep",
]

# Oldest-green cohort: every op whose latest green driver row is r2,
# then r3, filling the 50-slot budget. Already green — re-verification
# only, so overflow past slot 50 is harmless.
_R8_OLDEST = [
    # r2-era (25 ops)
    "fn_conv", "fn_date", "fn_hash", "fn_math", "fn_regex", "fn_string",
    "scan_json", "scan_parquet", "set_except", "sim_ann_lsh",
    "sim_cosine_pairs", "sim_topk_join", "sim_topk_search",
    "text_fingerprint", "text_keyword_filter", "text_lang_id",
    "text_normalize", "text_quality", "text_tf", "text_tfidf",
    "text_token_count", "udf_scalar_py", "udtf_py", "win_cume",
    "win_rank",
    # r3-era (32 ops)
    "agg_approx_distinct", "agg_approx_quantile", "agg_hll_sketch",
    "agg_hll_union", "agg_quantile", "ann_ivf", "contamination_check",
    "data_mixture", "dedup_cluster", "dedup_simhash", "doc_chunking",
    "fn_array", "multimodal_decode", "multimodal_features",
    "multimodal_frame_sample", "multimodal_resize", "pipeline_llm_prep",
    "pipeline_training_prep", "repetition_filter", "sample_frac",
    "scan_csv", "scan_orc", "seq_pack", "sink_parquet_batch",
    "text_ngrams", "text_pii_scrub", "text_stats", "text_tokenize",
    "tokenizer_vocab", "win_ntile", "write_partitioned",
    "zorder_cluster",
]


def _ordered_ids() -> list[str]:
    groups = (_R8_NEW, _R8_R7_RECHECK, _R8_MINHASH_RECHECK, _R8_OLDEST)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
