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
# round. After CORRECTNESS_r06.json every oracle-bearing op has a green
# driver row EXCEPT the 6 late-r6 ops below (queued as _R7_SPILL in r6,
# now promoted to slots 1-6). New r7-registered ops follow at slots 7+,
# then the oldest-green rows (r1/r2-era, last checked 5-6 rounds ago on
# old fixtures) fill the remaining driver budget as rechecks.
_R7_SPILL = [
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "stats_poisson_bootstrap",
    "join_asof_tolerance",
    "scan_parquet_schema_merge",
    "agg_percentile_disc",
]

# Ops added during round 7 — each needs a first driver row.
_R7_NEW: list[str] = [
    "kafka_emulated_e2e",
    "bpe_train",
    "tokenizer_encode",
    "join_asof_nearest",
    "sql_udf",
    "dq_drift_psi",
    "agg_regression",
    "sample_weighted",
    "scan_csv_malformed",
    "minhash_union",
]

# Oldest-green rechecks: every op whose latest green driver row is r1,
# then the oldest r2 rows, filling the 50-slot budget after the groups
# above. Already green — re-verification only, so overflow past slot 50
# is harmless.
_R7_RECHECK = [
    # r1-era (31 ops)
    "agg_cube", "agg_distinct", "agg_global", "agg_grouping_sets",
    "agg_hash", "agg_rollup", "agg_stats", "case_when",
    "dedup_embedding_cosine", "dedup_exact_hash", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "filter_null", "filter_pred", "join_anti",
    "join_broadcast", "join_bucketed", "join_cross", "join_full",
    "join_inner_hash", "join_left", "join_right", "join_semi",
    "join_theta_range", "limit_n", "multimodal_column", "project",
    "set_intersect", "set_union", "sort_order", "topk_per_group",
    # r2-era (28 ops)
    "agg_bitmap_distinct", "agg_collect", "dedup_exact", "fn_conv",
    "fn_date", "fn_hash", "fn_math", "fn_regex", "fn_string",
    "scan_json", "scan_parquet", "set_except", "sim_ann_lsh",
    "sim_cosine_pairs", "sim_topk_join", "sim_topk_search",
    "text_fingerprint", "text_keyword_filter", "text_lang_id",
    "text_normalize", "text_quality", "text_tf", "text_tfidf",
    "text_token_count", "udf_scalar_py", "udtf_py", "win_cume",
    "win_rank",
]


def _ordered_ids() -> list[str]:
    groups = (_R7_SPILL, _R7_NEW, _R7_RECHECK)
    head = [op for g in groups for op in g if op in registry.QUERIES]
    placed = set(head)
    mid = [op for op in registry.QUERIES if op not in placed]
    return head + mid


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {op: registry.QUERIES[op] for op in _ordered_ids()}


def oracle_sql() -> dict[str, str]:
    return {op: registry.ORACLES[op] for op in _ordered_ids() if op in registry.ORACLES}
