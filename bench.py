"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {op: sec}, "sf": ...}.

Each query is timed DS_BENCH_RUNS times (default 3) after warm-up and
the per-query MEDIAN is reported: this shared VM shows +/-50%
run-to-run variance (BASELINE.md), which single-shot timings can't
distinguish from real regressions (the r2 ts_similarity lesson).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deltasink_spark import registry
from deltasink_spark.session import get_spark

# Headline set: one representative per operator family; bench runs these
# plus everything else registered (cheaply, via count) if DS_BENCH_ALL=1.
HEADLINE = [
    "agg_hash",            # flagship Q1-shaped scan->filter->hash agg
    "join_inner_hash",     # big fact-fact shuffle join
    "join_asof",           # window-emulated as-of join
    "topk_per_group",      # rank-filter top-k
    "agg_rollup",          # hierarchical subtotals
    "win_frame_range",     # 30-day trailing RANGE frame
    "win_session",         # sessionization (gap windows)
    "json_parse",          # events.props JSON payload parse
    "fn_array",            # higher-order array functions
    "text_tfidf",          # explode->agg->join tf-idf
    "dedup_exact_hash",    # sha2 + row_number dedup
    "dedup_minhash_lsh",   # shingle->minhash->band equi-join
    "sim_topk_join",       # k-NN join over embeddings
    "sim_ann_lsh",         # LSH-bucketed approximate NN (the scale path)
    "ts_similarity",       # per-user time-series similarity
    "join_bucketed",       # co-located bucketed join (zero-shuffle SMJ)
    "join_skew_salted",    # hot-key-safe salted join
    "pipeline_llm_prep",   # end-to-end LLM data-prep composite
]

# TPC-H-adapted composite suite (SURVEY §2.15) — reported as its own
# group so the original 18-query subtotal stays comparable across
# rounds (BASELINE.md r3 note).
TPCH = [
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
]

# r4 training-prep / sketch / temporal additions — own group so the
# 18-query headline and the TPC-H group stay comparable across rounds.
R4OPS = [
    "text_bm25",             # retrieval scoring (2 token aggs + broadcasts)
    "text_unigram_logprob",  # corpus LM quality scoring
    "text_boilerplate_ngrams",  # shingle-df template detection
    "dedup_containment",     # asymmetric near-dup self-join
    "embedding_standardize", # per-dim z-score (posexplode + 64-row stats)
    "agg_count_min",         # mergeable CMS build + probe
    "ts_ewma",               # 16-lag window smoothing
    "sample_temperature",    # source-rebalance hash filter
    "join_temporal_lookup",  # SCD2 point-in-interval equi-join
    "sample_bottom_k",       # distributed bottom-k-by-hash sample
]


# r5 additions — own group (BASELINE.md r3 note on group comparability).
# Query-shaped ops only, matching the other groups: the r5 delta
# table-maintenance ops (scan_delta_time_travel, sink_compact) are
# sink/IO fixtures like the sink_delta_* family, which the bench has
# never timed — their cost is the staged writes, not a query plan.
R5OPS = [
    "avro_parse",            # Arrow-batched Avro payload decode
    "avro_confluent_envelope",  # registry envelope + schema dispatch
    "protobuf_parse",        # protobuf wire-format decode
    "embedding_pq",          # product-quantization coding pass
    "sim_pq_adc",            # ADC top-k over PQ codes
    "dedup_paragraph",       # cross-corpus paragraph dedup + reassembly
    "dedup_substring_span",  # duplicated-substring span marking
    "knn_graph",             # full-table LSH k-NN graph
    "ts_rollup_multi",       # minute/hour/day rollup pyramid
    "rollup_incremental",    # partial-merge view maintenance
]

# Late-r5 additions — separate group so the r5ops baseline recorded
# mid-round stays comparable.
R5BOPS = [
    "dedup_url_canonical",   # web-corpus URL canonicalization dedup
    "bpe_merge_step",        # one distributed BPE training iteration
    "dataset_split",         # deterministic train/val/test assignment
    "table_stats",           # ANALYZE-style column statistics
    "dq_checks",             # data-quality expectation suite
    "xml_parse",             # from_xml payload parse
    "json_variant",          # VARIANT-type semi-structured access
    "fn_url",                # parse_url component extraction
    "scan_text",             # raw-text line scan + decode
    "source_python_ds",      # Python DataSource batch scan w/ pushdown
]

# r6 additions — own group (first recording becomes the r7 baseline).
R6OPS = [
    "quality_gopher",        # Gopher-rules document filter
    "text_c4_clean",         # zero-shuffle C4 line cleaning
    "dsir_select",           # hashed-bigram importance selection
    "cdc_chunk",             # content-defined chunking + fingerprints
    "text_hashing_vectorizer",  # 32-slot hashed TF featurization
    "quality_ccnet_bins",    # perplexity-tercile head/middle/tail
    "sim_cosine_pairs",      # LSH-bucketed pairwise cosine (reworked r6)
    "dedup_embedding_cosine",  # LSH-bucketed near-dup pairs (reworked r6)
    "event_pattern_match",   # MATCH_RECOGNIZE-lite LEAD-window CEP
    "dedup_apply_keep_best", # cluster -> keep-longest materialization
    "sql_pipe_syntax",       # Spark 4 pipe-operator SQL (|>)
    "sql_recursive_cte",     # WITH RECURSIVE month spine join
    "stats_poisson_bootstrap",  # one-pass Poissonized bootstrap CI
    "join_asof_tolerance",   # as-of with staleness bound
    "scan_parquet_schema_merge",  # mergeSchema read-side evolution
    "agg_percentile_disc",   # type-1 order statistics
]

# r7 additions — own group (first recording becomes the r8 baseline).
# kafka_emulated_e2e is a streaming sink fixture (the sink_delta_*
# cost class the bench has never timed) and is excluded per the r5
# group note.
R7OPS = [
    "bpe_train",             # K=8 BPE merge iterations (training loop)
    "tokenizer_encode",      # corpus encode with the trained vocab
    "join_asof_nearest",     # nearest-direction as-of (two-window pick)
    "sql_udf",               # inlined SQL-defined scalar functions
    "dq_drift_psi",          # PSI distribution-drift monitor
    "agg_regression",        # regr_slope/intercept/r2 from exact moments
    "sample_weighted",       # A-Res weighted top-K sample
    "minhash_union",         # mergeable MinHash sketch build + union
    "scan_csv_malformed",    # PERMISSIVE corrupt-record CSV scan
]

# r8 additions — own group (first recording becomes the r9 baseline).
# join_stream_stream_outer is a real StreamingQuery drain (the
# streaming cost class the bench excludes per the r5 group note).
R8OPS = [
    "quality_classifier_score",  # broadcast linear model over hashed TF
    "ann_ivf_pq_query",          # composed IVF probe -> PQ/ADC top-3
    "dedup_image_phash",         # dHash banding + exact Hamming verify
    "quality_classifier_train",  # one full-batch distributed GD step
    "sample_weighted_union",     # A-Res merge == direct proof
    "agg_kmv_intersect",         # KMV/theta sketch intersection
    "hilbert_cluster",           # Hilbert-curve layout key + range sort
    "markov_transitions",        # journey transition matrix (lag + aggs)
]

# r8 statistical-test family — own group (first recording becomes the
# r9 baseline).
R8BOPS = [
    "stats_welch_ttest",         # conditional-agg Welch t + df
    "stats_chi2_independence",   # exact-marginal chi-square
    "stats_ks_two_sample",       # bucketed-prefix-sum ECDF gap
    "stats_mannwhitney_u",       # doubled-rank exact U + tie-corrected z
    "stats_mutual_information",  # MI + entropies from exact counts
    "ts_changepoint_cusum",      # integer-scaled CUSUM argmax
    "stats_anova_oneway",        # k-sample F via two chained hash aggs
    "ts_autocorrelation",        # lag equi-join ACF on the hourly frame
]

# r8 graph family — own group (first recording becomes the r9
# baseline).
R8COPS = [
    "graph_components",          # star-contraction CC over co-order edges
    "graph_triangle_count",      # degree-oriented exact triangles
    "rank_fusion_rrf",           # hybrid-retrieval RRF top-20
    "join_interval_overlap",     # bucket-decomposed interval join
    "ann_recall_at_k",           # ANN index-quality eval vs brute force
    "stats_proportions_ztest",   # pooled two-proportion z per group
    "agg_exact_median_twopass",  # bucket-histogram exact order statistic
    "intervals_merge_islands",   # gaps-and-islands running-max merge
    "stats_mad_outliers",        # integer-exact median/MAD outlier flags
    "ts_seasonal_decompose",     # 24-slot seasonal profile + eta^2
    "text_zipf_slope",           # log-log OLS over top-500 token ranks
    "sample_stratified_neyman",  # variance-optimal stratified draw
]

# Ops landed AFTER the r8cops idle recording — own group so the
# recorded 12-op r8cops reference stays comparable (the BASELINE r3
# group-comparability rule; an earlier review flagged exactly this
# silent-scope-growth class).
R8DOPS = [
    "ts_seasonal_anomaly",       # per-hod integer-exact 3-sigma flags
    "funnel_time_to_convert",    # per-segment conversion-delay stats
    "dedup_rate_report",         # per-source near-dup health report
    "eval_langid_confusion",     # heuristic-classifier confusion matrix
    "stats_cohens_kappa",        # chance-corrected agreement
    "eval_simhash_banding",      # heuristic-dedup precision/recall
    "funnel_window_strict",      # windowFunnel time-bounded levels
    "agg_exact_percentiles_multiprobe",  # one histogram, 4 exact quantiles
    "graph_kcore",               # 14 unrolled peel rounds + proof
]

# r9 additions — own group (first recording becomes the r10 baseline).
# The other six r9 ops are excluded by the standing group policy:
# scan_delta_cdf / cdf_incremental_sync / sink_topic_routing /
# stream_late_sideoutput / stream_progress_metrics are ledgered-sink /
# StreamingQuery fixtures
# (the sink_delta_* cost class the bench has never timed), and
# avro_schema_compat is an O(fields) metadata frame with no data-scaled
# plan to measure.
R9OPS = [
    "sql_session_variables",     # DECLARE/SET VAR + EXECUTE IMMEDIATE
    "stats_spearman",            # exact doubled-rank Spearman rho
    "dedup_minhash_incremental", # delta-vs-index near-dup probe
    "stats_kruskal_wallis",      # k-sample rank test, exact doubled ranks
]

# Ops landed AFTER the r9ops idle recording — own group so the
# recorded 4-op r9ops reference stays comparable (the BASELINE
# group-comparability rule).
R9BOPS = [
    "text_kneser_ney_bigram",    # interpolated-KN bigram LM score
    "ts_longest_streak",         # gaps-and-islands consecutive-day streak
    "dq_referential_integrity",  # cross-table FK orphan audit
    "join_size_estimate_sampled",  # correlated-sampling cardinality est
    "event_path_topk",           # top-10 opening 3-step journeys
]

# Landed AFTER the r9bops idle recording — own group (scope rule).
R9COPS = [
    "tokenizer_roundtrip",       # BPE losslessness audit (memoized vocab)
    "stats_levene",              # Brown-Forsythe variance homogeneity
]

# Landed AFTER the r9cops idle recording — own group (scope rule).
R9DOPS = [
    "ts_cross_correlation",      # lead-lag CCF on two hourly series
]

# r10 additions — own group (first recording becomes the r11 baseline).
# The other eight r10 ops are excluded by the standing group policy:
# the five delta-log ops + kafka_read_committed are sink/IO fixtures
# (staged-write cost, not a query plan), join_stream_stream_full and
# stream_table_source are real StreamingQuery drains.
R10OPS = [
    "tokenizer_unigram_train",   # 2-round hard-EM unigram-LM training
    "tokenizer_unigram_encode",  # corpus encode under the trained pieces
]

# Landed AFTER the r10ops idle recording — own group (scope rule). The
# delta-log RESTORE/stats-prune/ingest ops are sink/IO + streaming
# fixtures, excluded per the standing policy.
R10BOPS = [
    "agg_hll_intersect",         # HLL inclusion-exclusion overlap
]

# Landed AFTER the r10bops idle recording — own group (scope rule).
R10COPS = [
    "agg_kmv_difference",        # KMV/theta A-not-B estimate
    "agg_kmv_union",             # KMV/theta merge + re-truncate
]

# Landed AFTER the r10cops idle recording — own group (scope rule).
R10DOPS = [
    "agg_theta_jaccard",         # KMV/theta Jaccard estimator
    "attribution_linear",        # 1/n multi-touch credit
    "attribution_position_based",  # U-shaped 40/20/40 credit
    "graph_label_propagation",   # fixed-round synchronous LPA
]

# r11 additions — own group (first recording becomes the r12 baseline).
# The seven other r11 ops are excluded by the standing group policy:
# the five delta-log DML/interop/cleanup ops are sink/IO fixtures and
# the 15 re-ported streaming ops keep their original groups' coverage.
R11OPS = [
    "tokenizer_wordpiece_train",   # 8-round likelihood-ratio merges
    "tokenizer_wordpiece_encode",  # corpus encode under the merges
]

# r13 additions — own group (scope rule). The other five r13 ops are
# excluded by the standing group policy: the four sink_delta_* ops are
# sink/IO fixtures (staged-write + commit cost, not a query plan) and
# join_stream_stream_semi is a real StreamingQuery drain.
R13OPS = [
    "ann_index_incremental",     # delta-batch ANN probe vs persisted index
]

# r14 additions — ALL excluded by the standing group policy: the four
# delta ops (sink_delta_auto_compact, scan_delta_log_id_mode,
# sink_delta_uniform, and the schema-tracking fixture's collector
# writes) are sink/IO fixtures whose cost class is commit-path (pinned
# by the DML-throughput and ingest references in BASELINE.md), and
# stream_schema_tracking / join_stream_stream_right_outer are real
# StreamingQuery drains (three runs with a deliberate mid-run failure
# in the tracking case — wall-clock dominated by engine startup).

# r15 additions — ALL excluded by the standing group policy: the six
# new ops (sink_delta_uniform_incremental/_dv/_hudi/_expire,
# scan_delta_log_stats_columns, sink_delta_checkpoint_protection) are
# sink/IO fixtures whose cost class is commit-path metadata (pinned by
# the DML-throughput and ingest references in BASELINE.md) — each is a
# build-a-table-then-fold-its-metadata proof, not a query plan.

# Memoized one-time builds (r9 verdict "what's wrong" #2): warm medians
# hide the build cost inside warm-up, so a regression in the BUILD path
# is invisible. The cold pass busts each cache and times ONE cold run
# of its cheapest consumer; recorded as "cold_builds" in the JSON
# (reference medians in BASELINE.md). Since r16 it runs by DEFAULT
# (r15 verdict item #7: dedup_minhash_lsh's 15 ms warm median is a
# memo-dict hit, so the real build cost must be visible in every
# recorded bench line, not only in an opt-in channel). ADDITIVE ONLY:
# it runs AFTER all timed groups, so every existing group median stays
# comparable across rounds. DS_BENCH_COLD=0 skips it.
COLD_BUILDS = {
    "minhash_pair_frame": "dedup_minhash_lsh",
    "bpe_vocab": "bpe_train",
    "coorder_edges": "graph_components",
    "unigram_pieces": "tokenizer_unigram_train",
    "wordpiece_merges": "tokenizer_wordpiece_train",
}


def _bust_memo_caches() -> None:
    from deltasink_spark.operators import minhash as _mh
    from deltasink_spark.operators import unigram as _ug
    from deltasink_spark.operators import wordpiece as _wp
    from deltasink_spark.queries import analytics as _an
    from deltasink_spark.queries import trainprep as _tp

    _mh._PAIR_CACHE.clear()
    _tp._BPE_CACHE.clear()
    _wp._WP_CACHE.clear()
    _an._EDGE_CACHE.clear()
    _ug._UG_CACHE.clear()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(app_name="deltasink_bench")
    # Keep the captured output clean: even at ERROR level the
    # DAGScheduler logs accumulator-update stacks from benign
    # task-completion races, and those land in the recorded tail next
    # to the JSON metric line (the r4 verdict's hygiene note). The
    # bench's own error channel is the JSON "errors" field, so logs
    # carry no signal here — turn them OFF.
    spark.sparkContext.setLogLevel("OFF")
    ops = [op for op in HEADLINE + TPCH + R4OPS + R5OPS + R5BOPS + R6OPS + R7OPS + R8OPS + R8BOPS + R8COPS + R8DOPS + R9OPS + R9BOPS + R9COPS + R9DOPS + R10OPS + R10BOPS + R10COPS + R10DOPS + R11OPS + R13OPS if op in registry.QUERIES]
    if os.environ.get("DS_BENCH_ALL"):
        ops = sorted(registry.QUERIES)

    # Warm-up passes at smaller scale factors: compile every query's
    # whole-stage-codegen classes and tier up the JIT (first execution
    # of a heavy lambda pipeline otherwise pays 10-50s of interpreted/
    # C1 running), so the timed pass below measures steady-state.
    # A single broken op must never void the whole bench (the r3
    # lesson: one AnalysisException -> rc 1 -> no perf signal at all).
    # Broken ops are reported in "errors" and excluded from totals.
    errors: dict[str, str] = {}
    for warm_sf in ("sf0.001", "sf0.01"):
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), warm_sf)
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        for op in ops:
            try:
                registry.QUERIES[op](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                errors.setdefault(op, f"warmup: {type(exc).__name__}: {exc}"[:300])

    n_runs = int(os.environ.get("DS_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for op in ops:
        runs = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                df = registry.QUERIES[op](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:
            errors[op] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        timings[op] = round(statistics.median(runs), 4)
        # A warmup-only hiccup that the timed pass survived is not an
        # error: ops in "errors" are excluded from totals by contract.
        errors.pop(op, None)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_wall_clock_headline_queries",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        # r1-comparable subtotal: the original 18-query headline
        # (the TPC-H group was added to the bench in r3).
        "headline18": round(
            sum(t for op, t in timings.items() if op in HEADLINE), 4
        ),
        "tpch22": round(
            sum(t for op, t in timings.items() if op in TPCH), 4
        ),
        "r4ops": round(
            sum(t for op, t in timings.items() if op in R4OPS), 4
        ),
        "r5ops": round(
            sum(t for op, t in timings.items() if op in R5OPS), 4
        ),
        "r5bops": round(
            sum(t for op, t in timings.items() if op in R5BOPS), 4
        ),
        "r6ops": round(
            sum(t for op, t in timings.items() if op in R6OPS), 4
        ),
        "r7ops": round(
            sum(t for op, t in timings.items() if op in R7OPS), 4
        ),
        "r8ops": round(
            sum(t for op, t in timings.items() if op in R8OPS), 4
        ),
        "r8bops": round(
            sum(t for op, t in timings.items() if op in R8BOPS), 4
        ),
        "r8cops": round(
            sum(t for op, t in timings.items() if op in R8COPS), 4
        ),
        "r8dops": round(
            sum(t for op, t in timings.items() if op in R8DOPS), 4
        ),
        "r9ops": round(
            sum(t for op, t in timings.items() if op in R9OPS), 4
        ),
        "r9bops": round(
            sum(t for op, t in timings.items() if op in R9BOPS), 4
        ),
        "r9cops": round(
            sum(t for op, t in timings.items() if op in R9COPS), 4
        ),
        "r9dops": round(
            sum(t for op, t in timings.items() if op in R9DOPS), 4
        ),
        "r10ops": round(
            sum(t for op, t in timings.items() if op in R10OPS), 4
        ),
        "r10bops": round(
            sum(t for op, t in timings.items() if op in R10BOPS), 4
        ),
        "r10cops": round(
            sum(t for op, t in timings.items() if op in R10COPS), 4
        ),
        "r10dops": round(
            sum(t for op, t in timings.items() if op in R10DOPS), 4
        ),
        "r11ops": round(
            sum(t for op, t in timings.items() if op in R11OPS), 4
        ),
        "r13ops": round(
            sum(t for op, t in timings.items() if op in R13OPS), 4
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if os.environ.get("DS_BENCH_COLD", "1") != "0":
        cold: dict[str, float] = {}
        for label, op in COLD_BUILDS.items():
            if op not in registry.QUERIES:
                continue
            try:
                _bust_memo_caches()
                t0 = time.perf_counter()
                registry.QUERIES[op](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                cold[label] = round(time.perf_counter() - t0, 4)
            except Exception as exc:
                errors[f"cold:{label}"] = f"{type(exc).__name__}: {exc}"[:300]
        out["cold_builds"] = cold
    if errors:
        out["errors"] = errors
    # The driver records only the TAIL of stdout and parses the final
    # line as JSON — a 380-op timings dict blows past that capture and
    # lands as "parsed": null (the r12 verdict's hygiene note). Write
    # the FULL result to BENCH_local.json, and keep the printed final
    # line compact: headline-group queries only, plus every subtotal.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(full_path, "w") as fh:
        json.dump(out, fh)
    compact = dict(out)
    compact["queries"] = {
        op: t for op, t in timings.items() if op in HEADLINE
    }
    compact["queries_full"] = full_path
    compact.pop("errors", None)
    if errors:
        compact["n_errors"] = len(errors)
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
