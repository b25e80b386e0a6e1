#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the round driver captures only the LAST ~2,000 chars of
stdout, so the FINAL line must always parse on its own — the r5 artifact was
lost to a per-query map that outgrew the tail capture):
  line 1: the full per-query map {"queries": {name: sec}, ...} — for humans
          and for bench_detail.json consumers; also written to
          bench_detail.json next to this script.
  line 2 (FINAL): one compact JSON line {"metric", "value", "unit", "n",
          "sf", "engines", "detail_file"} — always < 400 chars.

Each query is forced end-to-end with the noop sink (full materialization, no
driver collect). A warmup run of a trivial query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from nilm_data_framework_spark.plans.registry import all_queries
from nilm_data_framework_spark.session import get_session

HEADLINE = [
    # relational scan/join/agg shapes
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "forecast_revenue",
    "large_volume_orders",
    "rollup_returns",
    # NILM time-series core
    "resample_300s_mean",
    "aggregate_from_appliances",
    "rate_inference",
    "pivot_wide",
    "sliding_windows",
    "run_length_filter",
    "sessionize",
    "asof_join_last_purchase",
    # LLM-pipeline extensions
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "text_quality",
    "language_id",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    # scale-path kernels (applyInPandas / ml.Correlation / tensor export) —
    # timed directly so the Arrow/Python paths are measured, not only their
    # declarative twins
    "sliding_windows_grouped",
    "pairwise_corr_onepass",
    "tensor_export_flat",
    # round-2 additions: clustering / compressed ANN / end-to-end pipeline
    "neardup_clusters",
    "pq_topk_rerank",
    "decontamination_pairs",
    "training_set_materialize",
    # round-2 batch 2: tokenizer/LM-quality/span-dedup text kernels
    "bpe_pair_counts",
    "unigram_surprisal_score",
    "span_dedup_summary",
    # round-3 additions: incremental-ingest dedup + LM corpus statistics
    "incremental_neardup_pairs",
    "bigram_surprisal_score",
    "oov_rate",
    # round-4 additions: lakehouse maintenance + curation + robust monitoring
    "merge_upsert_orders",
    "zorder_layout_stats",
    "token_budget_curation",
    "time_weighted_avg",
    "int8_quant_fidelity",
    # round-4 batch 2: sketch decontamination, data selection, graph step,
    # binary-quantized ANN, governance report
    "bloom_decontamination",
    "dsir_importance_weights",
    "pagerank_step",
    "hamming_topk_rerank",
    "constraint_suite_report",
    # round-4 batch 3: PIT lookup, weighted median, CMS, PSI drift
    "pit_state_lookup",
    "cms_error_audit",
    # round-4 batch 4: KMV set algebra, triangle counting, calendar-lag ACF
    "kmv_distinct_ops",
    "triangle_count_parts",
    "acf_hourly",
    # round-4 batch 5: exact KS drift, Markov transitions
    "ks_drift_stat",
    "markov_transitions",
    # round-4 batches 6-7: Q2 argmin, dataset manifest, time-RANGE window
    "min_cost_supplier",
    "dataset_manifest",
    "rolling_hour_sum",
    # round-4 batch 8: association rules (order co-occurrence + top-k lift)
    "association_rules",
    # round-5 additions: previously-unbenched r4 registry entries + the
    # persisted-reference incremental dedup (write + screen, end-to-end)
    "seasonal_decompose_daily",
    "three_step_funnel",
    "k_anonymity_audit",
    "weighted_median_price",
    "psi_value_drift",
    "incremental_neardup_persisted",
    # round-5 batch 2: attribution/trends/graph/tokenizer extensions
    "multi_touch_attribution",
    "custdist_orders",
    "label_propagation_step",
    "tokenizer_fertility",
    # round-5 batch 3: debounce, rolling distinct, exact analytic ranks
    "debounce_events",
    "rolling_distinct_users",
    "percentile_analytics",
    # round-5 batch 4: deep TPC-H join shapes (Q7/Q8/Q10/Q19/Q20/Q21)
    "volume_shipping",
    "market_share",
    "returned_items_top",
    "disjunctive_revenue",
    "promotion_suppliers",
    "sole_return_suppliers",
    # round-5 batch 5: runtime-filter pruning + graph link prediction
    "runtime_filter_pruned_join",
    "common_neighbors_linkpred",
    "topk_per_group_limit",
    # round-5 batch 6: persisted IVF layout (write + partition-pruned probe)
    "ivf_topk_persisted",
    # round-5 batch 7 (post-freeze extras): Gram matrix, recursive rollup,
    # inverted index, temporal embargo split
    "embedding_gram_matrix",
    "hierarchy_rollup",
    "inverted_index_stats",
    "temporal_embargo_split",
    # round-5 batch 8: k-core peel, rank calibration, LSH recall audit
    "kcore_parts",
    "rank_calibration",
    "lsh_recall_audit",
    # round-5 batch 9: retrieval + robustness (BM25, RRF, SQ8 ANN, MAD)
    "bm25_topk",
    "rrf_fusion_topk",
    "sq8_topk_rerank",
    "mad_outlier_audit",
    # round-5 batch 10: embedding eval, diversity, dynamic partition pruning
    "knn_label_accuracy",
    "simpson_diversity",
    "dpp_partition_pruned_join",
    # round-5 batch 11: allocation, survival, threshold sweep, disorder
    "hamilton_allocation",
    "kaplan_meier_survival",
    "neardup_threshold_sweep",
    "stream_disorder_footrule",
    # round-5 batch 12: RFM cube, dedup provenance, MMR re-rank, SAX motifs
    "rfm_segmentation",
    "neardup_source_matrix",
    "mmr_diversified_topk",
    "sax_motifs",
    # round-5 batch 13: streaming PAA twin, label-noise screen
    "streaming_paa_equiv",
    "label_noise_screen",
    # round-5 batch 14: composed RAG retrieval, readability, CBO stats
    "rag_retrieval_pipeline",
    "readability_scores",
    "cbo_column_stats",
    # round-5 batch 15: kNN confusion margins, MI, co-activation intervals
    "knn_confusion_matrix",
    "mutual_information_lang_source",
    "pairwise_coactivation",
    # round-5 batch 16: temperature allocation, vocab Jaccard, weight ESS
    "temperature_budget_allocation",
    "source_vocab_jaccard",
    "weight_ess_by_source",
    # round-5 batch 17: closeness centrality, exact burst z-test, kappa
    "closeness_centrality",
    "count_burst_hours",
    "classifier_agreement_kappa",
    # round-5 batch 18: watermark p99 sizing (dedup_quality_impact reruns
    # the full LSH clustering — gated but deliberately not bench-listed)
    "late_arrival_p99",
    # round-5 batch 19: prefix-filter joins, drift stats, alignment
    "prefix_filter_neardup_pairs",
    "containment_neardup_pairs",
    "mwu_drift_stat",
    "emd_length_drift",
    "fold_contamination_audit",
    "reciprocal_best_match",
    # round-5 batch 20: PMI, xcorr, graph moments, itemset census
    "bigram_pmi_topk",
    "xcorr_best_lag",
    "degree_assortativity",
    "itemset_support_histogram",
    # round-5 batch 21: 2-D hotspots, Haar, novelty, linkage, HHI
    "grid_hotspots_topk",
    "haar_detail_topk",
    "source_ngram_novelty",
    "record_linkage_pairs",
    "hhi_supplier_concentration",
    # round-5 batch 22: multiset Jaccard, maxgap patterns, bitmasks, item CF
    "weighted_jaccard_pairs",
    "gap_constrained_trigrams",
    "activity_bitmask_hist",
    "item_cf_similarity_topk",
    "session_window_native",
    "streaming_session_window_equiv",
    # round-5 batch 23: NILM steady-state / edge detection family
    "steady_state_segments",
    "power_step_signatures",
    "step_signature_match",
    # round-5 batch 24: Allen algebra, habits, FD profiling, Lorenz curve
    "allen_relations_census",
    "habitual_hours",
    "fd_violation_audit",
    "lorenz_curve_deciles",
    # round-5 batch 25: robust stats (boxplot fences, Theil-Sen, runs test)
    "tukey_fences_outliers",
    "theil_sen_daily_trend",
    "runs_test_randomness",
    # round-5 batch 26: COO matmul, median imputation, min-max scaling
    "coo_matmul_expected_transitions",
    "median_impute_audit",
    "minmax_scale_audit",
    "streaming_bitmask_equiv",
    # round-5 batch 27: greedy set cover, sorted-neighborhood blocking
    "greedy_set_cover_sources",
    "sorted_neighborhood_pairs",
    "prefix_index_pruning_audit",
    "changepoint_binary_seg",
    "changepoint_recursive_3seg",
    "padding_waste_audit",
    # round-6 additions: Q16 census, robust winsorized mean, Zipf profile,
    # LSH cluster-chaining audit, context truncation audit, norm drift
    "parts_supplier_census",
    "winsorized_mean_value",
    "zipf_vocab_shares",
    "neardup_cluster_diameter",
    "context_overflow_audit",
    "embedding_norm_by_source",
    "bm25_topk_indexed",
    "bm25_append_probe_equiv",
    # round-7 addition: RAG pipeline composed over the persisted indexes
    "rag_retrieval_pipeline_persisted",
]


def main() -> None:
    # dev loop: `python bench.py --only=q1,q2` times just those queries
    # (same min-of-3 protocol); the driver always runs the full list.
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    headline = [n for n in HEADLINE if only is None or n in only]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session(app_name="nilm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warmup: JVM + parquet footer caches
    specs["distinct_labels"].spark(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # three runs per query, report the min: the first execution of a plan
    # pays one-time Janino/Python-worker warmup (~1-4 s) that any long-lived
    # deployment amortizes, and this host shows noisy-neighbor variance of
    # up to ~2× between identical runs — min-of-3 is the steady-state
    # per-query cost with the noise floor suppressed.
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(3):
            # cold cache every run (operators may persist() intermediates);
            # only JVM/codegen state stays warm between the two runs
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    import duckdb
    import pandas
    import pyspark

    # engine versions make environment-only divergences (e.g. the r4 HUGEINT
    # typed-hash flags) diagnosable from the artifact
    engines = {
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pandas": pandas.__version__,
    }
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "engines": engines,
    }
    detail_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json")
    if only is None:  # partial dev runs must not clobber the full artifact
        with open(detail_file, "w") as f:
            json.dump(detail, f)
    print(json.dumps(detail))
    # FINAL line: compact, self-contained, parses even under a 2,000-char
    # stdout tail capture (the per-query map above is ~25 chars/query).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "n": len(timings),
                "sf": sf,
                "engines": engines,
                "detail_file": detail_file,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
