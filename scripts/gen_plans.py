#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans for representative queries,
evidencing the plan-quality claims in SCALE.md (pushdown, pruning,
broadcasts, partial aggregation, no cartesians). Regenerate after plan-
affecting changes: python scripts/gen_plans.py [sf_dir]"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nilm_data_framework_spark.plans.registry import all_queries  # noqa: E402
from nilm_data_framework_spark.session import get_session  # noqa: E402

SHOWCASE = [
    ("forecast_revenue", "filters + column pruning pushed into the parquet scan "
     "(`PushedFilters`, 4-column `ReadSchema`), partial+final aggregate"),
    ("local_supplier_volume", "star join: bounded dims (nation/region) are "
     "hint-broadcast; the sf-scaled supplier dim shows as SortMergeJoin in "
     "the STATIC plan and AQE converts it to broadcast at runtime when the "
     "post-filter side is small (test_unhinted_joins_still_broadcast_at_"
     "small_scale asserts the final plan)"),
    ("resample_300s_mean", "tumbling-window aggregate: map-side partial "
     "HashAggregate before the single exchange"),
    ("asof_join_last_purchase", "as-of via union + carry-forward: ONE exchange, "
     "no range cross-product"),
    ("minhash_lsh_pairs_lazy", "signatures per-row (no shuffle before the "
     "banded self-join); candidate pairs, not N², shuffle (lazy form — the "
     "registry query materializes+checkpoints, which would hide the plan)"),
    ("topk_by_value", "top-k plans as TakeOrderedAndProject — no global sort"),
    ("mixture_sample", "stratified hash sampling: pure filter+project, no "
     "hash/range exchange — the when-chain rate table never becomes a join"),
    ("sequence_packing", "sequence packing: one prefix-sum window per shard "
     "= a single hash exchange, no global sort"),
    ("pq_topk", "PQ ADC scan: coded corpus streams against the broadcast "
     "query side (BroadcastNestedLoopJoin), never sort-merged"),
    ("span_dedup_summary", "span-level dedup: explode + ONE window on span "
     "content + doc-keyed reassembly agg — no joins"),
    ("unigram_surprisal_score", "per-doc token counts reduce BEFORE the "
     "vocab join; only the 1-row corpus total is broadcast"),
    ("range_join_campaigns_bucketed", "range join scale path: grid-cell "
     "EQUI-join + residual predicate — no nested loop, no cartesian"),
    ("snapshot_diff_orders", "CDC diff: one full-outer PK join moving only "
     "(key, hash) — content columns pruned at the scan"),
    ("scd2_user_intervals", "SCD2: lag + lead share a single exchange "
     "(same partitioning + ordering)"),
    ("incremental_neardup_pairs_lazy", "incremental LSH: new-batch and "
     "reference sides banded separately, candidates from the cross-side "
     "(band, bucket) EQUI-join — no self-join of the reference corpus, no "
     "cartesian (lazy form — the registry query materializes+checkpoints, "
     "which would render as a checkpoint scan, not the join topology)"),
    ("oov_rate", "OOV membership: limit-bounded vocab broadcasts "
     "(BroadcastHashJoin); token occurrences reduce per-doc before the join"),
    ("bigram_surprisal_score", "bigram LM scoring: per-doc pair reduction "
     "feeds linear equi-joins on gram keys; only the 1-row total is "
     "broadcast-nested-loop"),
    ("merge_upsert_orders", "MERGE reconciliation: ONE full-outer PK join "
     "(SortMergeJoin — both sides sf-scaled, no forced broadcast); "
     "coalesce-override + action tagging are projections on top"),
    ("zorder_layout_stats", "Z-order layout: integer Morton-interleave is a "
     "narrow codegen projection; only the 1-row extents aggregate is "
     "broadcast — the fact table never shuffles before the file-stats agg"),
    ("time_weighted_avg", "LOCF time-weighted mean: lead window and the "
     "per-key aggregate share one exchange on the series key"),
    ("bloom_decontamination", "Bloom screen: probe positions equi-join the "
     "≤m-row bit table (AQE-broadcast); the corpus never self-joins — the "
     "exact-gram join runs NEXT TO it only to measure false positives"),
    ("hamming_topk_rerank", "binary-quantized ANN: sign words are a narrow "
     "codegen projection; the Hamming scan streams against the broadcast "
     "query side; exact cosine touches only Q x rerank rows"),
    ("pagerank_step", "PageRank step: the distinct edge list is "
     "checkpointed once (every term derives from it — the lazy form "
     "re-scans the fact table per term); out-degrees + contributions are "
     "linear hash aggs; rank joins by key (AQE-decided, no forced "
     "broadcast over the sf-scaled vertex table); 1-row N/dangling "
     "aggregates broadcast"),
    ("concurrency_peaks", "sweep line: interval overlap WITHOUT a range "
     "join — delta agg + one window on the group key, no cartesian"),
    ("pareto_front_docs", "2-D skyline: TWO window functions over ONE "
     "exchange+sort on (lang, n_chars) — no self-join, no NOT-EXISTS "
     "anti-join; the quadratic formulation exists only in the oracle"),
    ("triangle_count_parts_lazy", "triangle count (lazy form — the "
     "registered query checkpoints the edge list, which renders as an RDD "
     "scan): JOIN-FREE pair generation (order groupBy + HOF explosion); "
     "degree-ordered orientation makes every join an EQUI-join on vertex "
     "ids (wedge self-join + left-semi closure probe); no cartesian "
     "anywhere, hub fan-out capped by orientation"),
    ("kmv_distinct_ops", "KMV set algebra: ONE distinct on (type, hash); "
     "pair unions join the ≤k-row sketches to a LITERAL membership dim "
     "(LocalRelation broadcast — nothing sf-scaled is hinted)"),
    ("ks_drift_stat", "exact KS: series compressed to per-(key, value) "
     "counts BEFORE the single cumulative window; max agg on top — one "
     "exchange end to end"),
    ("min_cost_supplier", "Q2 argmin: (part, supplier) reduction -> one "
     "rank window per part -> AQE-decided dim joins (no forced broadcast "
     "over sf-scaled part/supplier)"),
    ("incremental_neardup_persisted_lazy", "persisted-reference incremental "
     "LSH (r5): the corpus side of BOTH joins is a bucketed table scan "
     "with NO Exchange above it — only the arriving batch is shuffled "
     "into the reference's (band, bucket) / (id) bucketing (lazy form — "
     "the registered query materializes)"),
    ("multi_touch_attribution", "multi-touch attribution: touch-to-"
     "conversion assignment is a conditional window minimum riding ONE "
     "user-key exchange — no touch x purchase range join; credits are "
     "exact integer basis points"),
    ("custdist_orders", "TPC-H Q13 shape: LEFT join keeps zero-order "
     "customers; two hash aggs, the second over the O(distinct counts) "
     "frame"),
    ("disjunctive_revenue", "TPC-H Q19 shape: the 3-branch cross-side OR "
     "is Catalyst-extracted into per-side PushedFilters on BOTH scans; "
     "the full disjunction evaluates once post-join"),
    ("runtime_filter_pruned_join", "runtime Bloom-filter pruning (r5): "
     "might_contain(bloom, xxhash64(l_orderkey)) injected into the "
     "lineitem scan — fact rows shed BEFORE the shuffle; gates scoped "
     "per-plan and restored (operators/runtime_filters.py)"),
    ("topk_per_group_limit", "per-group top-k (r5): rank predicate "
     "rewritten to WindowGroupLimit — map-side k-bounding before the "
     "exchange, the shuffle carries <= k rows per (mapper, group)"),
    ("sole_return_suppliers", "TPC-H Q21 shape: the EXISTS/NOT-EXISTS "
     "pair decorrelated into one per-order distinct-count aggregate — "
     "equi-joins only, TakeOrderedAndProject top-10"),
    ("ivf_topk_persisted", "persisted IVF layout (r5): the corpus scan "
     "carries the probed centroid ids as PartitionFilters — probing "
     "n_probe of n_centroids lists reads only those directories; "
     "result-invariant vs the in-memory IVF (shared oracle)"),
    ("embedding_gram_matrix", "distributed Gram matrix (r5): the d² "
     "expansion is two chained Generates on the same row — NO self-join; "
     "map-side partial HashAggregate bounds the single agg exchange at "
     "d(d+1)/2 rows per partition"),
    ("inverted_index_stats", "inverted index (r5): ONE exchange "
     "(hash-partition by term) serves both the (term, doc) tf aggregate "
     "and the per-term posting aggregate; top-k is TakeOrderedAndProject"),
    ("dpp_partition_pruned_join", "dynamic partition pruning (r5): the "
     "fact scan's PartitionFilters carry a dynamicpruning subquery "
     "(SubqueryAdaptiveBroadcast) — unprobed partition directories are "
     "never read; the runtime twin of the static partition filter"),
    ("bm25_topk", "BM25 retrieval (r5): map-only per-doc tf/dl (no "
     "explode, no shuffle before the 1-row corpus agg); the single-row "
     "stats frame broadcasts back (BroadcastNestedLoopJoin of a 1-row "
     "side); global top-k is one rank window"),
    ("sq8_topk_rerank", "SQ8 quantized ANN (r5): 0..255 codes are a "
     "narrow codegen projection from plan-literal bounds; the integer-dot "
     "scan streams against the broadcast query side; exact u6 re-rank "
     "touches only Q x rerank rows"),
    ("mad_outlier_audit", "exact MAD audit (r5): both rank windows and "
     "all three aggregates ride ONE exchange on the group key; medians "
     "picked by conditional aggregation, never a percentile UDF or "
     "self-join"),
    ("prefix_filter_neardup_pairs", "prefix-filtered exact Jaccard (r5): "
     "the df order is a WINDOW SORT KEY inside each doc partition (no "
     "global rank); candidates come from the prefix self-equi-join on "
     "gram — posting-list-bounded, never an all-pairs product; "
     "verification is an array_intersect projection over candidates"),
    ("session_window_native", "native session windows (r5): the plan's "
     "UpdatingSessions/MergingSessions operators do the gap-merge INSIDE "
     "the aggregation — one exchange on the session key, no window-"
     "function pass, and the identical expression streams"),
    ("grid_hotspots_topk", "separable 2-D box filter (r5): two cascaded "
     "RANGE-frame windows, each exchanging on the OTHER axis — the 3x3 "
     "neighborhood never becomes a 9-way self-join; top-k is "
     "TakeOrderedAndProject over the constant-size grid"),
    ("haar_detail_topk", "Haar details (r5): all 9 dyadic levels from ONE "
     "partial+final aggregate after the 9-row level-dim broadcast "
     "nested-loop cross — no per-level passes over the fact agg"),
    ("itemset_support_histogram", "itemset census (r5): pair AND triple "
     "candidates from chained HOF transforms over the SAME basket array "
     "(one groupBy(order) exchange) — the oracle's three-way self-join "
     "never appears in the Spark plan"),
    ("steady_state_segments", "NILM steady states (r5): lag, running "
     "boundary sum, and the per-segment aggregate all ride ONE exchange "
     "on the channel key — the W5 gaps-and-islands shape on continuous "
     "values"),
    ("lorenz_curve_deciles", "bucketed ntile (r6): the global decile "
     "assignment is per-value counts + ONE support-sized cumulative "
     "window + a value-partitioned row_number — no Exchange "
     "SinglePartition over corpus rows (compare the r5 plan's global "
     "ntile sort); the only single-partition work is the 10-row decile "
     "aggregate and the n_chars support"),
    ("rrf_fusion_topk", "shortlist-exact RRF (r6): two "
     "TakeOrderedAndProject shortlists, candidate ranks rebuilt by a "
     "support inequality BroadcastNestedLoopJoin (build side = the "
     "bounded candidate set) + a value equi-join tie count — the "
     "full-corpus rank windows are gone"),
    ("sorted_neighborhood_pairs", "banded SNM (r6): bucketed rank on the "
     "name-prefix + a band-keyed self-join with the W-row boundary "
     "overlap union — every Exchange is hashpartitioning, none "
     "SinglePartition"),
    ("parts_supplier_census", "TPC-H Q16 shape (r6): NOT-IN exclusion "
     "planned as a left-anti hash join; distinct and census aggregates "
     "keep map-side partial aggregation"),
    ("stratified_split_exact", "exact stratified split (r8): bucketed "
     "global rank (one hash exchange on the (lang, h-range) bucket + a "
     "support-sized cumulative window) joined to the bounded per-lang "
     "offset support — no per-stratum sort of raw rows ever appears"),
    ("cosine_topk_lsh_multiprobe", "multi-probe SRP-LSH (r8): the query "
     "side explodes Hamming-1 probe masks; candidates come from the same "
     "(tbl, bkt) EQUI-join as plain LSH — corpus bucketed once, no nested "
     "loop, no extra stored table"),
    ("scd2_incremental_equiv", "incremental SCD2 (r8): closed runs pass "
     "through as a filter; the re-collapse runs lag+lead over (seeds ∪ "
     "batch) only — every window exchange is keyed on user_id, none "
     "SinglePartition"),
    ("spearman_rho_corr", "Spearman rho (r8c): TWO bucketed global ranks "
     "over one checkpointed base (each: bucket hash exchange + "
     "support-sized cumulative + bucket-partitioned row_number) joined "
     "on custkey — no SinglePartition sort anywhere; rho ships as the "
     "undivided exact rational"),
    ("apriori_triples", "Apriori level-3 (r8c): triples via two "
     "codegen'd basket-key equi-joins over the checkpointed membership "
     "frame (measured faster than the depth-3 interpreted HOF); pair "
     "supports via the single-level HOF explosion (its winning depth); "
     "TakeOrderedAndProject top-25"),
    ("winnowing_fingerprint_pairs", "winnowing (r8c): fingerprint "
     "SELECTION is a pure per-row HOF pipeline (tokenize → gram-hash → "
     "sliding array_min) with NO exchange; pairs form only inside the "
     "df-capped fp-bucket equi-join — no cross join, no window"),
    ("maxsim_multivector_topk", "MaxSim late interaction (r8c): the "
     "6-row query slice broadcasts (BroadcastNestedLoopJoin); per-"
     "(query-token, doc) maxes partial-agg map-side; the 3-term score "
     "is a projection over PIVOTED columns — no shuffled float sum"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def minhash_lazy(spark, sf_dir):
        from nilm_data_framework_spark.operators import dedup as D
        from nilm_data_framework_spark.sources.testdata import load_table

        docs = load_table(spark, sf_dir, "documents", parallelize=True)
        return D.minhash_lsh_pairs(docs, materialize=False)

    def triangle_lazy(spark, sf_dir):
        from pyspark.sql import functions as F

        from nilm_data_framework_spark.operators import graph as G
        from nilm_data_framework_spark.sources.testdata import load_table

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        parts = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("ps")
        )
        pairs = parts.select(
            F.explode(F.expr(
                "flatten(transform(ps, (x, i) -> transform("
                "slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(x AS src, y AS dst))))"
            )).alias("p")
        ).select("p.src", "p.dst")
        edges = (
            pairs.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("_sup"))
            .filter(F.col("_sup") >= 2)
            .drop("_sup")
        )
        return G.triangle_count(edges, materialize=False)

    def incremental_lazy(spark, sf_dir):
        from pyspark.sql import functions as F

        from nilm_data_framework_spark.operators import dedup as D
        from nilm_data_framework_spark.sources.testdata import load_table

        docs = load_table(spark, sf_dir, "documents", parallelize=True)
        return D.minhash_lsh_join(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
            materialize=False,
        )

    parts = [
        "# PLANS — representative physical plans\n\n"
        "Auto-generated by `scripts/gen_plans.py` at " + sf_dir + ". These are\n"
        "the `.explain(\"formatted\")` outputs backing SCALE.md's plan-quality\n"
        "claims; `tests/test_plan_quality.py` asserts the load-bearing\n"
        "properties so they cannot regress silently.\n"
    ]
    def persisted_lsh_lazy(spark, sf_dir):
        import tempfile

        from pyspark.sql import functions as F

        from nilm_data_framework_spark.operators import dedup as D
        from nilm_data_framework_spark.sources.testdata import load_table

        docs = load_table(spark, sf_dir, "documents", parallelize=True)
        prefix = "plans_lsh_ref"
        from nilm_data_framework_spark.tmpdirs import pid_scratch_dir

        # pid-keyed + dead-owner reaping (mkdtemp-per-run leaked one
        # corpus-sized external layout per gen_plans invocation)
        D.write_lsh_reference(
            docs.filter(F.col("doc_id") % 5 != 0), prefix, buckets=8,
            path=pid_scratch_dir(
                os.path.join(tempfile.gettempdir(), "plans_lsh_ref"), "ref_"
            ),
        )
        return D.minhash_lsh_join_reference(
            docs.filter(F.col("doc_id") % 5 == 0), prefix, materialize=False
        )

    for name, why in SHOWCASE:
        if name == "minhash_lsh_pairs_lazy":
            df = minhash_lazy(spark, sf_dir)
        elif name == "incremental_neardup_persisted_lazy":
            df = persisted_lsh_lazy(spark, sf_dir)
        elif name == "incremental_neardup_pairs_lazy":
            df = incremental_lazy(spark, sf_dir)
        elif name == "triangle_count_parts_lazy":
            df = triangle_lazy(spark, sf_dir)
        else:
            df = specs[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        parts.append(f"\n## {name}\n\n*{why}*\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(parts))
    print(f"PLANS.md: {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
