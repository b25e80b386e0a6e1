"""Re-attestation front-load list (VERDICT r9 items 1b/8).

The round driver records CORRECTNESS rows for only the FIRST 50 registry
entries. With every query driver-attested at least once (the unrecorded
backlog emptied in r9), the window's slots now go to RE-attestation of the
queries whose PHYSICAL EXECUTION was rewritten since their last driver
record — so the driver, not only the builder's own driver_sim runs, attests
the rewritten paths. all_queries() sorts: never-recorded first (none today,
but the rule survives new queries), then REATTEST in registration order,
then the rest.

Hand-maintained each optimization round: add every query whose plan/operator
internals changed this round, drop names once a later CORRECTNESS file
re-records them post-rewrite. tests/test_registry_order.py pins REATTEST
into the 50-row window.
"""

from __future__ import annotations

# r9 rewrites never driver-re-attested after the rewrite (VERDICT r9 gate
# note) + every path whose physical execution round 10 touches.
REATTEST: frozenset[str] = frozenset({
    # r9 rewritten paths outside the r9 window (VERDICT r9 item 1b)
    "rag_retrieval_pipeline",
    "rag_retrieval_pipeline_persisted",
    "mmr_diversified_topk",
    "pagerank_power_iterations",
    "neardup_clusters",
    "entity_resolution_clusters",
    "bm25_index_lifecycle",
    "neardup_cluster_diameter",
    "incremental_neardup_clusters_equiv",
    "entity_clusters_incremental_equiv",
    "bm25_append_probe_equiv",
    "incremental_neardup_persisted",
    "training_set_materialize",
    # r10 optimization targets (rewritten this round)
    "kmv_distinct_ops",
    "kmv_jaccard_pairs",
    "knn_confusion_matrix",
    "label_noise_screen",
    "lsh_recall_audit",
    "tensor_export",
    "tensor_export_flat",
    "prefix_filter_neardup_pairs",
    "containment_neardup_pairs",
    "greedy_set_cover_sources",
    "weighted_jaccard_pairs",
    "degree_assortativity",
    "item_cf_similarity_topk",
    "bloom_decontamination",
})
