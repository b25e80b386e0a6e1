"""Round-9 kernel contracts: filtered vector search, LSH reference append,
personalized PageRank. The DuckDB gates in queries/extra_ops_r9.py prove
cross-engine exactness; these tests pin the OPERATOR-level equivalences the
gates rely on."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from nilm_data_framework_spark.operators import dedup as D
from nilm_data_framework_spark.operators import similarity as S
from nilm_data_framework_spark.tmpdirs import pid_scratch_dir
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_filtered_ivf_equals_ivf_over_prefiltered_corpus(spark):
    # pre-filter pushed into the pruned scan must equal running the SAME
    # probe (same trained centroids, same probe dial) over a corpus that
    # was filtered before indexing: the predicate only removes candidates,
    # it never changes assignment or probing.
    emb = _emb(spark)
    cents = S.sample_centroids(emb, 8, "vec_id", "embedding", "hash", 42)
    queries = emb.filter(F.col("vec_id") < 5)
    pred = F.col("label") == 3
    path = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_test_ivf_flteq"), "c_"
    )
    S.write_ivf_corpus(emb, path, cents)
    got = (
        S.ivf_topk_partitioned(
            spark, path, queries, k=4, centroids=cents, n_probe=3,
            pre_filter=pred,
        )
        .select("query_id", "match_id", "rk")
        .collect()
    )
    want = (
        S.ivf_topk(
            emb.filter(pred), queries, k=4, n_probe=3, centroids=cents
        )
        .select("query_id", "match_id", "rk")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_filtered_ivf_results_all_match_predicate(spark):
    emb = _emb(spark)
    cents = S.sample_centroids(emb, 8, "vec_id", "embedding", "hash", 42)
    queries = emb.filter(F.col("vec_id") < 5)
    path = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_test_ivf_fltpred"), "c_"
    )
    S.write_ivf_corpus(emb, path, cents)
    out = S.ivf_topk_partitioned(
        spark, path, queries, k=4, centroids=cents, n_probe=3,
        pre_filter=F.col("label") == 3,
    )
    labels = {
        r["label"]
        for r in out.join(
            emb.select(F.col("vec_id").alias("match_id"), "label"), "match_id"
        )
        .select("label")
        .collect()
    }
    assert labels == {3}


def test_append_lsh_reference_equals_one_shot(spark):
    # segment algebra: write(A) + append(B) must screen a probe batch
    # identically to a one-shot reference over A ∪ B — same candidates,
    # same verified pairs, same jaccard.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 3 != 2)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    a = ref.filter(F.col("doc_id") % 2 == 0)
    b = ref.filter(F.col("doc_id") % 2 == 1)
    base = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_test_lsh_app"), "r_"
    )
    pid = os.getpid()
    D.write_lsh_reference(
        a, f"t_lshapp_inc_{pid}", shingle_n=3, num_hashes=16, bands=4,
        buckets=8, path=os.path.join(base, "inc"),
    )
    D.append_lsh_reference(b, f"t_lshapp_inc_{pid}")
    got = sorted(
        map(
            tuple,
            D.minhash_lsh_join_reference(
                probe, f"t_lshapp_inc_{pid}", jaccard_threshold=0.3
            )
            .select("new_id", "ref_id")
            .collect(),
        )
    )
    D.write_lsh_reference(
        ref, f"t_lshapp_full_{pid}", shingle_n=3, num_hashes=16, bands=4,
        buckets=8, path=os.path.join(base, "full"),
    )
    want = sorted(
        map(
            tuple,
            D.minhash_lsh_join_reference(
                probe, f"t_lshapp_full_{pid}", jaccard_threshold=0.3
            )
            .select("new_id", "ref_id")
            .collect(),
        )
    )
    assert got == want


def test_ppr_with_all_vertices_seeded_equals_uniform_pagerank(spark):
    # seed set = every vertex collapses the seeded recurrence to the
    # uniform one (|seeds| = N, teleport/dangling land everywhere), so the
    # two kernels must agree bit-for-bit.
    from nilm_data_framework_spark.queries.extra_ops_r8 import pagerank_power
    from nilm_data_framework_spark.queries.extra_ops_r9 import (
        personalized_pagerank_power,
    )

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (4, 2), (5, 5)],
        "src long, dst long",
    )
    uni = {r["vertex"]: r["r"] for r in pagerank_power(e, iters=3).collect()}
    ppr = {
        r["vertex"]: r["r"]
        for r in personalized_pagerank_power(
            e, lambda v: F.lit(True), iters=3
        ).collect()
    }
    assert uni == ppr


def test_ppr_nonseed_sources_hold_zero_mass(spark):
    # on a bipartite src→dst graph a non-seed SOURCE vertex has no
    # in-edges and no teleport — its rank must be exactly 0 every round.
    from nilm_data_framework_spark.queries.extra_ops_r9 import (
        personalized_pagerank_power,
    )

    e = spark.createDataFrame(
        [(0, 101), (2, 101), (2, 103), (4, 105), (6, 105)],
        "src long, dst long",
    )
    out = {
        r["vertex"]: r["r"]
        for r in personalized_pagerank_power(
            e, lambda v: v == 0, iters=2
        ).collect()
    }
    assert out[0] > 0
    for nonseed_src in (2, 4, 6):
        assert out[nonseed_src] == 0
    assert out[101] > 0  # seed's part receives damped mass
    assert out[105] == 0  # part reachable only from non-seeds stays dry
