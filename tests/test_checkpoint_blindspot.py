"""Checkpoint blind-spot guard (VERDICT r9 items 4/6 — close it for good).

The r9 optimization round proved the failure mode: an EAGER localCheckpoint
truncates df.explain() at `Scan ExistingRDD`, so the explain-walking guards
(test_plan_quality) never saw that exact_ranks_for_candidates' support-
inequality join planned CartesianProduct at runtime inside every _rag_tail
caller — for multiple rounds. These tests re-build each checkpointing
operator with `DataFrame.localCheckpoint` monkeypatched to the identity, so
the FULL Catalyst tree (loop rounds unrolled) is visible to the same
quadratic-fallback assertions. Fixtures stay tiny: without the lineage cut
a loop's tree grows ~2-3x per round, which is exactly why production keeps
the checkpoints — the guard only needs the plan, not the runtime.

This harness would have caught the r9 RAG cartesian BEFORE the checkpoint
was removed: rag_retrieval_pipeline is asserted below with checkpoints
no-op'd, which is the pre-r9 hiding configuration.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_checkpoints(monkeypatch):
    """localCheckpoint → identity: plans stay fully visible to explain."""
    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    yield


def _plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _assert_no_quadratic_fallback(plan: str, what: str, allow_bnlj: bool) -> None:
    assert "CartesianProduct" not in plan, f"{what}: plans a CartesianProduct"
    if not allow_bnlj:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{what}: equi-join kernel fell back to a nested loop"
        )


def test_hashmin_cc_loop_plans_no_cartesian(spark, no_checkpoints):
    from nilm_data_framework_spark.operators import dedup as D

    nodes = spark.range(0, 8).select(F.col("id"))
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = D.connected_components(nodes, edges, id_col="id")
    # every join in the hash-min loop is an equi-join (edge ⋈ labels,
    # labels ⋈ nbr_min, the singleton anti-join)
    _assert_no_quadratic_fallback(
        _plan_of(out), "connected_components (unrolled loop)", allow_bnlj=False
    )


def test_star_cc_loop_plans_no_cartesian(spark, no_checkpoints):
    from nilm_data_framework_spark.operators import dedup as D

    nodes = spark.range(0, 8).select(F.col("id"))
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = D.connected_components_star(nodes, edges, id_col="id")
    _assert_no_quadratic_fallback(
        _plan_of(out), "connected_components_star (unrolled loop)", allow_bnlj=False
    )


def test_pagerank_loop_plans_no_cartesian(spark, no_checkpoints):
    # BNLJ is expected here: the 1-row dangling-mass aggregate is attached
    # via crossJoin(broadcast(...)) by design. The guard is the cartesian.
    from nilm_data_framework_spark.queries.extra_ops_r8 import pagerank_power

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    out = pagerank_power(e, iters=2)
    plan = _plan_of(out)
    _assert_no_quadratic_fallback(plan, "pagerank_power (unrolled)", allow_bnlj=True)


def test_ppr_loop_plans_no_cartesian(spark, no_checkpoints):
    from nilm_data_framework_spark.queries.extra_ops_r9 import (
        personalized_pagerank_power,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    out = personalized_pagerank_power(e, lambda v: v < 2, iters=2)
    _assert_no_quadratic_fallback(
        _plan_of(out), "personalized_pagerank_power (unrolled)", allow_bnlj=True
    )


def test_kcenter_loop_plans_no_cartesian(spark, no_checkpoints):
    from nilm_data_framework_spark.queries.extra_ops_r9b import _kcenter_kernel

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = _kcenter_kernel(emb.limit(32))
    _assert_no_quadratic_fallback(
        _plan_of(out), "_kcenter_kernel (unrolled)", allow_bnlj=True
    )


def test_bpe_train_loop_plans_no_cartesian(spark, no_checkpoints):
    from nilm_data_framework_spark.queries.extra_ops_r9b import _bpe_train_frames

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(64)
    rules, w = _bpe_train_frames(docs, rounds=2)
    _assert_no_quadratic_fallback(
        _plan_of(w), "_bpe_train_frames (unrolled)", allow_bnlj=True
    )


def test_rag_tail_plans_no_cartesian_even_behind_checkpoints(spark, no_checkpoints):
    # The regression test for the r9 defect itself: with every checkpoint
    # no-op'd (the pre-r9 hiding configuration) the full _rag_tail tree is
    # visible — the exact_ranks support-inequality joins must plan as
    # broadcast builds off the limit-carried candidate bound, never as
    # CartesianProduct.
    from nilm_data_framework_spark.plans.registry import all_queries

    out = all_queries()["rag_retrieval_pipeline"].spark(spark, SF_DIR)
    plan = _plan_of(out)
    assert "CartesianProduct" not in plan, (
        "_rag_tail plans a CartesianProduct when its checkpoints are removed "
        "— the _RAG_CANDS_BOUND limit no longer reaches the planner"
    )
