"""Unit/invariant tests for the r8c batch — hand-built fixtures where the
expected answer is checkable by eye (the DuckDB oracles cover at-scale
equivalence), plus the authoring-time near-misses pinned so they can never
regress silently."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.windows import interval_coalesce

SF0001 = "/root/testdata/sf0.001"


def _iv(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "s", "e"])
    )


def test_interval_coalesce_merges_and_splits(spark):
    # [0,10) and [5,20) overlap -> one island [0,20); [20,30) TOUCHES and
    # merges; [40,50) is a strict gap -> new island.
    rows = [(1, 1, 0, 10), (1, 2, 5, 20), (1, 3, 20, 30), (1, 4, 40, 50)]
    out = interval_coalesce(_iv(spark, rows), ["user_id"]).collect()
    got = sorted((r["island_s"], r["island_e"], r["n_raw_in"]) for r in out)
    assert got == [(0, 30, 3), (40, 50, 1)]


def test_interval_coalesce_equal_start_tie(spark):
    """The pinned near-miss: two intervals with IDENTICAL (s, e) starting a
    new island after a gap. With the island-id window ordered by
    (s, e, new_island), the marked row sorts AFTER its equal-(s, e) peer,
    the peer joins the PREVIOUS island, and the gap [10, 100) is silently
    bridged (covered length 110 instead of 10 + 10 = 20). The kernel
    orders both windows by the same (s, tiebreak) total key instead."""
    rows = [(1, 1, 0, 10), (1, 2, 100, 110), (1, 3, 100, 110)]
    out = interval_coalesce(_iv(spark, rows), ["user_id"]).collect()
    got = sorted((r["island_s"], r["island_e"], r["n_raw_in"]) for r in out)
    assert got == [(0, 10, 1), (100, 110, 2)]
    covered = sum(e - s for s, e, _ in got)
    assert covered == 20


def test_interval_coalesce_per_key_isolation(spark):
    # islands never merge across keys, whatever the timestamps do
    rows = [(1, 1, 0, 10), (2, 2, 5, 9)]
    out = interval_coalesce(_iv(spark, rows), ["user_id"]).collect()
    assert len(out) == 2
    assert {r["user_id"] for r in out} == {1, 2}


def test_kendall_identities(spark):
    """Pair classification is a partition: C + D + ties_x + ties_y +
    ties_xy == n_pairs == n(n-1)/2 per bucket, and s == C - D."""
    from nilm_data_framework_spark.plans.registry import all_queries

    out = all_queries()["kendall_tau_daily"].spark(spark, SF0001).collect()
    assert out, "kendall returned no rows at sf0.001"
    for r in out:
        parts = (
            r["concordant"]
            + r["discordant"]
            + r["ties_x"]
            + r["ties_y"]
            + r["ties_xy"]
        )
        assert parts == r["n_pairs"], r
        assert r["s"] == r["concordant"] - r["discordant"], r


def test_spearman_rho_bounds(spark):
    """|rho_num| <= rho_den (rho in [-1, 1]) and rho_den == n^3 - n."""
    from nilm_data_framework_spark.plans.registry import all_queries

    r = all_queries()["spearman_rho_corr"].spark(spark, SF0001).collect()[0]
    assert r["rho_den"] == r["n"] ** 3 - r["n"]
    assert abs(r["rho_num"]) <= r["rho_den"]
    assert r["rho_num"] == r["rho_den"] - 6 * r["sum_d2"]


def test_conformal_k_and_coverage_shape(spark):
    """k is the exact ceil(0.9(n_cal+1)) order-statistic index and the
    empirical coverage can never exceed 10000 e4."""
    from nilm_data_framework_spark.plans.registry import all_queries

    out = (
        all_queries()["conformal_split_threshold"].spark(spark, SF0001)
    ).collect()
    assert out
    for r in out:
        assert r["k"] == (9 * (r["n_cal"] + 1) + 9) // 10
        assert 0 <= r["n_covered"] <= r["n_test"]
        assert 0 <= r["coverage_e4"] <= 10000


def test_mcnemar_cells_partition(spark):
    """The 2x2 cells partition the corpus and chi2_den is the discordant
    total."""
    from nilm_data_framework_spark.plans.registry import all_queries
    from nilm_data_framework_spark.sources.testdata import load_table

    r = (
        all_queries()["mcnemar_gate_comparison"].spark(spark, SF0001)
    ).collect()[0]
    n_docs = load_table(spark, SF0001, "documents").count()
    assert r["n11"] + r["n00"] + r["n01"] + r["n10"] == n_docs
    assert r["chi2_den"] == r["n01"] + r["n10"]
    assert r["chi2_num"] == (r["n01"] - r["n10"]) ** 2


def test_bitemporal_monotone_in_probe(spark):
    """For a fixed user, the chosen valid time is non-decreasing in the
    probe point (later probes can only see more versions), and every
    chosen version respects both axis bounds."""
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["bitemporal_pit_lookup"].spark(spark, SF0001)
    ).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r["vt_us"] <= r["vt_probe_us"], r
        by_user.setdefault(r["user_id"], []).append(
            (r["probe_idx"], r["vt_us"])
        )
    for picks in by_user.values():
        picks.sort()
        vts = [v for _, v in picks]
        assert vts == sorted(vts), picks


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ivs=st.lists(
        # (user, start, length): ts drawn 0..40 with lengths 1..12 so
        # overlaps, touches, containments, AND equal-(s, e) duplicates all
        # occur; two users exercise partition isolation
        st.tuples(st.integers(1, 2), st.integers(0, 40), st.integers(1, 12)),
        min_size=1,
        max_size=20,
    )
)
def test_interval_coalesce_matches_python_union(spark, ivs):
    """Property oracle: island spans and the per-user covered length must
    equal a pure-Python sweep merging sorted intervals (touch merges)."""
    rows = [
        (u, i, s, s + ln) for i, (u, s, ln) in enumerate(ivs)
    ]
    df = _iv(spark, rows)
    got = {}
    for r in interval_coalesce(df, ["user_id"]).collect():
        got.setdefault(r["user_id"], []).append(
            (r["island_s"], r["island_e"], r["n_raw_in"])
        )
    want = {}
    by_user = {}
    for u, _i, s, e in rows:
        by_user.setdefault(u, []).append((s, e))
    for u, spans in by_user.items():
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1] = (
                    merged[-1][0],
                    max(merged[-1][1], e),
                    merged[-1][2] + 1,
                )
            else:
                merged.append((s, e, 1))
        want[u] = [(s, e, n) for s, e, n in merged]
    assert {u: sorted(v) for u, v in got.items()} == {
        u: sorted(v) for u, v in want.items()
    }


def test_interval_coalesce_weight_hook(spark):
    """n_raw_in sums the weight column when given (the incremental-fold
    hook): a 3-member island re-entering as one weighted span plus one
    overlapping batch row must report 4 members."""
    rows = pd.DataFrame(
        [(1, -1, 0, 30, 3), (1, 5, 25, 40, 1)],
        columns=["user_id", "event_id", "s", "e", "w"],
    )
    out = interval_coalesce(
        spark.createDataFrame(rows), ["user_id"], weight="w"
    ).collect()
    assert [(r["island_s"], r["island_e"], r["n_raw_in"]) for r in out] == [
        (0, 40, 4)
    ]
