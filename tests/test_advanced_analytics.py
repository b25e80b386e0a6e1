"""Unit tests for the batch-4 advanced-analytics operators: KMV sketches,
trimmed mean, calendar-lag autocorrelation, 2-D skyline, triangle count.
Cross-engine value parity for the registered queries runs in
test_oracle_parity.py; these pin the operator semantics on hand-checkable
fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- KMV ----------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    from nilm_data_framework_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [("a", f"u{i % 7}") for i in range(50)], "g string, item string"
    )
    sk = SK.kmv_sketch(df, ["g"], "item", k=64)
    assert sk.count() == 7  # fewer distinct than k: sketch IS the set
    est = SK.kmv_estimate(sk, ["g"], k=64).collect()[0]
    assert est["kmv_est"] == 7.0  # exact when n < k


def test_kmv_estimate_within_tolerance(spark):
    from nilm_data_framework_spark.operators import sketches as SK

    n = 5000
    df = spark.createDataFrame(
        [("a", f"user-{i}") for i in range(n)], "g string, item string"
    )
    est = SK.kmv_estimate(SK.kmv_sketch(df, ["g"], "item", k=256), ["g"], k=256)
    got = est.collect()[0]["kmv_est"]
    # k=256 → relative std err ~ 1/sqrt(k-2) ≈ 6.3%; allow 4σ
    assert abs(got - n) / n < 0.25


def test_kmv_union_merges_sketches(spark):
    from nilm_data_framework_spark.operators import sketches as SK

    # A = {0..99}, B = {50..149}: bottom-k(A∪B) == bottom-k(bottom-k(A) ∪
    # bottom-k(B)) — mergeability, checked exactly.
    rows = [("a", f"x{i}") for i in range(100)] + [
        ("b", f"x{i}") for i in range(50, 150)
    ]
    df = spark.createDataFrame(rows, "g string, item string")
    k = 32
    singles = SK.kmv_sketch(df, ["g"], "item", k)
    merged_from_sketches = sorted(
        r["hv"] for r in singles.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    union_direct = SK.kmv_sketch(
        df.select(F.lit("u").alias("g"), "item"), ["g"], "item", k
    )
    assert sorted(r["hv"] for r in union_direct.select("hv").collect()) == (
        merged_from_sketches
    )


# --- trimmed mean -------------------------------------------------------------


def test_trimmed_mean_drops_tails(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # 10 values: 0, 1..8, 1000 — 10% trim drops exactly the 0 and the 1000.
    vals = [0.0] + [float(v) for v in range(1, 9)] + [1000.0]
    df = spark.createDataFrame([(1, v) for v in vals], "g long, v double")
    got = RB.trimmed_mean(df, ["g"], "v", trim=0.1).collect()[0]
    assert got["n_used"] == 8
    assert got["trimmed_mean"] == pytest.approx(4.5)


def test_trimmed_mean_zero_trim_is_mean(spark):
    from nilm_data_framework_spark.operators import robust as RB

    df = spark.createDataFrame([(1, float(v)) for v in range(5)], "g long, v double")
    got = RB.trimmed_mean(df, ["g"], "v", trim=0.0).collect()[0]
    assert got["n_used"] == 5 and got["trimmed_mean"] == pytest.approx(2.0)


# --- autocorrelation ----------------------------------------------------------


def test_acf_alternating_series(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # x = +1/-1 alternating on a dense grid: r_1 → -1, r_2 → +1 (up to the
    # finite-sample pair-count correction; n=40 keeps it within 0.08).
    rows = [(1, t, 1 if t % 2 == 0 else -1) for t in range(40)]
    df = spark.createDataFrame(rows, "g long, t long, x long")
    out = {
        r["lag"]: r["acf"]
        for r in RB.autocorrelation(df, ["g"], "t", "x", [1, 2]).collect()
    }
    assert out[1] == pytest.approx(-1.0, abs=0.08)
    assert out[2] == pytest.approx(1.0, abs=0.08)


def test_acf_gaps_drop_pairs(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # grid 0,1,2,5,6: lag-1 pairs are (0,1),(1,2),(5,6) — NOT (2,5).
    rows = [(1, t, t * t % 5) for t in [0, 1, 2, 5, 6]]
    df = spark.createDataFrame(rows, "g long, t long, x long")
    got = RB.autocorrelation(df, ["g"], "t", "x", [1]).collect()[0]
    assert got["n_pairs"] == 3


# --- skyline ------------------------------------------------------------------


def test_skyline_known_front(spark):
    from nilm_data_framework_spark.operators import windows as W

    pts = [
        (1, 1, 5, "a"),   # front (max y at min x)
        (1, 3, 3, "b"),   # front
        (1, 5, 1, "c"),   # front (max x)
        (1, 2, 2, "d"),   # dominated by b (3>=2, 3>=2 strict both)
        (1, 3, 1, "e"),   # dominated by b (same x, lower y)
        (1, 5, 1, "f"),   # tie with c on both coords: both survive
    ]
    df = spark.createDataFrame(pts, "g long, x long, y long, id string")
    kept = {r["id"] for r in W.skyline_2d(df, ["g"], "x", "y").collect()}
    assert kept == {"a", "b", "c", "f"}


def test_skyline_matches_quadratic_definition(spark):
    from nilm_data_framework_spark.operators import windows as W

    import itertools
    import random

    rng = random.Random(7)
    pts = [(1, rng.randint(0, 20), rng.randint(0, 20), i) for i in range(60)]
    df = spark.createDataFrame(pts, "g long, x long, y long, id long")
    got = {r["id"] for r in W.skyline_2d(df, ["g"], "x", "y").collect()}
    expect = set()
    for _, x, y, i in pts:
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y) for _, qx, qy, _ in pts
        )
        if not dominated:
            expect.add(i)
    assert got == expect


# --- triangle count -----------------------------------------------------------


def test_triangle_count_known_graph(spark):
    from nilm_data_framework_spark.operators import graph as G

    # K4 on {1,2,3,4} (4 triangles) + pendant 5-1 (no new triangle)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = G.triangle_count(df).collect()[0]
    assert got["n_vertices"] == 5
    assert got["n_edges"] == 7
    assert got["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    from nilm_data_framework_spark.operators import graph as G

    # bipartite C6: 6-cycle has no triangles
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert G.triangle_count(df).collect()[0]["n_triangles"] == 0


def test_triangle_count_skewed_hub(spark):
    from nilm_data_framework_spark.operators import graph as G

    # star hub 0-{1..30} plus one rim edge 1-2: exactly 1 triangle; the
    # degree orientation must point rim→hub so the hub fans out nothing.
    edges = [(0, i) for i in range(1, 31)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert G.triangle_count(df).collect()[0]["n_triangles"] == 1


# --- KS statistic -------------------------------------------------------------


def test_ks_zero_for_identical_samples(spark):
    from nilm_data_framework_spark.operators import robust as RB

    rows = [(1, float(v % 10), s) for v in range(100) for s in (True, False)]
    df = spark.createDataFrame(rows, "g long, value double, is_ref boolean")
    got = RB.ks_statistic(df, ["g"], "value", F.col("is_ref")).collect()[0]
    assert got["ks"] == pytest.approx(0.0)
    assert got["n_ref"] == 100 and got["n_cmp"] == 100


def test_ks_one_for_disjoint_supports(spark):
    from nilm_data_framework_spark.operators import robust as RB

    rows = [(1, float(v), True) for v in range(50)] + [
        (1, float(v + 100), False) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g long, value double, is_ref boolean")
    got = RB.ks_statistic(df, ["g"], "value", F.col("is_ref")).collect()[0]
    assert got["ks"] == pytest.approx(1.0)


def test_ks_known_half_shift(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # ref uniform on {0..9}, cmp uniform on {5..14}: D = 0.5 at x=4.5
    rows = [(1, float(v), True) for v in range(10)] + [
        (1, float(v + 5), False) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "g long, value double, is_ref boolean")
    got = RB.ks_statistic(df, ["g"], "value", F.col("is_ref")).collect()[0]
    assert got["ks"] == pytest.approx(0.5)


# --- chi-square ---------------------------------------------------------------


def test_chisq_zero_for_independent_uniform(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # perfectly balanced 2x2 table: O == E everywhere -> chi2 = 0
    rows = [(r, c) for r in ("a", "b") for c in (0, 1) for _ in range(25)]
    df = spark.createDataFrame(rows, "r string, c long")
    got = RB.chi_square_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == pytest.approx(0.0)
    assert got["dof"] == 1 and got["n"] == 100


def test_chisq_perfect_association(spark):
    from nilm_data_framework_spark.operators import robust as RB

    # r determines c completely: chi2 = n for a 2x2 table
    rows = [("a", 0)] * 30 + [("b", 1)] * 30
    df = spark.createDataFrame(rows, "r string, c long")
    got = RB.chi_square_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == pytest.approx(60.0)


# --- dataset manifest ---------------------------------------------------------


def test_manifest_order_independent(spark):
    from nilm_data_framework_spark.operators import lakehouse as LH

    rows = [(f"s{i % 2}", f"text {i}", i) for i in range(50)]
    a = spark.createDataFrame(rows, "source string, text string, b long")
    b = spark.createDataFrame(list(reversed(rows)), "source string, text string, b long").repartition(7)
    ma = {tuple(r) for r in LH.dataset_manifest(a, ["source"], F.col("text"), F.col("b")).collect()}
    mb = {tuple(r) for r in LH.dataset_manifest(b, ["source"], F.col("text"), F.col("b")).collect()}
    assert ma == mb


def test_manifest_detects_single_row_change(spark):
    from nilm_data_framework_spark.operators import lakehouse as LH

    rows = [("s", f"text {i}", 1) for i in range(30)]
    changed = rows[:15] + [("s", "text 15 CHANGED", 1)] + rows[16:]
    a = spark.createDataFrame(rows, "source string, text string, b long")
    b = spark.createDataFrame(changed, "source string, text string, b long")
    ca = LH.dataset_manifest(a, ["source"], F.col("text"), F.col("b")).collect()[0]
    cb = LH.dataset_manifest(b, ["source"], F.col("text"), F.col("b")).collect()[0]
    assert ca["n_rows"] == cb["n_rows"] and ca["checksum"] != cb["checksum"]
