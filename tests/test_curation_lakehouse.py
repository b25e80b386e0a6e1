"""Unit tests for the round-4 operators: curation (budget prefix, sequential
Poisson, shards), lakehouse maintenance (merge, Z-order, erasure), robust
monitoring (MAD, CUSUM, time-weighted mean), int8 quantization."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nilm_data_framework_spark.operators import lakehouse as LH
from nilm_data_framework_spark.operators import resample as RS
from nilm_data_framework_spark.operators import robust as RB
from nilm_data_framework_spark.operators import sampling as SM


# --- merge_upsert -------------------------------------------------------------


def test_merge_upsert_actions_and_values(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    chg = spark.createDataFrame(
        [(2, "b2", 22.0), (9, "z", 90.0)], "k long, s string, v double"
    )
    out = {
        r["k"]: r
        for r in LH.merge_upsert(snap, chg, "k", ["s", "v"]).collect()
    }
    assert set(out) == {1, 2, 3, 9}
    assert out[1]["merge_action"] == "carry" and out[1]["v"] == 10.0
    assert out[2]["merge_action"] == "update" and out[2]["s"] == "b2"
    assert out[9]["merge_action"] == "insert" and out[9]["v"] == 90.0


def test_merge_upsert_is_idempotent(spark):
    """Applying the same change batch twice yields the same table."""
    snap = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    chg = spark.createDataFrame([(2, 21.0), (3, 30.0)], "k long, v double")
    once = LH.merge_upsert(snap, chg, "k", ["v"]).drop("merge_action")
    twice = LH.merge_upsert(once, chg, "k", ["v"]).drop("merge_action")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# --- Z-order ------------------------------------------------------------------


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", LH.interleave_bits(F.col("x"), F.col("y"), 4).alias("z")
        ).collect()
    }
    # Morton: x even bits, y odd bits. (3,5) = x 0011, y 0101 -> z 100111 = 39.
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 5)] == 39


def test_interleave_sql_matches_column_form(spark):
    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    both = df.select(
        LH.interleave_bits(F.col("x"), F.col("y"), 3).alias("a"),
        F.expr(LH.interleave_bits_sql("x", "y", 3)).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_zorder_files_are_axis_aligned_quadrants(spark):
    """Cutting the 3-bit Morton curve into 8 files must give each file a
    bounding box no wider than half the grid in each dimension — the
    locality property that makes min/max stats prune on either column."""
    grid = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    z = grid.select(
        "x", "y", F.shiftright(LH.interleave_bits(F.col("x"), F.col("y"), 3), 3).alias("f")
    )
    stats = z.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("dx"), (F.max("y") - F.min("y")).alias("dy")
    )
    assert stats.count() == 8
    bad = stats.filter((F.col("dx") > 3) | (F.col("dy") > 3)).count()
    assert bad == 0


# --- erasure ------------------------------------------------------------------


def test_erase_keys_removes_only_listed(spark):
    fact = spark.createDataFrame([(i, i % 5) for i in range(100)], "id long, u long")
    dels = spark.createDataFrame([(2,), (4,)], "u long")
    kept = LH.erase_keys(fact, dels, "u")
    assert kept.count() == 60
    assert kept.filter(F.col("u").isin(2, 4)).count() == 0


# --- budget prefix ------------------------------------------------------------


def test_budget_prefix_overshoots_by_at_most_one_doc(spark):
    df = spark.createDataFrame(
        [("a", i, 10) for i in range(10)] + [("b", i, 100) for i in range(4)],
        "g string, id long, tok long",
    )
    kept = SM.budget_prefix_filter(df, "g", [F.col("id")], "tok", 35)
    by_g = {
        r["g"]: r["n"]
        for r in kept.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # a: 10+10+10 used=30 < 35 keeps 4th (used becomes 30<35 -> keep), 5th has
    # used 40 -> stop: prefix sums before rows are 0,10,20,30,40...
    assert by_g == {"a": 4, "b": 1}


# --- sequential Poisson -------------------------------------------------------


def test_sequential_poisson_prefers_heavy_rows(spark):
    """With weights 1000 vs 1, the heavy half must dominate the sample."""
    rows = [("s", i, 1000 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = SM.sequential_poisson_bottom_k(df, "g", 50, id_col="id", weight_col="w")
    heavy = out.filter(F.col("w") == 1000).count()
    assert out.count() == 50
    assert heavy >= 45


def test_sequential_poisson_is_deterministic(spark):
    df = spark.createDataFrame([("s", i, i + 1) for i in range(50)], "g string, id long, w long")
    a = sorted(r["id"] for r in SM.sequential_poisson_bottom_k(df, "g", 10, "id", "w").collect())
    b = sorted(r["id"] for r in SM.sequential_poisson_bottom_k(df, "g", 10, "id", "w").collect())
    assert a == b


# --- shards -------------------------------------------------------------------


def test_hash_shard_range_and_balance(spark):
    df = spark.range(2000).select(SM.hash_shard(F.col("id"), 16).alias("s"))
    counts = [r["n"] for r in df.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(counts) == 16
    assert min(counts) > 2000 / 16 * 0.5 and max(counts) < 2000 / 16 * 1.5


# --- robust stats -------------------------------------------------------------


def test_mad_flags_planted_outliers(spark):
    vals = [("k", float(v)) for v in range(1, 101)] + [("k", 1e6), ("k", -1e6)]
    df = spark.createDataFrame(vals, "g string, v double")
    row = RB.mad_outlier_summary(df, ["g"], "v", k=3.0).collect()[0]
    assert row["n"] == 102
    assert row["n_outliers"] == 2
    assert row["med"] == pytest.approx(50.5, abs=1e-6)


def test_cusum_detects_level_shift(spark):
    # 50 points at the target, then 50 points one unit above: the running
    # sum ramps to 50 -> crossings begin once |cusum| > 10.
    rows = [("k", i, 10.0 if i < 50 else 11.0) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    row = RB.cusum_summary(df, ["g"], ["t"], "v", target=10.0, threshold=10.0).collect()[0]
    assert row["peak_cusum"] == pytest.approx(50.0)
    assert row["n_drifted"] == 40  # cusum = 11..50 after the first 10 shifted pts


def test_time_weighted_mean_weights_by_interval(spark):
    # value 0 held for 90s, value 100 held for 10s -> TWA = 10; plain avg 50.
    rows = [
        ("k", "1970-01-01 00:00:00", 0.0),
        ("k", "1970-01-01 00:01:30", 100.0),
        ("k", "1970-01-01 00:01:40", 999.0),  # terminal reading: excluded
    ]
    df = spark.createDataFrame(rows, "g string, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    row = RS.time_weighted_mean(df, ["g"]).collect()[0]
    assert row["twa"] == pytest.approx(10.0)
    assert row["n_intervals"] == 2
    assert row["span_s"] == 100
