"""Invariant tests for the round-5 attribution/trends/graph queries
(queries/attribution_trends.py + similarity.py::ivf_recall_at_k). The
oracle gate checks cross-engine equality; these pin the SEMANTIC contracts
on hand-built micro-fixtures where the expected answer is derivable by
hand."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nilm_data_framework_spark.plans.registry import all_queries

SPECS = all_queries()
UTC = dt.timezone.utc


def _events_df(spark, rows):
    """rows: (event_id, user_id, event_type, epoch_seconds, value)."""
    data = [
        (eid, dt.datetime.fromtimestamp(ts, tz=UTC).replace(tzinfo=None), uid, et, float(v), "{}")
        for eid, uid, et, ts, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_multi_touch_credits_sum_to_10000_per_conversion(spark, tmp_path):
    # user 1: view(t0), click(t1), purchase(t2) → 2 touches: 5000 each
    # user 2: 3 views then purchase → floor(10000/3)=3333 ×3 + remainder 1
    #         to the FIRST touch → 3334+3333+3333
    # user 3: a view 8 days before its purchase → outside window, no credit
    t0 = 1_700_000_000
    rows = [
        (1, 1, "view", t0, 1), (2, 1, "click", t0 + 60, 1),
        (3, 1, "purchase", t0 + 120, 1),
        (4, 2, "view", t0, 1), (5, 2, "view", t0 + 10, 1),
        (6, 2, "view", t0 + 20, 1), (7, 2, "purchase", t0 + 30, 1),
        (8, 3, "view", t0, 1), (9, 3, "purchase", t0 + 8 * 86400, 1),
    ]
    ev = _events_df(spark, rows)
    d = str(tmp_path / "ev")
    ev.write.parquet(d + "/events.parquet")
    out = {
        r["event_type"]: r
        for r in SPECS["multi_touch_attribution"].spark(spark, d).collect()
    }
    # total credit must be exactly 10000 × n_conversions-with-touches = 20000
    assert sum(r["total_credit_e4"] for r in out.values()) == 20000
    # user1 view 5000 + user2 first-view 3334 + two 3333s
    assert out["view"]["total_credit_e4"] == 5000 + 3334 + 3333 + 3333
    assert out["click"]["total_credit_e4"] == 5000
    assert out["view"]["n_touches"] == 4  # user-3 view excluded


def test_debounce_chain_semantics(spark, tmp_path):
    # user 1 'view': events at 0s, 30s, 59s, 130s — the first three CHAIN
    # (each <60s from its predecessor) into one burst even though 59s is
    # within 60s of 0s only transitively; 130s starts a new burst.
    t0 = 1_700_000_000
    rows = [
        (1, 1, "view", t0, 1), (2, 1, "view", t0 + 30, 1),
        (3, 1, "view", t0 + 59, 1), (4, 1, "view", t0 + 130, 1),
    ]
    ev = _events_df(spark, rows)
    d = str(tmp_path / "ev")
    ev.write.parquet(d + "/events.parquet")
    out = SPECS["debounce_events"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_kept"] == 2 and r["n_raw"] == 4 and r["max_burst"] == 3


def test_custdist_keeps_zero_order_customers(spark, tmp_path):
    c = spark.createDataFrame(
        [(1, "a", 0, 0.0, "s"), (2, "b", 0, 0.0, "s"), (3, "c", 0, 0.0, "s")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    o = spark.createDataFrame(
        [(10, 1, "O", 1.0, dt.date(2024, 1, 1), "1-URGENT"),
         (11, 1, "O", 1.0, dt.date(2024, 1, 2), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    d = str(tmp_path / "t")
    c.write.parquet(d + "/customer.parquet")
    o.write.parquet(d + "/orders.parquet")
    out = {r["c_count"]: r["custdist"] for r in
           SPECS["custdist_orders"].spark(spark, d).collect()}
    assert out == {0: 2, 2: 1}  # customers 2,3 have zero orders; 1 has two


def test_ols_trend_exact_on_known_line(spark, tmp_path):
    # user values produce daily cents totals y = 100·x + 200 over x=0..3:
    # slope_num/slope_den must equal exactly 100.
    rows = []
    t0 = 1_704_067_200  # 2024-01-01 UTC midnight
    for x in range(4):
        cents = 100 * x + 200
        rows.append((x + 1, 1, "view", t0 + x * 86400, cents / 100.0))
    ev = _events_df(spark, rows)
    d = str(tmp_path / "ev")
    ev.write.parquet(d + "/events.parquet")
    r = SPECS["ols_trend_daily"].spark(spark, d).collect()[0]
    assert r["slope_num"] % r["slope_den"] == 0
    assert r["slope_num"] // r["slope_den"] == 100


def test_label_propagation_adopts_majority_neighbor(spark, tmp_path):
    # star: supplier 1 connects to parts 1,2,3 → supplier vertex 2 adopts
    # min part label (tiebreak label ASC among count-1 votes); each part
    # adopts the supplier's label (its only neighbor).
    li = spark.createDataFrame(
        [(1, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1))
         for p in (1, 2, 3)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    )
    d = str(tmp_path / "t")
    li.write.parquet(d + "/lineitem.parquet")
    r = SPECS["label_propagation_step"].spark(spark, d).collect()[0]
    # vertices: supplier 2, parts 3,5,7. supplier→3 (min part label);
    # parts→2. new labels {3, 2, 2, 2} → 2 distinct; decreased: parts
    # 3,5,7 → 2? no: part 3's label 2 < 3 yes; 5→2 yes; 7→2 yes; supplier
    # 2→3 not decreased → n_decreased = 3.
    assert r["n_vertices"] == 4
    assert r["n_decreased"] == 3
    assert r["n_labels"] == 2


def test_ivf_recall_bounds(spark):
    out = SPECS["ivf_recall_at_k"].spark(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 8
    for r in out:
        assert 0 <= r["hits"] <= r["k"] == 5
        assert r["recall_e4"] == round(10000 * r["hits"] / 5)
    # the probe-pruned path should find most exact neighbors on this corpus
    assert sum(r["hits"] for r in out) >= 0.5 * 5 * len(out)
