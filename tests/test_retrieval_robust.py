"""Property/parity tests for the round-5 post-freeze batch 2 kernels:
BM25, RRF fusion, SQ8 quantized ANN, MAD outliers, Gini skew, Benford.

Each kernel is checked against a pure-Python/numpy reference on small
constructed inputs (the post-freeze kernel test pattern), independent of
the DuckDB oracle gate."""

from __future__ import annotations

import math
import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.robust import mad_outliers
from nilm_data_framework_spark.operators.similarity import (
    sq8_codes,
    sq8_dim_stats,
    sq8_rerank_topk,
)
from nilm_data_framework_spark.operators.text import bm25_scores

_HS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- MAD ---------------------------------------------------------------------


def _mad_reference(vals: list[int], z: int = 3):
    med = statistics.median(vals)
    devs = [abs(v - med) for v in vals]
    mad = statistics.median(devs)
    n_out = sum(1 for d in devs if d > z * mad)
    return med, mad, n_out, max(devs)


@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=40)
)
@_HS
def test_mad_matches_reference(spark, vals):
    df = spark.createDataFrame(
        [("g", int(v), i) for i, v in enumerate(vals)], "k string, v long, tb long"
    )
    row = mad_outliers(df, ["k"], "v", "tb", z=3).collect()[0]
    med, mad, n_out, max_dev = _mad_reference(vals)
    # doubled-trick invariants: median2 == 2*median, mad4 == 4*MAD (both
    # exact because statistics.median of ints returns int or .5 halves)
    assert row["n"] == len(vals)
    assert row["median2"] == int(2 * med)
    assert row["mad4"] == int(4 * mad)
    assert row["n_outliers"] == n_out
    assert row["max_dev2"] == int(2 * max_dev)


def test_mad_even_odd_groups(spark):
    df = spark.createDataFrame(
        [("odd", v, i) for i, v in enumerate([1, 5, 9])]
        + [("even", v, i) for i, v in enumerate([2, 4, 6, 100])],
        "k string, v long, tb long",
    )
    rows = {r["k"]: r for r in mad_outliers(df, ["k"], "v", "tb").collect()}
    assert rows["odd"]["median2"] == 10  # 2 * 5
    assert rows["odd"]["mad4"] == 16  # 4 * 4
    assert rows["even"]["median2"] == 10  # 2 * 5 (avg of 4,6 doubled)
    # devs2 = |2v-10| = [6, 2, 2, 190]; sorted [2,2,6,190]; mad4 = 2+6
    assert rows["even"]["mad4"] == 8
    assert rows["even"]["n_outliers"] == 1  # 2*190 > 3*8


# --- SQ8 ---------------------------------------------------------------------


def test_sq8_codes_bounds_and_reference(spark):
    vecs = [
        (0, [0.0, -1.0, 0.5, 1.0]),
        (1, [1.0, 1.0, -0.5, 0.0]),
        (2, [0.5, 0.0, 0.0, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    stats = sq8_dim_stats(df)
    assert len(stats) == 4
    out = df.select("vec_id", sq8_codes("embedding", stats).alias("c")).collect()
    for r in out:
        q6 = [math.floor(float(x) * 1e6) for x in vecs[r["vec_id"]][1]]
        for i, code in enumerate(r["c"]):
            mn, mx = stats[i]
            span = max(mx - mn, 1)
            assert code == ((q6[i] - mn) * 255) // span
            assert 0 <= code <= 255


def test_sq8_rerank_is_exact_at_full_shortlist(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, rng.randn(8).astype("float32").tolist()) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    stats = sq8_dim_stats(df)
    q = df.where(F.col("vec_id") < 2)
    # shortlist >= corpus => the rerank stage IS brute force: top-k must
    # equal the exact integer-dot ranking computed in numpy
    got = {
        (r["query_id"], r["rk"]): (r["match_id"], r["dot_u12"])
        for r in sq8_rerank_topk(df, q, k=3, stats=stats, rerank=100).collect()
    }
    u6 = {i: np.floor(np.array(v, dtype=np.float64) * 1e6).astype(np.int64) for i, v in vecs}
    for qid in (0, 1):
        scored = sorted(
            ((int(u6[qid] @ u6[m]), m) for m in u6 if m != qid),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (dot, m) in enumerate(scored[:3], 1):
            assert got[(qid, rk)] == (m, dot)


# --- BM25 --------------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    docs = [
        (0, "vector join stream vector"),
        (1, "join join join"),
        (2, "stream table scan"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in bm25_scores(df, ["vector", "join", "stream"]).collect()
    }
    n = len(docs)
    dls = {d: len(t.split()) for d, t in docs}
    avgdl = sum(dls.values()) / n
    tfs = {
        d: {t: txt.split().count(t) for t in ("vector", "join", "stream")}
        for d, txt in docs
    }
    dfs = {
        t: sum(1 for d in tfs if tfs[d][t] > 0) for t in ("vector", "join", "stream")
    }
    for d, _txt in docs:
        exp = 0.0
        for t in ("vector", "join", "stream"):
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = float(tfs[d][t])
            exp += idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls[d] / avgdl))))
        assert abs(rows[d]["bm25_raw"] - exp) < 1e-12
        assert rows[d]["dl"] == dls[d]
        for t in ("vector", "join", "stream"):
            assert rows[d][f"tf_{t}"] == tfs[d][t]


def test_bm25_zero_tf_scores_zero(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "vector")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bm25_scores(df, ["vector"]).collect()}
    assert rows[0]["bm25_raw"] == 0.0
    assert rows[1]["bm25_raw"] > 0.0


# --- Gini / Benford sanity over the registered queries -----------------------


def test_gini_matches_numpy(spark):
    import numpy as np

    # via all_queries() so module registration keeps its canonical order
    # (a direct queries.extra_ops import here would register extra_ops
    # FIRST and displace the driver's 50-row window — the registry-order
    # contract in CLAUDE.md)
    from nilm_data_framework_spark.plans.registry import all_queries

    gini_key_skew = all_queries()["gini_key_skew"].spark
    out = {r["priority"]: r for r in gini_key_skew(spark, "/root/testdata/sf0.001").collect()}
    import duckdb

    con = duckdb.connect()
    counts = con.execute(
        "SELECT o_orderpriority, o_custkey, count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet') GROUP BY 1, 2"
    ).fetchall()
    by_p: dict[str, list[int]] = {}
    for p, _c, x in counts:
        by_p.setdefault(p, []).append(int(x))
    for p, xs in by_p.items():
        x = np.sort(np.array(xs, dtype=np.int64))
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)
        gini = (2 * int((i * x).sum()) - (n + 1) * int(x.sum())) / (n * int(x.sum()))
        assert out[p]["n_keys"] == n
        assert out[p]["gini_e4"] == int(math.floor(gini * 10**4 + 0.5))


def test_benford_constants():
    # canonical-order registration first (see registry-order note above)
    from nilm_data_framework_spark.plans.registry import all_queries

    all_queries()
    from nilm_data_framework_spark.queries.extra_ops import _BENFORD_E4

    assert _BENFORD_E4[1] == 3010 and _BENFORD_E4[9] == 458
    # shares sum to ~1 (within e4 rounding of the nine terms)
    assert abs(sum(_BENFORD_E4.values()) - 10000) <= 4


def test_rrf_weights_monotone():
    # floor(1e6/(60+r)) strictly decreases until ranks collide far out —
    # ranks 1..500 (gate scale) are collision-free enough to stay monotone
    vals = [10**6 // (60 + r) for r in range(1, 501)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[0] == 16393
