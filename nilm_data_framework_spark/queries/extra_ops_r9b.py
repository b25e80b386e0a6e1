"""Round-9 continuation (second batch). Registered AFTER extra_ops_r9 so
the registry's unrecorded block keeps registration order — the r9 window
(17 earlier + this module) stays under the driver's 50-row recording
window; see tests/test_registry_order.py.

Theme: curation-EVAL and retrieval primitives that round out §2.10 —
the measurement half of a training-data pipeline (selection quality,
feature discrimination, ranking quality) plus two serving shapes:

  * capped_topk_per_source — diversity-capped shortlist: global top-K
    under a per-source cap (anti-domination constraint every curation
    shortlist applies); WindowGroupLimit per-group map-side limit + a
    TakeOrderedAndProject global cut.
  * clustering_coefficient_parts — per-vertex local clustering
    coefficient over the co-purchase graph (the community-density signal
    next to the global triangle count), exact e6 integers.
  * chi2_term_selection — χ² feature selection of lang-discriminative
    terms: exact integer contingencies, ranking by a PURE-ARITHMETIC
    double (bit-identical cross-engine — no transcendentals), the
    classic curation-classifier feature step.
  * score_auc_exact — exact ROC-AUC (Mann-Whitney U with midrank tie
    handling) as an undivided rational, via a distinct-score histogram:
    no per-row rank, no corpus sort.
  * best_passage_topk — query-term-density passage selection (the
    passage-retrieval primitive under every RAG chunker): best w-token
    window per doc via a per-doc position window, global top-k docs.

Reference analog: none (pure §2.10 extensions); the eval shapes mirror
BASELINE.md's ML-quality-metric framing (the reference reports F1/NDE-
style metrics, so the engine ships the exact-arithmetic metric kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators import graph as G
from nilm_data_framework_spark.operators import text as T
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import load_table

# the shared DuckDB tokenizer text (identical to advanced_analytics._TOKS)
_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# --- diversity-capped shortlist ------------------------------------------------

_CAP_PER_SOURCE = 3
_CAP_K = 12


@query(
    "capped_topk_per_source",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT) AS srk
      FROM documents
    )
    SELECT source, doc_id, n_chars, srk
    FROM r WHERE srk <= {_CAP_PER_SOURCE}
    ORDER BY n_chars DESC, doc_id LIMIT {_CAP_K}
    """,
    survey_ref="§2.10 curation extension: diversity-capped shortlist "
    "(global top-K under a per-source cap — the anti-domination "
    "constraint; reference analog: the keep-first dedup P10 composed "
    "with W3 top-k)",
)
def capped_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K documents by length with AT MOST m per source — the
    fair-shortlist constraint every mixture-aware curation step applies
    (cap any single crawl/source's share of the selection). Two stages,
    both scale-safe: the per-source rank filter compiles to
    WindowGroupLimit (map-side per-group top-m — the same plan
    topk_per_group_limit pins; no per-source full sort materializes), and
    the global cut over the ≤ m·n_sources survivors is a
    TakeOrderedAndProject. All keys integer with doc_id tiebreaks, so the
    cut set is deterministic. At 100 TB: one shuffle by source with
    map-side limiting, then a k-row reduction — no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    per = (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("srk", F.row_number().over(w))
        .filter(F.col("srk") <= _CAP_PER_SOURCE)
    )
    return per.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(_CAP_K)


# --- local clustering coefficient ----------------------------------------------


@query(
    "clustering_coefficient_parts",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS t
      FROM op a
      JOIN op b ON b.l_orderkey = a.l_orderkey
               AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT x AS vertex, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT s AS x FROM e UNION ALL SELECT t FROM e) GROUP BY 1
    ),
    tri AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM e e1
      JOIN e e2 ON e2.s = e1.s AND e2.t > e1.t
      JOIN e e3 ON e3.s = e1.t AND e3.t = e2.t
    ),
    tv AS (
      SELECT x AS vertex, CAST(count(*) AS BIGINT) AS n_triangles FROM
        (SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) GROUP BY 1
    )
    SELECT d.vertex, d.degree, COALESCE(tv.n_triangles, 0) AS n_triangles,
           CAST((2 * COALESCE(tv.n_triangles, 0) * 1000000)
                // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_e6
    FROM deg d LEFT JOIN tv USING (vertex)
    WHERE d.degree >= 2
    """,
    survey_ref="§2 graph extension: local clustering coefficient "
    "(Watts-Strogatz) per vertex over the support-≥2 co-purchase graph; "
    "oracle = naive ordered 3-way triangle join exploded to endpoints",
)
def clustering_coefficient_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient cc(v) = 2·tri(v)/(deg(v)·
    (deg(v)−1)) over the same support-≥2 co-purchase graph as
    triangle_count_parts — the neighborhood-density signal behind
    community features and recommendation diversity (a part whose
    co-purchases all co-purchase each other sits inside a basket clique).
    Kernel: operators/graph.py::triangles_per_vertex — the degree-ordered
    orientation shared with the global count, closure via INNER join +
    3-way endpoint explode (linear passes, hub-safe O(√m) wedge fan-out).
    cc ships as an exact e6 integer (`div` both engines, nonneg) plus the
    undivided (n_triangles, degree) pair; 2·tri·1e6 < 2^63 holds to
    tri ~ 4.6e12, far past any real vertex. Only deg ≥ 2 vertices
    (cc defined)."""
    from nilm_data_framework_spark.queries.advanced_analytics import (
        _copurchase_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    tv = G.triangles_per_vertex(_copurchase_edges(li))
    return tv.filter(F.col("degree") >= 2).select(
        "vertex",
        "degree",
        "n_triangles",
        F.expr("(2 * n_triangles * 1000000) div (degree * (degree - 1))").alias(
            "cc_e6"
        ),
    )


# --- chi-squared term selection -------------------------------------------------

_CHI2_MIN_DF = 20
_CHI2_K = 15

# ONE expression text shared by both engines: every input is an exact
# integer ≤ 2^53 cast to double, and the op tree is pure {+,−,×,÷} in a
# pinned association order — IEEE doubles are then BIT-IDENTICAL across
# engines (no transcendentals — unlike the ln-based BM25 scores which
# rank with a 1-ulp caveat). n_total·x·x rounds once above 2^53,
# identically on both sides.
_CHI2_EXPR = (
    "(CAST(n_total AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)"
    " * CAST(a*d - b*c AS DOUBLE))"
    " / (CAST(a+b AS DOUBLE) * CAST(c+d AS DOUBLE)"
    " * CAST(a+c AS DOUBLE) * CAST(b+d AS DOUBLE))"
)


@query(
    "chi2_term_selection",
    oracle=f"""
    WITH td AS (
      SELECT doc_id, lang = 'en' AS en, unnest(list_distinct({_TOKS})) AS term
      FROM documents
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
      FROM documents
    ),
    ct AS (
      SELECT term,
             CAST(sum(CASE WHEN en THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN en THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM td GROUP BY term
    ),
    cells AS (
      SELECT term, a, b, n_en - a AS c, (n_total - n_en) - b AS d, n_total
      FROM ct, tot
      WHERE a + b >= {_CHI2_MIN_DF} AND a + b <= n_total - 5
    )
    SELECT term, a, b, c, d,
           CAST(floor(({_CHI2_EXPR}) * 10000) AS BIGINT) AS chi2_e4
    FROM cells
    ORDER BY {_CHI2_EXPR} DESC, term LIMIT {_CHI2_K}
    """,
    survey_ref="§2.10 curation extension: χ² term selection (Yang & "
    "Pedersen '97 feature selection) — the discriminative-vocabulary step "
    "under every fastText-style quality/language classifier; reference "
    "analog: J3's keyword→label map, LEARNED from counts instead of "
    "declared",
)
def chi2_term_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 terms most associated with lang='en' by χ² over exact
    per-term document-frequency contingencies (a=en-with-term,
    b=other-with-term, c/d complements). Counts are one distinct-explode +
    hash agg (linear, map-side combined); the 1-row totals frame is a
    broadcast crossJoin (guard-exempt). Ranking: χ² is computed from ONE
    shared expression text over exact-integer casts with no
    transcendentals, so the double is bit-identical in both engines and
    the (χ² desc, term) top-k cut is deterministic — the stronger form of
    the BM25 raw-float ranking discipline. Emitted χ² is floor-scaled e4;
    the gate pins the contingencies exactly. df bounds: support ≥ 20
    drops noise terms, df ≤ N−5 keeps c+d > 0 (a term in every document
    has no discrimination and would put 0/0·∞ in the statistic)."""
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_en"),
    )
    td = docs.select(
        (F.col("lang") == "en").alias("en"),
        F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("term"),
    )
    ct = td.groupBy("term").agg(
        F.sum(F.when(F.col("en"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("en"), 0).otherwise(1)).cast("long").alias("b"),
    )
    cells = (
        ct.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("a") + F.col("b") >= _CHI2_MIN_DF)
            & (F.col("a") + F.col("b") <= F.col("n_total") - 5)
        )
        .select(
            "term",
            "a",
            "b",
            (F.col("n_en") - F.col("a")).alias("c"),
            (F.col("n_total") - F.col("n_en") - F.col("b")).alias("d"),
            "n_total",
        )
    )
    scored = cells.withColumn("chi2", F.expr(_CHI2_EXPR))
    return (
        scored.orderBy(F.desc("chi2"), F.asc("term"))
        .limit(_CHI2_K)
        .select(
            "term",
            "a",
            "b",
            "c",
            "d",
            F.floor(F.col("chi2") * 10000).cast("long").alias("chi2_e4"),
        )
    )


# --- exact ROC-AUC --------------------------------------------------------------


@query(
    "score_auc_exact",
    oracle="""
    WITH per_score AS (
      SELECT n_chars AS s,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n
      FROM documents GROUP BY n_chars
    ),
    cum AS (
      SELECT s, p, n,
             CAST(sum(n) OVER (ORDER BY s) AS BIGINT) - n AS neg_below
      FROM per_score
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * neg_below + n)) AS BIGINT) AS auc_num,
           2 * CAST(sum(p) AS BIGINT) * CAST(sum(n) AS BIGINT) AS auc_den,
           CAST((sum(p * (2 * neg_below + n)) * 1000000)
                // (2 * sum(p) * sum(n)) AS BIGINT) AS auc_e6
    FROM cum
    """,
    survey_ref="§2.10 eval extension: exact ROC-AUC via the Mann-Whitney "
    "U histogram identity with midrank ties (Hanley-McNeil) — the "
    "classifier-quality gate next to knn_label_accuracy/rank_calibration; "
    "reference analog: BASELINE.md's ML-quality metric framing",
)
def score_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC of 'n_chars predicts lang=en' — the histogram form: group
    to the DISTINCT-SCORE grain (bounded: document length is capped, so
    the support is a value-domain histogram, not a row-scaled sort — the
    guard-recognized HashAggregate boundary), one cumulative window over
    that histogram, one global sum. 2U = Σ_s p_s·(2·negBelow_s + n_s)
    counts each pos>neg pair twice and each tie once — exactly the
    midrank convention — so AUC = auc_num/auc_den as an undivided exact
    rational (the ols_trend discipline) plus a `div`-scaled e6 display
    (bound: 2·P·N·1e6 < 2^63 ⇒ P·N < 4.6e12 — past ~2M×2M docs drop the
    scaled column and divide consumer-side). No per-row ranks, no global
    sort: at 100 TB this is one linear agg + an O(|score domain|)
    window."""
    docs = load_table(spark, sf_dir, "documents")
    per_score = docs.groupBy(F.col("n_chars").alias("s")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("p"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_score.withColumn("neg_below", F.sum("n").over(w) - F.col("n"))
    return cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("neg_below") + F.col("n")))
        .cast("long")
        .alias("auc_num"),
        (2 * F.sum("p") * F.sum("n")).cast("long").alias("auc_den"),
        F.expr(
            "CAST((sum(p * (2 * neg_below + n)) * 1000000)"
            " div (2 * sum(p) * sum(n)) AS BIGINT)"
        ).alias("auc_e6"),
    )


# --- best-passage selection -----------------------------------------------------

_PSG_TERMS = ["join", "hash", "scan"]
_PSG_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _PSG_TERMS) + "]"
_PSG_W = 10  # window width in tokens
_PSG_K = 10


@query(
    "best_passage_topk",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    cand AS (
      SELECT doc_id, CAST(i AS INT) AS start,
             CAST(len(list_filter(toks[i:i+{_PSG_W - 1}],
                  t -> list_contains({_PSG_TERMS_SQL}, t))) AS BIGINT) AS hits
      FROM toked, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    best AS (
      SELECT doc_id, start, hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, start) AS rn
      FROM cand
    )
    SELECT doc_id, start, hits FROM best
    WHERE rn = 1 AND hits >= 1
    ORDER BY hits DESC, doc_id LIMIT {_PSG_K}
    """,
    survey_ref="§2.10 retrieval extension: best-passage selection "
    "(query-term-density window — the passage-retrieval primitive under "
    "RAG chunk re-scoring; Callan '94 passage-level evidence); oracle = "
    "quadratic per-start list-slice recount",
)
def best_passage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each document, the 10-token window densest in query terms
    (earliest start on ties), then the top-10 docs by that density — what
    a RAG serving layer does after doc-level retrieval to pick the
    passage that actually enters the prompt. Spark runs the O(n)-per-doc
    form: positional explode, 0/1 hit flag, per-doc position window
    (ROWS CURRENT..w−1 FOLLOWING — partitioned by doc_id, partition size
    = document length, bounded), integer argmax via min(struct(-hits,
    start)), global TakeOrderedAndProject. The oracle recounts every
    start with a quadratic list slice — the equivalence is the check.
    All-integer scores ⇒ deterministic cut."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("p0", "tok")
    ).select(
        "doc_id",
        (F.col("p0") + 1).alias("start"),
        F.col("tok").isin(*_PSG_TERMS).cast("long").alias("hit"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(0, _PSG_W - 1)
    )
    cand = pos.withColumn("hits", F.sum("hit").over(w))
    best = (
        cand.groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("hits")).alias("nh"), F.col("start"))).alias("b"))
        .select(
            "doc_id",
            F.col("b.start").alias("start"),
            (-F.col("b.nh")).alias("hits"),
        )
        .filter(F.col("hits") >= 1)
    )
    return best.orderBy(F.desc("hits"), F.asc("doc_id")).limit(_PSG_K)


# --- greedy k-center coreset selection ------------------------------------------

_KC_K = 4  # selections (seed + 3 farthest-first rounds)
_KC_DIMS = 64


def _kcenter_oracle_sql(k: int = _KC_K, dims: int = _KC_DIMS) -> str:
    """Chained-CTE unroll of farthest-first traversal (the fixed-k iterated
    recurrence discipline of _pagerank_oracle): q = exploded u6 integer
    components, c1 = max-norm seed, then per round an argmax-of-min-dist
    CTE and a least() fold CTE. All arithmetic is exact BIGINT."""
    parts = [
        f"""
    WITH q AS (
      SELECT vec_id, CAST(pos AS INT) AS i,
             CAST(floor(v[pos + 1] * 1000000) AS BIGINT) AS qv
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           unnest(range(0, {dims})) AS u(pos)
    ),
    n2 AS (SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS norm2
           FROM q GROUP BY 1),
    c1 AS (SELECT vec_id FROM n2 ORDER BY norm2 DESC, vec_id LIMIT 1),
    d1 AS (
      SELECT a.vec_id,
             CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS mind
      FROM q a JOIN q b ON b.i = a.i
                       AND b.vec_id = (SELECT vec_id FROM c1)
      GROUP BY 1
    )"""
    ]
    for r in range(2, k + 1):
        parts.append(f""",
    c{r} AS (SELECT vec_id, mind FROM d{r - 1}
             ORDER BY mind DESC, vec_id LIMIT 1),
    d{r} AS (
      SELECT x.vec_id, least(p.mind, x.d) AS mind
      FROM (SELECT a.vec_id,
                   CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d
            FROM q a JOIN q b ON b.i = a.i
                             AND b.vec_id = (SELECT vec_id FROM c{r})
            GROUP BY 1) x
      JOIN d{r - 1} p USING (vec_id)
    )""")
    sels = [
        "SELECT 1 AS sel_round, (SELECT vec_id FROM c1) AS vec_id,"
        " CAST(NULL AS BIGINT) AS sel_dist2"
    ] + [
        f"SELECT {r}, (SELECT vec_id FROM c{r}), (SELECT mind FROM c{r})"
        for r in range(2, k + 1)
    ]
    parts.append(f""",
    rad AS (SELECT CAST(max(mind) AS BIGINT) AS radius2 FROM d{k}),
    sel AS ({' UNION ALL '.join(sels)})
    SELECT CAST(sel_round AS INT) AS sel_round, vec_id, sel_dist2, rad.radius2
    FROM sel, rad""")
    return "".join(parts)


_KC_D2 = "aggregate(zip_with(q6, c6, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"


@query(
    "kcenter_coreset_seeds",
    oracle=_kcenter_oracle_sql(),
    survey_ref="§2.10 curation extension: greedy k-center coreset "
    "selection (farthest-first traversal, Gonzalez '85 — the 2-approx "
    "k-center heuristic behind diversity-driven data selection / "
    "coreset curation, cf. Sener & Savarese ICLR'18 core-set active "
    "learning); oracle = chained-CTE unroll over exploded integer "
    "components",
)
def kcenter_coreset_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first selection of 4 diversity seeds over the embedding
    corpus: seed = max-norm vector, then 3 rounds of "select the point
    farthest from everything selected so far". The classic coreset /
    diverse-subset primitive for training-data curation (pick maximally
    spread exemplars; the selection radius bounds every point's distance
    to its nearest exemplar by 2× the optimum). Exact arithmetic: u6
    integer components, squared L2 (≤ 64·(2e6)² ≈ 2.6e14 per pair — far
    inside int64), argmax with vec_id tiebreaks ⇒ deterministic
    cross-engine. Plan shape per round: ONE broadcast of the LIMIT-1
    selected center (guard-exempt reference frame), one linear min-dist
    fold, localCheckpoint of the O(n) state vector — the canonical
    distributed k-center: k linear passes, no pairwise matrix. The state
    checkpoint is REQUIRED, not optional: each round references the prior
    state twice (argmax + fold base), so the lazy chain re-evaluates
    2^rounds times without it. Assumes k ≪ distinct vectors (a selected
    point's dist drops to 0, so re-selection needs an all-duplicate
    corpus); radius2 = the k-center objective after all selections,
    pinned on every output row."""
    from nilm_data_framework_spark.operators.embed_stats import u6_components

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", u6_components("embedding").alias("q6"))
    n2 = q.withColumn(
        "norm2", F.expr("aggregate(transform(q6, x -> x * x), 0L, (a, v) -> a + v)")
    )
    c1 = n2.orderBy(F.desc("norm2"), F.asc("vec_id")).limit(1)
    sels = [
        c1.select(
            F.lit(1).cast("int").alias("sel_round"),
            "vec_id",
            F.lit(None).cast("long").alias("sel_dist2"),
        )
    ]
    state = (
        q.crossJoin(F.broadcast(c1.select(F.col("q6").alias("c6"))))
        .select("vec_id", "q6", F.expr(_KC_D2).alias("mind"))
        .localCheckpoint(eager=True)
    )
    for r in range(2, _KC_K + 1):
        best = state.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1)
        sels.append(
            best.select(
                F.lit(r).cast("int").alias("sel_round"),
                "vec_id",
                F.col("mind").alias("sel_dist2"),
            )
        )
        state = (
            state.crossJoin(F.broadcast(best.select(F.col("q6").alias("c6"))))
            .select(
                "vec_id",
                "q6",
                F.least(F.col("mind"), F.expr(_KC_D2)).alias("mind"),
            )
            .localCheckpoint(eager=True)
        )
    rad = state.agg(F.max("mind").alias("radius2"))
    out = sels[0]
    for s in sels[1:]:
        out = out.unionByName(s)
    return out.crossJoin(F.broadcast(rad))


# --- BPE tokenizer training (iterated merge rounds) -----------------------------

_BPE_ROUNDS = 4


def _bpe_oracle_sql(rounds: int = _BPE_ROUNDS) -> str:
    """Chained unroll of the BPE training loop. The merge REWRITE is a
    per-word recursive CTE (left-to-right greedy fold over symbol
    positions) — an INDEPENDENT formulation from Spark's aggregate() HOF
    fold, so the gate's hash equality proves the two sequential-merge
    semantics agree, not just the argmax. Intermediate word tables are AS
    MATERIALIZED: without it DuckDB inlines each w{r} into the NEXT
    round's recursive term and the chain re-runs the recursion once per
    iteration (measured: 4 rounds >120 s inlined vs 0.14 s
    materialized)."""
    parts = [f"""
    WITH RECURSIVE w1 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt,
             list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
      FROM (SELECT unnest({_TOKS}) AS word FROM documents)
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word
    )"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    p{r} AS (
      SELECT w.syms[i] AS lsym, w.syms[i+1] AS rsym,
             CAST(sum(w.cnt) AS BIGINT) AS pair_count
      FROM w{r} w, unnest(range(1, len(w.syms))) AS u(i)
      GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
      SELECT * FROM p{r} ORDER BY pair_count DESC, lsym, rsym LIMIT 1),
    m{r} AS (
      SELECT word, cnt, 1 AS pos, []::VARCHAR[] AS out FROM w{r}
      UNION ALL
      SELECT m.word, m.cnt, m.pos + 1,
        CASE WHEN len(m.out) > 0 AND m.out[len(m.out)] = b.lsym
                  AND w.syms[m.pos] = b.rsym
             THEN list_append(m.out[1:len(m.out)-1], b.lsym || b.rsym)
             ELSE list_append(m.out, w.syms[m.pos]) END
      FROM m{r} m, w{r} w, b{r} b
      WHERE m.word = w.word AND m.pos <= len(w.syms)
    ),
    w{r + 1} AS MATERIALIZED (
      SELECT m.word, m.cnt, m.out AS syms
      FROM m{r} m JOIN w{r} w USING (word)
      WHERE m.pos = len(w.syms) + 1
    ),
    a{r} AS (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) AS corpus_tokens_after
             FROM w{r + 1})""")
    sels = " UNION ALL ".join(
        f"SELECT {r} AS merge_round, b{r}.lsym, b{r}.rsym, b{r}.pair_count, "
        f"a{r}.corpus_tokens_after FROM b{r}, a{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(
        f"\n    SELECT CAST(merge_round AS INT) AS merge_round, lsym, rsym,"
        f" pair_count, corpus_tokens_after FROM ({sels})"
    )
    return "".join(parts)


# left-to-right greedy merge of the (lsym, rsym) pair, as an array fold:
# out[-1]=l ∧ s=r ⇒ replace the tail with l||r, else append s. A merged
# token can never re-trigger as l (l||r ≠ l since r is nonempty), so one
# pass IS the standard non-overlapping greedy merge ("aaa" -> ["aa","a"]).
_BPE_MERGE = (
    "aggregate(syms, CAST(array() AS array<string>),"
    " (acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = lsym"
    " AND s = rsym,"
    " concat(slice(acc, 1, size(acc) - 1), array(concat(lsym, rsym))),"
    " concat(acc, array(s))))"
)


@query(
    "bpe_train_merges",
    oracle=_bpe_oracle_sql(),
    survey_ref="§2.10 LLM-pipeline extension: BPE tokenizer TRAINING as a "
    "dataflow (Sennrich '16; the word-type-histogram formulation that "
    "makes training corpus-size-independent) — 4 argmax+merge rounds, "
    "exact integer counts; oracle = per-word recursive-CTE greedy fold, "
    "an independent sequential-merge implementation",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 4 BPE merges on the corpus and emit per round (lsym, rsym,
    pair_count, corpus_tokens_after) — the actual tokenizer-training
    loop, not a proxy: adjacent-pair counts weighted by word frequency,
    argmax with (count desc, pair asc) tiebreak, greedy left-to-right
    non-overlapping rewrite, repeat. THE scale trick is the first line:
    training runs on the WORD-TYPE HISTOGRAM (one linear agg over the
    corpus — Heaps-law-bounded, ~31 types here, ~10⁶ at web scale), so
    every subsequent round is vocabulary-sized work; the corpus is never
    rescanned. Per round the plan is: bounded pair explode + hash agg,
    LIMIT-1 argmax broadcast (guard-exempt), one aggregate() HOF rewrite
    pass, localCheckpoint of the vocab-bounded word table (each round
    references it twice — argmax + rewrite — so the lazy chain would
    re-fold 2^rounds times). corpus_tokens_after pins each REWRITE
    exactly (not just the argmax): it is the post-merge corpus token
    count. Words restricted to ^[a-z]+$ — the standard alphabetic
    pre-tokenization class (multi-byte slicing and collation differ
    cross-engine; a production tokenizer pre-splits byte-level anyway).
    Ties everywhere integer with lexicographic pair tiebreaks — TIES.md
    row 'bpe argmax'."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
        .localCheckpoint(eager=True)
    )
    rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            # size >= 2 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) and
            # ANSI element_at then raises on fully-merged single-token
            # words; DuckDB's range(1, 1) is empty — same semantics after
            # the filter
            w.filter(F.size("syms") >= 2).select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS lsym,"
                        " element_at(syms, i + 1) AS rsym))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lsym", "p.rsym")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("lsym"), F.asc("rsym")
        ).limit(1)
        w = (
            w.crossJoin(F.broadcast(best))
            .select(
                "word",
                "cnt",
                F.expr(_BPE_MERGE).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
        after = w.agg(
            F.sum(F.col("cnt") * F.size("syms")).alias("corpus_tokens_after")
        )
        rows.append(
            best.select(
                F.lit(r).cast("int").alias("merge_round"),
                "lsym",
                "rsym",
                "pair_count",
            ).crossJoin(F.broadcast(after))
        )
    out = rows[0]
    for s in rows[1:]:
        out = out.unionByName(s)
    return out
