"""§2.10 similarity-search queries over ``embeddings`` (array<float>, dim 64).

Brute-force cosine top-k is fully oracle-checked (dot products computed in
double on both engines); the LSH / IVF approximate variants register
rows-only — their recall-vs-bruteforce contracts are tested in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators import dedup  # noqa: F401 (tag grouping)
from nilm_data_framework_spark.operators import similarity as S
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import load_table

N_QUERIES = 8
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize: 64-dim dot products over a small single-file scan would
    # otherwise run on one core.
    return load_table(spark, sf_dir, "embeddings", parallelize=True)


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS match_id,
             list_dot_product(q.qv, c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
               AS cos
      FROM embeddings c, q WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, match_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rk
      FROM scored
    )
    SELECT query_id, match_id, round(cos, 4) AS cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    """,
    survey_ref="§2.10 similarity search: brute-force cosine top-k baseline",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES)
    out = S.brute_force_topk(emb, queries_df, k=TOP_K)
    return out.select(
        "query_id", "match_id", F.round("cosine", 4).alias("cosine"),
        F.col("rk").cast("long").alias("rk"),
    )


@query(
    "embedding_neardup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
             AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    """,
    survey_ref="§2.10 embedding-cosine near-dup (label-blocked exact pairs)",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select("vec_id", "label", "embedding")
    a = e.alias("a")
    b = e.alias("b")
    cos = S.cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= 0.35)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round("_cos", 4).alias("cosine"),
        )
    )


@query(
    "cosine_topk_lsh",
    oracle=None,
    survey_ref="§2.10 ANN: random-hyperplane LSH-bucketed top-k (scale path)",
    tags=("rows_only",),
)
def cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES)
    # 4 planes × 4 tables: on weakly-similar random data SRP needs coarse
    # buckets for usable recall (see tests/test_similarity.py)
    out = S.lsh_topk(emb, queries_df, k=TOP_K, dim=64, n_planes=4, n_tables=4)
    return out.select("query_id", "match_id", F.round("cosine", 4).alias("cosine"), "rk")


@query(
    "cosine_topk_ivf",
    oracle=None,
    survey_ref="§2.10 ANN: IVF coarse-quantized top-k (partition-pruned search)",
    tags=("rows_only",),
)
def cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES)
    out = S.ivf_topk(emb, queries_df, k=TOP_K, n_centroids=16, n_probe=4)
    return out.select("query_id", "match_id", F.round("cosine", 4).alias("cosine"), "rk")
