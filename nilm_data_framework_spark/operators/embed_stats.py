"""Embedding second-moment statistics: the distributed Gram matrix.

The PCA / whitening / covariance building block an embedding pipeline needs
before any spectral step: G[i, j] = Σ_rows q_i·q_j over integer-quantized
components. Everything downstream (covariance = (G − n·μμᵀ)/n, top
principal components via offline power iteration on the d×d result) derives
from this one pass plus the component sums, so the 100 TB job is a single
linear scan.

Exactness contract (CLAUDE.md typed-hash discipline): components are
floored to 1e-6 units (``floor(CAST(x AS DOUBLE) * 1e6)`` is bit-identical
in Spark and DuckDB — float32→float64 widening is exact, the multiply is
one IEEE op, floor ties toward −inf in both), and every product/sum stays
in BIGINT. Overflow bound: |q| ≤ ~2^21 for unit-scale embeddings, so each
product is ≤ 2^42 and ~2^21 row-terms fit in int64 headroom per (i, j)
cell; past that, aggregate per-shard partials and merge (the operator is
algebraic, see ``partial_agg_merge``).

Reference parity: the reference's BERT pipeline standardizes features with
driver-side sklearn-style stats (bert_single_appliance/train_bert_single.py
feature scaling); this is the scale-out, engine-exact analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def u6_components(vec_col: str = "embedding") -> Column:
    """array<bigint> of 1e-6-floored components (cross-engine exact)."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )


def gram_matrix_u6(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle Gram matrix over u6 integer components.

    Output: ``(i int, j int, g bigint, n bigint)`` with j ≥ i, where
    ``g = Σ_rows q_i·q_j`` and ``n`` is the row count (for deriving means /
    covariance).

    Plan shape: two CHAINED posexplodes (no join — the second explode runs
    over the same row's retained array), filter to the upper triangle, then
    ONE hash aggregate on (i, j). Map-side partial aggregation collapses
    each input partition to ≤ d(d+1)/2 rows before the single exchange, so
    shuffle volume is O(d²·partitions) — independent of row count. At
    100 TB this beats a per-partition numpy outer-product accumulator
    (mapInPandas) only marginally in CPU but keeps the whole plan in
    whole-stage codegen with zero Python.
    """
    q = df.select(u6_components(vec_col).alias("q"))
    qi = q.select("q", F.posexplode("q").alias("i", "qi"))
    pairs = qi.select(
        "i", "qi", F.posexplode("q").alias("j", "qj")
    ).where(F.col("j") >= F.col("i"))
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.sum(F.col("qi") * F.col("qj")).alias("g"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("g").cast("long").alias("g"),
            F.col("n").cast("long").alias("n"),
        )
    )
