"""Training-data sampling & packing: deterministic data-mixture sampling and
sequence packing for LLM training pipelines (§2.10 extensions).

The reference framework's sampling surface is torch ``random_split``
(bert_single_appliance/train_bert_single.py:108-115); these operators are the
corpus-scale generalizations a 100 TB pipeline needs on top of it:

- **Stratified hash sampling** — per-stratum keep rates (the "data mixture"
  step: weight sources/languages differently). Seeded RNG sampling is not
  reproducible across engines or under re-partitioning; an md5-derived
  uniform fraction is. Narrow projection: no shuffle, no join, stable under
  appends.
- **Sequence packing** — GPT-style concat-and-chunk: documents are laid out
  head-to-tail per shard in a deterministic order and cut into fixed
  token-budget chunks (documents may span chunk boundaries). One window
  shuffle per shard; the running offset is a plain prefix sum, so the whole
  assignment is expressible in any engine with window functions (fully
  oracle-checkable, unlike first-fit heuristics whose sequential state is
  not SQL-expressible).

Both are pure column algebra — JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32 — the md5-prefix space used for the uniform fraction.
_HASH_SPACE = 4294967296.0


def hash_fraction(id_col: Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction derived from md5 of the id (+ optional salt).

    Cross-engine reproducible (DuckDB: ``('0x' || substr(md5(x), 1, 8))::
    BIGINT / 4294967296.0``) and independent of partitioning — unlike
    ``df.sample`` whose Bernoulli draw depends on Spark's partition-seeded
    RNG. Use distinct salts for independent draws from the same ids.
    """
    return (
        F.conv(
            F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(_HASH_SPACE)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep fraction in [0, 1]; strata not in the
    map get ``default_rate``. The keep decision is ``hash_fraction(id) <
    rate``, so resampling with a larger rate strictly grows the kept set
    (nested samples — handy for scaling-law subsets) and the result is
    identical at any scale factor, partitioning, or engine.

    Plan shape: a single ``when`` chain over a literal rate table — narrow
    projection, no shuffle, no join. At 100 TB this is the only shape that
    doesn't move data: the alternative broadcast-join of a rates dim costs a
    build side for no benefit at typical strata counts (≤ thousands).

    NULL-id rows never sample (NULL hash fraction fails ``< rate`` even at
    rate 1.0) — the shared samplers' contract; see bottom_k_per_stratum.
    """
    frac = hash_fraction(F.col(id_col), salt)
    rate: Column | None = None
    for value, r in rates.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(frac < rate)


def bottom_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly-``k`` uniform sample per stratum: keep the ``k`` rows with the
    smallest ``md5(id + salt)`` in each stratum — a deterministic reservoir
    (bottom-k / KMV sketch). Complements :func:`stratified_sample`: rate-based
    sampling gives a *fraction* per stratum, bottom-k gives a *fixed count*
    (eval-set carving, per-domain probes, scaling-law subsets of equal size).

    Cross-engine replayable (row_number over the md5 order) and append-
    monotone: adding rows can only displace current members with smaller
    hashes, never reshuffle the survivors' relative order.

    Scale shape: one shuffle on the stratum key, then a per-partition
    top-k. Bottom-k is associative (union → take k smallest), so at 100 TB
    the same result is computable as partial bottom-k per input partition →
    merge, without sorting whole strata; the window form here lets Catalyst
    pick the physical strategy (rank-limit pushdown in Spark 3.5+/4.x).

    NULL ids are EXCLUDED (r7): md5(NULL) is NULL, which sorts FIRST and
    would permanently occupy the k slots — the mirror of
    :func:`stratified_sample`, where a NULL id's NULL fraction fails the
    ``< rate`` filter and the row is unsampleable at any rate. Both
    samplers therefore share one contract: NULL-id rows never sample.
    """
    df = df.filter(F.col(id_col).isNotNull())
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sequential_poisson_bottom_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted fixed-count sample per stratum: Ohlsson's *sequential Poisson
    sampling* (the order-sampling approximation of probability-proportional-
    to-size without replacement). Each row draws priority ``u / w`` (u = its
    deterministic md5 uniform, w = its weight); the ``k`` smallest priorities
    per stratum win, so a row with twice the weight is ~twice as likely to be
    picked — the standard importance-weighted corpus subsample (weight by
    token count, quality score, domain boost...).

    Cross-engine exact: u is an integer-derived fraction and the priority is
    ONE IEEE division of it by the weight — correctly rounded, bit-identical
    in any engine — so the induced order (ties broken by id) replays in SQL.
    Like bottom-k, the selection is associative (merge partial bottom-ks), so
    at 100 TB it needs no per-stratum sort, just partial top-k merges; the
    window form lets Catalyst's rank-limit pushdown do that here.
    Adds ``sample_priority`` (the raw double) and keeps input columns.

    Rows with NULL or non-positive weight are EXCLUDED up front (r7): PPS
    semantics give them ~zero selection probability, but u/0.0 is NULL
    (sorts FIRST under ASC) and negative weights sort before every real
    priority — without the filter exactly the rows that should never be
    drawn deterministically fill the k slots.
    """
    eligible = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    u = hash_fraction(F.col(id_col), salt)
    pri = u / F.col(weight_col).cast("double")
    w = Window.partitionBy(strata_col).orderBy(
        F.col("sample_priority").asc(), F.col(id_col).asc()
    )
    return (
        eligible.withColumn("sample_priority", pri)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def budget_prefix_filter(
    df: DataFrame,
    strata_col: str,
    order_cols: list,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget curation: within each stratum, walk rows in ``order_cols``
    order (best-first — quality score, recency...) and keep the greedy prefix
    whose *preceding* token mass is under ``budget``. The kept set therefore
    always reaches the budget (the first overshooting doc is included rather
    than leaving budget unused) and is fully determined by the ordering —
    the "fill each language's token quota with its best documents" step of a
    data-mixture build, as a single window prefix-sum instead of a driver
    loop.

    One shuffle on the stratum key; the prefix sum is a running window —
    same scale shape as :func:`pack_concat_chunks`. Adds ``budget_used``
    (tokens consumed before this row).
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0))
    return df.withColumn("budget_used", before).filter(F.col("budget_used") < budget)


def hash_shard(id_col: Column, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard id in [0, n_shards): md5-derived integer mod N.

    This is the "globally shuffled shards" step of training-data layout:
    md5 destroys any source/time ordering of ids, so every shard is an
    unbiased corpus sample and a training run can stream shards sequentially
    without a separate shuffle pass. Pure projection — no shuffle to
    *compute*; writing then uses ``repartition(n_shards, shard)`` so each
    output file IS one shard. Cross-engine: the same 32-bit md5 prefix used
    by :func:`hash_fraction`, mod N.
    """
    return (
        F.conv(
            F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_shards
    )


def pack_concat_chunks(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """GPT-style sequence packing: concat docs per shard, chunk at ``budget``.

    Documents in each shard are laid head-to-tail in ``order_col`` order;
    chunk k covers token offsets [k*budget, (k+1)*budget). Adds:

    - ``pack_offset``  — the doc's start offset in the shard's token stream,
    - ``pack_chunk``   — the chunk its first token lands in,
    - ``pack_chunks_spanned`` — how many chunks the doc crosses (≥ 1; the
      concat-and-chunk convention splits docs at chunk boundaries rather
      than padding, exactly what GPT-2/3-style pretraining does).

    One shuffle: the prefix sum is a running window per shard. Shards are
    the unit of parallelism — at 100 TB pick shard = (source, hash bucket)
    so no single window partition exceeds an executor; packing is
    embarrassingly parallel across shards by construction (real pipelines
    pack per output file anyway).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.col(tokens_col).cast("long")
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("pack_offset", start)
        .withColumn("pack_chunk", F.floor(F.col("pack_offset") / budget))
        .withColumn(
            "pack_chunks_spanned",
            F.when(toks <= 0, F.lit(1)).otherwise(
                F.floor((F.col("pack_offset") + toks - 1) / budget)
                - F.col("pack_chunk")
                + 1
            ),
        )
    )


def curriculum_stages(
    df: DataFrame,
    stratum: str,
    difficulty,
    n_stages: int,
    tiebreak,
    out: str = "stage",
) -> DataFrame:
    """Curriculum-learning stage assignment: within each stratum, rank rows
    easiest-first by ``difficulty`` (a Column; ``tiebreak`` makes the order
    total) and cut into ``n_stages`` equal-count stages via ntile. A trainer
    streams stage 1..n in order — the data-side half of curriculum
    learning (Bengio et al. 2009), here as a deterministic layout decision.

    One window shuffle per stratum; at 100 TB strata are
    languages/sources (thousands), each far below an executor's capacity,
    and the ntile boundary replays identically cross-engine because the
    ordering is total.
    """
    w = Window.partitionBy(stratum).orderBy(difficulty, *tiebreak)
    return df.withColumn(out, F.ntile(n_stages).over(w))
