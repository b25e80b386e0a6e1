"""Deterministic Bloom-filter build/probe (§2.10 decontamination at scale).

`operators/text.py::ngram_overlap_pairs` answers "WHICH train docs collide
with WHICH eval docs" via an exact hash join. At 100 TB the cheaper
first-line screen is a **Bloom filter over the eval set's n-grams**: build
once (the eval set is small — benchmarks are MBs), broadcast the bitmap to
every executor, and probe each train gram with k hash lookups — zero
shuffle on the corpus, a membership test inside the scan. This is exactly
Spark's own runtime-row-level-filter / DPP trick, applied to
decontamination (and the same structure serves blocklist URL filtering and
join pre-filtering).

This module implements the filter with EXPLICIT salted-md5 bit positions
(not `DataFrame.stat.bloomFilter`) so the whole thing — build, probe, and
the false-positive behavior — replays bit-identically in the DuckDB oracle.
The gate-scale plan keeps the bit set as a (position) TABLE joined to probe
positions: the bit table is at most m rows (m = 4096 here ⇒ broadcast-hash
join chosen by AQE), so the probe is one broadcast join + one all-k-hit
agg. The 100 TB deployment collapses that table to an actual m-bit array
broadcast once (`F.broadcast` of m/8 bytes) — same math, no join at all;
the position-join form IS the oracle twin of that bitmap.

False positives are a FEATURE here (the filter flags a superset; exact
verification runs only on flagged docs) — `bloom_decontamination` reports
the measured FP count next to the exact answer, attesting the advertised
(1-(1-k/m)^n)^k-ish rate at every gate run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_hash60(item: Column, salt: str = "") -> Column:
    """Low-60-bit md5 prefix of (salt || item) as a non-negative long —
    THE deterministic cross-engine hash every sketch here builds on (one
    copy, r7: Bloom/CMS/KMV each hand-rolled it; the DuckDB oracle twins
    mirror it as ``('0x' || substr(md5(...), 1, 15))::BIGINT``)."""
    expr = F.concat(F.lit(salt), item) if salt else item
    return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")


def bloom_positions(gram: Column, m: int, k: int) -> Column:
    """Array of k bit positions for one gram: position_j = md5(j ':' gram)
    low-60-bit prefix mod m. Salting by the hash index j gives k independent
    uniform functions; md5 keeps both engines bit-identical (the repo's
    standard cross-engine hash)."""
    return F.array(
        *[F.pmod(salted_hash60(gram, f"{j}:"), F.lit(m)) for j in range(k)]
    )


def bloom_positions_sql(gram_expr: str, m: int, k: int) -> str:
    """DuckDB list expression mirroring :func:`bloom_positions`."""
    pos = ", ".join(
        f"CAST(('0x' || substr(md5('{j}:' || {gram_expr}), 1, 15)) AS BIGINT) % {m}"
        for j in range(k)
    )
    return f"[{pos}]"


def bloom_build(grams: DataFrame, gram_col: str, m: int, k: int) -> DataFrame:
    """Build the filter: distinct set bit positions over all grams. Output
    (pos) has at most m rows regardless of input size — the broadcastable
    representation of the bitmap."""
    return (
        grams.select(
            F.explode(bloom_positions(F.col(gram_col), m, k)).alias("pos")
        )
        .distinct()
    )


def bloom_probe_docs(
    doc_grams: DataFrame,
    bits: DataFrame,
    id_cols: list[str],
    gram_col: str,
    m: int,
    k: int,
    distinct_grams: bool = False,
) -> DataFrame:
    """Probe: a gram hits iff ALL k of its positions are set; a doc is
    flagged iff ANY of its grams hits. Returns the distinct flagged
    ``id_cols`` rows.

    Plan shape: the required hit count per gram (`size(array_distinct(
    positions))` — duplicate positions from modular collisions would
    otherwise undercount k) is computed BEFORE the single distinct-position
    explode, so the probe is one narrow projection + one inner join against
    the ≤m-row bit table (AQE elects broadcast — the table derives from the
    sf-scaled eval set so no forced hint, but its size is CAPPED at m rows
    by construction) + ONE (doc, gram) agg. By default the agg counts
    DISTINCT surviving positions (not rows): duplicate (doc, gram) input
    rows would multiply a plain row count past ``_need`` and silently turn
    a fully-set gram into a miss — a false NEGATIVE, breaking the Bloom
    contract (r4 advisor finding; callers that pre-apply ``array_distinct``
    per doc were safe only by accident). ``distinct_grams=True`` is the
    caller's PROMISE that (id_cols, gram) rows are unique (e.g. grams come
    from an exploded per-doc ``array_distinct``) — the agg then uses the
    cheaper plain count, which benchmarked ~2x faster at sf0.1 (the
    distinct agg adds a second partial-aggregation layer).
    """
    pos_arr = doc_grams.select(
        *[F.col(c) for c in id_cols],
        F.col(gram_col).alias("_g"),
        F.array_distinct(bloom_positions(F.col(gram_col), m, k)).alias("_pa"),
    )
    probed = pos_arr.select(
        *id_cols, "_g",
        F.size("_pa").alias("_need"),
        F.explode("_pa").alias("pos"),
    )
    have = F.count(F.lit(1)) if distinct_grams else F.countDistinct("pos")
    gram_hits = (
        probed.join(bits, "pos")
        .groupBy(*id_cols, "_g", "_need")
        .agg(have.alias("_have"))
        .filter(F.col("_have") == F.col("_need"))
    )
    return gram_hits.select(*id_cols).distinct()


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Count-min hash for sketch row ``row``: salted-md5 bucket in
    [0, width). Same deterministic hash family as :func:`bloom_positions`."""
    return F.pmod(salted_hash60(item, f"cms{row}:"), F.lit(width))


def _cms_row_buckets(item: Column, depth: int, width: int) -> Column:
    """array<struct<row,bucket>> of all depth hashes of one item — the
    single-scan explode form (r7: the per-row union loop re-evaluated the
    upstream subtree once per depth wherever no reusable exchange sat
    below; the sibling bloom_positions always used the array form)."""
    if depth < 1:
        raise ValueError(f"cms depth must be >= 1, got {depth}")
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), cms_bucket(item, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )


def cms_build(
    items: DataFrame, item_col: str, count_col: str, depth: int, width: int
) -> DataFrame:
    """Build a count-min sketch from (item, count) rows: ``depth`` salted
    hash rows × ``width`` counters. Output (row, bucket, counter) —
    at most depth×width rows regardless of input cardinality, the
    mergeable fixed-size summary (counters of two sketches ADD). One scan:
    the depth hashes explode from a per-row array."""
    return (
        items.select(
            F.col(count_col).alias("_c"),
            F.explode(_cms_row_buckets(F.col(item_col), depth, width)).alias("_rb"),
        )
        .select(F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"), "_c")
        .groupBy("row", "bucket")
        .agg(F.sum("_c").alias("counter"))
    )


def cms_estimate(
    queries: DataFrame, sketch: DataFrame, item_col: str, depth: int, width: int
) -> DataFrame:
    """Estimate each query item's count: min over the sketch rows of the
    counter at that row's bucket, with an EMPTY cell counting as 0 (r7:
    the inner-join form dropped probes whose buckets held no counter row
    — an unseen item either vanished from the output or skipped its zero
    cells and OVERestimated; left join + coalesce restores the standard
    CMS answer min(..., 0) = 0 for never-seen items). The sketch is
    ≤ depth×width rows — AQE elects broadcast for the lookups (derived
    from sf-scaled data, so no forced hint; size capped by construction,
    the same argument as the Bloom bit table). Returns one row per
    DISTINCT query row + ``cms_est`` (duplicates collapse — the grouping
    is the query columns); 'row'/'bucket'/'cms_est' are reserved names."""
    for c in ("row", "bucket", "cms_est"):
        if c in queries.columns:
            raise ValueError(f"cms_estimate reserves column name {c!r}")
    probes = queries.select(
        *queries.columns,
        F.explode(_cms_row_buckets(F.col(item_col), depth, width)).alias("_rb"),
    ).select(*queries.columns, F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
    joined = probes.join(sketch, ["row", "bucket"], "left")
    return joined.groupBy(*queries.columns).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_est")
    )


# --- KMV (k-minimum-values) distinct sketch -----------------------------------
#
# The MERGEABLE distinct-count summary that also supports SET ALGEBRA:
# keep the k smallest 60-bit hash values of a set; |A| ≈ (k-1)/h_(k)
# (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for the union/Jaccard
# forms). Two sketches union by merging and re-taking the bottom-k, and
# J(A,B) is estimated by the fraction of the UNION's bottom-k present in
# both inputs — so |A∩B| ≈ J · |A∪B| without ever touching the raw sets
# again. HLL++ (approx_count_distinct) estimates ONE set tighter per byte,
# but cannot intersect; KMV is what a catalog keeps per partition/source so
# overlap questions ("how many users do these two sources share") are
# sketch-only. Deterministic salted-md5 hashing keeps every estimate
# bit-replayable in the DuckDB oracle.

_KMV_SCALE = float(1 << 60)


def kmv_hash(item: Column) -> Column:
    """60-bit md5 prefix as a non-negative long — the uniform [0, 2^60)
    hash shared by build and oracle (:func:`salted_hash60`, no salt)."""
    return salted_hash60(item)


def kmv_sketch(df: DataFrame, keys: list[str], item_col: str, k: int) -> DataFrame:
    """Bottom-k distinct hash values per key group: (keys..., hv, rk).

    One distinct shuffle on (keys, hv) + one per-key sort for the bottom-k
    pick — at scale the distinct agg is the only data-sized exchange (the
    window input is already the DEDUPED hash set, and a production variant
    replaces the full sort with a per-partition bottom-k partial agg; the
    gate form keeps the sort so the oracle replays row-for-row)."""
    hashes = df.select(
        *keys, kmv_hash(F.col(item_col)).alias("hv")
    ).distinct()
    w = Window.partitionBy(*keys).orderBy("hv")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_estimate(sketch: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Distinct-count estimate per key from a bottom-k sketch: exact size
    when the group holds fewer than k distinct hashes (the sketch IS the
    set), else (k-1) · 2^60 / h_(k). Returns (keys..., kmv_est) with the
    estimate rounded 2dp (double division is IEEE-identical cross-engine
    given the exact integer inputs).

    KNOWN residual (r7 review, documented not fixed): round(x, 2) of a
    quotient whose shortest decimal form ends in a 3rd-place 5 rounds
    differently in Spark (shortest-string BigDecimal) vs DuckDB (raw
    double) — the CLAUDE.md trap. ratio_scaled cannot apply here:
    (k-1)·2^60·10^d overflows BIGINT for practical k. The boundary set
    has measure ~0 over md5 hashes and the fixture is static, so the
    gate is deterministic; an exact-integer variant would emit the raw
    (n, h_k) pair and leave the division to the consumer."""
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"), F.max("hv").alias("_hk")
    )
    return agg.select(
        *keys,
        F.round(
            F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(_KMV_SCALE) / F.col("_hk")
            ),
            2,
        ).alias("kmv_est"),
    )
