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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(gram: Column, m: int, k: int) -> Column:
    """Array of k bit positions for one gram: position_j = md5(j ':' gram)
    low-60-bit prefix mod m. Salting by the hash index j gives k independent
    uniform functions; md5 keeps both engines bit-identical (the repo's
    standard cross-engine hash)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), gram)), 1, 15), 16, 10
                ).cast("long"),
                F.lit(m),
            )
            for j in range(k)
        ]
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
    by construction) + ONE (doc, gram) agg: all probed positions are
    already distinct, so surviving-row count == _need decides the hit.
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
    gram_hits = (
        probed.join(bits, "pos")
        .groupBy(*id_cols, "_g", "_need")
        .agg(F.count(F.lit(1)).alias("_have"))
        .filter(F.col("_have") == F.col("_need"))
    )
    return gram_hits.select(*id_cols).distinct()
