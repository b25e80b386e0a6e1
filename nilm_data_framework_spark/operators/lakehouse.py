"""Lakehouse table-maintenance operators: MERGE-style upsert, Z-order layout
keys, and right-to-erasure purges (§2 extensions — the reference framework
rebuilds its HDF5 store from scratch per run; a 100 TB lakehouse cannot, so
incremental maintenance is a first-class capability, not an afterthought).

All three are pure DataFrame algebra — the point is that Delta/Iceberg
`MERGE INTO`, `OPTIMIZE ZORDER BY`, and GDPR deletes are *queries* under the
hood, and expressing them declaratively lets Catalyst plan them like any
other join/projection:

- **merge_upsert** — apply a changes batch (inserts + updates) to a snapshot
  via one full-outer join on the key: exactly the reconciliation MERGE INTO
  performs before writing. Complements ``snapshot_diff`` (operators/
  joins.py), which generates the change batch this operator consumes, and
  ``sources/canonical.py::merge_upsert_partitioned``, the write-path sink
  that applies one with a touched-partition cost bound.
- **interleave_bits** — the Z-order (Morton) curve key: interleaving the
  bits of two bucketized dimensions makes lexicographic file order preserve
  locality in BOTH dimensions, so min/max file statistics prune scans for
  predicates on either column. Sorting by the returned key before writing
  IS the OPTIMIZE ZORDER layout pass.
- **erase_keys** — anti-join purge of a (small) deletion-key list (AQE
  elects the broadcast):
  the GDPR/right-to-erasure pass. At 100 TB the deletion list is always
  broadcast-sized relative to the fact table, and the anti-join rewrites
  only the files that contain hits when combined with partition/file pruning
  on the same key layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
) -> DataFrame:
    """MERGE INTO semantics as a full-outer join: rows present in ``changes``
    override the snapshot (matched → update), rows only in ``changes`` are
    inserted, rows only in ``snapshot`` carry over. Adds ``merge_action`` in
    {'insert','update','carry'} for audit/metrics.

    ``value_cols`` are the columns reconciled with ``coalesce(change,
    snapshot)``; both inputs must have them plus ``key``.

    Scale: one sort-merge (or AQE-elected broadcast, when the change batch
    is small — the common case) join on the key. This is precisely the
    shuffle Delta's MERGE runs; bucketing both sides on the key
    (sources/canonical.py::write_readings_bucketed) makes it shuffle-free.
    """
    # eqNullSafe, not ==: a NULL-keyed entity would never match itself and
    # FRAGMENT — a stale 'carry' row plus a fresh 'insert' row, one more
    # per merge (merge_accumulate below fixed this in r4; merge_upsert was
    # left on == until the r7 review). Side-presence markers, not key
    # nullity, drive merge_action: a matched NULL-key row has both keys
    # NULL yet IS an update.
    s = snapshot.select(key, *value_cols, F.lit(1).alias("_s_in")).alias("s")
    c = changes.select(key, *value_cols, F.lit(1).alias("_c_in")).alias("c")
    sk, ck = F.col(f"s.{key}"), F.col(f"c.{key}")
    s_in, c_in = F.col("s._s_in").isNotNull(), F.col("c._c_in").isNotNull()
    merged = s.join(c, sk.eqNullSafe(ck), "full_outer").select(
        F.coalesce(ck, sk).alias(key),
        *[F.coalesce(F.col(f"c.{v}"), F.col(f"s.{v}")).alias(v) for v in value_cols],
        F.when(c_in & s_in, F.lit("update"))
        .when(c_in, F.lit("insert"))
        .otherwise(F.lit("carry"))
        .alias("merge_action"),
    )
    return merged


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two integer
    bucket columns (x gets the even bit positions, y the odd). Files cut
    from the sorted key cover axis-aligned quadrants, so per-file min/max
    stats stay tight on BOTH source columns — the data-skipping property
    OPTIMIZE ZORDER BY buys.

    Pure integer bit algebra (shift/and/or), whole-stage-codegen friendly,
    replayable in any SQL engine; ``bits`` is a static plan constant so the
    expression tree has exactly ``2·bits`` terms.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def interleave_bits_sql(x: str, y: str, bits: int) -> str:
    """DuckDB/ANSI twin of :func:`interleave_bits` (oracle replay)."""
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def erase_keys(
    fact: DataFrame, deletions: DataFrame, key: str
) -> DataFrame:
    """Right-to-erasure purge: drop every fact row whose ``key`` appears in
    the deletion list. Deletion lists are near-always tiny next to the fact
    table, so AQE elects a broadcast anti-join at runtime (a map-side hash
    probe, no fact shuffle) — but the hint is deliberately NOT forced: the
    list's size is data-dependent (an erasure wave after a breach can be
    large), and the repo rule is that only provably-bounded relations get
    hard broadcast hints (test_no_broadcast_hint_over_sf_scaled_relation).
    Pair with the caller keeping before/after counts for the audit trail.
    No ``distinct()`` on the deletion side (r7): a left-anti join's output
    is identical with or without build-side duplicates, and the extra
    exchange+aggregate bought nothing.
    """
    return fact.join(deletions.select(key), key, "left_anti")


_MANIFEST_MOD = 2147483647  # 2^31 - 1 (Mersenne): sums of ~4e9 residues fit a long


def content_checksum(row_repr: Column) -> Column:
    """Order-independent content checksum term for one row: the 60-bit md5
    prefix of the row's canonical string, reduced mod 2^31−1. Per-group
    checksum = sum of terms mod 2^31−1 — commutative and associative, so it
    is partition-order-independent, MERGEABLE across shards/partials
    (residues add), and incrementally maintainable (a deleted row's term
    subtracts). Overflow-safe by construction: 2^31-bounded terms sum past
    2^63 only after ~4×10⁹ rows PER GROUP — group manifests at that size
    split by shard first (and the mod can be re-applied per partial).
    Deterministic salted-md5, same family as the sketch hashes — replays
    bit-identically in the DuckDB oracle."""
    return F.pmod(
        F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long"),
        F.lit(_MANIFEST_MOD),
    )


def dataset_manifest(
    df: DataFrame,
    keys: list[str],
    row_repr: Column,
    bytes_col: Column,
) -> DataFrame:
    """Per-group dataset manifest: (keys..., n_rows, n_bytes, checksum) —
    the reproducibility artifact a dataset card / lakehouse snapshot
    records so two materializations can be compared WITHOUT re-reading
    either (equal manifests ⇒ identical content up to a ~2^-31-per-group
    collision bound on the modular sum; the row term is 60-bit md5, so
    adversarial collisions are not a concern for integrity, only for
    crypto — which this is not).

    One partial+final hash agg — linear, map-side combined, no shuffle
    beyond the group exchange. The checksum is order-independent, so the
    manifest is stable under repartitioning, speculative re-execution, and
    shard-parallel writes — the property that makes it usable as a
    cross-cluster equality check.

    PRECONDITION: ``row_repr`` must be NULL-SAFE (build it with
    ``concat_ws``/coalesced fields, never bare ``concat``). A NULL repr
    hashes to NULL and F.sum silently skips it — the row is counted in
    n_rows but INVISIBLE to the checksum, so two materializations
    differing only inside NULL-repr rows would compare equal."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bytes_col).alias("n_bytes"),
        F.pmod(F.sum(content_checksum(row_repr)), F.lit(_MANIFEST_MOD)).alias(
            "checksum"
        ),
    )


def compact_small_files(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Small-file compaction: rewrite ``df`` as sequential files of at most
    ``max_records_per_file`` rows (``ceil(n / R)`` files — deterministic,
    which is what makes the audit below oracle-replayable).

    The small-files problem is THE silent lakehouse tax at 100 TB: a
    streaming ingest or per-partition MERGE leaves thousands of KB-sized
    parquet files whose footer/open costs dominate scans. Compaction =
    read + re-bin + rewrite; here the bin rule is row-count (via Spark's
    ``maxRecordsPerFile``), the production twin of Delta OPTIMIZE /
    Iceberg rewrite_data_files' size-based binning. At scale the single
    coalesce(1) writer below becomes ``repartitionByRange(ceil(n/R),
    sort_key)`` so compaction parallelizes AND re-establishes clustering
    (compose with the Z-order projection for multi-column locality);
    row-count binning stands in for byte binning because row width is
    near-constant per table — swap the constant per deployment.
    """
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def compaction_audit(spark, path: str) -> DataFrame:
    """(n_files, n_rows) of a parquet directory via the file-source
    metadata column — the before/after evidence row a compaction job logs.
    One metadata-only projection + a 1-row agg; no data columns are read
    (column pruning drops everything but ``_metadata.file_path``)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    return df.select(F.col("_metadata.file_path").alias("_f")).agg(
        F.countDistinct("_f").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_accumulate(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key: str,
    sums: list[str],
    maxes: list[str],
) -> DataFrame:
    """Accumulating MERGE: combine a per-key aggregate state with a new
    batch's per-key aggregates — ``sums`` columns add, ``maxes`` columns
    take greatest, unmatched rows pass through. ``snapshot=None`` (first
    batch) returns ``changes`` as-is.

    This is the foreachBatch upsert kernel of an incremental streaming →
    lakehouse pipeline: because + and greatest are commutative and
    associative, the final state is INDEPENDENT of how the input was cut
    into micro-batches — which is exactly the batch-equivalence property
    the streaming_merge_upsert_equiv oracle replays.

    Scale: one key-equi join per micro-batch where the left side is the
    state table and the right the (already reduced) batch aggregate —
    Delta/Iceberg MERGE's shuffle; with the state table bucketed by key
    (sources/canonical.py::write_readings_bucketed) the state side never
    re-shuffles, and AQE broadcasts the typically-small batch side.
    """
    if snapshot is None:
        return changes
    s = snapshot.alias("s")
    c = changes.alias("c")
    sk, ck = F.col(f"s.{key}"), F.col(f"c.{key}")
    # eqNullSafe, not ==: a nullable key must stay ONE group across batches
    # (plain equality would fragment NULL-key state into one row per batch,
    # breaking the cut-invariance contract); NULL-safe equality remains a
    # hash join key (plan-pinned for the same operator family by
    # test_null_safe_join_is_hash_keyed)
    return s.join(c, sk.eqNullSafe(ck), "full_outer").select(
        F.coalesce(ck, sk).alias(key),
        *[
            (
                F.coalesce(F.col(f"s.{v}"), F.lit(0))
                + F.coalesce(F.col(f"c.{v}"), F.lit(0))
            ).alias(v)
            for v in sums
        ],
        *[F.greatest(F.col(f"s.{v}"), F.col(f"c.{v}")).alias(v) for v in maxes],
    )
