"""S7/S8: canonical Parquet store for the long-format model.

Replaces the reference's HDF5 canonical form (UnifiedNILM/UnifiedNILM.py:
205-381). Partitioned by (dataset, house_id) so per-house queries prune to a
handful of files; Parquet dictionary/RLE encoding subsumes the reference's
shared-timestamp dedup trick (UnifiedNILM.py:358-363). The pickle sink
(UnifiedNILM.py:200-203) is deliberately not ported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_readings(
    readings: DataFrame,
    path: str,
    mode: str = "overwrite",
    write_partitions: int = 32,
) -> None:
    """At 100 TB: partition pruning on (dataset, house_id) + min/max ts
    statistics in the footer give the P3 time-slice near-free scans.
    The pre-write repartition count is PINNED (r7, the write_ivf_corpus
    rule): bare repartition(keys) lets AQE coalesce the shuffle and
    re-mix partition keys across writer tasks — the small-file
    explosion. Size write_partitions ≈ touched partitions × K."""
    (
        readings.repartition(write_partitions, "dataset", "house_id")
        .sortWithinPartitions("channel_id", "ts")
        .write.mode(mode)
        .partitionBy("dataset", "house_id")
        .parquet(path)
    )


def read_readings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_dim(dim: DataFrame, path: str, mode: str = "overwrite") -> None:
    dim.coalesce(1).write.mode(mode).parquet(path)


def write_readings_bucketed(
    readings: DataFrame,
    table: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Bucketed canonical table: hash-bucket + sort by the series key.

    Two tables bucketed the same way join WITHOUT an exchange — the join key
    layout is pre-materialized, so fact-fact joins on (house_id, channel_id)
    (time-axis alignment J4, as-of variants) skip their shuffle entirely.
    This is the 100 TB co-location strategy; bucket count is chosen per
    deployment (≈ total data / healthy partition size).
    tests/test_bucketing.py asserts the exchange-free plan.
    """
    (
        readings.write.mode(mode)
        .bucketBy(buckets, "house_id", "channel_id")
        .sortBy("house_id", "channel_id")
        .format("parquet")
        .saveAsTable(table)
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    changes: DataFrame,
    path: str,
    partition_cols: list[str] = ("dataset", "house_id"),
    key_cols: list[str] = ("dataset", "house_id", "channel_id", "ts"),
    write_partitions: int = 32,
) -> None:
    """Warehouse-style MERGE (upsert) against the canonical store WITHOUT a
    table format: rewrite ONLY the partitions the changelog touches, via
    dynamic partition overwrite. For each touched (dataset, house_id)
    partition: current rows anti-joined on the PK ∪ incoming rows — i.e.
    update-else-insert. Untouched partitions are never read or written.

    This is the plain-Spark equivalent of Delta/Iceberg MERGE INTO: those
    formats add file-level (not partition-level) rewrite granularity and
    snapshot isolation, but the data movement bound is the same — cost
    scales with TOUCHED data, not table size. At 100 TB with daily-arriving
    house data, a merge touches a few hundred partitions of millions.

    Uses ``spark.sql.sources.partitionOverwriteMode=dynamic`` scoped to this
    write (restored after), which overwrites exactly the partitions present
    in the written frame — the semantics INSERT OVERWRITE ... PARTITION
    gives in Hive SQL.
    """
    part_cols = list(partition_cols)
    keys = list(key_cols)
    # Pin the changes frame BEFORE the duplicate-key guard: the guard is an
    # eager extra job, and without pinning, a nondeterministic changes frame
    # (sample(), rand() filter, shuffle-order-dependent pick) could pass the
    # check yet merge DIFFERENT rows when re-evaluated below (r7 advice).
    # localCheckpoint materializes one version that both the check and the
    # merge read. Changelog batches are churn-sized, not table-sized.
    changes = changes.localCheckpoint(eager=True)
    # real MERGE INTO errors when the source matches one target row twice;
    # silently unioning a multi-row-per-PK changes batch would INSERT
    # duplicate PK rows and double-count downstream (r7 review). Fail fast.
    dup = (
        changes.groupBy(*keys)
        .count()
        .filter("count > 1")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "merge_upsert_partitioned: changes batch has multiple rows for "
            "one primary key — deduplicate (last-wins by your own ordering) "
            "before merging"
        )
    current = spark.read.parquet(path)
    touched = changes.select(*part_cols).distinct()
    # Partition pruning: only touched partitions are scanned (semi join on
    # the partition columns folds into the file index at small dim counts).
    affected = current.join(touched, on=part_cols, how="left_semi")
    survivors = affected.join(changes.select(*keys), on=keys, how="left_anti")
    merged = survivors.unionByName(changes)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(write_partitions, *part_cols)
            .sortWithinPartitions("channel_id", "ts")
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_readings_orc(readings: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Alternate columnar sink: same (dataset, house_id) partitioned layout
    in ORC. Spark's native ORC writer gives the identical pruning +
    min/max-statistics story as Parquet (both formats are first-class in
    the DataSource V2 scan path — predicate pushdown, column pruning, and
    vectorized reads all apply); interop target for Hive/Trino-flavored
    lakes that standardized on ORC. Columnar semantics are
    format-symmetric, which `tests/test_sources.py` pins by round-tripping
    the same frame through both sinks and comparing exactly."""
    (
        readings.repartition(32, "dataset", "house_id")
        .sortWithinPartitions("channel_id", "ts")
        .write.mode(mode)
        .partitionBy("dataset", "house_id")
        .orc(path)
    )


def read_readings_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
