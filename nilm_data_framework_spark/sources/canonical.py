"""S7/S8: canonical Parquet store for the long-format model.

Replaces the reference's HDF5 canonical form (UnifiedNILM/UnifiedNILM.py:
205-381). Partitioned by (dataset, house_id) so per-house queries prune to a
handful of files; Parquet dictionary/RLE encoding subsumes the reference's
shared-timestamp dedup trick (UnifiedNILM.py:358-363). The pickle sink
(UnifiedNILM.py:200-203) is deliberately not ported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_readings(readings: DataFrame, path: str, mode: str = "overwrite") -> None:
    """At 100 TB: partition pruning on (dataset, house_id) + min/max ts
    statistics in the footer give the P3 time-slice near-free scans."""
    (
        readings.repartition("dataset", "house_id")
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
