"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Parquet scans are lazy; Catalyst pushes filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from nilm_data_framework_spark.schema import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Self-provision the two runtime confs the queries depend on, so the
    engine works on ANY caller-built SparkSession (the round driver passes
    its own): nanos-typed parquet reads as long (converted below), and UTC
    timestamp semantics (matching the DuckDB oracle)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Scan one testdata table.

    ``parallelize=True`` repartitions to the cluster's default parallelism —
    use for compute-heavy expressions over small single-file scans (a tiny
    parquet arrives as ONE partition, serializing all downstream per-row
    work onto one core). At production scale inputs have many files and
    this is a no-op decision; the flag exists for the small-file case.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts arrives in whatever physical type the generator chose —
    # normalize every observed variant to session-UTC TIMESTAMP so the
    # downstream unix_micros/window exprs see one type:
    #  * TIMESTAMP(NANOS): with nanosAsLong it scans as long nanos —
    #    convert via exact integer division (`div`, not `/`: long→double
    #    would drop low bits above 2^53).
    #  * timestamp[us] without tz: Spark infers TIMESTAMP_NTZ; cast to
    #    TIMESTAMP — with the session timezone pinned UTC this preserves
    #    the wall-clock, matching DuckDB's naive read of the same file.
    if name == "events":
        t = df.schema["ts"].dataType
        if isinstance(t, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(t, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if parallelize:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    _ensure_session_confs(spark)
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            # load_table, not a bare read: the SQL surface must see the
            # SAME normalized events.ts (session-UTC TIMESTAMP) as the
            # DataFrame path — a raw view exposed long-nanos/NTZ and the
            # first spark.sql over events would fail or silently diverge
            # (r7 review)
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
