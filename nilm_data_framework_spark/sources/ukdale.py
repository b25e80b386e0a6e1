"""S2: UK-DALE ``.dat`` source (reference UnifiedNILM/UKDALELoader.py:60-74).

Whitespace-delimited ``timestamp power`` per ``channel_{N}.dat``. The
reference loops files with per-file try/except and skips ``button_press``
files; Spark-first: one glob scan, channel id from ``input_file_name()``,
button-press/malformed rows excluded declaratively (PERMISSIVE mode replaces
the silent try/except — UKDALELoader.py:116-117).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.schema import UKDALE_DAT


def read_ukdale(
    spark: SparkSession,
    path_glob: str,
    house_id: int | None = None,
    houses: list[int] | None = None,
) -> DataFrame:
    """house_id comes from the ``house_N/`` path component (UK-DALE's layout,
    one directory per building); ``house_id`` overrides for single-house
    globs without the directory structure. ``houses`` generalizes the
    reference's hardcoded house-4-only filter (UKDALELoader.py:49-50,
    ``if house_id != 4: continue``): pass ``houses=[4]`` for exact parity
    with that run configuration; the filter compares the path-derived id
    so Catalyst can prune whole files after the scan's file-name column
    materializes (and, with a per-house directory glob, list pruning skips
    the directories outright)."""
    raw = (
        spark.read.schema(UKDALE_DAT)
        .option("sep", " ")
        .option("mode", "PERMISSIVE")
        .csv(path_glob)
        .withColumn("_file", F.input_file_name())
    )
    if house_id is not None:
        house = F.lit(house_id).cast("int")
    else:
        # anchored to a PATH COMPONENT: the unanchored r"house_?(\d+)"
        # matched the first occurrence anywhere in the path, so an
        # ancestor directory like /data/warehouse_3/ hijacked the house id
        # for every row (r7 review)
        house = F.regexp_extract("_file", r"/house_?(\d+)/", 1).cast("int")
    if houses is not None:
        # Filter on the resolved ``house`` expression so an explicit
        # ``house_id`` override is honored; re-extracting from ``_file``
        # would yield NULL (drop every row) on single-house globs whose
        # paths lack a ``house_N/`` component.
        raw = raw.filter(house.isin(houses))
    out = (
        raw.filter(~F.col("_file").contains("button_press"))
        .withColumn(
            "channel_id",
            F.concat(F.lit("channel_"), F.regexp_extract("_file", r"channel_(\d+)", 1)),
        )
        .filter(F.col("timestamp").isNotNull() & F.col("power").isNotNull())
        .select(
            F.lit("ukdale").alias("dataset"),
            house.alias("house_id"),
            "channel_id",
            F.timestamp_seconds(F.col("timestamp")).alias("ts"),
            F.col("power").cast("double").alias("power"),
        )
    )
    return out
