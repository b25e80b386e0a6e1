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


def read_ukdale(spark: SparkSession, path_glob: str, house_id: int | None = None) -> DataFrame:
    raw = (
        spark.read.schema(UKDALE_DAT)
        .option("sep", " ")
        .option("mode", "PERMISSIVE")
        .csv(path_glob)
        .withColumn("_file", F.input_file_name())
    )
    out = (
        raw.filter(~F.col("_file").contains("button_press"))
        .withColumn(
            "channel_id",
            F.concat(F.lit("channel_"), F.regexp_extract("_file", r"channel_(\d+)", 1)),
        )
        .filter(F.col("timestamp").isNotNull() & F.col("power").isNotNull())
        .select(
            F.lit("ukdale").alias("dataset"),
            F.lit(house_id if house_id is not None else 0).cast("int").alias("house_id"),
            "channel_id",
            F.timestamp_seconds(F.col("timestamp")).alias("ts"),
            F.col("power").cast("double").alias("power"),
        )
    )
    return out
