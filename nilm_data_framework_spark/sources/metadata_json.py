"""S5: nested appliance-metadata JSON → channels dimension table
(reference REFITLoader.py:31-33,60-65; UKDALELoader.py:39-41,57-58).

The reference loads ``{house: {channel: {label, manufacturer, ...}}}`` into
a Python dict and .get()s per channel. Spark-first: one multiLine JSON scan,
the nested maps exploded to one row per (house_id, channel_id) — a proper
dimension table for the J1 broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

_FIELDS = ["label", "manufacturer", "model", "acquisition_device"]


def read_metadata_json(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``{house: {channel: {field: value}}}`` JSON into
    (house_id int, channel_id string, label, manufacturer, model,
    acquisition_device) — missing fields null (the reference's
    .get(..., {}) defaulting happens at the J1 join instead).

    The file is a single nested object, so the scan is one driver-side-ish
    record — fine: this is dimension data. The explode happens relationally
    (two map explosions), not with Python loops.
    """
    raw = spark.read.option("multiLine", True).json(path)
    # one column per house id; normalize via a map and explode twice
    houses = F.from_json(F.to_json(F.struct(*raw.columns)), MapType(StringType(), StringType()))
    per_house = raw.select(F.explode(houses).alias("house_id", "channels_json"))
    channels = per_house.select(
        F.col("house_id").cast("int").alias("house_id"),
        F.explode(
            F.from_json(F.col("channels_json"), MapType(StringType(), StringType()))
        ).alias("channel_id", "meta_json"),
    )
    meta = F.from_json(F.col("meta_json"), MapType(StringType(), StringType()))
    return channels.select(
        "house_id",
        "channel_id",
        *[meta[f].alias(f) for f in _FIELDS],
    )
