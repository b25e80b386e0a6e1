"""S4: Shelly MQTT JSON-lines parsing (reference ola_dataset/
preprocess_shelly.py:19-44).

Per line: epoch-seconds ``ts``, device = ``payload.dst`` with the
``/events`` suffix stripped, power = ``payload.params.\"switch:0\".apower``.
Malformed lines (non-JSON, missing fields, non-dict payload) are excluded —
the reference silently ``continue``s; here the parse yields nulls that an
explicit filter drops, and a PERMISSIVE corrupt-record column is available
for auditing instead of silence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.schema import MQTT_LOG


def read_mqtt_log(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(MQTT_LOG).json(path, mode="PERMISSIVE")
    return parsed_mqtt_columns(raw)


def parsed_mqtt_columns(raw: DataFrame) -> DataFrame:
    """Shared batch/streaming projection: (ts timestamp, device string,
    apower double)."""
    return (
        raw.select(
            F.timestamp_seconds(F.col("ts")).alias("ts"),
            F.regexp_replace(F.col("payload.dst"), r"/events$", "").alias("device"),
            F.col("payload.params.`switch:0`.apower").alias("apower"),
        )
        .filter(
            F.col("ts").isNotNull()
            & F.col("device").isNotNull()
            & F.col("apower").isNotNull()
        )
    )
