"""Declared schemas for the canonical data model and raw sources.

The reference's schema system is implicit/convention-based (SURVEY.md §1.2);
here every table is a declared StructType so scans never infer on 100 TB.

Canonical model (SURVEY.md §1.3):
  readings  — long fact table replacing ``channels[house][ch].data``
              (reference UnifiedNILM/UnifiedNILM.py:126-154).
  channels  — dimension replacing per-Channel metadata / HDF5 attrs
              (reference UnifiedNILM/UnifiedNILM.py:16-38,374-381).
  label_keywords — exploded LABEL_KEYWORDS_MAP taxonomy
              (reference UnifiedNILM/UniversalLabels.py:15-78).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Canonical NILM model
# ---------------------------------------------------------------------------

READINGS = StructType(
    [
        StructField("dataset", StringType()),
        StructField("house_id", IntegerType()),
        StructField("channel_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("power", DoubleType()),
    ]
)

CHANNELS = StructType(
    [
        StructField("dataset", StringType()),
        StructField("house_id", IntegerType()),
        StructField("channel_id", StringType()),
        StructField("raw_label", StringType()),
        StructField("universal_label", StringType()),
        StructField("unit", StringType()),
        StructField("data_type", StringType()),
        StructField("sample_rate", StringType()),
        StructField("manufacturer", StringType()),
        StructField("model", StringType()),
        StructField("acquisition_device", StringType()),
    ]
)

LABEL_KEYWORDS = StructType(
    [
        StructField("universal_label", StringType()),
        StructField("keyword", StringType()),
        StructField("tier", IntegerType()),
        StructField("priority", IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Raw source schemas (ingest parity; FIXTURES.md §1)
# ---------------------------------------------------------------------------

# REFIT CLEAN_House{N}.csv — reference UnifiedNILM/REFITLoader.py:36-56
REFIT_CSV = StructType(
    [StructField("Time", StringType()), StructField("Unix", LongType())]
    + [StructField("Aggregate", DoubleType())]
    + [StructField(f"Appliance{i}", DoubleType()) for i in range(1, 10)]
    + [StructField("Issues", IntegerType())]
)

# UK-DALE channel_{N}.dat — reference UnifiedNILM/UKDALELoader.py:60-74
UKDALE_DAT = StructType(
    [StructField("timestamp", LongType()), StructField("power", DoubleType())]
)

# Shelly MQTT JSON-lines — reference ola_dataset/preprocess_shelly.py:19-44
MQTT_LOG = StructType(
    [
        StructField("ts", DoubleType()),
        StructField(
            "payload",
            StructType(
                [
                    StructField("dst", StringType()),
                    StructField(
                        "params",
                        StructType(
                            [
                                StructField(
                                    "switch:0",
                                    StructType([StructField("apower", DoubleType())]),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Driver-generated synthetic tables (TESTDATA.md)
# ---------------------------------------------------------------------------

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# Multimodal asset table (engine extension, SURVEY.md §2.10): opaque binary
# payload + typed metadata; decode runs in mapInPandas (operators/multimodal.py).
MEDIA_ASSETS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
