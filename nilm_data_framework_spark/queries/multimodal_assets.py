"""Multimodal-column queries (SURVEY.md §2.10; BASELINE.json north_star).

The testdata has no binary tables, so an assets table is synthesized from
``documents``: payload = utf-8 bytes of the text, modality cycles by doc_id,
duration derived from n_chars. The decode is the deterministic sha256 fake
(operators/multimodal.py) — which DuckDB can replicate from the same bytes,
so the mapInPandas plumbing is FULLY oracle-checked, features included.
Feature values are compared as exact uint16 ints (float32 round-trips the
integer exactly; comparing the floats at fixed decimals would be flaky).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.multimodal import extract_features, sample_frames
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import load_table

_MODALITY_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)

# j-th uint16 (little-endian) of sha256(prefix || text), as SQL over the hex.
def _u16_sql(hex_expr: str, j: int) -> str:
    lo = f"CAST(('0x' || substr({hex_expr}, {4 * j + 1}, 2)) AS INT)"
    hi = f"CAST(('0x' || substr({hex_expr}, {4 * j + 3}, 2)) AS INT)"
    return f"({lo} + 256 * {hi})"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr(_MODALITY_SQL).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        ((F.col("n_chars") * 37) % 5000).cast("int").alias("duration_ms"),
    )


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS asset_id,
           {_MODALITY_SQL} AS modality,
           octet_length(encode(text)) AS n_bytes,
           {_u16_sql(f"sha256(({_MODALITY_SQL}) || text)", 0)} AS f0_u16,
           {_u16_sql(f"sha256(({_MODALITY_SQL}) || text)", 15)} AS f15_u16
    FROM documents
    """,
    survey_ref="§2.10 multimodal decode/feature-extract (mapInPandas, stubbed decoder)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_assets(spark, sf_dir), decode="fake")
    u16 = lambda i: F.round(F.element_at("features", i) * 65535).cast("int")  # noqa: E731
    return feats.select(
        "asset_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        u16(1).alias("f0_u16"),
        u16(16).alias("f15_u16"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH a AS (
      SELECT doc_id AS asset_id,
             greatest(1, ((n_chars * 37) % 5000) // 1000) AS n_frames,
             sha256('video' || text) AS hex
      FROM documents
    )
    , f AS (
      SELECT asset_id, hex, unnest(range(0, n_frames)) AS i FROM a
    )
    SELECT asset_id, CAST(i AS INT) AS frame_idx,
           -- frame i leads with base[(16 - i) % 16] (np.roll(base, i)[0])
           (CAST(('0x' || substr(hex, 4 * ((16 - i) % 16) + 1, 2)) AS INT)
            + 256 * CAST(('0x' || substr(hex, 4 * ((16 - i) % 16) + 3, 2)) AS INT))
             AS f0_u16
    FROM f
    """,
    survey_ref="§2.10 multimodal frame sampling (1→N mapInPandas)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_assets(spark, sf_dir), every_ms=1000, decode="fake")
    return frames.select(
        "asset_id",
        "frame_idx",
        F.round(F.element_at("features", 1) * 65535).cast("int").alias("f0_u16"),
    )
