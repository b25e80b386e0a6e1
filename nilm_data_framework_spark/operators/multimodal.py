"""Multimodal columns (SURVEY.md §2.10): image/audio/video as opaque
``binary`` payloads + typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode=\"fake\"`` produces deterministic features from the payload bytes so
the Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested; ``decode=\"real\"`` raises NotImplementedError at the point
where PIL/torchaudio/ffmpeg would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: FEATURE_DIM floats
    derived from sha256 of the payload. Replaces (not approximates) the real
    decoder; swap in PIL/librosa here in a full environment."""
    digest = hashlib.sha256(modality.encode() + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)


def _real_decode(payload: bytes, modality: str) -> np.ndarray:
    raise NotImplementedError(
        "real multimodal decode requires PIL/torchaudio/ffmpeg, which are not "
        "available in this container; use decode='fake' for plumbing tests"
    )


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract each asset's binary payload.

    mapInPandas: executors receive Arrow record batches; the Python worker
    loops payloads per batch (the decode is inherently per-object) and emits
    fixed-width float features. Partitioning of the input is preserved — no
    shuffle; this is a narrow map at any scale.
    """
    decoder = _fake_decode if decode == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(p) if p is not None else b"", m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def sample_frames(assets: DataFrame, every_ms: int = 1000, decode: str = "fake") -> DataFrame:
    """Frame-sampling plumbing for video/audio: one output row per sampled
    frame (duration_ms / every_ms frames), features per frame. Demonstrates
    the 1→N mapInPandas shape used by real frame extraction."""
    decoder = _fake_decode if decode == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_feats = [], [], []
            for aid, payload, dur in zip(pdf["asset_id"], pdf["payload"], pdf["duration_ms"]):
                # Arrow hands nullable ints to pandas as NaN floats, not None
                dur_ms = 0 if dur is None or pd.isna(dur) else int(dur)
                n = max(1, dur_ms // every_ms)
                base = decoder(bytes(payload) if payload is not None else b"", "video")
                for i in range(n):
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_feats.append(np.roll(base, i))
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "features": out_feats}
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)
