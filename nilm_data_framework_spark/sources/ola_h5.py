"""S3: Ola HDF5 → canonical Parquet conversion semantics
(reference UnifiedNILM/OlaLoader.py:32-141).

The reference reads ``shelly_data.h5`` / ``emonesp_data.h5`` (pandas HDF
store, key="power", epoch-seconds index, one wide column per sensor) into
per-channel frames plus a computed house-wide aggregate. Spark has no HDF5
source, so this is a ONE-TIME driver-side conversion into the canonical
long Parquet model (sources/canonical.py) — after which every query runs on
Parquet. The transform core below is pure pandas (no HDF5 dependency) so it
is fully testable in this container; the `pd.read_hdf` entry point lives in
``scripts/convert_h5.py`` behind an import gate (pytables is not installed
here).

Scale note: HDF5 files in the reference are single-node artifacts (GBs at
most) — driver-side conversion is the honest cost model. The *output* is
the scalable thing: partitioned/bucketed Parquet.
"""

from __future__ import annotations

import pandas as pd

# reference OlaLoader.py:78-83
EMON_SUFFIX_MAP = {
    "_W": ("active", "watts"),
    "_VA": ("apparent", "VA"),
    "_Q": ("reactive", "VA"),
    "_PF": ("pf", "unitless"),
}


def infer_sample_rate_str(index) -> str:
    """Median positive inter-sample gap as ``"{N}S"`` (reference
    OlaLoader.py:21-30); ``"unknown"`` when fewer than two distinct times."""
    idx = pd.to_datetime(index).sort_values()
    deltas = idx.to_series().diff().dropna()
    deltas = deltas[deltas > pd.Timedelta(0)]
    if deltas.empty:
        return "unknown"
    return f"{int(deltas.median().total_seconds())}S"


def _long_rows(series: pd.Series, channel_id: str, house_id: int, dataset: str) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "dataset": dataset,
            "house_id": house_id,
            "channel_id": channel_id,
            "ts": pd.DatetimeIndex(series.index),
            "power": series.astype("float64").to_numpy(),
        }
    )
    return out.reset_index(drop=True)


def _as_datetime_index(df: pd.DataFrame) -> pd.DataFrame:
    """Epoch-seconds index → datetime64, as the reference does on load
    (OlaLoader.py:41-42,67-68); already-datetime indexes pass through."""
    if not isinstance(df.index, pd.DatetimeIndex):
        df = df.set_axis(pd.to_datetime(df.index, unit="s"))
    return df


def ola_to_canonical(
    shelly: pd.DataFrame | None = None,
    emonesp: pd.DataFrame | None = None,
    house_id: int = 1,
    dataset: str = "ola",
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Wide Ola frames (epoch-seconds index) → (readings, channels) in the
    canonical long model.

    Mirrors OlaLoader.load_metadata channel construction:
      - every Shelly column → channel ``shelly_{col}``, active/watts,
        acquisition_device "Shelly" (OlaLoader.py:46-60);
      - every EMONESP column with a known suffix → ``emonesp_{col}``, typed
        by EMON_SUFFIX_MAP, raw label = column minus suffix
        (OlaLoader.py:85-108); unknown suffixes skipped;
      - house-wide "aggregate" = row-sum of Shelly columns + EMONESP active
        columns after keep-first index dedup, sort, and fillna(0) alignment
        (OlaLoader.py:112-134), manufacturer "Computed"/model "Sum".

    ``universal_label`` is left NULL: label assignment is the relational J3
    taxonomy join (taxonomy.py), not an ingest-time Python loop.
    """
    readings, channels, aggregate_frames = [], [], []

    def add_channel(cid, raw_label, unit, dtype, rate, manufacturer, model, device):
        channels.append(
            (dataset, house_id, cid, raw_label, None, unit, dtype, rate,
             manufacturer, model, device)
        )

    if shelly is not None and len(shelly.columns):
        shelly = _as_datetime_index(shelly)
        rate = infer_sample_rate_str(shelly.index)
        for col in shelly.columns:
            readings.append(_long_rows(shelly[col], f"shelly_{col}", house_id, dataset))
            add_channel(f"shelly_{col}", str(col), "watts", "active", rate,
                        "Unknown", "Unknown", "Shelly")
        aggregate_frames.append(shelly)

    if emonesp is not None and len(emonesp.columns):
        emonesp = _as_datetime_index(emonesp)
        rate = infer_sample_rate_str(emonesp.index)
        active_cols = []
        for col in emonesp.columns:
            for suffix, (dtype, unit) in EMON_SUFFIX_MAP.items():
                if str(col).endswith(suffix):
                    readings.append(
                        _long_rows(emonesp[col], f"emonesp_{col}", house_id, dataset)
                    )
                    add_channel(f"emonesp_{col}", str(col)[: -len(suffix)], unit,
                                dtype, rate, "Unknown", "Unknown", "EMONESP")
                    if dtype == "active":
                        active_cols.append(col)
                    break
        if active_cols:
            aggregate_frames.append(emonesp[active_cols])

    if aggregate_frames:
        cleaned = [
            df[~df.index.duplicated(keep="first")].sort_index() for df in aggregate_frames
        ]
        aligned = pd.concat(cleaned, axis=1).fillna(0)
        agg = aligned.sum(axis=1)
        readings.append(_long_rows(agg, "aggregate", house_id, dataset))
        add_channel("aggregate", "aggregate", "watts", "active",
                    infer_sample_rate_str(agg.index), "Computed", "Sum", "Composite")

    readings_pdf = (
        pd.concat(readings, ignore_index=True)
        if readings
        else pd.DataFrame(columns=["dataset", "house_id", "channel_id", "ts", "power"])
    )
    channels_pdf = pd.DataFrame(
        channels,
        columns=[
            "dataset", "house_id", "channel_id", "raw_label", "universal_label",
            "unit", "data_type", "sample_rate", "manufacturer", "model",
            "acquisition_device",
        ],
    )
    return readings_pdf, channels_pdf
