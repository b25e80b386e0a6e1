"""S6: UK-DALE NILMTK metadata build — building{N}.yaml + labels.dat →
channels dimension (reference create_ukdale_metadata.py:13-91).

The reference walks houses 1..5, joins three tiny per-house files
(``building{N}.yaml`` elec_meters/appliances, ``labels.dat`` channel→label)
and emits a combined JSON keyed ``"House {N}"`` with one entry per channel:
``{channel, appliance_raw_label, manufacturer, model, acquisition_device}``
("Unknown" defaults throughout).

This is bootstrap-time dimension building over a handful of KB-scale files,
so the parse is deliberately driver-side pure Python (PyYAML); Spark enters
only at the end (``ukdale_channels_dim`` → ``spark.createDataFrame``), after
which the dim behaves exactly like the S5 JSON dim (J1 broadcast join side).
At 100 TB of readings this dim is still ~dozens of rows per house — driver
parse is the right cost model.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

_UNKNOWN = "Unknown"


def parse_labels(text: str) -> dict[int, str]:
    """``labels.dat`` lines ``"<channel> <label...>"`` → {channel: label}
    (reference create_ukdale_metadata.py:30-36: split(" ", 1), skip
    malformed lines)."""
    out: dict[int, str] = {}
    for line in text.splitlines():
        parts = line.strip().split(" ", 1)
        if len(parts) == 2:
            out[int(parts[0])] = parts[1]
    return out


def house_channel_entries(building_data: dict, label_lookup: dict[int, str]) -> list[dict]:
    """One house's channel entries from parsed building YAML + labels
    (reference create_ukdale_metadata.py:38-77, including its quirks:
    later appliances sharing an ``original_name`` overwrite the
    manufacturer/model mapping; empty original_name never maps)."""
    meter_device_map = {
        ch: (meter or {}).get("device_model", _UNKNOWN)
        for ch, meter in (building_data.get("elec_meters") or {}).items()
    }
    original_name_map: dict[str, dict[str, str]] = {}
    channel_to_original_name: dict[int, str] = {}
    for appliance in building_data.get("appliances") or []:
        original_name = (appliance.get("original_name") or "").strip().lower()
        for channel in appliance.get("meters") or []:
            channel_to_original_name[channel] = original_name
        if original_name:
            original_name_map[original_name] = {
                "manufacturer": appliance.get("manufacturer", _UNKNOWN),
                "model": appliance.get("model", _UNKNOWN),
            }
    entries = []
    for channel in sorted(label_lookup):
        original_name = channel_to_original_name.get(channel, "").lower()
        meta = original_name_map.get(original_name, {})
        entries.append(
            {
                "channel": channel,
                "appliance_raw_label": label_lookup[channel],
                "manufacturer": meta.get("manufacturer", _UNKNOWN),
                "model": meta.get("model", _UNKNOWN),
                "acquisition_device": meter_device_map.get(channel, _UNKNOWN),
            }
        )
    return entries


def build_combined_metadata(
    metadata_dir: str,
    labels_base_dir: str,
    houses: Iterable[int] = range(1, 6),
) -> dict[str, list[dict]]:
    """``{"House {N}": [entry, ...]}`` — the reference's combined-JSON
    object (create_ukdale_metadata.py:58-91). Houses with either file
    missing are skipped, as in the reference (lines 19-21)."""
    import yaml  # PyYAML — public, present in the container

    combined: dict[str, list[dict]] = {}
    for house_num in houses:
        building_file = os.path.join(metadata_dir, f"building{house_num}.yaml")
        labels_file = os.path.join(labels_base_dir, f"house_{house_num}", "labels.dat")
        if not (os.path.exists(building_file) and os.path.exists(labels_file)):
            continue
        with open(building_file, "r") as f:
            building_data = yaml.safe_load(f) or {}
        with open(labels_file, "r") as f:
            labels = parse_labels(f.read())
        combined[f"House {house_num}"] = house_channel_entries(building_data, labels)
    return combined


def write_combined_metadata(combined: dict[str, list[dict]], path: str) -> None:
    """Persist the combined object as JSON (the reference writes a
    hand-formatted one-line-per-channel file; the parsed object is
    identical — json.dumps round-trips the same structure)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(combined, f, indent=2)


def ukdale_channels_dim(
    spark: SparkSession,
    metadata_dir: str,
    labels_base_dir: str,
    houses: Iterable[int] = range(1, 6),
) -> DataFrame:
    """The S5-shaped channels dimension straight from raw NILMTK metadata:
    (house_id int, channel_id string, label, manufacturer, model,
    acquisition_device). Drop-in J1 broadcast-join side — bounded size
    (channels per house), so a broadcast hint on it is scale-safe."""
    combined = build_combined_metadata(metadata_dir, labels_base_dir, houses)
    rows = [
        (
            int(house_key.split(" ", 1)[1]),
            str(e["channel"]),
            e["appliance_raw_label"],
            e["manufacturer"],
            e["model"],
            e["acquisition_device"],
        )
        for house_key, entries in combined.items()
        for e in entries
    ]
    return spark.createDataFrame(
        rows,
        "house_id int, channel_id string, label string, manufacturer string, "
        "model string, acquisition_device string",
    )
