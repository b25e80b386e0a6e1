#!/usr/bin/env python
"""S3: one-time Ola HDF5 → canonical Parquet converter
(reference UnifiedNILM/OlaLoader.py:32-141).

Usage:
    python scripts/convert_h5.py <ola_dir> <out_dir>

Reads ``<ola_dir>/shelly_data.h5`` and/or ``<ola_dir>/emonesp_data.h5``
(pandas HDFStore, key="power", epoch-seconds index — the reference's
format), converts with sources/ola_h5.py (suffix typing, aggregate
computation), and writes:
    <out_dir>/readings/   — partitioned canonical fact (write_readings)
    <out_dir>/channels/   — channels dimension Parquet

Requires PyTables (``pandas.read_hdf``) — import-gated: this container
does not ship it, so the script exits with a clear message there, and the
transform core stays fully tested via in-memory frames
(tests/test_sources.py::test_ola_h5_transform*).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    ola_dir, out_dir = sys.argv[1], sys.argv[2]

    import pandas as pd

    try:
        import tables  # noqa: F401  (PyTables backs pandas.read_hdf)
    except ImportError:
        print(
            "ERROR: pandas.read_hdf requires PyTables, which is not installed.\n"
            "Install it where you run this one-time conversion: pip install tables",
            file=sys.stderr,
        )
        return 1

    from nilm_data_framework_spark.session import get_session
    from nilm_data_framework_spark.sources.canonical import write_dim, write_readings
    from nilm_data_framework_spark.sources.ola_h5 import ola_to_canonical

    frames = {}
    for name in ("shelly", "emonesp"):
        path = os.path.join(ola_dir, f"{name}_data.h5")
        if os.path.exists(path):
            print(f"reading {path}")
            frames[name] = pd.read_hdf(path, key="power")
    if not frames:
        print(f"ERROR: no *_data.h5 files under {ola_dir}", file=sys.stderr)
        return 1

    readings_pdf, channels_pdf = ola_to_canonical(
        shelly=frames.get("shelly"), emonesp=frames.get("emonesp")
    )
    print(f"{len(readings_pdf)} readings rows, {len(channels_pdf)} channels")

    spark = get_session(app_name="convert-h5")
    from nilm_data_framework_spark.schema import CHANNELS, READINGS

    write_readings(
        spark.createDataFrame(readings_pdf, READINGS), os.path.join(out_dir, "readings")
    )
    write_dim(
        spark.createDataFrame(channels_pdf, CHANNELS), os.path.join(out_dir, "channels")
    )
    print(f"wrote {out_dir}/readings and {out_dir}/channels")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
