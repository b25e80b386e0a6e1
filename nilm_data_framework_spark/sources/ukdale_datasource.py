"""S2 (alternate surface): UK-DALE ``.dat`` as a Spark 4 Python DataSource.

The same format :mod:`nilm_data_framework_spark.sources.ukdale` reads with a
CSV scan, re-exposed through the ``pyspark.sql.datasource`` V2 API
(``spark.read.format("ukdale")``) — one InputPartition per ``.dat`` file, so
Spark schedules file-level parallelism exactly like the glob scan does, and
predicate-irrelevant files (``button_press``) are dropped at PLANNING time
(never opened) instead of filtered row-wise.

Semantics parity with ``read_ukdale`` (reference UnifiedNILM/
UKDALELoader.py:60-74 behavior): house id from the ``house_N`` directory,
channel id from the file name, malformed rows skipped silently, timestamps
are epoch seconds (UTC). Parity is pinned by
``tests/test_sources.py::test_ukdale_datasource_parity``.

Use the CSV-scan reader for production (JVM-side parsing, pushdown); this
DataSource exists because the reference's loader is a pluggable *source
registry* entry, and the V2 API is how a user plugs a truly custom format
into this engine when no built-in scan fits.
"""

from __future__ import annotations

from dataclasses import dataclass


def _iter_dat_files(root: str) -> list[tuple[str, int, str]]:
    """(path, house_id, channel_id) for every eligible channel_*.dat under
    root. Planning-time listing — button_press files never reach a task."""
    import os
    import re

    out = []
    for dirpath, _dirs, files in os.walk(root):
        # anchored: match only a house_N PATH COMPONENT (an ancestor dir like
        # warehouse_3 hijacked the id with the unanchored search — r7, same
        # fix as sources/ukdale.py)
        m_house = re.search(r"(?:^|/)house_?(\d+)(?:/|$)", dirpath)
        for fn in sorted(files):
            if not fn.endswith(".dat") or "button_press" in fn:
                continue
            m_ch = re.search(r"channel_(\d+)", fn)
            if not m_ch:
                continue
            house = int(m_house.group(1)) if m_house else 0
            out.append(
                (os.path.join(dirpath, fn), house, f"channel_{m_ch.group(1)}")
            )
    return out


try:  # pyspark>=4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    @dataclass
    class _DatFilePartition(InputPartition):
        path: str
        house_id: int
        channel_id: str

    class UKDaleReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self._root = options.get("path")
            self._house = options.get("house_id")
            if self._root is None:
                raise ValueError("ukdale datasource requires option 'path'")

        def partitions(self):  # noqa: D102 — one task per channel file
            return [
                _DatFilePartition(p, h, ch)
                for (p, h, ch) in _iter_dat_files(self._root)
            ]

        def read(self, partition):  # noqa: D102 — runs on executors
            from datetime import datetime, timezone

            house = (
                int(self._house)
                if self._house is not None
                else partition.house_id
            )
            with open(partition.path, encoding="utf-8", errors="replace") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) != 2:
                        continue  # PERMISSIVE: malformed rows drop
                    try:
                        ts_s = int(parts[0])
                        power = float(parts[1])
                    except ValueError:
                        continue
                    yield (
                        "ukdale",
                        house,
                        partition.channel_id,
                        datetime.fromtimestamp(ts_s, tz=timezone.utc),
                        power,
                    )

    class UKDaleDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "ukdale"

        def schema(self) -> str:
            return (
                "dataset string, house_id int, channel_id string, "
                "ts timestamp, power double"
            )

        def reader(self, schema):  # noqa: D102
            return UKDaleReader(self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover — pyspark<4 fallback
    UKDaleDataSource = None  # type: ignore[assignment]
    HAVE_DATASOURCE_API = False
