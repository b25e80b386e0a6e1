#!/usr/bin/env python
"""Simulate the driver's verify pass end-to-end against __spark_entry__.py:

  t1: entry(spark) on sf0.001 → rows >= 0, stable schema
  t2: every queries()[name] at a chosen SF vs oracle_sql()[name] in DuckDB —
      row count + sorted-column names + order-insensitive value comparison.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from nilm_data_framework_spark.session import get_session  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                norm.append("NaN" if math.isnan(v) else round(v, 6))
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat()[:26])
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    # t1 smoke
    df = entrymod.entry(spark)
    n = df.count()
    print(f"t1 entry(): {n} rows, schema: {[f.name for f in df.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = rows_only = 0
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failed += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            rows_only += 1
            print(f"rows-only {name}: {len(sdf)} rows ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failed += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: cols {s_cols} vs {o_cols}")
            failed += 1
            continue
        s_rows = normalize([tuple(r) for r in sdf[s_cols].itertuples(index=False)])
        o_rows = normalize([tuple(r) for r in odf[o_cols].itertuples(index=False)])
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(o_rows)}")
            failed += 1
            continue
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} row diffs, first: {diffs[0]}")
            failed += 1
        else:
            passed += 1
            print(f"PASS {name}: {len(s_rows)} rows ({dt:.1f}s)")

    print(f"\nt2 @ {sf_dir}: {passed} passed, {failed} failed, {rows_only} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
