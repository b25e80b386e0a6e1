#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/r10/.

Usage: python scripts/explain_query.py <suffix> q1 [q2 ...]
Writes plans/r10/<query>_<suffix>.txt for each query (suffix is e.g.
"before" or "after"). Runs at sf0.01 by default ($SPARK_GRAFT_SF_DIR to
override) — plan SHAPE is sf-independent for these queries; the bench
numbers are measured separately at sf0.1.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nilm_data_framework_spark.plans.registry import all_queries  # noqa: E402
from nilm_data_framework_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="explain-r10")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue().rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
