#!/usr/bin/env python
"""Per-query profiling: min-of-3 noop-sink wall time + Spark job/stage counts.

Usage: python scripts/profile_query.py q1 [q2 ...] [--reps=3]
Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].
Job/stage counts come from the statusTracker delta around the LAST rep
(steady state); they are the r8 lesson's first check — a flat per-job
dispatch constant times the job count explains most of a toy-scale
query's wall time before any stage-level work does.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nilm_data_framework_spark.plans.registry import all_queries  # noqa: E402
from nilm_data_framework_spark.session import get_session  # noqa: E402


def main() -> None:
    reps = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="profile-r09")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    # warmup (JVM/codegen, parquet footers)
    specs["distinct_labels"].spark(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        best = float("inf")
        jobs = stages = 0
        for rep in range(reps):
            spark.catalog.clearCache()
            group = f"profile-{name}-{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).write.mode(
                "overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup("idle", "idle")
            if dt < best:
                best = dt
            new_jobs = set(tracker.getJobIdsForGroup(group) or [])
            jobs = len(new_jobs)
            stages = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    stages += len(ji.stageIds)
        print(f"{name}: best={best:.3f}s  jobs(last_rep)={jobs} "
              f"stages={stages}", flush=True)


if __name__ == "__main__":
    main()
