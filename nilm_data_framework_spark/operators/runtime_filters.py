"""Runtime Bloom-filter join pruning (Spark's InjectRuntimeFilter rule).

At 100 TB the highest-leverage join optimization after broadcast is the
runtime bloom filter: when a selectively-filtered dimension joins a huge
fact, Spark builds a Bloom filter over the dim's join keys at runtime and
injects ``might_contain(bloom, xxhash64(fact_key))`` into the FACT SCAN,
discarding non-joining rows before the shuffle. The rule is on by default
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) but deliberately gated
to big plans: the application side must scan more than
``applicationSideScanSizeThreshold`` (default 10 GiB) and the creation side
must NOT be broadcast-able (a broadcast join already avoids shuffling the
fact's payload columns... it still shuffles nothing, so bloom adds no value
there).

Our test tables are far below both gates, so plans here would never show
the filter — this helper scopes the gates down around ONE plan's logical
optimization, then restores them, so exactly one query demonstrates (and
plan-tests pin) the 100 TB behavior without perturbing any other plan in
the session.

Reference: the reference framework has no distributed join layer at all
(UnifiedNILM.py joins pandas frames in memory); this is a pure Spark-side
scale feature documented per SURVEY.md §4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_APP_THRESHOLD = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
_BROADCAST_THRESHOLD = "spark.sql.autoBroadcastJoinThreshold"


def with_runtime_bloom_filter(
    spark: SparkSession, build: Callable[[], DataFrame]
) -> DataFrame:
    """Build ``build()``'s plan with runtime-bloom-filter gates lowered.

    Sets the application-side scan gate to 0 and disables the broadcast
    path (InjectRuntimeFilter skips creation sides it could broadcast),
    FORCES logical optimization while the gates are down — a QueryExecution
    caches its optimized plan, so the injected ``might_contain`` filter
    survives — then restores both confs before returning. Execution later
    (collect / explain / AQE replanning) derives from the cached optimized
    plan, so nothing else in the session sees the lowered gates.
    """
    old_app = spark.conf.get(_APP_THRESHOLD)
    old_bc = spark.conf.get(_BROADCAST_THRESHOLD)
    spark.conf.set(_APP_THRESHOLD, "0")
    spark.conf.set(_BROADCAST_THRESHOLD, "-1")
    try:
        df = build()
        # Force (and cache) logical optimization under the lowered gates.
        df._jdf.queryExecution().optimizedPlan()
    finally:
        spark.conf.set(_APP_THRESHOLD, old_app)
        spark.conf.set(_BROADCAST_THRESHOLD, old_bc)
    return df
