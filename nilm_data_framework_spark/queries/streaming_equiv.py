"""§2.9 driver-visible streaming check: Structured Streaming resample ==
batch A1 on the same data.

The streaming analog of the MQTT ingest (streaming/ingest.py:29) is covered
by pytest; this registers a DRIVER query so the correctness gate exercises a
real streaming execution: ``readStream`` over the events parquet →
watermark + tumbling-window mean (the A1 shape) → ``availableNow`` trigger
into a memory sink → the sink table is returned and hash-compared against
the batch SQL oracle. With availableNow + complete output the stream drains
the full input, so the final sink state must equal the batch aggregation —
THE batch-streaming unification Structured Streaming promises.

NOTE: the builder necessarily executes eagerly (starts and awaits the
stream) — the returned DataFrame is the materialized sink table. Scale: the
same plan runs incrementally on an unbounded source with the watermark
bounding state; availableNow here is the bounded-backfill mode of that same
deployment (Spark docs: Structured Streaming programming guide).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import _ensure_session_confs

_EVENTS_LONG_TS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_SINK = "streaming_resample_equiv_sink"


@query(
    "streaming_resample_equiv",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_ts,
           round(avg(value), 4) AS avg_value,
           count(*) AS n
    FROM events GROUP BY ALL
    """,
    survey_ref="§2.9 streaming analog (preprocess_shelly.py:19-64; A1 UnifiedNILM.py:66-124)",
    tags=("streaming",),
)
def streaming_resample_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    # The file-stream source requires a DIRECTORY basePath (it monitors for
    # new files); events.parquet is a single file, so stream a temp dir
    # holding a symlink to it — zero copy, and exactly how an unbounded
    # deployment would look (files arriving in a watched directory).
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    d = os.path.join(
        tempfile.gettempdir(),
        f"stream_equiv_{hashlib.md5(src.encode()).hexdigest()[:12]}",
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    # ts is TIMESTAMP(NANOS) → long under nanosAsLong, converted exactly as
    # sources/testdata.py:load_table does for batch.
    stream = (
        spark.readStream.schema(_EVENTS_LONG_TS)
        .parquet(d)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "3600 seconds").alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )
    # restartable in a shared session: stop a stale query of the same name
    for q in spark.streams.active:
        if q.name == _SINK:
            q.stop()
    q = (
        agg.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SINK).select(
        "event_type",
        F.col("w.start").alias("bucket_ts"),
        "avg_value",
        "n",
    )
