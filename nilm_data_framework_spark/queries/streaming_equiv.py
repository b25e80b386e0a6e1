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

from nilm_data_framework_spark.operators.exact_math import (
    ratio_e4,
    ratio_e4_sql,
    u6_mean_e4,
    u6_mean_e4_sql,
)
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import _ensure_session_confs

_SINK = "streaming_resample_equiv_sink"


def _stream_dir(sf_dir: str) -> str:
    """The file-stream source requires a DIRECTORY basePath (it monitors for
    new files); events.parquet is a single file, so stream a temp dir
    holding a symlink to it — zero copy, and exactly how an unbounded
    deployment would look (files arriving in a watched directory)."""
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
    return d


def _events_stream(spark: SparkSession, sf_dir: str):
    """Streaming scan of the RAW events table. The file-stream source needs
    an explicit schema, but the generator's physical ts type has varied
    across testdata drops (TIMESTAMP(NANOS) → long under nanosAsLong; plain
    timestamp[us] → TIMESTAMP_NTZ), so take the schema from a metadata-only
    batch read of the same file and normalize ts exactly as
    sources/testdata.py:load_table does for batch. STAGED fixtures (written
    from load_table output, ts already normalized) must NOT go through this
    helper — read them with the _EVENTS_TS schema directly."""
    from pyspark.sql.types import LongType, TimestampNTZType

    src_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = spark.readStream.schema(src_schema).parquet(_stream_dir(sf_dir))
    t = src_schema["ts"].dataType
    if isinstance(t, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(t, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory_sink(agg, name: str, output_mode: str = "complete"):
    """Drain a bounded stream into a fresh memory sink (stop any stale query
    of the same name first) and block until complete. ``complete`` retains
    all state (full unification checks); ``append`` exercises watermark
    eviction — state is dropped and emitted as the watermark passes, which
    is what the late-data query needs."""
    for q in agg.sparkSession.streams.active:
        if q.name == name:
            q.stop()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query(
    "streaming_resample_equiv",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_ts,
           {u6_mean_e4_sql('sum(CAST(floor(value * 1000000) AS BIGINT))', 'count(*)')} AS avg_value_e4,
           count(*) AS n
    FROM events GROUP BY ALL
    """,
    survey_ref="§2.9 streaming analog (preprocess_shelly.py:19-64; A1 UnifiedNILM.py:66-124)",
    tags=("streaming",),
)
def streaming_resample_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    # exact fixed-point mean (1e-6-truncated integer sum -> round-half-up
    # e4): a float mean's accumulation order differs between the streaming
    # state store and the batch oracle, flipping a 4dp round at sf0.1 (r5)
    agg = (
        stream.withColumn("v_u6", F.floor(F.col("value") * 1000000).cast("long"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "3600 seconds").alias("w"), "event_type")
        .agg(F.sum("v_u6").alias("_s"), F.count(F.lit(1)).alias("n"))
    )
    _run_to_memory_sink(agg, _SINK)
    return spark.table(_SINK).select(
        "event_type",
        F.col("w.start").alias("bucket_ts"),
        u6_mean_e4("_s", "n").alias("avg_value_e4"),
        "n",
    )


_SESS_SINK = "streaming_sessionize_equiv_sink"


@query(
    "streaming_sessionize_equiv",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       >= 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    ),
    per AS (SELECT user_id, session_id, count(*) AS cnt FROM sess GROUP BY ALL),
    agg AS (
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(cnt) AS BIGINT) AS n_events
      FROM per GROUP BY user_id
    )
    SELECT user_id, n_sessions, n_events,
           {ratio_e4_sql('n_events', 'n_sessions')} AS avg_session_events_e4
    FROM agg
    """,
    survey_ref="§2.9 streaming session windows (session_window; batch twin of W5/sessionize)",
    tags=("streaming",),
)
def streaming_sessionize_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, gap) on a real stream == gaps-and-islands batch
    sessionization. Boundary semantics: Spark's session window is
    [start, end) with end = last_ts + gap, so an event arriving EXACTLY gap
    after the previous one opens a new session — the batch oracle therefore
    breaks on ``delta >= gap`` (the batch `sessionize` twin uses ``>`` with
    event_id tie-breaks; both are valid reference semantics, pinned
    explicitly in each oracle)."""
    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    per_session = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "1800 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    _run_to_memory_sink(per_session, _SESS_SINK)
    return (
        spark.table(_SESS_SINK)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("cnt").alias("n_events"),
        )
        .select(
            "user_id", "n_sessions", "n_events",
            ratio_e4("n_events", "n_sessions").alias("avg_session_events_e4"),
        )
    )


# --- watermark late-data DROP semantics --------------------------------------
# The two queries above prove batch-stream unification on fully-drained
# input; this one proves the WATERMARK actually drops post-eviction late
# data. Three files stream in deterministic (mtime) order, one per
# micro-batch:
#   a.parquet  events < Jan 20      — advances the watermark to maxA-1h
#   b.parquet  events >= Jan 20     — its batch EVICTS+EMITS all windows
#                                     ending <= maxA-1h, wm -> maxB-1h
#   c.parquet  shifted-id copies of day-1 events — every row's window was
#                                     evicted a batch ago -> ALL dropped
# Empirically pinned semantics (probed before writing this): a late row
# merges fine while its window state is live (eviction happens at END of
# the batch whose wm passed the window end; in-batch arrivals still merge)
# and is dropped only once the state is gone. Hence the oracle is the plain
# batch aggregate over the REAL events with the emission cutoff
# window_end <= max(ts)-1h — the injected late file must leave no trace.

_LATE_SINK = "streaming_late_drop_sink"
_EVENTS_TS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _staged_stream_dir(dir_tag: str, slices: dict[str, DataFrame]) -> str:
    """Materialize a multi-file streaming fixture: each slice is written as
    ONE parquet file with strictly increasing mtimes so FileStreamSource
    order is deterministic. The whole fixture is assembled in a PID-KEYED
    scratch dir (dead-owner reaped, per the repo's /tmp rule) and PUBLISHED
    into the shared watched path with one atomic os.rename — concurrent
    processes can never observe a partial fixture or race on a shared stage
    dir (r5 review fix); a publish-race loser discards its build and uses
    the winner's complete fixture. Cached on the LAST file's presence
    (rename publishes all-or-nothing, so the last file existing implies a
    complete fixture)."""
    import glob
    import shutil
    import tempfile

    from nilm_data_framework_spark.tmpdirs import pid_scratch_dir

    d = os.path.join(tempfile.gettempdir(), dir_tag)
    names = list(slices)
    done = os.path.join(d, f"{names[-1]}.parquet")
    if os.path.exists(done):
        return d
    build = pid_scratch_dir(
        os.path.join(tempfile.gettempdir(), "stream_fixture_build"), f"{dir_tag}_"
    )
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    for i, (name, df) in enumerate(slices.items()):
        stage = os.path.join(build, f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(build, f"{name}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dest, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    try:
        os.rename(build, d)
    except OSError:
        if os.path.exists(done):
            # lost the publish race to a COMPLETE fixture — use the winner's
            shutil.rmtree(build, ignore_errors=True)
        else:
            # d is a stale partial from a crashed pre-atomic build: replace
            shutil.rmtree(d, ignore_errors=True)
            os.rename(build, d)
    return d


def _late_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """The 3-file late-arrival fixture from the batch events table."""
    import hashlib

    from nilm_data_framework_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    return _staged_stream_dir(
        f"late_drop_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
        {
            "a": ev.filter(F.col("ts") < F.lit("2024-01-20")),
            "b": ev.filter(F.col("ts") >= F.lit("2024-01-20")),
            "c": ev.filter(F.col("ts") < F.lit("2024-01-02")).withColumn(
                "event_id", F.col("event_id") + F.lit(1000000)
            ),
        },
    )


@query(
    "streaming_late_data_drop",
    oracle=f"""
    WITH wmf AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             count(*) AS n,
             {u6_mean_e4_sql('sum(CAST(floor(value * 1000000) AS BIGINT))', 'count(*)')} AS avg_value_e4
      FROM events GROUP BY 1, 2
    )
    SELECT * FROM agg WHERE bucket_ts + INTERVAL 1 HOUR <= (SELECT w FROM wmf)
    """,
    survey_ref="§2.9 watermark semantics: post-eviction late data dropped (append mode)",
    tags=("streaming",),
)
def streaming_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    d = _late_stream_dir(spark, sf_dir)
    stream = spark.readStream.schema(_EVENTS_TS).option("maxFilesPerTrigger", 1).parquet(d)
    agg = (
        stream.withColumn("v_u6", F.floor(F.col("value") * 1000000).cast("long"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "3600 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_u6").alias("_s"))
    )
    _run_to_memory_sink(agg, _LATE_SINK, output_mode="append")
    return spark.table(_LATE_SINK).select(
        F.col("w.start").alias("bucket_ts"), "event_type", "n",
        u6_mean_e4("_s", "n").alias("avg_value_e4"),
    )


# --- streaming dedup (stateful distinct-keys) --------------------------------
# dropDuplicates on a stream keeps the first ARRIVAL per key — which row that
# is depends on partition/batch order, so the check aggregates to an output
# that is invariant to the survivor choice: distinct (user_id, event_type)
# counts per type. State = one entry per distinct key (bounded by key-domain
# cardinality, the right state bound for entity-keyed dedup; content-hash
# dedup over unbounded keys uses dropDuplicatesWithinWatermark + the batch
# exact-dedup backfill instead).

_DEDUP_SINK = "streaming_dedup_equiv_sink"


@query(
    "streaming_dedup_equiv",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    survey_ref="§2.9 streaming dedup (stateful dropDuplicates; batch twin of P10/W2)",
    tags=("streaming",),
)
def streaming_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    _run_to_memory_sink(deduped, _DEDUP_SINK, output_mode="append")
    return (
        spark.table(_DEDUP_SINK)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_SLIDING_SINK = "streaming_sliding_window_sink"


@query(
    "streaming_sliding_window_equiv",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1]) AS o),
    w AS (
      SELECT event_type,
             date_trunc('hour', ts) - to_hours(o) AS w_start,
             value
      FROM events, offs
    )
    SELECT event_type, w_start, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM w GROUP BY event_type, w_start
    """,
    survey_ref="§2.9 streaming SLIDING windows (window(2h, 1h) — each event in 2 overlapping windows; tumbling is streaming_resample_equiv)",
    tags=("streaming",),
)
def streaming_sliding_window_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregate: 2-hour windows every hour, so
    every event lands in exactly two windows (the overlap is what tumbling
    can't express — rolling rates, moving averages over event time). The
    batch oracle replays the window assignment as an explicit
    event x {0,1}-offset expansion. State cost in a real deployment is
    (windows alive within the watermark) x groups — bounded by the
    watermark horizon exactly like the tumbling case, just x(size/slide)."""
    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # sum, not avg: the synthetic values carry 2 decimals, so an
            # 8-element avg lands EXACTLY on the 4dp rounding boundary and
            # the two engines' summation orders flip the rounding; the sum
            # of 2dp values is never on a 2dp boundary.
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    _run_to_memory_sink(agg, _SLIDING_SINK)
    return spark.table(_SLIDING_SINK).select(
        "event_type", F.col("w.start").alias("w_start"), "n", "sum_value"
    )


_DEDUP_WM_SINK = "streaming_dedup_watermark_sink"


@query(
    "streaming_dedup_watermark_equiv",
    oracle="""
    SELECT event_type,
           count(DISTINCT (user_id, CAST(ts AS DATE))) AS n_user_days
    FROM events GROUP BY event_type
    """,
    survey_ref="§2.9 streaming windowed dedup (dropDuplicatesWithinWatermark — state is EVICTED past the horizon, unlike dropDuplicates' unbounded key set)",
    tags=("streaming",),
)
def streaming_dedup_watermark_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user-same-day events count once per type. The operator under
    test is ``dropDuplicatesWithinWatermark`` — the production form of
    streaming dedup: ``dropDuplicates`` retains every key ever seen
    (state grows with stream history, eventually OOM on an unbounded
    stream), while the watermark variant evicts keys older than the
    horizon, bounding state by the dedup window. On this bounded replay
    (single-file source → one micro-batch, watermark only advances after
    it) no eviction fires mid-batch, so the result equals the batch
    distinct — which is exactly the equivalence worth attesting.
    """
    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .select("event_type", "user_id", F.to_date("ts").alias("day"), "ts")
        .dropDuplicatesWithinWatermark(["event_type", "user_id", "day"])
    )
    _run_to_memory_sink(deduped, _DEDUP_WM_SINK, output_mode="append")
    return (
        spark.table(_DEDUP_WM_SINK)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
    )


# --- stream-static join ------------------------------------------------------
# The enrichment topology every deployment runs: an unbounded fact stream
# joined to a slowly-changing dim snapshot. Stream-static inner joins are
# STATELESS — each micro-batch probes the current dim (broadcast if small,
# shuffle otherwise, AQE-decided per batch), so this scales with batch size,
# not stream history.

_SJOIN_SINK = "streaming_static_join_sink"


@query(
    "streaming_static_join_equiv",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           count(*) AS n, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY ALL
    """,
    survey_ref="§2.9 stream-static enrichment join (streaming J1 analog)",
    tags=("streaming",),
)
def streaming_static_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nilm_data_framework_spark.sources.testdata import load_table

    _ensure_session_confs(spark)
    stream = _events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    joined = stream.join(dim, stream["user_id"] == dim["c_custkey"])
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    _run_to_memory_sink(agg, _SJOIN_SINK)
    return spark.table(_SJOIN_SINK).select("segment", "event_type", "n", "sum_value")


# --- stream-stream join ------------------------------------------------------
# The funnel/attribution topology: two unbounded streams inner-joined on an
# entity key with an event-time range bound. Both sides carry watermarks and
# the join condition bounds b.ts to [a.ts, a.ts + 30min], so Spark can size
# the join state to the window + watermark and EVICT — the state never grows
# with stream length, which is the whole 100 TB story for stream-stream
# joins (unbounded-state joins are rejected by the engine in append mode).

_SSJOIN_SINK = "streaming_stream_join_sink"


@query(
    "streaming_stream_join_equiv",
    oracle="""
    SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id,
           epoch_us(a.ts) AS view_ts_us, epoch_us(b.ts) AS purchase_ts_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    survey_ref="§2.9 stream-stream range join (watermark-bounded state; batch twin of J-ext range join)",
    tags=("streaming",),
)
def streaming_stream_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    _run_to_memory_sink(joined, _SSJOIN_SINK, output_mode="append")
    return spark.table(_SSJOIN_SINK).select(
        "view_id",
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("view_ts")).alias("view_ts_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_ts_us"),
    )


_DEBOUNCE_SINK = "streaming_debounce_equiv_sink"

# gap + burst-tagging CTEs are SHARED with the batch debounce_events query
# (queries/attribution_trends.py) — the whole point of this gate is batch
# == stream on the same grain, so the grain definition must live once
from nilm_data_framework_spark.queries.attribution_trends import (  # noqa: E402
    _DEBOUNCE_GAP_US,
    DEBOUNCE_BURSTS_CTES,
)


@query(
    "streaming_debounce_equiv",
    oracle=f"""
    {DEBOUNCE_BURSTS_CTES},
    per AS (
      SELECT user_id, event_type, burst_id, count(*) AS blen
      FROM bursts GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           count(*) AS n_kept,
           CAST(sum(blen) AS BIGINT) AS n_raw,
           CAST(max(blen) AS BIGINT) AS max_burst
    FROM per GROUP BY 1, 2
    """,
    survey_ref="§2.9 custom stateful operator: streaming chain-debounce "
    "(streaming/stateful.py::debounce_stream, applyInPandasWithState — "
    "2-long state per key) == the batch gaps-and-islands debounce",
)
def streaming_debounce_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """debounce_stream on a real bounded stream == the batch window-based
    debounce (same oracle family as debounce_events). The stateful kernel
    tags every event with its burst id from 2 longs of per-key state; the
    drained sink then reduces bursts exactly like the batch query — so the
    gate proves the INCREMENTAL chain state machine matches the
    gaps-and-islands formulation row-for-row."""
    _ensure_session_confs(spark)
    from nilm_data_framework_spark.streaming.stateful import debounce_stream

    stream = _events_stream(spark, sf_dir)
    tagged = debounce_stream(stream, gap_us=_DEBOUNCE_GAP_US)
    _run_to_memory_sink(tagged, _DEBOUNCE_SINK, output_mode="append")
    per = (
        spark.table(_DEBOUNCE_SINK)
        .groupBy("user_id", "event_type", "burst_id")
        .agg(F.count(F.lit(1)).alias("blen"))
    )
    return per.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("blen").alias("n_raw"),
        F.max("blen").alias("max_burst"),
    )


# --- foreachBatch incremental MERGE (streaming -> lakehouse state) -----------------------

_MERGE_STATE_PREFIX = "merge_state_"


def _split3_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events cut into 3 files by ``event_id % 3`` — with
    maxFilesPerTrigger=1 the stream runs as 3 micro-batches over disjoint
    row sets."""
    import hashlib

    from nilm_data_framework_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    return _staged_stream_dir(
        f"split3_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
        {f"b{i}": ev.filter(F.col("event_id") % 3 == i) for i in range(3)},
    )


@query(
    "streaming_merge_upsert_equiv",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             AS total_u6,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
    survey_ref="§2.9 + lakehouse extension: foreachBatch incremental MERGE "
    "— per-batch aggregates accumulated into versioned per-key state; "
    "final state == the one-shot batch aggregate",
)
def streaming_merge_upsert_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production streaming→lakehouse ingest pattern: each micro-batch
    reduces to per-user aggregates, then MERGEs into a persisted state
    table (operators/lakehouse.py::merge_accumulate) via ``foreachBatch``
    — read state v{id-1}, combine, overwrite v{id} (the parquet stand-in
    for a Delta/Iceberg transactional MERGE), keyed by the BATCH ID so a
    replayed micro-batch is idempotent per the foreachBatch contract.
    Because + and greatest are commutative-associative, the final state is
    invariant to the micro-batch cut, which the one-shot batch oracle
    replays exactly: all value math is exact integer micro-units, so no
    accumulation-order float drift exists either. The 3-file fixture
    forces 3 real MERGE rounds (asserted), not one degenerate batch."""
    import hashlib
    import shutil
    import tempfile

    from nilm_data_framework_spark.operators import lakehouse as LH

    _ensure_session_confs(spark)
    d = _split3_stream_dir(spark, sf_dir)
    state_root = os.path.join(
        tempfile.gettempdir(),
        f"{_MERGE_STATE_PREFIX}{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    shutil.rmtree(state_root, ignore_errors=True)
    os.makedirs(state_root, exist_ok=True)
    seen_batches: set[int] = set()

    def upsert(batch: DataFrame, batch_id: int) -> None:
        # IDEMPOTENT under micro-batch replay (the foreachBatch contract:
        # a batch can be re-delivered with the same id after a commit
        # failure): state version = batch id, prev = v{batch_id-1} — a
        # replayed batch re-reads the SAME prev and overwrites its own
        # output instead of accumulating itself twice.
        agg_b = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("total_u6"),
            F.max("ts").alias("last_ts"),
        )
        prev_path = os.path.join(state_root, f"v{batch_id - 1}")
        prev = spark.read.parquet(prev_path) if batch_id > 0 else None
        merged = LH.merge_accumulate(
            prev, agg_b, "user_id", sums=["n_events", "total_u6"], maxes=["last_ts"]
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id}")
        )
        seen_batches.add(batch_id)

    schema = spark.read.parquet(os.path.join(d, "b0.parquet")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen_batches == {0, 1, 2}, f"expected 3 MERGE rounds, got {seen_batches}"
    return spark.read.parquet(os.path.join(state_root, "v2")).select(
        "user_id", "n_events", "total_u6", "last_ts"
    )
