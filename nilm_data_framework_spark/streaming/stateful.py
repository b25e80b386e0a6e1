"""Custom stateful streaming operator (SURVEY.md §2.9): the streaming twin
of the W5 ON-segment run tracker (postprocessing.py:5-24), built on
``applyInPandasWithState``.

Per device, the state machine carries (run_state, run_start_epoch, n_samples)
across micro-batches; when a device's binary state flips, the completed run
is emitted with its span and sample count. Short-ON suppression (W5's
``min_len``) then becomes a filter on the emitted runs — identical semantics
to the batch operator, but incremental.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNS_SCHEMA = StructType(
    [
        StructField("device", StringType()),
        StructField("state", IntegerType()),
        StructField("start_epoch", LongType()),
        StructField("end_epoch", LongType()),
        StructField("n_samples", LongType()),
    ]
)

# state: (current_state int, run_start_epoch long, n_samples long, last_epoch long)
STATE_SCHEMA = StructType(
    [
        StructField("cur", IntegerType()),
        StructField("start_epoch", LongType()),
        StructField("n", LongType()),
        StructField("last_epoch", LongType()),
    ]
)


def track_runs(
    events: DataFrame,
    threshold: float,
    device: str = "device",
    ts: str = "ts",
    value: str = "apower",
    watermark: str = "10 minutes",
    flush_pad_ms: int = 10_000,
) -> DataFrame:
    """Emit completed ON/OFF runs per device as they close.

    Input: a streaming DataFrame with (device, ts timestamp, value double).
    Output: one row per completed run (device, state, start/end epoch
    seconds, n_samples). The open run stays in state until its state flips
    (or the group times out ``flush_pad_ms`` past the watermark, which
    flushes it — that trailing flush is what drains open runs at the end
    of an availableNow replay).

    ``flush_pad_ms`` is a TRADE (r7 review): the batch twin (W5
    run_segments) never splits a run on a time gap, so a device whose
    files lag more than the pad behind the watermark gets its open run
    flushed and then RESTARTED — one physical run emitted as two. Size
    the pad above the worst per-device processing-time lag (plus the
    sample interval) for split-free parity; the default suits prompt
    in-order replays like the equivalence gates. Equal-epoch rows sort
    with the value as tiebreak, keeping batch order deterministic.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (dev,) = key
        if state.hasTimedOut:
            cur, start, n, last = state.get
            state.remove()
            yield pd.DataFrame(
                {"device": [dev], "state": [cur], "start_epoch": [start],
                 "end_epoch": [last], "n_samples": [n]}
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["_epoch", "_val"], kind="mergesort")
        cur, start, n, last = state.get if state.exists else (None, None, 0, None)
        out = []
        for epoch, v in zip(rows["_epoch"], rows["_val"]):
            s = 1 if v >= threshold else 0
            if cur is None:
                cur, start, n = s, int(epoch), 0
            elif s != cur:
                out.append((dev, cur, start, int(last), n))
                cur, start, n = s, int(epoch), 0
            n += 1
            last = int(epoch)
        state.update((cur, start, n, last))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + flush_pad_ms)
        yield pd.DataFrame(
            out, columns=["device", "state", "start_epoch", "end_epoch", "n_samples"]
        )

    prepared = events.select(
        events[device].alias("device"),
        events[ts].alias("ts"),
        events[ts].cast("long").alias("_epoch"),
        events[value].cast("double").alias("_val"),
    ).withWatermark("ts", watermark)

    return prepared.groupBy("device").applyInPandasWithState(
        update,
        outputStructType=RUNS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- transformWithState (Spark 4 arbitrary-state v2 API) ---------------------
# The successor API to applyInPandasWithState above: typed state handles
# (ValueState/ListState/MapState), timers, and TTL support. track_runs
# stays on the v1 API (it ships everywhere today); this operator
# demonstrates the v2 surface on the same cumulative-aggregate shape the
# batch engine expresses as a groupBy — so batch equivalence is testable.

RUNNING_SCHEMA = StructType(
    [
        StructField("device", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_totals_v2(events: DataFrame, device: str = "device", value: str = "apower") -> DataFrame:
    """Per-device cumulative (count, sum) maintained in a ValueState and
    re-emitted every micro-batch — the incremental twin of
    ``groupBy(device).agg(count, sum)``. After a bounded stream drains, the
    LAST emission per device must equal the batch aggregate (pinned in
    tests/test_stateful_reflect.py).

    State is one (long, double) per device — bounded by key cardinality,
    the same bound the batch shuffle pays, but carried incrementally.

    RUNTIME REQUIREMENT: the v2 state-server protocol speaks protobuf; this
    container ships a broken google.protobuf (no compiled descriptors), so
    the operator raises a clear error here and its test SKIPS — the code
    follows the published API and runs wherever protobuf is intact
    (the applyInPandasWithState run tracker above carries §2.9 coverage in
    this environment).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires a working google.protobuf "
            "(state-server protocol); not available in this container"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    agg_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", agg_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (self._agg.get() or (0, 0.0)) if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf[value].sum())
            self._agg.update((n, total))
            yield pd.DataFrame({"device": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return events.groupBy(device).transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- streaming chain-debounce (r5) -------------------------------------------

DEBOUNCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("burst_id", LongType()),
    ]
)

# state: (last event tus, current burst's START tus — the emitted burst_id;
# NOT a counter: counters restart after state timeout and collide)
DEBOUNCE_STATE_SCHEMA = StructType(
    [StructField("last_tus", LongType()), StructField("burst_start", LongType())]
)


def debounce_stream(
    events: DataFrame,
    gap_us: int,
    user: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts",
    event_id: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of queries/attribution_trends.py::debounce_events:
    per (user, type), an event starts a NEW burst iff it arrives >= gap_us
    after its predecessor; otherwise it extends the open burst. Emits every
    event tagged with its burst_id (append-mode safe: the chain rule
    decides each event from carried state the moment it is seen — no
    lookahead). State per key is TWO longs regardless of volume.

    Ordering contract: rows are sorted (tus, event_id) within a batch and
    the chain carries across batches via last_tus — correct whenever
    micro-batches arrive per-key time-ordered (true for bounded replays
    and watermarked, in-order sources). An out-of-order deployment buffers
    events until the watermark before running the chain — the same caveat
    as any order-sensitive stateful operator (cf. track_runs).

    burst_id is the burst's START timestamp (micros), not a running
    counter: burst starts strictly increase within a key, so ids stay
    unique ACROSS state timeouts — a counter would restart at 1 after the
    idle-key timeout removes state, silently merging a post-timeout burst
    with the key's first burst in any downstream groupBy (r5 review fix).

    State removal is SOUND by construction (r7 fix): the timeout fires
    only once the watermark passes last_event + gap_us, i.e. exactly when
    every event that could still CONTINUE the open burst would already be
    late-dropped. The previous fixed wm+1h pad could remove state while a
    continuing in-time event was still possible (whenever gap_us exceeded
    the pad-minus-delay margin), splitting one burst into two ids against
    the batch twin. The state bound stays two longs.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid, et = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["_tus", "_eid"], kind="mergesort")
        last_tus, burst_start = state.get if state.exists else (None, 0)
        out = []
        for tus, eid in zip(rows["_tus"], rows["_eid"]):
            if last_tus is None or tus - last_tus >= gap_us:
                burst_start = int(tus)
            out.append((uid, et, int(eid), int(burst_start)))
            last_tus = int(tus)
        state.update((last_tus, int(burst_start)))
        # sound idle removal: fire only when wm > last_event + gap (any
        # burst-continuing event would then be late); Spark requires the
        # timeout ts to sit beyond the current watermark
        state.setTimeoutTimestamp(
            max(
                last_tus // 1000 + gap_us // 1000 + 1,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "event_id", "burst_id"]
        )

    from pyspark.sql import functions as F

    prepared = events.select(
        events[user].alias("user_id"),
        events[etype].alias("event_type"),
        events[ts].alias("ts"),
        F.unix_micros(events[ts]).alias("_tus"),
        events[event_id].alias("_eid"),
    ).withWatermark("ts", watermark)

    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=DEBOUNCE_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- streaming sequential-pattern (trigram) tracker (r5 post-freeze) ---------

TRIGRAM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("trigram", StringType()),
    ]
)

# state: the key's last TWO event types — everything the 3-step pattern
# needs, regardless of stream length
TRIGRAM_STATE_SCHEMA = StructType(
    [StructField("t1", StringType()), StructField("t2", StringType())]
)


def trigram_stream(
    events: DataFrame,
    user: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts",
    event_id: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of queries/extra_ops.py::event_type_trigrams: every
    event completes the 3-step pattern (prev2, prev1, current) from two
    carried strings of per-user state — the incremental form of the batch
    lead()×2 window. Emits one row per completed trigram (append-safe: the
    pattern is decided the moment its last event arrives).

    Ordering contract as debounce_stream: rows sort (tus, event_id) within
    a batch, chain carries across batches — correct for per-key
    time-ordered micro-batch replays. State is deliberately NOT timed out:
    unlike debounce (where any gap ≥ gap_us starts a fresh burst anyway,
    so dropping idle state is semantics-preserving), the batch lead()
    window spans arbitrary gaps — removing state would silently drop every
    cross-gap trigram and break batch≡stream. State is two short strings
    per ACTIVE USER (not per event); a production deployment with
    unbounded key churn adds a TTL and accepts the documented boundary
    loss.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["_tus", "_eid"], kind="mergesort")
        t1, t2 = state.get if state.exists else (None, None)
        out = []
        for et, eid in zip(rows["_et"], rows["_eid"]):
            if t1 is not None:
                out.append((uid, int(eid), f"{t1}>{t2}>{et}"))
            t1, t2 = t2, et
        state.update((t1, t2))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "trigram"])

    from pyspark.sql import functions as F

    prepared = events.select(
        events[user].alias("user_id"),
        events[ts].alias("ts"),
        F.unix_micros(events[ts]).alias("_tus"),
        events[event_id].alias("_eid"),
        events[etype].alias("_et"),
    ).withWatermark("ts", watermark)

    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRIGRAM_SCHEMA,
        stateStructType=TRIGRAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
