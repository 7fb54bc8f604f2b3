"""Custom stateful streaming operator: gap-based sessionization.

The reference has no event-time semantics at all (its "stream" is a pull
iterator, /root/reference/gosmonaut.go:219-236); this is the
north-rule-mandated engine extension for streaming workloads: a custom
stateful operator built on ``applyInPandasWithState`` — bounded per-key
state, event-time timeouts driven by the watermark, Arrow-batched pandas
(no per-row Python).

Semantics (identical to the batch twin :func:`sessionize_batch` for ANY
arrival order of events within the watermark): events for a key belong to
one session while consecutive event-time gaps stay <= ``gap_sec``; a
session is emitted exactly once, and ONLY when the watermark passes its
``last_ts + gap`` — before that point a legal late event could still
extend or bridge it, and append-mode emissions cannot be retracted.

Scale notes: state per key is the list of OPEN runs — bounded by the
number of gap-separated bursts inside one watermark horizon (typically
one; never O(events)); the shuffle is the groupBy(key) any sessionization
needs; timeouts bound state lifetime so abandoned keys are evicted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, n_events long"
)
# per-key OPEN runs (plural): parallel arrays of (start, last, n) in epoch
# seconds — a run may only close once the watermark passes last + gap,
# because until then a late event can still arrive and bridge it
_STATE_SCHEMA = "starts array<double>, lasts array<double>, ns array<long>"


def _split_local_sessions(ts_sec, gap_sec):
    """Sort a batch's event times and split on gaps > gap_sec.
    Returns a list of (start, last, count) runs, in time order."""
    ts = sorted(ts_sec)
    runs = []
    start = last = ts[0]
    n = 0
    for t in ts:
        if t - last > gap_sec:
            runs.append((start, last, n))
            start, n = t, 0
        last = t
        n += 1
    runs.append((start, last, n))
    return runs


def sessionize_stream(
    events: DataFrame,
    gap_sec: float,
    key_col: str = "key",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessionization over ``events(key_col, ts_col)``.

    Emits one row per CLOSED session. A session closes either inline (a
    later event for the key arrives more than ``gap_sec`` after the
    session's last event) or by event-time timeout (the watermark passes
    ``last + gap_sec`` — so the tail session of an idle key is flushed,
    not stuck in state forever).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(rows):
            return pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "session_start": [
                        pd.Timestamp(r[0], unit="s") for r in rows
                    ],
                    "session_end": [pd.Timestamp(r[1], unit="s") for r in rows],
                    "n_events": [r[2] for r in rows],
                }
            )

        # collect runs: stored open runs + this batch's local runs
        runs: list[tuple] = []
        if state.exists:
            starts, lasts, ns = state.get
            runs.extend(zip(starts, lasts, ns))
        ts_sec: list[float] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_sec.extend(
                    pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy() / 1e9
                )
        if ts_sec:
            runs.extend(_split_local_sessions(ts_sec, gap_sec))
        if not runs:
            state.remove()
            return

        # gap-merge across EVERYTHING (sorted by start): out-of-order
        # events within the watermark may bridge previously separate runs
        runs.sort()
        merged = [runs[0]]
        for s, l, c in runs[1:]:
            ps, pl, pc = merged[-1]
            if s - pl <= gap_sec:
                merged[-1] = (ps, max(pl, l), pc + c)
            else:
                merged.append((s, l, c))

        # a run closes ONLY when the watermark passes last + gap — before
        # that, a legal late event could still extend or bridge it, and an
        # append-mode emission cannot be retracted (the bug the previous
        # inline-close formulation had under out-of-order micro-batches)
        wm = state.getCurrentWatermarkMs() / 1000.0
        closed = [r for r in merged if r[1] + gap_sec < wm]
        still_open = [r for r in merged if r[1] + gap_sec >= wm]

        if still_open:
            state.update(
                (
                    [float(r[0]) for r in still_open],
                    [float(r[1]) for r in still_open],
                    [int(r[2]) for r in still_open],
                )
            )
            next_fire = int(min(r[1] + gap_sec for r in still_open) * 1000)
            # timeout must be strictly beyond the current watermark
            state.setTimeoutTimestamp(max(next_fire, int(wm * 1000) + 1))
        else:
            state.remove()
        if closed:
            yield emit(closed)

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_sec: float,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin (lag-window gap split) — the oracle for the streaming
    operator and the backfill path. Same output schema."""
    marked = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withColumn(
        "new_sess",
        F.when(
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(
                Window.partitionBy("key").orderBy(F.col("ts").asc())
            )
            > gap_sec,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess_id = F.sum("new_sess").over(
        Window.partitionBy("key")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("sess", sess_id)
        .groupBy("key", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("key", "session_start", "session_end", "n_events")
    )
