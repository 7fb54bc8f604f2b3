"""Custom stateful streaming operator: gap-based sessionization.

The reference has no event-time semantics at all (its "stream" is a pull
iterator, /root/reference/gosmonaut.go:219-236); this is the
north-rule-mandated engine extension for streaming workloads: a custom
stateful operator built on ``applyInPandasWithState`` — bounded per-key
state, event-time timeouts driven by the watermark, Arrow-batched pandas
(no per-row Python).

Semantics (identical to the batch twin :func:`sessionize_batch`):
events for a key belong to one session while consecutive event-time gaps
stay <= ``gap_sec``; a session closes when a larger gap arrives or when
the watermark passes ``last_ts + gap`` (timeout). Closed sessions are
emitted exactly once: ``(key, session_start, session_end, n_events)``.

Scale notes: state per key is three scalars (start, last, count) — O(keys)
not O(events); the shuffle is the groupBy(key) that any sessionization
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
_STATE_SCHEMA = "start double, last double, n long"  # epoch seconds


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

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        ts_sec: list[float] = []
        for pdf in pdfs:
            ts_sec.extend(
                pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy() / 1e9
            )
        runs = _split_local_sessions(ts_sec, gap_sec)

        closed = []
        if state.exists:
            start, last, n = state.get
            first_start, first_last, first_n = runs[0]
            if first_start - last <= gap_sec:
                # batch's first run extends the open session
                runs[0] = (
                    min(start, first_start),
                    max(last, first_last),
                    n + first_n,
                )
            else:
                closed.append((start, last, n))
            # merging the stored session can EXTEND runs[0].last past the
            # gap to the next local run (late events within the watermark
            # land before the stored session's last event) — re-run the
            # gap merge across adjacent runs before declaring any closed,
            # or one true session is emitted as two
            merged = [runs[0]]
            for s, l, c in runs[1:]:
                ps, pl, pc = merged[-1]
                if s - pl <= gap_sec:
                    merged[-1] = (min(ps, s), max(pl, l), pc + c)
                else:
                    merged.append((s, l, c))
            runs = merged
        # all runs but the newest are now separated by > gap -> closed
        closed.extend(runs[:-1])
        start, last, n = runs[-1]
        state.update((float(start), float(last), int(n)))
        # flush via watermark: timeout fires when wm passes last + gap
        state.setTimeoutTimestamp(int((last + gap_sec) * 1000))
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
