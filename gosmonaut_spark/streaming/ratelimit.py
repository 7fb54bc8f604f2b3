"""Custom stateful streaming operator: per-key token-bucket rate limiting.

The ingestion-guard primitive in front of every per-tenant pipeline:
admit at most ``capacity`` burst events per key, refilling at ``rate``
tokens/second, and DECIDE DETERMINISTICALLY in event time — the same
event stream gives the same admit/deny bits no matter how micro-batches
arrive. Built on ``applyInPandasWithState`` like
:mod:`~gosmonaut_spark.streaming.sessions`: bounded per-key state,
event-time timeouts, Arrow-batched pandas (no per-row Python in the
plan; the per-key replay loop runs over a key's UNDECIDED buffer only).

Determinism law (all integers):

* the bucket holds MILLITOKENS: refill for a gap of ``delta_ms`` is
  exactly ``delta_ms * rate`` (ms × tokens/s = millitokens), capped at
  ``capacity * 1000``; one admitted event costs 1000.
* events replay in (event-time ms, event id) order — a total order, so
  ties cannot reorder between engines or runs.
* an event is decided ONLY once the watermark passes its timestamp
  (append-mode emissions cannot be retracted, and a late earlier event
  could change the bucket); undecided events wait in state.

State per key: the decided frontier's (bucket_mtok, last_ms) plus the
undecided buffer — bounded by the events inside one watermark horizon,
never O(stream).

The reference has no streaming surface (its pull iterator,
/root/reference/gosmonaut.go:219-236, is batch); this operator belongs
to the graft's streaming family mandated by the north rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, event_id long, ms long, admitted int"
_STATE_SCHEMA = (
    "bucket_mtok long, last_ms long, buf_ms array<long>, buf_id array<long>"
)


def _replay(bucket_mtok, last_ms, events, cap_mtok, rate_tps):
    """Replay (ms, id)-sorted events through the bucket. Returns
    (decisions, bucket_mtok, last_ms); decisions align with events."""
    out = []
    for ms, _eid in events:
        if last_ms is None:
            bucket_mtok = cap_mtok
        else:
            delta = ms - last_ms
            if delta > 0:
                bucket_mtok = min(cap_mtok, bucket_mtok + delta * rate_tps)
        last_ms = ms if last_ms is None else max(last_ms, ms)
        if bucket_mtok >= 1000:
            bucket_mtok -= 1000
            out.append(1)
        else:
            out.append(0)
    return out, bucket_mtok, last_ms


def rate_limit_stream(
    events: DataFrame,
    capacity: int,
    rate_tps: int,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming token-bucket admit/deny over
    ``events(key_col, ts_col, id_col)`` → one appended row per DECIDED
    event ``(key, event_id, ms, admitted)``.

    A fresh key starts with a FULL bucket (burst-friendly ingestion,
    the standard convention). Decisions emit once the watermark passes
    the event's timestamp; the tail is flushed by event-time timeout.
    """
    cap_mtok = int(capacity) * 1000
    rate = int(rate_tps)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bucket, last, buf_ms, buf_id = state.get
            buf = list(zip(buf_ms, buf_id))
            last = None if last < 0 else last
        else:
            bucket, last, buf = 0, None, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ms = (
                    pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy()
                    // 1_000_000
                )
                buf.extend(zip(ms.tolist(), pdf[id_col].tolist()))
        buf.sort()
        wm = state.getCurrentWatermarkMs()
        ready = [e for e in buf if e[0] <= wm]
        waiting = [e for e in buf if e[0] > wm]
        decided, bucket, last = _replay(bucket, last, ready, cap_mtok, rate)
        if waiting:
            state.update(
                (
                    int(bucket),
                    int(last) if last is not None else -1,
                    [int(e[0]) for e in waiting],
                    [int(e[1]) for e in waiting],
                )
            )
            state.setTimeoutTimestamp(max(waiting[0][0], wm + 1))
        elif last is None or (
            min(cap_mtok, bucket + max(0, wm - last) * rate) >= cap_mtok
        ):
            # no decided frontier, or the bucket has provably refilled by
            # the watermark (any future event has ms > wm, so it sees a
            # full bucket either way) — the fresh-key full-bucket
            # convention reproduces this state exactly, so dropping it
            # cannot change any later decision.
            state.remove()
        else:
            # All buffered events decided but the bucket is NOT full:
            # dropping (bucket_mtok, last_ms) here would hand the next
            # event of this key a fresh FULL bucket and diverge from
            # rate_limit_batch (the determinism law). Keep the frontier
            # with empty buffers and arm an event-time timeout at the
            # instant the bucket provably refills; the timed-out
            # invocation re-enters this branch chain with an empty buffer
            # and removes the then-full state. rate == 0 never refills —
            # state is kept with no timeout (bounded: one row per key).
            state.update((int(bucket), int(last), [], []))
            if rate > 0:
                refill_ms = last + -(-(cap_mtok - bucket) // rate)
                state.setTimeoutTimestamp(max(refill_ms, wm + 1))
        if ready:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(ready),
                    "event_id": [e[1] for e in ready],
                    "ms": [e[0] for e in ready],
                    "admitted": decided,
                }
            )

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias(ts_col),
        F.col(id_col).cast("long").alias(id_col),
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def rate_limit_batch(
    events: DataFrame,
    capacity: int,
    rate_tps: int,
    key_col: str = "key",
    ms_col: str = "ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch twin — the identical replay law over the complete stream,
    via ``applyInPandas`` (Arrow-batched; the per-key loop is the
    sequential token bucket itself, irreducible by definition)."""
    cap_mtok = int(capacity) * 1000
    rate = int(rate_tps)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ms_col, id_col])
        evs = list(zip(pdf[ms_col].tolist(), pdf[id_col].tolist()))
        decided, _b, _l = _replay(0, None, evs, cap_mtok, rate)
        return pd.DataFrame(
            {
                "key": pdf[key_col].astype(str).tolist(),
                "event_id": [e[1] for e in evs],
                "ms": [e[0] for e in evs],
                "admitted": decided,
            }
        )

    return (
        events.select(
            F.col(key_col).alias(key_col),
            F.col(ms_col).cast("long").alias(ms_col),
            F.col(id_col).cast("long").alias(id_col),
        )
        .groupBy(key_col)
        .applyInPandas(fn, schema=OUT_SCHEMA)
    )
