"""Custom stateful streaming operator: geofence entry/exit alerts.

The streaming twin of :func:`..operators.colocation.geofence_transitions`
— the batch op is the oracle (same enter/exit law for ANY arrival order
of events within the watermark), this is the alerting path: per-mover
inside-ANY-fence flag flips, emitted exactly once as the watermark
finalizes them.

Why stateful: a transition at time t is only safe to emit once no point
earlier than t can still arrive — a late ping between two buffered
pings can change which of them flips the flag. So points buffer in
per-key state until the watermark passes them, then finalize in event-
time order against the carried inside-flag; emissions are append-mode
and never need retraction.

Scale notes: state per key is the buffered points inside ONE watermark
horizon (bounded by ping rate × lateness budget, never O(stream)) plus
one boolean; the shuffle is the groupBy(key) any per-mover op needs;
fences are a literal config list riding the closure (same contract as
the batch op). Event-time timeouts flush idle keys' buffers; the final
boolean is retained so a mover that pings again after a quiet day keeps
its fence context.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GEOFENCE_SCHEMA = "key string, ms long, event string"
# carried inside-flag + the not-yet-finalized points (parallel arrays)
_STATE_SCHEMA = (
    "prev boolean, tss array<long>, lats array<double>, lons array<double>"
)


def geofence_stream(
    events: DataFrame,
    fences: Sequence[tuple],
    key_col: str = "key",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming geofence alerts over ``events(key, ts, lat, lon)``.

    ``fences`` is a literal list of closed ``(lat_min, lat_max, lon_min,
    lon_max)`` rects. Emits ``(key, ms, event)`` rows (event in
    {'enter','exit'}), each exactly once, in watermark-finalized order —
    identical to the batch twin on the same finalized input.
    """
    if not fences:
        raise ValueError("geofence_stream: empty fence list")
    fence_list = [tuple(float(v) for v in f) for f in fences]

    # defined inside the closure (not module level) so cloudpickle ships
    # it BY VALUE — the executor-side python worker needs no import of
    # this package to run the stateful function
    def _inside(lat: float, lon: float) -> bool:
        return any(
            a <= lat <= b and c <= lon <= d for a, b, c, d in fence_list
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pts: list[tuple] = []
        prev = False
        if state.exists:
            prev, tss, lats, lons = state.get
            pts.extend(zip(tss, lats, lons))
        if not state.hasTimedOut:
            for pdf in pdfs:
                ms = (
                    pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy()
                    // 1_000_000
                )
                pts.extend(
                    zip(
                        (int(v) for v in ms),
                        (float(v) for v in pdf[lat_col]),
                        (float(v) for v in pdf[lon_col]),
                    )
                )
        wm = state.getCurrentWatermarkMs()
        # finalize strictly-before-watermark points in event-time order
        # (ties broken by position — callers with sub-ms ping rates must
        # pre-dedup; the batch twin's id tie-break has no stream analog)
        pts.sort()
        final = [p for p in pts if p[0] < wm]
        held = [p for p in pts if p[0] >= wm]
        out = []
        for ms, lat, lon in final:
            ins = _inside(lat, lon)
            if ins != prev:
                out.append((ms, "enter" if ins else "exit"))
            prev = ins
        # keep the boolean even with an empty buffer: fence context must
        # survive quiet periods (1 bool/key — negligible state)
        state.update(
            (
                bool(prev),
                [int(p[0]) for p in held],
                [float(p[1]) for p in held],
                [float(p[2]) for p in held],
            )
        )
        if held:
            state.setTimeoutTimestamp(max(held[0][0] + 1, wm + 1))
        if out:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out),
                    "ms": [o[0] for o in out],
                    "event": [o[1] for o in out],
                }
            )

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(lat_col).cast("double").alias(lat_col),
        F.col(lon_col).cast("double").alias(lon_col),
    ).withWatermark("ts", watermark)
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=GEOFENCE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
