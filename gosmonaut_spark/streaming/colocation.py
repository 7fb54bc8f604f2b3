"""Streaming co-location alerts — a watermarked STREAM-STREAM self-join.

The streaming twin of :func:`..operators.colocation.colocation_pairs`'
candidate stage, live: two movers pinging the same res-``res`` cell
within ``delta_ms`` of each other emit a contact alert as soon as both
pings have arrived — the real-time half of contact tracing / proximity
notification.

This is the one Structured Streaming join shape the engine had not yet
exercised: an INNER stream-stream join with watermarks on both sides
and an event-time range condition. Spark buffers each side's pings in
join state only until the watermark passes ``ts + delta`` (the range
condition bounds state — without it a stream-stream join must buffer
forever), so state is O(ping rate × (lateness + delta)), never
O(stream).

Semantics are deterministic and equal to the batch twin
(:func:`colocation_batch_pairs`) on the same finalized input: the
emitted set is exactly the rows of the static self-join with the same
cell/key/time predicate — arrival order and micro-batch boundaries
change only WHEN a pair emits, never whether.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_expr


def _keyed(pings: DataFrame, res, key_col, ts_col, lat_col, lon_col, watermark):
    return (
        pings.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            cell_expr(lat_col, lon_col, res).alias("cell"),
        )
        .withWatermark("ts", watermark)
    )


def _pair_condition(delta_ms: int):
    """Join condition over frames aliased 'a' and 'b' — qualified names,
    the only unambiguous way to express a streaming self-join."""
    delta = F.expr(f"INTERVAL {int(delta_ms)} MILLISECONDS")
    return (
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.key") < F.col("b.key"))
        & (F.col("b.ts") >= F.col("a.ts") - delta)
        & (F.col("b.ts") <= F.col("a.ts") + delta)
    )


def colocation_stream(
    pings: DataFrame,
    res: int,
    delta_ms: int,
    key_col: str = "key",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    watermark: str = "1 hour",
) -> DataFrame:
    """Contact alerts over a ping stream: one row per (ping of k1, ping
    of k2) with ``k1 < k2``, same cell, event times within ``delta_ms``.
    Returns ``(k1, k2, cell, t1, t2)``.
    """
    a = _keyed(pings, res, key_col, ts_col, lat_col, lon_col, watermark).alias("a")
    b = _keyed(pings, res, key_col, ts_col, lat_col, lon_col, watermark).alias("b")
    return a.join(b, _pair_condition(delta_ms), "inner").select(
        F.col("a.key").alias("k1"),
        F.col("b.key").alias("k2"),
        F.col("a.cell").alias("cell"),
        F.col("a.ts").alias("t1"),
        F.col("b.ts").alias("t2"),
    )


def colocation_batch_pairs(
    pings: DataFrame,
    res: int,
    delta_ms: int,
    key_col: str = "key",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Batch twin — the identical predicate on static frames; the oracle
    for the streaming join and the backfill path."""
    base = pings.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        cell_expr(lat_col, lon_col, res).alias("cell"),
    )
    a, b = base.alias("a"), base.alias("b")
    return a.join(b, _pair_condition(delta_ms), "inner").select(
        F.col("a.key").alias("k1"),
        F.col("b.key").alias("k2"),
        F.col("a.cell").alias("cell"),
        F.col("a.ts").alias("t1"),
        F.col("b.ts").alias("t2"),
    )
