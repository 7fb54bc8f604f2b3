"""Event-time rolling-window aggregates (RANGE frames per key).

The sliding-metric workhorse (per-user moving averages / rolling counts
over the trailing N minutes) expressed as ONE window pass with a
RANGE frame over zone-free epoch milliseconds — no self-join, no
explode-per-window-slot. Complements the engine's time family: asof
(nearest past event), interval (containment), funnel (ordered steps),
sessionize (gap split); this adds trailing-window analytics.

Scale shape (100 TB lens): a single hash partition on the key + one
per-key time sort — identical cost to the sessionize window; the RANGE
frame is evaluated by Spark's sliding-frame executor in O(rows) per
partition (each row enters/leaves the frame once), never O(rows ×
frame). Hot keys are bounded by the same per-key sort every windowed
op here pays; there is no global sort.

Cross-engine twin notes: frame BOUNDS are integer epoch-ms arithmetic
(bit-exact); windowed SUM/AVG reassociate between engines (sliding-sum
vs recompute), so consumers compare averages at round(x, 9) — counts
and min/max are exact.

Reference parity: none — the reference has no windowed analytics; this
is part of the graft's event-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeops import ntz_epoch_ms

__all__ = [
    "rolling_stats",
    "rolling_stats_sql",
    "transition_counts",
    "transition_counts_sql",
]


def rolling_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_ms: int,
) -> DataFrame:
    """Trailing-window stats per event: for each row, aggregates over the
    key's events in ``(ts - window_ms, ts]`` — half-open at the old edge
    (an event exactly ``window_ms`` old has expired), closed at now.

    Returns the input keyed columns plus ``ts_ms``, ``n_window``,
    ``sum_window``, ``min_window``, ``max_window`` (and the row's id
    columns untouched — select before calling to prune wide payloads,
    same guidance as asof_join's payload_cols).
    """
    ms = ntz_epoch_ms(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ms").asc())
        .rangeBetween(-(int(window_ms) - 1), 0)
    )
    v = F.col(value_col).cast("double")
    return (
        events.withColumn("__ms", ms)
        .select(
            F.col(key_col),
            F.col("__ms").alias("ts_ms"),
            v.alias("__v"),
            F.count(F.lit(1)).over(w).alias("n_window"),
            F.sum(v).over(w).alias("sum_window"),
            F.min(v).over(w).alias("min_window"),
            F.max(v).over(w).alias("max_window"),
        )
        .drop("__v")
    )


def rolling_stats_sql(
    events_sql: str,
    key_expr: str,
    ms_expr: str,
    value_expr: str,
    window_ms: int,
) -> str:
    """DuckDB twin — identical RANGE frame bounds on the same epoch-ms
    integers. ``events_sql`` must yield the key/ms/value columns."""
    lo = int(window_ms) - 1
    frame = f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY {key_expr} ORDER BY {ms_expr} ASC {frame})"
    return f"""WITH rw_events AS ({events_sql})
SELECT {key_expr}, {ms_expr} AS ts_ms,
       count(*) {over} AS n_window,
       sum(CAST({value_expr} AS DOUBLE)) {over} AS sum_window,
       min(CAST({value_expr} AS DOUBLE)) {over} AS min_window,
       max(CAST({value_expr} AS DOUBLE)) {over} AS max_window
FROM rw_events"""


# ---------------------------------------------------------------------------
# event-transition matrix (first-order Markov counts per event stream)
# ---------------------------------------------------------------------------


def transition_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order transition counts over each key's time-ordered event
    stream: ``(from_type, to_type, n)`` — the Markov-chain summary
    behind next-action prediction and anomalous-flow detection.

    One lag window per key (ts order, ties broken by ``id_col`` so the
    stream order is total and deterministic) + one hash agg on the
    (from, to) pair — the same two-shuffle budget as sessionize. Each
    key's first event has no predecessor and is excluded.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ntz_epoch_ms(F.col(ts_col)).asc(), F.col(id_col).asc())
    )
    lagged = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return lagged.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def transition_counts_sql(
    events_sql: str,
    key_expr: str,
    ms_expr: str,
    type_expr: str,
    id_expr: str,
) -> str:
    """DuckDB twin — identical lag law (epoch-ms order, id tie-break)."""
    return f"""WITH tc_events AS ({events_sql}),
tc_lag AS (
  SELECT lag({type_expr}) OVER (
           PARTITION BY {key_expr} ORDER BY {ms_expr} ASC, {id_expr} ASC
         ) AS from_type,
         {type_expr} AS to_type
  FROM tc_events
)
SELECT from_type, to_type, count(*) AS n
FROM tc_lag WHERE from_type IS NOT NULL
GROUP BY from_type, to_type"""
