"""Co-presence analytics over row-per-point event streams — co-location
(contact) pairs, geofence entry/exit transitions, retention cohorts.

Three classic movement/engagement questions a web-scale event pipeline
asks on top of the trajectory family (:mod:`.trajectory`):

* *who was where together* — pairs of distinct movers observed in the
  same spatial cell within the same time bucket (contact tracing,
  ride-share matching, social-tie inference);
* *when did a mover cross a fence* — entry/exit events against a small
  curated set of rectangular geofences (zone alerting, campus/port
  presence);
* *how do users retain* — the cohort-retention triangle (first-seen
  week × week offset × distinct actives), the standard engagement
  rollup for any event log.

All three reduce to the engine's standard shapes: the integer cell law
from :mod:`..functions.cells`, distinct + equi-join (never all-pairs:
candidates are generated only inside one (cell, bucket) group, with a
window-count skew cap identical on both engines), one per-key window
sort (the sessionize budget) for transitions, and map-side-combinable
hash aggregations. No UDFs, no driver state, every expression twinnable
in ANSI SQL for the DuckDB oracle.

Determinism: cells and buckets are pure integer floors on nonnegative
epoch ms; the geofence predicate is a closed-interval comparison on
bit-identical doubles; transition order is total (order asc, id asc).

Scale shape (100 TB lens): co-location's self-join is an equi-join on
(cell, bucket) — its cost is Σ group² over groups, bounded by the
``max_group`` cap (hot cells — stadiums, airports — are excluded
loudly, the same policy as tiling's bucket caps, and the cap predicate
is part of the oracled semantics, not a hidden sample). Geofences are
a literal config list (codegen OR-fold, zero shuffle for the flag —
fence sets are human-curated and small by nature). Retention is two
map-side-combinable aggs over (user, week).

Reference parity: none — the reference (inimbir/gosmonaut) stops at
entity assembly; this extends the graft's movement family (B6-B10).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.cells import cell_expr, cell_sql

__all__ = [
    "colocation_pairs",
    "colocation_pairs_sql",
    "geofence_transitions",
    "geofence_transitions_sql",
    "retention_cohorts",
    "retention_cohorts_sql",
]


# ---------------------------------------------------------------------------
# co-location (contact) pairs
# ---------------------------------------------------------------------------


def colocation_pairs(
    pts: DataFrame,
    res: int,
    bucket_ms: int,
    key_col: str,
    order_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_group: int | None = None,
) -> DataFrame:
    """Distinct mover pairs co-present in the same res-``res`` cell within
    the same ``bucket_ms`` time bucket, with how many (cell, bucket)
    co-occurrences each pair accumulated.

    Returns ``(k1, k2, n_copresent)`` with ``k1 < k2``.

    Plan: project each ping to ``(key, cell, bucket)`` and DISTINCT it
    (a mover parked in one cell for a whole bucket counts once), then
    self equi-join on (cell, bucket) with ``k1 < k2`` — candidate pairs
    exist only inside one group, never across the corpus. ``max_group``
    is the skew guard: groups with more than that many distinct movers
    (a stadium cell during a match) are excluded by an identical
    window-count predicate on both engines BEFORE the join, bounding the
    join at ``max_group²`` per group. ``order_col`` is nonnegative
    integer epoch ms (caller pre-converts; integer-floor bucket law).
    """
    staged = (
        pts.select(
            F.col(key_col).alias("__k"),
            cell_expr(lat_col, lon_col, res).alias("__cell"),
            (F.col(order_col) / F.lit(int(bucket_ms))).cast("long").alias("__b"),
        )
        .distinct()
    )
    if max_group is not None:
        wg = Window.partitionBy("__cell", "__b")
        staged = staged.select(
            "*", F.count(F.lit(1)).over(wg).alias("__gn")
        ).where(F.col("__gn") <= F.lit(int(max_group))).drop("__gn")
    a, b = staged.alias("a"), staged.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__cell") == F.col("b.__cell"))
        & (F.col("a.__b") == F.col("b.__b"))
        & (F.col("a.__k") < F.col("b.__k")),
    )
    return pairs.groupBy(
        F.col("a.__k").alias("k1"), F.col("b.__k").alias("k2")
    ).agg(F.count(F.lit(1)).alias("n_copresent"))


def colocation_pairs_sql(
    pts_sql: str,
    res: int,
    bucket_ms: int,
    key_expr: str,
    order_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    max_group: int | None = None,
) -> str:
    """DuckDB twin — same distinct / window-cap / self-join law.
    ``order_expr`` must already be epoch ms."""
    cell = cell_sql(lat_expr, lon_expr, res)
    cap = (
        f""",
cl_capped AS (
  SELECT k, cell, b FROM (
    SELECT k, cell, b, count(*) OVER (PARTITION BY cell, b) AS gn
    FROM cl_staged
  ) WHERE gn <= {int(max_group)}
)"""
        if max_group is not None
        else """,
cl_capped AS (SELECT * FROM cl_staged)"""
    )
    return f"""WITH cl_src AS ({pts_sql}),
cl_staged AS (
  SELECT DISTINCT {key_expr} AS k, {cell} AS cell,
         {order_expr} // {int(bucket_ms)} AS b
  FROM cl_src
){cap}
SELECT a.k AS k1, b.k AS k2, count(*) AS n_copresent
FROM cl_capped a JOIN cl_capped b
  ON a.cell = b.cell AND a.b = b.b AND a.k < b.k
GROUP BY a.k, b.k"""


# ---------------------------------------------------------------------------
# geofence entry/exit transitions
# ---------------------------------------------------------------------------


def _fence_pred(lat, lon, fences: Sequence[tuple]):
    """Closed-interval OR-fold over literal (lat_min, lat_max, lon_min,
    lon_max) rects — pure codegen, mirrored textually in the SQL twin."""
    pred = F.lit(False)
    for lat_min, lat_max, lon_min, lon_max in fences:
        pred = pred | (
            (lat >= F.lit(float(lat_min)))
            & (lat <= F.lit(float(lat_max)))
            & (lon >= F.lit(float(lon_min)))
            & (lon <= F.lit(float(lon_max)))
        )
    return pred


def geofence_transitions(
    pts: DataFrame,
    fences: Sequence[tuple],
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Entry/exit events against a literal set of rectangular fences:
    for each mover in stream order, emit a row whenever the
    inside-ANY-fence flag flips (a track that *starts* inside emits an
    ``enter`` at its first ping — lag-NULL counts as outside).

    ``fences`` is a small curated list of ``(lat_min, lat_max, lon_min,
    lon_max)`` closed rectangles — config, not data (overlapping fences
    are deliberately collapsed into one boolean; per-fence attribution
    is ambiguous under overlap and callers that need it run one call per
    fence). Returns ``(key, ms, event)`` with ``event`` in
    {'enter','exit'}.

    Plan: the inside flag is a zero-shuffle codegen OR-fold; then ONE
    per-key window sort (the sessionize budget) + a lag compare. No
    join anywhere — the fence set rides the instruction stream, the
    right shape when the fence list is small and the point set is 100 TB.
    """
    if not fences:
        raise ValueError("geofence_transitions: empty fence list")
    inside = _fence_pred(F.col(lat_col), F.col(lon_col), fences)
    staged = pts.select(
        F.col(key_col),
        F.col(order_col).alias("ms"),
        F.col(id_col).alias("__id"),
        inside.alias("__in"),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("ms").asc(), F.col("__id").asc())
    prev = F.coalesce(F.lag("__in").over(w), F.lit(False))
    flagged = staged.select(
        F.col(key_col), "ms", "__in", prev.alias("__prev")
    ).where(F.col("__in") != F.col("__prev"))
    return flagged.select(
        F.col(key_col),
        "ms",
        F.when(F.col("__in"), F.lit("enter")).otherwise(F.lit("exit")).alias("event"),
    )


def geofence_transitions_sql(
    pts_sql: str,
    fences: Sequence[tuple],
    key_expr: str,
    order_expr: str,
    id_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical OR-fold, lag-NULL-as-outside law."""
    preds = " OR ".join(
        f"(lat >= {float(a)} AND lat <= {float(b)} AND "
        f"lon >= {float(c)} AND lon <= {float(d)})"
        for a, b, c, d in fences
    )
    return f"""WITH gf_src AS ({pts_sql}),
gf_staged AS (
  SELECT {key_expr} AS k, {order_expr} AS ms, {id_expr} AS pid,
         ({preds}) AS ins
  FROM (SELECT {key_expr}, {order_expr}, {id_expr},
               {lat_expr} AS lat, {lon_expr} AS lon FROM gf_src)
),
gf_flag AS (
  SELECT k, ms, ins,
         coalesce(lag(ins) OVER (PARTITION BY k ORDER BY ms ASC, pid ASC),
                  FALSE) AS prev
  FROM gf_staged
)
SELECT k AS {key_expr}, ms,
       CASE WHEN ins THEN 'enter' ELSE 'exit' END AS event
FROM gf_flag WHERE ins <> prev"""


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------


def retention_cohorts(
    events: DataFrame,
    key_col: str,
    order_col: str,
    week_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """The cohort-retention triangle: bucket activity into ``week_ms``
    periods, cohort each key by its FIRST active period, and count
    distinct keys per (cohort period, period offset).

    Returns ``(cohort_week, week_offset, n_users)`` — ``week_offset`` 0
    is the cohort's own period, so its ``n_users`` is the cohort size
    and retention rate is ``n_users / n_users[offset=0]`` downstream.

    Plan: DISTINCT (key, week) first (raw event volume never reaches
    the window), then the cohort min as a window over the SAME key
    partitioning (no extra shuffle under AQE partition reuse), then one
    map-side-combinable hash agg — after the distinct, ``count(*)`` IS
    the distinct-user count, no countDistinct state. Integer-only
    arithmetic end to end; ``order_col`` is nonnegative epoch ms.
    """
    staged = (
        events.select(
            F.col(key_col).alias("__k"),
            (F.col(order_col) / F.lit(int(week_ms))).cast("long").alias("__w"),
        )
        .distinct()
    )
    cohort = F.min("__w").over(Window.partitionBy("__k"))
    return (
        staged.select("__k", "__w", cohort.alias("__c"))
        .groupBy(
            F.col("__c").alias("cohort_week"),
            (F.col("__w") - F.col("__c")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts_sql(
    events_sql: str,
    key_expr: str,
    order_expr: str,
    week_ms: int = 7 * 86_400_000,
) -> str:
    """DuckDB twin — same distinct / window-min / offset law."""
    return f"""WITH rc_src AS ({events_sql}),
rc_staged AS (
  SELECT DISTINCT {key_expr} AS k, {order_expr} // {int(week_ms)} AS w
  FROM rc_src
),
rc_cohort AS (
  SELECT k, w, min(w) OVER (PARTITION BY k) AS c
  FROM rc_staged
)
SELECT c AS cohort_week, w - c AS week_offset, count(*) AS n_users
FROM rc_cohort GROUP BY c, w - c"""


def cohort_ltv(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_offset: int = 8,
    week_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """Cohort lifetime-value triangle → ``(cohort_week, week_offset,
    cohort_size, cum_cents, ltv_cents_per_user)`` for offsets
    0..``max_offset``, dense.

    The revenue companion of :func:`retention_cohorts`: how much has an
    average member of cohort c spent by week k after joining —
    THE curve growth/payback decisions read. Laws shared with the rest
    of the engine: weeks are integer epoch-``week_ms`` floors, cohorts
    are each key's FIRST active week (same window as retention), money
    is integer CENTS (``round(value·100)`` per event, order-free sums),
    the offset spine is dense 0..``max_offset`` so flat weeks show as
    flat rather than missing, and the single terminal division produces
    the per-user curve. Spend beyond ``max_offset`` weeks is excluded
    from the curve on both engines (truncation documented).

    Scale shape: one window over the DISTINCT (key, week) pairs for the
    cohort min (retention's budget), one cents agg per (key-week), one
    (cohort, offset) agg, then a cumulative window over the tiny
    triangle table. No driver state.
    """
    wk = (F.col(order_col) / F.lit(int(week_ms))).cast("long")
    staged = events.select(
        F.col(key_col).alias("k"),
        wk.alias("w"),
        F.round(F.col(value_col) * F.lit(100.0)).cast("long").alias("cents"),
    )
    cohort_w = Window.partitionBy("k")
    with_c = staged.select(
        "k", "w", "cents", F.min("w").over(cohort_w).alias("c")
    ).where(F.col("w") - F.col("c") <= F.lit(int(max_offset)))
    per = with_c.groupBy(
        F.col("c").alias("cohort_week"),
        (F.col("w") - F.col("c")).alias("week_offset"),
    ).agg(F.sum("cents").alias("wk_cents"))
    sizes = (
        with_c.select("k", "c")
        .distinct()
        .groupBy(F.col("c").alias("cohort_week"))
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    spine = sizes.select(
        "cohort_week",
        "cohort_size",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(max_offset)))
        ).alias("week_offset"),
    )
    cum_w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(per, ["cohort_week", "week_offset"], "left")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            F.coalesce(F.col("wk_cents"), F.lit(0).cast("long")).alias(
                "__wc"
            ),
        )
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            F.sum("__wc").over(cum_w).alias("cum_cents"),
        )
        .withColumn(
            "ltv_cents_per_user",
            F.col("cum_cents").cast("double")
            / F.col("cohort_size").cast("double"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_ltv_sql(
    events_sql: str,
    key_expr: str,
    order_expr: str,
    value_expr: str,
    max_offset: int = 8,
    week_ms: int = 7 * 86_400_000,
) -> str:
    """DuckDB twin — identical week floors, cents law, dense spine and
    cumulative window."""
    wm = int(week_ms)
    return f"""WITH cl_src AS ({events_sql}),
cl_s AS (
  SELECT {key_expr} AS k, ({order_expr}) // {wm} AS w,
         CAST(round(({value_expr}) * 100.0) AS BIGINT) AS cents
  FROM cl_src
),
cl_c AS (
  SELECT k, w, cents, min(w) OVER (PARTITION BY k) AS c FROM cl_s
),
cl_f AS (SELECT * FROM cl_c WHERE w - c <= {int(max_offset)}),
cl_p AS (
  SELECT c AS cohort_week, w - c AS week_offset, sum(cents) AS wk_cents
  FROM cl_f GROUP BY 1, 2
),
cl_z AS (
  SELECT c AS cohort_week, count(DISTINCT k) AS cohort_size
  FROM cl_f GROUP BY 1
),
cl_sp AS (
  SELECT z.cohort_week, z.cohort_size, o.week_offset
  FROM cl_z z, (SELECT unnest(range(0, {int(max_offset) + 1}))
                AS week_offset) o
),
cl_cum AS (
  SELECT s.cohort_week, s.week_offset, s.cohort_size,
         CAST(sum(coalesce(p.wk_cents, 0)) OVER (
           PARTITION BY s.cohort_week ORDER BY s.week_offset
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_cents
  FROM cl_sp s LEFT JOIN cl_p p
    ON p.cohort_week = s.cohort_week AND p.week_offset = s.week_offset
)
SELECT cohort_week, week_offset, cohort_size, cum_cents,
       CAST(cum_cents AS DOUBLE) / CAST(cohort_size AS DOUBLE)
         AS ltv_cents_per_user
FROM cl_cum
ORDER BY cohort_week, week_offset"""
