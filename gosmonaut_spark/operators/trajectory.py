"""Trajectory analytics over row-per-point event streams — OD matrix,
stay-point (dwell) detection, heading-sector histograms.

The engine's geo family so far measures tracks (``trajectory_length``)
and indexes points (``cells``/``geohash``); movement pipelines also ask
*where trips go* (origin→destination flows between tiles), *where they
stop* (stay points: runs of consecutive pings inside one cell for at
least a dwell threshold — the classic stay-point detection step that
precedes POI mining), and *which way they head* (compass-sector
histograms per mover). All three reduce to the engine's standard
shapes: the integer cell law from :mod:`..functions.cells`, one per-key
window sort (the sessionize budget), and hash aggregations — no UDFs,
no driver state, every expression twinnable in ANSI SQL for the DuckDB
oracle.

Determinism: stream order is total (``order_col`` asc, ties by
``id_col``); cells are pure integer floors; dwell arithmetic is integer
milliseconds. Bearings are the only transcendental — each segment's
bearing is rounded to 1e-6 degrees BEFORE the sector floor, so the
cross-engine trig ulp (~1e-13 deg) sits far below the rounding grain
(same guard law as the mm rounding in ``trajectory_length``).

Scale shape (100 TB lens): one hash partition + per-key sort feeds all
three ops; the aggregations are map-side-combinable groupBys. Hot
movers (fleet vehicles with millions of pings) cost one per-key sort —
the same contract as ``events_sessionize``; cell ids keep the OD and
stay outputs bounded by (cells²) and (runs), never by raw ping count.

Reference parity: none — the reference (inimbir/gosmonaut) stops at
entity assembly; this extends the graft's tiling/kNN (B6-B9) family to
movement analytics over the same cell index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.cells import cell_expr, cell_sql
from ..functions.geo import haversine_m, haversine_sql

__all__ = [
    "od_matrix",
    "od_matrix_sql",
    "stay_points",
    "stay_points_sql",
    "bearing_sectors",
    "bearing_sectors_sql",
    "simplify_track",
    "simplify_track_sql",
    "traj_jaccard_pairs",
    "traj_jaccard_pairs_sql",
    "resample_track",
    "resample_track_sql",
]


# ---------------------------------------------------------------------------
# origin-destination matrix
# ---------------------------------------------------------------------------


def od_matrix(
    pts: DataFrame,
    res: int,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Tile-to-tile trip flows: for each key (a trip / user-day / vehicle
    shift) take its FIRST and LAST point in stream order, map both to the
    res-``res`` cell, and count keys per (origin, destination) pair.

    Returns ``(o_cell, d_cell, n_trips)``. Single-point keys contribute a
    diagonal (o == d) flow — the "never moved" bucket real OD pipelines
    keep.

    Plan: ONE per-key window sort carrying ``row_number`` + the partition
    count (last = rn == cnt), then a conditional-aggregate groupBy — no
    self-join — then the (o, d) hash agg. Two map-side-combinable
    shuffles + one sort total. ``order_col`` is integer epoch ms (the
    caller pre-converts, same contract as ``trajectory_length``).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    wall = Window.partitionBy(key_col)
    staged = pts.select(
        F.col(key_col).alias("__k"),
        cell_expr(lat_col, lon_col, res).alias("__cell"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__cnt"),
    )
    ends = staged.groupBy("__k").agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__cell"))).alias("o_cell"),
        F.max(F.when(F.col("__rn") == F.col("__cnt"), F.col("__cell"))).alias(
            "d_cell"
        ),
    )
    return ends.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips")
    )


def od_matrix_sql(
    pts_sql: str,
    res: int,
    key_expr: str,
    order_expr: str,
    id_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """DuckDB twin — same window law, same integer cell arithmetic.
    ``pts_sql`` must yield key/order/id/lat/lon columns; ``order_expr``
    must already be epoch ms (the caller applies ``epoch_ms``)."""
    cell = cell_sql(lat_expr, lon_expr, res)
    return f"""WITH od_src AS ({pts_sql}),
od_staged AS (
  SELECT {key_expr} AS k, {cell} AS cell,
         row_number() OVER (PARTITION BY {key_expr}
                            ORDER BY {order_expr} ASC, {id_expr} ASC) AS rn,
         count(*) OVER (PARTITION BY {key_expr}) AS cnt
  FROM od_src
),
od_ends AS (
  SELECT k,
         max(CASE WHEN rn = 1 THEN cell END) AS o_cell,
         max(CASE WHEN rn = cnt THEN cell END) AS d_cell
  FROM od_staged GROUP BY k
)
SELECT o_cell, d_cell, count(*) AS n_trips
FROM od_ends GROUP BY o_cell, d_cell"""


# ---------------------------------------------------------------------------
# stay-point (dwell) detection
# ---------------------------------------------------------------------------


def stay_points(
    pts: DataFrame,
    res: int,
    min_dwell_ms: int,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Stay points: maximal runs of CONSECUTIVE points inside one cell,
    kept when the run spans at least ``min_dwell_ms`` — the grid-exact
    variant of Li/Zheng stay-point detection (a radius threshold becomes
    the cell size; choosing ``res`` picks the stop scale).

    Returns one row per qualifying dwell episode:
    ``(key, cell, enter_ms, exit_ms, n_points)``; ``exit_ms - enter_ms``
    is the dwell. Re-entering the same cell later opens a NEW episode
    (runs are consecutive by construction — the property POI-visit
    counting needs).

    Plan: the sessionize law on cell-change — lag + conditional flag +
    running sum over ONE per-key window sort, then a hash agg per
    (key, run). Integer-only arithmetic end to end; ``order_col`` is
    integer epoch ms (caller pre-converts).
    """
    staged = pts.select(
        F.col(key_col).alias("__k"),
        F.col(order_col).alias("__ms"),
        F.col(id_col).alias("__id"),
        cell_expr(lat_col, lon_col, res).alias("__cell"),
    )
    w2 = Window.partitionBy("__k").orderBy(
        F.col("__ms").asc(), F.col("__id").asc()
    )
    new_run = F.when(
        F.lag("__cell").over(w2).isNull()
        | (F.lag("__cell").over(w2) != F.col("__cell")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = staged.select(
        "__k",
        "__ms",
        "__cell",
        F.sum(new_run)
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__run"),
    )
    return (
        runs.groupBy("__k", "__run")
        .agg(
            F.min("__cell").alias("cell"),
            F.min("__ms").alias("enter_ms"),
            F.max("__ms").alias("exit_ms"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .where(F.col("exit_ms") - F.col("enter_ms") >= F.lit(int(min_dwell_ms)))
        .select(
            F.col("__k").alias(key_col), "cell", "enter_ms", "exit_ms", "n_points"
        )
    )


def stay_points_sql(
    pts_sql: str,
    res: int,
    min_dwell_ms: int,
    key_expr: str,
    order_expr: str,
    id_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical run-length law (``order_expr`` is epoch ms)."""
    cell = cell_sql(lat_expr, lon_expr, res)
    return f"""WITH sp_src AS ({pts_sql}),
sp_staged AS (
  SELECT {key_expr} AS k, {order_expr} AS ms, {id_expr} AS pid,
         {cell} AS cell
  FROM sp_src
),
sp_flag AS (
  SELECT k, ms, pid, cell,
         CASE WHEN lag(cell) OVER w IS NULL
                OR lag(cell) OVER w <> cell THEN 1 ELSE 0 END AS new_run
  FROM sp_staged
  WINDOW w AS (PARTITION BY k ORDER BY ms ASC, pid ASC)
),
sp_runs AS (
  SELECT k, ms, cell,
         sum(new_run) OVER (PARTITION BY k ORDER BY ms ASC, pid ASC
                            ROWS UNBOUNDED PRECEDING) AS run
  FROM sp_flag
)
SELECT k AS {key_expr}, min(cell) AS cell, min(ms) AS enter_ms,
       max(ms) AS exit_ms, count(*) AS n_points
FROM sp_runs GROUP BY k, run
HAVING max(ms) - min(ms) >= {int(min_dwell_ms)}"""


# ---------------------------------------------------------------------------
# heading-sector histogram
# ---------------------------------------------------------------------------


def _bearing_deg(lat1, lon1, lat2, lon2):
    """Initial great-circle bearing (degrees in [0, 360)) — the standard
    forward-azimuth law. Written once, mirrored textually in the SQL twin."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(rl2)
    x = F.cos(rl1) * F.sin(rl2) - F.sin(rl1) * F.cos(rl2) * F.cos(dlon)
    deg = F.degrees(F.atan2(y, x))
    # normalize to [0, 360) without engine-specific modulo sign rules
    return deg - F.lit(360.0) * F.floor(deg / F.lit(360.0))


def bearing_sectors(
    pts: DataFrame,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_sectors: int = 8,
) -> DataFrame:
    """Per-key compass-sector histogram of segment headings — the
    direction-of-travel profile (commute asymmetry, one-way detection).

    Each consecutive segment's forward azimuth is rounded to 1e-6 deg
    (absorbing cross-engine trig ulps), floored into one of
    ``n_sectors`` equal sectors (0 = north-centered start at 0°), and
    counted per (key, sector). Zero-length segments (identical
    consecutive points) have undefined heading and are dropped — by the
    exact predicate ``lat = lag(lat) AND lon = lag(lon)``, not by a
    distance epsilon, so both engines drop identical rows.

    Returns ``(key, sector, n_segments)``.
    """
    ns = int(n_sectors)
    width = 360.0 / ns
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    deg = _bearing_deg(plat, plon, F.col(lat_col), F.col(lon_col))
    sector = F.least(
        F.floor(F.round(deg, 6) / F.lit(width)).cast("long"), F.lit(ns - 1)
    )
    staged = pts.select(
        F.col(key_col),
        plat.alias("__plat"),
        plon.alias("__plon"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
        sector.alias("sector"),
    ).where(
        F.col("__plat").isNotNull()
        & ~((F.col("__plat") == F.col("__lat")) & (F.col("__plon") == F.col("__lon")))
    )
    return staged.groupBy(key_col, "sector").agg(
        F.count(F.lit(1)).alias("n_segments")
    )


def bearing_sectors_sql(
    pts_sql: str,
    key_expr: str,
    order_expr: str,
    id_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    n_sectors: int = 8,
) -> str:
    """DuckDB twin — identical azimuth formula, 1e-6 rounding, floor law."""
    ns = int(n_sectors)
    width = 360.0 / ns
    over = (
        f"OVER (PARTITION BY {key_expr} "
        f"ORDER BY {order_expr} ASC, {id_expr} ASC)"
    )
    p_lat, p_lon = f"lag({lat_expr}) {over}", f"lag({lon_expr}) {over}"
    return f"""WITH bs_src AS ({pts_sql}),
bs_lag AS (
  SELECT {key_expr} AS k,
         {p_lat} AS plat, {p_lon} AS plon,
         {lat_expr} AS lat, {lon_expr} AS lon
  FROM bs_src
),
bs_deg AS (
  SELECT k,
         degrees(atan2(
           sin(radians(lon - plon)) * cos(radians(lat)),
           cos(radians(plat)) * sin(radians(lat))
             - sin(radians(plat)) * cos(radians(lat)) * cos(radians(lon - plon))
         )) AS rawdeg
  FROM bs_lag
  WHERE plat IS NOT NULL AND NOT (plat = lat AND plon = lon)
)
SELECT k AS {key_expr},
       least(cast(floor(round(rawdeg - 360.0 * floor(rawdeg / 360.0), 6)
                        / {width}) AS BIGINT), {ns - 1}) AS sector,
       count(*) AS n_segments
FROM bs_deg GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# one-pass polyline simplification (Visvalingam threshold variant)
# ---------------------------------------------------------------------------


def simplify_track(
    pts: DataFrame,
    eps_area2: float,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Threshold Visvalingam simplification, one pass: keep a track's
    endpoints plus every interior vertex whose triangle with its stream
    neighbors has twice-area >= ``eps_area2`` (planar cross product in
    degree²). The single-pass variant (drop ALL sub-threshold vertices
    at once, no iterative re-evaluation) — the map-generalization
    pre-filter that removes GPS jitter before storage/rendering, chosen
    over iterative Visvalingam/Douglas-Peucker because it is expressible
    as ONE window pass (no per-key recursion) and therefore shuffles
    once at any scale.

    Planar degree² area is a documented approximation (fine for jitter
    removal at city scale; not for polar geodesy). The cross product is
    +,-,* on bit-identical doubles in a fixed textual order, so the
    threshold compare is exact cross-engine — no rounding grain needed.

    Returns the kept points ``(key, ms, lat, lon)``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    nlat, nlon = F.lead(lat_col).over(w), F.lead(lon_col).over(w)
    area2 = F.abs(
        (lat - plat) * (nlon - plon) - (nlat - plat) * (lon - plon)
    )
    keep = plat.isNull() | nlat.isNull() | (area2 >= F.lit(float(eps_area2)))
    return (
        pts.select(
            F.col(key_col),
            F.col(order_col).alias("ms"),
            F.col(id_col).alias("__id"),
            lat.alias("lat"),
            lon.alias("lon"),
            keep.alias("__keep"),
        )
        .where(F.col("__keep"))
        .select(key_col, "ms", "lat", "lon")
    )


def simplify_track_sql(
    pts_sql: str,
    eps_area2: float,
    key_expr: str,
    order_expr: str,
    id_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical cross-product text, closed >= threshold."""
    over = (
        f"OVER (PARTITION BY {key_expr} "
        f"ORDER BY {order_expr} ASC, {id_expr} ASC)"
    )
    return f"""WITH st_src AS ({pts_sql}),
st_win AS (
  SELECT {key_expr} AS k, {order_expr} AS ms,
         {lat_expr} AS lat, {lon_expr} AS lon,
         lag({lat_expr}) {over} AS plat, lag({lon_expr}) {over} AS plon,
         lead({lat_expr}) {over} AS nlat, lead({lon_expr}) {over} AS nlon
  FROM st_src
)
SELECT k AS {key_expr}, ms, lat, lon
FROM st_win
WHERE plat IS NULL OR nlat IS NULL
   OR abs((lat - plat) * (nlon - plon) - (nlat - plat) * (lon - plon))
      >= {float(eps_area2)!r}"""


# ---------------------------------------------------------------------------
# trajectory territory similarity (visited-cell Jaccard)
# ---------------------------------------------------------------------------


def traj_jaccard_pairs(
    pts: DataFrame,
    res: int,
    threshold: float,
    key_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_cell_df: int | None = None,
) -> DataFrame:
    """Territory-overlap join: pairs of movers whose VISITED-CELL sets
    have Jaccard similarity >= ``threshold`` — trajectory similarity at
    the raster level (commute twins, shared delivery zones, account
    sharing), the movement sibling of document n-gram Jaccard: the
    "tokens" are res-``res`` cells.

    Returns ``(k1, k2, n_inter, n_union, jaccard)`` with ``k1 < k2``;
    the Jaccard is ONE division of exact integers (bit-identical
    cross-engine), and the threshold compares identical doubles.

    Plan shape (100 TB lens): DISTINCT (key, cell) first (ping volume
    never reaches the join), candidate pairs meet ONLY inside one cell
    (self equi-join on the cell key — never all-pairs), then one pair
    hash agg + a size join. ``max_cell_df`` is the same skew guard as
    the document jaccard: cells visited by more than that many movers
    (airports, central stations) are excluded from candidate generation
    by an identical window-count predicate on both engines — a
    DOCUMENTED approximation (a pair connected only through mega-hub
    cells is missed; intersections lose capped cells), the standard
    hot-token cap for set-similarity joins.
    """
    from ..functions.cells import cell_expr

    vis = (
        pts.select(
            F.col(key_col).alias("__k"),
            cell_expr(lat_col, lon_col, res).alias("__cell"),
        )
        .distinct()
    )
    sizes = vis.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"))
    cand_src = vis
    if max_cell_df is not None:
        wdf = Window.partitionBy("__cell")
        cand_src = (
            vis.select("*", F.count(F.lit(1)).over(wdf).alias("__df"))
            .where(F.col("__df") <= F.lit(int(max_cell_df)))
            .drop("__df")
        )
    a, b = cand_src.alias("a"), cand_src.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__k") < F.col("b.__k")),
        )
        .groupBy(F.col("a.__k").alias("k1"), F.col("b.__k").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("__k").alias("k1"), F.col("__n").alias("__n1")), "k1")
        .join(sizes.select(F.col("__k").alias("k2"), F.col("__n").alias("__n2")), "k2")
        .select(
            "k1",
            "k2",
            "n_inter",
            (F.col("__n1") + F.col("__n2") - F.col("n_inter")).alias("n_union"),
            (
                F.col("n_inter").cast("double")
                / (F.col("__n1") + F.col("__n2") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= F.lit(float(threshold)))


def traj_jaccard_pairs_sql(
    pts_sql: str,
    res: int,
    threshold: float,
    key_expr: str,
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    max_cell_df: int | None = None,
) -> str:
    """DuckDB twin — identical distinct/cap/join/division law."""
    from ..functions.cells import cell_sql

    cell = cell_sql(lat_expr, lon_expr, res)
    cap = (
        f""",
tj_cand AS (
  SELECT k, cell FROM (
    SELECT k, cell, count(*) OVER (PARTITION BY cell) AS df FROM tj_vis
  ) WHERE df <= {int(max_cell_df)}
)"""
        if max_cell_df is not None
        else """,
tj_cand AS (SELECT * FROM tj_vis)"""
    )
    return f"""WITH tj_src AS ({pts_sql}),
tj_vis AS (
  SELECT DISTINCT {key_expr} AS k, {cell} AS cell FROM tj_src
),
tj_sizes AS (SELECT k, count(*) AS n FROM tj_vis GROUP BY k){cap},
tj_inter AS (
  SELECT a.k AS k1, b.k AS k2, count(*) AS n_inter
  FROM tj_cand a JOIN tj_cand b ON a.cell = b.cell AND a.k < b.k
  GROUP BY a.k, b.k
)
SELECT i.k1, i.k2, i.n_inter,
       s1.n + s2.n - i.n_inter AS n_union,
       CAST(i.n_inter AS DOUBLE)
         / CAST(s1.n + s2.n - i.n_inter AS DOUBLE) AS jaccard
FROM tj_inter i
JOIN tj_sizes s1 ON s1.k = i.k1 JOIN tj_sizes s2 ON s2.k = i.k2
WHERE CAST(i.n_inter AS DOUBLE)
      / CAST(s1.n + s2.n - i.n_inter AS DOUBLE) >= {float(threshold)!r}"""


# ---------------------------------------------------------------------------
# fixed-epoch linear resampling
# ---------------------------------------------------------------------------


def resample_track(
    points: DataFrame,
    key_col: str = "key",
    ts_col: str = "ms",
    lat_col: str = "lat",
    lon_col: str = "lon",
    step_ms: int = 60_000,
) -> DataFrame:
    """Resample each mover's track onto a fixed epoch grid by linear
    interpolation between consecutive fixes — the normalization step
    before any cross-track analytics (co-location at a common clock,
    OD flows per uniform tick, model features at fixed cadence), since
    raw pings arrive at irregular rates per device.

    For every consecutive fix pair (t1 → t2) the op emits each grid
    epoch ``g`` (multiple of ``step_ms``) with ``t1 <= g < t2``:
    ``frac = (g - t1) / (t2 - t1)``, position = fix1 + (fix2 - fix1)
    · frac. Consecutive half-open intervals partition the track's time
    span, so every grid epoch inside [first_fix, last_fix) is emitted
    EXACTLY once per key. Duplicate-timestamp fixes must be collapsed
    upstream (t2 > t1 is required and enforced by the half-open grid).

    Shape: ONE per-key window (the sessionize budget — lead() for the
    next fix) + a bounded explode (``(t2-t1)/step`` rows per segment; a
    multi-day gap at a 1-min step is the fan-out axis, so pick the step
    against the upstream gap-split policy). All grid/frac arithmetic is
    pure integer-epoch + one IEEE division — twinnable exactly.

    Returns ``(key, grid_ms, lat, lon)``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    t1, t2 = F.col(ts_col).cast("long"), F.lead(ts_col).over(w).cast("long")
    nlat, nlon = F.lead(lat_col).over(w), F.lead(lon_col).over(w)
    step = F.lit(int(step_ms))
    gs = F.floor((t1 + step - F.lit(1)).cast("double") / step).cast("long")
    ge = F.floor((t2 - F.lit(1)).cast("double") / step).cast("long")
    seg = points.select(
        F.col(key_col).alias("key"),
        t1.alias("__t1"),
        t2.alias("__t2"),
        F.col(lat_col).alias("__lat1"),
        F.col(lon_col).alias("__lon1"),
        nlat.alias("__lat2"),
        nlon.alias("__lon2"),
        gs.alias("__gs"),
        ge.alias("__ge"),
    ).where(F.col("__t2").isNotNull() & (F.col("__ge") >= F.col("__gs")))
    g = (F.col("__i") * step).alias("grid_ms")
    frac = (F.col("__i") * step - F.col("__t1")).cast("double") / (
        F.col("__t2") - F.col("__t1")
    ).cast("double")
    return seg.select(
        "key",
        F.explode(F.sequence(F.col("__gs"), F.col("__ge"))).alias("__i"),
        "__t1",
        "__t2",
        "__lat1",
        "__lon1",
        "__lat2",
        "__lon2",
    ).select(
        "key",
        g,
        (F.col("__lat1") + (F.col("__lat2") - F.col("__lat1")) * frac).alias(
            "lat"
        ),
        (F.col("__lon1") + (F.col("__lon2") - F.col("__lon1")) * frac).alias(
            "lon"
        ),
    )


def resample_track_sql(
    points_sql: str, step_ms: int = 60_000
) -> str:
    """DuckDB twin of :func:`resample_track` — same lead() pairing, same
    half-open grid, same IEEE interpolation expression. ``points_sql``
    must yield ``(key, ms, lat, lon)``."""
    s = int(step_ms)
    return f"""WITH rs_pts AS MATERIALIZED ({points_sql}),
rs_seg AS (
  SELECT key, ms AS t1,
         lead(ms)  OVER w AS t2,
         lat AS lat1, lon AS lon1,
         lead(lat) OVER w AS lat2,
         lead(lon) OVER w AS lon2
  FROM rs_pts
  WINDOW w AS (PARTITION BY key ORDER BY ms ASC)
),
rs_grid AS (
  SELECT key, t1, t2, lat1, lon1, lat2, lon2,
         CAST(floor(CAST(t1 + {s} - 1 AS DOUBLE) / {s}) AS BIGINT) AS gs,
         CAST(floor(CAST(t2 - 1 AS DOUBLE) / {s}) AS BIGINT) AS ge
  FROM rs_seg WHERE t2 IS NOT NULL
)
SELECT key, i * {s} AS grid_ms,
       lat1 + (lat2 - lat1) * (CAST(i * {s} - t1 AS DOUBLE)
                               / CAST(t2 - t1 AS DOUBLE)) AS lat,
       lon1 + (lon2 - lon1) * (CAST(i * {s} - t1 AS DOUBLE)
                               / CAST(t2 - t1 AS DOUBLE)) AS lon
FROM rs_grid, LATERAL (SELECT unnest(range(gs, ge + 1)) AS i) g
WHERE ge >= gs"""


# ---------------------------------------------------------------------------
# Discrete Hausdorff distance between track pairs
# ---------------------------------------------------------------------------


def hausdorff_pairs(
    pts: DataFrame,
    pairs: DataFrame,
    key_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_points: int | None = None,
) -> DataFrame:
    """Discrete (point-set) Hausdorff distance for CANDIDATE track pairs
    → ``(k1, k2, h_ab_mm, h_ba_mm, hausdorff_mm)``.

    The track-similarity metric that :func:`traj_jaccard_pairs` (cell
    overlap) approximates: how far, at worst, does one mover's track
    stray from the other's — directed h(A→B) = max_{a} min_{b} d(a,b),
    symmetric Hausdorff = max of both directions. Used for map-matching
    QA (GPS trace vs snapped route), mirror-route detection, and
    convoy/stalking analytics on the co-location candidate pairs this
    engine already emits.

    Deliberately takes a ``pairs`` table instead of pairing internally:
    at fleet scale all-pairs is quadratic, so candidates come from the
    cheap pruners (shared-cell co-location, bbox overlap, traj-jaccard
    top matches) and THIS op only pays |A|·|B| point products per
    SURVIVING pair. Distinct (lat, lon) per key first — duplicate pings
    cannot change a min/max — and an optional loud ``max_points`` guard
    fails the job if a track exceeds the per-pair product budget.

    Exact law: per-point distances round to integer millimeters (the
    :func:`~gosmonaut_spark.functions.geo.trajectory_length` grain), so
    every min/max is an order-free integer aggregate — bit-exact
    cross-engine, no float comparisons anywhere.

    Scale shape: two equi-joins fan the pair list out to point products
    partitioned by pair key; two hash aggs (inner min per source point,
    outer max per pair) with map-side partial combine; no window over
    the product, no driver state.
    """
    p = (
        pts.select(
            F.col(key_col).alias("k"),
            F.col(lat_col).alias("plat"),
            F.col(lon_col).alias("plon"),
        )
        .distinct()
    )
    if max_points is not None:
        cnt = p.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        guard = F.assert_true(
            F.col("c") <= F.lit(int(max_points)),
            F.concat(
                F.lit("hausdorff_pairs: track exceeds max_points="),
                F.lit(str(int(max_points))),
            ),
        ).isNull()
        ok = cnt.where(guard | (F.rand() < F.lit(-1.0))).select("k")
        p = p.join(ok, "k", "left_semi")
    pr = pairs.select(F.col("k1"), F.col("k2"))
    prod = (
        pr.join(
            p.select(
                F.col("k").alias("k1"),
                F.col("plat").alias("alat"),
                F.col("plon").alias("alon"),
            ),
            "k1",
        )
        .join(
            p.select(
                F.col("k").alias("k2"),
                F.col("plat").alias("blat"),
                F.col("plon").alias("blon"),
            ),
            "k2",
        )
        .select(
            "k1",
            "k2",
            "alat",
            "alon",
            "blat",
            "blon",
            F.round(
                haversine_m(
                    F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
                )
                * F.lit(1000.0)
            )
            .cast("long")
            .alias("d_mm"),
        )
        .localCheckpoint()
    )
    h_ab = (
        prod.groupBy("k1", "k2", "alat", "alon")
        .agg(F.min("d_mm").alias("dmin"))
        .groupBy("k1", "k2")
        .agg(F.max("dmin").alias("h_ab_mm"))
    )
    h_ba = (
        prod.groupBy("k1", "k2", "blat", "blon")
        .agg(F.min("d_mm").alias("dmin"))
        .groupBy("k1", "k2")
        .agg(F.max("dmin").alias("h_ba_mm"))
    )
    return (
        h_ab.join(h_ba, ["k1", "k2"])
        .select(
            "k1",
            "k2",
            "h_ab_mm",
            "h_ba_mm",
            F.greatest("h_ab_mm", "h_ba_mm").alias("hausdorff_mm"),
        )
    )


def hausdorff_pairs_sql(
    pts_sql: str,
    pairs_sql: str,
    key_expr: str = "user_id",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical distinct / product / mm-integer
    min-max law. ``pairs_sql`` must yield ``(k1, k2)``."""
    hav = haversine_sql("alat", "alon", "blat", "blon")
    return f"""WITH hd_p AS (
  SELECT DISTINCT {key_expr} AS k, {lat_expr} AS plat, {lon_expr} AS plon
  FROM ({pts_sql})
),
hd_pairs AS ({pairs_sql}),
hd_prod AS (
  SELECT pr.k1, pr.k2, a.plat AS alat, a.plon AS alon,
         b.plat AS blat, b.plon AS blon,
         CAST(round(({hav}) * 1000.0) AS BIGINT) AS d_mm
  FROM hd_pairs pr
  JOIN hd_p a ON a.k = pr.k1
  JOIN hd_p b ON b.k = pr.k2
),
hd_ab AS (
  SELECT k1, k2, max(dmin) AS h_ab_mm FROM (
    SELECT k1, k2, alat, alon, min(d_mm) AS dmin
    FROM hd_prod GROUP BY k1, k2, alat, alon
  ) GROUP BY k1, k2
),
hd_ba AS (
  SELECT k1, k2, max(dmin) AS h_ba_mm FROM (
    SELECT k1, k2, blat, blon, min(d_mm) AS dmin
    FROM hd_prod GROUP BY k1, k2, blat, blon
  ) GROUP BY k1, k2
)
SELECT a.k1 AS k1, a.k2 AS k2, a.h_ab_mm, b.h_ba_mm,
       greatest(a.h_ab_mm, b.h_ba_mm) AS hausdorff_mm
FROM hd_ab a JOIN hd_ba b ON a.k1 = b.k1 AND a.k2 = b.k2"""


# ---------------------------------------------------------------------------
# segment speed histogram (exact integer band thresholds)
# ---------------------------------------------------------------------------

SPEED_BANDS_M_S = (1, 5, 20, 50)


def speed_histogram(
    pts: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ms",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    bands_m_s: tuple = SPEED_BANDS_M_S,
) -> DataFrame:
    """Per-key histogram of segment speeds → ``(key, band, n_segments,
    total_mm)`` with ``band`` = number of thresholds at or below the
    segment's speed (0 = slowest bin).

    The GPS-hygiene audit before any trajectory op: walking/driving/
    flying mixes, and the teleporting-fix segments (band = len(bands))
    that poison track lengths and map-matching. Segment speed is
    dist/gap; the BAND DECISION never divides — speed ≥ t m/s ⇔
    dist_mm ≥ t·gap_ms exactly (mm/ms = m/s, integers both sides,
    HUGEINT/DECIMAL products) — so a boundary segment cannot flip bins
    on a float ulp. Zero-gap segments (simultaneous pings) are dropped
    by exact predicate (undefined speed), matching both engines.

    Scale: the sessionize lag-window budget + one hash agg.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    dist_mm = F.round(
        haversine_m(
            F.lag(lat_col).over(w),
            F.lag(lon_col).over(w),
            F.col(lat_col),
            F.col(lon_col),
        )
        * F.lit(1000.0)
    ).cast("long")
    gap = (F.col(order_col) - F.lag(order_col).over(w)).cast("long")
    dec = lambda c: c.cast("decimal(19,0)")
    band = None
    for t in bands_m_s:
        test = (dec(F.col("__d")) >= F.lit(int(t)) * dec(F.col("__g"))).cast(
            "long"
        )
        band = test if band is None else band + test
    staged = (
        pts.select(
            F.col(key_col),
            dist_mm.alias("__d"),
            gap.alias("__g"),
        )
        .where(F.col("__g").isNotNull() & (F.col("__g") > 0))
        .select(F.col(key_col), F.col("__d"), band.alias("band"))
    )
    return (
        staged.groupBy(key_col, "band")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("__d").alias("total_mm"),
        )
        .orderBy(key_col, "band")
    )


def speed_histogram_sql(
    pts_sql: str,
    key_expr: str = "user_id",
    order_expr: str = "ms",
    id_expr: str = "event_id",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    bands_m_s: tuple = SPEED_BANDS_M_S,
) -> str:
    """DuckDB twin — identical mm/ms integer threshold products."""
    over = (
        f"OVER (PARTITION BY {key_expr} "
        f"ORDER BY {order_expr} ASC, {id_expr} ASC)"
    )
    hav = haversine_sql(
        f"lag({lat_expr}) {over}",
        f"lag({lon_expr}) {over}",
        lat_expr,
        lon_expr,
    )
    band = " + ".join(
        f"CAST(CAST(d AS HUGEINT) >= {int(t)} * CAST(g AS HUGEINT) AS BIGINT)"
        for t in bands_m_s
    )
    return f"""WITH sp_src AS ({pts_sql}),
sp_seg AS (
  SELECT {key_expr} AS k,
         CAST(round(({hav}) * 1000.0) AS BIGINT) AS d,
         ({order_expr}) - lag({order_expr}) {over} AS g
  FROM sp_src
),
sp_band AS (
  SELECT k, d, ({band}) AS band
  FROM sp_seg WHERE g IS NOT NULL AND g > 0
)
SELECT k AS {key_expr}, band, count(*) AS n_segments,
       CAST(sum(d) AS BIGINT) AS total_mm
FROM sp_band GROUP BY k, band
ORDER BY {key_expr}, band"""


# ---------------------------------------------------------------------------
# convex hull of each key's point set (exact integer geometry)
# ---------------------------------------------------------------------------


def convex_hull_stats(
    pts: DataFrame,
    key_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    scale: int = 10_000,
) -> DataFrame:
    """Convex-hull summary per key → ``(key, n_points, n_hull,
    hull_area_sq_microdeg)``.

    The territory-shape primitive (roaming extent, geofence drafting,
    GPS-outlier blast radius). EXACT integer geometry: coordinates are
    scaled by ``scale`` (1e4 = the fixture grid) to integers, so every
    orientation test is an integer cross product — no epsilon, no float
    tie ambiguity, and the DuckDB twin can verify with a COMPLETELY
    DIFFERENT algorithm:

    * engine: Andrew's monotone chain per key inside Arrow
      ``applyInPandas`` (O(n log n), the irreducibly-sequential-per-key
      pattern of this repo's EWMA/CUSUM family), STRICT turns — hull
      vertices are the extreme points only (collinear mid-points drop);
    * oracle: brute extreme-point elimination — a point is NOT a hull
      vertex iff it lies inside (boundary inclusive) a triangle of
      three other points, tested with three same-sign-or-zero integer
      cross products plus the bbox guard that makes degenerate
      (collinear) triangles mean exact segment containment.

    Agreement of the two formulations on every key is the correctness
    statement. ``hull_area2`` is the twice-shoelace INTEGER over the
    chain cycle; the oracle rebuilds the same cycle without running the
    chain — lower chain (points on or below the L–R line, x asc) then
    upper chain (above, x desc), legal because a strict-extreme hull
    has no collinear vertex triple, so only L and R sit ON the line.

    Scale shape: one shuffle on the key; per-key work bounded by the
    key's DISTINCT point count (dedup first — duplicates cannot change
    a hull).
    """
    import pandas as _pd

    sc = int(scale)

    def fn(pdf: _pd.DataFrame) -> _pd.DataFrame:
        key = pdf[key_col].iloc[0]
        pts_i = sorted(
            {
                (
                    int(round(x * sc)),
                    int(round(y * sc)),
                )
                for x, y in zip(pdf[lon_col], pdf[lat_col])
            }
        )
        n = len(pts_i)

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
                b[0] - o[0]
            )

        if n <= 2:
            hull = pts_i
        else:
            lower: list = []
            for p in pts_i:
                while (
                    len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0
                ):
                    lower.pop()
                lower.append(p)
            upper: list = []
            for p in reversed(pts_i):
                while (
                    len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0
                ):
                    upper.pop()
                upper.append(p)
            hull = lower[:-1] + upper[:-1]
        area2 = 0
        if len(hull) >= 3:
            for i in range(len(hull)):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % len(hull)]
                area2 += x1 * y2 - x2 * y1
        return _pd.DataFrame(
            {
                "key": [str(key)],
                "n_points": [n],
                "n_hull": [len(hull)],
                # twice the shoelace area, in integer square micro-deg —
                # exact, so the oracle compares integers, not floats
                "hull_area2": [abs(area2)],
            }
        )

    return (
        pts.select(F.col(key_col), F.col(lat_col), F.col(lon_col))
        .groupBy(key_col)
        .applyInPandas(
            fn,
            schema=(
                "key string, n_points long, n_hull long, hull_area2 long"
            ),
        )
    )
