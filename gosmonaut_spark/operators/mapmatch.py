"""Map matching (nearest-segment snap) — point x polyline-segment join.

The missing third member of the engine's spatial-join family: PIP pairs
points with AREAS (:mod:`.pip`), radius/kNN pair points with POINTS
(:mod:`.knn`); GPS pipelines also snap points to LINE SEGMENTS (road
network edges) — the geometric core of map matching, the step before
any route reconstruction or road-level rollup.

Semantics: for each point, the nearest segment within a closed snap
radius (planar degree metric — the jitter-scale regime where map
matching operates; the same documented approximation as
``simplify_track``), with the projection parameter ``t`` in [0, 1]
(clamped to the segment) and the squared snap distance. Points with no
segment in range are dropped (unmatched GPS noise). Ties on distance
break by segment id — total order, both engines.

Scale shape (100 TB lens): index-then-refine, the bbox-cover law of
:mod:`.overlap` — each segment explodes to the grid cells of its
radius-EXPANDED bbox (any point within ``radius`` of the segment is
inside that bbox, so candidate generation is exact-complete), points
hash to their own cell, candidates meet in an equi-join on the cell
key — never a cross join. Fan-out per segment is O((len + 2r)²/g²);
callers size ``grid_deg`` to the typical segment so it stays O(1). Hot
cells (dense urban grids) fan within the cell only; AQE skew-join
splits stragglers. The refine math (dot product, clamp, squared
distance) is pure +,-,*,/ on bit-identical doubles in one fixed textual
order, so the DuckDB twin — a brute cross join with the SAME law —
matches exactly (semantics, not plan).

Reference parity: none — the reference has no spatial joins; this
extends the graft's B7/B8 family to the line-segment case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "snap_to_segments",
    "snap_to_segments_sql",
    "reverse_geocode",
    "reverse_geocode_sql",
]


def snap_to_segments(
    pts: DataFrame,
    segs: DataFrame,
    radius: float,
    grid_deg: float,
    pt_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    seg_id: str = "seg_id",
    ax_col: str = "ax",
    ay_col: str = "ay",
    bx_col: str = "bx",
    by_col: str = "by",
) -> DataFrame:
    """Snap each point to its nearest segment within ``radius``
    (planar degrees, closed). Segments are ``(seg_id, ax, ay, bx, by)``
    with x = lon, y = lat. Returns ``(id, seg_id, t, dist2)``.

    Degenerate zero-length segments are handled as points (``t`` = 0).
    """
    r, g = float(radius), float(grid_deg)

    cover = segs.select(
        F.col(seg_id).alias("__sid"),
        F.col(ax_col).alias("__ax"),
        F.col(ay_col).alias("__ay"),
        F.col(bx_col).alias("__bx"),
        F.col(by_col).alias("__by"),
        F.explode(
            F.sequence(
                F.floor((F.least(ax_col, bx_col) - F.lit(r)) / F.lit(g)),
                F.floor((F.greatest(ax_col, bx_col) + F.lit(r)) / F.lit(g)),
            )
        ).alias("__cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.least("__ay", "__by") - F.lit(r)) / F.lit(g)),
                F.floor((F.greatest("__ay", "__by") + F.lit(r)) / F.lit(g)),
            )
        ).alias("__cy"),
    )
    p = pts.select(
        F.col(pt_id).alias("__pid"),
        F.col(lon_col).alias("__px"),
        F.col(lat_col).alias("__py"),
        F.floor(F.col(lon_col) / F.lit(g)).alias("__cx"),
        F.floor(F.col(lat_col) / F.lit(g)).alias("__cy"),
    )
    cand = p.join(cover, ["__cx", "__cy"]).drop("__cx", "__cy").distinct()

    dx = F.col("__bx") - F.col("__ax")
    dy = F.col("__by") - F.col("__ay")
    len2 = dx * dx + dy * dy
    t_raw = (
        (F.col("__px") - F.col("__ax")) * dx + (F.col("__py") - F.col("__ay")) * dy
    ) / len2
    t = F.when(len2 == F.lit(0.0), F.lit(0.0)).otherwise(
        F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    )
    scored = cand.select(
        "__pid",
        "__sid",
        t.alias("t"),
        (
            (F.col("__px") - (F.col("__ax") + t * dx))
            * (F.col("__px") - (F.col("__ax") + t * dx))
            + (F.col("__py") - (F.col("__ay") + t * dy))
            * (F.col("__py") - (F.col("__ay") + t * dy))
        ).alias("dist2"),
    ).where(F.col("dist2") <= F.lit(r * r))
    w = Window.partitionBy("__pid").orderBy(
        F.col("dist2").asc(), F.col("__sid").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__pid").alias(pt_id),
            F.col("__sid").alias(seg_id),
            "t",
            "dist2",
        )
    )


def snap_to_segments_sql(
    pts_sql: str,
    segs_sql: str,
    radius: float,
    pt_id: str = "id",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    seg_id: str = "seg_id",
) -> str:
    """DuckDB twin — brute cross join with the IDENTICAL projection /
    clamp / distance text and the same closed radius + argmin law
    (semantics, not plan; ``segs_sql`` must yield seg_id, ax, ay, bx,
    by). The grid index is a plan choice, so the oracle omits it."""
    r = float(radius)
    t_raw = "((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / len2"
    return f"""WITH mm_pts AS (
  SELECT {pt_id} AS pid, {lon_expr} AS px, {lat_expr} AS py
  FROM ({pts_sql})
),
mm_segs AS ({segs_sql}),
mm_cand AS (
  SELECT pid, {seg_id} AS sid, px, py, ax, ay, bx, by,
         (bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS len2
  FROM mm_pts CROSS JOIN mm_segs
),
mm_t AS (
  SELECT pid, sid, px, py, ax, ay, bx, by,
         CASE WHEN len2 = 0.0 THEN 0.0
              ELSE least(greatest({t_raw}, 0.0), 1.0) END AS t
  FROM mm_cand
),
mm_scored AS (
  SELECT pid, sid, t,
         (px - (ax + t * (bx - ax))) * (px - (ax + t * (bx - ax)))
         + (py - (ay + t * (by - ay))) * (py - (ay + t * (by - ay))) AS dist2
  FROM mm_t
),
mm_ranked AS (
  SELECT pid, sid, t, dist2,
         row_number() OVER (PARTITION BY pid
                            ORDER BY dist2 ASC, sid ASC) AS rn
  FROM mm_scored WHERE dist2 <= {r * r!r}
)
SELECT pid AS {pt_id}, sid AS {seg_id}, t, dist2
FROM mm_ranked WHERE rn = 1"""


def reverse_geocode(
    pts: DataFrame,
    regions: DataFrame,
    pt_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    region_id: str = "region_id",
    s_col: str = "s",
    n_col: str = "n",
    w_col: str = "west",
    e_col: str = "east",
) -> DataFrame:
    """Reverse geocoding against a small region table: assign every
    point its nearest rectangular region (containment = distance 0) —
    the admin-area / service-zone tagging step. Planar point-to-box
    distance with the same clamp law as :func:`snap_to_segments`:

        d² = max(0, w−x, x−e)² + max(0, s−y, y−n)²

    pure comparisons and multiplies on bit-identical doubles, so the
    assignment (argmin with region-id tie-break) is exact cross-engine.

    Plan: region tables are small by nature (admin areas, depots) — a
    BROADCAST join of every point against all regions plus one
    map-side-combinable min(struct) argmin is the right 100 TB shape
    (constant |regions| work per point, zero shuffle of the point set
    beyond the argmin's partial aggregation). For region tables too big
    to broadcast, use the cell-cover candidates of
    :func:`snap_to_segments` instead — same refine law.

    Returns ``(id, region_id, dist2)`` — ``dist2`` 0.0 inside.
    """
    p = pts.select(
        F.col(pt_id).alias("__pid"),
        F.col(lon_col).alias("__px"),
        F.col(lat_col).alias("__py"),
    )
    r = regions.select(
        F.col(region_id).alias("__rid"),
        F.col(s_col).alias("__s"),
        F.col(n_col).alias("__n"),
        F.col(w_col).alias("__w"),
        F.col(e_col).alias("__e"),
    )
    dx = F.greatest(
        F.lit(0.0), F.col("__w") - F.col("__px"), F.col("__px") - F.col("__e")
    )
    dy = F.greatest(
        F.lit(0.0), F.col("__s") - F.col("__py"), F.col("__py") - F.col("__n")
    )
    scored = p.join(F.broadcast(r)).select(
        "__pid",
        F.struct((dx * dx + dy * dy).alias("d2"), F.col("__rid")).alias("__c"),
    )
    best = scored.groupBy("__pid").agg(F.min("__c").alias("__b"))
    return best.select(
        F.col("__pid").alias(pt_id),
        F.col("__b.__rid").alias(region_id),
        F.col("__b.d2").alias("dist2"),
    )


def reverse_geocode_sql(
    pts_sql: str,
    regions_sql: str,
    pt_id: str = "id",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    region_id: str = "region_id",
) -> str:
    """DuckDB twin — identical clamp/argmin law (row_number argmin:
    semantics, not plan). ``regions_sql`` must yield
    (region_id, s, n, west, east)."""
    return f"""WITH rg_p AS (
  SELECT {pt_id} AS pid, {lon_expr} AS px, {lat_expr} AS py FROM ({pts_sql})
),
rg_r AS ({regions_sql}),
rg_d AS (
  SELECT pid, {region_id} AS rid,
         greatest(0.0, west - px, px - east) * greatest(0.0, west - px, px - east)
         + greatest(0.0, s - py, py - n) * greatest(0.0, s - py, py - n) AS d2
  FROM rg_p CROSS JOIN rg_r
),
rg_rank AS (
  SELECT pid, rid, d2,
         row_number() OVER (PARTITION BY pid ORDER BY d2 ASC, rid ASC) AS rn
  FROM rg_d
)
SELECT pid AS {pt_id}, rid AS {region_id}, d2 AS dist2
FROM rg_rank WHERE rn = 1"""
