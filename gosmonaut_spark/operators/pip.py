"""Point-in-polygon spatial join (B7) — cell-pruned, UDF-free.

The join is *encoded in the data*: polygons are expanded to the grid cells
their bbox covers (native ``sequence``/``transform`` — no UDF), points carry
their cell, and the planner sees a plain equi-join on ``cell`` — broadcast
when the polygon side is small, shuffled hash/SMJ otherwise, AQE free to
re-plan. The exact test is a ray-cast folded with ``aggregate`` over the
vertex arrays — still a native Catalyst expression, whole-stage codegen'd.

This generalizes the reference's broadcast build-side pattern
(/root/reference/binary_entity_map.go:17-90: hash-bucketed sorted array
probed per entity) to 2-D: the cell index plays the bucket hash, the
ray-cast the exact probe.

Caveats (documented contract): polygons are rings in lon/lat plane
(planar test, fine for building/city-block scale), no antimeridian-crossing
bboxes, holes = separate inner rings handled by even-odd at caller level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_expr, cell_from_xy, cell_x, cell_y


def polygons_from_ways(assembled_ways: DataFrame) -> DataFrame:
    """Closed assembled ways -> polygon table
    ``(polygon_id, tags, lats array<double>, lons array<double>)``.
    A way is a ring when first ref == last ref and it has >= 4 points
    (OSM area convention)."""
    w = assembled_ways.filter(
        (F.size("nodes") >= 4)
        & (F.element_at("nodes", 1)["id"] == F.element_at("nodes", -1)["id"])
    )
    return w.select(
        F.col("id").alias("polygon_id"),
        "tags",
        F.transform("nodes", lambda n: n["lat"]).alias("lats"),
        F.transform("nodes", lambda n: n["lon"]).alias("lons"),
    )


def polygon_cover_cells(polygons: DataFrame, res: int) -> DataFrame:
    """Explode each polygon to the cells covered by its bbox at ``res`` —
    pure native expressions (sequence over the x/y cell ranges)."""
    p = polygons.withColumn("min_lat", F.array_min("lats")).withColumn(
        "max_lat", F.array_max("lats")
    ).withColumn("min_lon", F.array_min("lons")).withColumn(
        "max_lon", F.array_max("lons")
    )
    x0, x1 = cell_x("min_lon", res), cell_x("max_lon", res)
    # y grows downward (north -> south), so max_lat gives y0
    y0, y1 = cell_y("max_lat", res), cell_y("min_lat", res)
    cells = F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda x: F.transform(
                F.sequence(y0, y1), lambda y: cell_from_xy(x, y, res)
            ),
        )
    )
    return p.select(
        "polygon_id", "lats", "lons", F.explode(cells).alias("cell")
    )


def ray_cast_inside(
    plat: Column, plon: Column, lats: Column, lons: Column
) -> Column:
    """Even-odd ray cast (PNPOLY) folded over the closed ring — native
    ``aggregate`` over edge indices, no Python anywhere."""
    n_edges = F.size(lats) - F.lit(2)  # ring is closed: last == first
    crossings = F.aggregate(
        F.sequence(F.lit(0), n_edges),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (F.element_at(lats, i + 1) > plat)
                != (F.element_at(lats, i + 2) > plat)
            )
            & (
                plon
                < (F.element_at(lons, i + 2) - F.element_at(lons, i + 1))
                * (plat - F.element_at(lats, i + 1))
                / (F.element_at(lats, i + 2) - F.element_at(lats, i + 1))
                + F.element_at(lons, i + 1)
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.pmod(crossings, F.lit(2)) == F.lit(1)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 11,
    lat: str = "lat",
    lon: str = "lon",
    broadcast_polygons: bool | None = None,
) -> DataFrame:
    """Spatial join: every (point, polygon) pair where the point lies inside.

    ``res`` is the pruning resolution — candidates share a bbox-cover cell.
    Returns point columns + ``polygon_id``. Set ``broadcast_polygons`` to
    force/forbid broadcasting the cover table; default lets AQE decide.
    """
    cover = polygon_cover_cells(polygons, res)
    if broadcast_polygons is True:
        cover = F.broadcast(cover)
    pts = points.withColumn("cell", cell_expr(lat, lon, res))
    cand = pts.join(cover, "cell", "inner")
    hit = cand.filter(
        ray_cast_inside(F.col(lat), F.col(lon), F.col("lats"), F.col("lons"))
    )
    return hit.drop("lats", "lons", "cell")
