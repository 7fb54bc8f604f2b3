"""Segment-segment intersection join — the line/line spatial predicate.

The engine's spatial-join family covers point-in-polygon (``pip``),
point-to-point proximity (``knn``/``radius_join``) and point-to-segment
snapping (``mapmatch``); crossing detection between two SEGMENT sets is
the remaining pairwise predicate a road/trajectory workload asks for
(where do trajectories cross the road network? which road edges cross a
cable/pipeline/boundary?).

Shape (100 TB lens): index-then-refine, same contract as the other
spatial joins —

1. *candidates*: each segment explodes to the grid cells of its bbox
   cover at ``res`` (`functions.cells` integer law; the per-segment
   fan-out is ``(Δx+1)·(Δy+1)`` and guarded by ``max_cells`` with a loud
   in-stage assert, the radius-join contract). Candidate generation is a
   plain equi-join on the integer cell id — broadcast/SMJ per AQE, skew
   split per AQE; never a cross join.
2. *dedup*: a pair sharing k cells appears k times — one ``distinct``
   on the pair key before the exact test, so the refine cost is per
   PAIR, not per (pair × shared cell).
3. *refine*: exact strict-crossing test via the four orientation signs
   (``d1·d2 < 0 AND d3·d4 < 0``) — pure codegen double arithmetic,
   bit-identical on any IEEE engine evaluating the same expression tree,
   so the DuckDB twin matches exactly. Touching/collinear pairs are NOT
   crossings (strict test — deterministic on quantized fixture coords).

Completeness: a crossing point lies inside both segments' bboxes, so the
cell containing it is in both bbox covers — every crossing pair shares
at least one candidate cell at any resolution.

Reference parity: none — the reference (inimbir/gosmonaut) assembles
geometry but runs no spatial predicates; this extends the graft's B7-B9
join family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_from_xy, cell_x, cell_y

__all__ = ["segment_intersection_join", "segment_intersection_sql"]


def _cover_cells(
    segs: DataFrame, res: int, max_cells: int, side: str
) -> DataFrame:
    """Explode each segment to its bbox cell cover at ``res``.

    Fan-out is bounded by ``max_cells`` with an in-stage assert (the
    same loud-guard contract as radius_join's adaptive fanout): a
    continent-spanning segment at a fine res would otherwise silently
    explode to millions of rows.
    """
    x1 = F.least(cell_x(f"{side}_lon1", res), cell_x(f"{side}_lon2", res))
    x2 = F.greatest(cell_x(f"{side}_lon1", res), cell_x(f"{side}_lon2", res))
    y1 = F.least(cell_y(f"{side}_lat1", res), cell_y(f"{side}_lat2", res))
    y2 = F.greatest(cell_y(f"{side}_lat1", res), cell_y(f"{side}_lat2", res))
    n_cells = (x2 - x1 + 1) * (y2 - y1 + 1)
    guard = F.assert_true(
        n_cells <= F.lit(int(max_cells)),
        F.concat(
            F.lit(f"segment bbox cover exceeds max_cells={max_cells} at res="),
            F.lit(str(res)),
            F.lit(" for segment id "),
            F.col(f"{side}_id").cast("string"),
            F.lit(" — lower res or raise max_cells"),
        ),
    ).isNull()
    return (
        segs.where(guard | (F.rand() < F.lit(-1.0)))
        .select(
            "*",
            F.explode(F.sequence(x1, x2)).alias("__cx"),
            y1.alias("__y1"),
            y2.alias("__y2"),
        )
        .select(
            "*", F.explode(F.sequence(F.col("__y1"), F.col("__y2"))).alias("__cy")
        )
        .select(
            segs.columns
            + [cell_from_xy(F.col("__cx"), F.col("__cy"), res).alias("__cell")]
        )
    )


def _cross(
    ox: Column, oy: Column, ax_: Column, ay: Column, bx: Column, by: Column
) -> Column:
    """Orientation cross product (a-o) × (b-o) — one codegen expression,
    identical shape on both engines."""
    return (ax_ - ox) * (by - oy) - (ay - oy) * (bx - ox)


def segment_intersection_join(
    segs_a: DataFrame,
    segs_b: DataFrame,
    res: int = 7,
    max_cells: int = 4096,
) -> DataFrame:
    """All strictly-crossing pairs between two segment tables.

    Inputs must carry ``(id, lat1, lon1, lat2, lon2)``. Returns
    ``(a_id, b_id)`` for every pair whose open segments properly cross
    (shared endpoints / touching / collinear overlap excluded — the
    strict orientation test ``d1·d2 < 0 AND d3·d4 < 0``). Planar
    arithmetic on (lon, lat) — the fixture/trajectory regime; segments
    spanning the antimeridian belong to a coarser res cover upstream.
    """
    a = segs_a.select(
        F.col("id").alias("a_id"),
        F.col("lat1").alias("a_lat1"),
        F.col("lon1").alias("a_lon1"),
        F.col("lat2").alias("a_lat2"),
        F.col("lon2").alias("a_lon2"),
    )
    b = segs_b.select(
        F.col("id").alias("b_id"),
        F.col("lat1").alias("b_lat1"),
        F.col("lon1").alias("b_lon1"),
        F.col("lat2").alias("b_lat2"),
        F.col("lon2").alias("b_lon2"),
    )
    ca = _cover_cells(a, res, max_cells, "a")
    cb = _cover_cells(b, res, max_cells, "b")
    # equi-join on the cell, then ONE row per candidate pair (a pair
    # sharing k cover cells must be tested once, not k times)
    cand = ca.join(cb, "__cell").drop("__cell").distinct()

    d1 = _cross(
        F.col("b_lon1"), F.col("b_lat1"),
        F.col("b_lon2"), F.col("b_lat2"),
        F.col("a_lon1"), F.col("a_lat1"),
    )
    d2 = _cross(
        F.col("b_lon1"), F.col("b_lat1"),
        F.col("b_lon2"), F.col("b_lat2"),
        F.col("a_lon2"), F.col("a_lat2"),
    )
    d3 = _cross(
        F.col("a_lon1"), F.col("a_lat1"),
        F.col("a_lon2"), F.col("a_lat2"),
        F.col("b_lon1"), F.col("b_lat1"),
    )
    d4 = _cross(
        F.col("a_lon1"), F.col("a_lat1"),
        F.col("a_lon2"), F.col("a_lat2"),
        F.col("b_lon2"), F.col("b_lat2"),
    )
    return cand.where((d1 * d2 < 0) & (d3 * d4 < 0)).select("a_id", "b_id")


def segment_intersection_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin: brute-force pair enumeration + the IDENTICAL strict
    orientation law. The oracle side skips the cell cover (completeness
    is the engine's claim under test; the exact predicate is shared) —
    fine at oracle scale, where |A|·|B| pairs fit one node."""
    cross = (
        "(({ax} - {ox}) * ({by} - {oy}) - ({ay} - {oy}) * ({bx} - {ox}))"
    )
    d1 = cross.format(
        ox="b.lon1", oy="b.lat1", ax="b.lon2", ay="b.lat2", bx="a.lon1", by="a.lat1"
    )
    d2 = cross.format(
        ox="b.lon1", oy="b.lat1", ax="b.lon2", ay="b.lat2", bx="a.lon2", by="a.lat2"
    )
    d3 = cross.format(
        ox="a.lon1", oy="a.lat1", ax="a.lon2", ay="a.lat2", bx="b.lon1", by="b.lat1"
    )
    d4 = cross.format(
        ox="a.lon1", oy="a.lat1", ax="a.lon2", ay="a.lat2", bx="b.lon2", by="b.lat2"
    )
    return f"""SELECT a.id AS a_id, b.id AS b_id
FROM ({a_sql}) a JOIN ({b_sql}) b ON TRUE
WHERE {d1} * {d2} < 0 AND {d3} * {d4} < 0"""
