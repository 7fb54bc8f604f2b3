"""Rectangle (bbox) overlap join — polygon x polygon spatial pairing.

The engine's PIP join pairs POINTS with polygons; many pipeline steps
instead need polygon-with-polygon candidates (tile x AOI coverage,
dissolve preconditioning, map-sheet adjacency, dedup of re-digitized
areas). The standard scale shape is the same index-then-refine law the
PIP and radius joins use:

1. **Cover**: each rectangle explodes to the grid cells its bbox
   touches (``sequence() + explode`` codegen; fan-out is
   O(bbox_size / grid_deg) — callers size the grid to the typical
   rectangle so it stays O(1)).
2. **Pair**: self equi-join on the cell key (hash shuffle on the cell,
   never an all-pairs cross join), ``id_a < id_b`` so each unordered
   pair appears once per shared cell.
3. **Refine**: the exact closed-interval overlap predicate
   (``s_a <= n_b AND s_b <= n_a AND w_a <= e_b AND w_b <= e_a`` —
   touching edges count), then ``distinct`` to collapse multi-cell
   duplicates.

Determinism / twin notes: bounds arrive as doubles built by identical
arithmetic in both engines, and the predicate is pure comparison — the
oracle can therefore be a brute-force self-join with the same predicate
(semantically identical result, different plan), which is exactly how
the DuckDB twin and the brute parity test check this operator.

Skew (100 TB lens): a cell shared by many rectangles fans quadratically
inside that cell only; the grid size bounds it, AQE skew-join splits
the stragglers, and the cover step's fan-out guard is the same contract
as ``radius_join``'s cell cap. No driver collect anywhere.

Reference parity: none — the reference has no spatial join at all; this
extends the graft's B7 (PIP) family to polygon x polygon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bbox_overlap_join"]


def bbox_overlap_join(
    rects: DataFrame,
    grid_deg: float,
    id_col: str = "polygon_id",
    s_col: str = "s",
    n_col: str = "n",
    w_col: str = "west",
    e_col: str = "east",
) -> DataFrame:
    """All unordered pairs of rectangles whose closed bboxes intersect.

    ``rects`` carries one row per rectangle with id + (s, n, west, east)
    bounds. Returns ``(id_a, id_b)`` with ``id_a < id_b``, each
    intersecting pair exactly once.
    """
    g = float(grid_deg)
    cover = rects.select(
        F.col(id_col).alias("__id"),
        F.col(s_col).alias("__s"),
        F.col(n_col).alias("__n"),
        F.col(w_col).alias("__w"),
        F.col(e_col).alias("__e"),
        F.explode(
            F.sequence(
                F.floor(F.col(w_col) / F.lit(g)),
                F.floor(F.col(e_col) / F.lit(g)),
            )
        ).alias("__cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / F.lit(g)),
                F.floor(F.col("__n") / F.lit(g)),
            )
        ).alias("__cy"),
    )
    a = cover.select(
        F.col("__id").alias("id_a"),
        F.col("__s").alias("sa"),
        F.col("__n").alias("na"),
        F.col("__w").alias("wa"),
        F.col("__e").alias("ea"),
        "__cx",
        "__cy",
    )
    b = cover.select(
        F.col("__id").alias("id_b"),
        F.col("__s").alias("sb"),
        F.col("__n").alias("nb"),
        F.col("__w").alias("wb"),
        F.col("__e").alias("eb"),
        "__cx",
        "__cy",
    )
    pairs = a.join(b, ["__cx", "__cy"]).where(F.col("id_a") < F.col("id_b"))
    hit = pairs.where(
        (F.col("sa") <= F.col("nb"))
        & (F.col("sb") <= F.col("na"))
        & (F.col("wa") <= F.col("eb"))
        & (F.col("wb") <= F.col("ea"))
    )
    return hit.select("id_a", "id_b").distinct()
