"""Spatial epsilon-connectivity clustering (friends-of-friends / DBSCAN
with ``min_pts=1``) over a point table.

The geospatial twin of the fuzzy-dedup pipeline: where minhash-LSH emits
near-duplicate *pairs* and :func:`~gosmonaut_spark.operators.graph.
connected_components` folds them into clusters, this operator emits
*eps-neighbor* pairs (exact, via the grid-bucketed
:func:`~gosmonaut_spark.operators.knn.radius_join`) and folds them with
the SAME component machinery. Classic friends-of-friends clustering
(standard in astronomy catalogs) == DBSCAN with ``min_pts=1``: two
points share a cluster iff a chain of <=eps hops connects them.

Scale shape (100 TB lens): candidate pairs are one bounded cell explode
+ one equi-join on cell (never a cross join — see radius_join's
per-latitude fan-out bound); clustering is alternating large/small-star,
O(log n) rounds, no broadcast of the vertex set. Singleton points never
enter the component loop at all — they are restored by a left join at
the end, so the iterative part is linear in the *pair* count, not the
point count (at web scale most points are isolated noise).

Reference parity: the reference has no clustering surface (its geo layer
stops at decode, /root/reference/decode.go:120-180); this operator is
part of the graft's spatial-join family on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components
from .knn import radius_join


def grid_cluster(
    points: DataFrame,
    eps_m: float,
    res: int = 6,
    id_col: str = "id",
) -> DataFrame:
    """Cluster assignment: ``(id, cluster_id)``, one row per input point.

    ``cluster_id`` is the minimum point id in the point's eps-connected
    component (deterministic canonical representative — downstream
    "aggregate per cluster" is reproducible under any partitioning).
    Isolated points get ``cluster_id == id``.

    ``points`` must carry ``(id_col, lat, lon)``; eps is in meters on
    the WGS84 sphere (haversine, same law as radius_join).
    """
    pts = points.select(F.col(id_col).alias("id"), "lat", "lon")
    pairs = radius_join(
        pts.select(F.col("id").alias("query_id"), "lat", "lon"),
        pts.select(F.col("id").alias("target_id"), "lat", "lon"),
        radius_m=eps_m,
        res=res,
    )
    comp = connected_components(pairs, "query_id", "target_id")
    return pts.join(comp, "id", "left").select(
        "id", F.coalesce("component", "id").alias("cluster_id")
    )


def grid_cluster_sql(pts_sql: str, hav_sql: str, eps_m: float) -> str:
    """DuckDB twin of :func:`grid_cluster`.

    ``pts_sql`` must yield ``(id, lat, lon)``; ``hav_sql`` is a haversine
    distance expression over aliases ``q`` (query) and ``t`` (target),
    matching the engine's law. The component label (min id reachable)
    is computed with a recursive reachability closure — exact on the
    oracle's small inputs; the engine side uses the O(log n)-round
    star algorithm instead, which is the point of the twin.
    """
    return f"""WITH RECURSIVE pts AS MATERIALIZED ({pts_sql}),
pairs AS MATERIALIZED (
  SELECT q.id AS u, t.id AS v
  FROM pts q JOIN pts t ON t.id != q.id
  WHERE {hav_sql} <= {eps_m!r}
),
reach(id, lbl) AS (
  SELECT id, id FROM pts
  UNION
  SELECT p.v, r.lbl FROM reach r JOIN pairs p ON p.u = r.id
)
SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id"""

# ---------------------------------------------------------------------------
# Density clustering (grid DBSCAN: core / border / noise)
# ---------------------------------------------------------------------------


def _cell_shift(df: DataFrame, res: int, dx: int, dy: int) -> DataFrame:
    """Rows of ``df`` whose (x+dx, y+dy) neighbor exists on the res-grid,
    with ``cell`` replaced by that neighbor's id and every other column
    carried through. Pure integer arithmetic on the composite id
    (cell = base + x·n + y)."""
    n_side = 1 << res
    base = 1 << (2 * res)
    rel = F.col("cell") - F.lit(base)
    x = (rel / F.lit(n_side)).cast("long")
    y = rel % F.lit(n_side)
    guard = (
        (x + F.lit(dx) >= 0)
        & (x + F.lit(dx) < n_side)
        & (y + F.lit(dy) >= 0)
        & (y + F.lit(dy) < n_side)
    )
    others = [c for c in df.columns if c != "cell"]
    return df.where(guard).select(
        (F.col("cell") + F.lit(dx * n_side + dy)).alias("cell"), *others
    )


def grid_dbscan(
    points: DataFrame,
    res: int,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    diag: bool = True,
) -> DataFrame:
    """Cell-grid DBSCAN → one row per point ``(id, cell, cluster,
    role)`` with ``role ∈ {'core', 'border', 'noise'}``.

    The density-aware upgrade of :func:`grid_cluster` (= ``min_pts=1``
    friends-of-friends): a CELL is core iff it holds ≥ ``min_pts``
    points at resolution ``res``; touching core cells (4-adjacency,
    plus diagonals when ``diag``) merge into one cluster; points in
    non-core cells adjacent to a core cell join it as border; all other
    points are noise. This is the GriDBSCAN-family discretization — eps
    is the cell pitch, density is an exact per-cell count — chosen over
    point-eps DBSCAN because every stage stays relational: one
    groupBy(cell) over the points, integer-id adjacency joins over the
    (small) core-cell table, and the engine's O(log n) star component
    loop. No point-to-point distance is ever computed, so cost at
    10^12 points is the count shuffle plus core-table joins.

    Determinism: cluster labels are the component's MINIMUM core-cell
    id; border points take the MIN cluster among adjacent core cells —
    integer mins only, nothing depends on partitioning. The DuckDB twin
    closes components with a recursive CTE over the same adjacency.
    """
    from ..functions.cells import cell_expr

    fwd_dirs = [(1, 0), (0, 1)] + ([(1, 1), (1, -1)] if diag else [])
    pts = points.select(
        F.col(id_col).alias("id"),
        cell_expr(lat_col, lon_col, res).alias("cell"),
    )
    counts = pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    core = counts.where(F.col("n") >= F.lit(int(min_pts))).select("cell")

    # core-core adjacency: forward directions only (each unordered pair
    # once); the component loop symmetrizes internally
    shifted = None
    for dx, dy in fwd_dirs:
        s = _cell_shift(core.select(F.col("cell")), res, dx, dy).select(
            F.col("cell").alias("b")
        ).withColumn("a", F.col("b") - F.lit(dx * (1 << res) + dy))
        shifted = s if shifted is None else shifted.unionByName(s)
    edges = shifted.join(
        core.select(F.col("cell").alias("b")), "b", "left_semi"
    ).select("a", "b")
    comp = connected_components(edges, "a", "b")
    labels = core.join(comp, core.cell == comp.id, "left").select(
        core.cell.alias("cell"),
        F.coalesce(comp.component, core.cell).alias("cluster"),
    )

    # border lookup: every labeled core cell claims all its neighbors
    # (both signs of every direction); non-core claimed cells take min
    nbr = None
    for dx, dy in fwd_dirs:
        for sx, sy in ((dx, dy), (-dx, -dy)):
            s = _cell_shift(labels, res, sx, sy)
            nbr = s if nbr is None else nbr.unionByName(s)
    border_lut = (
        nbr.join(core, "cell", "left_anti")
        .groupBy("cell")
        .agg(F.min("cluster").alias("border_cluster"))
    )

    out = pts.join(
        labels.withColumnRenamed("cluster", "core_cluster"), "cell", "left"
    ).join(border_lut, "cell", "left")
    return out.select(
        "id",
        "cell",
        F.coalesce("core_cluster", "border_cluster").alias("cluster"),
        F.when(F.col("core_cluster").isNotNull(), F.lit("core"))
        .when(F.col("border_cluster").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("role"),
    )


def grid_dbscan_sql(
    pts_sql: str,
    res: int,
    min_pts: int,
    id_expr: str = "id",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    diag: bool = True,
) -> str:
    """DuckDB twin of :func:`grid_dbscan` — identical cell law,
    adjacency guards and min-label rules; components via recursive CTE
    (exact transitive closure on oracle inputs)."""
    from ..functions.cells import cell_sql

    n_side = 1 << res
    base = 1 << (2 * res)
    fwd = [(1, 0), (0, 1)] + ([(1, 1), (1, -1)] if diag else [])
    both = [d for dx, dy in fwd for d in ((dx, dy), (-dx, -dy))]

    def shift_guard(sx: int, sy: int, col: str = "cell") -> str:
        x = f"(({col} - {base}) // {n_side})"
        y = f"(({col} - {base}) % {n_side})"
        return (
            f"{x} + ({sx}) >= 0 AND {x} + ({sx}) < {n_side} "
            f"AND {y} + ({sy}) >= 0 AND {y} + ({sy}) < {n_side}"
        )

    edge_branches = "\n  UNION ALL\n".join(
        f"  SELECT cell AS a, cell + {dx * n_side + dy} AS b FROM db_core "
        f"WHERE {shift_guard(dx, dy)}"
        for dx, dy in fwd
    )
    nbr_branches = "\n  UNION ALL\n".join(
        f"  SELECT cell + {sx * n_side + sy} AS cell, cluster FROM db_lab "
        f"WHERE {shift_guard(sx, sy)}"
        for sx, sy in both
    )
    return f"""WITH RECURSIVE db_pts AS MATERIALIZED (
  SELECT {id_expr} AS id, {cell_sql(lat_expr, lon_expr, res)} AS cell
  FROM ({pts_sql})
),
db_counts AS (SELECT cell, count(*) AS n FROM db_pts GROUP BY cell),
db_core AS MATERIALIZED (
  SELECT cell FROM db_counts WHERE n >= {int(min_pts)}
),
db_edges AS MATERIALIZED (
  SELECT a, b FROM (
{edge_branches}
  ) WHERE b IN (SELECT cell FROM db_core)
),
db_sym AS (
  SELECT a AS u, b AS v FROM db_edges UNION SELECT b, a FROM db_edges
),
db_reach(id, lbl) AS (
  SELECT cell, cell FROM db_core
  UNION
  SELECT e.v, r.lbl FROM db_reach r JOIN db_sym e ON e.u = r.id
),
db_lab AS MATERIALIZED (
  SELECT id AS cell, min(lbl) AS cluster FROM db_reach GROUP BY id
),
db_border AS MATERIALIZED (
  SELECT cell, min(cluster) AS border_cluster FROM (
{nbr_branches}
  ) WHERE cell NOT IN (SELECT cell FROM db_core)
  GROUP BY cell
)
SELECT p.id AS id, p.cell AS cell,
       coalesce(l.cluster, b.border_cluster) AS cluster,
       CASE WHEN l.cluster IS NOT NULL THEN 'core'
            WHEN b.border_cluster IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM db_pts p
LEFT JOIN db_lab l ON l.cell = p.cell
LEFT JOIN db_border b ON b.cell = p.cell"""
