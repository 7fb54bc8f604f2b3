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
