"""kNN join (B8) — k-ring candidate expansion + windowed top-k.

Two variants:

* :func:`knn_join` — the scale path. Queries explode to their cell's
  (2k+1)^2 ring at a chosen resolution; candidates = equi-join on cell;
  exact haversine + ``row_number() <= k`` per query. The planner sees one
  equi-join and one window — both shuffle on bounded keys. Contract: a
  neighbor further than the ring's reach is missed, so pick
  ``res``/``ring`` so the ring radius covers the expected k-th distance
  (or iterate with :func:`knn_join_adaptive`).
* :func:`knn_brute` — exact O(Q*T) crossJoin baseline; the oracle twin
  (SQL-expressible) and the right plan when one side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import cell_expr, cell_ring
from ..functions.geo import haversine_m


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("target_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 7,
    ring: int = 1,
    query_id: str = "query_id",
    target_id: str = "target_id",
) -> DataFrame:
    """Approximate kNN: candidates restricted to the k-ring neighborhood.

    Inputs: ``queries(query_id, lat, lon)``, ``targets(target_id, lat, lon)``.
    Output: ``(query_id, target_id, dist_m)``, ties broken by target_id —
    deterministic across runs and engines.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lat").alias("q_lat"),
        F.col("lon").alias("q_lon"),
        F.explode(cell_ring(cell_expr("lat", "lon", res), res, ring)).alias("cell"),
    )
    t = targets.select(
        F.col(target_id).alias("target_id"),
        F.col("lat").alias("t_lat"),
        F.col("lon").alias("t_lon"),
        cell_expr("lat", "lon", res).alias("cell"),
    )
    cand = q.join(t, "cell", "inner").select(
        "query_id",
        "target_id",
        haversine_m(F.col("q_lat"), F.col("q_lon"), F.col("t_lat"), F.col("t_lon")).alias(
            "dist_m"
        ),
    )
    return _topk(cand, k)


def knn_brute(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_id: str = "query_id",
    target_id: str = "target_id",
) -> DataFrame:
    """Exact kNN by cross join — oracle twin / small-side plan."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lat").alias("q_lat"),
        F.col("lon").alias("q_lon"),
    )
    t = targets.select(
        F.col(target_id).alias("target_id"),
        F.col("lat").alias("t_lat"),
        F.col("lon").alias("t_lon"),
    )
    cand = q.crossJoin(t).select(
        "query_id",
        "target_id",
        haversine_m(F.col("q_lat"), F.col("q_lon"), F.col("t_lat"), F.col("t_lon")).alias(
            "dist_m"
        ),
    )
    return _topk(cand, k)
