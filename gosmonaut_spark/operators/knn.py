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


def _ring_coverage_m(lat: Column, res: int, ring: int) -> Column:
    """Guaranteed coverage radius of a k-ring, per query row (meters).

    Every cell within Chebyshev distance ``ring`` of the query's cell is a
    candidate, so the nearest *excluded* point is at least ``ring`` full
    cell extents away in latitude OR longitude. The longitude arc uses the
    most poleward latitude the ring can span (smallest cosine) — a
    conservative lower bound, so certification is never optimistic. Rings
    that clamp at the poles exclude nothing poleward (those cells do not
    exist), so the latitude bound needs no pole term.
    """
    from ..functions.geo import EARTH_RADIUS_M

    n = 1 << res
    cell_h_deg = 180.0 / n
    cell_w_deg = 360.0 / n
    cov_lat = F.lit(EARTH_RADIUS_M) * F.radians(F.lit(ring * cell_h_deg))
    phi_far = F.least(
        F.abs(lat) + F.lit((ring + 1) * cell_h_deg), F.lit(90.0)
    )
    half_dlon = F.radians(F.lit(min(ring * cell_w_deg, 180.0))) / F.lit(2.0)
    cov_lon = (
        F.lit(2.0 * EARTH_RADIUS_M)
        * F.asin(F.greatest(F.cos(F.radians(phi_far)), F.lit(0.0)) * F.sin(half_dlon))
    )
    # a ring spanning the full grid in a dimension excludes nothing there
    if 2 * ring + 1 >= n:
        return F.lit(float("inf"))
    return F.least(cov_lat, cov_lon)


def knn_join_adaptive(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 7,
    ring: int = 1,
    min_res: int = 3,
    query_id: str = "query_id",
    target_id: str = "target_id",
) -> DataFrame:
    """EXACT kNN at ring-join cost: coarsening escalation + brute tail.

    Round ``i`` runs :func:`knn_join` at resolution ``res - i`` (same
    ``ring``) over the still-uncertified queries — coarsening one level
    doubles the ring's guaranteed reach while the candidate-ring
    expression stays a constant 9 cells (escalating ``ring`` instead
    grows the plan O(ring²): a ring-8 expansion is 289 branch expressions
    and canonicalization alone can OOM the driver). A query is certified
    exact when it has ``k`` neighbors and its k-th distance is strictly
    inside the ring's coverage radius (:func:`_ring_coverage_m`) — no
    point outside the ring can beat a certified neighbor. Queries still
    uncertified at ``min_res`` (sparse or polar regions) fall back to
    :func:`knn_brute`; by then the pending side is tiny, so the cross
    join is a broadcast nested loop = one extra scan of targets.

    The driver-side loop is bounded (one job per level); each round is a
    plain equi-join + window the planner optimizes like any other —
    mirrors the reference's conditional pass skipping
    (/root/reference/gosmonaut.go:147-216: passes launch only when the
    dependency tracker is non-empty).
    """
    pending = queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lat").alias("lat"),
        F.col("lon").alias("lon"),
    )
    parts: list[DataFrame] = []
    for cur_res in range(res, min_res - 1, -1):
        cand = knn_join(
            pending.select(F.col("query_id").alias(query_id), "lat", "lon"),
            targets,
            k,
            cur_res,
            ring,
            query_id=query_id,
            target_id=target_id,
        ).select(
            F.col(query_id).alias("query_id"),
            F.col(target_id).alias("target_id"),
            "dist_m",
        )
        stats = cand.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__n"), F.max("dist_m").alias("__kth")
        )
        certified = (
            pending.join(stats, "query_id")
            .filter(
                (F.col("__n") >= k)
                & (F.col("__kth") < _ring_coverage_m(F.col("lat"), cur_res, ring))
            )
            .select("query_id")
        )
        parts.append(cand.join(certified, "query_id", "left_semi"))
        # localCheckpoint truncates lineage: without it each round's plan
        # nests every prior round's anti-join and analysis/canonicalization
        # cost grows superlinearly (measured: driver OOM at ~9 rounds).
        # The pending set is the uncertified tail — small — so eager
        # materialization is cheap; at cluster scale use a reliable
        # checkpoint dir instead (same pass-snapshot discipline as B11).
        pending = pending.join(certified, "query_id", "left_anti").localCheckpoint()
        if pending.isEmpty():
            break
    else:
        parts.append(
            knn_brute(
                pending.select(F.col("query_id").alias(query_id), "lat", "lon"),
                targets,
                k,
                query_id=query_id,
                target_id=target_id,
            ).select(
                F.col(query_id).alias("query_id"),
                F.col(target_id).alias("target_id"),
                "dist_m",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("query_id").alias(query_id),
        F.col("target_id").alias(target_id),
        "dist_m",
    )


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
