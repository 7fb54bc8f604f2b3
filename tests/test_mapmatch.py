"""snap_to_segments — brute-force parity (grid candidates must equal the
cross-join result exactly), degenerate/tie/boundary cases."""

from __future__ import annotations

import random


def _brute(points, segs, r):
    out = {}
    for pid, px, py in points:
        best = None
        for sid, ax, ay, bx, by in segs:
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            if len2 == 0.0:
                t = 0.0
            else:
                t = min(max(((px - ax) * dx + (py - ay) * dy) / len2, 0.0), 1.0)
            qx, qy = ax + t * dx, ay + t * dy
            d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
            if d2 <= r * r and (best is None or (d2, sid) < (best[1], best[0])):
                best = (sid, d2, t)
        if best is not None:
            out[pid] = best
    return out


def _run(spark, points, segs, r, g):
    from gosmonaut_spark.operators.mapmatch import snap_to_segments

    p = spark.createDataFrame(points, "id long, lon double, lat double")
    s = spark.createDataFrame(
        segs, "seg_id long, ax double, ay double, bx double, by double"
    )
    rows = snap_to_segments(p, s, radius=r, grid_deg=g).collect()
    return {row.id: (row.seg_id, row.dist2, row.t) for row in rows}


def test_snap_matches_brute_random(spark):
    rng = random.Random(42)
    points = [
        (i, rng.uniform(-10, 10), rng.uniform(-10, 10)) for i in range(200)
    ]
    segs = []
    for j in range(25):
        ax, ay = rng.uniform(-10, 10), rng.uniform(-10, 10)
        segs.append((j, ax, ay, ax + rng.uniform(-3, 3), ay + rng.uniform(-3, 3)))
    got = _run(spark, points, segs, r=1.5, g=2.0)
    assert got == _brute(points, segs, 1.5)
    assert got  # non-degenerate scenario actually matches something


def test_snap_handles_degenerate_and_ties(spark):
    # zero-length segment treated as a point (t = 0); equidistant ties
    # break by the smaller seg_id
    points = [(1, 0.0, 0.0), (2, 5.0, 0.0), (3, 100.0, 100.0)]
    segs = [
        (10, 0.0, 1.0, 0.0, 1.0),    # degenerate, 1.0 above point 1
        (20, -1.0, -1.0, 1.0, -1.0), # horizontal, 1.0 below point 1 — tie
        (30, 5.0, 0.5, 5.0, 0.5),    # degenerate, 0.5 above point 2
    ]
    got = _run(spark, points, segs, r=2.0, g=1.0)
    assert got == _brute(points, segs, 2.0)
    assert got[1][0] == 10 and got[1][2] == 0.0  # tie -> smaller id, t=0
    assert got[2] == (30, 0.25, 0.0)
    assert 3 not in got  # out of range: dropped


def test_snap_radius_boundary_closed(spark):
    # a point EXACTLY radius away must match (closed interval)
    points = [(1, 0.0, 2.0)]
    segs = [(7, -1.0, 0.0, 1.0, 0.0)]
    got = _run(spark, points, segs, r=2.0, g=1.0)
    assert got == {1: (7, 4.0, 0.5)}


def test_snap_clamps_projection_to_endpoints(spark):
    # point beyond the segment end snaps to the endpoint, t clamped to 1
    points = [(1, 3.0, 0.0)]
    segs = [(7, 0.0, 0.0, 2.0, 0.0)]
    got = _run(spark, points, segs, r=1.5, g=1.0)
    assert got == {1: (7, 1.0, 1.0)}


def test_snap_plan_has_no_cartesian_product(spark):
    """The cell-bucketed candidate join must plan as an equi-join on the
    grid keys — a CartesianProduct/BroadcastNestedLoop here would be the
    all-pairs shape the operator exists to avoid."""
    from gosmonaut_spark.operators.mapmatch import snap_to_segments

    p = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double")
    s = spark.createDataFrame(
        [(7, 0.0, 0.0, 1.0, 1.0)], "seg_id long, ax double, ay double, bx double, by double"
    )
    plan = snap_to_segments(p, s, radius=1.0, grid_deg=2.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reverse_geocode_matches_brute(spark):
    import random

    from gosmonaut_spark.operators.mapmatch import reverse_geocode

    rng = random.Random(9)
    regions = []
    for i in range(8):
        cy, cx = rng.uniform(-60, 60), rng.uniform(-150, 150)
        hy, hx = rng.uniform(2, 10), rng.uniform(2, 10)
        regions.append((i, cy - hy, cy + hy, cx - hx, cx + hx))
    pts = [(i, rng.uniform(-80, 80), rng.uniform(-170, 170)) for i in range(150)]
    # plant: a point strictly inside region 0 and one exactly on its edge
    _, s0, n0, w0, e0 = regions[0]
    pts += [(900, (s0 + n0) / 2, (w0 + e0) / 2), (901, s0, w0)]

    rdf = spark.createDataFrame(
        regions, "region_id long, s double, n double, west double, east double"
    )
    pdf = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        r.id: (r.region_id, r.dist2)
        for r in reverse_geocode(pdf, rdf).collect()
    }

    def d2(py, px, reg):
        _, s, n, w, e = reg
        dx = max(0.0, w - px, px - e)
        dy = max(0.0, s - py, py - n)
        return dx * dx + dy * dy

    want = {}
    for pid, py, px in pts:
        scored = sorted((d2(py, px, r), r[0]) for r in regions)
        want[pid] = (scored[0][1], scored[0][0])
    assert got == want
    assert got[900] == (0, 0.0)   # inside: distance 0
    assert got[901] == (0, 0.0)   # closed boundary: corner counts inside
    assert len(got) == len(pts)   # total assignment — nobody unmatched


# ---------------------------------------------------------------------------
# grid DBSCAN (round-4 addition)
# ---------------------------------------------------------------------------


def test_grid_dbscan_roles_hand_grid(spark):
    """res=2 (4x4 world grid): two adjacent core cells merge into one
    cluster labeled by the min core-cell id; a single point in the next
    cell over is border; a far corner point is noise."""
    from gosmonaut_spark.functions.cells import cell_from_xy
    from gosmonaut_spark.operators.cluster import grid_dbscan
    from pyspark.sql import functions as F

    def pt(i, x, y):
        # center of res-2 cell (x, y): lon = -180 + (x+.5)*90, lat = 90 - (y+.5)*45
        return (i, 90.0 - (y + 0.5) * 45.0, -180.0 + (x + 0.5) * 90.0)

    rows = [pt(1, 0, 0), pt(2, 0, 0), pt(3, 0, 0),
            pt(4, 1, 0), pt(5, 1, 0), pt(6, 1, 0),
            pt(7, 2, 0),
            pt(8, 3, 3)]
    pts = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {r["id"]: r for r in grid_dbscan(pts, res=2, min_pts=3).collect()}
    cell00 = spark.range(1).select(
        cell_from_xy(F.lit(0), F.lit(0), 2).alias("c")
    ).collect()[0]["c"]
    for i in (1, 2, 3, 4, 5, 6):
        assert got[i]["role"] == "core" and got[i]["cluster"] == cell00
    assert got[7]["role"] == "border" and got[7]["cluster"] == cell00
    assert got[8]["role"] == "noise" and got[8]["cluster"] is None


def test_grid_dbscan_diag_toggle(spark):
    """Two diagonal-only core cells: one cluster with diag=True, two
    with diag=False."""
    from gosmonaut_spark.operators.cluster import grid_dbscan

    def pt(i, x, y):
        return (i, 90.0 - (y + 0.5) * 45.0, -180.0 + (x + 0.5) * 90.0)

    rows = [pt(1, 0, 0), pt(2, 0, 0), pt(3, 1, 1), pt(4, 1, 1)]
    pts = spark.createDataFrame(rows, "id long, lat double, lon double")
    with_diag = grid_dbscan(pts, res=2, min_pts=2, diag=True).collect()
    no_diag = grid_dbscan(pts, res=2, min_pts=2, diag=False).collect()
    assert len({r["cluster"] for r in with_diag}) == 1
    assert len({r["cluster"] for r in no_diag}) == 2


def test_round4c_ops_no_cartesian(spark):
    """Scale guard for the round-4c operators: none of them may plan a
    CartesianProduct — pair fan-out must ride equi-joins (scalar
    broadcast one-row joins are fine and show as BroadcastNestedLoop)."""
    from pyspark.sql import functions as F
    from gosmonaut_spark.operators.cluster import grid_dbscan
    from gosmonaut_spark.operators.graph import link_prediction
    from gosmonaut_spark.operators.tiling import join_counts, morans_i
    from gosmonaut_spark.operators.trajectory import hausdorff_pairs

    pts = spark.createDataFrame(
        [(i, float(i % 7), float(i % 11)) for i in range(60)],
        "id long, lat double, lon double",
    )
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(40)], "src long, dst long"
    )
    tiles = spark.createDataFrame(
        [(1 << 10 | i, i % 3 + 1) for i in range(30)],
        "cell long, n_points long",
    )
    classed = tiles.select("cell", (F.col("n_points") % 2).cast("string").alias("cls"))
    upts = pts.withColumnRenamed("id", "user_id")
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "k1 long, k2 long")

    plans = {
        "link_prediction": link_prediction(edges, k=5),
        "grid_dbscan": grid_dbscan(pts, res=5, min_pts=2),
        "join_counts": join_counts(classed, res=5),
        "morans_i": morans_i(tiles.select("cell", "n_points"), res=5),
        "hausdorff": hausdorff_pairs(upts, pairs, "user_id"),
    }
    for name, df in plans.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, name
