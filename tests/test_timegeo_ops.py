"""gap_fill (locf), trajectory_length, bbox_overlap_join — invariant and
brute-force-parity tests (python oracles independent of the DuckDB twins
exercised by test_queries_oracle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# gap_fill
# ---------------------------------------------------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts string, v long").select(
        "user_id", F.to_timestamp_ntz("ts").alias("ts"), "v"
    )


def test_gap_fill_dense_grid_and_locf(spark):
    from gosmonaut_spark.operators.rolling import gap_fill

    step = 3_600_000  # 1 h
    rows = [
        # key 1: observations at hours 0, 1, 4 (gap at 2, 3)
        (1, "2024-01-01 00:10:00", 5),
        (1, "2024-01-01 00:50:00", 7),
        (1, "2024-01-01 01:30:00", 11),
        (1, "2024-01-01 04:00:00", 2),
        # key 2: single bucket — grid is exactly one row, no gaps
        (2, "2024-01-02 09:15:00", 3),
    ]
    df = _mk_events(spark, rows)
    out = gap_fill(df, "user_id", "ts", "v", step).orderBy(
        "user_id", "bucket_ms"
    ).collect()

    k1 = [r for r in out if r.user_id == 1]
    base = 1_704_067_200_000  # 2024-01-01T00:00Z epoch ms
    assert [r.bucket_ms for r in k1] == [base + i * step for i in range(5)]
    assert [r.v_obs for r in k1] == [12, 11, None, None, 2]
    assert [r.v_filled for r in k1] == [12, 11, 11, 11, 2]
    assert [r.is_gap for r in k1] == [0, 0, 1, 1, 0]
    assert [r.n_obs for r in k1] == [2, 1, 0, 0, 1]

    k2 = [r for r in out if r.user_id == 2]
    assert len(k2) == 1 and k2[0].is_gap == 0 and k2[0].v_filled == 3


def test_gap_fill_grid_covers_span(spark):
    """On real events: per key the grid is exactly (b1-b0)/step + 1 rows,
    observed bucket values survive, and no bucket is outside the span."""
    from gosmonaut_spark.operators.rolling import gap_fill

    step = 21_600_000  # 6 h
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", (F.col("event_id") % F.lit(97)).alias("v")
    )
    out = gap_fill(ev, "user_id", "ts", "v", step)
    agg = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("bucket_ms").alias("b0"),
            F.max("bucket_ms").alias("b1"),
            F.sum("is_gap").alias("gaps"),
            F.sum(F.col("v_filled").isNull().cast("int")).alias("null_fills"),
        )
        .collect()
    )
    assert agg
    for r in agg:
        assert r.n == (r.b1 - r.b0) // step + 1
        assert r.null_fills == 0  # first bucket of a span is always observed


# ---------------------------------------------------------------------------
# trajectory_length
# ---------------------------------------------------------------------------


def _hav_m(lat1, lon1, lat2, lon2):
    r = 6_371_008.8
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlon / 2) ** 2
    )
    return 2.0 * r * math.asin(math.sqrt(a))


def test_trajectory_length_matches_python_brute(spark):
    from gosmonaut_spark.functions.geo import trajectory_length

    pts = [
        # (key, order, id, lat, lon) — key 7 out-of-order ids at equal ts
        (7, 100, 2, 10.0, 20.0),
        (7, 100, 1, 10.5, 20.5),
        (7, 200, 3, 11.0, 21.0),
        # key 8: single point -> length 0
        (8, 50, 9, -33.0, 151.0),
        # key 9: antimeridian hop
        (9, 1, 1, 0.0, 179.9),
        (9, 2, 2, 0.0, -179.9),
    ]
    df = spark.createDataFrame(
        pts, "k long, ms long, id long, lat double, lon double"
    )
    got = {
        r.k: (r.n_points, r.length_mm)
        for r in trajectory_length(df, "k", "ms", "id").collect()
    }

    expect = {}
    for k in {p[0] for p in pts}:
        track = sorted([p for p in pts if p[0] == k], key=lambda p: (p[1], p[2]))
        mm = sum(
            int(round(_hav_m(a[3], a[4], b[3], b[4]) * 1000.0))
            for a, b in zip(track, track[1:])
        )
        expect[k] = (len(track), mm)
    assert got == expect
    assert got[8] == (1, 0)


# ---------------------------------------------------------------------------
# bbox_overlap_join
# ---------------------------------------------------------------------------


def _brute_pairs(rects):
    out = set()
    for a in rects:
        for b in rects:
            if a[0] < b[0] and (
                a[1] <= b[2] and b[1] <= a[2] and a[3] <= b[4] and b[3] <= a[4]
            ):
                out.add((a[0], b[0]))
    return out


@pytest.mark.parametrize("grid_deg", [3.0, 8.0, 45.0])
def test_bbox_overlap_matches_brute(spark, grid_deg):
    """Grid size must not change the result set (index-then-refine law),
    including rectangles spanning many cells and exact edge touches."""
    from gosmonaut_spark.operators.overlap import bbox_overlap_join

    rects = [
        # (id, s, n, west, east)
        (1, 0.0, 10.0, 0.0, 10.0),
        (2, 10.0, 20.0, 10.0, 20.0),   # touches #1 at one corner -> pair
        (3, -5.0, 4.0, -170.0, -160.0),
        (4, 50.0, 60.0, 100.0, 101.0),  # isolated
        (5, -80.0, 80.0, -20.0, 20.0),  # tall: spans many cells, hits 1,2
        (6, 2.0, 3.0, 2.0, 3.0),        # nested inside #1
    ]
    df = spark.createDataFrame(
        rects, "polygon_id long, s double, n double, west double, east double"
    )
    got = {
        (r.id_a, r.id_b)
        for r in bbox_overlap_join(df, grid_deg=grid_deg).collect()
    }
    assert got == _brute_pairs(rects)
    assert (1, 2) in got and (1, 6) in got and all(4 not in p for p in got)
