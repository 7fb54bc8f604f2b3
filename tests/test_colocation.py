"""colocation_pairs, geofence_transitions, retention_cohorts — pure-python
brute-force parity tests (independent of the DuckDB twins in
test_queries_oracle)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations


def _cell(lat, lon, res):
    n = 1 << res
    x = min(max(math.floor((lon + 180.0) / 360.0 * float(n)), 0), n - 1)
    y = min(max(math.floor((90.0 - lat) / 180.0 * float(n)), 0), n - 1)
    return (1 << (2 * res)) + x * n + y


def _mk_pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ms long, event_id long, lat double, lon double"
    )


# 4 movers over 2 one-hour buckets; movers 1/2/3 share a cell in bucket 0,
# movers 1/2 share again in bucket 1; mover 4 is always alone.
_CO_ROWS = [
    (1, 0, 1, 10.0, 20.0),
    (1, 60_000, 2, 10.0, 20.0),  # duplicate presence — must count once
    (2, 120_000, 3, 10.0, 20.0),
    (3, 180_000, 4, 10.0, 20.0),
    (4, 240_000, 5, -60.0, -120.0),
    (1, 3_600_000, 6, 10.0, 20.0),
    (2, 3_700_000, 7, 10.0, 20.0),
    (3, 3_800_000, 8, 80.0, 170.0),
]


def _brute_pairs(rows, res, bucket_ms, max_group=None):
    groups = defaultdict(set)
    for k, ms, _id, lat, lon in rows:
        groups[(_cell(lat, lon, res), ms // bucket_ms)].add(k)
    out = Counter()
    for members in groups.values():
        if max_group is not None and len(members) > max_group:
            continue
        for a, b in combinations(sorted(members), 2):
            out[(a, b)] += 1
    return dict(out)


def test_colocation_matches_brute(spark):
    from gosmonaut_spark.operators.colocation import colocation_pairs

    out = colocation_pairs(
        _mk_pts(spark, _CO_ROWS), 5, 3_600_000, "user_id", "ms"
    ).collect()
    got = {(r.k1, r.k2): r.n_copresent for r in out}
    assert got == _brute_pairs(_CO_ROWS, 5, 3_600_000)
    # expected by hand: bucket 0 cell A = {1,2,3} -> 3 pairs; bucket 1 = {1,2}
    assert got[(1, 2)] == 2 and got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert not any(4 in p for p in got)


def test_colocation_max_group_excludes_hot_cell(spark):
    from gosmonaut_spark.operators.colocation import colocation_pairs

    out = colocation_pairs(
        _mk_pts(spark, _CO_ROWS), 5, 3_600_000, "user_id", "ms", max_group=2
    ).collect()
    got = {(r.k1, r.k2): r.n_copresent for r in out}
    # bucket-0 group has 3 movers -> excluded; only the bucket-1 {1,2} survives
    assert got == _brute_pairs(_CO_ROWS, 5, 3_600_000, max_group=2) == {(1, 2): 1}


_FENCES = [(0.0, 30.0, 0.0, 90.0), (45.0, 85.0, 100.0, 180.0)]

_GF_ROWS = [
    # mover 1: starts inside fence 1 (enter at first ping), leaves, re-enters
    (1, 0, 1, 10.0, 20.0),
    (1, 1_000, 2, 15.0, 40.0),
    (1, 2_000, 3, -50.0, 20.0),
    (1, 3_000, 4, 50.0, 150.0),  # fence 2 — still "inside any"
    (1, 4_000, 5, -50.0, 20.0),
    # mover 2: never inside — no rows
    (2, 0, 6, -10.0, -10.0),
    (2, 1_000, 7, -20.0, -20.0),
    # mover 3: boundary is closed — corner point counts as inside
    (3, 0, 8, 0.0, 0.0),
    (3, 1_000, 9, -1.0, 0.0),
]


def _brute_fence(rows, fences):
    by_k = defaultdict(list)
    for k, ms, _id, lat, lon in rows:
        ins = any(
            a <= lat <= b and c <= lon <= d for a, b, c, d in fences
        )
        by_k[k].append((ms, _id, ins))
    out = []
    for k, seq in by_k.items():
        prev = False
        for ms, _id, ins in sorted(seq):
            if ins != prev:
                out.append((k, ms, "enter" if ins else "exit"))
            prev = ins
    return sorted(out)


def test_geofence_matches_brute(spark):
    from gosmonaut_spark.operators.colocation import geofence_transitions

    out = geofence_transitions(
        _mk_pts(spark, _GF_ROWS), _FENCES, "user_id", "ms", "event_id"
    ).collect()
    got = sorted((r.user_id, r.ms, r.event) for r in out)
    assert got == _brute_fence(_GF_ROWS, _FENCES)
    # hand-check: mover 1 enters at 0, exits at 2000, enters at 3000, exits 4000
    assert [(ms, e) for k, ms, e in got if k == 1] == [
        (0, "enter"),
        (2_000, "exit"),
        (3_000, "enter"),
        (4_000, "exit"),
    ]
    assert not any(k == 2 for k, _, _ in got)
    assert [(ms, e) for k, ms, e in got if k == 3] == [
        (0, "enter"),
        (1_000, "exit"),
    ]


def test_geofence_empty_fences_raises(spark):
    import pytest

    from gosmonaut_spark.operators.colocation import geofence_transitions

    with pytest.raises(ValueError):
        geofence_transitions(_mk_pts(spark, _GF_ROWS), [], "user_id", "ms", "event_id")


_WEEK = 7 * 86_400_000

_RT_ROWS = [
    # user 1: weeks 0,1,3 (cohort 0) — two events in week 0 count once
    (1, 0),
    (1, 1_000),
    (1, _WEEK + 5),
    (1, 3 * _WEEK),
    # user 2: weeks 0,1 (cohort 0)
    (2, 10),
    (2, _WEEK),
    # user 3: weeks 2 only (cohort 2)
    (3, 2 * _WEEK + 42),
]


def test_retention_matches_brute(spark):
    from gosmonaut_spark.operators.colocation import retention_cohorts

    df = spark.createDataFrame(_RT_ROWS, "user_id long, ms long")
    out = retention_cohorts(df, "user_id", "ms", week_ms=_WEEK).collect()
    got = {(r.cohort_week, r.week_offset): r.n_users for r in out}

    weeks = defaultdict(set)
    for k, ms in _RT_ROWS:
        weeks[k].add(ms // _WEEK)
    brute = Counter()
    for k, ws in weeks.items():
        c = min(ws)
        for w in ws:
            brute[(c, w - c)] += 1
    assert got == dict(brute)
    assert got[(0, 0)] == 2 and got[(0, 1)] == 2 and got[(0, 3)] == 1
    assert got[(2, 0)] == 1


def test_colocation_plan_is_equijoin(spark):
    """Candidates must meet in an equi-join on (cell, bucket) — never a
    cartesian pairing."""
    from gosmonaut_spark.operators.colocation import colocation_pairs

    pts = _mk_pts(spark, _CO_ROWS)
    plan = (
        colocation_pairs(pts, 5, 3_600_000, "user_id", "ms")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
