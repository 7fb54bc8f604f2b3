"""Unit tests for bfs_hops, segment_intersection_join, inverted index /
phrase search, and the last-touch attribution composition — edge
semantics the parametrized oracle sweep doesn't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def test_bfs_hops_chain_and_cycle(spark):
    """Hop distances on a chain with a cycle: BFS must take the shortest
    route, stop at max_hops, and never revisit (the anti-join prune)."""
    from gosmonaut_spark.operators.graph import bfs_hops

    # chain 0-1-2-3-4-5 plus shortcut 0-4 and the cycle edge 5-0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 4), (5, 0)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r.id: r.hops for r in bfs_hops(edges, seeds, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 5: 1, 2: 2, 3: 2}

    # max_hops truncates the frontier (directed: no symmetrize)
    got2 = {
        r.id: r.hops
        for r in bfs_hops(
            edges, seeds, max_hops=1, undirected=False
        ).collect()
    }
    assert got2 == {0: 0, 1: 1, 4: 1}


def test_bfs_hops_multi_source_min(spark):
    """Multi-source: a node reachable from two seeds gets the MIN hops."""
    from gosmonaut_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (9, 3)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(0,), (9,)], ["id"])
    got = {r.id: r.hops for r in bfs_hops(edges, seeds, max_hops=5).collect()}
    assert got[3] == 1  # via 9, not 3 hops via 0
    assert got[2] == 2


# ---------------------------------------------------------------------------
# segment intersection
# ---------------------------------------------------------------------------


def _segs(spark, rows):
    return spark.createDataFrame(rows, ["id", "lat1", "lon1", "lat2", "lon2"])


def test_segment_intersection_basic(spark):
    """A proper X crossing is found; parallel / touching / collinear
    pairs are excluded by the strict orientation test."""
    from gosmonaut_spark.operators.segments import segment_intersection_join

    a = _segs(spark, [(1, 0.0, 0.0, 2.0, 2.0)])
    b = _segs(
        spark,
        [
            (10, 0.0, 2.0, 2.0, 0.0),   # crosses at (1,1)
            (11, 0.0, 1.0, 0.5, 1.0),   # short, far from the diagonal
            (12, 3.0, 3.0, 4.0, 4.0),   # collinear extension, no overlap
            (13, 2.0, 2.0, 3.0, 1.0),   # touches at an endpoint only
        ],
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in segment_intersection_join(a, b, res=5, max_cells=256).collect()
    )
    assert got == [(1, 10)]


def test_segment_cover_guard_fires(spark):
    """A continent-spanning segment at a fine res must fail LOUD, not
    silently explode the candidate fan-out."""
    from gosmonaut_spark.operators.segments import segment_intersection_join

    a = _segs(spark, [(1, -60.0, -170.0, 60.0, 170.0)])
    b = _segs(spark, [(2, 0.0, 1.0, 1.0, 0.0)])
    with pytest.raises(Exception, match="max_cells"):
        segment_intersection_join(a, b, res=10, max_cells=16).collect()


def test_segment_pair_tested_once_across_shared_cells(spark):
    """Two long co-cell segments share many cover cells; the output must
    still be one row per crossing pair (the pre-refine distinct)."""
    from gosmonaut_spark.operators.segments import segment_intersection_join

    a = _segs(spark, [(1, 0.0, 0.0, 0.001, 8.0)])   # nearly-horizontal
    b = _segs(spark, [(2, 0.001, 0.0, 0.0, 8.0)])   # crosses it mid-way
    out = segment_intersection_join(a, b, res=8, max_cells=4096).collect()
    assert [(r.a_id, r.b_id) for r in out] == [(1, 2)]


# ---------------------------------------------------------------------------
# inverted index + phrase search
# ---------------------------------------------------------------------------


def test_inverted_postings_positions_and_caps(spark):
    from gosmonaut_spark.functions.indexing import inverted_postings

    docs = spark.createDataFrame(
        [
            (1, "a b a c a"),
            (2, "b b c"),
            (3, "c"),
        ],
        ["doc_id", "text"],
    )
    p = {
        (r.term, r.doc_id): (r.tf, list(r.positions))
        for r in inverted_postings(docs).collect()
    }
    assert p[("a", 1)] == (3, [0, 2, 4])
    assert p[("b", 2)] == (2, [0, 1])
    # max_df: 'c' is in 3/3 docs -> dropped at max_df=0.7; min_tf=2 keeps
    # only repeated terms
    p2 = {
        (r.term, r.doc_id)
        for r in inverted_postings(docs, max_df=0.7, min_tf=2).collect()
    }
    assert p2 == {("a", 1), ("b", 2)}


def test_phrase_match_adjacency(spark):
    from gosmonaut_spark.functions.indexing import (
        inverted_postings,
        phrase_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "x y x y"),      # "x y" twice
            (2, "y x"),          # reversed only
            (3, "x z y"),        # gap
        ],
        ["doc_id", "text"],
    )
    p = inverted_postings(docs)
    got = {r.doc_id: r.n_occurrences for r in phrase_match(p, "x", "y").collect()}
    assert got == {1: 2}


# ---------------------------------------------------------------------------
# last-touch attribution (composition semantics)
# ---------------------------------------------------------------------------


def test_last_touch_lookback_window(spark):
    """A conversion with no touch inside the lookback is unattributed;
    the nearest-in-time touch wins otherwise."""
    from gosmonaut_spark.operators.asof import asof_join

    conv = spark.createDataFrame(
        [(100, 1, "2024-01-10 00:00:00"), (101, 2, "2024-01-10 00:00:00")],
        ["event_id", "user_id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    touch = spark.createDataFrame(
        [
            (1, "2024-01-09 00:00:00", "click"),  # inside 7d for user 1
            (1, "2024-01-01 00:00:00", "view"),   # older, loses
            (2, "2024-01-01 00:00:00", "view"),   # outside 7d for user 2
        ],
        ["user_id", "ts", "channel"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    j = asof_join(
        conv,
        touch,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        tolerance_ms=7 * 86_400_000,
        payload_cols=["channel"],
    )
    got = {r.event_id: r.asof_channel for r in j.collect()}
    assert got == {100: "click", 101: None}


def test_cooccurrence_topk_matches_bruteforce(spark):
    """Pair counts, cap law (the cap smallest item ids per group), and
    the deterministic top-k tie-break all match a python brute force."""
    from collections import Counter

    from gosmonaut_spark.functions.indexing import cooccurrence_topk

    rows = []
    # 6 groups over 8 items with skew: group 0 touches EVERYTHING (capped)
    touch = {
        0: list(range(8)),
        1: [1, 2, 3],
        2: [2, 3, 4],
        3: [1, 3, 5],
        4: [6, 7],
        5: [2, 3],
    }
    for g, its in touch.items():
        rows += [(g, it) for it in its] * 2  # duplicates must not count twice
    df = spark.createDataFrame(rows, "g long, it long")
    cap, top = 4, 2
    got = sorted(
        (r.item, r.rel, r.n_co, r.rnk)
        for r in cooccurrence_topk(df, "g", "it", cap=cap, top=top).collect()
    )

    pairs = Counter()
    for g, its in touch.items():
        kept = sorted(set(its))[:cap]  # the cap law
        for i, a in enumerate(kept):
            for b in kept[i + 1 :]:
                pairs[(a, b)] += 1
    sym = {}
    for (a, b), n in pairs.items():
        sym.setdefault(a, []).append((b, n))
        sym.setdefault(b, []).append((a, n))
    want = []
    for item, rels in sym.items():
        rels.sort(key=lambda rn: (-rn[1], rn[0]))
        want += [
            (item, rel, n, rnk + 1) for rnk, (rel, n) in enumerate(rels[:top])
        ]
    assert got == sorted(want)
    # group 0's capped-away items (4..7 beyond the 4 smallest) contributed
    # no pairs from group 0: item 7 only co-occurs via group 4
    assert [(r, n) for (i, r, n, _) in got if i == 7] == [(6, 1)]
