"""Unit tests for the round-4 additions the parametrized oracle sweep
doesn't isolate: k-core peeling, weighted SSSP, BM25 ranked retrieval,
SQ8 scalar quantization, and fixed-epoch track resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------


def test_kcore_triangle_survives_pendants_peel(spark):
    """2-core of a triangle with pendant chains = exactly the triangle;
    peeling must cascade (removing a pendant exposes the next)."""
    from gosmonaut_spark.operators.graph import kcore

    # triangle 0-1-2; chain 2-3-4-5 hangs off it
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    got = {r.id: r.degree for r in kcore(edges, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_empty_and_nonconvergence_raise(spark):
    """k above the max degree peels everything (empty result, no raise);
    max_rounds too small for the cascade raises LOUDLY."""
    from gosmonaut_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["u", "v"]
    )
    assert kcore(chain, k=3).count() == 0
    with pytest.raises(RuntimeError, match="fixpoint"):
        # k=2 on a chain peels one pendant pair per round: 8 edges need
        # ~4 rounds; 1 is not enough and must not silently truncate
        kcore(chain, k=2, max_rounds=1)


# ---------------------------------------------------------------------------
# sssp
# ---------------------------------------------------------------------------


def test_sssp_prefers_cheap_long_path(spark):
    """Cost distance != hop distance: a 3-edge path of weight 3 beats the
    1-edge weight-10 shortcut."""
    from gosmonaut_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)], ["u", "v", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r.id: r.dist for r in sssp(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_multi_source_parallel_edges_and_guards(spark):
    """Min over seeds; parallel edges collapse to min weight; negative
    weights and non-convergence raise loudly."""
    from gosmonaut_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 5), (0, 1, 2), (9, 1, 1)], ["u", "v", "w"]
    )
    seeds = spark.createDataFrame([(0,), (9,)], ["id"])
    got = {r.id: r.dist for r in sssp(edges, seeds).collect()}
    assert got[1] == 1  # via seed 9, not the (collapsed) 0->1 weight 2

    with pytest.raises(ValueError, match="non-negative"):
        sssp(
            spark.createDataFrame([(0, 1, -3)], ["u", "v", "w"]),
            spark.createDataFrame([(0,)], ["id"]),
        )
    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], ["u", "v", "w"]
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        sssp(chain, spark.createDataFrame([(0,)], ["id"]), max_rounds=2)


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching the rare query term outranks one matching only the
    corpus-wide common term; docs matching no term are absent."""
    from gosmonaut_spark.functions.indexing import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "zebra walks alone"),
            (2, "the the the the"),
            (3, "the cat sat"),
            (4, "dog runs far"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["zebra", "the"], k=10).collect()
    ranks = {r.doc_id: r.rank for r in out}
    assert 4 not in ranks  # no query term
    assert ranks[1] == 1  # rare 'zebra' (df=1) beats common 'the' (df=2)
    assert set(ranks) == {1, 2, 3}
    # scores strictly ordered by rank
    by_rank = sorted(out, key=lambda r: r.rank)
    assert all(
        a.score >= b.score for a, b in zip(by_rank, by_rank[1:])
    )


def test_bm25_k_truncates_and_ties_break_by_doc_id(spark):
    """k bounds the result; identical docs tie on score -> doc_id order."""
    from gosmonaut_spark.functions.indexing import bm25_topk

    docs = spark.createDataFrame(
        [(i, "same words here") for i in range(5)], ["doc_id", "text"]
    )
    out = sorted(
        bm25_topk(docs, ["same"], k=3).collect(), key=lambda r: r.rank
    )
    assert [r.doc_id for r in out] == [0, 1, 2]


# ---------------------------------------------------------------------------
# SQ8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_roundtrip_error_bound_and_zero_vector(spark):
    """ADC dot vs exact dot differs by at most the quantization step
    (scale/254 per component, triangle inequality over |q|_1); a zero
    vector codes to all zeros with scale 0."""
    from gosmonaut_spark.functions import similarity as S

    rows = [
        (1, [1.0, -2.0, 0.5, 3.0], [0.5, 1.0, -1.0, 2.0]),
        (2, [0.0, 0.0, 0.0, 0.0], [0.5, 1.0, -1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, ["id", "tv", "qv"]).select(
        "id",
        "qv",
        "tv",
        S.sq8_scale(F.col("tv")).alias("scale"),
        S.sq8_codes(F.col("tv"), S.sq8_scale(F.col("tv"))).alias("codes"),
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            "scale",
            "codes",
            S.sq8_adc_dot(F.col("qv"), F.col("codes"), F.col("scale")).alias(
                "adc"
            ),
            S.dot(F.col("qv"), F.col("tv")).alias("exact"),
        ).collect()
    }
    r1 = out[1]
    # max per-component quantization error = scale/127/2; |q|_1 = 4.5
    bound = r1.scale / 127.0 / 2.0 * 4.5 + 1e-12
    assert abs(r1.adc - r1.exact) <= bound
    assert out[2].scale == 0.0
    assert list(out[2].codes) == [0, 0, 0, 0]
    assert out[2].adc == 0.0


# ---------------------------------------------------------------------------
# resample_track
# ---------------------------------------------------------------------------


def test_resample_track_linear_grid(spark):
    """Half-open grid: epochs in [first, last) each exactly once, linear
    interpolation, a fix ON a grid epoch reproduced exactly."""
    from gosmonaut_spark.operators.trajectory import resample_track

    pts = spark.createDataFrame(
        [
            ("a", 0, 0.0, 0.0),
            ("a", 100, 10.0, -10.0),
            ("a", 130, 13.0, -13.0),
        ],
        ["key", "ms", "lat", "lon"],
    )
    out = {
        r.grid_ms: (r.lat, r.lon)
        for r in resample_track(pts, step_ms=30).collect()
    }
    # grid epochs 0,30,60,90 in [0,100); 120 in [100,130); 130 excluded
    assert sorted(out) == [0, 30, 60, 90, 120]
    assert out[0] == (0.0, 0.0)  # fix exactly on the grid
    assert out[30] == (3.0, -3.0)
    assert out[90] == (9.0, -9.0)
    lat120 = 10.0 + (13.0 - 10.0) * (20.0 / 30.0)
    assert abs(out[120][0] - lat120) < 1e-12


def test_resample_track_single_fix_emits_nothing(spark):
    """One fix = no segment = no grid rows (no fabricated positions)."""
    from gosmonaut_spark.operators.trajectory import resample_track

    pts = spark.createDataFrame(
        [("a", 50, 1.0, 2.0)], ["key", "ms", "lat", "lon"]
    )
    assert resample_track(pts, step_ms=10).count() == 0


def test_personalized_pagerank_laws(spark):
    """PPR against a python power-iteration twin on a small digraph:
    exact law match at round-9, seed locality (non-seed component
    unreachable from seeds gets ZERO rank), and mass conservation."""
    from gosmonaut_spark.operators.graph import personalized_pagerank

    # two components: {0,1,2} cycle (seeded) and {10,11} (unseeded);
    # 2 also dangles into 3 (sink -> dangling mass back to seeds)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r.id: round(r.pr, 9)
        for r in personalized_pagerank(e, seeds, iters=6, damping=0.85).collect()
    }

    nodes = sorted({x for ed in edges for x in ed})
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    sv = {v: (1.0 if v == 0 else 0.0) for v in nodes}
    pr = dict(sv)
    for _ in range(6):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / outd[s]
        dmass = sum(pr[v] for v in nodes if v not in outd)
        pr = {
            v: (1 - 0.85) * sv[v] + 0.85 * (contrib[v] + dmass * sv[v])
            for v in nodes
        }
    want = {v: round(p, 9) for v, p in pr.items()}
    assert got == want
    # locality: the unseeded, unreachable component holds zero rank
    assert got[10] == 0.0 and got[11] == 0.0
    # mass conservation (dangling recycled to seeds): total == 1
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    # empty seeds refuse loudly
    import pytest

    with pytest.raises(ValueError, match="empty seed"):
        personalized_pagerank(
            e, spark.createDataFrame([], "id long"), iters=1
        )


def test_silhouette_separated_vs_overlapping(spark):
    """Two orthogonal tight clusters → mean silhouette near 1; points
    equidistant from both centroids → near 0."""
    from gosmonaut_spark.functions.similarity import silhouette_simplified
    from pyspark.sql import functions as F

    dim = 4
    tight = [
        (i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)
    ] + [(10 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(5)]
    pts = spark.createDataFrame(tight, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id long, centroid array<double>",
    )
    rows = silhouette_simplified(pts, cents, dim=dim).collect()
    assert all(r["mean_silhouette"] > 0.99 for r in rows)

    mixed = spark.createDataFrame(
        [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    rows2 = silhouette_simplified(mixed, cents, dim=dim).collect()
    assert all(abs(r["mean_silhouette"]) < 1e-9 for r in rows2)
