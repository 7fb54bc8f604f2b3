"""Deterministic sampling, interval join, tf-idf, polygon metrics.

Oracles: pure-Python brute force for the interval join and polygon
shoelace (re-derived with independent arithmetic), python hashlib.md5 for
the samplers (independent of both engines' md5), and a hand-rolled
tf/df counter for tf-idf. The DuckDB cross-engine twins additionally run
via the driver correctness gate (queries.py entries).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gosmonaut_spark.functions.sampling import (
    hash_split,
    hash_uniform,
    stratified_sample,
    weighted_sample,
)
from gosmonaut_spark.operators.interval import interval_join


def _py_uniform(val, salt: str) -> float:
    h = hashlib.md5((salt + str(val)).encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_hash_uniform_matches_python_md5(spark):
    df = spark.range(0, 200).select(
        F.col("id"), hash_uniform("id", "s1").alias("u")
    )
    for r in df.collect():
        assert r.u == pytest.approx(_py_uniform(r.id, "s1"), abs=0.0), r.id


def test_stratified_sample_membership_is_pure(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(500), "lang": [["en", "de", "zh"][i % 3] for i in range(500)]}
    )
    df = spark.createDataFrame(pdf)
    rates = {"en": 0.7, "de": 0.3, "zh": 0.0}
    got = {r.doc_id for r in stratified_sample(df, "lang", rates, "doc_id").collect()}
    want = {
        i
        for i in range(500)
        if _py_uniform(i, "strat") < rates[["en", "de", "zh"][i % 3]]
    }
    assert got == want
    assert not any(i % 3 == 2 for i in got)  # zh rate 0 -> excluded
    # repartitioning must not change membership (the df.sample failure mode)
    got2 = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(13), "lang", rates, "doc_id"
        ).collect()
    }
    assert got2 == got


def test_weighted_sample_inclusion_proportional(spark):
    pdf = pd.DataFrame({"doc_id": range(2000), "w": [(i % 100) + 1 for i in range(2000)]})
    df = spark.createDataFrame(pdf)
    kept = weighted_sample(df, "w", "doc_id", scale=0.005).collect()
    want = {
        i for i in range(2000) if _py_uniform(i, "wt") < min(1.0, ((i % 100) + 1) * 0.005)
    }
    assert {r.doc_id for r in kept} == want
    # heavier rows must be sampled at a visibly higher rate
    hi = sum(1 for r in kept if r.w > 80) / sum(1 for i in range(2000) if i % 100 + 1 > 80)
    lo = sum(1 for r in kept if r.w <= 20) / sum(1 for i in range(2000) if i % 100 + 1 <= 20)
    assert hi > lo


def test_hash_split_fractions_and_stability(spark):
    fracs = {"train": 0.8, "valid": 0.1, "test": 0.1}
    df = spark.range(0, 5000).select("id", hash_split("id", fracs).alias("split"))
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] / 5000 == pytest.approx(0.8, abs=0.03)
    # growing the corpus never reassigns an existing row's split
    small = {r.id: r.split for r in df.where(F.col("id") < 1000).collect()}
    again = {
        r.id: r.split
        for r in spark.range(0, 1000)
        .select("id", hash_split("id", fracs).alias("split"))
        .collect()
    }
    assert small == again
    with pytest.raises(ValueError):
        hash_split("id", {"a": 0.5, "b": 0.6})


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------


def _brute_interval(points, intervals, keyed: bool):
    out = []
    for pid, pk, t in points:
        for iid, ik, s, e in intervals:
            if (not keyed or pk == ik) and s <= t < e:
                out.append((pid, iid))
    return sorted(out)


@pytest.mark.parametrize("keyed", [False, True])
def test_interval_join_matches_bruteforce(spark, keyed):
    import random

    rng = random.Random(7)
    points = [(i, i % 3, rng.randrange(0, 100_000)) for i in range(400)]
    intervals = []
    for j in range(40):
        s = rng.randrange(0, 95_000)
        intervals.append((j, j % 3, s, s + rng.randrange(1, 20_000)))
    p = spark.createDataFrame(
        pd.DataFrame(points, columns=["pid", "pk", "ts_ms"]).astype("int64")
    )
    iv = spark.createDataFrame(
        pd.DataFrame(intervals, columns=["iid", "ik", "start_ms", "end_ms"]).astype(
            "int64"
        )
    )
    if keyed:
        iv = iv.withColumnRenamed("ik", "pk")
    got = interval_join(
        p,
        iv.drop("ik") if not keyed else iv,
        point_ts="ts_ms",
        on="pk" if keyed else None,
        bucket_ms=7_000,
    )
    got_pairs = sorted((r.pid, r.iid) for r in got.collect())
    assert got_pairs == _brute_interval(points, intervals, keyed)


def test_interval_join_edge_semantics(spark):
    # half-open [start, end): boundary points, empty + cell-straddling ivs
    p = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3], "ts_ms": [100, 200, 199]}).astype("int64")
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {"iid": [10, 11], "start_ms": [100, 150], "end_ms": [200, 150]}
        ).astype("int64")
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(p, iv, bucket_ms=64).collect()
    )
    # start inclusive (1,10); end exclusive (2,10 absent); zero-length iv
    # dropped; 199 straddles cells but matches once
    assert got == [(1, 10), (3, 10)]


def test_interval_join_explosion_guard(spark):
    p = spark.createDataFrame(pd.DataFrame({"pid": [1], "ts_ms": [5]}).astype("int64"))
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [1], "start_ms": [0], "end_ms": [10_000_000]}).astype(
            "int64"
        )
    )
    with pytest.raises(Exception, match="interval_join"):
        interval_join(p, iv, bucket_ms=10, max_cells_per_interval=100).collect()


# ---------------------------------------------------------------------------
# tf-idf and polygon stats (python oracles)
# ---------------------------------------------------------------------------


def test_tfidf_top_terms_against_counter(spark):
    from collections import Counter

    from gosmonaut_spark.functions.corpus import tfidf_top_terms

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog ate the cat food"),
        (2, "quantum flux capacitors emit flux"),
        (3, ""),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = tfidf_top_terms(df, k=2).collect()
    toks = {i: t.lower().split() for i, t in docs}
    dfreq = Counter(w for ws in toks.values() for w in set(ws))
    for r in got:
        tf = Counter(toks[r.doc_id])
        assert r.tf == tf[r.term]
        assert r.df == dfreq[r.term]
        assert r.tfidf_raw == pytest.approx(r.tf * 4 / r.df)
    # rank 1 for doc 2 is 'flux' (tf 2); empty doc contributes no rows
    top = {r.doc_id: r.term for r in got if r.rank == 1}
    assert top[2] == "flux"
    assert 3 not in {r.doc_id for r in got}


def test_polygon_stats_shoelace(spark):
    from gosmonaut_spark.functions.geo import polygon_stats

    # unit square CCW: 2A = 2.0; centroid (0.5, 0.5):
    # cx_num/(3*area2x) = 3e6/(3*2e6) = 0.5
    ring = pd.DataFrame(
        {
            "pid": [1],
            "lats": [[0.0, 0.0, 1.0, 1.0, 0.0]],
            "lons": [[0.0, 1.0, 1.0, 0.0, 0.0]],
        }
    )
    df = spark.createDataFrame(ring)
    st = polygon_stats("lats", "lons")
    r = df.select(
        st["n_vertices"].alias("nv"),
        st["area2x_micro"].alias("a2"),
        st["cx_num_micro"].alias("cx"),
        st["cy_num_micro"].alias("cy"),
    ).collect()[0]
    assert (r.nv, r.a2) == (4, 2_000_000)
    assert r.cx / (3.0 * r.a2) == pytest.approx(0.5)
    assert r.cy / (3.0 * r.a2) == pytest.approx(0.5)
    # clockwise ring -> negative signed area
    cw = pd.DataFrame(
        {
            "pid": [1],
            "lats": [[0.0, 1.0, 1.0, 0.0, 0.0]],
            "lons": [[0.0, 0.0, 1.0, 1.0, 0.0]],
        }
    )
    r2 = (
        spark.createDataFrame(cw)
        .select(polygon_stats("lats", "lons")["area2x_micro"].alias("a2"))
        .collect()[0]
    )
    assert r2.a2 == -2_000_000


def test_quota_sample_per_group_cap_and_stability(spark):
    from gosmonaut_spark.functions.sampling import quota_sample

    rows = [(f"host{i % 5}", i) for i in range(100)] + [("tiny", 1000), ("tiny", 1001)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = quota_sample(df, "source", "doc_id", k=7)
    got = sorted((r.source, r.doc_id) for r in out.collect())

    # cap respected; small groups pass through whole
    from collections import Counter

    per = Counter(s for s, _ in got)
    assert all(v <= 7 for v in per.values())
    assert per["tiny"] == 2
    assert all(per[f"host{g}"] == 7 for g in range(5))
    # subset of input
    assert set(got) <= {(s, i) for s, i in rows}

    # membership is a pure row function: invariant to partitioning AND
    # to other groups growing (the property random-sort quotas lack)
    re = quota_sample(df.repartition(13), "source", "doc_id", k=7)
    assert sorted((r.source, r.doc_id) for r in re.collect()) == got
    grown = df.union(
        spark.createDataFrame([("newhost", 5000 + j) for j in range(20)],
                              "source string, doc_id long")
    )
    g2 = quota_sample(grown, "source", "doc_id", k=7)
    kept_old = sorted((r.source, r.doc_id) for r in g2.collect()
                      if r.source != "newhost")
    assert kept_old == got


def test_mix_apportion_exact_budget_and_hamilton_law(spark):
    """Random group sizes: Σ quota == budget exactly and every quota
    matches the independent python largest-remainder computation."""
    import random

    from gosmonaut_spark.functions.sampling import mix_apportion

    random.seed(11)
    rows = [(f"s{i:02d}", random.randint(1, 10**12)) for i in range(23)]
    budget = 5_000_007
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {r["source"]: r["quota"] for r in mix_apportion(df, budget).collect()}
    assert sum(got.values()) == budget
    tot = sum(n for _, n in rows)
    fl = {k: budget * n // tot for k, n in rows}
    rems = sorted(
        (((budget * n) % tot), k) for k, n in rows
    )
    left = budget - sum(fl.values())
    for _r, k in sorted(rems, key=lambda x: (-x[0], x[1]))[:left]:
        fl[k] += 1
    assert got == fl


def test_busy_time_overlap_merge_law(spark):
    """Overlapping [0,10]+[5,15] count once (15), nested [20,30]+[22,25]
    add nothing, zero-length and inverted intervals add 0."""
    from gosmonaut_spark.operators.rolling import busy_time

    iv = spark.createDataFrame(
        [
            (1, 0, 10), (1, 5, 15), (1, 20, 30), (1, 22, 25),
            (2, 0, 0), (2, 10, 5),
        ],
        "user_id long, start_ms long, end_ms long",
    )
    got = {r["user_id"]: r for r in busy_time(iv).collect()}
    assert got[1]["busy_ms"] == 25 and got[1]["n_intervals"] == 4
    assert got[2]["busy_ms"] == 0 and got[2]["n_intervals"] == 2


def test_survival_curve_dense_and_monotone(spark):
    """3 users with lifetimes 0,0,2 weeks → survival 1.0, 1/3, 1/3 at
    offsets 0..2, dense zeros beyond."""
    from gosmonaut_spark.operators.rolling import survival_curve

    wk = 604_800_000
    ev = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (3, 2 * wk)],
        "user_id long, ms long",
    )
    rows = {r["week_offset"]: r for r in survival_curve(ev, max_weeks=4).collect()}
    assert len(rows) == 5
    assert rows[0]["n_surviving"] == 3 and abs(rows[0]["survival"] - 1.0) < 1e-15
    assert rows[1]["n_surviving"] == 1 and rows[2]["n_surviving"] == 1
    assert rows[3]["n_surviving"] == 0 and rows[4]["survival"] == 0.0


def test_daily_autocorr_planted_period(spark):
    """Alternating heavy/light days (period 2): ACF strongly negative at
    lag 1, strongly positive at lag 2; dense spine fills silent days."""
    from gosmonaut_spark.operators.rolling import daily_autocorr

    day = 86_400_000
    rows = []
    eid = 0
    for d in range(20):
        n = 10 if d % 2 == 0 else 1
        for _ in range(n):
            rows.append((d * day + eid % 1000,))
            eid += 1
    ev = spark.createDataFrame(rows, "ms long")
    got = {r["lag"]: r for r in daily_autocorr(ev, max_lag=3).collect()}
    assert got[1]["acf"] < -0.8 and got[2]["acf"] > 0.8
    assert got[1]["n_pairs"] == 19 and got[3]["n_pairs"] == 17


def test_metronome_planted_bot_vs_human(spark):
    """A perfectly ticking key is flagged; a jittery key is not; a
    3-gap key is unjudged (NULL flag)."""
    from gosmonaut_spark.operators.rolling import metronome_users

    rows = []
    rows += [(1, 1000 * i, i) for i in range(20)]            # exact 1s tick
    rows += [(2, v, 100 + i) for i, v in enumerate(
        [0, 300, 5000, 5600, 21000, 22000, 40000, 90000])]   # bursty
    rows += [(3, v, 200 + i) for i, v in enumerate([0, 10, 20, 30])]
    ev = spark.createDataFrame(rows, "user_id long, ms long, event_id long")
    got = {r["user_id"]: r for r in metronome_users(ev).collect()}
    assert got[1]["is_metronome"] == 1 and got[1]["cv"] == 0.0
    assert got[2]["is_metronome"] == 0 and got[2]["cv"] > 0.5
    assert got[3]["is_metronome"] is None and got[3]["n_gaps"] == 3


def test_cusum_hand_sequence(spark):
    """target 100, slack 0, threshold 250: values 200,200,200 drive
    S = 100, 200, 300 → alarm at the third event, then reset; a steady
    key at target never alarms (first_alarm_ms = -1)."""
    from gosmonaut_spark.operators.rolling import cusum_alarms

    rows = [(1, 1000 * i, i, 2.0) for i in range(5)]
    rows += [(2, 1000 * i, 10 + i, 1.0) for i in range(5)]
    ev = spark.createDataFrame(
        rows, "user_id long, ms long, event_id long, value double"
    )
    got = {r["key"]: r for r in cusum_alarms(
        ev, target_cents=100, slack_cents=0, threshold_cents=250
    ).collect()}
    assert got["1"]["n_alarms"] == 1 and got["1"]["first_alarm_ms"] == 2000
    assert got["1"]["max_s"] == 300
    assert got["2"]["n_alarms"] == 0 and got["2"]["first_alarm_ms"] == -1


def test_metronome_overflow_guard_raises(spark):
    """Gap magnitudes that would overflow the DECIMAL(38,0) flag law
    must raise loudly (ADVICE r4) instead of silently NULLing the
    is_metronome bit: with ANSI off Spark returns NULL for decimal
    overflow, which reads as 'not judged' — a bot slips through. Gaps
    of ~9e17 ms across 6 events push 10^4*n*sum(g^2) past 1e38."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from gosmonaut_spark.operators.rolling import metronome_users

    big = 9_000_000_000_000_000_00  # 9e17 ms per gap
    rows = [(1, big * i, i) for i in range(7)]
    ev = spark.createDataFrame(rows, "user_id long, ms long, event_id long")
    with pytest.raises(SparkRuntimeException, match="metronome_users"):
        metronome_users(ev).collect()


def test_ring_orientation_signs(spark):
    """Hand rings: ccw unit square, the same square reversed (cw), and a
    flat 3-point degenerate 'ring' — the synthetic pages world only
    generates ccw rings, so the sign branches need explicit coverage."""
    from gosmonaut_spark.functions.geo import ring_orientation

    rows = [
        (1, [0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0]),  # ccw
        (2, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]),  # cw
        (3, [0.0, 0.0, 0.0], [0.0, 5.0, 0.0]),                      # flat
    ]
    df = spark.createDataFrame(
        rows, "id long, lats array<double>, lons array<double>"
    )
    got = {
        r.id: r.o
        for r in df.select("id", ring_orientation("lats", "lons").alias("o")).collect()
    }
    assert got == {1: "ccw", 2: "cw", 3: "degenerate"}


def test_clip_rings_rect_hand_triangle(spark):
    """Sutherland–Hodgman vs hand geometry on BOTH engines: triangle
    (0,0),(2,0),(0,2) clipped to [0,1]² is the unit square (the corner
    (1,1) lies ON the hypotenuse and survives the inclusive inside
    test): 2·area = 2.0 → 2,000,000 micro-units; a fully-outside ring
    clips to empty."""
    import duckdb

    from gosmonaut_spark.functions.geo import (
        clip_rings_rect,
        clip_rings_rect_sql,
        polygon_stats,
        polygon_stats_sql,
    )

    rows = [
        (1, [0.0, 0.0, 2.0, 0.0], [0.0, 2.0, 0.0, 0.0]),
        (2, [5.0, 5.0, 6.0, 5.0], [5.0, 6.0, 5.0, 5.0]),  # outside
    ]
    df = spark.createDataFrame(
        rows, "polygon_id long, lats array<double>, lons array<double>"
    )
    c = clip_rings_rect(df, 0.0, 1.0, 0.0, 1.0)
    st = polygon_stats("lats", "lons")
    got = {
        r.polygon_id: (r.nv, r.a2)
        for r in c.where(F.size("lats") > 0)
        .select(
            "polygon_id",
            F.size("lats").alias("nv"),
            st["area2x_micro"].alias("a2"),
        )
        .collect()
    }
    assert got == {1: (6, 2_000_000)}

    src = (
        "SELECT * FROM (VALUES "
        "(1, [0.0, 0.0, 2.0, 0.0], [0.0, 2.0, 0.0, 0.0]), "
        "(2, [5.0, 5.0, 6.0, 5.0], [5.0, 6.0, 5.0, 5.0])"
        ") t(polygon_id, lats, lons)"
    )
    pst = polygon_stats_sql("lats", "lons")
    dgot = duckdb.sql(
        f"SELECT polygon_id, len(lats) AS nv, {pst['area2x_micro']} AS a2 "
        f"FROM ({clip_rings_rect_sql(src, 0.0, 1.0, 0.0, 1.0, extra_cols='polygon_id,')}) "
        f"WHERE len(lats) > 0"
    ).fetchall()
    assert dgot == [(1, 6, 2_000_000)]
