"""Semantics tests for the round-3 additions: conversion funnel,
repetition signals, and corpus-frequency boilerplate strip — brute-force
hand-computed expectations on tiny inline data (the cross-engine value
checks live in test_queries_oracle.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gosmonaut_spark.functions.text import repetition_stats, strip_high_df_tokens
from gosmonaut_spark.operators.funnel import window_funnel


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_window_funnel_depths(spark):
    rows = [
        # u1: full funnel in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE click -> depth 2
        (2, _ts(0), "view"), (2, _ts(1), "purchase"), (2, _ts(2), "click"),
        # u3: click only (no view) -> depth 0
        (3, _ts(0), "click"), (3, _ts(1), "purchase"),
        # u4: click at the SAME ts as view -> strict > excludes it
        (4, _ts(0), "view"), (4, _ts(0), "click"),
        # u5: unrelated event only -> depth 0
        (5, _ts(0), "error"),
        # u6: two views; funnel anchors on the EARLIEST view
        (6, _ts(5), "view"), (6, _ts(1), "view"), (6, _ts(3), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: (r.funnel_depth, r.t0, r.t1, r.t2)
        for r in window_funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1] == (3, _ts(0), _ts(1), _ts(2))
    assert out[2] == (2, _ts(0), _ts(2), None)
    assert out[3] == (0, None, None, None)
    assert out[4] == (1, _ts(0), None, None)
    assert out[5] == (0, None, None, None)
    assert out[6] == (2, _ts(1), _ts(3), None)


def test_window_funnel_within_ms(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(0, 30), "click"),   # 30s gap: inside
        (2, _ts(0), "view"), (2, _ts(2), "click"),       # 120s gap: outside
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: r.funnel_depth
        for r in window_funnel(ev, ["view", "click"], within_ms=60_000).collect()
    }
    assert out == {1: 2, 2: 1}


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # 4 tokens, 2 distinct, top 'a'=3;
                                     # bigrams: 'a a'x2, 'a b' -> top 2/3
            (2, "x y z"),            # no repetition; bigrams unique
            (3, ""),                 # empty -> all zeros
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.n_distinct_tokens, r1.top_token_count) == (4, 2, 3)
    assert r1.dup_token_ratio == 0.5
    assert r1.top_token_ratio == 0.75
    assert (r1.top_bigram_count, r1.top_bigram_ratio) == (2, 2.0 / 3.0)
    r2 = out[2]
    assert (r2.n_tokens, r2.dup_token_ratio, r2.top_token_count) == (3, 0.0, 1)
    r3 = out[3]
    assert (r3.n_tokens, r3.dup_token_ratio, r3.top_bigram_ratio) == (0, 0.0, 0.0)


def test_strip_high_df_tokens_order_and_empty(spark):
    # 'the' appears in 3/4 docs (df 0.75 > 0.5) -> stripped everywhere;
    # every other token survives in original position order
    docs = spark.createDataFrame(
        [
            (1, "the quick fox the end"),
            (2, "the lazy dog"),
            (3, "the the the"),
            (4, "no stop words here"),
        ],
        "doc_id long, text string",
    )
    out = dict(
        strip_high_df_tokens(docs, max_df_frac=0.5)
        .select("doc_id", "clean_text")
        .collect()
    )
    assert out[1] == "quick fox end"
    assert out[2] == "lazy dog"
    assert out[3] == ""          # fully stripped doc still present, empty
    assert out[4] == "no stop words here"


# ---------------------------------------------------------------------------
# RFM / readability / length histogram (round-4 additions)
# ---------------------------------------------------------------------------


def test_rfm_scores_hand_graph(spark):
    """4 users, n_tiles=2: known recency/frequency/monetary ordering →
    known tile assignments (earlier groups get the extra row)."""
    from gosmonaut_spark.operators.rolling import rfm_segments

    day = 86_400_000
    rows = []
    # u1: 3 events, last at day 10, cents 300; u2: 1 @ day 9, 1000;
    # u3: 2 @ day 8, 50; u4: 1 @ day 1, 500
    rows += [(1, 8 * day, 1.0), (1, 9 * day, 1.0), (1, 10 * day, 1.0)]
    rows += [(2, 9 * day, 10.0)]
    rows += [(3, 7 * day, 0.25), (3, 8 * day, 0.25)]
    rows += [(4, 1 * day, 5.0)]
    ev = spark.createDataFrame(rows, "user_id long, ms long, value double")
    got = {
        r["user"]: r for r in rfm_segments(ev, n_tiles=2).collect()
    }
    assert got[1]["recency_days"] == 0 and got[4]["recency_days"] == 9
    # recency order: u1(0), u2(1), u3(2), u4(9) → r tiles [1,1,2,2]
    assert (got[1]["r"], got[2]["r"], got[3]["r"], got[4]["r"]) == (1, 1, 2, 2)
    # frequency: u1=3, u3=2, u2=1, u4=1 (tie→user asc) → f [1,1,2,2]
    assert (got[1]["f"], got[3]["f"], got[2]["f"], got[4]["f"]) == (1, 1, 2, 2)
    # monetary cents: u2=1000, u4=500, u1=300, u3=50 → m [1,1,2,2]
    assert (got[2]["m"], got[4]["m"], got[1]["m"], got[3]["m"]) == (1, 1, 2, 2)
    assert got[1]["segment"] == 100 + 10 + got[1]["m"]


def test_readability_hand_counts(spark):
    from gosmonaut_spark.functions.text import readability

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "no punctuation here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(docs).collect()}
    assert got[1]["n_words"] == 6 and got[1]["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a = 6
    assert got[1]["n_syllables"] == 6
    f = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(got[1]["flesch"] - f) < 1e-12
    assert got[2]["n_sentences"] == 1  # min-1 law


def test_length_histogram_boundaries(spark):
    """Lengths 0,1,2,3,4 land in buckets 0,1,2,2,3 — power-of-two
    boundaries exact by the threshold-sum construction."""
    from gosmonaut_spark.functions.corpus import length_histogram

    docs = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,)], "n_chars long"
    )
    rows = {r["bucket"]: r for r in length_histogram(docs).collect()}
    assert rows[0]["n_docs"] == 1 and rows[0]["lo_chars"] == 0
    assert rows[1]["n_docs"] == 1
    assert rows[2]["n_docs"] == 2 and rows[2]["lo_chars"] == 2 and rows[2]["hi_chars"] == 3
    assert rows[3]["n_docs"] == 1
    assert rows[3]["cum_docs"] == 5
    assert abs(rows[2]["doc_share"] - 0.4) < 1e-15


def test_rfm_scale_boundary_law(spark):
    """8 users, n_tiles=4: boundaries at ranks 2,4,6 — scores follow the
    exact ceil(j*n/k) rank cut, fully pinned."""
    from gosmonaut_spark.operators.rolling import rfm_segments_scale

    day = 86_400_000
    rows = [(u, (10 - u) * day, float(u)) for u in range(1, 9)]
    ev = spark.createDataFrame(rows, "user_id long, ms long, value double")
    got = {r["user"]: r for r in rfm_segments_scale(ev, n_tiles=4).collect()}
    # ms = (10-u)*day: user 1 has the LATEST ms -> most recent -> r asc by u
    assert [got[u]["r"] for u in range(1, 9)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # monetary: user 8 biggest -> m same pattern
    assert [got[u]["m"] for u in range(8, 0, -1)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # frequency all ties -> rank by user asc -> f = 1,1,2,2,3,3,4,4 by user
    assert [got[u]["f"] for u in range(1, 9)] == [1, 1, 2, 2, 3, 3, 4, 4]
