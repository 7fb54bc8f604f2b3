"""End-to-end corpus cleaning: the composite every training-data pipeline
runs, assembled from this engine's primitives in one declarative plan.

    quality/language gate  ->  exact dedup  ->  fuzzy dedup (minhash-LSH
    pairs -> connected components -> keep the cluster minimum)

Plan shape (100 TB lens):
* the gate is pure native expressions (lang_id / quality_features) — it
  rides the scan, prunes before any shuffle;
* exact dedup is ONE keyed window (min id per content fingerprint) — no
  roster materialization, no join back;
* fuzzy dedup only ever touches LSH band-collision candidates (linear-ish
  at corpus scale) and the CC rounds run on the PAIR table, not the
  corpus; survivors are removed with a left-anti join (no row growth).

Every stage is individually oracle-checked elsewhere (text_quality,
text_lang_id, dedup_exact_groups, dedup_minhash_lsh, dedup_cluster_reps);
the composite has its own end-to-end DuckDB twin in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs
from .text import (
    content_fingerprint,
    lang_id,
    ngrams,
    ngrams_sql,
    quality_features,
    tokens,
    tokens_sql,
)

__all__ = ["clean_corpus", "tfidf_top_terms", "collocations_pmi", "collocations_pmi_sql"]


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    min_alnum_ratio: float = 0.5,
    min_stop_ratio: float = 0.01,
    minhash_threshold: float = 0.5,
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Return the cleaned corpus: original columns of every document that
    (a) passes the language + quality gate, (b) is the minimum-id copy of
    its exact-content group, and (c) is the minimum-id member of its
    near-duplicate cluster. Deterministic: every tiebreak is min(id)."""
    text = F.col(text_col)
    feats = quality_features(text)
    gated = docs.where(
        lang_id(text).isin(*langs)
        & (feats["n_tokens"] >= F.lit(int(min_tokens)))
        & (feats["alnum_ratio"] >= F.lit(float(min_alnum_ratio)))
        & (feats["stop_ratio"] >= F.lit(float(min_stop_ratio)))
    )
    # exact dedup: one keyed window, min id per fingerprint
    wfp = Window.partitionBy("_fp")
    exact = (
        gated.withColumn("_fp", content_fingerprint(text))
        .withColumn("_min_id", F.min(id_col).over(wfp))
        .where(F.col(id_col) == F.col("_min_id"))
        .drop("_fp", "_min_id")
    )
    # the exact survivors feed TWO consumers (the minhash signature pass
    # and the final left-anti) — materialize once instead of running the
    # gate + fingerprint window twice. Lazy localCheckpoint: snapshots on
    # first use, truncates lineage for the CC rounds downstream; at
    # cluster scale swap for a reliable checkpoint dir (same pass-
    # snapshot discipline as plans/checkpoint.py).
    exact = exact.localCheckpoint(eager=False)
    # fuzzy dedup on the exact survivors only
    from ..operators.graph import connected_components

    pairs = minhash_lsh_pairs(
        exact.select(F.col(id_col).alias("doc_id"), text.alias("text")),
        threshold=minhash_threshold,
        n_hashes=n_hashes,
        n_bands=n_bands,
        n=shingle_n,
    )
    cc = connected_components(pairs, "a", "b")
    losers = cc.where(F.col("id") != F.col("component")).select("id")
    return exact.join(
        losers, exact[id_col] == losers["id"], "left_anti"
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Returns (id, term, tf, df, tfidf_raw, rank): term frequency within the
    document, document frequency across the corpus, the raw-inverse-
    frequency score tf * N / df, and the per-document rank.

    Determinism: ranking never touches the double score — ties are broken
    by (tf DESC, df ASC, term ASC), all integer/string comparisons, and
    the score itself is one multiply + one divide of exact integers
    (cross-engine bit-identical). A log-idf would hang correctness on two
    engines' libm — raw inverse frequency keeps the oracle exact and
    preserves the ranking semantics (log is monotone in N/df).

    Plan shape (100 TB lens): explode-once wordcount — tf is one
    hash-aggregate on (id, term), df one on (term); df joins back on the
    term key (AQE broadcasts it when small); N arrives via a broadcast
    1-row cross join, never a driver collect. The final top-k is a bounded
    per-document window.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.select(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy("_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf_raw",
            F.col("tf").cast("double") * F.col("_n") / F.col("df"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.lit(int(k)))
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf_raw", "rank"
        )
    )


def collocations_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining by pointwise mutual information: adjacent word
    pairs whose co-occurrence beats the independence expectation — the
    standard phrase-detection pass (word2vec-style phrase joining, index
    bigram selection) over a web corpus.

    Returns ``(w1, w2, n_pair, n_w1, n_w2, pmi_ratio)`` for pairs with
    ``n_pair >= min_count``; ``pmi_ratio`` is the PMI argument
    P(xy) / (P(x)P(y)) = (n_pair * N * N) / (B * n_w1 * n_w2) WITHOUT the
    log — log is monotone, so ranking semantics are preserved while the
    score stays one fixed-order chain of double mults + one division on
    exact integers (bit-identical cross-engine; a log would hang
    correctness on two libms, the same reasoning as tf-idf's raw score).

    Plan shape (100 TB lens): one bigram hash agg + one unigram hash agg
    (both map-side combinable, key space = vocab not corpus), two
    term-keyed joins (AQE broadcasts the unigram side when small), and
    the N/B totals as broadcast 1-row cross joins — never a driver
    collect. ``min_count`` prunes the long tail BEFORE the joins.
    """
    toks = docs.select(F.explode(tokens(text_col)).alias("t"))
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n_uni"))
    big_all = docs.select(
        F.explode(ngrams(text_col, 2)).alias("bg")
    ).groupBy("bg").agg(F.count(F.lit(1)).alias("n_pair"))
    n_tok = uni.agg(F.sum("n_uni").alias("n_tokens"))
    n_big = big_all.agg(F.sum("n_pair").alias("n_bigrams"))
    kept = big_all.where(F.col("n_pair") >= F.lit(int(min_count))).select(
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
        "n_pair",
    )
    u1 = uni.select(F.col("t").alias("w1"), F.col("n_uni").alias("n_w1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("n_uni").alias("n_w2"))
    score = (
        F.col("n_pair").cast("double")
        * F.col("n_tokens").cast("double")
        * F.col("n_tokens").cast("double")
    ) / (
        F.col("n_bigrams").cast("double")
        * F.col("n_w1").cast("double")
        * F.col("n_w2").cast("double")
    )
    return (
        kept.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select("w1", "w2", "n_pair", "n_w1", "n_w2", score.alias("pmi_ratio"))
    )


def collocations_pmi_sql(
    docs_sql: str, text_expr: str = "text", min_count: int = 5
) -> str:
    """DuckDB twin — identical count algebra and score op order."""
    return f"""WITH pm_src AS ({docs_sql}),
pm_toks AS (
  SELECT unnest({tokens_sql(text_expr)}) AS t FROM pm_src
),
pm_uni AS (SELECT t, count(*) AS n_uni FROM pm_toks GROUP BY t),
pm_big AS (
  SELECT bg, count(*) AS n_pair FROM (
    SELECT unnest({ngrams_sql(text_expr, 2)}) AS bg FROM pm_src
  ) GROUP BY bg
),
pm_ntok AS (SELECT sum(n_uni) AS n_tokens FROM pm_uni),
pm_nbig AS (SELECT sum(n_pair) AS n_bigrams FROM pm_big),
pm_kept AS (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
         n_pair
  FROM pm_big WHERE n_pair >= {int(min_count)}
)
SELECT k.w1, k.w2, k.n_pair, u1.n_uni AS n_w1, u2.n_uni AS n_w2,
       (CAST(k.n_pair AS DOUBLE) * CAST(t.n_tokens AS DOUBLE)
          * CAST(t.n_tokens AS DOUBLE))
       / (CAST(b.n_bigrams AS DOUBLE) * CAST(u1.n_uni AS DOUBLE)
          * CAST(u2.n_uni AS DOUBLE)) AS pmi_ratio
FROM pm_kept k
JOIN pm_uni u1 ON u1.t = k.w1
JOIN pm_uni u2 ON u2.t = k.w2
CROSS JOIN pm_ntok t CROSS JOIN pm_nbig b"""


def rake_keywords(
    docs: DataFrame,
    stopwords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = Σ length of the phrases it appears in, frequency = its
    occurrence count — both corpus-wide); a phrase scores the sum of
    its words' scores. The classic no-model keyword extractor for a web
    corpus (index terms, tag suggestions, weak topic labels).

    Exactness law: word scores are ONE division of exact integers
    (bit-identical cross-engine); the phrase sum is an explicit
    in-order fold over token position (the ADC-sum discipline), so
    scores AND the (score, phrase) ranking match DuckDB bit-for-bit.

    Plan shape (100 TB lens): phrase segmentation is the sessionize
    run-length law (ONE per-doc window over token position); word
    stats are one hash agg on the word key (vocab-bounded); the score
    join is word-keyed (AQE broadcasts the stats side); per-doc top-k
    is a bounded window. ``stopwords`` is a literal config list riding
    the plan (same contract as geofences/blocklists).

    Returns ``(id, phrase, score, rank)`` — top ``top_k`` per doc,
    ties broken by (phrase ASC, first position ASC).
    """
    stops = F.array(*[F.lit(w) for w in stopwords])
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__w"),
    ).select(
        "__id", "__pos", "__w", F.array_contains(stops, F.col("__w")).alias("__stop")
    )
    wdoc = Window.partitionBy("__id").orderBy(F.col("__pos").asc())
    phrased = toks.select(
        "__id",
        "__pos",
        "__w",
        "__stop",
        F.sum(F.when(F.col("__stop"), 1).otherwise(0))
        .over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__pid"),
    ).where(~F.col("__stop"))
    wph = Window.partitionBy("__id", "__pid")
    ph = phrased.select(
        "__id", "__pid", "__pos", "__w", F.count(F.lit(1)).over(wph).alias("__plen")
    )
    stats = ph.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"), F.sum("__plen").alias("__deg")
    )
    scored = ph.join(stats, "__w").select(
        "__id",
        "__pid",
        "__pos",
        "__w",
        (F.col("__deg").cast("double") / F.col("__freq").cast("double")).alias(
            "__ws"
        ),
    )
    phrases = scored.groupBy("__id", "__pid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("__pos", "__ws"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__ws"],
        ).alias("score"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__w"))),
                lambda x: x["__w"],
            ),
            " ",
        ).alias("phrase"),
        F.min("__pos").alias("__first"),
    )
    wtop = Window.partitionBy("__id").orderBy(
        F.col("score").desc(), F.col("phrase").asc(), F.col("__first").asc()
    )
    return (
        phrases.select(
            F.col("__id").alias(id_col),
            "phrase",
            "score",
            F.row_number().over(wtop).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= F.lit(int(top_k)))
    )


def rake_keywords_sql(
    docs_sql: str,
    stopwords: list[str],
    id_expr: str = "doc_id",
    text_expr: str = "text",
    top_k: int = 3,
) -> str:
    """DuckDB twin — identical run-length/score/fold/rank law."""
    stoplist = ", ".join(f"'{w}'" for w in stopwords)
    return f"""WITH rk_src AS ({docs_sql}),
rk_toks AS (
  SELECT did, pos, w, w IN ({stoplist}) AS isstop
  FROM (
    SELECT {id_expr} AS did,
           generate_subscripts(ts, 1) - 1 AS pos,
           unnest(ts) AS w
    FROM (SELECT {id_expr}, {tokens_sql(text_expr)} AS ts FROM rk_src)
  )
),
rk_ph AS (
  SELECT did, pos, w,
         sum(CASE WHEN isstop THEN 1 ELSE 0 END)
           OVER (PARTITION BY did ORDER BY pos ASC
                 ROWS UNBOUNDED PRECEDING) AS pid,
         isstop
  FROM rk_toks
),
rk_words AS (
  SELECT did, pid, pos, w,
         count(*) OVER (PARTITION BY did, pid) AS plen
  FROM rk_ph WHERE NOT isstop
),
rk_stats AS (
  SELECT w, count(*) AS freq, sum(plen) AS deg FROM rk_words GROUP BY w
),
rk_scored AS (
  SELECT r.did, r.pid, r.pos, r.w,
         CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE) AS ws
  FROM rk_words r JOIN rk_stats s ON s.w = r.w
),
rk_phrases AS (
  SELECT did, pid,
         list_reduce(list_prepend(0.0, list(ws ORDER BY pos)),
                     (a, b) -> a + b) AS score,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         min(pos) AS firstpos
  FROM rk_scored GROUP BY did, pid
),
rk_ranked AS (
  SELECT did, phrase, score,
         CAST(row_number() OVER (PARTITION BY did
              ORDER BY score DESC, phrase ASC, firstpos ASC) AS INTEGER) AS rank
  FROM rk_phrases
)
SELECT did AS {id_expr}, phrase, score, rank
FROM rk_ranked WHERE rank <= {int(top_k)}"""


# ---------------------------------------------------------------------------
# corpus length histogram (power-of-two buckets)
# ---------------------------------------------------------------------------


def length_histogram(
    docs: DataFrame, len_col: str = "n_chars", max_pow: int = 40
) -> DataFrame:
    """Power-of-two length histogram over a corpus →
    ``(bucket, lo_chars, hi_chars, n_docs, total_chars, cum_docs,
    doc_share)`` ordered by bucket.

    The first chart every corpus audit draws (truncation cliffs, crawler
    boilerplate spikes, empty-doc mass) — bucket ``b`` holds lengths in
    ``[2^{b-1}, 2^b)`` (bucket 0 = empty docs). The bucket index is
    computed WITHOUT ``log2``: a sum of 41 integer threshold tests
    (``len ≥ 2^k``), because float ``log2`` sits exactly ON the bucket
    boundaries at powers of two where a one-ulp engine difference flips
    the bucket — the threshold-sum is boundary-exact on both engines by
    construction and still one codegen projection.

    Integer everywhere except the terminal ``doc_share`` division;
    cumulative docs via one ordered window over ≤ ``max_pow`` + 1 rows.

    Scale: one map-side-combined groupBy over the corpus; the window
    runs over the 41-row bucket table — free.
    """
    from pyspark.sql import Window

    ln = F.col(len_col).cast("long")
    bucket = sum(
        (ln >= F.lit(1 << k)).cast("long") for k in range(int(max_pow) + 1)
    )
    agg = (
        docs.select(bucket.alias("bucket"), ln.alias("__len"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("total_chars"),
        )
    )
    tot = agg.agg(F.sum("n_docs").alias("all_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.when(
                F.col("bucket") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("lo_chars"),
            (
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))") - 1
            ).alias("hi_chars"),
            "n_docs",
            "total_chars",
            F.sum("n_docs").over(w).alias("cum_docs"),
            (F.col("n_docs").cast("double") / F.col("all_docs").cast("double")).alias(
                "doc_share"
            ),
        )
        .orderBy("bucket")
    )


def length_histogram_sql(
    docs_sql: str, len_expr: str = "n_chars", max_pow: int = 40
) -> str:
    """DuckDB twin — identical threshold-sum bucket law."""
    tests = " + ".join(
        f"CAST(CAST({len_expr} AS BIGINT) >= {1 << k} AS BIGINT)"
        for k in range(int(max_pow) + 1)
    )
    return f"""WITH lh_src AS ({docs_sql}),
lh_b AS (
  SELECT ({tests}) AS bucket, CAST({len_expr} AS BIGINT) AS len
  FROM lh_src
),
lh_agg AS (
  SELECT bucket, count(*) AS n_docs, sum(len) AS total_chars
  FROM lh_b GROUP BY bucket
)
SELECT bucket,
       CASE WHEN bucket > 0 THEN CAST(1 AS BIGINT) << (bucket - 1)
            ELSE 0 END AS lo_chars,
       (CAST(1 AS BIGINT) << bucket) - 1 AS hi_chars,
       n_docs, CAST(total_chars AS BIGINT) AS total_chars,
       CAST(sum(n_docs) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_docs,
       CAST(n_docs AS DOUBLE)
         / CAST((SELECT sum(n_docs) FROM lh_agg) AS DOUBLE) AS doc_share
FROM lh_agg
ORDER BY bucket"""


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank over the word co-occurrence graph)
# ---------------------------------------------------------------------------


def textrank_keywords(
    docs: DataFrame,
    k: int = 20,
    min_len: int = 4,
    iters: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """TextRank (Mihalcea & Tarau, EMNLP'04) keyword extraction →
    ``(word, score, rank)``, the top ``k`` vocabulary words by PageRank
    over the token co-occurrence graph.

    The graph-centrality upgrade of :func:`rake_keywords` / tf-idf:
    a word matters if it co-occurs with words that matter — corpus-level
    keywords robust to raw frequency (stop-like fillers rank low
    because their neighbors are everywhere, hubs dilute).

    Law: vertices are words of length ≥ ``min_len``; edges join
    ADJACENT tokens of the original sequence where both endpoints
    qualify (window = 2, the TextRank default), undirected with
    co-occurrence-count weights; ranking is the engine's weighted
    :func:`~gosmonaut_spark.operators.graph.pagerank` (fixed ``iters``
    power rounds, dangling redistribution) over the symmetrized edge
    table. Scores compare at ``round(pr, 9)`` (float sums reassociate);
    the top-k window orders by (score DESC, word ASC) — fully pinned.

    Scale shape: one explode over token positions (linear in corpus
    tokens), one canonical-pair count agg, then PageRank over the
    VOCABULARY graph — vertex count is |vocab|, not |corpus|, so the
    iterative part runs on a table orders of magnitude smaller than the
    input. No driver state, no cross join.
    """
    from pyspark.sql import Window

    from ..operators.graph import pagerank
    from .text import tokens

    toks = docs.select(tokens(text_col).alias("t")).where(F.size("t") >= 2)
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, CAST(i AS INT)) AS w1, "
                    "element_at(t, CAST(i AS INT) + 1) AS w2))"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where(
            (F.length("w1") >= int(min_len))
            & (F.length("w2") >= int(min_len))
            & (F.col("w1") != F.col("w2"))
        )
    )
    und = (
        pairs.select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    pr = pagerank(sym, weight="w", iters=int(iters))
    ranked = pr.select(
        F.col("id").alias("word"), F.round("pr", 9).alias("score")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("word"))
        ),
    )
    return ranked.where(F.col("rank") <= int(k)).orderBy("rank")


def textrank_keywords_sql(
    docs_sql: str,
    k: int = 20,
    min_len: int = 4,
    iters: int = 5,
    text_expr: str = "text",
) -> str:
    """DuckDB twin — identical adjacency/filter/weight law feeding the
    unrolled weighted-PageRank CTEs."""
    from ..operators.graph import pagerank_sql
    from .text import tokens_sql

    edges = f"""SELECT a AS src, b AS dst, w FROM (
  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, count(*) AS w FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT {tokens_sql(text_expr)} AS t FROM ({docs_sql})) tr_t,
         LATERAL (SELECT unnest(range(1, len(t))) AS i) tr_i
  ) WHERE length(w1) >= {int(min_len)} AND length(w2) >= {int(min_len)}
        AND w1 != w2
  GROUP BY a, b
)
UNION ALL
SELECT b, a, w FROM (
  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, count(*) AS w FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT {tokens_sql(text_expr)} AS t FROM ({docs_sql})) tr_t2,
         LATERAL (SELECT unnest(range(1, len(t))) AS i) tr_i2
  ) WHERE length(w1) >= {int(min_len)} AND length(w2) >= {int(min_len)}
        AND w1 != w2
  GROUP BY a, b
)"""
    inner = pagerank_sql(edges, iters=int(iters), damping=0.85, weighted=True)
    return f"""SELECT word, score, rank FROM (
  SELECT id AS word, round(pr, 9) AS score,
         CAST(row_number() OVER (ORDER BY round(pr, 9) DESC, id ASC) AS INT)
           AS rank
  FROM (
{inner}
  )
) WHERE rank <= {int(k)}
ORDER BY rank"""
