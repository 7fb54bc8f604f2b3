"""Positional inverted index + phrase search over a document corpus.

A web-corpus engine that tokenizes (``text.py``), fingerprints and
dedups documents eventually needs to FIND things in them: the inverted
index (term → postings with in-document positions) is the retrieval
primitive, and positional phrase search ("these two tokens, adjacent")
is its first consumer — also the exact-match probe used for
decontamination audits ("which training docs contain this benchmark
phrase verbatim?").

Shape (100 TB lens):
* build = one ``posexplode`` over whitespace tokens → ONE hash
  aggregation per (term, doc): partial aggregation combines map-side, so
  the shuffle carries one row per distinct (term, doc), never per token
  occurrence.
* positions are collected then ``sort_array``-ed — plain integers,
  natively orderable, no comparator lambda (the assembly ordered-collect
  law); per-posting state is bounded by the doc's occurrence count.
* hot terms (stopwords) are the skew axis: ``max_df`` drops terms that
  appear in more than a fraction of docs AT THE DF AGG (one tiny
  aggregate + a semi-join), so the posting build never materializes the
  stopword rows — the same document-frequency cap law as
  ``dedup.jaccard`` / ``boilerplate_strip``.
* phrase search touches exactly two postings lists per doc via an
  equi-join on doc_id; adjacency is ``array_intersect(positions₁+1,
  positions₂)`` — per-row array math, no re-explode of the corpus.

Determinism: positions are byte offsets in token order (posexplode),
sorted ascending; every aggregate is a count or a sorted int list.

Reference parity: none — the reference has no text surface; this
extends the graft's corpus family (tf-idf, boilerplate, decontaminate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "inverted_postings",
    "inverted_postings_sql",
    "phrase_match",
    "phrase_match_sql",
    "bm25_topk",
    "bm25_topk_sql",
]


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).where(F.col("term") != "")


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: float | None = None,
    min_tf: int = 1,
) -> DataFrame:
    """Positional postings: one row per (term, doc) with the ordered
    position list and term frequency.

    ``max_df``: drop terms whose document frequency exceeds this fraction
    of the corpus (the stopword/skew cap — a term in 60% of a 10^12-doc
    corpus is a posting list nothing can consume). ``min_tf``: drop
    postings below a term frequency (noise floor).

    Returns ``(term, doc_id, tf, positions array<int>)``.
    """
    toks = _tokens(docs, id_col, text_col)
    posts = (
        toks.groupBy("term", "doc_id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count(F.lit(1)).alias("tf"),
        )
        .where(F.col("tf") >= F.lit(int(min_tf)))
    )
    if max_df is not None:
        n_docs = docs.select(id_col).distinct().count()
        cap = int(max_df * n_docs)
        keep = (
            posts.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= F.lit(cap))
            .select("term")
        )
        posts = posts.join(F.broadcast(keep), "term", "left_semi")
    return posts.select("term", "doc_id", "tf", "positions")


def inverted_postings_sql(
    docs_sql: str, max_df: float | None = None, min_tf: int = 1
) -> str:
    """DuckDB twin of :func:`inverted_postings`. ``docs_sql`` must yield
    ``(doc_id, text)``. Positions use the same 0-based token index as
    ``posexplode(split(...))`` (the LATERAL ``range`` subscript is
    1-based — shifted here)."""
    parts = [
        f"WITH ip_docs AS MATERIALIZED ({docs_sql})",
        """ip_tok AS MATERIALIZED (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ip_docs),
       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) g
  WHERE toks[i] <> ''
)""",
        """ip_posts AS (
  SELECT term, doc_id,
         CAST(count(*) AS BIGINT) AS tf,
         list_sort(list(pos)) AS positions
  FROM ip_tok GROUP BY term, doc_id
)""",
    ]
    where = [f"tf >= {int(min_tf)}"]
    if max_df is not None:
        parts.append(
            "ip_df AS (SELECT term, count(*) AS df FROM ip_posts GROUP BY term)"
        )
        parts.append(
            "ip_cap AS (SELECT CAST("
            f"{float(max_df)!r} * count(DISTINCT doc_id) AS BIGINT) AS cap "
            "FROM ip_docs)"
        )
        where.append(
            "term IN (SELECT term FROM ip_df, ip_cap WHERE df <= cap)"
        )
    return (
        ",\n".join(parts)
        + "\nSELECT term, doc_id, tf, positions FROM ip_posts\nWHERE "
        + " AND ".join(where)
    )


def phrase_match(postings: DataFrame, w1: str, w2: str) -> DataFrame:
    """Docs containing the exact phrase ``"w1 w2"`` (adjacent tokens),
    with the occurrence count — resolved purely from the positional
    index (no re-scan of the corpus).

    Adjacency law: occurrence positions of the phrase are
    ``(positions(w1) + 1) ∩ positions(w2)``, per doc.
    """
    p1 = postings.where(F.col("term") == F.lit(w1)).select(
        "doc_id", F.col("positions").alias("__p1")
    )
    p2 = postings.where(F.col("term") == F.lit(w2)).select(
        "doc_id", F.col("positions").alias("__p2")
    )
    hits = F.array_intersect(
        F.transform("__p1", lambda x: x + F.lit(1)), F.col("__p2")
    )
    return (
        p1.join(p2, "doc_id")
        .select("doc_id", F.size(hits).alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


def phrase_match_sql(postings_sql_docs: str, w1: str, w2: str) -> str:
    """DuckDB twin of :func:`phrase_match` over the raw docs (the oracle
    re-derives positions independently — a token-level self-join on
    ``pos2 = pos1 + 1``, deliberately NOT the engine's array-intersect
    formulation). ``postings_sql_docs`` must yield ``(doc_id, text)``."""
    w1q = w1.replace("'", "''")
    w2q = w2.replace("'", "''")
    return f"""WITH pm_docs AS MATERIALIZED ({postings_sql_docs}),
pm_tok AS MATERIALIZED (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pm_docs),
       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) g
  WHERE toks[i] <> ''
)
SELECT t1.doc_id AS doc_id, CAST(count(*) AS INT) AS n_occurrences
FROM pm_tok t1 JOIN pm_tok t2
  ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
WHERE t1.term = '{w1q}' AND t2.term = '{w2q}'
GROUP BY t1.doc_id"""


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25-raw scoring —
    the ranked-retrieval step after the inverted index: decontamination
    triage ("most benchmark-like training docs first"), seed selection
    for topic crawls, query-driven corpus audits.

    score(d) = Σ_t  idf_raw(t) · tf(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with idf_raw(t) = (N − df + 0.5) / (df + 0.5) — the ARGUMENT of the
    standard BM25 log-idf. Rationale (the ``tfidf_top_terms`` law): a
    log would hang cross-engine correctness on two libms (Java Math.log
    is not correctly rounded; DuckDB's is glibc's); every factor here is
    integer counts through one IEEE divide/multiply chain, bit-identical
    across engines. The variant is documented, monotone per term, and
    differs from log-BM25 only in how multi-term evidence mixes. The
    per-doc sum folds the matched terms in LEXICOGRAPHIC term order via
    an explicit left-to-right ``F.aggregate`` (the engine dot-product
    law), so Spark and the SQL twin add the same floats in the same
    order.

    Plan shape (100 TB lens): tokenize-once explode → filter to the
    broadcast query-term literal set BEFORE the tf aggregate (the only
    full-corpus shuffles are that filtered tf agg and the per-doc
    length agg — both with map-side partial aggregation); df and N are
    tiny broadcast scalars; final top-k is a TakeOrdered over docs that
    matched ≥1 term, never a full sort.

    Returns ``(doc_id, score, rank)``, rank ties broken by doc_id.
    """
    qset = sorted(set(terms))
    toks = _tokens(docs, id_col, text_col)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    qtf = (
        toks.where(F.col("term").isin(qset))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    # avgdl rides the broadcast N row: one exact bigint sum / one divide
    total = toks.select(F.count(F.lit(1)).alias("n_toks"))
    n = (
        n.crossJoin(F.broadcast(total))
        .select(
            "n_docs",
            (
                F.col("n_toks").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("avgdl"),
        )
    )
    scored = (
        qtf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                (
                    (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    F.col("tf").cast("double") * (k1l + F.lit(1.0))
                    / (
                        F.col("tf").cast("double")
                        + k1l
                        * (
                            F.lit(1.0)
                            - bl
                            + bl
                            * F.col("dl").cast("double")
                            / F.col("avgdl")
                        )
                    )
                )
            ).alias("part"),
        )
    )
    folded = (
        scored.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "part"))),
                F.lit(0.0),
                lambda acc, s: acc + s["part"],
            ).alias("score")
        )
    )
    # top-k FIRST via orderBy+limit (Catalyst's TakeOrderedAndProject:
    # per-partition partial top-k, only k rows ever cross to the driver
    # side of the sort — never a global single-partition window over all
    # matched docs), THEN rank the k survivors (bounded window).
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        folded.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", "score", "rank")
    )


def bm25_topk_sql(
    docs_sql: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical idf_raw / saturation
    expression trees, identical lexicographic-term left-to-right fold
    (``list_reduce`` over the term-sorted struct list). ``docs_sql``
    must yield ``(doc_id, text)``."""
    qset = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in qset)
    k1r, br = repr(float(k1)), repr(float(b))
    return f"""WITH bm_docs AS MATERIALIZED ({docs_sql}),
bm_tok AS MATERIALIZED (
  SELECT doc_id, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM bm_docs),
       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) g
  WHERE toks[i] <> ''
),
bm_dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM bm_tok GROUP BY doc_id),
bm_n AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bm_docs) AS n_docs,
         CAST((SELECT count(*) FROM bm_tok) AS DOUBLE)
           / CAST((SELECT count(*) FROM bm_docs) AS DOUBLE) AS avgdl
),
bm_tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM bm_tok WHERE term IN ({inlist}) GROUP BY term, doc_id
),
bm_df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY term),
bm_part AS (
  SELECT t.doc_id, t.term,
         ((CAST(n.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
            / (CAST(f.df AS DOUBLE) + 0.5))
         * (CAST(t.tf AS DOUBLE) * ({k1r} + 1.0)
            / (CAST(t.tf AS DOUBLE)
               + {k1r} * (1.0 - {br}
                          + {br} * CAST(l.dl AS DOUBLE) / n.avgdl))) AS part
  FROM bm_tf t JOIN bm_df f USING (term) JOIN bm_dl l USING (doc_id), bm_n n
),
bm_fold AS (
  SELECT doc_id,
         list_reduce(
           list_transform(
             list_sort(list({{'term': term, 'part': part}})),
             s -> s.part),
           (acc, v) -> acc + v) AS score
  FROM bm_part GROUP BY doc_id
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM bm_fold
QUALIFY rank <= {int(k)}"""


# ---------------------------------------------------------------------------
# Co-occurrence top-k ("people who visited X also visited Y") — the
# item-item collaborative-counting primitive over any (group, item)
# bipartite table: users x places, sessions x hosts, docs x entities.
#
# Shape (100 TB lens): the naive self-join is quadratic in the hottest
# group (one crawler user touching 10^5 cells => 10^10 pairs), so the
# per-group fan-out is CAPPED FIRST — the standard co-visitation
# discipline: cap^2 bounds every group's pair contribution, the pair
# count aggregates with map-side combine, and the final top-k is a
# window partitioned by item over the (much smaller) pair table. The
# cap's selection law is deterministic (the ``cap`` smallest item ids
# per group), so reruns and the SQL twin agree exactly.
# ---------------------------------------------------------------------------


def cooccurrence_topk(
    df: DataFrame,
    group_col: str,
    item_col: str,
    cap: int = 32,
    top: int = 3,
) -> DataFrame:
    """Top-``top`` co-occurring items per item:
    ``(item, rel, n_co long, rnk int)``, ties broken by rel ascending."""
    d = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("it"))
        .distinct()
    )
    w_cap = Window.partitionBy("g").orderBy("it")
    capped = (
        d.withColumn("rn", F.row_number().over(w_cap))
        .where(F.col("rn") <= cap)
        .drop("rn")
    )
    a = capped.select("g", F.col("it").alias("a"))
    b = capped.select("g", F.col("it").alias("b"))
    pairs = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    sym = pairs.select(
        F.col("a").alias("item"), F.col("b").alias("rel"), "n_co"
    ).unionByName(
        pairs.select(F.col("b").alias("item"), F.col("a").alias("rel"), "n_co")
    )
    w_top = Window.partitionBy("item").orderBy(
        F.col("n_co").desc(), F.col("rel").asc()
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w_top))
        .where(F.col("rnk") <= top)
    )


def cooccurrence_topk_sql(
    rows_sql: str,
    group_expr: str = "g",
    item_expr: str = "it",
    cap: int = 32,
    top: int = 3,
) -> str:
    """DuckDB twin of :func:`cooccurrence_topk` — identical cap law,
    pair direction, and tie-break."""
    return f"""WITH co_rows AS ({rows_sql}),
co_d AS (SELECT DISTINCT {group_expr} AS g, {item_expr} AS it FROM co_rows),
co_cap AS (
  SELECT g, it FROM (
    SELECT g, it, row_number() OVER (PARTITION BY g ORDER BY it) AS rn
    FROM co_d
  ) WHERE rn <= {cap}
),
co_pairs AS (
  SELECT a.it AS a, b.it AS b, count(*) AS n_co
  FROM co_cap a JOIN co_cap b ON a.g = b.g AND a.it < b.it
  GROUP BY a.it, b.it
),
co_sym AS (
  SELECT a AS item, b AS rel, n_co FROM co_pairs
  UNION ALL
  SELECT b AS item, a AS rel, n_co FROM co_pairs
)
SELECT item, rel, n_co, CAST(rnk AS INT) AS rnk FROM (
  SELECT item, rel, n_co,
         row_number() OVER (PARTITION BY item
                            ORDER BY n_co DESC, rel ASC) AS rnk
  FROM co_sym
) WHERE rnk <= {top}"""
