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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "inverted_postings",
    "inverted_postings_sql",
    "phrase_match",
    "phrase_match_sql",
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
