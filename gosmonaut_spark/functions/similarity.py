"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_brute` — exact top-k by cross join; the oracle twin
  (DuckDB ``list_reduce`` folds in the same order as Spark ``aggregate``,
  so doubles match bit-for-bit) and the right plan when the query side is
  tiny (broadcast).
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  (sign bits of dot products with deterministic seeded planes) restrict
  candidates to bucket collisions across ``n_tables`` tables; exact cosine
  re-ranks. Recall tunable via bits/tables.
* :func:`cosine_pairs_lsh` — near-duplicate pairs by embedding cosine
  (the embedding-cosine dedup entry).

All vector math is native Column expressions (zip_with/aggregate fold) —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin: list_reduce folds left-to-right like Spark aggregate,
    list_zip pairs elements — identical IEEE double sequence."""
    d = (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )
    na = (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform({b}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
    )
    return f"({d}) / (({na}) * ({nb}))"


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("target_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def cosine_topk_brute(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_id: str = "query_id",
    target_id: str = "target_id",
    vec: str = "embedding",
) -> DataFrame:
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec).alias("qv"))
    t = targets.select(F.col(target_id).alias("target_id"), F.col(vec).alias("tv"))
    cand = q.crossJoin(t).select(
        "query_id", "target_id", cosine(F.col("qv"), F.col("tv")).alias("cos_sim")
    )
    return _topk(cand, k)


def _hyperplanes(dim: int, n_bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng((seed, table))
    return rng.standard_normal((n_bits, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) > 0 — native
    fold per plane (planes are literals folded by Catalyst)."""
    n_bits, _dim = planes.shape
    out = F.lit(0).cast("long")
    for j in range(n_bits):
        lits = F.array(*[F.lit(float(v)) for v in planes[j]])
        d = F.aggregate(
            F.zip_with(vec, lits, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def cosine_topk_lsh(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    n_bits: int = 16,
    n_tables: int = 8,
    dim: int = 64,
    query_id: str = "query_id",
    target_id: str = "target_id",
    vec: str = "embedding",
    multiprobe: int = 1,
    max_bucket_targets: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >=1 table.

    The bucket join is an equi-join on (table, bucket); the exact re-rank
    touches only collisions. **Sizing for scale**: expected bucket
    cardinality is n_targets / 2^n_bits per table — size n_bits ~
    log2(n_targets / desired_bucket_size), e.g. 10^12 targets with
    ~1000-vector buckets wants n_bits ~ 30. The old default of 8 bits put
    ~10^9 vectors in a bucket at that scale and the within-bucket join
    went quadratic; the default is now 16 with single-bit multiprobe ON so
    the finer buckets don't cost recall.

    ``multiprobe=1`` probes, per table, the query's own bucket plus every
    single-bit flip (n_bits+1 probes): recall of coarser buckets at the
    candidate volume of finer ones — the standard multiprobe-LSH trade.
    Only the (small) query side is exploded.

    ``max_bucket_targets`` drops buckets holding more targets than the cap
    from candidate generation entirely (a skew guard: one degenerate
    bucket — e.g. the all-zeros region — cannot cross-product the join).
    Recall for queries whose true neighbors sat in a dropped bucket
    degrades; prefer raising n_bits first, the cap is the backstop.
    """
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe supports 0 (off) or 1 (single-bit probes)")
    # norms are per-row, not per-pair: precompute before the bucket join so
    # the pair step is a dot product + one divide (identical IEEE result —
    # the expression tree dot/(na*nb) is unchanged, na/nb just computed
    # n+m times instead of n*m). The dedup runs on (ids, cos) scalars, not
    # on the vector columns — shuffling two 64-float arrays per candidate
    # through a distinct was the dominant byte volume at scale.
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec).alias("qv"),
        norm(F.col(vec)).alias("qn"),
    )
    t = targets.select(
        F.col(target_id).alias("target_id"),
        F.col(vec).alias("tv"),
        norm(F.col(vec)).alias("tn"),
    )
    q_parts, t_parts = [], []
    for tbl in range(n_tables):
        planes = _hyperplanes(dim, n_bits, tbl)
        q_parts.append(
            q.select(
                "query_id", "qv", "qn", F.lit(tbl).alias("tbl"), lsh_bucket(F.col("qv"), planes).alias("bkt")
            )
        )
        t_parts.append(
            t.select(
                "target_id", "tv", "tn", F.lit(tbl).alias("tbl"), lsh_bucket(F.col("tv"), planes).alias("bkt")
            )
        )
    qb = q_parts[0]
    for x in q_parts[1:]:
        qb = qb.unionByName(x)
    tb = t_parts[0]
    for x in t_parts[1:]:
        tb = tb.unionByName(x)
    if multiprobe == 1:
        probes = F.array(
            F.lit(0).cast("long"),
            *[F.lit(1 << j).cast("long") for j in range(n_bits)],
        )
        qb = (
            qb.withColumn("__f", F.explode(probes))
            .withColumn("bkt", F.col("bkt").bitwiseXOR(F.col("__f")))
            .drop("__f")
        )
    if max_bucket_targets is not None:
        sizes = tb.groupBy("tbl", "bkt").agg(F.count(F.lit(1)).alias("__n"))
        tb = tb.join(
            sizes.filter(F.col("__n") <= max_bucket_targets),
            ["tbl", "bkt"],
            "left_semi",
        )
    cand = (
        qb.join(tb, ["tbl", "bkt"])
        .select(
            "query_id",
            "target_id",
            (dot(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tn"))).alias(
                "cos_sim"
            ),
        )
        .distinct()
    )
    return _topk(cand, k)


def cosine_pairs_lsh(
    docs: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    ``max_bucket`` is the same skew guard as cosine_topk_lsh's
    ``max_bucket_targets``: the self-join is quadratic PER BUCKET, so one
    degenerate bucket (the all-zeros region) dominates the whole job at
    scale — buckets above the cap are dropped from candidate generation
    (near-dups there are better served by raising n_bits)."""
    # same norm-precompute + scalar-dedup discipline as cosine_topk_lsh
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec).alias("v"),
        norm(F.col(vec)).alias("vn"),
    )
    parts = []
    for tbl in range(n_tables):
        planes = _hyperplanes(dim, n_bits, tbl)
        parts.append(
            d.select("doc_id", "v", "vn", F.lit(tbl).alias("tbl"), lsh_bucket(F.col("v"), planes).alias("bkt"))
        )
    b = parts[0]
    for x in parts[1:]:
        b = b.unionByName(x)
    if max_bucket is not None:
        sizes = b.groupBy("tbl", "bkt").agg(F.count(F.lit(1)).alias("__n"))
        b = b.join(
            sizes.filter(F.col("__n") <= max_bucket), ["tbl", "bkt"], "left_semi"
        )
    a = b.select(F.col("doc_id").alias("a"), F.col("v").alias("va"), F.col("vn").alias("na"), "tbl", "bkt")
    c = b.select(F.col("doc_id").alias("b"), F.col("v").alias("vb"), F.col("vn").alias("nb"), "tbl", "bkt")
    return (
        a.join(c, ["tbl", "bkt"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )
