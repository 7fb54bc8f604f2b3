"""Deterministic cardinality sketch (HyperLogLog) — bit-exact twin law.

`approx_count_distinct` is the right tool at 100 TB (exact per-host
distinct counts shuffle every key; the sketch shuffles O(m) registers
per group), but Spark's built-in HLL++ is not reproducible against any
other engine, so it can't be oracle-checked. This module implements the
raw HyperLogLog estimator (Flajolet et al. 2007) with the repo's
cross-engine hash discipline so the ESTIMATE ITSELF is bit-identical on
Spark and DuckDB:

* hash = md5 (identical hex both engines); bucket = first 16 hash bits
  mod m; register input v = next 32 hash bits;
* rank = leading-zero count + 1 over the 32-bit field, computed as
  ``33 - length(bin(v))`` — pure integer ops (the v==0 corner, prob
  2^-32 per key, yields 32 under this law on BOTH engines: consistent,
  and harmless to accuracy);
* the register sum Z = Σ 2^-M_j is kept as the INTEGER
  ``S = Σ 2^(33 - M_j)`` (every term a power of two ≤ 2^33, m terms —
  exact BIGINT, no float reassociation), with empty buckets
  contributing 2^33 each;
* estimate = C / S where ``C = alpha_m · m² · 2^33`` is ONE Python
  double literal emitted verbatim into the SQL twin — a single IEEE
  division on both engines. No rounding needed anywhere.

Raw estimator only (no small/large-range bias correction): the
documented ±1.04/√m relative error (m=64 → ~13%) applies mid-range
(n ≳ 2.5·m). Below that the raw estimator overestimates — standard HLL
switches to linear counting ``m·ln(m/V)`` there, but ``ln`` carries no
cross-engine ulp guarantee, so this module deliberately stays raw and
bit-exact; groups small enough to sit in that regime are exactly the
ones where plain ``count(distinct)`` is cheap anyway. Callers needing
tighter mid-range bounds raise ``p``. The oracle checks DETERMINISM
exactly and accuracy by tolerance in tests.

Plan shape (100 TB lens): one (group, bucket) hash agg with map-side
combine (max-rank is associative), then one O(m)-row agg per group —
shuffle volume O(groups · m), independent of row count. That is the
whole point versus exact distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_distinct_sql",
    "cms_estimates",
    "cms_estimates_sql",
    "kmv_sketch",
    "kmv_jaccard_pairs",
    "kmv_jaccard_pairs_sql",
]


def _alpha(m: int) -> float:
    # standard HLL alpha_m for m >= 64 (Flajolet et al., Fig. 3)
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Per-group distinct-count estimate: ``(group_col, hll_estimate)``.

    ``p`` register bits (m = 2^p registers, relative error ~1.04/2^(p/2));
    the estimate is a deterministic pure function of the key set — rerun,
    repartition, and the DuckDB twin all produce the identical double.
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    c = _alpha(m) * m * m * float(1 << 33)
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    v = F.conv(F.substring(h, 5, 8), 16, 10).cast("long")
    rank = F.lit(33) - F.length(F.bin(v))
    regs = (
        df.select(F.col(group_col).alias("g"), bucket.alias("b"), rank.alias("r"))
        .groupBy("g", "b")
        .agg(F.max("r").alias("mr"))
    )
    per_group = regs.groupBy("g").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - mr AS INT))")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(1 << 33)
    return per_group.select(
        F.col("g").alias(group_col), (F.lit(c) / s).alias("hll_estimate")
    )


def hll_distinct_sql(
    rows_sql: str,
    key_expr: str = "key",
    group_expr: str = "g",
    p: int = 6,
    salt: str = "hll",
) -> str:
    """DuckDB twin — the identical integer law and the same single float
    division. ``rows_sql`` must yield the key/group columns named by
    ``key_expr``/``group_expr``."""
    m = 1 << p
    c = _alpha(m) * m * m * float(1 << 33)
    h = f"md5('{salt}' || CAST({key_expr} AS VARCHAR))"
    bucket = f"(CAST(('0x' || substr({h}, 1, 4)) AS BIGINT) % {m})"
    v = f"CAST(('0x' || substr({h}, 5, 8)) AS BIGINT)"
    rank = f"(33 - length(bin({v})))"
    return f"""WITH hll_rows AS ({rows_sql}),
hll_regs AS (
  SELECT {group_expr} AS g, {bucket} AS b, max({rank}) AS mr
  FROM hll_rows GROUP BY 1, 2
),
hll_g AS (
  SELECT g, sum(CAST(1 AS BIGINT) << CAST(33 - mr AS INTEGER)) AS s_present,
         count(*) AS n_present
  FROM hll_regs GROUP BY g
)
SELECT g AS {group_expr},
       {c!r} / (s_present + ({m} - n_present) * (CAST(1 AS BIGINT) << 33))
         AS hll_estimate
FROM hll_g"""


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency estimation at bounded memory)
# ---------------------------------------------------------------------------


def cms_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame | None = None,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates: build a ``depth × width`` counter matrix over the key
    stream, then answer ``est(k) = min_i counters[i][h_i(k)]`` for every
    probe key. Returns ``(key, cms_est)``; the estimate NEVER
    underestimates (est ≥ true count), overestimates come only from hash
    collisions — the classic bounded-memory heavy-hitter primitive,
    completing the engine's sketch family (HLL cardinality, Bloom
    membership, CMS frequency).

    ``probes`` defaults to the distinct keys of ``df`` (demo shape); at
    corpus scale pass the candidate heavy hitters.

    Cross-engine law: row-``i`` hash = md5(salt‖i‖key) first 12 hex
    digits (48 bits, overflow-free) mod width — md5 is identical on both
    engines, so counters AND estimates are exact integers, no tolerance.

    Plan shape (100 TB lens): the counter build is one hash agg on a
    keyspace bounded by depth·width (map-side combine crushes it —
    shuffle volume is O(d·w) per partition, independent of row count:
    the whole point vs exact counting); the estimate phase joins the
    small PROBE set against the d·w counter table (broadcast), then one
    min-agg per probe. No driver state.
    """
    d, w = int(depth), int(width)
    if d < 1 or w < 2:
        raise ValueError(f"cms_estimates: need depth >= 1, width >= 2")
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i")

    def pos(key, i):
        h = F.md5(F.concat(F.lit(salt), i.cast("string"), F.lit("|"), key))
        return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % w

    keyed = df.select(F.col(key_col).cast("string").alias("__k"), rows)
    counters = keyed.select(
        "i", pos(F.col("__k"), F.col("i")).alias("c")
    ).groupBy("i", "c").agg(F.count(F.lit(1)).alias("cnt"))

    probe = (
        probes.select(F.col(key_col).cast("string").alias("__k"))
        if probes is not None
        else df.select(F.col(key_col).cast("string").alias("__k"))
    ).distinct()
    probed = probe.select("__k", rows).select(
        "__k", "i", pos(F.col("__k"), F.col("i")).alias("c")
    )
    return (
        probed.join(F.broadcast(counters), ["i", "c"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
        .select(F.col("__k").alias(key_col), "cms_est")
    )


def cms_estimates_sql(
    rows_sql: str,
    key_expr: str = "key",
    probes_sql: str | None = None,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> str:
    """DuckDB twin — identical md5 position law, exact integer equality.
    ``rows_sql`` must yield the key column named by ``key_expr``."""
    d, w = int(depth), int(width)
    probes = (
        f"SELECT DISTINCT CAST({key_expr} AS VARCHAR) AS k FROM ({probes_sql})"
        if probes_sql is not None
        else "SELECT DISTINCT k FROM cms_keys"
    )
    pos = (
        f"(CAST(('0x' || substr(md5('{salt}' || CAST(i AS VARCHAR) || '|' || k), "
        f"1, 12)) AS BIGINT) % {w})"
    )
    return f"""WITH cms_src AS ({rows_sql}),
cms_keys AS (SELECT CAST({key_expr} AS VARCHAR) AS k FROM cms_src),
cms_rows AS (SELECT unnest(range(0, {d})) AS i),
cms_counters AS (
  SELECT i, {pos} AS c, count(*) AS cnt
  FROM cms_keys CROSS JOIN cms_rows GROUP BY 1, 2
),
cms_probe AS ({probes}),
cms_pos AS (
  SELECT k, i, {pos} AS c FROM cms_probe CROSS JOIN cms_rows
)
SELECT p.k AS {key_expr}, min(coalesce(t.cnt, 0)) AS cms_est
FROM cms_pos p LEFT JOIN cms_counters t ON t.i = p.i AND t.c = p.c
GROUP BY p.k"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) — distinct counts AND set intersections.
#
# HLL above answers "how many distinct per group"; it cannot answer
# "how much do two groups' key sets OVERLAP" without inclusion-exclusion
# error stacking. KMV (Bar-Yossef et al. 2002 / Beyer et al. 2007) keeps
# the k smallest 60-bit hashes per group: a uniform bottom-k sample of
# the key space that is CLOSED under union (merge = k smallest of the
# concatenation), so Jaccard(A,B) ~= |{x in KMV(A∪B): x in KMV(A) and
# x in KMV(B)}| / k falls out exactly.
#
# Cross-engine law: hash = conv(md5(salt||key)[:15],16,10) — exact 60-bit
# integer on both engines (repo-wide md5 discipline); the only floats are
# the final estimates, each a single literal-times/over-integer IEEE
# expression emitted verbatim into the SQL twin.
#
# Plan shape (100 TB lens): one distinct (group, hash) shuffle, then a
# salted two-level k-min (row_number window per (group, hash%n_salts),
# filter <= k, then the final per-group window over <= n_salts*k rows) —
# no unbounded collect anywhere, the per-group state is exactly k longs.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 128,
    salt: str = "kmv",
    n_salts: int = 64,
) -> DataFrame:
    """Per-group bottom-k sketch: ``(group_col, kmv array<long> ascending)``.
    A group with fewer than k distinct keys carries its EXACT hash set."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    dist = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w_local = Window.partitionBy("g", F.pmod("h", F.lit(n_salts))).orderBy("h")
    survivors = (
        dist.withColumn("rn", F.row_number().over(w_local))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    w_g = Window.partitionBy("g").orderBy("h")
    topk = (
        survivors.withColumn("rn", F.row_number().over(w_g))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    return topk.groupBy("g").agg(
        F.array_sort(F.collect_set("h")).alias("kmv")
    ).select(F.col("g").alias(group_col), "kmv")


def kmv_jaccard_pairs(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """All group pairs (a < b): KMV distinct estimates for each side plus
    the merged-sketch overlap count and Jaccard estimate.

    Output: ``(g_a, g_b, est_a double, est_b double, overlap long,
    jaccard double)`` — every float a single shared-literal IEEE op.
    The pair join is over the per-group sketches (O(groups) rows, k longs
    each), so even thousands of groups broadcast."""
    sk = kmv_sketch(df, key_col, group_col, k=k, salt=salt)
    c_est = float((k - 1) * (1 << 60))  # (k-1) / (h_k / 2^60), one division

    def est(kmv):
        return F.when(
            F.size(kmv) < k, F.size(kmv).cast("double")
        ).otherwise(F.lit(c_est) / F.element_at(kmv, k).cast("double"))

    a = sk.select(
        F.col(group_col).alias("g_a"), F.col("kmv").alias("kmv_a")
    )
    b = sk.select(
        F.col(group_col).alias("g_b"), F.col("kmv").alias("kmv_b")
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    merged = F.array_sort(F.array_union("kmv_a", "kmv_b"))
    u = F.slice(merged, 1, k)
    overlap = F.size(
        F.filter(
            u,
            lambda x: F.array_contains("kmv_a", x)
            & F.array_contains("kmv_b", x),
        )
    ).cast("long")
    # denominator = |union sketch| = min(k, |merged|): when both sides are
    # unsaturated the merged set IS A∪B and the ratio is the EXACT Jaccard;
    # saturated pairs divide by k (the standard bottom-k estimator).
    denom = F.least(F.lit(k), F.size(merged)).cast("long")
    return pairs.select(
        "g_a",
        "g_b",
        est(F.col("kmv_a")).alias("est_a"),
        est(F.col("kmv_b")).alias("est_b"),
        overlap.alias("overlap"),
        (overlap.cast("double") / denom.cast("double")).alias("jaccard"),
    )


def kmv_jaccard_pairs_sql(
    rows_sql: str,
    key_expr: str = "key",
    group_expr: str = "g",
    k: int = 128,
    salt: str = "kmv",
) -> str:
    """DuckDB twin of :func:`kmv_jaccard_pairs` — relational bottom-k via
    row_number (the k-min of a distinct set is algorithm-independent), the
    same hash law, the same single-division estimates."""
    c_est = float((k - 1) * (1 << 60))
    h = (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT)"
    )
    return f"""WITH kmv_rows AS ({rows_sql}),
kmv_dist AS (
  SELECT DISTINCT {group_expr} AS g, {h} AS h FROM kmv_rows
),
kmv_rn AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
  FROM kmv_dist
),
kmv_sk AS (SELECT g, h FROM kmv_rn WHERE rn <= {k}),
kmv_stat AS (
  SELECT g, count(*) AS cnt, max(h) AS hk FROM kmv_sk GROUP BY g
),
kmv_est AS (
  SELECT g, CASE WHEN cnt < {k} THEN CAST(cnt AS DOUBLE)
                 ELSE {c_est!r} / CAST(hk AS DOUBLE) END AS est
  FROM kmv_stat
),
kmv_pairs AS (
  SELECT a.g AS g_a, b.g AS g_b
  FROM kmv_stat a JOIN kmv_stat b ON a.g < b.g
),
kmv_u AS (
  SELECT p.g_a, p.g_b, s.h,
         row_number() OVER (PARTITION BY p.g_a, p.g_b ORDER BY s.h) AS rn
  FROM kmv_pairs p
  JOIN (SELECT DISTINCT h, g FROM kmv_sk) s ON s.g IN (p.g_a, p.g_b)
  GROUP BY p.g_a, p.g_b, s.h
),
kmv_ov AS (
  SELECT u.g_a, u.g_b, count(*) AS overlap
  FROM kmv_u u
  WHERE u.rn <= {k}
    AND EXISTS (SELECT 1 FROM kmv_sk x WHERE x.g = u.g_a AND x.h = u.h)
    AND EXISTS (SELECT 1 FROM kmv_sk y WHERE y.g = u.g_b AND y.h = u.h)
  GROUP BY u.g_a, u.g_b
),
kmv_den AS (
  SELECT g_a, g_b, least({k}, count(*)) AS denom
  FROM kmv_u GROUP BY g_a, g_b
)
SELECT p.g_a, p.g_b, ea.est AS est_a, eb.est AS est_b,
       CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
       CAST(coalesce(o.overlap, 0) AS DOUBLE) / CAST(d.denom AS DOUBLE)
         AS jaccard
FROM kmv_pairs p
JOIN kmv_est ea ON ea.g = p.g_a
JOIN kmv_est eb ON eb.g = p.g_b
JOIN kmv_den d ON d.g_a = p.g_a AND d.g_b = p.g_b
LEFT JOIN kmv_ov o ON o.g_a = p.g_a AND o.g_b = p.g_b"""
