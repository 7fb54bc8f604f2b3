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

__all__ = ["hll_distinct", "hll_distinct_sql", "cms_estimates", "cms_estimates_sql"]


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
