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

__all__ = ["hll_distinct", "hll_distinct_sql"]


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
