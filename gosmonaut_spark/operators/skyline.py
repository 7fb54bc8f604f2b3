"""2D Pareto skyline (minimize both axes) — distributed bucket-prefix plan.

The data-curation frontier query: "which documents are shortest for
their quality", "which points form the southwest frontier". A point is
dominated iff another point is <= on both axes and < on at least one;
the skyline is the non-dominated set.

Scale shape (100 TB lens): the textbook NOT EXISTS self-join is
quadratic, and a single global window (sort by x, running min of y)
forces one partition. Instead:

1. bucket x by a static step (plan literal — no data-dependent split);
2. per-bucket ``min(y)`` — map-side combinable aggregate;
3. prefix-min over STRICTLY EARLIER buckets — a window over the tiny
   O(B) bucket table (one partition of B rows, B a plan constant);
4. broadcast the prefix back; per-bucket windows (partitioned by
   bucket, so parallel across buckets) resolve in-bucket dominance:
   ``rangeBetween`` on x for the strictly-smaller-x min, rows-preceding
   within (bucket, x) for the same-x strict-y law.

Every comparison is <=/< on the raw values — ties and duplicate points
follow the exact dominance definition (equal points dominate neither,
so both survive), which keeps the DuckDB brute-force NOT EXISTS twin
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_bucket_step: float,
) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ``x_col``, minimize
    ``y_col``). NULL coordinates are excluded (no order against NULL)."""
    d = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    b = F.floor(F.col(x_col) / F.lit(float(x_bucket_step))).alias("_skyb")
    d = d.withColumn("_skyb", b)

    # (2)+(3): bucket minima and the strictly-earlier-bucket prefix min
    mins = d.groupBy("_skyb").agg(F.min(y_col).alias("_skyb_min"))
    w_pref = (
        Window.orderBy(F.col("_skyb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = mins.select(
        "_skyb", F.min("_skyb_min").over(w_pref).alias("_sky_prefix_min")
    )
    j = d.join(F.broadcast(pref), "_skyb")

    # (4): in-bucket dominance, parallel across buckets. The strictly-
    # smaller-x min comes from an x-LEVEL prefix (groupBy distinct x,
    # rows-preceding window over the deduped x rows, join back) — a
    # rows/range window over the raw rows cannot express x' < x for
    # non-integer x (rangeBetween(-1) would mean x' <= x-1.0).
    xmins = d.groupBy("_skyb", x_col).agg(F.min(y_col).alias("_xmin"))
    w_x = (
        Window.partitionBy("_skyb")
        .orderBy(F.col(x_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xpref = xmins.select(
        "_skyb", x_col, F.min("_xmin").over(w_x).alias("_sky_ltx_min")
    )
    w_eqx = (
        Window.partitionBy("_skyb", x_col)
        .orderBy(F.col(y_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.join(xpref, ["_skyb", x_col]).withColumn(
        "_sky_eqx_min", F.min(y_col).over(w_eqx)
    )
    y = F.col(y_col)
    dominated = (
        F.coalesce(F.col("_sky_prefix_min") <= y, F.lit(False))
        | F.coalesce(F.col("_sky_ltx_min") <= y, F.lit(False))
        | F.coalesce(F.col("_sky_eqx_min") < y, F.lit(False))
    )
    return j.where(~dominated).select(*df.columns)


def skyline_2d_sql(rows_sql: str, x_expr: str = "x", y_expr: str = "y") -> str:
    """DuckDB twin: the brute-force dominance definition itself (NOT
    EXISTS) — deliberately algorithm-independent, so it checks the
    bucket-prefix plan against the mathematical spec."""
    return f"""WITH sky_t AS ({rows_sql})
SELECT * FROM sky_t p
WHERE p.{x_expr} IS NOT NULL AND p.{y_expr} IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM sky_t q
    WHERE q.{x_expr} <= p.{x_expr} AND q.{y_expr} <= p.{y_expr}
      AND (q.{x_expr} < p.{x_expr} OR q.{y_expr} < p.{y_expr})
  )"""
