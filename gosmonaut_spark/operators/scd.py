"""SCD2 dimension build — change events -> effective-dated intervals.

The warehouse-side complement of the CDC diff (plans/checkpoint.py
``snapshot_diff``): given an append-only attribute stream
(key, ts, value), collapse consecutive equal values per key into runs
and emit one row per run with half-open ``[from, to)`` validity and a
current flag — the classic slowly-changing-dimension type-2 table that
an as-of join (operators/asof.py) then probes.

Scale shape (100 TB lens): both window passes (lag to find change
points, lead to close intervals) use the SAME (key, order)
partitioning, so Catalyst plans ONE shuffle/sort and the second window
rides the first's ordering; per-key window state is a single row. No
collect, no UDF, no self-join.

Determinism: ordering ties broken by a caller-named unique column;
value comparison is null-safe (a NULL attribute is a real state, and
NULL -> value / value -> NULL are change points, same law as
``snapshot_diff``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import ntz_epoch_ms


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """``(key, val, from_ms long, to_ms long, is_current boolean)`` —
    ``to_ms`` NULL on each key's open (current) run."""
    base = df.select(
        F.col(key_col).alias("key"),
        ntz_epoch_ms(F.col(ts_col)).alias("ms"),
        F.col(val_col).alias("val"),
        F.col(tiebreak_col).alias("tb"),
    )
    w = Window.partitionBy("key").orderBy(F.col("ms").asc(), F.col("tb").asc())
    marked = base.select(
        "key",
        "ms",
        "val",
        "tb",
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(~F.lag("val").over(w).eqNullSafe(F.col("val")), F.lit(1))
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    runs = marked.where(F.col("chg") == 1).select(
        "key", F.col("ms").alias("from_ms"), "val", "tb"
    )
    w2 = Window.partitionBy("key").orderBy(
        F.col("from_ms").asc(), F.col("tb").asc()
    )
    return runs.select(
        "key",
        "val",
        "from_ms",
        F.lead("from_ms").over(w2).alias("to_ms"),
        F.lead("from_ms").over(w2).isNull().alias("is_current"),
    )


def scd2_build_sql(
    rows_sql: str,
    key_expr: str = "key",
    ts_expr: str = "ts",
    val_expr: str = "val",
    tiebreak_expr: str = "tb",
) -> str:
    """DuckDB twin of :func:`scd2_build` — identical change-point and
    interval-close laws (IS DISTINCT FROM == negated ``eqNullSafe``)."""
    return f"""WITH scd_base AS (
  SELECT {key_expr} AS key, epoch_ms({ts_expr}) AS ms,
         {val_expr} AS val, {tiebreak_expr} AS tb
  FROM ({rows_sql})
),
scd_marked AS (
  SELECT key, ms, val, tb,
         CASE WHEN row_number() OVER w = 1 THEN 1
              WHEN lag(val) OVER w IS DISTINCT FROM val THEN 1
              ELSE 0 END AS chg
  FROM scd_base
  WINDOW w AS (PARTITION BY key ORDER BY ms ASC, tb ASC)
),
scd_runs AS (
  SELECT key, ms AS from_ms, val, tb FROM scd_marked WHERE chg = 1
)
SELECT key, val, from_ms,
       lead(from_ms) OVER w2 AS to_ms,
       lead(from_ms) OVER w2 IS NULL AS is_current
FROM scd_runs
WINDOW w2 AS (PARTITION BY key ORDER BY from_ms ASC, tb ASC)"""
