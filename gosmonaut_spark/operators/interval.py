"""Interval (range-containment) join — point-in-interval, the 1-D sibling
of the point-in-polygon join, expressed as a grid-bucketed equi-join.

Semantics: for a points table carrying an instant column and an intervals
table carrying ``[start, end)`` columns (half-open, epoch-ms BIGINTs, plus
optional equi-keys), return every (point, interval) pair with
``start <= t < end`` (and the keys equal).

Plan shape (100 TB lens): Spark executes a naive range predicate as
BroadcastNestedLoop/cartesian — quadratic. Instead time is cut into
fixed-width grid cells (``bucket_ms``), exactly as the spatial layer cuts
the plane into cells (operators/tiling.py):

* each POINT maps to ONE cell — the big side never grows;
* each INTERVAL explodes to the cells it overlaps (``sequence`` — native,
  no UDF); blowup = len/bucket_ms + 1, so pick bucket_ms near the median
  interval length. A guard raises if an interval would explode past
  ``max_cells_per_interval`` — at corpus scale a degenerate open-ended
  interval must fail loudly, not materialize 10^6 rows;
* one shuffle each side on (keys, cell) — a plain hash equi-join that
  AQE can skew-split — then the exact range predicate filters within the
  cell. Deduplication is free: a point lives in one cell, so each
  qualifying pair appears exactly once.

The reference's engine has no temporal layer; this mirrors how its
spatial candidates work (cell equi-join then exact test,
reference gosmonaut.go:189-214's id-collection analog in time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts_ms",
    start: str = "start_ms",
    end: str = "end_ms",
    on: str | list[str] | None = None,
    bucket_ms: int = 3_600_000,
    max_cells_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start <= point_ts < end``, plus equality on ``on`` keys if given).
    Returns all point columns plus all interval columns."""
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive")
    keys = [on] if isinstance(on, str) else list(on or [])
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(f"columns on both sides must be equi-keys: {overlap}")

    b = F.lit(int(bucket_ms)).cast("long")
    first = F.floor(F.col(start) / b)
    last = F.floor((F.col(end) - F.lit(1)) / b)  # half-open: end-1 is the
    # last instant an interval can still contain
    n_cells = last - first + F.lit(1)
    guard = F.when(
        n_cells <= F.lit(int(max_cells_per_interval)), n_cells
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than "
                    f"{max_cells_per_interval} cells of {bucket_ms}ms — "
                    f"raise bucket_ms or cap the interval (start="
                ),
                F.col(start).cast("string"),
                F.lit(" end="),
                F.col(end).cast("string"),
                F.lit(")"),
            )
        ).cast("long")
    )
    # the guard is folded INTO the sequence bound (first + guard - 1 ==
    # last on the happy path) so column pruning can never elide it
    iv = intervals.where(F.col(end) > F.col(start)).withColumn(
        "_cell", F.explode(F.sequence(first, first + guard - F.lit(1)))
    )
    pt = points.withColumn("_cell", F.floor(F.col(point_ts) / b))
    joined = pt.join(iv, [*keys, "_cell"]).where(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop("_cell")
