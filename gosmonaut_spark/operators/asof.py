"""As-of (nearest-event) join — the time-series companion to the spatial
joins, expressed as ONE window pass instead of a join.

Semantics match DuckDB/pandas ``ASOF JOIN``: for every left row, attach
the single right row with the same key whose timestamp is the latest one
``<=`` the left timestamp (``direction="backward"``, inclusive), or the
earliest one ``>=`` it (``"forward"``). Unmatched left rows keep nulls
(LEFT ASOF).

Plan shape (100 TB lens): the naive formulation is a range join
(``l.ts >= r.ts`` + argmax), which Spark executes as a broadcast-range or
cartesian-ish monster. Instead both sides are UNIONED, tagged, and swept
by one ``last(..., ignorenulls=True)`` running window per key — a single
hash-partition + Tungsten sort over exactly the payload bytes, the same
discipline as sessionization. No join, no range predicate, no driver
state; skew is bounded by the hottest key, same as any keyed window.

Ties: a right row whose timestamp EQUALS a left row's sorts before it
(backward) / after it (forward), so equal timestamps match — DuckDB ASOF
(>= / <=) behavior. Among multiple right rows with identical (key, ts)
the winner follows the union's sort order, which is not total over them:
callers needing full determinism pre-aggregate the right side to unique
(key, ts), as the oracled query does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import ntz_epoch_ms

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_ms: int | None = None,
    prefix: str = "asof_",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """LEFT ASOF join: every ``left`` row plus the temporally-nearest
    ``right`` row per key (backward: latest right_ts <= left_ts; forward:
    earliest right_ts >= left_ts). Right payload columns are returned as
    ``prefix<col>`` (including the matched timestamp); unmatched rows get
    nulls. ``tolerance_ms`` voids matches farther than the bound
    (epoch math is zone-free NTZ field extraction).

    ``payload_cols``: which right columns to carry (the matched timestamp
    is always included). The sweep shuffles + Tungsten-sorts the right
    payload struct through the per-key window, so for a WIDE right table
    every unlisted column is bytes saved in the exchange — pass only the
    columns the consumer reads. Default: all non-key right columns."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_ts = right_ts or left_ts
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is not None:
        unknown = [c for c in payload_cols if c not in right.columns]
        if unknown:
            raise ValueError(f"payload_cols not in right side: {unknown}")
        payload = [
            c
            for c in right.columns  # keep right-side column order
            if c not in keys and (c in payload_cols or c == right_ts)
        ]
    else:
        payload = [c for c in right.columns if c not in keys]
    if right_ts not in payload:
        raise ValueError(f"right side must carry its timestamp {right_ts!r}")
    out_names = [prefix + c for c in payload]
    for n in out_names:
        if n in left.columns:
            raise ValueError(f"output column {n!r} collides with a left column")

    rstruct = F.struct(*[F.col(c) for c in payload])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    lstruct = F.struct(*[F.col(c) for c in left.columns])

    lu = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype).alias("_r"),
        lstruct.alias("_l"),
    )
    ltype = lu.schema["_l"].dataType
    ru = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
        F.lit(None).cast(ltype).alias("_l"),
    )
    order: list[Column] = (
        [F.col("_ats").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_ats").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = lu.unionByName(ru).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    m = F.col("_m")
    if tolerance_ms is not None:
        gap = F.abs(ntz_epoch_ms(F.col("_ats")) - ntz_epoch_ms(m[right_ts]))
        m = F.when(gap <= F.lit(int(tolerance_ms)), F.col("_m"))
    return swept.where(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[m[c].alias(prefix + c) for c in payload],
    )
