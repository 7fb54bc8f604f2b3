"""Conversion-funnel operator: how far each user progresses through an
ordered sequence of event types (view -> click -> purchase, ...).

Semantics: step 0 matches a user's earliest event of ``steps[0]``; step i
matches the earliest event of ``steps[i]`` STRICTLY AFTER the matched step
i-1 event (optionally within ``within_ms`` of it). ``funnel_depth`` is the
number of matched steps; step timestamps ride along (null once the funnel
breaks). This is the standard windowFunnel shape from event analytics.

Plan shape (100 TB lens): one user-keyed min-aggregation per step, each
over the events pre-filtered to that single step's type — every stage is
map-side combinable, the join key is ``user_col`` throughout so AQE reuses
one hash partitioning across stages, and the per-stage tables shrink
monotonically (matched users only). No collect_list of a user's full event
history, so a hot user costs O(their events) in the filtered scans and
O(1) state — unlike the sorted-array fold formulation, which holds every
event of the hottest user in one aggregation buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Per-user funnel depth over an ordered step sequence.

    Returns one row per distinct user: (user_col, funnel_depth,
    t0..t{k-1}) where t{i} is the matched step-i timestamp (null if the
    user never reached it). ``within_ms`` additionally requires each step
    to occur within that many milliseconds of the previous matched step.
    """
    if not steps:
        raise ValueError("steps must be a non-empty sequence of event types")
    base = events.select(user_col, ts_col, type_col)
    out = base.select(user_col).distinct()
    prev: str | None = None
    step_cols: list[str] = []
    for i, step in enumerate(steps):
        name = f"t{i}"
        ev = base.where(F.col(type_col) == step)
        if prev is None:
            t = ev.groupBy(user_col).agg(F.min(ts_col).alias(name))
        else:
            reached = out.select(user_col, prev).where(F.col(prev).isNotNull())
            cond = F.col(ts_col) > F.col(prev)
            if within_ms is not None:
                cond &= F.col(ts_col) <= F.col(prev) + F.expr(
                    f"INTERVAL {int(within_ms)} MILLISECONDS"
                )
            t = (
                ev.join(reached, user_col)
                .where(cond)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(name))
            )
        out = out.join(t, user_col, "left")
        prev = name
        step_cols.append(name)
    depth = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in step_cols),
        F.lit(0),
    ).cast("int")
    return out.select(user_col, depth.alias("funnel_depth"), *step_cols)
