"""Event-time rolling-window aggregates (RANGE frames per key).

The sliding-metric workhorse (per-user moving averages / rolling counts
over the trailing N minutes) expressed as ONE window pass with a
RANGE frame over zone-free epoch milliseconds — no self-join, no
explode-per-window-slot. Complements the engine's time family: asof
(nearest past event), interval (containment), funnel (ordered steps),
sessionize (gap split); this adds trailing-window analytics.

Scale shape (100 TB lens): a single hash partition on the key + one
per-key time sort — identical cost to the sessionize window; the RANGE
frame is evaluated by Spark's sliding-frame executor in O(rows) per
partition (each row enters/leaves the frame once), never O(rows ×
frame). Hot keys are bounded by the same per-key sort every windowed
op here pays; there is no global sort.

Cross-engine twin notes: frame BOUNDS are integer epoch-ms arithmetic
(bit-exact); windowed SUM/AVG reassociate between engines (sliding-sum
vs recompute), so consumers compare averages at round(x, 9) — counts
and min/max are exact.

Reference parity: none — the reference has no windowed analytics; this
is part of the graft's event-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeops import ntz_epoch_ms

__all__ = [
    "anomaly_flags",
    "anomaly_flags_sql",
    "rolling_stats",
    "rolling_stats_sql",
    "transition_counts",
    "transition_counts_sql",
    "gap_fill",
    "gap_fill_sql",
]


def rolling_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_ms: int,
) -> DataFrame:
    """Trailing-window stats per event: for each row, aggregates over the
    key's events in ``(ts - window_ms, ts]`` — half-open at the old edge
    (an event exactly ``window_ms`` old has expired), closed at now.

    Returns the input keyed columns plus ``ts_ms``, ``n_window``,
    ``sum_window``, ``min_window``, ``max_window`` (and the row's id
    columns untouched — select before calling to prune wide payloads,
    same guidance as asof_join's payload_cols).
    """
    ms = ntz_epoch_ms(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ms").asc())
        .rangeBetween(-(int(window_ms) - 1), 0)
    )
    v = F.col(value_col).cast("double")
    return (
        events.withColumn("__ms", ms)
        .select(
            F.col(key_col),
            F.col("__ms").alias("ts_ms"),
            v.alias("__v"),
            F.count(F.lit(1)).over(w).alias("n_window"),
            F.sum(v).over(w).alias("sum_window"),
            F.min(v).over(w).alias("min_window"),
            F.max(v).over(w).alias("max_window"),
        )
        .drop("__v")
    )


def rolling_stats_sql(
    events_sql: str,
    key_expr: str,
    ms_expr: str,
    value_expr: str,
    window_ms: int,
) -> str:
    """DuckDB twin — identical RANGE frame bounds on the same epoch-ms
    integers. ``events_sql`` must yield the key/ms/value columns."""
    lo = int(window_ms) - 1
    frame = f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY {key_expr} ORDER BY {ms_expr} ASC {frame})"
    return f"""WITH rw_events AS ({events_sql})
SELECT {key_expr}, {ms_expr} AS ts_ms,
       count(*) {over} AS n_window,
       sum(CAST({value_expr} AS DOUBLE)) {over} AS sum_window,
       min(CAST({value_expr} AS DOUBLE)) {over} AS min_window,
       max(CAST({value_expr} AS DOUBLE)) {over} AS max_window
FROM rw_events"""


# ---------------------------------------------------------------------------
# event-transition matrix (first-order Markov counts per event stream)
# ---------------------------------------------------------------------------


def transition_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order transition counts over each key's time-ordered event
    stream: ``(from_type, to_type, n)`` — the Markov-chain summary
    behind next-action prediction and anomalous-flow detection.

    One lag window per key (ts order, ties broken by ``id_col`` so the
    stream order is total and deterministic) + one hash agg on the
    (from, to) pair — the same two-shuffle budget as sessionize. Each
    key's first event has no predecessor and is excluded.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ntz_epoch_ms(F.col(ts_col)).asc(), F.col(id_col).asc())
    )
    lagged = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return lagged.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def gap_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_ms: int,
) -> DataFrame:
    """Dense time-bucket grid per key with last-observation-carried-forward
    — the hypertable-style ``time_bucket_gapfill + locf`` continuous view.

    Buckets are ``ms - ms % step_ms`` (pure integer law, zone-free NTZ
    epoch). For each key the grid spans the key's OWN observed range
    [min_bucket, max_bucket] — no global clock table. Output per
    (key, bucket):

    * ``n_obs`` — events observed in the bucket (0 on gap rows)
    * ``v_obs`` — the bucket's aggregated value, NULL on gap rows
    * ``v_filled`` — ``v_obs`` forward-filled from the key's most recent
      observed bucket (the locf read a downstream consumer wants)
    * ``is_gap`` — 1 on synthesized rows

    The fill value's SUM is exact only for integer-typed ``value_col`` —
    callers wanting cross-engine bit-equality pass integers (same
    money-in-cents discipline as the rest of the engine).

    Scale shape (100 TB lens): one hash agg on (key, bucket); the grid is
    ``sequence() + explode`` codegen whose fan-out is bounded by the
    key's span / step (caller picks the step, same contract as
    ``rolling_stats``'s window); one per-key window sort for the fill.
    No driver collect, no global sort, no cross join — hot keys cost the
    same single per-key sort every windowed op here pays.
    """
    step = int(step_ms)
    ms = ntz_epoch_ms(F.col(ts_col))
    obs = (
        events.select(
            F.col(key_col),
            (ms - ms % F.lit(step)).alias("bucket_ms"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key_col, "bucket_ms")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__v").alias("v_obs"),
        )
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket_ms").alias("__b0"), F.max("bucket_ms").alias("__b1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.lit(step).cast("long"))
        ).alias("bucket_ms"),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("bucket_ms").asc())
    return (
        grid.join(obs, [key_col, "bucket_ms"], "left")
        .select(
            F.col(key_col),
            "bucket_ms",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "v_obs",
            F.last("v_obs", ignorenulls=True).over(w).alias("v_filled"),
            F.col("v_obs").isNull().cast("int").alias("is_gap"),
        )
    )


def gap_fill_sql(
    events_sql: str, key_expr: str, ms_expr: str, value_expr: str, step_ms: int
) -> str:
    """DuckDB twin — identical bucket law (integer ``ms - ms % step``),
    inclusive per-key grid (``range`` stop is exclusive, Spark's
    ``sequence`` stop is inclusive — hence ``b1 + step``), and the same
    IGNORE NULLS running-last fill. ``events_sql`` must yield
    key/ms/value columns named by the ``*_expr`` arguments."""
    step = int(step_ms)
    return f"""WITH gf_src AS ({events_sql}),
gf_obs AS (
  SELECT {key_expr} AS k, {ms_expr} - ({ms_expr} % {step}) AS bucket_ms,
         count(*) AS n_obs, CAST(sum({value_expr}) AS BIGINT) AS v_obs
  FROM gf_src GROUP BY 1, 2
),
gf_span AS (SELECT k, min(bucket_ms) AS b0, max(bucket_ms) AS b1 FROM gf_obs GROUP BY k),
gf_grid AS (
  SELECT k, unnest(range(b0, b1 + {step}, {step})) AS bucket_ms FROM gf_span
),
gf_j AS (
  SELECT g.k, g.bucket_ms, o.n_obs, o.v_obs
  FROM gf_grid g LEFT JOIN gf_obs o ON o.k = g.k AND o.bucket_ms = g.bucket_ms
)
SELECT k AS {key_expr}, bucket_ms, coalesce(n_obs, 0) AS n_obs, v_obs,
       last_value(v_obs IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bucket_ms ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled,
       CAST(v_obs IS NULL AS INT) AS is_gap
FROM gf_j"""


def transition_counts_sql(
    events_sql: str,
    key_expr: str,
    ms_expr: str,
    type_expr: str,
    id_expr: str,
) -> str:
    """DuckDB twin — identical lag law (epoch-ms order, id tie-break)."""
    return f"""WITH tc_events AS ({events_sql}),
tc_lag AS (
  SELECT lag({type_expr}) OVER (
           PARTITION BY {key_expr} ORDER BY {ms_expr} ASC, {id_expr} ASC
         ) AS from_type,
         {type_expr} AS to_type
  FROM tc_events
)
SELECT from_type, to_type, count(*) AS n
FROM tc_lag WHERE from_type IS NOT NULL
GROUP BY from_type, to_type"""


def anomaly_flags(
    events: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    z: int = 3,
) -> DataFrame:
    """Per-key outlier detection with an EXACT integer z-score law: flag
    rows whose integer metric deviates from their key's mean by more
    than ``z`` population standard deviations — without ever computing
    a float mean or stddev.

    The test |v − μ| > z·σ is multiplied through by n²:

        (n·v − S)²  >  z²·(n·Q − S²)        S = Σv,  Q = Σv²

    — both sides exact BIGINTs, so the flag set is bit-reproducible
    across engines, partitionings and reruns (a float μ/σ version flips
    boundary rows per run; this never does). Overflow envelope: needs
    n·max(v)² and (n·max(v))² within int64 — e.g. one million rows per
    key at |v| ≤ 3M fits; callers above that pre-scale v (documented
    contract, same family as the mm/cent integer laws elsewhere).

    Keys with n < 2 or zero variance flag nothing (σ = 0: only v ≠ μ
    rows would flag; with variance 0 every v = μ). Returns the flagged
    rows ``(key, id, v)``.

    Plan shape (100 TB lens): ONE window over the key partitioning
    computes (n, S, Q) without collapsing rows (no join back); the flag
    is then a pure row predicate. One shuffle total.
    """
    zz = int(z) * int(z)
    w = Window.partitionBy(key_col)
    v = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v).over(w)
    q = F.sum(v * v).over(w)
    dev = n * v - s
    var_n2 = n * q - s * s
    return (
        events.select(
            F.col(key_col),
            F.col(id_col),
            v.alias(value_col),
            dev.alias("__d"),
            var_n2.alias("__v2"),
        )
        .where(F.col("__d") * F.col("__d") > F.lit(zz) * F.col("__v2"))
        .select(key_col, id_col, value_col)
    )


def anomaly_flags_sql(
    events_sql: str,
    key_expr: str,
    id_expr: str,
    value_expr: str,
    z: int = 3,
) -> str:
    """DuckDB twin — identical integer inequality."""
    zz = int(z) * int(z)
    return f"""WITH af_src AS ({events_sql}),
af_win AS (
  SELECT {key_expr} AS k, {id_expr} AS pid,
         CAST({value_expr} AS BIGINT) AS v,
         count(*) OVER w AS n,
         sum(CAST({value_expr} AS BIGINT)) OVER w AS s,
         sum(CAST({value_expr} AS BIGINT) * CAST({value_expr} AS BIGINT))
           OVER w AS q
  FROM af_src
  WINDOW w AS (PARTITION BY {key_expr})
)
SELECT k AS {key_expr}, pid AS {id_expr}, v AS {value_expr}
FROM af_win
WHERE (n * v - s) * (n * v - s) > {zz} * (n * q - s * s)"""


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartile scores)
# ---------------------------------------------------------------------------


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ms_col: str = "ms",
    value_col: str = "value",
    n_tiles: int = 4,
) -> DataFrame:
    """Classic RFM user segmentation → one row per user
    ``(user, recency_days, frequency, monetary_cents, r, f, m,
    segment)`` with quartile (``n_tiles``) scores.

    The marketing-analytics staple recast on this engine's exact laws:
    recency is integer days between the user's last event and the
    corpus-wide max timestamp (both integer ms); frequency is a count;
    monetary sums integer CENTS (``round(value·100)`` per event before
    the sum — order-free, the money discipline every revenue query in
    this repo uses). Scores are ``ntile(n_tiles)`` over a TOTAL order
    (metric, then user id): ntile's fill-earlier-groups-bigger split is
    identical in Spark and DuckDB, and the unique tie-break pins every
    boundary row, so scores are bit-stable cross-engine. r=1 means most
    recent, f=n_tiles most frequent, m=n_tiles biggest spender;
    ``segment = r·100 + f·10 + m``.

    Scale shape: one groupBy(user) agg (map-side combine), then three
    global ntile windows over the USER table (not the event stream) —
    n_users rows through 3 single-partition sorts. At true 100 TB the
    single-partition ntile is the bottleneck; swap to percentile-bucket
    scores (2-pass: approx boundaries + broadcast) if the user table
    itself stops fitting a partition — documented, not silently done,
    because ntile ties at boundaries are the defined semantics here.
    """
    from pyspark.sql import Window

    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.max(F.col(ms_col)).alias("last_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.round(F.col(value_col) * F.lit(100.0)).cast("long")),
            F.lit(0).cast("long"),
        ).alias("monetary_cents"),
    )
    gmax = per_user.agg(F.max("last_ms").alias("gmax"))
    scored = per_user.crossJoin(F.broadcast(gmax)).select(
        "user",
        ((F.col("gmax") - F.col("last_ms")) / F.lit(86_400_000))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("user").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("user").asc())
    w_m = Window.orderBy(F.col("monetary_cents").desc(), F.col("user").asc())
    n = int(n_tiles)
    return scored.select(
        "user",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(n).over(w_r).alias("r"),
        F.ntile(n).over(w_f).alias("f"),
        F.ntile(n).over(w_m).alias("m"),
    ).withColumn(
        "segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m")
    )


def rfm_segments_sql(
    events_sql: str,
    user_expr: str = "user_id",
    ms_expr: str = "ms",
    value_expr: str = "value",
    n_tiles: int = 4,
) -> str:
    """DuckDB twin — identical cents law, global-max recency, and
    uniquely tie-broken ntile windows."""
    n = int(n_tiles)
    return f"""WITH rfm_src AS ({events_sql}),
rfm_u AS (
  SELECT {user_expr} AS u, max({ms_expr}) AS last_ms,
         count(*) AS frequency,
         CAST(coalesce(sum(CAST(round(({value_expr}) * 100.0) AS BIGINT)), 0)
              AS BIGINT) AS monetary_cents
  FROM rfm_src GROUP BY 1
),
rfm_s AS (
  SELECT u, CAST((SELECT max(last_ms) FROM rfm_u) - last_ms AS BIGINT)
           // 86400000 AS recency_days,
         frequency, monetary_cents
  FROM rfm_u
),
rfm_t AS (
  SELECT u, recency_days, frequency, monetary_cents,
         ntile({n}) OVER (ORDER BY recency_days ASC, u ASC) AS r,
         ntile({n}) OVER (ORDER BY frequency DESC, u ASC) AS f,
         ntile({n}) OVER (ORDER BY monetary_cents DESC, u ASC) AS m
  FROM rfm_s
)
SELECT u AS user, recency_days, frequency, monetary_cents, r, f, m,
       r * 100 + f * 10 + m AS segment
FROM rfm_t"""


# ---------------------------------------------------------------------------
# survival curve (activity lifetime, weekly grain)
# ---------------------------------------------------------------------------


def survival_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ms_col: str = "ms",
    max_weeks: int = 26,
) -> DataFrame:
    """Kaplan-Meier-style (uncensored) activity survival →
    ``(week_offset, n_surviving, survival)`` for offsets 0..``max_weeks``.

    The retention-cohort summary collapsed to one curve: what fraction
    of all users are still active ≥ k weeks after their FIRST activity
    (lifetime = last active week − first active week; a user survives
    offset k iff lifetime ≥ k). Censoring is deliberately out of scope
    (the events table is a closed window) — documented, not fudged.

    All-integer law: epoch-week floors, per-user min/max, then ONE
    groupBy(lifetime) + a reverse cumulative window over ≤ max_weeks+1
    rows; ``survival`` is the single terminal division. Offsets with no
    surviving users still appear (zero row) via a literal week spine —
    the curve is always dense, so downstream diffing never misreads a
    missing row as 100% churn.

    Scale: one agg over events, one agg over users, window over a
    constant-size spine — nothing grows with the corpus but the two
    hash aggs.
    """
    from pyspark.sql import Window

    wk = (F.col(ms_col) / F.lit(604_800_000)).cast("long")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        (F.max(wk) - F.min(wk)).alias("lifetime")
    )
    lif = (
        per_user.groupBy("lifetime")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("lifetime") <= F.lit(int(max_weeks)))
    )
    spine = (
        per_user.sparkSession.range(0, int(max_weeks) + 1)
        .select(F.col("id").alias("week_offset"))
    )
    tot = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    w = Window.orderBy(F.desc("week_offset")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(
            lif.select(F.col("lifetime").alias("week_offset"), "n"),
            "week_offset",
            "left",
        )
        .select(
            "week_offset", F.coalesce(F.col("n"), F.lit(0)).alias("n_at")
        )
        .select(
            "week_offset", F.sum("n_at").over(w).alias("n_surviving")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "week_offset",
            "n_surviving",
            (
                F.col("n_surviving").cast("double")
                / F.col("n_users").cast("double")
            ).alias("survival"),
        )
        .orderBy("week_offset")
    )


def survival_curve_sql(
    events_sql: str,
    user_expr: str = "user_id",
    ms_expr: str = "ms",
    max_weeks: int = 26,
) -> str:
    """DuckDB twin — identical week floors, dense spine, reverse
    cumulative count and terminal division.

    Lifetimes beyond ``max_weeks`` are excluded from the per-lifetime
    table on BOTH sides before the reverse cumulative sum, so
    ``n_surviving`` counts only users whose lifetime fits the reported
    curve (documented truncation, engine and twin identical)."""
    return f"""WITH sv_src AS ({events_sql}),
sv_u AS (
  SELECT {user_expr} AS u,
         max({ms_expr} // 604800000) - min({ms_expr} // 604800000)
           AS lifetime
  FROM sv_src GROUP BY 1
),
sv_l AS (
  SELECT lifetime, count(*) AS n FROM sv_u
  WHERE lifetime <= {int(max_weeks)} GROUP BY lifetime
),
sv_spine AS (
  SELECT unnest(range(0, {int(max_weeks) + 1})) AS week_offset
),
sv_c AS (
  SELECT s.week_offset,
         CAST(sum(coalesce(l.n, 0)) OVER (
           ORDER BY s.week_offset DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS n_surviving
  FROM sv_spine s LEFT JOIN sv_l l ON l.lifetime = s.week_offset
)
SELECT week_offset, n_surviving,
       CAST(n_surviving AS DOUBLE)
         / CAST((SELECT count(*) FROM sv_u) AS DOUBLE) AS survival
FROM sv_c
ORDER BY week_offset"""


# ---------------------------------------------------------------------------
# merged busy time (union-of-intervals length per key)
# ---------------------------------------------------------------------------


def busy_time(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """Union-of-intervals length per key → ``(key, n_intervals,
    busy_ms)`` — overlapping intervals counted ONCE.

    The utilization primitive (device uptime, session coverage, worker
    busy share) that a plain ``sum(end − start)`` gets wrong the moment
    intervals overlap. Classic sweep recast as one window pass: order a
    key's intervals by start, track the running max end seen BEFORE
    each interval, and add only the uncovered part
    ``max(0, end − max(start, covered))``. No boundary explode, no
    self-join, integers end to end.

    Degenerate inputs count as written: zero-length intervals add 0,
    ``end < start`` intervals add 0 (clamped) — loud data-quality
    checks belong upstream, the law here is total.

    Scale shape: one hash partition + per-key sort (the sessionize
    budget), one agg. The running max is an O(1)-state window — no
    RANGE scan, no per-key arrays.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(start_col).asc(), F.col(end_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = F.max(F.col(end_col)).over(w)
    # first interval of a key: covered is NULL — coalesce to -2^62 so
    # greatest() resolves to the interval's own start
    add = F.greatest(
        F.lit(0).cast("long"),
        F.col(end_col).cast("long")
        - F.greatest(
            F.col(start_col).cast("long"),
            F.coalesce(covered, F.lit(-(1 << 62))).cast("long"),
        ),
    )
    return (
        intervals.select(
            F.col(key_col), F.col(start_col), F.col(end_col), add.alias("__add")
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("__add").alias("busy_ms"),
        )
    )


def busy_time_sql(
    intervals_sql: str,
    key_expr: str = "user_id",
    start_expr: str = "start_ms",
    end_expr: str = "end_ms",
) -> str:
    """DuckDB twin — identical running-max sweep."""
    return f"""WITH bt_src AS ({intervals_sql}),
bt_w AS (
  SELECT {key_expr} AS k,
         greatest(CAST(0 AS BIGINT),
           CAST({end_expr} AS BIGINT) - greatest(
             CAST({start_expr} AS BIGINT),
             coalesce(max(CAST({end_expr} AS BIGINT)) OVER (
               PARTITION BY {key_expr}
               ORDER BY {start_expr} ASC, {end_expr} ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), {-(1 << 62)})
           )
         ) AS addn
  FROM bt_src
)
SELECT k AS {key_expr}, count(*) AS n_intervals,
       CAST(sum(addn) AS BIGINT) AS busy_ms
FROM bt_w GROUP BY k"""


# ---------------------------------------------------------------------------
# temporal autocorrelation (lag-k ACF over the daily count series)
# ---------------------------------------------------------------------------


def daily_autocorr(
    events: DataFrame,
    max_lag: int = 7,
    ms_col: str = "ms",
) -> DataFrame:
    """Lag-k autocorrelation of the corpus-wide daily event-count series
    → ``(lag, n_pairs, acf)`` for lags 1..``max_lag``.

    The temporal twin of the engine's Moran's I: does activity today
    predict activity k days out (weekly seasonality shows as an ACF
    spike at lag 7; crawler bursts decay geometrically). Same
    exact-moment trick: with ``S = Σx`` over the n OBSERVED days and
    ``z' = n·x − S`` (integer), the n² factors cancel in

        acf(k) = Σ_t z'_t · z'_{t+k}  /  Σ_t z'_t²

    so both sums accumulate exactly (DECIMAL(38,0) / HUGEINT) and ONE
    terminal double division runs per lag. Days with zero events inside
    the observed [min_day, max_day] span enter as x = 0 via a dense day
    spine — skipping them would silently shift lags.

    Scale shape: one groupBy(day) over events, a spine join, then a
    ``max_lag``-way self-join on ``day + k`` over the DAY table (≤
    thousands of rows regardless of corpus size) — the heavy lifting is
    the single daily count agg.
    """
    day = (F.col(ms_col) / F.lit(86_400_000)).cast("long")
    counts = events.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("x")
    )
    bounds = counts.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
        )
    )
    dense = (
        spine.join(counts, "day", "left")
        .select("day", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    tot = dense.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    z = dense.crossJoin(F.broadcast(tot)).select(
        "day", (F.col("n") * F.col("x") - F.col("s")).alias("z")
    ).localCheckpoint()
    den = z.agg(
        F.sum(
            F.col("z").cast("decimal(19,0)") * F.col("z").cast("decimal(19,0)")
        ).alias("den")
    )
    lags = None
    for k in range(1, int(max_lag) + 1):
        pair = (
            z.alias("a")
            .join(
                z.select(
                    (F.col("day") - F.lit(k)).alias("day"),
                    F.col("z").alias("z2"),
                ),
                "day",
            )
            .agg(
                F.lit(k).alias("lag"),
                F.count(F.lit(1)).alias("n_pairs"),
                F.coalesce(
                    F.sum(
                        F.col("z").cast("decimal(19,0)")
                        * F.col("z2").cast("decimal(19,0)")
                    ),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("num"),
            )
        )
        lags = pair if lags is None else lags.unionByName(pair)
    return (
        lags.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.when(
                F.col("den") > 0,
                F.col("num").cast("double") / F.col("den").cast("double"),
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def daily_autocorr_sql(
    events_sql: str, max_lag: int = 7, ms_expr: str = "ms"
) -> str:
    """DuckDB twin — identical dense spine, z' integers and per-lag
    exact sums."""
    lag_rows = "\nUNION ALL\n".join(
        f"""SELECT {k} AS lag, count(*) AS n_pairs,
       coalesce(sum(CAST(a.z AS HUGEINT) * b.z), 0) AS num
FROM ac_z a JOIN ac_z b ON b.day = a.day + {k}"""
        for k in range(1, int(max_lag) + 1)
    )
    return f"""WITH ac_src AS ({events_sql}),
ac_c AS (
  SELECT ({ms_expr}) // 86400000 AS day, count(*) AS x
  FROM ac_src GROUP BY 1
),
ac_spine AS (
  SELECT unnest(range((SELECT min(day) FROM ac_c),
                      (SELECT max(day) FROM ac_c) + 1)) AS day
),
ac_d AS (
  SELECT s.day, coalesce(c.x, 0) AS x
  FROM ac_spine s LEFT JOIN ac_c c ON c.day = s.day
),
ac_t AS (SELECT count(*) AS n, sum(x) AS s FROM ac_d),
ac_z AS (SELECT day, n * x - s AS z FROM ac_d, ac_t),
ac_den AS (SELECT sum(CAST(z AS HUGEINT) * z) AS den FROM ac_z),
ac_l AS (
{lag_rows}
)
SELECT lag, n_pairs,
       CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
         AS acf
FROM ac_l, ac_den
ORDER BY lag"""


# ---------------------------------------------------------------------------
# Gini concentration of per-key activity
# ---------------------------------------------------------------------------


def gini_concentration(
    events: DataFrame, key_col: str = "user_id", weight: F.Column | None = None
) -> DataFrame:
    """Gini coefficient of per-key mass → one row ``(n_keys, total,
    gini)``.

    The concentration gate every corpus/traffic audit runs: is activity
    (events per user, tokens per host, points per tile) spread out
    (G→0) or captured by a few heavy keys (G→1)? At web scale a
    high-and-rising host Gini is the canary for crawler traps and
    spam farms.

    Exact law: with per-key masses x sorted ASCENDING (ties by key —
    total order, so ranks are pinned), G = (2·Σ i·x_i − (n+1)·Σx) /
    (n·Σx). The rank-weighted sum accumulates in DECIMAL(38,0)/HUGEINT
    (rank ≤ n ~ 1e9 times mass ~ 1e9 overflows int64 summed); division
    is terminal. ``weight`` defaults to row count per key.

    Scale shape: one groupBy(key) agg over the input, then ONE global
    sort of the KEY table for ranks (the n_keys-sized table, not the
    corpus — same budget as RFM's ntile; swap to a two-pass histogram
    rank at 1e10+ keys, documented not silently done).
    """
    from pyspark.sql import Window

    w_expr = weight if weight is not None else F.count(F.lit(1))
    per = events.groupBy(F.col(key_col).alias("k")).agg(
        w_expr.cast("long").alias("x")
    )
    w = Window.orderBy(F.asc("x"), F.asc("k"))
    ranked = per.select(
        "x", F.row_number().over(w).alias("i")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("x").alias("total"),
        (
            (
                F.lit(2.0)
                * F.sum(
                    F.col("i").cast("decimal(19,0)")
                    * F.col("x").cast("decimal(19,0)")
                ).cast("double")
                - (F.count(F.lit(1)) + F.lit(1)).cast("double")
                  * F.sum("x").cast("double")
            )
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum("x").cast("double")
            )
        ).alias("gini"),
    )


def gini_concentration_sql(
    events_sql: str, key_expr: str = "user_id", weight_expr: str = "count(*)"
) -> str:
    """DuckDB twin — identical pinned ranks and exact rank-weighted sum."""
    return f"""WITH gn_p AS (
  SELECT {key_expr} AS k, CAST({weight_expr} AS BIGINT) AS x
  FROM ({events_sql}) GROUP BY {key_expr}
),
gn_r AS (
  SELECT x, row_number() OVER (ORDER BY x ASC, k ASC) AS i FROM gn_p
)
SELECT count(*) AS n_keys, CAST(sum(x) AS BIGINT) AS total,
       (2.0 * CAST(sum(CAST(i AS HUGEINT) * x) AS DOUBLE)
        - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(x) AS DOUBLE))
       / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) AS gini
FROM gn_r"""


# ---------------------------------------------------------------------------
# metronome (bot-cadence) detection via exact gap-CV
# ---------------------------------------------------------------------------


def metronome_users(
    events: DataFrame,
    cv_threshold_pct: int = 10,
    min_gaps: int = 5,
    key_col: str = "user_id",
    ms_col: str = "ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Flag keys whose inter-event cadence is suspiciously regular →
    ``(key, n_gaps, mean_gap_ms, cv, is_metronome)``.

    The classic bot signal: humans are bursty (gap CV ≳ 1), schedulers
    and scripted crawlers tick (CV ≈ 0). The flag is decided in EXACT
    integer arithmetic — population CV² of the gaps g is
    (n·Σg² − (Σg)²) / (Σg)², so

        CV < c/100  ⇔  100² · (n·Σg² − (Σg)²) < c² · (Σg)²

    both sides HUGEINT/DECIMAL(38,0) — no float ever decides a flag (a
    boundary user flips on a ulp otherwise). The reported ``cv`` column
    is a terminal double for humans; the ``is_metronome`` bit is the
    law. Keys with < ``min_gaps`` gaps or zero mean gap are not judged
    (flag NULL): too little evidence, and all-identical-timestamp keys
    are a data-quality case, not a cadence.

    Magnitude bound (ADVICE r4): the decisive products live in
    DECIMAL(38,0), which Spark silently NULLs on overflow with ANSI off
    — so a key where ``10⁴·n·Σg²`` or ``c²·(Σg)²`` nears 10³⁸ raises
    loudly (double-approximated guard with a 10× margin) instead of
    silently un-flagging a bot. For real clocks the bound is unreachable
    (30-year span ⇒ Σg ≤ ~10¹², Σg² ≤ 10²⁴, so even 10¹² gaps keep
    n·Σg² ≤ 10³⁶); hitting it means the ms column isn't milliseconds.
    The DuckDB twin needs no guard: HUGEINT overflow errors loudly.

    Scale shape: one per-key lag window (sessionize budget) + one agg.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ms_col).asc(), F.col(id_col).asc()
    )
    g = (F.col(ms_col) - F.lag(ms_col).over(w)).alias("g")
    gaps = events.select(F.col(key_col).alias("k"), g).where(
        F.col("g").isNotNull()
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")
    agg = gaps.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("g")).alias("sg"),
        F.sum(dec("g") * dec("g")).alias("sg2"),
    )
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("sg2")
        - F.col("sg") * F.col("sg")
    )
    judged = (F.col("n") >= F.lit(int(min_gaps))) & (F.col("sg") > 0)
    c2 = int(cv_threshold_pct) ** 2
    approx = F.greatest(
        F.lit(10_000.0)
        * F.col("n").cast("double")
        * F.col("sg2").cast("double"),
        F.lit(float(c2)) * F.col("sg").cast("double") * F.col("sg").cast("double"),
    )
    # the guard is woven INTO the selected flag column (a free-standing
    # unused column would be pruned by the optimizer and never fire)
    ovf = F.raise_error(
        F.lit(
            "metronome_users: gap magnitudes overflow the exact "
            "DECIMAL(38,0) flag law (10^4*n*sum(g^2) or c^2*sum(g)^2 "
            "near 1e38) — is the ms column really milliseconds?"
        )
    ).cast("int")
    return agg.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n_gaps"),
        (F.col("sg").cast("double") / F.col("n").cast("double")).alias(
            "mean_gap_ms"
        ),
        F.when(
            judged,
            F.sqrt(var_num.cast("double")) / F.col("sg").cast("double"),
        ).alias("cv"),
        F.when(judged & (approx > F.lit(1e37)), ovf)
        .when(
            judged,
            (
                F.lit(10_000).cast("decimal(38,0)") * var_num
                < F.lit(c2).cast("decimal(38,0)") * F.col("sg") * F.col("sg")
            ).cast("int"),
        )
        .alias("is_metronome"),
    )


def metronome_users_sql(
    events_sql: str,
    cv_threshold_pct: int = 10,
    min_gaps: int = 5,
    key_expr: str = "user_id",
    ms_expr: str = "ms",
    id_expr: str = "event_id",
) -> str:
    """DuckDB twin — identical gap law and integer flag inequality."""
    c2 = int(cv_threshold_pct) ** 2
    return f"""WITH mt_src AS ({events_sql}),
mt_g AS (
  SELECT {key_expr} AS k,
         ({ms_expr}) - lag({ms_expr}) OVER (
           PARTITION BY {key_expr} ORDER BY {ms_expr} ASC, {id_expr} ASC
         ) AS g
  FROM mt_src
),
mt_a AS (
  SELECT k, count(*) AS n,
         sum(CAST(g AS HUGEINT)) AS sg,
         sum(CAST(g AS HUGEINT) * g) AS sg2
  FROM mt_g WHERE g IS NOT NULL GROUP BY k
)
SELECT k AS {key_expr}, n AS n_gaps,
       CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_ms,
       CASE WHEN n >= {int(min_gaps)} AND sg > 0 THEN
         sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE)
       END AS cv,
       CASE WHEN n >= {int(min_gaps)} AND sg > 0 THEN
         CAST(10000 * (n * sg2 - sg * sg) < {c2} * sg * sg AS INT)
       END AS is_metronome
FROM mt_a"""


# ---------------------------------------------------------------------------
# per-key EWMA (exponentially weighted moving average) replay
# ---------------------------------------------------------------------------


def value_ewma(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 8,
    key_col: str = "user_id",
    ms_col: str = "ms",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Final EWMA of each key's value stream → ``(key, n_events,
    last_ms, ewma_cents)``.

    The streaming-health staple (smoothed per-tenant spend/latency/rate
    that a threshold alarm reads). α is a RATIONAL ``alpha_num /
    alpha_den`` — with a power-of-two denominator every step is

        s ← s + (x − s)·num/den

    evaluated in the IDENTICAL IEEE order on both engines, so the
    replay is bit-identical (no reassociation: it is a sequential
    fold by definition). Values enter as integer cents (the money
    law); the state is one double per key.

    Spark side replays per key inside Arrow ``applyInPandas`` (the
    fold is irreducibly sequential; Python touches only the per-key
    batch, never per-row plan rows); the DuckDB twin replays the same
    chain with a recursive CTE over per-key row_numbers. Both order by
    (ms, id) — total, pinned.

    Scale: one shuffle on the key + a linear per-key pass; state O(1)
    per key. The closed-form Σ α(1−α)^i decomposition would avoid the
    sequential pass but reorders the float ops — deliberately NOT used.
    """
    num, den = int(alpha_num), int(alpha_den)

    def fn(pdf):
        import pandas as _pd

        pdf = pdf.sort_values([ms_col, id_col])
        s = None
        for x in pdf["__cents"].tolist():
            xv = float(x)
            s = xv if s is None else s + (xv - s) * num / den
        return _pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_events": [len(pdf)],
                "last_ms": [int(pdf[ms_col].iloc[-1])],
                "ewma_cents": [s],
            }
        )

    staged = events.select(
        F.col(key_col),
        F.col(ms_col).cast("long").alias(ms_col),
        F.col(id_col).cast("long").alias(id_col),
        F.round(F.col(value_col) * F.lit(100.0)).cast("long").alias("__cents"),
    )
    return staged.groupBy(key_col).applyInPandas(
        fn, schema="key string, n_events long, last_ms long, ewma_cents double"
    )


def value_ewma_sql(
    events_sql: str,
    alpha_num: int = 1,
    alpha_den: int = 8,
    key_expr: str = "user_id",
    ms_expr: str = "ms",
    value_expr: str = "value",
    id_expr: str = "event_id",
) -> str:
    """DuckDB twin — recursive-CTE replay of the identical fold."""
    num, den = int(alpha_num), int(alpha_den)
    return f"""WITH RECURSIVE ew_ev AS MATERIALIZED (
  SELECT CAST({key_expr} AS VARCHAR) AS k, CAST({ms_expr} AS BIGINT) AS ms,
         CAST(round(({value_expr}) * 100.0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY {key_expr}
                            ORDER BY {ms_expr}, {id_expr}) AS rn
  FROM ({events_sql})
),
ew_step(k, rn, ms, s) AS (
  SELECT k, rn, ms, CAST(cents AS DOUBLE) FROM ew_ev WHERE rn = 1
  UNION ALL
  SELECT e.k, e.rn, e.ms,
         p.s + (CAST(e.cents AS DOUBLE) - p.s) * {num} / {den}
  FROM ew_step p JOIN ew_ev e ON e.k = p.k AND e.rn = p.rn + 1
)
SELECT k AS key, max(rn) AS n_events,
       arg_max(ms, rn) AS last_ms, arg_max(s, rn) AS ewma_cents
FROM ew_step GROUP BY k"""


# ---------------------------------------------------------------------------
# RFM at scale: broadcast quantile-boundary scores (no global sort)
# ---------------------------------------------------------------------------


def rfm_segments_scale(
    events: DataFrame,
    user_col: str = "user_id",
    ms_col: str = "ms",
    value_col: str = "value",
    n_tiles: int = 4,
) -> DataFrame:
    """The documented scale path of :func:`rfm_segments`: identical
    metrics, but scores come from EXACT rank-selected quantile
    boundaries instead of three single-partition ``ntile`` sorts —
    2-pass, broadcastable, no global sort of the user table.

    Law (fully pinned, but a DIFFERENT law than ntile at boundaries —
    this is its own operator, not a drop-in): for each metric, boundary
    b_j (j = 1..n_tiles−1) is the value at rank ``ceil(j·n/n_tiles)``
    under the metric's score order (recency ASC, frequency/monetary
    DESC — rank via row_number with user-id tie-break, picked by exact
    integer rank equality, the corpus-quantiles discipline); a user's
    score is ``1 + Σ_j [rank_metric > ceil(j·n/n_tiles)]`` — computed
    from the user's OWN rank, so ties at a boundary split exactly as
    the rank order says, reproducibly.

    Plan shape at 10^9 users: per-user agg; per-metric rank via ONE
    range-partitioned sort each (Spark's sort is distributed — the
    point is no single-partition window); the 3·(n_tiles−1) boundary
    rows collapse to a broadcast join. Here ranks double as the score
    inputs so the whole thing is three distributed sorts + arithmetic —
    no driver state, no single partition anywhere.
    """
    from pyspark.sql import Window

    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.max(F.col(ms_col)).alias("last_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.round(F.col(value_col) * F.lit(100.0)).cast("long")),
            F.lit(0).cast("long"),
        ).alias("monetary_cents"),
    )
    gmax = per_user.agg(F.max("last_ms").alias("gmax"))
    scored = per_user.crossJoin(F.broadcast(gmax)).select(
        "user",
        ((F.col("gmax") - F.col("last_ms")) / F.lit(86_400_000))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    n_t = int(n_tiles)
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("user").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("user").asc())
    w_m = Window.orderBy(F.col("monetary_cents").desc(), F.col("user").asc())
    ranked = scored.select(
        "*",
        F.row_number().over(w_r).alias("__rr"),
        F.row_number().over(w_f).alias("__rf"),
        F.row_number().over(w_m).alias("__rm"),
    )
    cnt = ranked.agg(F.count(F.lit(1)).alias("n"))

    def score(rank_col):
        # 1 + number of boundary ranks strictly below this rank;
        # boundary_j = ceil(j*n/n_tiles) evaluated in exact integers
        s = F.lit(1)
        for j in range(1, n_t):
            # integer ceil(j*n/n_t) = (j*n + n_t - 1) div n_t — Spark's
            # integral `div`, no float division anywhere
            b = F.expr(f"({j} * n + {n_t - 1}) div {n_t}")
            s = s + (F.col(rank_col) > b).cast("int")
        return s

    return ranked.crossJoin(F.broadcast(cnt)).select(
        "user",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("__rr").alias("r"),
        score("__rf").alias("f"),
        score("__rm").alias("m"),
    ).withColumn(
        "segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m")
    )


def rfm_segments_scale_sql(
    events_sql: str,
    user_expr: str = "user_id",
    ms_expr: str = "ms",
    value_expr: str = "value",
    n_tiles: int = 4,
) -> str:
    """DuckDB twin — identical ranks, exact integer boundaries."""
    n_t = int(n_tiles)

    def score(rank: str) -> str:
        parts = " + ".join(
            f"CAST({rank} > ({j} * n + {n_t - 1}) // {n_t} AS INT)"
            for j in range(1, n_t)
        )
        return f"1 + {parts}"

    return f"""WITH rs_src AS ({events_sql}),
rs_u AS (
  SELECT {user_expr} AS u, max({ms_expr}) AS last_ms,
         count(*) AS frequency,
         CAST(coalesce(sum(CAST(round(({value_expr}) * 100.0) AS BIGINT)), 0)
              AS BIGINT) AS monetary_cents
  FROM rs_src GROUP BY 1
),
rs_s AS (
  SELECT u, CAST((SELECT max(last_ms) FROM rs_u) - last_ms AS BIGINT)
           // 86400000 AS recency_days,
         frequency, monetary_cents
  FROM rs_u
),
rs_r AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_days ASC, u ASC) AS rr,
         row_number() OVER (ORDER BY frequency DESC, u ASC) AS rf,
         row_number() OVER (ORDER BY monetary_cents DESC, u ASC) AS rm,
         (SELECT count(*) FROM rs_s) AS n
  FROM rs_s
)
SELECT u AS user, recency_days, frequency, monetary_cents,
       {score('rr')} AS r, {score('rf')} AS f, {score('rm')} AS m,
       ({score('rr')}) * 100 + ({score('rf')}) * 10 + ({score('rm')})
         AS segment
FROM rs_r"""


# ---------------------------------------------------------------------------
# CUSUM drift alarms (pure-integer sequential replay)
# ---------------------------------------------------------------------------


def cusum_alarms(
    events: DataFrame,
    target_cents: int,
    slack_cents: int,
    threshold_cents: int,
    key_col: str = "user_id",
    ms_col: str = "ms",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One-sided CUSUM drift detection per key → ``(key, n_events,
    n_alarms, first_alarm_ms, max_s)``.

    The sequential change-point gate (Page's test): spend/latency/rate
    creeping above ``target`` raises an alarm long before any
    fixed-window mean notices. State replays

        S ← max(0, S + x − target − slack);  alarm when S > threshold

    with x in integer CENTS and every constant an integer — the whole
    recursion is INTEGER arithmetic, so cross-engine equality is exact
    with no float anywhere (one law stronger than the EWMA op's
    bit-identical doubles). S resets to 0 after an alarm (the standard
    restart convention, documented). Replay order (ms, id) — total.

    Spark side: Arrow ``applyInPandas`` per key (irreducibly
    sequential); DuckDB twin: recursive CTE over per-key row chains —
    the same machinery pair as :func:`value_ewma` / the token bucket.
    Scale: one key shuffle + linear pass, O(1) state per key.
    """
    t, k, h = int(target_cents), int(slack_cents), int(threshold_cents)

    def fn(pdf):
        import pandas as _pd

        pdf = pdf.sort_values([ms_col, id_col])
        s = 0
        n_alarms = 0
        first = None
        mx = 0
        for ms, x in zip(pdf[ms_col].tolist(), pdf["__cents"].tolist()):
            s = max(0, s + int(x) - t - k)
            mx = max(mx, s)
            if s > h:
                n_alarms += 1
                if first is None:
                    first = int(ms)
                s = 0
        return _pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_events": [len(pdf)],
                "n_alarms": [n_alarms],
                # -1 sentinel (not NULL): keeps the column soundly typed
                # for row-set comparison tooling
                "first_alarm_ms": [first if first is not None else -1],
                "max_s": [mx],
            }
        )

    staged = events.select(
        F.col(key_col),
        F.col(ms_col).cast("long").alias(ms_col),
        F.col(id_col).cast("long").alias(id_col),
        F.round(F.col(value_col) * F.lit(100.0)).cast("long").alias("__cents"),
    )
    return staged.groupBy(key_col).applyInPandas(
        fn,
        schema=(
            "key string, n_events long, n_alarms long, "
            "first_alarm_ms long, max_s long"
        ),
    )


def cusum_alarms_sql(
    events_sql: str,
    target_cents: int,
    slack_cents: int,
    threshold_cents: int,
    key_expr: str = "user_id",
    ms_expr: str = "ms",
    value_expr: str = "value",
    id_expr: str = "event_id",
) -> str:
    """DuckDB twin — identical integer recursion with alarm reset."""
    t, k, h = int(target_cents), int(slack_cents), int(threshold_cents)
    step = f"greatest(0, s.s + e.cents - {t} - {k})"
    return f"""WITH RECURSIVE cu_ev AS MATERIALIZED (
  SELECT CAST({key_expr} AS VARCHAR) AS k, CAST({ms_expr} AS BIGINT) AS ms,
         CAST(round(({value_expr}) * 100.0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY {key_expr}
                            ORDER BY {ms_expr}, {id_expr}) AS rn
  FROM ({events_sql})
),
cu_step(k, rn, ms, s, n_alarms, first_alarm_ms, max_s) AS (
  SELECT k, rn, ms,
         CASE WHEN greatest(0, cents - {t} - {k}) > {h} THEN 0
              ELSE greatest(0, cents - {t} - {k}) END,
         CAST(greatest(0, cents - {t} - {k}) > {h} AS BIGINT),
         CASE WHEN greatest(0, cents - {t} - {k}) > {h} THEN ms END,
         greatest(0, cents - {t} - {k})
  FROM cu_ev WHERE rn = 1
  UNION ALL
  SELECT e.k, e.rn, e.ms,
         CASE WHEN {step} > {h} THEN 0 ELSE {step} END,
         s.n_alarms + CAST({step} > {h} AS BIGINT),
         coalesce(s.first_alarm_ms,
                  CASE WHEN {step} > {h} THEN e.ms END),
         greatest(s.max_s, {step})
  FROM cu_step s JOIN cu_ev e ON e.k = s.k AND e.rn = s.rn + 1
)
SELECT k AS key, max(rn) AS n_events,
       arg_max(n_alarms, rn) AS n_alarms,
       coalesce(max(first_alarm_ms), -1) AS first_alarm_ms,
       arg_max(max_s, rn) AS max_s
FROM cu_step GROUP BY k"""
