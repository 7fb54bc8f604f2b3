"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-stable only per partitioning — a repartition, AQE
re-plan, or executor loss changes which rows survive. At 100 TB, sample
membership must be a PURE FUNCTION of the row (so reruns, backfills and
the DuckDB oracle all agree), so every sampler here derives a uniform
from md5 of the row id (identical hex on Spark/DuckDB; the repo-wide
cross-engine hash discipline, see functions/text.py):

    u(id) = conv(md5(salt || id)[:15 hex], 16, 10) / 2^60   in [0, 1)

All comparisons against u are single IEEE-double ops (one division, one
compare) — bit-identical on both engines, so value-hash oracle checks
pass exactly.

Plan shape (100 TB lens): every sampler is a scan-riding filter or
projection — no shuffle, no sort, no sampling-induced skew. The
stratified rates arrive as a broadcast-free literal CASE (strata counts
are small by definition); nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "hash_uniform_sql",
    "stratified_sample",
    "weighted_sample",
    "hash_split",
    "hash_split_sql",
    "quota_sample",
    "quota_sample_sql",
]

_U_DENOM = float(1 << 60)  # 15 hex chars = 60 bits


def hash_uniform(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from the row id (md5, 60 bits)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(_U_DENOM)


def hash_uniform_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin — textually the same arithmetic."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) / {_U_DENOM!r}"
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep a row iff u(id) < rate[stratum].

    The `sampleBy` analog, but membership is a pure function of (id,
    stratum rates) — stable across reruns, partitionings and engines.
    Rates fold into one literal CASE expression riding the scan."""
    rate: Column = F.lit(float(default_rate))
    for s in sorted(rates, reverse=True):
        rate = F.when(F.col(stratum_col) == F.lit(s), F.lit(float(rates[s]))).otherwise(
            rate
        )
    return df.where(hash_uniform(id_col, salt) < rate)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    scale: float = 1.0,
    salt: str = "wt",
) -> DataFrame:
    """Poisson (Bernoulli) weighted sample: P(keep) = min(1, scale * w).

    Inclusion probability proportional to the row weight — the standard
    probability-proportional-to-size design for quality-weighted corpus
    subsampling. Expected sample size = scale * sum(w); membership is
    again a pure row function (no transcendentals, so the DuckDB twin is
    bit-exact — deliberately Poisson rather than Efraimidis-Spirakis
    top-k, whose u^(1/w) key has no cross-engine pow guarantee)."""
    p = F.least(F.lit(1.0), F.col(weight_col).cast("double") * F.lit(float(scale)))
    return df.where(hash_uniform(id_col, salt) < p)


def hash_split(
    id_col: Column | str,
    fracs: dict[str, float],
    salt: str = "split",
) -> Column:
    """Deterministic dataset-split label ('train'/'valid'/'test', ...).

    `fracs` maps label -> fraction; fractions are laid out as cumulative
    [0,1) intervals in sorted-label order and the row's u(id) picks its
    interval. Fractions must sum to 1 (+-1e-9). A row's split never
    changes as the corpus grows — the property shuffling-based splits
    lack."""
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_uniform(id_col, salt)
    labels = sorted(fracs)
    # nested WHENs, lowest threshold innermost: each row takes the first
    # cumulative interval whose upper bound exceeds its u; the last label
    # absorbs fp slack at the top of [0, 1)
    expr: Column = F.lit(labels[-1])
    hi = 0.0
    cuts = []
    for lab in labels[:-1]:
        hi += fracs[lab]
        cuts.append((lab, hi))
    for lab, cut in reversed(cuts):
        expr = F.when(u < F.lit(cut), F.lit(lab)).otherwise(expr)
    return expr


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "quota",
) -> DataFrame:
    """Per-group quota: keep at most ``k`` rows per ``group_col``, chosen
    by the deterministic hash order u(id) (ties broken by id).

    The per-host cap every web-corpus pipeline applies before training
    (no single domain may dominate the mixture). Selection is a pure
    function of (id, group) — a host's kept set never changes when OTHER
    hosts grow, and reruns/backfills/the oracle agree row-for-row. That
    is what `ORDER BY random() LIMIT k` per host cannot give.

    Plan shape (100 TB lens): one hash-partitioned window per group key
    — rank-k selection is a single shuffle on the host key; there is no
    global sort. Hot hosts are exactly the rows the cap discards, and
    the window's per-partition sort is bounded by the host's row count
    (AQE skew split applies to the exchange). For pathological single
    hosts an optional pre-filter on u(id) < q with q >> k/|host| can
    shed the tail before the sort; not applied by default because it
    requires a host-size estimate.
    """
    u = hash_uniform(id_col, salt)
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__qrn", F.row_number().over(w))
        .where(F.col("__qrn") <= int(k))
        .drop("__qrn")
    )


def quota_sample_sql(
    group_expr: str, id_expr: str, k: int, salt: str = "quota"
) -> str:
    """DuckDB twin predicate fragment: the window rank <= k filter.

    Usable as ``QUALIFY {quota_sample_sql(...)}`` or via a ranked CTE —
    identical ordering arithmetic to :func:`quota_sample`."""
    u = hash_uniform_sql(id_expr, salt)
    return (
        f"row_number() OVER (PARTITION BY {group_expr} "
        f"ORDER BY ({u}), {id_expr}) <= {int(k)}"
    )


def hash_split_sql(expr: str, fracs: dict[str, float], salt: str = "split") -> str:
    """DuckDB twin of hash_split — identical interval arithmetic."""
    u = hash_uniform_sql(expr, salt)
    labels = sorted(fracs)
    out = f"'{labels[-1]}'"
    hi = 0.0
    cuts = []
    for lab in labels[:-1]:
        hi += fracs[lab]
        cuts.append((lab, hi))
    for lab, cut in reversed(cuts):
        out = f"CASE WHEN ({u}) < {cut!r} THEN '{lab}' ELSE {out} END"
    return out


# ---------------------------------------------------------------------------
# training-mix apportionment (largest-remainder / Hamilton)
# ---------------------------------------------------------------------------


def mix_apportion(
    groups: DataFrame,
    budget: int,
    key_col: str = "source",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Apportion an integer ``budget`` across groups proportionally to
    ``count_col`` → ``(key, n, quota)`` with ``Σ quota == budget``
    EXACTLY.

    The training-mix builder's missing primitive: "sample 10M tokens
    from this corpus, proportional to source size" — naive
    ``round(budget·nᵢ/total)`` quotas don't sum to the budget, and
    at 10^12-token scale the drift is millions of tokens. This is the
    largest-remainder (Hamilton) method, all-integer: floor quotas
    ``budget·nᵢ // total``, then the ``budget − Σ floors`` leftover
    units go to the largest remainders ``budget·nᵢ mod total`` (ties →
    key ASC — fully pinned, and remainder comparison needs NO division:
    the remainders are already on the common denominator ``total``).

    Pure integer arithmetic end to end — bit-exact cross-engine, no
    float quota anywhere. ``budget·nᵢ`` is computed in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB): a 10^12-token corpus times a 10^7
    budget overflows int64, silently on some engines — not here.

    Scale shape: one agg per group (caller usually did it), one global
    sum broadcast back, one row_number over the GROUP table (small by
    definition). Zero shuffles over the corpus itself.
    """
    from pyspark.sql import Window

    b = F.lit(int(budget)).cast("decimal(38,0)")
    g = groups.select(
        F.col(key_col).alias("k"),
        F.col(count_col).cast("long").alias("n"),
    )
    tot = g.agg(F.sum(F.col("n").cast("decimal(38,0)")).alias("t"))
    staged = g.crossJoin(F.broadcast(tot)).select(
        "k",
        "n",
        (b * F.col("n").cast("decimal(38,0)")).alias("bn"),
        F.col("t"),
    )
    # exact floor division without trusting decimal-division rounding:
    # rem = bn mod t is exact, so (bn - rem) / t is an exact integer
    # quotient (representable well inside the result scale)
    floors = staged.select(
        "k",
        "n",
        ((F.col("bn") - F.col("bn") % F.col("t")) / F.col("t"))
        .cast("decimal(38,0)")
        .alias("fl"),
        (F.col("bn") % F.col("t")).alias("rem"),
        "t",
    )
    leftover = floors.agg(
        (b - F.sum("fl")).cast("long").alias("left")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("k"))
    return (
        floors.crossJoin(F.broadcast(leftover))
        .select(
            F.col("k").alias(key_col),
            "n",
            (
                F.col("fl").cast("long")
                + (F.row_number().over(w) <= F.col("left")).cast("long")
            ).alias("quota"),
        )
        .orderBy(key_col)
    )


def mix_apportion_sql(
    groups_sql: str,
    budget: int,
    key_expr: str = "source",
    count_expr: str = "n_tokens",
) -> str:
    """DuckDB twin — identical floor/remainder law on HUGEINT, same
    pinned remainder ranking."""
    b = int(budget)
    return f"""WITH ma_g AS (
  SELECT {key_expr} AS k, CAST({count_expr} AS BIGINT) AS n
  FROM ({groups_sql})
),
ma_t AS (SELECT sum(CAST(n AS HUGEINT)) AS t FROM ma_g),
ma_f AS (
  SELECT k, n,
         (CAST({b} AS HUGEINT) * n) // t AS fl,
         (CAST({b} AS HUGEINT) * n) % t AS rem
  FROM ma_g, ma_t
),
ma_l AS (SELECT CAST({b} AS HUGEINT) - sum(fl) AS leftover FROM ma_f)
SELECT k AS {key_expr}, n,
       CAST(fl + CAST(row_number() OVER (ORDER BY rem DESC, k ASC)
                      <= leftover AS INT) AS BIGINT) AS quota
FROM ma_f, ma_l
ORDER BY {key_expr}"""
