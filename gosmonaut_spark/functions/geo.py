"""Geodesic helpers — native Column expressions (JVM-side, codegen)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters — built-in trig only, no UDF."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL twin for the DuckDB oracle — textually the same math."""
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


# ---------------------------------------------------------------------------
# polygon metrics (shoelace area + centroid) in integer micro-units
#
# Planar doubles summed across rows round differently per shuffle order, so
# the per-edge cross terms are rounded to BIGINT micro-units FIRST and only
# integers are ever summed — the same discipline as money-in-cents
# (queries.py) and bit-exact vs the DuckDB twin. Inputs are closed rings
# (first vertex == last, the polygons_from_ways/_rects shape); signs follow
# ring orientation (CCW positive).
#
# All per-ring math happens INSIDE one row via higher-order functions over
# the vertex arrays — no explode, no shuffle, rides the scan.
# ---------------------------------------------------------------------------

_MICRO = 1_000_000.0


def _cross_micro(lats: Column, lons: Column, i: Column) -> Column:
    x1, y1 = F.element_at(lons, i), F.element_at(lats, i)
    x2, y2 = F.element_at(lons, i + 1), F.element_at(lats, i + 1)
    return F.round((x1 * y2 - x2 * y1) * F.lit(_MICRO)).cast("long")


def polygon_stats(lats: Column | str, lons: Column | str) -> dict[str, Column]:
    """Per-ring metrics from closed vertex arrays:

    * ``n_vertices`` — distinct ring vertices (closing vertex excluded)
    * ``area2x_micro`` — signed 2*area in degree^2 micro-units (shoelace)
    * ``cx_num_micro`` / ``cy_num_micro`` — centroid numerators
      (sum (v_i + v_{i+1}) * cross_i, micro-rounded); centroid =
      num / (3 * area2x) for callers wanting the float
    """
    la = F.col(lats) if isinstance(lats, str) else lats
    lo = F.col(lons) if isinstance(lons, str) else lons
    idx = F.sequence(F.lit(1), F.size(la) - F.lit(1))

    def _sum(parts: Column) -> Column:
        return F.aggregate(
            parts, F.lit(0).cast("long"), lambda acc, v: acc + v
        )

    cross = F.transform(idx, lambda i: _cross_micro(la, lo, i))
    cxn = F.transform(
        idx,
        lambda i: F.round(
            (F.element_at(lo, i) + F.element_at(lo, i + 1))
            * (
                F.element_at(lo, i) * F.element_at(la, i + 1)
                - F.element_at(lo, i + 1) * F.element_at(la, i)
            )
            * F.lit(_MICRO)
        ).cast("long"),
    )
    cyn = F.transform(
        idx,
        lambda i: F.round(
            (F.element_at(la, i) + F.element_at(la, i + 1))
            * (
                F.element_at(lo, i) * F.element_at(la, i + 1)
                - F.element_at(lo, i + 1) * F.element_at(la, i)
            )
            * F.lit(_MICRO)
        ).cast("long"),
    )
    return {
        "n_vertices": (F.size(la) - F.lit(1)).cast("int"),
        "area2x_micro": _sum(cross),
        "cx_num_micro": _sum(cxn),
        "cy_num_micro": _sum(cyn),
    }


def polygon_stats_sql(lats: str, lons: str) -> dict[str, str]:
    """DuckDB twin — identical per-edge rounding and integer sums (1-based
    list indexing on both engines; list folds are order-free because every
    element is already a BIGINT)."""
    idx = f"range(1, len({lats}))"
    cross = (
        f"CAST(round(({lons}[i] * {lats}[i + 1] - {lons}[i + 1] * {lats}[i])"
        f" * {_MICRO!r}) AS BIGINT)"
    )
    cxn = (
        f"CAST(round(({lons}[i] + {lons}[i + 1]) * "
        f"({lons}[i] * {lats}[i + 1] - {lons}[i + 1] * {lats}[i])"
        f" * {_MICRO!r}) AS BIGINT)"
    )
    cyn = (
        f"CAST(round(({lats}[i] + {lats}[i + 1]) * "
        f"({lons}[i] * {lats}[i + 1] - {lons}[i + 1] * {lats}[i])"
        f" * {_MICRO!r}) AS BIGINT)"
    )

    def _sum(term: str) -> str:
        return (
            f"CAST(list_sum(list_transform({idx}, i -> {term})) AS BIGINT)"
        )

    return {
        "n_vertices": f"CAST(len({lats}) - 1 AS INT)",
        "area2x_micro": _sum(cross),
        "cx_num_micro": _sum(cxn),
        "cy_num_micro": _sum(cyn),
    }


# ---------------------------------------------------------------------------
# polyline (way) length — haversine fold along the vertex arrays
# ---------------------------------------------------------------------------


def polyline_length_m(lats: Column | str, lons: Column | str) -> Column:
    """Great-circle length in meters along ordered vertex arrays.

    The way-geometry metric the assembly pipeline feeds (road/river/track
    length rollups). All per-way math happens INSIDE one row via
    higher-order functions — no explode, no shuffle, rides the scan
    (same discipline as polygon_stats). The segment fold is explicit
    left-to-right with a 0.0 init (IEEE: 0+x == x), so DuckDB's
    ``list_reduce`` twin reproduces the identical rounding sequence;
    trig may differ by an ulp between libms, so consumers compare at
    round(len, 3) — millimeters on lengths up to thousands of km.
    Degenerate ways (<2 vertices) have length 0.
    """
    lats = F.col(lats) if isinstance(lats, str) else lats
    lons = F.col(lons) if isinstance(lons, str) else lons
    segs = F.transform(
        F.sequence(F.lit(1), F.size(lats) - 1),
        lambda i: haversine_m(
            F.element_at(lats, i),
            F.element_at(lons, i),
            F.element_at(lats, i + 1),
            F.element_at(lons, i + 1),
        ),
    )
    total = F.aggregate(segs, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(F.size(lats) < 2, F.lit(0.0)).otherwise(total)


def polyline_length_sql(lats: str, lons: str) -> str:
    """DuckDB twin — same fold order (list_reduce seeds with the first
    element; Spark seeds 0.0, and 0+x == x exactly, so sequences match)."""
    hav = haversine_sql(
        f"{lats}[i]", f"{lons}[i]", f"{lats}[i + 1]", f"{lons}[i + 1]"
    )
    return (
        f"CASE WHEN len({lats}) < 2 THEN 0.0 ELSE "
        f"list_reduce(list_transform(range(1, len({lats})), i -> {hav}), "
        f"(acc, x) -> acc + x) END"
    )


# ---------------------------------------------------------------------------
# trajectory (moving-object track) length — lag window over a point stream
# ---------------------------------------------------------------------------


def trajectory_length(
    pts,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """Per-key great-circle track length over a time-ordered point stream
    — the GPS-trace metric (distance traveled per user/vehicle/day).

    Complements :func:`polyline_length_m`: that one folds vertex ARRAYS
    already assembled into one row; this one walks a row-per-point
    stream with a lag window (the shape event pipelines actually have),
    so no array assembly or collect_list shuffle is needed.

    Segment distances are rounded to integer MILLIMETERS before the
    per-key sum, so the aggregate is an order-free integer sum — exact
    cross-engine regardless of partitioning (trig ulps live below the
    mm rounding except on measure-zero boundaries). Stream order is
    total: ``order_col`` ascending, ties broken by ``id_col``.

    Returns one row per key: (key, n_points, length_mm).

    Scale shape (100 TB lens): one hash partition + per-key sort for the
    lag window, then one hash agg — the sessionize budget; no arrays, no
    explode, no driver state.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    seg = haversine_m(
        F.lag(lat_col).over(w),
        F.lag(lon_col).over(w),
        F.col(lat_col),
        F.col(lon_col),
    )
    staged = pts.select(
        F.col(key_col),
        F.round(seg * F.lit(1000.0)).cast("long").alias("__seg_mm"),
    )
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("__seg_mm"), F.lit(0).cast("long")).alias(
            "length_mm"
        ),
    )


def trajectory_length_sql(
    pts_sql: str, key_expr: str, order_expr: str, id_expr: str,
    lat_expr: str = "lat", lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical lag law and mm-integer segment rounding.
    ``pts_sql`` must yield the key/order/id/lat/lon columns."""
    over = (
        f"OVER (PARTITION BY {key_expr} "
        f"ORDER BY {order_expr} ASC, {id_expr} ASC)"
    )
    hav = haversine_sql(
        f"lag({lat_expr}) {over}",
        f"lag({lon_expr}) {over}",
        lat_expr,
        lon_expr,
    )
    return f"""WITH tr_src AS ({pts_sql}),
tr_seg AS (
  SELECT {key_expr} AS k,
         CAST(round(({hav}) * 1000.0) AS BIGINT) AS seg_mm
  FROM tr_src
)
SELECT k AS {key_expr}, count(*) AS n_points,
       CAST(coalesce(sum(seg_mm), 0) AS BIGINT) AS length_mm
FROM tr_seg GROUP BY k"""


def trajectory_sinuosity(
    pts,
    key_col: str,
    order_col: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """Per-key track sinuosity — traveled path length over straight-line
    displacement between the first and last ping. The movement-ecology /
    fleet-telemetry shape metric: ~1 for direct transit, large for
    wandering or circling tracks, and a cheap GPS-noise flag (jittery
    stationary devices show huge path / near-zero displacement).

    Composes :func:`trajectory_length`'s exact law: segment AND
    displacement distances round to integer millimeters, so both sides
    of the ratio are order-free integer aggregates and the single
    terminal division is the only float op — exact cross-engine.
    Endpoints are taken under the same total order (``order_col`` asc,
    ``id_col`` asc) via min/max of a row_number, so ties cannot flip
    endpoints between engines.

    Returns (key, n_points, path_mm, direct_mm, sinuosity), one row per
    key with ≥ 2 points; ``sinuosity`` is NULL when the track closes on
    itself exactly (direct_mm = 0).

    Scale shape: one hash partition + per-key sort feeding BOTH the lag
    window and the row_number (same window spec → one shuffle, one
    sort), then a single hash agg. No arrays, no driver state.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    seg = haversine_m(
        F.lag(lat_col).over(w),
        F.lag(lon_col).over(w),
        F.col(lat_col),
        F.col(lon_col),
    )
    staged = pts.select(
        F.col(key_col),
        F.row_number().over(w).alias("__rn"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
        F.round(seg * F.lit(1000.0)).cast("long").alias("__seg_mm"),
    )
    agg = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("__seg_mm"), F.lit(0).cast("long")).alias("path_mm"),
        F.min_by(F.col("__lat"), F.col("__rn")).alias("__lat0"),
        F.min_by(F.col("__lon"), F.col("__rn")).alias("__lon0"),
        F.max_by(F.col("__lat"), F.col("__rn")).alias("__lat1"),
        F.max_by(F.col("__lon"), F.col("__rn")).alias("__lon1"),
    )
    direct = F.round(
        haversine_m(
            F.col("__lat0"), F.col("__lon0"), F.col("__lat1"), F.col("__lon1")
        )
        * F.lit(1000.0)
    ).cast("long")
    return (
        agg.where(F.col("n_points") >= 2)
        .select(
            key_col,
            "n_points",
            "path_mm",
            direct.alias("direct_mm"),
            F.when(
                direct > 0,
                F.col("path_mm").cast("double") / direct.cast("double"),
            ).alias("sinuosity"),
        )
    )


def trajectory_sinuosity_sql(
    pts_sql: str, key_expr: str, order_expr: str, id_expr: str,
    lat_expr: str = "lat", lon_expr: str = "lon",
) -> str:
    """DuckDB twin — identical mm-integer law, row_number endpoints via
    arg_min/arg_max, single terminal division."""
    over = (
        f"OVER (PARTITION BY {key_expr} "
        f"ORDER BY {order_expr} ASC, {id_expr} ASC)"
    )
    hav = haversine_sql(
        f"lag({lat_expr}) {over}",
        f"lag({lon_expr}) {over}",
        lat_expr,
        lon_expr,
    )
    endpoint_hav = haversine_sql("lat0", "lon0", "lat1", "lon1")
    return f"""WITH sin_src AS ({pts_sql}),
sin_seg AS (
  SELECT {key_expr} AS k,
         row_number() {over} AS rn,
         {lat_expr} AS lat, {lon_expr} AS lon,
         CAST(round(({hav}) * 1000.0) AS BIGINT) AS seg_mm
  FROM sin_src
),
sin_agg AS (
  SELECT k, count(*) AS n_points,
         CAST(coalesce(sum(seg_mm), 0) AS BIGINT) AS path_mm,
         arg_min(lat, rn) AS lat0, arg_min(lon, rn) AS lon0,
         arg_max(lat, rn) AS lat1, arg_max(lon, rn) AS lon1
  FROM sin_seg GROUP BY k
)
SELECT k AS {key_expr}, n_points, path_mm,
       CAST(round(({endpoint_hav}) * 1000.0) AS BIGINT) AS direct_mm,
       CASE WHEN CAST(round(({endpoint_hav}) * 1000.0) AS BIGINT) > 0
            THEN CAST(path_mm AS DOUBLE)
                 / CAST(CAST(round(({endpoint_hav}) * 1000.0) AS BIGINT) AS DOUBLE)
       END AS sinuosity
FROM sin_agg WHERE n_points >= 2"""


def ring_orientation(lats: Column | str, lons: Column | str) -> Column:
    """Winding order of a CLOSED ring (first vertex repeated last):
    ``'ccw'`` / ``'cw'`` / ``'degenerate'`` by the sign of the planar
    shoelace sum Σ xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ, folded left-to-right (the
    established Spark ``aggregate`` == DuckDB ``list_reduce`` pairing,
    so the sign — the only thing emitted — is cross-engine exact; ±0.0
    both read degenerate). OSM convention: outer rings ccw."""
    la = F.col(lats) if isinstance(lats, str) else lats
    lo = F.col(lons) if isinstance(lons, str) else lons
    sh = F.aggregate(
        F.sequence(F.lit(1), F.size(la) - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(lo, i) * F.element_at(la, i + 1)
            - F.element_at(lo, i + 1) * F.element_at(la, i)
        ),
    )
    return (
        F.when(sh > 0, F.lit("ccw"))
        .when(sh < 0, F.lit("cw"))
        .otherwise(F.lit("degenerate"))
    )


# ---------------------------------------------------------------------------
# rectangle clipping (Sutherland–Hodgman as pure array algebra)
# ---------------------------------------------------------------------------


def _clip_halfplane(la: Column, lo: Column, axis: str, bound: float, keep_ge: bool):
    """One Sutherland–Hodgman half-plane pass over a CLOSED ring.

    Per edge (v₁→v₂): emit the boundary intersection when the edge
    crosses, then v₂ when v₂ is inside — flatten over edges in order,
    re-close. Pure per-edge local algebra (``flatten ∘ transform``, no
    fold), so the DuckDB twin is the identical expression shape and the
    interpolation ``o₁ + t·(o₂−o₁)`` with ``t = (b−a₁)/(a₂−a₁)`` is
    bit-identical cross-engine. Inside test is INCLUSIVE (boundary
    vertices kept); a₁ == a₂ implies both endpoints on the same side, so
    the crossing branch never divides by zero. ``bound`` may be a float
    (fixed window) or a Column (per-row window, e.g. a covering cell's
    bbox edge)."""
    b = bound if isinstance(bound, Column) else F.lit(float(bound))

    def a_of(i):
        return F.element_at(la if axis == "lat" else lo, i)

    def o_of(i):
        return F.element_at(lo if axis == "lat" else la, i)

    def inside(i):
        return a_of(i) >= b if keep_ge else a_of(i) <= b

    def pt(a_val, o_val):
        lat_v = a_val if axis == "lat" else o_val
        lon_v = o_val if axis == "lat" else a_val
        return F.struct(lat_v.alias("la"), lon_v.alias("lo"))

    def cross(i):
        t = (b - a_of(i)) / (a_of(i + 1) - a_of(i))
        return pt(b, o_of(i) + t * (o_of(i + 1) - o_of(i)))

    def v2(i):
        return pt(a_of(i + 1), o_of(i + 1))

    def per_edge(i):
        return (
            F.when(inside(i) & inside(i + 1), F.array(v2(i)))
            .when(inside(i) & ~inside(i + 1), F.array(cross(i)))
            .when(~inside(i) & inside(i + 1), F.array(cross(i), v2(i)))
            .otherwise(F.array().cast("array<struct<la:double,lo:double>>"))
        )

    pts = F.when(
        F.size(la) >= 2,
        F.flatten(F.transform(F.sequence(F.lit(1), F.size(la) - 1), per_edge)),
    ).otherwise(F.array().cast("array<struct<la:double,lo:double>>"))
    closed = F.when(
        F.size(pts) > 0, F.concat(pts, F.slice(pts, 1, 1))
    ).otherwise(pts)
    return closed


def clip_rings_rect(
    df,
    lat0: float,
    lat1: float,
    lon0: float,
    lon1: float,
    lats: str = "lats",
    lons: str = "lons",
):
    """Clip every closed ring to the axis-aligned rectangle
    ``[lat0, lat1] × [lon0, lon1]`` — four successive half-plane passes
    with a LINEAGE BARRIER (lazy localCheckpoint) between them: each
    pass references the ring arrays ~36 times, and Catalyst's
    CollapseProject would fold the four projections back into one
    expression with 36⁴ leaf copies — measured driver OOM during
    canonicalization (the same class as the kNN ring-expansion lesson).
    The barrier caps every plan at one pass; at cluster scale swap for a
    reliable checkpoint if the ring table is too large for executor
    storage. Replaces the ``lats``/``lons`` columns with the clipped
    ring (empty arrays when the ring lies outside). The building block
    of area-weighted raster↔vector rollups: clip to each covering cell,
    then the integer-micro shoelace (``polygon_stats``) per piece."""
    stages = [
        ("lat", lat0 if isinstance(lat0, Column) else float(lat0), True),
        ("lat", lat1 if isinstance(lat1, Column) else float(lat1), False),
        ("lon", lon0 if isinstance(lon0, Column) else float(lon0), True),
        ("lon", lon1 if isinstance(lon1, Column) else float(lon1), False),
    ]
    out = df
    for axis, bound, keep_ge in stages:
        closed = _clip_halfplane(F.col(lats), F.col(lons), axis, bound, keep_ge)
        out = (
            out.withColumn("__clip", closed)
            .select(
                *[c for c in out.columns if c not in (lats, lons)],
                F.transform(F.col("__clip"), lambda p: p["la"]).alias(lats),
                F.transform(F.col("__clip"), lambda p: p["lo"]).alias(lons),
            )
            .localCheckpoint(eager=False)
        )
    return out


def clip_rings_rect_sql(
    src_sql: str,
    lat0: float,
    lat1: float,
    lon0: float,
    lon1: float,
    lats: str = "lats",
    lons: str = "lons",
    extra_cols: str = "",
) -> str:
    """DuckDB twin — the identical four half-plane passes, each stage a
    MATERIALIZED CTE: DuckDB fuses chained projections exactly like
    Catalyst's CollapseProject, so without the boundaries a downstream
    consumer referencing the ring arrays k times re-expands the whole
    chain k·36ⁿ-fold (measured: the clipped-area query went from >10 min
    to sub-second). ``src_sql`` must yield ``{extra_cols...}, lats,
    lons``; ``extra_cols`` is a leading ``"col1, col2,"`` prefix passed
    through. The result is a complete ``WITH … SELECT`` — embed it as a
    derived table."""

    def one(axis: str, bound, keep_ge: bool, src: str) -> str:
        # float literal (fixed window) or SQL expression string (per-row
        # window carried through extra_cols)
        b = bound if isinstance(bound, str) else repr(float(bound))
        a = lats if axis == "lat" else lons
        o = lons if axis == "lat" else lats
        op = ">=" if keep_ge else "<="

        # struct fields: la/lo in ring order regardless of axis
        def pt_cross():
            t = f"(({b}) - {a}[i]) / ({a}[i + 1] - {a}[i])"
            o_val = f"{o}[i] + ({t}) * ({o}[i + 1] - {o}[i])"
            lat_v = b if axis == "lat" else o_val
            lon_v = o_val if axis == "lat" else b
            return f"{{'la': CAST({lat_v} AS DOUBLE), 'lo': CAST({lon_v} AS DOUBLE)}}"

        v2 = f"{{'la': {lats}[i + 1], 'lo': {lons}[i + 1]}}"
        per_edge = f"""CASE
      WHEN {a}[i] {op} ({b}) AND {a}[i + 1] {op} ({b}) THEN [{v2}]
      WHEN {a}[i] {op} ({b}) THEN [{pt_cross()}]
      WHEN {a}[i + 1] {op} ({b}) THEN [{pt_cross()}, {v2}]
      ELSE CAST([] AS STRUCT(la DOUBLE, lo DOUBLE)[]) END"""
        return f"""SELECT {extra_cols}
       list_transform(__cl, p -> p.la) AS {lats},
       list_transform(__cl, p -> p.lo) AS {lons}
FROM (
  SELECT {extra_cols}
         CASE WHEN len(__p) > 0 THEN list_append(__p, __p[1]) ELSE __p END AS __cl
  FROM (
    SELECT {extra_cols}
           CASE WHEN len({lats}) >= 2 THEN flatten(list_transform(
             range(1, len({lats})), i -> {per_edge}))
           ELSE CAST([] AS STRUCT(la DOUBLE, lo DOUBLE)[]) END AS __p
    FROM ({src})
  )
)"""

    ctes = [f"__cr_s0 AS MATERIALIZED ({src_sql})"]
    prev = "__cr_s0"
    for k, (axis, bound, keep_ge) in enumerate(
        [
            ("lat", lat0, True),
            ("lat", lat1, False),
            ("lon", lon0, True),
            ("lon", lon1, False),
        ],
        start=1,
    ):
        name = f"__cr_s{k}"
        stage = one(axis, bound, keep_ge, f"SELECT * FROM {prev}")
        ctes.append(f"{name} AS MATERIALIZED (\n{stage}\n)")
        prev = name
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM {prev}"
    )
