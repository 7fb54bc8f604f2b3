"""Geohash encoding (base32, bit-interleaved Z-order) — pure Column exprs.

The public, interoperable complement to the engine's own quadtree
(functions/cells.py): geohash strings are what external systems (tile
servers, Elasticsearch, Redis GEO, Uber's pre-H3 stacks) exchange, and
their Z-order (Morton) bit interleave gives the property the plain x/y
grid lacks — LEXICOGRAPHIC PREFIX LOCALITY. A table sorted (or
range-partitioned / Z-ORDER clustered, Delta/Iceberg style) by geohash
lays spatially-near rows near each other on disk, so a bbox predicate
prunes file ranges. That is the 100 TB data-layout story: write the
corpus ordered by ``geohash_encode(lat, lon, 7)`` and every downstream
spatial scan reads a contiguous key range instead of the whole table.

Law (bit-exact on both engines — the standard geohash definition, no
iterative bisection): at precision ``p`` chars there are ``5p`` bits,
``ceil(5p/2)`` for longitude and ``floor(5p/2)`` for latitude::

    lon_idx = clamp(floor((lon + 180) / 360 * 2^lonbits), 0, 2^lonbits-1)
    lat_idx = clamp(floor((lat +  90) / 180 * 2^latbits), 0, 2^latbits-1)

bits interleave MSB-first starting with longitude, then each 5-bit
group indexes the base32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.
The interleave is the classic mask-spread Morton sequence (5 shift+mask
steps, not a per-bit loop), so the whole encode is ~30 integer ops of
whole-stage codegen — no UDF, and the identical arithmetic is emitted
for the DuckDB oracle. All float ops (one add, one divide, one
multiply, one floor per axis) are written in the same order on both
engines, so the integer indices are IEEE-identical.

Reference parity: none — the reference has no spatial index
(/root/reference/decode.go stops at coordinate decode); this module is
part of the graft's tiling family on top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "GEOHASH_BASE32",
    "geohash_encode",
    "geohash_encode_sql",
    "geohash_cover",
    "bbox_filter",
]

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Morton spread: move bit i of a <=32-bit value to bit 2i of a 64-bit
# value. (shift, mask) pairs of the standard magic-number sequence.
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _axis_idx(coord: Column, lo: float, span: float, bits: int) -> Column:
    n = 1 << bits
    raw = F.floor((coord + F.lit(float(-lo))) / F.lit(float(span)) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def _axis_idx_sql(expr: str, lo: float, span: float, bits: int) -> str:
    n = 1 << bits
    raw = (
        f"CAST(floor((({expr}) + {float(-lo)!r}) / {float(span)!r} "
        f"* {float(n)!r}) AS BIGINT)"
    )
    return f"least(greatest({raw}, 0), {n - 1})"


def _spread(x: Column) -> Column:
    for sh, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(x: str) -> str:
    for sh, mask in _SPREAD:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def geohash_encode(
    lat: Column | str, lon: Column | str, precision: int = 7
) -> Column:
    """Base32 geohash string of (lat, lon) at ``precision`` chars (1..12)."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be 1..12, got {precision}")
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2
    lon_z = _spread(_axis_idx(lon, -180.0, 360.0, lonbits))
    lat_z = _spread(_axis_idx(lat, -90.0, 180.0, latbits))
    # MSB (bit total-1) is a longitude bit: for odd `total` that position
    # is even -> lon sits on even positions; for even `total` it is odd
    # -> lon is shifted up one.
    if total % 2:
        combined = lon_z.bitwiseOR(F.shiftleft(lat_z, 1))
    else:
        combined = F.shiftleft(lon_z, 1).bitwiseOR(lat_z)
    alpha = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    chars = [
        F.element_at(
            alpha,
            (
                F.shiftright(combined, 5 * (precision - 1 - j))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + F.lit(1)
            ),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode_sql(lat_expr: str, lon_expr: str, precision: int = 7) -> str:
    """DuckDB twin — textually the same integer/float arithmetic."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be 1..12, got {precision}")
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2
    lon_z = _spread_sql(_axis_idx_sql(lon_expr, -180.0, 360.0, lonbits))
    lat_z = _spread_sql(_axis_idx_sql(lat_expr, -90.0, 180.0, latbits))
    if total % 2:
        combined = f"(({lon_z}) | (({lat_z}) << 1))"
    else:
        combined = f"((({lon_z}) << 1) | ({lat_z}))"
    chars = [
        f"substr('{GEOHASH_BASE32}', "
        f"CAST(((({combined}) >> {5 * (precision - 1 - j)}) & 31) AS INTEGER) + 1, 1)"
        for j in range(precision)
    ]
    return " || ".join(chars)


# ---------------------------------------------------------------------------
# bbox cover + pruned bbox filter (the layout-key payoff)
# ---------------------------------------------------------------------------


def _py_spread(x: int) -> int:
    for sh, mask in _SPREAD:
        x = (x | (x << sh)) & mask
    return x


def _py_cell_hash(xi: int, yi: int, precision: int) -> str:
    total = 5 * precision
    if total % 2:
        combined = _py_spread(xi) | (_py_spread(yi) << 1)
    else:
        combined = (_py_spread(xi) << 1) | _py_spread(yi)
    return "".join(
        GEOHASH_BASE32[(combined >> (5 * (precision - 1 - j))) & 31]
        for j in range(precision)
    )


def geohash_cover(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    precision: int,
    max_cells: int = 4096,
) -> list[str]:
    """The geohash cells at ``precision`` that cover the bbox — every
    point inside the box encodes to one of them (axis indices are
    monotone in the coordinate, so the cover is the x-range × y-range
    product). Plan-time Python on the bbox LITERAL (never row data);
    ``max_cells`` is a loud guard — lower the precision rather than
    broadcast a megacell list."""
    if not (lat_min <= lat_max and lon_min <= lon_max):
        raise ValueError("bbox min must be <= max on both axes")
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2

    def idx(coord, lo, span, bits):
        import math

        n = 1 << bits
        return min(max(int(math.floor((coord - lo) / span * float(n))), 0), n - 1)

    x0, x1 = idx(lon_min, -180.0, 360.0, lonbits), idx(lon_max, -180.0, 360.0, lonbits)
    y0, y1 = idx(lat_min, -90.0, 180.0, latbits), idx(lat_max, -90.0, 180.0, latbits)
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    if n > max_cells:
        raise ValueError(
            f"bbox cover needs {n} cells at precision {precision} "
            f"(max_cells={max_cells}); lower the precision"
        )
    return sorted(
        _py_cell_hash(xi, yi, precision)
        for xi in range(x0, x1 + 1)
        for yi in range(y0, y1 + 1)
    )


def bbox_filter(
    df,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    precision: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
    gh_col: str | None = None,
    max_cells: int = 4096,
):
    """Exact bbox filter, pruned by the geohash cover.

    Two-stage (the classic index-then-refine): an ``IN (cover)``
    predicate on the geohash — when ``gh_col`` names a STORED column
    (the layout key the module docstring tells you to write), Spark
    pushes the In down to the parquet scan where sorted-by-geohash
    files prune on row-group min/max stats (asserted by the pushdown
    test); otherwise the hash is computed on the fly (still a cheap
    scan-riding prefilter) — then the exact coordinate predicate
    refines. Result is EXACTLY the bbox rows either way: the cover is
    a superset by construction.
    """
    cover = geohash_cover(
        lat_min, lat_max, lon_min, lon_max, precision, max_cells
    )
    gh = F.col(gh_col) if gh_col else geohash_encode(lat_col, lon_col, precision)
    exact = (
        (F.col(lat_col) >= F.lit(float(lat_min)))
        & (F.col(lat_col) <= F.lit(float(lat_max)))
        & (F.col(lon_col) >= F.lit(float(lon_min)))
        & (F.col(lon_col) <= F.lit(float(lon_max)))
    )
    return df.where(gh.isin(cover) & exact)
