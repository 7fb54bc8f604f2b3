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

__all__ = ["GEOHASH_BASE32", "geohash_encode", "geohash_encode_sql"]

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
