"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial pipeline on the sf0.001-scale synthetic
pages world (decode -> assemble -> point-in-polygon -> per-polygon counts).
``queries``/``oracle_sql`` expose every operator from SURVEY.md §2 over the
driver-registered tables so DuckDB can verify them (see
gosmonaut_spark/queries.py for the determinism rules); the gosmonaut-specific
nested-entity passes additionally appear as rows-only entries whose strong
oracles live in tests/ (pure-Python decoder + brute-force checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gosmonaut_spark.queries import build_queries, build_rows_only_queries

_QUERIES = build_queries()
_ROWS_ONLY = build_rows_only_queries()
_PAGES_ORACLED: dict | None = None


def _pages_oracled() -> dict:
    """Pages-world queries + ground-truth SQL; built lazily because the
    first call writes the truth parquet snapshots (cached on disk)."""
    global _PAGES_ORACLED
    if _PAGES_ORACLED is None:
        from gosmonaut_spark.queries import build_pages_oracle_queries

        _PAGES_ORACLED = build_pages_oracle_queries()
    return _PAGES_ORACLED


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: nested-entity resolution + PIP spatial join on the
    synthetic pages table (sf0.001 profile), plus the driver tables for
    the tiling layer — returns per-polygon point counts."""
    import pyspark.sql.functions as F

    from gosmonaut_spark.fixtures.pages import ensure_pages_parquet
    from gosmonaut_spark.operators.assembly import SKIP_MISSING
    from gosmonaut_spark.operators.pip import point_in_polygon_join, polygons_from_ways
    from gosmonaut_spark.plans.pipeline import run_pipeline
    from gosmonaut_spark.sources.pages import read_pages

    pages = read_pages(spark, ensure_pages_parquet("t1"))
    res = run_pipeline(pages, {"node", "way"}, None, mode=SKIP_MISSING)
    polys = polygons_from_ways(res.ways)
    hits = point_in_polygon_join(res.nodes.select("id", "lat", "lon"), polys, res=11)
    return (
        hits.groupBy("polygon_id")
        .agg(F.count(F.lit(1)).alias("n_points_inside"))
        .orderBy(F.col("n_points_inside").desc(), F.col("polygon_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: fn for name, (fn, _sql) in _QUERIES.items()}
    out.update({name: fn for name, (fn, _sql) in _pages_oracled().items()})
    out.update(_ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: sql for name, (_fn, sql) in _QUERIES.items()}
    out.update({name: sql for name, (_fn, sql) in _pages_oracled().items()})
    return out
