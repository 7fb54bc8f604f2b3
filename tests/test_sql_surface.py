"""The SQL face: register_tables + dialect-portable twin SQL running
UNCHANGED on Spark SQL, matching both the DataFrame operator and DuckDB."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod
from gosmonaut_spark.session import register_tables

SF = "/root/testdata/sf0.001"


def test_cell_law_sql_runs_on_all_three_surfaces(spark):
    register_tables(spark, SF)
    sql = entrymod.oracle_sql()["tiles_res8"]  # ANSI subset by design

    via_spark_sql = [(r.cell, r.n_points) for r in spark.sql(sql).collect()]

    via_df = [
        (r.cell, r.n_points)
        for r in entrymod.queries()["tiles_res8"](spark, SF).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    via_duck = [tuple(r) for r in con.execute(sql).fetchall()]

    assert via_spark_sql == via_df == via_duck
    assert len(via_df) > 0


def test_register_tables_exposes_all(spark):
    register_tables(spark, SF)
    for t in ("region", "lineitem", "documents", "embeddings"):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0
