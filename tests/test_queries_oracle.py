"""Mirror of the driver's CORRECTNESS gate: run every queries() entry on
Spark AND its oracle_sql() twin on DuckDB at sf0.01, compare row sets
(columns sorted by name, order-insensitive, exact values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(v):
    import decimal

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # the r4 driver-red rows were uncast DuckDB integer sums surfacing as
    # decimal128 — equal by ==, different under the driver's serializing
    # hash. Ban the TYPE so the class of defect cannot recur: wrap sums
    # in CAST(... AS BIGINT) in the oracle SQL.
    assert not isinstance(v, decimal.Decimal), (
        f"oracle returned decimal value {v!r} — cast the aggregate to "
        "BIGINT/DOUBLE in the twin SQL"
    )
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_normalize(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


ORACLED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_vs_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    s_set, _ = _rowset(s_cols, s_rows)
    d_set, _ = _rowset(d_cols, d_rows)
    assert len(s_set) == len(d_set), (
        f"{name}: row count {len(s_set)} vs oracle {len(d_set)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(s_set, d_set)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{s_set[mism[0]]} vs {d_set[mism[0]]}"
    )
    # driver-style TYPE-SENSITIVE hash: a serializing hasher distinguishes
    # int 5 / float 5.0 / Decimal('5') / True even where == does not (the
    # exact mechanism behind the r4 hash-red rows). repr() is the
    # cheapest type-tagged canonical form; bit-identical same-type values
    # repr identically.
    import hashlib

    def _h(rows):
        m = hashlib.md5()
        for r in rows:
            m.update(repr(r).encode())
        return m.hexdigest()

    t_mism = [
        i
        for i, (a, b) in enumerate(zip(s_set, d_set))
        if repr(a) != repr(b)
    ]
    assert _h(s_set) == _h(d_set), (
        f"{name}: values equal but serialized types differ; first: "
        f"{s_set[t_mism[0]]!r} vs {d_set[t_mism[0]]!r}"
        if t_mism
        else f"{name}: hash mismatch"
    )


def test_rows_only_queries_run(spark):
    """Rows-only entries (pages world) must at least run and return rows."""
    from gosmonaut_spark.queries import build_rows_only_queries

    for name, fn in build_rows_only_queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, f"{name} returned no rows"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["polygon_id", "n_points_inside"]
