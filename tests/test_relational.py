"""Relational operator correctness: every registry query vs its DuckDB
oracle at sf0.001 (the same comparison the driver runs at sf0.01)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from edgar_crawler_spark.queries import QUERIES
from edgar_crawler_spark.tables import TABLE_NAMES

from .conftest import SF_SMALL


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    lines = sorted("|".join(cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMALL)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert s_rows is not None  # rows-only check
        return
    res = duck.execute(q.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _hash(s_rows, sdf.columns) == _hash(d_rows, d_cols)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["o_orderkey", "form_weight", "order_date"]
