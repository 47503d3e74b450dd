"""Local mirror of the driver's correctness gate: run every
`queries()` entry and its DuckDB `oracle_sql()` side-by-side at
sf0.001 and require identical row counts, column names, and
order-insensitive values (exact equality — the driver hashes values,
so 'close' is not enough).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _rows_key(rows, colnames):
    # NULLs (cube/rollup grouping rows, outer joins) sort before any
    # value via the (is_null, value) pair — Python can't order None
    # against str/float directly.
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple((r[i] is None, _norm(r[i]) if r[i] is not None else "") for i in order)
        for r in rows
    )


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    con = _duck(sf_dir)
    cur = con.execute(ORACLES[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    sk = _rows_key(s_rows, s_cols)
    dk = _rows_key(d_rows, d_cols)
    mism = [i for i, (a, b) in enumerate(zip(sk, dk)) if a != b][:3]
    assert sk == dk, f"{name}: first value mismatches at {[(i, sk[i], dk[i]) for i in mism]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
