"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values (floats rounded)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 3)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 3)
    except ImportError:
        pass
    return v

def _normalize(rows, cols):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=repr)


PAIRS = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", PAIRS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    res = duck.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(map(str.lower, s_cols)) == sorted(map(str.lower, d_cols)), (
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mism, f"{name}: first mismatch at {mism[0]}: {sn[mism[0]]} != {dn[mism[0]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
