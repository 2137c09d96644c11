"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and diff it against its DuckDB oracle
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # decimals → float-ish canonical string
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{v:.2f}"
    except Exception:
        pass
    return v

def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


ORACLE_NAMES = sorted(entrymod.oracle_sql())
SPARK_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    d_cols, d_rows = _duck(entrymod.oracle_sql()[name])

    sc, sr = _canon(s_cols, s_rows)
    dc, dr = _canon(d_cols, d_rows)
    assert sc == dc, f"{name}: column names differ: {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    mism = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:5]
    assert not mism, (
        f"{name}: first mismatches at {mism}: "
        + "; ".join(f"spark={sr[i]} duck={dr[i]}" for i in mism)
    )


@pytest.mark.parametrize("name", SPARK_ONLY)
def test_spark_only_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
