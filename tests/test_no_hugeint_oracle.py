"""Regression guard: no oracle may emit a HUGEINT output column.

Root cause of ALL 13 r4 driver hash failures (judge-adjudicated,
VERDICT r4): DuckDB types bare ``SUM(BIGINT)`` — and any arithmetic
that propagates it (``//``, ``+``, ``*``) — as HUGEINT (int128).
``fetchall()`` renders those as plain Python ints, so the strict local
gate replica (scripts/gatecheck.py pre-r5) was structurally blind to
the class; the driver's hasher, however, renders the same column via
pandas (float64, e.g. ``663384449.0``) or Arrow (decimal128(38,0)) —
either way a different value stream than Spark's int64, so the row
hash mismatches while row counts and schema still match.

The fix is mechanical and oracle-side only: ``CAST(<expr> AS BIGINT)``
at the production site of every such output column.  This test freezes
the fixed state by BINDING (not executing) every registry oracle in
DuckDB and asserting the planned output types contain no HUGEINT or
UHUGEINT.  Binding is sub-millisecond per query, so the whole registry
is swept on every pytest run.  gatecheck.py carries the same assert on
its execution path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_LINT", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET threads=2")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint(con):
    offenders = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        rel = con.sql(sql)  # bind only — no execution
        huge = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if huge:
            offenders[name] = huge
    assert offenders == {}, (
        f"oracles with HUGEINT output columns {offenders} — the driver "
        f"hasher renders HUGEINT as float64/decimal128, never int, so "
        f"these WILL hash-fail in CORRECTNESS_r{{N}}.json even though "
        f"fetchall()-based local gates pass; CAST(... AS BIGINT) at the "
        f"production site"
    )


def test_detector_sees_a_planted_hugeint(con):
    """The guard itself must flag the exact construct that burned
    r1-r4: a bare SUM over a BIGINT column."""
    rel = con.sql("SELECT l_orderkey, SUM(l_quantity::BIGINT) AS s "
                  "FROM lineitem GROUP BY l_orderkey")
    assert any("HUGEINT" in str(t).upper() for t in rel.types), (
        "DuckDB no longer types SUM(BIGINT) as HUGEINT — the guard and "
        "the CAST discipline may both be obsolete; re-verify against "
        "the driver hasher before relaxing"
    )
