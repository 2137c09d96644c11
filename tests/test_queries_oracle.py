"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and diff it against its DuckDB oracle.

Deliberately at least as strict as the driver's hash: columns sorted
by name, rows compared IN RESULT ORDER, values rendered type-strictly
(a Decimal is not a float; scale matters). The r1 version canonicalized
row order and decimal scale away, which let three queries pass locally
while hash-failing in CORRECTNESS_r01.json — never weaken this gate
below the driver's again."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from scripts.gatecheck import SF_DIR, render, run_duck

ORACLE_NAMES = sorted(entrymod.oracle_sql())
SPARK_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    d_cols, d_rows = run_duck(entrymod.oracle_sql()[name])

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: {sorted(s_cols)} vs {sorted(d_cols)}"
    )
    sr = [tuple(render(r[i]) for i in s_order) for r in s_rows]
    dr = [tuple(render(r[i]) for i in d_order) for r in d_rows]
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


def test_every_query_has_an_oracle():
    """VERDICT r1 item 5: unfalsifiable rows-only queries are banned —
    every registry entry must carry a DuckDB oracle."""
    assert not SPARK_ONLY, f"queries without oracles: {SPARK_ONLY}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
