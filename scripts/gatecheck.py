"""Strict local replica of the driver's correctness gate.

Unlike tests/test_queries_oracle.py's older canonicalizer, this is
ORDER-SENSITIVE over rows (columns sorted by name, rows taken in result
order) and type-strict on value rendering — the same sensitivity class
as the driver's value hash, so a query that passes here should
hash-match in CORRECTNESS_r{N}.json.

Usage: python scripts/gatecheck.py [query ...]   (default: all oracles)
       SPARK_GRAFT_SF_DIR_T2=/root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def render(v):
    """Type-strict canonical rendering: Decimal('1.20') != Decimal('1.2'),
    float vs Decimal differ, dates/timestamps by isoformat."""
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render(x) for x in v) + "]"
    return f"s:{v}"


def run_duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    # HUGEINT guard (the r1-r4 blind spot): DuckDB types bare
    # SUM(BIGINT) — and arithmetic propagating it — as HUGEINT
    # (int128).  fetchall() renders plain Python ints, so this replica
    # is structurally blind to it, but the driver's hasher goes through
    # pandas/Arrow where the same column renders float64/decimal128
    # and hash-mismatches Spark's int64.  Every oracle OUTPUT column
    # must therefore be CAST(... AS BIGINT) at its production site.
    rel = con.sql(sql)
    huge = [c for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()]
    if huge:
        raise AssertionError(
            f"oracle emits HUGEINT output column(s) {huge} — the driver "
            f"hasher renders these float64/decimal128, never int; wrap "
            f"with CAST(... AS BIGINT) (see VERDICT r4 #1)"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def main():
    import __spark_entry__ as entrymod
    from node_crawler_spark.session import build_session

    names = sys.argv[1:] or sorted(entrymod.oracle_sql())
    spark = build_session(app_name="gatecheck", master="local[8]")
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    n_fail = 0
    results: dict = {}
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only in driver gate)")
            continue
        df = queries[name](spark, SF_DIR)
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        d_cols, d_rows = run_duck(oracles[name])

        s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        sc, dc = sorted(s_cols), sorted(d_cols)
        sr = [tuple(render(r[i]) for i in s_order) for r in s_rows]
        dr = [tuple(render(r[i]) for i in d_order) for r in d_rows]

        status = "PASS"
        detail = ""
        if sc != dc:
            status, detail = "FAIL(schema)", f"{sc} vs {dc}"
        elif len(sr) != len(dr):
            status, detail = "FAIL(rows)", f"{len(sr)} vs {len(dr)}"
        elif sr != dr:
            status = "FAIL(hash)"
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    detail = f"row {i}: spark={a} duck={b}"
                    break
        if status != "PASS":
            n_fail += 1
        print(f"{name}: {status} {detail}")
        results[name] = {
            "rows_match": len(sr) == len(dr),
            "schema_match": sc == dc,
            "hash_match": sr == dr,
            "spark_rows": len(sr),
            "oracle_rows": len(dr),
            "err": None,
        }
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    out = os.environ.get("GATECHECK_JSON")
    if out:
        # machine-readable record in the driver's CORRECTNESS format
        import json

        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
