"""Probe the driver-gate window for unstable result orderings.

The driver's correctness hash is ROW-ORDER-SENSITIVE (columns sorted
by name, rows in result order). A query whose final ORDER BY is not a
TOTAL key can pass every local gate and still hash-mismatch in the
driver environment: Spark's sort is unstable for tied keys, so tie
order follows partitioning/merge details that differ across configs —
exactly the environment-sensitivity class behind the r2/r3 hash
failures. This probe runs each query TWICE with deliberately perturbed
physical configs (shuffle partitions 32 + AQE on, vs 5 + AQE off) and
diffs the fully-rendered row streams; any difference means the output
order is not a function of the data and the query needs a stronger
sort key BEFORE the driver finds out.

Usage: python scripts/order_stability_check.py [N | query ...]
       (default: the FULL registry — run it once per round; pass N to
       probe only the driver window's first N entries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# scripts/ itself: direct execution puts it on sys.path[0], but
# `python -m` / import-as-module would not (ADVICE r4)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gatecheck import render  # noqa: E402  (scripts/ sibling)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")

PERTURBATIONS = (
    {"spark.sql.shuffle.partitions": "32", "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.shuffle.partitions": "5", "spark.sql.adaptive.enabled": "false"},
)


def main():
    import __spark_entry__ as entrymod
    from node_crawler_spark.session import build_session

    queries = entrymod.queries()
    args = sys.argv[1:]
    if len(args) == 1 and args[0].isdigit():
        names = list(queries)[: int(args[0])]
    elif args:
        names = args
    else:
        names = list(queries)  # full registry (r5: window-only was the
        #                        rotation's blind spot — VERDICT r4 #7)

    spark = build_session(app_name="order-stability", master="local[8]")
    n_fail = 0
    for name in names:
        runs = []
        for conf in PERTURBATIONS:
            for k, v in conf.items():
                spark.conf.set(k, v)
            df = queries[name](spark, SF_DIR)
            runs.append([tuple(render(v) for v in row) for row in df.collect()])
        if runs[0] == runs[1]:
            print(f"{name}: STABLE ({len(runs[0])} rows)")
        else:
            n_fail += 1
            diff = next(
                (i, a, b)
                for i, (a, b) in enumerate(zip(runs[0], runs[1]))
                if a != b
            ) if len(runs[0]) == len(runs[1]) else ("len", len(runs[0]), len(runs[1]))
            print(f"{name}: UNSTABLE ORDER {diff}")
    print(f"\n{'ALL STABLE' if n_fail == 0 else f'{n_fail} UNSTABLE'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
