"""Sweep every registry query's physical plan and print one audit row
per query: shuffle/broadcast/window-limit counts and whether parquet
pushdown engaged. Evidence for the PLANS.md claims — run after adding
or changing a query:

    python scripts/plan_audit.py [name ...]    # default: all

This inspects the INITIAL physical plan (no job execution), so the
sweep is fast; AQE may further improve plans at runtime (it never
adds shuffles)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str]) -> int:
    from node_crawler_spark.queries import QUERIES
    from node_crawler_spark.session import build_session

    names = argv or sorted(QUERIES)
    spark = build_session(master="local[2]", shuffle_partitions=4)
    hdr = (
        f"{'query':32} {'xchg':>4} {'range':>5} {'bcast':>5} "
        f"{'bnlj':>4} {'wgl':>3} {'pushdown':>8}"
    )
    print(hdr)
    print("-" * len(hdr))
    try:
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            p = df._jdf.queryExecution().executedPlan().toString()
            print(
                f"{name:32} "
                f"{p.count('Exchange hashpartitioning'):>4} "
                f"{p.count('Exchange rangepartitioning'):>5} "
                f"{p.count('BroadcastExchange'):>5} "
                f"{p.count('BroadcastNestedLoopJoin'):>4} "
                f"{p.count('WindowGroupLimit'):>3} "
                f"{'yes' if 'PushedFilters: [' in p.replace('PushedFilters: []', '') else '-':>8}"
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
