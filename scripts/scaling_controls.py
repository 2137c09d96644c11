"""Scaling-ceiling controls for BENCH/BASELINE.md §3.

Measures, at local[N] (one leg per process — driver heap is fixed at
first JVM launch):
  A. pure whole-stage-codegen aggregate (no Python, no shuffle) —
     the VM's JVM-compute scaling ceiling;
  B. a hash-shuffle groupBy (no Python) — the shuffle ceiling;
  C. an Arrow pandas-UDF pass — the JVM<->Python hop ceiling.

Usage: python scripts/scaling_controls.py <cores>
Prints one JSON line {"cores": N, "a_codegen_sec": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1])
    from node_crawler_spark.session import build_session

    from pyspark.sql import functions as F

    spark = build_session(
        app_name=f"scaling-control-{n}", master=f"local[{n}]",
        shuffle_partitions=n,
    )

    out = {"cores": n}

    # A: codegen-only aggregate, 8e9 rows of xxhash64
    t0 = time.perf_counter()
    spark.range(0, 8_000_000_000, 1, n * 4).selectExpr(
        "sum(xxhash64(id) % 1000000) as s"
    ).collect()
    out["a_codegen_sec"] = round(time.perf_counter() - t0, 2)

    # B: shuffled groupBy, 400M rows -> 1M groups
    t0 = time.perf_counter()
    spark.range(0, 400_000_000, 1, n * 4).groupBy(
        (F.col("id") % 1_000_000).alias("k")
    ).agg(F.count("id").alias("c")).selectExpr("sum(c)").collect()
    out["b_shuffle_sec"] = round(time.perf_counter() - t0, 2)

    # C: Arrow pandas-UDF pass over 400M rows
    @F.pandas_udf("long")
    def bump(s: pd.Series) -> pd.Series:
        return s * 3 + 1

    t0 = time.perf_counter()
    spark.range(0, 400_000_000, 1, n * 4).select(
        F.count(bump("id"))
    ).collect()
    out["c_arrow_udf_sec"] = round(time.perf_counter() - t0, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
