"""SparkSession factory with the engine's standard tuning.

Production posture (1000-executor cluster over ~100 TB of pages):
  * AQE on — runtime coalescing, skew-join splitting, and
    broadcast-demotion decisions are made per round from real sizes
    (frontier rounds vary by orders of magnitude).
  * Arrow on — every custom function in this engine is an Arrow-
    batched pandas UDF; row-at-a-time Python is banned.
  * UTC session TZ — oracle (DuckDB) comparability.
  * shuffle.partitions sized to cores locally; on a real cluster AQE
    coalesces from a deliberately-high initial number.

The input tables would be Iceberg (bucket(N, url) ∪ days(warc_ts));
the Iceberg runtime jar is not in this container, so sources/store.py
provides a parquet snapshot store with the same commit semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "node-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # under spark-submit the master arrives as the spark.master
        # system property — honor it instead of clobbering it, so the
        # same entry point runs unchanged on a real cluster
        # (north_rule: spark-submit --py-files at N and 4N executors)
        try:
            from pyspark import SparkConf

            submitted = SparkConf()
            if submitted.contains("spark.master"):
                master = submitted.get("spark.master")
        except Exception:  # no JVM yet / standalone import — fall back
            pass
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core (AQE coalesces down)
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
