"""Shared state-directory reader for the streaming sketch faces.

Every sketch query (``start_*_query``) appends parquet partials to a
state directory from ``foreachBatch``; the paired estimate readers
merge that directory on demand. Before the first micro-batch commits,
the directory doesn't exist and ``spark.read.parquet`` raises
``AnalysisException`` — a fresh pipeline queried early should return
an EMPTY result (estimate 0 rows), not error. This mirrors
``neardup._read_state``'s guard (ADVICE r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_state_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a sketch state directory, or an empty frame with the
    writer's schema if no micro-batch has committed yet."""
    try:
        return spark.read.parquet(path)
    except AnalysisException:  # first batch: no state yet
        return spark.createDataFrame([], schema)
