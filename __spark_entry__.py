"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator
inventory as paired Spark / DuckDB-SQL implementations over
/root/testdata (see node_crawler_spark/queries.py). The crawl
pipeline proper (fetch join, redirect chase, seen-set dedup, ordering)
is pinned by the golden scenario suite in tests/ against a sequential
reference simulator — those semantics aren't expressible over the
TPC-H-ish tables, so here they appear as their relational shapes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from node_crawler_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the J1 fetch-join shape (3-way join + ranked top-k)
    on sf0.001."""
    return QUERIES["q3_top_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
