"""Page-store layout for the J1 fetch/expand join (VERDICT r2 task 2).

The expand phase joins the round-sized fetched frontier against the
page store (``pages``: the 100 TB side, input_hint columns
url/warc_ts/html/text/lang). Left alone, every round's sort-merge join
re-Exchanges AND re-Sorts the page side — the worst scaler in the r2
profile decomposition (fetch/expand eff 0.40 vs 0.70 for the Arrow
phase). The fix is the storage-partitioned-join layout:

  * ``bucketize_pages`` — the durable form: a parquet table written
    ``bucketBy(N, url).sortBy(url)``. A scan of it reports
    HashPartitioning(url, N) + per-partition ordering, so the SMJ
    plans NO Exchange and NO Sort on the page side; only the
    round-sized frontier shuffles (to N partitions). On a real cluster
    this is an Iceberg table with a ``bucket(N, url)`` partition
    transform + spark.sql.sources.v2.bucketing.enabled — same plan
    shape, same guarantee.
  * ``prepare_body_side`` — the in-crawl form when the caller hands a
    plain DataFrame: project → repartition(P, url) →
    sortWithinPartitions(url) → persist. The cached scan preserves
    both the partitioning and the ordering, so every subsequent
    round's join treats it exactly like a bucketed table: one
    Exchange per round (the frontier side), zero on the page side.
    The one-time shuffle is paid where a 1000-round crawl amortizes
    it 1000×.

tests/test_pagestore.py asserts the plan shape (single Exchange, no
Sort above the page-side scan) for both forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BODY_COLUMNS = ("p_url", "p_ts", "p_html")


def _project_body(pages: DataFrame) -> DataFrame:
    """The three columns the expand join reads — projected FIRST so
    column pruning reaches the scan (text/lang never leave parquet)."""
    return pages.select(
        F.col("url").alias("p_url"),
        F.col("warc_ts").alias("p_ts"),
        F.col("html").alias("p_html"),
    )


def prepare_body_side(pages: DataFrame, parallelism: int) -> DataFrame:
    """Hash-partition + sort + persist the page-body side on its join
    key. Returns a persisted DataFrame whose cached scan satisfies the
    SMJ's distribution AND ordering requirements — the in-memory
    analog of a bucketed table (same pattern as prepare_http_meta's
    key-partitioned persisted side, fetch.py:98)."""
    return (
        _project_body(pages)
        .repartition(parallelism, "p_url")
        .sortWithinPartitions("p_url")
        .persist()
    )


def bucketize_pages(
    spark: SparkSession,
    pages: DataFrame,
    n_buckets: int,
    table_name: str = "nc_pages_bucketed",
) -> DataFrame:
    """Write ``pages`` as a bucketed+sorted managed parquet table and
    return a scan of it. The scan carries HashPartitioning(url,
    n_buckets) so joins on url never exchange this side. Durable
    across sessions (unlike prepare_body_side's cache); the Iceberg
    production analog is a ``bucket(n, url)`` partition transform."""
    (
        pages.write.mode("overwrite")
        .bucketBy(n_buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def body_side_from_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Projection of a bucketed pages table; aliases preserve the
    scan's bucketing metadata through to the join."""
    return _project_body(spark.table(table_name))
