"""Storage-partitioned page-store join (VERDICT r2 task 2).

Asserts the PLAN SHAPE, not just results: with the page side prepared
(key-partitioned persisted projection, or a bucketBy/sortBy table) the
expand join must not exchange or sort the page side — only the
round-sized frontier side shuffles. Plus an end-to-end equivalence
check that the driver's prepared path crawls identically.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from node_crawler_spark.sources.fixtures import synthetic_webgraph
from node_crawler_spark.sources.pagestore import (
    body_side_from_table,
    bucketize_pages,
    prepare_body_side,
)

N = 5000


def _fetched_like(spark, n=200):
    return spark.range(0, n).select(
        F.concat(F.lit("http://www.bench.test/p"), F.col("id").cast("string")).alias(
            "page_url"
        ),
        F.col("id").alias("seq"),
    )


def _join_plan(fetched, body_side):
    j = fetched.join(body_side, fetched.page_url == body_side.p_url, "left")
    return j._jdf.queryExecution().executedPlan().toString()


def _live_part(plan: str) -> str:
    """The per-round (runtime) plan: everything above the cached
    relation's one-time build plan, which prints indented under
    InMemoryRelation and executes only at cache population."""
    idx = plan.find("InMemoryRelation")
    return plan if idx < 0 else plan[:idx]


def _exchanges(plan: str) -> list[str]:
    # ENSURE_REQUIREMENTS = runtime shuffles inserted for this join
    # (REPARTITION_BY_NUM inside the cache build is one-time)
    return [
        ln
        for ln in _live_part(plan).splitlines()
        if re.search(r"\bExchange\b", ln) and "ENSURE_REQUIREMENTS" in ln
    ]


@pytest.fixture(scope="module")
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_prepared_body_side_joins_without_exchange(spark, no_broadcast):
    pages, _http, _seeds = synthetic_webgraph(spark, N)
    body = prepare_body_side(pages, 4)
    try:
        body.count()  # populate the cache so the plan sees the scan
        plan = _join_plan(_fetched_like(spark), body)
        ex = _exchanges(plan)
        # exactly ONE exchange — the fetched side; the cached page side
        # satisfies the join's distribution from its persisted layout
        assert len(ex) == 1, plan
        assert "p_url" not in ex[0], plan
        # and no Sort re-sorts the page side: the only sorts allowed are
        # on the fetched side's key (page_url)
        for ln in _live_part(plan).splitlines():
            if re.search(r"\bSort\b", ln) and "p_url" in ln:
                raise AssertionError(f"page side re-sorted: {ln}\n{plan}")
    finally:
        body.unpersist()


def test_bucketized_table_joins_without_exchange(spark, no_broadcast, tmp_path):
    pages, _http, _seeds = synthetic_webgraph(spark, N)
    name = "nc_pages_bucket_test"
    (
        pages.write.mode("overwrite")
        .bucketBy(4, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "pages_bucketed"))
        .format("parquet")
        .saveAsTable(name)
    )
    try:
        body = body_side_from_table(spark, name)
        plan = _join_plan(_fetched_like(spark), body)
        assert "Bucketed: true" in plan, plan
        ex = _exchanges(plan)
        # NO shuffle of the page side — the whole point. (A per-
        # partition Sort remains: Spark ignores sortBy metadata on
        # read since 3.0 — local CPU, zero network/disk. The cached
        # prepare_body_side path elides the sort too.)
        assert len(ex) == 1, plan
        assert "p_url" not in ex[0], plan
        # column pruning reaches the bucketed scan: text/lang never read
        scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
        assert scan_lines and "text" not in scan_lines[0], plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketize_pages_roundtrip(spark, tmp_path):
    pages, _http, _seeds = synthetic_webgraph(spark, 300)
    name = "nc_pages_rt_test"
    (
        pages.write.mode("overwrite")
        .bucketBy(4, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "rt"))
        .format("parquet")
        .saveAsTable(name)
    )
    try:
        assert spark.table(name).count() == 300
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_driver_prepared_path_equivalent(spark, tmp_path):
    """run_crawl with its internal prepare (default) vs pages_prepared
    on a pre-bucketed table: identical crawl output."""
    from node_crawler_spark.config import CrawlConfig
    from node_crawler_spark.plans.driver import run_crawl

    pages, http, seeds = synthetic_webgraph(spark, 400)
    cfg = CrawlConfig(max_rounds=6)
    r1 = run_crawl(spark, cfg, pages, http, seeds, str(tmp_path / "s1"))

    name = "nc_pages_eq_test"
    bucketed = None
    (
        pages.write.mode("overwrite")
        .bucketBy(4, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "pb"))
        .format("parquet")
        .saveAsTable(name)
    )
    try:
        bucketed = spark.table(name)
        r2 = run_crawl(
            spark, cfg, bucketed, http, seeds, str(tmp_path / "s2"),
            pages_prepared=True,
        )
        assert r1.max_seq == r2.max_seq
        a = sorted(
            (r.seq, r.url, r.text) for r in r1.crawled(spark).collect()
        )
        b = sorted(
            (r.seq, r.url, r.text) for r in r2.crawled(spark).collect()
        )
        assert a == b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
