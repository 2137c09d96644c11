"""The O1 two-phase global rank must equal the single-window rank.

``assign_global_seq`` has two branches (operators/expand.py): small
rounds take one global ``row_number`` window; large rounds
(>50k inserts, driver-decided) take the distributed two-phase rank —
range-bucket by ``parent_seq`` (monotone with stream order), rank
within buckets in parallel, add per-bucket offsets from a P-row
collect. The reference's crawl order (crawler.js:474-504) rides on
this seq, so the two branches must agree ROW-FOR-ROW on any input,
including the shapes that break naive range bucketing: heavy skew
onto one parent_seq (every row of a bucket boundary tie must land in
ONE bucket), a single distinct key (span collapses to 1), and spans
much larger than the row count (most buckets empty). The sibling
two-phase bucketings (t_ccnet_perplexity, o_warc_gaps) had a
multiply-first overflow bug in exactly this key expression — this
test pins the crawl-path variant against its spec.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from node_crawler_spark.operators.expand import assign_global_seq


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "url string, parent_seq long, band long, pos long"
    )


def _both(df, max_seq):
    small = {
        r.url: r._new_seq
        for r in assign_global_seq(df, max_seq, large_round=False).collect()
    }
    large = {
        r.url: r._new_seq
        for r in assign_global_seq(df, max_seq, large_round=True).collect()
    }
    return small, large


def _assert_equal_and_dense(small, large, n, max_seq):
    assert small == large
    assert sorted(small.values()) == list(
        range(max_seq + 1, max_seq + n + 1)
    )


def test_uniform_spread(spark):
    rows = [
        (f"u{i}", i // 3, (i % 3) * 2, i % 7) for i in range(3000)
    ]
    df = _mk(spark, rows)
    small, large = _both(df, max_seq=41)
    _assert_equal_and_dense(small, large, len(rows), 41)


def test_heavy_skew_single_hot_parent(spark):
    # 90% of inserts from ONE page (a hub): the hot parent_seq maps to
    # one bucket; correctness must survive the imbalance.
    rows = [(f"h{i}", 500, 0, i) for i in range(2700)]
    rows += [(f"c{i}", i, 2, 0) for i in range(300)]
    df = _mk(spark, rows)
    small, large = _both(df, max_seq=0)
    _assert_equal_and_dense(small, large, len(rows), 0)


def test_single_distinct_parent(spark):
    # span == 1: every row lands in bucket 0 (degenerates to the
    # single-window rank, still correct).
    rows = [(f"s{i}", 7, i % 5, i) for i in range(500)]
    df = _mk(spark, rows)
    small, large = _both(df, max_seq=99)
    _assert_equal_and_dense(small, large, len(rows), 99)


def test_sparse_huge_span(spark):
    # parent_seq spans ~1e12 with 400 rows: nearly all buckets empty,
    # the bucket-key arithmetic runs at realistic crawl-seq magnitude.
    rows = [
        (f"g{i}", 1_000_000_000_000 + i * 2_654_435_761, i % 4, i % 11)
        for i in range(400)
    ]
    df = _mk(spark, rows)
    small, large = _both(df, max_seq=12345)
    _assert_equal_and_dense(small, large, len(rows), 12345)


def test_empty_input(spark):
    df = _mk(spark, [])
    small = assign_global_seq(df, 5, large_round=False).collect()
    large = assign_global_seq(df, 5, large_round=True).collect()
    assert small == [] and large == []
