"""Atomic-commit contract of write_round under concurrent table writes.

``write_round`` submits the round's independent table writes from a
thread pool (BENCH/BASELINE.md §13: overlapped scheduling floors); the
manifest must still publish strictly after EVERY write returns, and a
failing write must leave NO manifest — a kill or error at any instant
leaves either no round r or a fully consistent one
(store.py docstring; the Iceberg commit semantics the north rule asks
for). These tests would have caught a pool refactor that published the
manifest before joining the writes, or that swallowed a worker
exception.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from node_crawler_spark.sources.store import SnapshotStore


def _store(tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(os.path.join(root, "commits"), exist_ok=True)
    os.makedirs(os.path.join(root, "rounds"), exist_ok=True)
    return SnapshotStore(root)


def test_concurrent_writes_commit_consistently(spark, tmp_path):
    store = _store(tmp_path)
    tables = {
        "crawled": spark.range(10).select(
            F.concat(F.lit("http://a.test/"), F.col("id")).alias("url")
        ),
        "errors": spark.range(3).select(
            F.concat(F.lit("http://e.test/"), F.col("id")).alias("url")
        ),
        "seen_delta": spark.range(13).select(
            F.concat(F.lit("http://a.test/"), F.col("id")).alias("url"),
            F.col("id").alias("seq"),
        ),
        "next_frontier": spark.range(5).select(
            F.concat(F.lit("http://n.test/"), F.col("id")).alias("url"),
            F.col("id").alias("seq"),
        ),
    }
    manifest = store.write_round(1, tables, extra={"max_seq": 13})
    assert store.last_committed_round() == 1
    assert sorted(manifest["tables"]) == sorted(tables)
    # lineage recorded from the written files, after the join
    assert manifest["tables"]["seen_delta"]["rows"] == 13
    assert sum(manifest["tables"]["seen_delta"]["partitions"].values()) == 13
    assert manifest["tables"]["next_frontier"]["rows"] == 5
    # read-back of every table matches what was written
    for name in tables:
        got = store.read_table(spark, 1, name)
        assert got.count() == tables[name].count(), name


def test_failing_write_publishes_no_manifest(spark, tmp_path):
    store = _store(tmp_path)

    @F.udf("long")
    def boom(x):
        raise ValueError("induced write failure")

    tables = {
        "crawled": spark.range(4).select(
            F.concat(F.lit("http://a.test/"), F.col("id")).alias("url")
        ),
        # evaluation of this table raises executor-side mid-write
        "errors": spark.range(4).select(boom(F.col("id")).alias("url")),
        "seen_delta": spark.range(4).select(
            F.concat(F.lit("http://a.test/"), F.col("id")).alias("url"),
            F.col("id").alias("seq"),
        ),
    }
    with pytest.raises(Exception):
        store.write_round(1, tables, extra={"max_seq": 4})
    # the round must be invisible: no manifest, resume sees nothing
    assert store.last_committed_round() is None
    assert not os.path.exists(store._commit_path(1))
