"""Snapshot churn (operators/churn.py): content-change detection over
warc_ts history and the change-driven re-crawl seeding."""

from __future__ import annotations

import datetime
import json

from node_crawler_spark.operators.churn import (
    changed_tuples,
    changed_urls,
    snapshot_churn,
)
from node_crawler_spark.sources.fixtures import BASE, Scenario


def _churn_scenario() -> Scenario:
    from node_crawler_spark.config import CrawlConfig

    old = datetime.datetime(2024, 6, 1)
    older = datetime.datetime(2024, 1, 1)
    s = Scenario(name="churn", cfg=CrawlConfig(), seeds=[f"{BASE}/"])
    # /: 2 snapshots, body changed
    s.pages.append((f"{BASE}/", old, b"<html>v1</html>", None, "en"))
    s.page(f"{BASE}/", "<html>v2</html>")
    # /same: 3 snapshots, the two LATEST identical (older one differs)
    s.pages.append((f"{BASE}/same", older, b"<html>a</html>", None, "en"))
    s.pages.append((f"{BASE}/same", old, b"<html>b</html>", None, "en"))
    s.page(f"{BASE}/same", "<html>b</html>")
    # /single: one snapshot only
    s.page(f"{BASE}/single", "<html>x</html>")
    return s


def test_snapshot_churn_latest_two_compare(spark):
    s = _churn_scenario()
    pages, _http = s.dfs(spark)
    rows = {r.url: r for r in snapshot_churn(pages).collect()}

    assert rows[f"{BASE}/"].n_snapshots == 2
    assert rows[f"{BASE}/"].changed is True
    # only the two LATEST compare — the older differing body is ignored
    assert rows[f"{BASE}/same"].n_snapshots == 3
    assert rows[f"{BASE}/same"].changed is False
    assert rows[f"{BASE}/single"].n_snapshots == 1
    assert rows[f"{BASE}/single"].changed is False
    assert rows[f"{BASE}/"].latest_ts is not None

    assert changed_tuples(changed_urls(pages)) == [f"{BASE}/"]


def test_cli_seeds_changed_e2e(spark, tmp_path, capsys):
    from node_crawler_spark.cli import main

    s = _churn_scenario()
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))
    # no --seeds at all: the changed url is the sole seed
    rc = main(
        [
            "--pages", str(tmp_path / "pages"),
            "--http-meta", str(tmp_path / "http"),
            "--store", str(tmp_path / "store"),
            "--seeds-changed",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["urls_seen"] >= 1
    from node_crawler_spark.sources.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"))
    seen = {r.url for r in store.read_seen(spark).collect()}
    assert f"{BASE}/" in seen
