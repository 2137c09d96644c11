"""PageRank over the crawl link graph — numeric oracle (numpy power
iteration with identical teleport/dangling conventions) and an
end-to-end run off a real crawl's committed sink."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_crawler_spark.operators.linkgraph import link_edges, pagerank


def _numpy_pagerank(urls, edge_list, iters, d=0.85):
    n = len(urls)
    idx = {u: i for i, u in enumerate(urls)}
    out = {i: [] for i in range(n)}
    for s, t in edge_list:
        out[idx[s]].append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i]:
                share = r[i] / len(out[i])
                for j in out[i]:
                    nr[j] += share
            else:
                dangling += r[i]
        r = (1.0 - d) / n + d * dangling / n + d * nr
    return {u: r[idx[u]] for u in urls}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        # e is dangling (appears only as a target)
        ("c", "e"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.url: r.rank for r in pagerank(df, iters=30).collect()}
    want = _numpy_pagerank(sorted({u for e in edges for u in e}), edges, 30)
    assert abs(sum(got.values()) - 1.0) < 1e-9, "ranks must sum to 1"
    for u, w in want.items():
        assert abs(got[u] - w) < 1e-9, f"{u}: {got[u]} vs {w}"
    # the hub c must outrank the leaf e
    assert got["c"] > got["e"]


def test_pagerank_off_a_real_crawl(spark, tmp_path):
    from node_crawler_spark.plans.driver import run_crawl
    from node_crawler_spark.sources.fixtures import scenario

    s = scenario("basic_link_crawl")
    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "st"))
    edges = link_edges(res.crawled(spark))
    ranks = pagerank(edges, iters=10)
    rows = ranks.collect()
    assert len(rows) > 0
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
    assert all(r.rank > 0 for r in rows)


def test_rank_priority_schedules_high_rank_first(spark, tmp_path):
    """priority='rank' + a budget: the highest-ranked url wins the
    round's single slot even though FIFO (seq) would pick another."""
    from node_crawler_spark.config import CrawlConfig, PolitenessRule
    from node_crawler_spark.plans.driver import run_crawl
    from node_crawler_spark.sources.fixtures import Scenario

    def html(*hrefs):
        return "".join(f'<a href="{h}">x</a>' for h in hrefs)

    base = "http://www.ranked.test"
    s = Scenario(
        name="rankprio",
        cfg=CrawlConfig(
            priority="rank",
            politeness=(PolitenessRule("www.ranked.test", 1),),
            max_rounds=2,  # round 1: root; round 2: ONE budgeted slot
        ),
        seeds=[f"{base}/"],
    )
    s.page(f"{base}/", html("/a", "/b", "/c"))
    for p in ("a", "b", "c"):
        s.page(f"{base}/{p}", "")
    pages, http = s.dfs(spark)

    ranks = spark.createDataFrame(
        [(f"{base}/c", 0.9), (f"{base}/a", 0.1), (f"{base}/b", 0.2)],
        "url string, rank double",
    )
    res = run_crawl(
        spark, s.cfg, pages, http, s.seeds, str(tmp_path / "st"),
        priority_ranks=ranks,
    )
    crawled = sorted(r.url for r in res.crawled(spark).collect())
    assert crawled == [f"{base}/", f"{base}/c"], crawled

    # control: fifo picks /a (lowest seq)
    import dataclasses

    cfg_fifo = dataclasses.replace(s.cfg, priority="fifo")
    res2 = run_crawl(spark, cfg_fifo, pages, http, s.seeds,
                     str(tmp_path / "st2"))
    crawled2 = sorted(r.url for r in res2.crawled(spark).collect())
    assert crawled2 == [f"{base}/", f"{base}/a"], crawled2


def test_cli_ranks_from_store(spark, tmp_path, capsys):
    """The operational re-crawl loop: crawl once, then re-crawl with
    --ranks-from-store — the second crawl's budgeted schedule follows
    the first crawl's PageRank."""
    import json

    from node_crawler_spark.cli import main
    from node_crawler_spark.sources.fixtures import scenario

    s = scenario("basic_link_crawl")
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))

    rc = main([
        "--seeds", *s.seeds,
        "--pages", str(tmp_path / "pages"),
        "--http-meta", str(tmp_path / "http"),
        "--store", str(tmp_path / "store1"),
    ])
    assert rc == 0
    rc = main([
        "--seeds", *s.seeds,
        "--pages", str(tmp_path / "pages"),
        "--http-meta", str(tmp_path / "http"),
        "--store", str(tmp_path / "store2"),
        "--ranks-from-store", str(tmp_path / "store1"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    summaries = [json.loads(x) for x in out.strip().splitlines()
                 if x.startswith("{")]
    # without budgets rank priority must not change WHAT is crawled
    assert summaries[-1]["urls_seen"] == summaries[0]["urls_seen"]
