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
