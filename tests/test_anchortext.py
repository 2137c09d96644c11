"""Anchor-text extraction (functions/html.py kernel) and per-target
aggregation (operators/anchortext.py)."""

from __future__ import annotations

from node_crawler_spark.functions.html import (
    extract_anchor_pairs_py,
    extract_links_py,
)
from node_crawler_spark.operators.anchortext import anchor_edges, anchor_texts
from node_crawler_spark.sources.fixtures import BASE, Scenario


def test_anchor_pairs_basic_and_nested_markup():
    html = (
        '<p><a href="/a">Plain</a>'
        '<a href="/b"><b>Bold</b> and <i>italic</i></a>'
        '<a href="/c">  spaced \n  out  </a></p>'
    )
    assert extract_anchor_pairs_py(html) == [
        ("/a", "Plain"),
        ("/b", "Bold and italic"),
        ("/c", "spaced out"),
    ]


def test_anchor_pairs_edge_cases():
    # empty href skipped; empty text kept; implicit close at next <a>
    html = (
        '<a href="">skip</a><a href="/img"><img src="x.png"></a>'
        '<a href="/one">first<a href="/two">second</a>'
    )
    assert extract_anchor_pairs_py(html) == [
        ("/img", ""),
        ("/one", "first"),
        ("/two", "second"),
    ]
    # unterminated trailing anchor still captured
    assert extract_anchor_pairs_py('<a href="/t">tail text') == [
        ("/t", "tail text")
    ]
    assert extract_anchor_pairs_py("") == []
    assert extract_anchor_pairs_py("<<<garbage>>> & entity &amp;") == []
    # hrefs agree with the crawl's own extractor on shared input
    shared = '<a href="/a">x</a><a href="">y</a><a href="/b"><b>z</b></a>'
    assert [h for h, _ in extract_anchor_pairs_py(shared)] == extract_links_py(
        shared
    )


def _anchor_scenario() -> Scenario:
    from node_crawler_spark.config import CrawlConfig

    s = Scenario(name="anchors", cfg=CrawlConfig(), seeds=[f"{BASE}/"])
    s.page(
        f"{BASE}/",
        '<html><body><a href="/about">About us</a>'
        '<a href="/about#team">The team</a>'
        '<a href="http://other.test/x">External</a></body></html>',
    )
    s.page(
        f"{BASE}/p2",
        '<html><body><a href="/about">About  us</a>'
        '<a href="/about">Company</a></body></html>',
    )
    return s


def test_anchor_edges_resolution_and_fragment_strip(spark):
    s = _anchor_scenario()
    pages, _http = s.dfs(spark)
    edges = sorted(
        (r.src, r.dst, r.text) for r in anchor_edges(pages).collect()
    )
    assert edges == [
        (f"{BASE}/", "http://other.test/x", "External"),
        (f"{BASE}/", f"{BASE}/about", "About us"),
        (f"{BASE}/", f"{BASE}/about", "The team"),  # fragment stripped
        (f"{BASE}/p2", f"{BASE}/about", "About us"),  # ws-normalized
        (f"{BASE}/p2", f"{BASE}/about", "Company"),
    ]


def test_anchor_texts_rollup_counts_and_cap(spark):
    s = _anchor_scenario()
    pages, _http = s.dfs(spark)
    rows = {r.url: r for r in anchor_texts(pages).collect()}

    about = rows[f"{BASE}/about"]
    assert about.n_refs == 4
    assert about.n_sources == 2
    assert about.texts == ["About us", "Company", "The team"]

    ext = rows["http://other.test/x"]
    assert (ext.n_refs, ext.n_sources, ext.texts) == (1, 1, ["External"])

    capped = {
        r.url: r for r in anchor_texts(pages, max_texts=2).collect()
    }[f"{BASE}/about"]
    assert capped.texts == ["About us", "Company"]  # first 2 in sort order
    assert capped.n_refs == 4  # counts unaffected by the text cap


def test_anchor_texts_plan_caps_before_collect(spark):
    """The text cap must plan as WindowGroupLimit (partial+final) so
    the per-target cut happens BELOW the shuffle — the bounded-hub
    guarantee is a plan property, not a hope."""
    s = _anchor_scenario()
    pages, _http = s.dfs(spark)
    plan = anchor_texts(pages)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan
