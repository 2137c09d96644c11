"""Adaptive per-domain error backoff (cfg.error_backoff): a domain
that errored last round runs this round at half its budget (min 1); a
clean round restores it; resume reconstructs the exact schedule from
the last committed errors table (binary one-round memory — nothing
extra to checkpoint)."""

from __future__ import annotations

import datetime

from node_crawler_spark.config import CrawlConfig, PolitenessRule
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import HTTP_SCHEMA, PAGES_SCHEMA

_TS = datetime.datetime(2026, 3, 1, 12, 0, 0)
_H = "http://a.test"


def _fixture(spark):
    def html(*hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return f"<html><body>{body}</body></html>".encode()

    pages = [
        (f"{_H}/", _TS, html("/e1", "/p1", "/p2", "/p3", "/p4"), None, None),
        (f"{_H}/p1", _TS, html(), None, None),
        (f"{_H}/p2", _TS, html(), None, None),
        (f"{_H}/p3", _TS, html(), None, None),
        (f"{_H}/p4", _TS, html(), None, None),
    ]
    ok = (200, None, "text/html", None, None, None, False, None, False)
    http = [
        (f"{_H}/", 0, *ok),
        (f"{_H}/e1", 0, 404, None, "text/html", None, None, None, False,
         None, False),
        (f"{_H}/p1", 0, *ok),
        (f"{_H}/p2", 0, *ok),
        (f"{_H}/p3", 0, *ok),
        (f"{_H}/p4", 0, *ok),
    ]
    return (
        spark.createDataFrame(pages, PAGES_SCHEMA),
        spark.createDataFrame(http, HTTP_SCHEMA),
    )


def _per_round(spark, res):
    out: dict[int, set] = {}
    for df, tag in ((res.crawled(spark), "ok"), (res.errors(spark), "err")):
        if df is None:
            continue
        for r in df.collect():
            out.setdefault(r.round, set()).add((tag, r.url))
    return out


def _cfg(backoff: bool) -> CrawlConfig:
    return CrawlConfig(
        politeness=(PolitenessRule("a.test", budget=2),),
        error_backoff=backoff,
        max_rounds=20,
    )


def test_error_backoff_halves_then_restores(spark, tmp_path):
    pages, http = _fixture(spark)
    seeds = [f"{_H}/"]

    # control: full budget every round — r1 seed, r2 {e1,p1}, r3 {p2,p3},
    # r4 {p4}
    ctrl = run_crawl(
        spark, _cfg(False), pages, http, seeds, str(tmp_path / "ctrl")
    )
    assert _per_round(spark, ctrl) == {
        1: {("ok", f"{_H}/")},
        2: {("err", f"{_H}/e1"), ("ok", f"{_H}/p1")},
        3: {("ok", f"{_H}/p2"), ("ok", f"{_H}/p3")},
        4: {("ok", f"{_H}/p4")},
    }

    # backoff: round 2's 404 halves round 3 to ONE fetch; round 3 is
    # clean so round 4 runs at the full budget again
    res = run_crawl(
        spark, _cfg(True), pages, http, seeds, str(tmp_path / "bo")
    )
    assert _per_round(spark, res) == {
        1: {("ok", f"{_H}/")},
        2: {("err", f"{_H}/e1"), ("ok", f"{_H}/p1")},
        3: {("ok", f"{_H}/p2")},
        4: {("ok", f"{_H}/p3"), ("ok", f"{_H}/p4")},
    }
    # same coverage either way — backoff reorders, never drops
    assert {u for s in _per_round(spark, res).values() for u in s} == {
        u for s in _per_round(spark, ctrl).values() for u in s
    }


def test_error_backoff_survives_resume(spark, tmp_path):
    """Kill right after the erroring round: the resumed crawl must
    rebuild the backoff set from round 2's committed errors table and
    still halve round 3."""
    pages, http = _fixture(spark)
    seeds = [f"{_H}/"]

    full = run_crawl(
        spark, _cfg(True), pages, http, seeds, str(tmp_path / "full")
    )
    want = _per_round(spark, full)

    part_cfg = CrawlConfig(**{**_cfg(True).__dict__, "max_rounds": 2})
    run_crawl(spark, part_cfg, pages, http, seeds, str(tmp_path / "part"))
    resumed = run_crawl(
        spark, _cfg(True), pages, http, seeds, str(tmp_path / "part"),
        resume=True,
    )
    assert _per_round(spark, resumed) == want
    assert resumed.max_seq == full.max_seq
