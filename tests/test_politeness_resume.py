"""North-rule extensions: checkpoint/resume bit-identity and
per-domain politeness budgets (J6/A4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig, PolitenessRule
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import scenario
from node_crawler_spark.sources.store import SnapshotStore


def _tables(spark, res):
    out = {}
    for name, df in {
        "seen": res.seen(spark),
        "crawled": res.crawled(spark),
        "errors": res.errors(spark),
        "redirects": res.redirects(spark),
    }.items():
        if df is None:
            out[name] = []
        else:
            drop = [c for c in ("bucket",) if c in df.columns]
            out[name] = sorted(
                (tuple(r) for r in df.drop(*drop).collect()), key=repr
            )
    return out


import pytest


@pytest.mark.parametrize("name", ["chain4", "kitchen_sink"])
def test_resume_bit_identical(spark, tmp_path, name):
    """Kill after round 2, resume → identical final state to an
    uninterrupted run (north_rule resumability). kitchen_sink makes
    this adversarial: the crawl-global cookie set in round 1 and the
    auth/retry machinery must survive the kill/resume boundary —
    in-memory-only jar state would 403 the post-resume /member fetch."""
    s = scenario(name)
    pages, http = s.dfs(spark)

    full = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "full"))
    want = _tables(spark, full)

    # interrupted run: stop after round 2 (max_rounds caps the loop)
    part_cfg = CrawlConfig(**{**s.cfg.__dict__, "max_rounds": 2})
    run_crawl(spark, part_cfg, pages, http, s.seeds, str(tmp_path / "part"))
    store = SnapshotStore(str(tmp_path / "part"))
    assert store.last_committed_round() == 2

    resumed = run_crawl(
        spark, s.cfg, pages, http, s.seeds, str(tmp_path / "part"), resume=True
    )
    got = _tables(spark, resumed)
    assert got == want
    assert resumed.max_seq == full.max_seq

    # north_rule: every committed round's manifest carries per-partition
    # lineage for the seen delta + next frontier, and a final max_seq
    # (the manifest is published once, atomically — never patched)
    for r in range(store.last_committed_round() + 1):
        m = store.read_manifest(r)
        assert m["max_seq"] >= 0
        for t in ("seen_delta", "next_frontier"):
            entry = m["tables"][t]
            assert "partitions" in entry, f"round {r} {t} missing lineage"
            assert entry["rows"] == sum(entry["partitions"].values())


def test_politeness_budget_respected(spark, tmp_path):
    """Budget 1/domain/round: the crawl stretches over more rounds,
    schedules FIFO-by-seq within the domain, and still reaches every
    url exactly once."""
    s = scenario("chain4")
    pages, http = s.dfs(spark)

    base = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "nopol"))
    base_seen = {r.url for r in base.seen(spark).collect()}

    cfg = CrawlConfig(
        politeness=(PolitenessRule("www.site.test", budget=1),),
        max_rounds=50,
    )
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "pol"))
    crawled = res.crawled(spark).collect()

    # every url still crawled exactly once
    assert {r.url for r in crawled} == base_seen
    assert len(crawled) == len(base_seen)
    # ≤1 fetch per domain per round, and more rounds than the unpoliced run
    per_round = {}
    for r in crawled:
        per_round[r.round] = per_round.get(r.round, 0) + 1
    assert all(v <= 1 for v in per_round.values())
    assert res.rounds > base.rounds
    # FIFO: fetch (round) order follows seq order within the domain
    by_round = sorted(crawled, key=lambda r: r.round)
    seqs = [r.seq for r in by_round]
    assert seqs == sorted(seqs)


def test_priority_dfs_prefers_depth(spark, tmp_path):
    """O4: with priority='dfs' and a budget of 1, the scheduler picks
    the deepest queued url first (seq breaks ties), unlike FIFO."""
    from node_crawler_spark.operators.politeness import apply_domain_budget

    rows = [
        ("http://d.test/shallow", 1, None, False, True, 0),
        ("http://d.test/mid", 2, None, False, True, 2),
        ("http://d.test/deep", 3, None, False, True, 5),
    ]
    frontier = spark.createDataFrame(
        rows,
        "url string, seq long, referrer string, is_external boolean, "
        "crawl_links boolean, depth int",
    )
    cfg_fifo = CrawlConfig(politeness=(PolitenessRule("d.test", budget=1),))
    sched, _ = apply_domain_budget(frontier, cfg_fifo)
    assert [r.url for r in sched.collect()] == ["http://d.test/shallow"]

    cfg_dfs = CrawlConfig(
        politeness=(PolitenessRule("d.test", budget=1),), priority="dfs"
    )
    sched, deferred = apply_domain_budget(frontier, cfg_dfs)
    assert [r.url for r in sched.collect()] == ["http://d.test/deep"]
    assert deferred.count() == 2


def test_crawl_delay_caps_per_round(spark):
    """A4 crawl-delay: D ≤ T caps floor(T/D) per round; D > T opens the
    gate only every ceil(D/T)-th round; budget-only domains are
    untouched by the round index."""
    from node_crawler_spark.operators.politeness import apply_domain_budget

    rows = [(f"http://slow.test/p{i}", i + 1, None, False, True, 0) for i in range(6)]
    rows += [(f"http://fast.test/p{i}", 10 + i, None, False, True, 0) for i in range(6)]
    rows += [(f"http://plain.test/p{i}", 20 + i, None, False, True, 0) for i in range(6)]
    frontier = spark.createDataFrame(
        rows,
        "url string, seq long, referrer string, is_external boolean, "
        "crawl_links boolean, depth int",
    )
    cfg = CrawlConfig(
        politeness=(
            PolitenessRule("slow.test", budget=0, crawl_delay_ms=2000),  # 1 every 2 rounds
            PolitenessRule("fast.test", budget=0, crawl_delay_ms=250),   # 4 per round
            PolitenessRule("plain.test", budget=2),                      # budget only
        ),
        round_time_ms=1000,
    )

    def counts(round_idx):
        sched, _ = apply_domain_budget(frontier, cfg, round_idx=round_idx)
        out = {"slow": 0, "fast": 0, "plain": 0}
        for r in sched.collect():
            for k in out:
                if k in r.url:
                    out[k] += 1
        return out

    odd, even = counts(1), counts(2)
    assert odd == {"slow": 0, "fast": 4, "plain": 2}
    assert even == {"slow": 1, "fast": 4, "plain": 2}


def test_crawl_delay_spreads_rounds_e2e(spark, tmp_path):
    """End-to-end: a delayed domain's fetches land only on its due
    rounds, the crawl still completes, and the delay gate's empty
    rounds don't trip the drain detector."""
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    cfg = CrawlConfig(
        politeness=(PolitenessRule("www.site.test", budget=0, crawl_delay_ms=3000),),
        round_time_ms=1000,
        max_rounds=40,
    )
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "delay"))
    base = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "base"))
    # same coverage
    assert {r.url for r in res.seen(spark).collect()} == {
        r.url for r in base.seen(spark).collect()
    }
    crawled = res.crawled(spark).collect()
    fetch_rounds = sorted(r.round for r in crawled)
    # one fetch per due round, due rounds are multiples of ceil(3000/1000)=3
    assert all(r % 3 == 0 for r in fetch_rounds), fetch_rounds
    assert len(set(fetch_rounds)) == len(fetch_rounds)


def test_kill_switch_then_resume(spark, tmp_path):
    """F7 analog: a KILL marker halts the loop at the next round
    boundary; removing it and resuming completes bit-identically."""
    import os

    s = scenario("chain4")
    pages, http = s.dfs(spark)
    root = str(tmp_path / "killed")

    os.makedirs(root, exist_ok=True)
    open(os.path.join(root, "KILL"), "w").close()
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, root)
    assert res.rounds == 0, "killed before round 1"
    assert SnapshotStore(root).last_committed_round() == 0

    os.remove(os.path.join(root, "KILL"))
    resumed = run_crawl(spark, s.cfg, pages, http, s.seeds, root, resume=True)
    full = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "full2"))
    assert _tables(spark, resumed) == _tables(spark, full)


def test_politeness_skew_two_phase(spark, tmp_path):
    """Hot-domain shape: one domain with many urls + budget — the
    salted two-phase top-k must pick exactly the lowest seqs."""
    from node_crawler_spark.operators.politeness import apply_domain_budget

    rows = [(f"http://hot.test/p{i}", i + 1, None, False, True) for i in range(97)]
    rows += [(f"http://cold{i}.test/", 100 + i, None, False, True) for i in range(5)]
    frontier = spark.createDataFrame(
        rows, "url string, seq long, referrer string, is_external boolean, crawl_links boolean"
    )
    cfg = CrawlConfig(
        politeness=(PolitenessRule("hot.test", budget=7),),
        seen_salt_buckets=8,
    )
    sched, deferred = apply_domain_budget(frontier, cfg, salt_shards=8)
    sched_rows = sched.collect()
    hot = sorted(r.seq for r in sched_rows if "hot.test" in r.url)
    assert hot == list(range(1, 8)), "budget must pick the 7 lowest seqs"
    # unbudgeted domains schedule fully
    assert sum("cold" in r.url for r in sched_rows) == 5
    assert deferred.count() == 90
