"""Lint: freeze the no-single-partition-window discipline.

BENCH/BASELINE.md §14 audited every ``Window.orderBy``-without-
``partitionBy`` site in the package: a global window plans a
WindowExec with ALL rows in one task, the canonical single-core trap
at open-web cardinality. The audit rewrote the four offenders
(sk_kmv_merge, o_key_skew, t_ccnet_perplexity, o_warc_gaps) and
justified the survivors — every one runs over a frame that is bounded
by construction, never over a data-sized stream:

  assign_global_seq     small-round branch only; large rounds take the
                        two-phase bucketed rank (no global window)
  build_seed_frontier   user-supplied seed list (driver-sized input)
  run_crawl             mid-crawl queue() url list (callback-sized)
  o_global_seq          nation demo table (25 rows by construction)
  g_frontier_growth     per-BFS-depth aggregate rows (<= max depth)
  g_opic_fidelity       after .limit(FID_TOP_N) (50-row panel)
  o_warc_gaps           <=P-row bucket-edge stitch frame only
  t_rrf_fusion          after .limit(RRF_TOP) per ranker (50 rows)
  t_vocab_growth        per-band aggregate rows (<= band count)
  w_watermark_lag       per-bucket prefix max (<= WM bucket count)

This test pins that exact set. A new ``Window.orderBy(...)`` with no
partition key anywhere in the package fails here until it is either
rewritten distributed (two-phase rank / TakeOrderedAndProject /
bucket-and-stitch — see PLANS.md) or proven frame-bounded and added
to the allowlist WITH its justification above.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "node_crawler_spark"

# (file relative to the package, enclosing function) -> occurrence count
ALLOWED = {
    ("operators/expand.py", "assign_global_seq"): 1,
    ("plans/driver.py", "build_seed_frontier"): 1,
    ("plans/driver.py", "run_crawl"): 1,
    ("queries.py", "g_frontier_growth"): 2,
    ("queries.py", "g_opic_fidelity"): 1,
    ("queries.py", "o_global_seq"): 1,
    ("queries.py", "o_warc_gaps"): 1,
    ("queries.py", "t_rrf_fusion"): 2,
    ("queries.py", "t_vocab_growth"): 1,
    ("queries.py", "w_watermark_lag"): 1,
}


def _global_window_sites():
    """Every ``Window.orderBy`` occurrence in the package, keyed by
    (relative file, enclosing top-level-or-method def name).

    ``Window.orderBy`` as the leading call is exactly the global-window
    spelling: a partitioned window is written ``Window.partitionBy(...)
    .orderBy(...)``, so the partitioned form never matches.
    """
    sites = {}
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        current = "<module>"
        for line in path.read_text().splitlines():
            m = re.match(r"\s*def\s+(\w+)", line)
            if m:
                current = m.group(1)
            n = line.count("Window.orderBy")
            if n:
                key = (rel, current)
                sites[key] = sites.get(key, 0) + n
    return sites


def test_no_new_single_partition_windows():
    sites = _global_window_sites()
    new = {k: v for k, v in sites.items() if k not in ALLOWED}
    assert not new, (
        "new Window.orderBy without partitionBy — a single-partition "
        f"WindowExec at scale. Rewrite distributed or justify+allowlist: {new}"
    )
    grown = {
        k: (v, ALLOWED[k]) for k, v in sites.items()
        if k in ALLOWED and v > ALLOWED[k]
    }
    assert not grown, f"allowlisted site grew (found, allowed): {grown}"


def test_allowlist_has_no_stale_entries():
    sites = _global_window_sites()
    stale = {k: v for k, v in ALLOWED.items() if sites.get(k, 0) == 0}
    assert not stale, (
        f"allowlist entries no longer present — prune them: {stale}"
    )
