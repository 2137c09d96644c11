"""CrawlConfig — the reference constructor params as a frozen dataclass.

Mirrors crawler.js:10-51 defaults (asserted by
tests/unit/crawlerInitSpec.js): crawlExternal=false, retries=0,
workers=4, timeout=60000, strictSSL=false, excludePatterns=[].
Cluster-side additions (politeness, robots, bloom) implement the
BASELINE.json north_star extensions that the reference lacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PolitenessRule:
    """Per-domain politeness: ``budget`` = max URLs scheduled per round
    (≤0 means unlimited — a delay-only rule); ``crawl_delay_ms`` is
    enforced against ``CrawlConfig.round_time_ms`` (see
    operators/politeness.py)."""

    domain: str
    budget: int
    crawl_delay_ms: int = 0


@dataclass(frozen=True)
class CrawlConfig:
    # --- reference params (crawler.js:20-46) ---
    crawl_external: bool = False          # crawler.js:20
    exclude_patterns: tuple[str, ...] = ()  # crawler.js:39 (regex, gi)
    retries: int = 0                      # crawler.js:44
    workers: int = 1                      # crawler.js:23; goldens pin 1
    auth: bool = False                    # crawler.js:38 (modeled in http_meta)
    use_cookies: bool = True              # crawler.js:31-36 (jar:false disables)
    # workers=1 parity mode for the last cookie deviation: cookies a
    # page's chain stores become visible to every LATER-seq page of
    # the SAME round (the sequential reference's behavior), via a
    # bounded within-round re-fetch fixpoint. Off by default — the
    # default keeps the deterministic round barrier (same-round
    # visibility is a race under the reference's 4 workers anyway),
    # and the fixpoint re-runs the round's fetch join per pass, which
    # is a parity cost, not the 100 TB path.
    sequential_cookies: bool = False
    # --- engine extensions (north_star) ---
    max_rounds: int = 1000
    # O4 — scheduling priority within a domain budget: "fifo" replays
    # the reference's queue order; "dfs" prefers deeper urls first
    # (north_star's depth-first-within-domain option); "rank" orders
    # by a supplied (url, rank) table — feed a previous crawl's
    # PageRank (operators/linkgraph.py) via run_crawl(priority_ranks=…)
    priority: str = "fifo"
    max_redirects: int = 9                # crawler.js:283
    politeness: tuple[PolitenessRule, ...] = ()
    default_domain_budget: int = 0        # 0 = unlimited
    # nominal wall-clock a round models — crawl_delay_ms is enforced
    # against it: a domain with delay D schedules at most floor(T/D)
    # urls per round, or 1 url every ceil(D/T) rounds when D > T
    round_time_ms: int = 1000
    # RFC 9309 rules: (domain, pattern, allow) triples — '*' wildcard,
    # trailing '$' anchor, longest-match-wins, allow wins ties. Legacy
    # (domain, disallow_prefix) pairs still accepted (normalize to
    # allow=False). See operators/robots.py.
    robots: tuple[tuple, ...] = ()
    # --- scale knobs (operators/seenset.py — the D1 bloom sidecar) ---
    use_bloom_prefilter: bool = True
    # which approximate-membership structure backs the prefilter:
    # "bloom" (OR-mergeable bitmaps) or "cuckoo" (fingerprint table —
    # deletion-capable, ~½ the bits/key at equal FP; the north_star's
    # "bloom/cuckoo" alternative)
    seen_filter: str = "bloom"
    bloom_shards: int = 64
    bloom_bits_per_key: int = 10
    bloom_hashes: int = 6
    # engage the bloom probe only once the seen set has this many keys
    # (below it the exact anti-join is cheaper than the extra Arrow hop;
    # the filter is still maintained so engagement is instant)
    bloom_min_keys: int = 0
    # ...and only when the seen set dwarfs the round: the prefilter
    # pays when it spares a shuffle of seen >> candidates; while
    # seen ≈ round size (BFS growth phase) the plain anti-join wins.
    # Engaged iff n_keys >= max(bloom_min_keys, ratio * last_round_inserts).
    # Set to 0.0 to force the bloom on regardless of round size.
    bloom_engage_ratio: float = 10.0
    seen_salt_buckets: int = 32           # domain-hash salt for skew
    shuffle_partitions: int | None = None
    # contested-redirect residue rows above which the sequential walk
    # moves from the driver to a single executor task (bounds driver
    # memory on adversarial all-redirect rounds)
    redirect_residue_cap: int = 200_000
    # fold seen deltas into the bucketed base table every N rounds
    # (0 = off): bounds the delta-log fan-in for probes and resume
    compact_every: int = 0
    # probe the seen set from the bucket-partitioned store (candidate
    # buckets pushed down as partition filters) instead of the
    # in-memory checkpointed state — the cold-probe / huge-seen path
    probe_from_store: bool = False
    # adaptive per-domain backoff: a domain with ≥1 error event in the
    # PREVIOUS round runs this round at half its configured budget
    # (min 1); a clean round restores it. Binary one-round memory —
    # stateless beyond the last committed round's errors table, so a
    # resumed crawl reconstructs the exact schedule (no decay counters
    # to checkpoint). Applies only to budgeted domains: an unlimited
    # domain has no number to halve.
    error_backoff: bool = False

    # convenience -----------------------------------------------------
    def politeness_rows(self) -> list[tuple[str, int, int]]:
        return [(p.domain, p.budget, p.crawl_delay_ms) for p in self.politeness]

    def robots_rows(self) -> list[tuple[str, str]]:
        return list(self.robots)
