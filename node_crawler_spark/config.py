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
    """Per-domain budget: max URLs scheduled per round + crawl delay."""

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
    # --- engine extensions (north_star) ---
    max_rounds: int = 1000
    # O4 — scheduling priority within a domain budget: "fifo" replays
    # the reference's queue order; "dfs" prefers deeper urls first
    # (north_star's depth-first-within-domain option)
    priority: str = "fifo"
    max_redirects: int = 9                # crawler.js:283
    politeness: tuple[PolitenessRule, ...] = ()
    default_domain_budget: int = 0        # 0 = unlimited
    robots: tuple[tuple[str, str], ...] = ()  # (domain, disallow_prefix)
    # --- scale knobs ---
    use_bloom_prefilter: bool = True
    bloom_shards: int = 64
    bloom_bits_per_key: int = 10
    bloom_hashes: int = 6
    seen_salt_buckets: int = 32           # domain-hash salt for skew
    shuffle_partitions: int | None = None

    # convenience -----------------------------------------------------
    def politeness_rows(self) -> list[tuple[str, int, int]]:
        return [(p.domain, p.budget, p.crawl_delay_ms) for p in self.politeness]

    def robots_rows(self) -> list[tuple[str, str]]:
        return list(self.robots)
