"""robots.txt exclusion rules, parsed from the page store itself
(north_star: "robots.txt exclusion" — the reference has no robots
support at all, crawler.js queues anything; this is the cluster-side
extension the spec names).

``robots_rules_from_pages`` scans the pages table for
``…://host/robots.txt`` snapshots (latest warc_ts per host), parses
the Disallow directives of every group whose User-agent matches, and
returns a (domain, prefix) DataFrame with the same shape as
``CrawlConfig.robots`` rows. The parse runs executor-side
(mapInPandas over the pruned robots subset — O(domains), not
O(pages)). ``rules_tuples`` collects them into the config form for the
driver's broadcast gate; at 10^7+ domains keep them as the DataFrame
and join instead (link_candidates' robots gate is already a broadcast
left-anti join, so swapping the source is a one-liner).

Parser semantics (original robots.txt convention, not the full REP
RFC): groups are runs of ``User-agent:`` lines followed by
``Disallow:`` lines; a group applies when it names the agent (case-
insensitive exact) or ``*``; empty Disallow means allow-everything and
contributes no rule; comments (#) and unknown directives are skipped.

``Crawl-delay`` is honored too (north_star: "per-domain politeness
budgets and crawl-delay"): ``robots_delays_from_pages`` extracts each
host's delay (seconds, fractional allowed → ms) and
``merge_robots_delays`` folds them into ``CrawlConfig.politeness`` as
delay-only rules, where the scheduler (operators/politeness.py)
already enforces them against round_time_ms. Precedence: a group
naming the agent exactly beats a ``*`` group; first value wins within
each precedence level; an explicit user-provided politeness rule for
a domain always beats the robots-derived one.
"""

from __future__ import annotations

import gzip as _gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RULE_SCHEMA = "domain string, prefix string"

ROBOTS_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/robots\.txt$"


def parse_robots_body(text: str, user_agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``user_agent`` (pure kernel —
    shared by the Arrow batch path and tests)."""
    ua = user_agent.lower()
    prefixes: list[str] = []
    group_agents: list[str] = []
    in_group_body = False
    applies = False

    def group_matches() -> bool:
        return any(a == "*" or a == ua for a in group_agents)

    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:  # a new group starts
                group_agents = []
                in_group_body = False
            group_agents.append(value.lower())
            applies = group_matches()
        elif field in ("disallow", "allow", "crawl-delay", "sitemap"):
            in_group_body = True
            if field == "disallow" and applies and value:
                prefixes.append(value)
    return prefixes


def parse_robots_delay_ms(text: str, user_agent: str = "*") -> int | None:
    """Crawl-delay for ``user_agent`` in milliseconds, or None.

    Exact-agent groups take precedence over ``*`` groups; the first
    parseable value wins within each level; malformed or negative
    values are skipped (pure kernel — shared by the Arrow batch path
    and tests)."""
    ua = user_agent.lower()
    exact_ms: int | None = None
    star_ms: int | None = None
    group_agents: list[str] = []
    in_group_body = False

    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:  # a new group starts
                group_agents = []
                in_group_body = False
            group_agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay", "sitemap"):
            in_group_body = True
            if field == "crawl-delay":
                try:
                    ms = int(float(value) * 1000)
                except ValueError:
                    continue
                if ms < 0:
                    continue
                if ua != "*" and ua in group_agents and exact_ms is None:
                    exact_ms = ms
                if "*" in group_agents and star_ms is None:
                    star_ms = ms
    return exact_ms if exact_ms is not None else star_ms


def _decode(raw: bytes | None) -> str:
    if raw is None:
        return ""
    if raw[:2] == b"\x1f\x8b":  # gzip magic
        try:
            raw = _gzip.decompress(raw)
        except OSError:
            return ""
    return raw.decode("utf-8", errors="replace")


def _latest_robots(pages: DataFrame) -> DataFrame:
    """Latest warc_ts snapshot of every …/robots.txt in the store."""
    cand = pages.where(F.col("url").rlike(ROBOTS_URL_RE)).select(
        "url", "warc_ts", "html"
    )
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "warc_ts")
    )


def robots_rules_from_pages(
    pages: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """(domain, prefix) rules from the latest robots.txt snapshot of
    every host in the page store."""
    from node_crawler_spark.functions.urlkit import node_parse

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doms, prefs = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                domain = node_parse(url)["host"]
                for p in parse_robots_body(_decode(html), user_agent):
                    doms.append(domain)
                    prefs.append(p)
            yield pd.DataFrame({"domain": doms, "prefix": prefs})

    return _latest_robots(pages).mapInPandas(parse_batches, RULE_SCHEMA)


def robots_delays_from_pages(
    pages: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """(domain, delay_ms) from the latest robots.txt snapshot of every
    host that declares a Crawl-delay for ``user_agent``. Executor-side
    like the rules parse (mapInPandas over the pruned robots subset)."""
    from node_crawler_spark.functions.urlkit import node_parse

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doms, delays = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                ms = parse_robots_delay_ms(_decode(html), user_agent)
                if ms is not None and ms > 0:
                    doms.append(node_parse(url)["host"])
                    delays.append(ms)
            yield pd.DataFrame(
                {"domain": doms, "delay_ms": pd.array(delays, dtype="int32")}
            )

    return _latest_robots(pages).mapInPandas(
        parse_batches, "domain string, delay_ms int"
    )


def delay_tuples(delays: DataFrame) -> tuple[tuple[str, int], ...]:
    """Collect a delays DataFrame into (domain, delay_ms) tuples
    (sorted, deterministic). Driver-side by design — politeness rules
    broadcast; at huge domain counts keep the DataFrame and join."""
    return tuple(sorted((r.domain, r.delay_ms) for r in delays.collect()))


def merge_robots_delays(cfg, delays) -> "CrawlConfig":  # noqa: F821
    """Fold robots-derived (domain, delay_ms) pairs into
    ``cfg.politeness`` as delay-only rules (budget 0 = unlimited).
    Explicit user rules for a domain win over the robots value."""
    import dataclasses

    from node_crawler_spark.config import PolitenessRule

    have = {p.domain for p in cfg.politeness}
    add = tuple(
        PolitenessRule(domain=d, budget=0, crawl_delay_ms=ms)
        for d, ms in sorted(delays)
        if d not in have and ms > 0
    )
    return dataclasses.replace(cfg, politeness=cfg.politeness + add)


def rules_tuples(rules: DataFrame) -> tuple[tuple[str, str], ...]:
    """Collect a rules DataFrame into CrawlConfig.robots form (sorted,
    deterministic). Driver-side by design — the config gate broadcasts
    them; see module docstring for the huge-domain-count path."""
    return tuple(
        sorted((r.domain, r.prefix) for r in rules.collect())
    )
