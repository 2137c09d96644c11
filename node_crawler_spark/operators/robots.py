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


def _decode(raw: bytes | None) -> str:
    if raw is None:
        return ""
    if raw[:2] == b"\x1f\x8b":  # gzip magic
        try:
            raw = _gzip.decompress(raw)
        except OSError:
            return ""
    return raw.decode("utf-8", errors="replace")


def robots_rules_from_pages(
    pages: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """(domain, prefix) rules from the latest robots.txt snapshot of
    every host in the page store."""
    from node_crawler_spark.functions.urlkit import node_parse

    cand = pages.where(F.col("url").rlike(ROBOTS_URL_RE)).select(
        "url", "warc_ts", "html"
    )
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
    latest = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "warc_ts")
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doms, prefs = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                domain = node_parse(url)["host"]
                for p in parse_robots_body(_decode(html), user_agent):
                    doms.append(domain)
                    prefs.append(p)
            yield pd.DataFrame({"domain": doms, "prefix": prefs})

    return latest.mapInPandas(parse_batches, RULE_SCHEMA)


def rules_tuples(rules: DataFrame) -> tuple[tuple[str, str], ...]:
    """Collect a rules DataFrame into CrawlConfig.robots form (sorted,
    deterministic). Driver-side by design — the config gate broadcasts
    them; see module docstring for the huge-domain-count path."""
    return tuple(
        sorted((r.domain, r.prefix) for r in rules.collect())
    )
