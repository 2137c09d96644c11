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

Parser semantics: RFC 9309 (the Robots Exclusion Protocol as Google
et al. implement it). ``parse_robots_rules`` returns (pattern, allow)
rules — ``Allow:`` honored, ``*`` matches any octet run, a trailing
``$`` anchors the end; groups naming the agent exactly take precedence
over ``*`` groups and same-precedence groups MERGE (RFC 9309 §2.2.1).
The match decision (``robots_allowed`` / the ``robots_gate`` fold) is
longest-pattern-wins with allow winning length ties (§2.2.2), default
allow, over path + '?' + query. The pre-RFC prefix kernel
(``parse_robots_body``) remains for callers that only want disallow
prefixes; legacy (domain, prefix) config rows still work — they
normalize to disallow rules.

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

RULE_SCHEMA = "domain string, pattern string, allow boolean"

ROBOTS_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/robots\.txt$"


def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored Java/PCRE-common regex:
    ``*`` = any octet run, trailing ``$`` = end anchor, everything
    else literal (inner ``$`` included)."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def normalize_robots_rules(rows) -> list[tuple[str, str, bool]]:
    """Config rows → (domain, pattern, allow). Accepts legacy
    (domain, prefix) disallow pairs and (domain, pattern, allow)
    triples, mixed freely."""
    out = []
    for r in rows:
        if len(r) == 2:
            out.append((r[0], r[1], False))
        else:
            out.append((r[0], r[1], bool(r[2])))
    return out


def robots_allowed(rules, path: str) -> bool:
    """RFC 9309 §2.2.2 decision for ONE domain's (pattern, allow)
    rules against a path('?'query) string: the longest matching
    pattern wins; on a length tie allow wins; no match = allowed.
    Pure kernel — the simulator and tests share it; the Spark gate
    (``robots_gate``) implements the identical fold in codegen."""
    import re as _re

    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if _re.match(robots_pattern_regex(pattern), path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return best_allow if best_len >= 0 else True


def robots_gate(df: DataFrame, robots_rows, url_col: str) -> DataFrame:
    """Filter ``df`` to urls the RFC 9309 rules allow. One broadcast
    row per domain carrying array<struct<rx,plen,allow>>; the verdict
    is a higher-order ``filter`` + ``aggregate`` fold picking the
    longest matching pattern (allow wins ties) — pure JVM codegen, no
    shuffle on the candidate side, no per-candidate explosion (the
    rules ride in ONE array cell per domain). Hosts with no rules pass
    (left join ⇒ null array ⇒ allowed)."""
    rules = normalize_robots_rules(robots_rows)
    if not rules:
        return df
    by_dom: dict[str, list] = {}
    for dom, pat, allow in rules:
        by_dom.setdefault(dom, []).append(
            (robots_pattern_regex(pat), len(pat), allow)
        )
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        sorted(by_dom.items()),
        "r_domain string, "
        "r_rules array<struct<rx:string, plen:int, allow:boolean>>",
    )
    from node_crawler_spark.functions.urlkit import hostport_col

    u = F.col(url_col)
    hostport = hostport_col(u)
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.parse_url(u, F.lit("QUERY"))
    pathq = F.concat(
        path,
        F.when(
            query.isNotNull(), F.concat(F.lit("?"), query)
        ).otherwise(F.lit("")),
    )
    verdict = F.expr(
        """
        aggregate(
          filter(_rr, r -> _pathq RLIKE r.rx),
          named_struct('plen', -1, 'allow', true),
          (acc, r) -> IF(r.plen > acc.plen
                         OR (r.plen = acc.plen AND r.allow),
                         named_struct('plen', r.plen, 'allow', r.allow),
                         acc),
          acc -> acc.allow)
        """
    )
    return (
        df.withColumn("_rh", hostport)
        .withColumn("_pathq", pathq)
        .join(F.broadcast(rdf), F.col("_rh") == F.col("r_domain"), "left")
        .withColumnRenamed("r_rules", "_rr")
        .where(F.coalesce(verdict, F.lit(True)))
        .drop("_rh", "_pathq", "_rr", "r_domain")
    )


def parse_robots_rules(
    text: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """(pattern, allow) rules applying to ``user_agent`` per RFC 9309
    group selection: groups naming the agent exactly beat ``*``
    groups; all groups at the winning precedence MERGE. Empty
    Allow/Disallow values contribute no rule."""
    ua = user_agent.lower()
    exact: list[tuple[str, bool]] = []
    star: list[tuple[str, bool]] = []
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
            if field in ("disallow", "allow") and value:
                rule = (value, field == "allow")
                if ua != "*" and ua in group_agents:
                    exact.append(rule)
                if "*" in group_agents:
                    star.append(rule)
    return exact if exact else star


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
    """(domain, pattern, allow) RFC 9309 rules from the latest
    robots.txt snapshot of every host in the page store."""
    from node_crawler_spark.functions.urlkit import node_parse

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doms, pats, allows = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                domain = node_parse(url)["host"]
                for p, allow in parse_robots_rules(_decode(html), user_agent):
                    doms.append(domain)
                    pats.append(p)
                    allows.append(allow)
            yield pd.DataFrame(
                {"domain": doms, "pattern": pats, "allow": allows}
            )

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


def rules_tuples(rules: DataFrame) -> tuple[tuple[str, str, bool], ...]:
    """Collect a rules DataFrame into CrawlConfig.robots form (sorted,
    deterministic). Driver-side by design — the config gate broadcasts
    them; see module docstring for the huge-domain-count path."""
    return tuple(
        sorted((r.domain, r.pattern, r.allow) for r in rules.collect())
    )
