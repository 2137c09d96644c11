"""Sitemap-driven seed discovery from the page store (north_star's
seed-list face: the reference takes an explicit seed list —
crawler.js queue() — and has no sitemap support; this is the
cluster-side extension that turns the store's own sitemap.xml
snapshots into that seed list, symmetric with operators/robots.py).

Discovery sources, per the sitemaps.org protocol:
- ``Sitemap:`` declarations in robots.txt (global directives — they
  apply regardless of user-agent group),
- the conventional ``…://host/sitemap.xml`` (and ``.xml.gz``) path.

``seeds_from_sitemaps`` resolves both against the page store's latest
snapshots, parses ``<urlset>`` entries into seed URLs, and follows
``<sitemapindex>`` nesting a bounded number of levels (the protocol
allows one level; we allow ``index_depth``). Everything runs
executor-side: the XML parse is a mapInPandas Arrow batch over ONLY
the sitemap-url subset (O(sitemaps), not O(pages)), and each nesting
level is one equi-join on url against the store — the same join shape
as the fetch phase, so a bucketed page store serves it shuffle-free.
The returned seeds are a DataFrame; they enter the crawl through the
normal queue-gate chain (protocol filter, exclude patterns, robots,
seen-set) exactly like user-provided seeds — sitemap entries get no
trust bypass.
"""

from __future__ import annotations

import gzip as _gzip
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SITEMAP_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/sitemap\.xml(\.gz)?$"

_LOC_RE = re.compile(r"<loc\s*>\s*(.*?)\s*</loc\s*>", re.DOTALL)
_ROOT_RE = re.compile(r"<\s*(urlset|sitemapindex)[\s>]")

# the five XML predefined entities — sitemap locs routinely carry &amp;
_XML_ENTITIES = (
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
)


def _unescape_xml(s: str) -> str:
    # &amp; last-to-first would double-decode; protocol order: amp first
    # must be decoded LAST so '&amp;lt;' → '&lt;' not '<'
    for ent, ch in _XML_ENTITIES[1:]:
        s = s.replace(ent, ch)
    return s.replace("&amp;", "&")


def parse_sitemap_py(text: str) -> tuple[str, list[str]]:
    """(kind, locs) where kind is 'urlset', 'index' or '' (not a
    sitemap). Pure kernel — shared by the Arrow batch path and tests.
    Regex-based by design: sitemap files in the wild are full of
    namespace prefixes and minor malformations that a strict XML
    parser rejects; <loc> extraction is the protocol's stable core."""
    if not text:
        return "", []
    m = _ROOT_RE.search(text)
    if not m:
        return "", []
    kind = "urlset" if m.group(1) == "urlset" else "index"
    locs = [_unescape_xml(x) for x in _LOC_RE.findall(text) if x]
    return kind, locs


def parse_robots_sitemaps_py(text: str) -> list[str]:
    """``Sitemap:`` declarations from a robots.txt body. Global
    directives per the protocol — user-agent groups are irrelevant."""
    out: list[str] = []
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


def _decode(raw: bytes | None) -> str:
    if raw is None:
        return ""
    raw = bytes(raw)
    if raw[:2] == b"\x1f\x8b":  # gzip magic (sitemap.xml.gz)
        try:
            raw = _gzip.decompress(raw)
        except OSError:
            return ""
    return raw.decode("utf-8", errors="replace")


def _latest(pages: DataFrame) -> DataFrame:
    """Latest warc_ts snapshot per url (the robots.py discipline)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
    return (
        pages.select("url", "warc_ts", "html")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "warc_ts")
    )


def sitemap_decls_from_robots(pages: DataFrame) -> DataFrame:
    """One-column (url) DataFrame of every Sitemap: declaration in the
    store's latest robots.txt snapshots."""
    from node_crawler_spark.operators.robots import ROBOTS_URL_RE

    robots = _latest(pages.where(F.col("url").rlike(ROBOTS_URL_RE)))

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            for html in pdf["html"]:
                urls.extend(parse_robots_sitemaps_py(_decode(html)))
            yield pd.DataFrame({"url": pd.array(urls, dtype="string")})

    return robots.mapInPandas(parse_batches, "url string")


_PARSE_SCHEMA = "kind string, loc string"


def _parse_sitemap_bodies(bodies: DataFrame) -> DataFrame:
    """(kind, loc) rows from (url, html) sitemap snapshots."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, locs = [], []
            for html in pdf["html"]:
                kind, found = parse_sitemap_py(_decode(html))
                for loc in found:
                    kinds.append(kind)
                    locs.append(loc)
            yield pd.DataFrame(
                {
                    "kind": pd.array(kinds, dtype="string"),
                    "loc": pd.array(locs, dtype="string"),
                }
            )

    return bodies.mapInPandas(parse_batches, _PARSE_SCHEMA)


def seeds_from_sitemaps(
    pages: DataFrame,
    extra_sitemaps: tuple[str, ...] = (),
    index_depth: int = 2,
) -> DataFrame:
    """Distinct seed-URL DataFrame (one column ``url``) from every
    sitemap reachable in the page store: robots declarations +
    conventional /sitemap.xml paths + ``extra_sitemaps``, following
    <sitemapindex> nesting up to ``index_depth`` levels. Bounded
    iteration (the protocol itself allows one nesting level); each
    level is one url equi-join against the store's latest snapshots +
    one Arrow-batch parse."""
    spark = pages.sparkSession
    latest = _latest(pages)

    conventional = pages.where(F.col("url").rlike(SITEMAP_PATH_RE)).select(
        "url"
    )
    frontier = sitemap_decls_from_robots(pages).unionByName(conventional)
    if extra_sitemaps:
        frontier = frontier.unionByName(
            spark.createDataFrame([(u,) for u in extra_sitemaps], "url string")
        )
    frontier = frontier.distinct()

    seeds = None
    visited = frontier
    for _ in range(max(1, index_depth)):
        parsed = _parse_sitemap_bodies(
            frontier.join(latest, "url").select("url", "html")
        ).localCheckpoint()  # parse once; both consumers below read it
        level_seeds = parsed.where(F.col("kind") == "urlset").select(
            F.col("loc").alias("url")
        )
        seeds = (
            level_seeds if seeds is None else seeds.unionByName(level_seeds)
        )
        nested = (
            parsed.where(F.col("kind") == "index")
            .select(F.col("loc").alias("url"))
            .distinct()
            .join(visited, "url", "left_anti")  # no re-parse loops
        )
        if nested.isEmpty():
            break
        frontier = nested
        visited = visited.unionByName(nested)
    return seeds.distinct() if seeds is not None else frontier.limit(0)


def seed_tuples(seeds: DataFrame) -> tuple[str, ...]:
    """Collect a seeds DataFrame into the driver's seed-list form
    (sorted, deterministic). Driver-side by design — run_crawl takes
    the seed list as config; at 10^8-entry sitemap scale, write the
    DataFrame to the store and union it into round 0's frontier
    instead."""
    return tuple(sorted(r.url for r in seeds.collect()))
