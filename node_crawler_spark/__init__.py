"""node_crawler_spark — a from-scratch PySpark-native frontier-expansion
(crawl) engine with the query semantics of derrickorama/node-crawler.

The reference (/root/reference/crawler.js) is a single-process,
callback-driven JavaScript crawler. This package re-expresses its
domain-crawl loop as an iterative, checkpointed DataFrame pipeline:

    frontier_r --(canonicalize, filters, anti-join seen)--> scheduled_r
      --(politeness budget)--> fetch_r --(join pages+http_meta,
      redirect loop, retry loop)--> fetched_r --(content gate, decode,
      link extract+resolve, filters)--> candidates_{r+1}
      --(dedup, seq rank)--> frontier_{r+1}

Everything is DataFrame/Catalyst; per-row logic ships as Arrow-
vectorized pandas UDFs (no row-at-a-time Python UDFs anywhere).

See SURVEY.md for the operator-by-operator mapping to the reference
(file:line citations live in each module's docstrings).
"""

__version__ = "0.2.0"

from node_crawler_spark.config import CrawlConfig, PolitenessRule  # noqa: F401
from node_crawler_spark.crawler import Crawler  # noqa: F401
