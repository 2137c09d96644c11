"""Per-domain politeness scheduling — J6/A4 (north_star extension).

The reference throttles globally via its 4-worker async queue
(crawler.js:23-26); it has no per-domain fairness. The north_star adds
per-domain budgets: each round fetches at most ``budget(domain)`` urls
per domain (FIFO by seq — the reference's dispatch order); the rest
stay in the frontier for later rounds.

Scale design — the skew point of the whole engine (a hot domain can
hold 99% of a 10^10-url frontier): a naive
``row_number().over(partitionBy(domain))`` funnels the hot domain into
one task. We take the classic two-phase top-k instead:

  phase 1: rank within (domain, salt) where salt = pmod(seq, S) —
           S-way parallel even for a single domain; keep rank ≤ budget
           (the global FIFO top-budget of a domain is necessarily
           within the top-budget of its salt shard).
  phase 2: exact rank over the survivors (≤ S·budget rows per domain —
           bounded, skew-free) and keep rank ≤ budget.

Unbudgeted domains skip both windows entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig


def domain_of(col):
    """Politeness/salting key: lowercased host:port of the url."""
    host = F.lower(F.coalesce(F.parse_url(col, F.lit("HOST")), F.lit("")))
    port = F.coalesce(F.parse_url(col, F.lit("PORT")), F.lit(""))
    return F.concat(
        host, F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    )


def apply_domain_budget(
    frontier: DataFrame, cfg: CrawlConfig, salt_shards: int = 32
):
    """Split the frontier into (scheduled, deferred) under per-domain
    budgets. No politeness config ⇒ everything schedules (no window at
    all — the common path stays shuffle-free)."""
    if not cfg.politeness and cfg.default_domain_budget <= 0:
        return frontier, frontier.limit(0)

    spark = frontier.sparkSession
    f = frontier.withColumn("_domain", domain_of(F.col("url")))
    if cfg.politeness:
        rules = spark.createDataFrame(
            cfg.politeness_rows(), "_domain string, _budget int, _delay int"
        ).drop("_delay")
        f = f.join(F.broadcast(rules), on="_domain", how="left")
        default = cfg.default_domain_budget if cfg.default_domain_budget > 0 else None
        f = f.withColumn(
            "_budget",
            F.coalesce(F.col("_budget"), F.lit(default).cast("int")),
        )
    else:
        f = f.withColumn("_budget", F.lit(cfg.default_domain_budget))

    unbudgeted = f.where(F.col("_budget").isNull())
    budgeted = f.where(F.col("_budget").isNotNull())

    # O4 pluggable priority: "fifo" = reference queue order (seq);
    # "dfs" = depth-first-within-domain (deeper first, seq tiebreak)
    if cfg.priority == "dfs":
        order = [F.col("depth").desc_nulls_last(), F.col("seq")]
    else:
        order = [F.col("seq")]

    # phase 1 — salted pre-rank (skew-proof)
    b = budgeted.withColumn("_salt", F.pmod(F.col("seq"), F.lit(salt_shards)))
    w1 = Window.partitionBy("_domain", "_salt").orderBy(*order)
    b = b.withColumn("_r1", F.row_number().over(w1))
    survivors = b.where(F.col("_r1") <= F.col("_budget"))
    overflow1 = b.where(F.col("_r1") > F.col("_budget"))

    # phase 2 — exact priority rank over the bounded survivor set
    w2 = Window.partitionBy("_domain").orderBy(*order)
    s = survivors.withColumn("_r2", F.row_number().over(w2))
    scheduled = s.where(F.col("_r2") <= F.col("_budget"))
    overflow2 = s.where(F.col("_r2") > F.col("_budget"))

    aux = ["_domain", "_budget", "_salt", "_r1", "_r2"]
    out_sched = scheduled.drop(*aux).unionByName(unbudgeted.drop(*aux))
    deferred = overflow1.drop(*aux).unionByName(overflow2.drop(*aux))
    return out_sched, deferred
