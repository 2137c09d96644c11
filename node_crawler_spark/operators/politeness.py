"""Per-domain politeness scheduling — J6/A4 (north_star extension).

The reference throttles globally via its 4-worker async queue
(crawler.js:23-26); it has no per-domain fairness. The north_star adds
per-domain budgets AND crawl-delay: each round fetches at most
``budget(domain)`` urls per domain (FIFO by seq — the reference's
dispatch order), further capped by the domain's crawl delay modeled
against the nominal round time ``cfg.round_time_ms`` (T):

  delay D ≤ T  →  at most floor(T/D) urls this round;
  delay D > T  →  1 url every ceil(D/T) rounds (due when
                  round_idx %% ceil(D/T) == 0 — stateless in the
                  round number, so a resumed crawl keeps the phase).

The rest stays in the frontier for later rounds.

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

Domains with neither budget nor delay skip both windows entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig

_UNLIMITED = (1 << 31) - 1


def domain_of(col):
    """Politeness/salting key: lowercased host:port of the url."""
    from node_crawler_spark.functions.urlkit import hostport_col

    return hostport_col(col)


def apply_domain_budget(
    frontier: DataFrame,
    cfg: CrawlConfig,
    salt_shards: int = 32,
    round_idx: int = 0,
    ranks: DataFrame | None = None,
    backoff: DataFrame | None = None,
):
    """Split the frontier into (scheduled, deferred) under per-domain
    budgets + crawl-delay caps. No politeness config ⇒ everything
    schedules (no window at all — the common path stays shuffle-free).

    ``ranks`` (url, rank) backs ``cfg.priority == "rank"``: within a
    domain's budget, higher-ranked urls schedule first (rank-weighted
    re-crawl — feed a previous crawl's PageRank from
    operators/linkgraph.py). Unranked urls order after ranked ones by
    seq. Like "dfs", priority only matters under a budget — without
    one the whole frontier fetches this round anyway.

    ``backoff`` (one ``_domain`` column — the domains that errored
    last round, cfg.error_backoff): each listed BUDGETED domain runs
    this round at max(1, budget div 2); unlimited domains are
    unaffected. The set is tiny by nature (erroring domains), so it
    broadcasts."""
    if not cfg.politeness and cfg.default_domain_budget <= 0:
        return frontier, frontier.limit(0)

    spark = frontier.sparkSession
    T = max(cfg.round_time_ms, 1)
    f = frontier.withColumn("_domain", domain_of(F.col("url")))
    if cfg.politeness:
        rules = spark.createDataFrame(
            cfg.politeness_rows(), "_domain string, _budget int, _delay int"
        )
        f = f.join(F.broadcast(rules), on="_domain", how="left")
        default = cfg.default_domain_budget if cfg.default_domain_budget > 0 else None
        f = f.withColumn(
            "_budget",
            F.coalesce(
                F.when(F.col("_budget") > 0, F.col("_budget")),
                F.lit(default).cast("int"),
            ),
        )
    else:
        f = f.withColumn("_budget", F.lit(cfg.default_domain_budget)).withColumn(
            "_delay", F.lit(None).cast("int")
        )

    if backoff is not None:
        f = f.join(
            F.broadcast(
                backoff.select("_domain").distinct().withColumn(
                    "_bo", F.lit(1)
                )
            ),
            "_domain",
            "left",
        ).withColumn(
            "_budget",
            F.when(
                (F.col("_bo") == 1) & F.col("_budget").isNotNull(),
                F.greatest(F.lit(1), F.expr("_budget div 2")).cast("int"),
            ).otherwise(F.col("_budget")),
        ).drop("_bo")

    # crawl-delay cap for this round (null = no delay configured)
    delay_cap = (
        F.when(F.col("_delay").isNull() | (F.col("_delay") <= 0), F.lit(None))
        .when(F.col("_delay") <= T, (F.lit(T) / F.col("_delay")).cast("int"))
        .otherwise(
            F.when(
                F.lit(round_idx) % F.ceil(F.col("_delay") / F.lit(T)).cast("int") == 0,
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("int")
    )
    f = f.withColumn("_cap", delay_cap).withColumn(
        "_eb",
        F.least(
            F.coalesce(F.col("_budget"), F.lit(_UNLIMITED)),
            F.coalesce(F.col("_cap"), F.lit(_UNLIMITED)),
        ),
    )

    unbudgeted = f.where(F.col("_budget").isNull() & F.col("_cap").isNull())
    blocked = f.where(F.col("_eb") == 0)  # delay gate shut this round
    budgeted = f.where(
        (F.col("_budget").isNotNull() | F.col("_cap").isNotNull())
        & (F.col("_eb") > 0)
    )

    # O4 pluggable priority: "fifo" = reference queue order (seq);
    # "dfs" = depth-first-within-domain (deeper first, seq tiebreak);
    # "rank" = rank-weighted (previous crawl's PageRank, seq tiebreak)
    if cfg.priority == "rank" and ranks is not None:
        budgeted = budgeted.join(
            ranks.select(
                F.col("url"), F.col("rank").alias("_prank")
            ),
            "url",
            "left",
        )
        order = [F.col("_prank").desc_nulls_last(), F.col("seq")]
    elif cfg.priority == "dfs":
        order = [F.col("depth").desc_nulls_last(), F.col("seq")]
    else:
        order = [F.col("seq")]

    # phase 1 — salted pre-rank (skew-proof)
    b = budgeted.withColumn("_salt", F.pmod(F.col("seq"), F.lit(salt_shards)))
    w1 = Window.partitionBy("_domain", "_salt").orderBy(*order)
    b = b.withColumn("_r1", F.row_number().over(w1))
    survivors = b.where(F.col("_r1") <= F.col("_eb"))
    overflow1 = b.where(F.col("_r1") > F.col("_eb"))

    # phase 2 — exact priority rank over the bounded survivor set
    w2 = Window.partitionBy("_domain").orderBy(*order)
    s = survivors.withColumn("_r2", F.row_number().over(w2))
    scheduled = s.where(F.col("_r2") <= F.col("_eb"))
    overflow2 = s.where(F.col("_r2") > F.col("_eb"))

    aux = ["_domain", "_budget", "_delay", "_cap", "_eb", "_salt", "_r1", "_r2"]
    if cfg.priority == "rank" and ranks is not None:
        aux.append("_prank")
    out_sched = scheduled.drop(*aux).unionByName(unbudgeted.drop(*aux))
    deferred = (
        overflow1.drop(*aux)
        .unionByName(overflow2.drop(*aux))
        .unionByName(blocked.drop(*aux))
    )
    return out_sched, deferred
