"""The crawl driver — the reference's event loop re-expressed as a
batch-iterative fixed point over committed round snapshots.

One round = one Catalyst DAG (SURVEY.md §3.1): schedule (politeness
J6) → fetch (J1/J2/J3/O2/O3) → expand (F5/P7/P5/P4, F1-F4) → dedup +
order (D1-D4, O1) → commit (S3/S4/S5 sinks + seen delta + next
frontier). Termination = empty frontier (S6/A1, the reference's
``onDrain``). The driver is pure control plane: every arrow above is
executor-side; the only driver-side data are row *counts* (from the
commit manifests) and the global seq watermark.

Resume (north_rule): state lives only in committed snapshots, so
``run_crawl(..., resume=True)`` after a kill re-reads the last manifest
and replays from there bit-identically — tested in
tests/test_resume.py.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

_PROFILE = os.environ.get("NC_SPARK_PROFILE", "") == "1"


class _Timer:
    """Per-phase wall clock, plus (profile mode only) the number of
    Spark JOBS each phase launched — the box-state-immune cost metric
    (on the job-scheduling floor the round's job count IS its cost)."""

    def __init__(self, label: str) -> None:
        self.label = label
        self.marks: list[tuple[str, float, int]] = []
        self.t0 = time.perf_counter()
        self._tracker = None
        if _PROFILE:
            from pyspark.sql import SparkSession as _S

            s = _S.getActiveSession()
            if s is not None:
                self._tracker = s.sparkContext.statusTracker()
        self._j0 = self._jobs()

    def _jobs(self) -> int:
        """High-water COUNT of job ids allocated so far (ids are a
        0-based contiguous SparkContext counter, so count = max+1);
        ``max(ids)`` alone would report the first phase of a fresh
        session as 0 jobs after it ran job id 0."""
        if self._tracker is None:
            return 0
        ids = self._tracker.getJobIdsForGroup()
        return (max(ids) + 1) if ids else 0

    def mark(self, name: str) -> None:
        t = time.perf_counter()
        j = self._jobs()
        self.marks.append((name, t - self.t0, j - self._j0))
        self.t0 = t
        self._j0 = j

    def report(self) -> None:
        if _PROFILE:
            total = sum(d for _, d, _j in self.marks)
            jobs = sum(j for _, _d, j in self.marks)
            parts = " ".join(
                f"{n}={d:.1f}s/{j}j" for n, d, j in self.marks
            )
            print(
                f"[profile] {self.label}: total={total:.1f}s jobs={jobs} {parts}",
                flush=True,
            )

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.functions.urlkit import canonicalize_url
from node_crawler_spark.operators.expand import (
    attach_bodies_and_links,
    landing_candidates,
    link_candidates,
    queued_candidates,
    resolve_round_inserts,
)
from node_crawler_spark.operators.fetch import prepare_http_meta, run_fetch
from node_crawler_spark.operators.politeness import apply_domain_budget
from node_crawler_spark.operators.seenset import BloomSeenSet
from node_crawler_spark.sources.store import SnapshotStore

FRONTIER_SCHEMA = (
    "url string, seq long, referrer string, is_external boolean, "
    "crawl_links boolean, depth int"
)


@dataclass
class CrawlResult:
    store: SnapshotStore
    rounds: int
    max_seq: int

    def crawled(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_union(spark, "crawled")

    def errors(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_union(spark, "errors")

    def redirects(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_union(spark, "redirects")

    def seen(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_seen(spark)

    def report(self, spark: SparkSession) -> DataFrame:
        """Per-domain operations report over the committed sinks:
        urls seen / pages crawled / errors / redirect events, plus the
        last round the domain was fetched in — the summary a crawl
        operator reads before re-seeding. ONE shuffle: the four sinks
        are unioned as (domain, kind, round) micro-rows and hash-
        aggregated once; at any crawl size this is a count rollup over
        data already on disk."""
        from node_crawler_spark.operators.expand import _hostport

        def slice_(df: DataFrame | None, url_col: str, kind: str) -> DataFrame | None:
            if df is None:
                return None
            return df.select(
                _hostport(F.col(url_col)).alias("domain"),
                F.lit(kind).alias("kind"),
                F.col("round").cast("long").alias("round"),
            )

        parts = [
            slice_(self.seen(spark), "url", "seen"),
            slice_(self.crawled(spark), "url", "crawled"),
            slice_(self.errors(spark), "url", "error"),
            slice_(self.redirects(spark), "pre_url", "redirect"),
        ]
        parts = [p for p in parts if p is not None]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)

        def n(kind: str):
            return F.count(F.when(F.col("kind") == kind, 1)).alias(
                "n_" + kind
            )

        return (
            u.groupBy("domain")
            .agg(
                n("seen"),
                n("crawled"),
                n("error"),
                n("redirect"),
                F.max(
                    F.when(F.col("kind") != "seen", F.col("round"))
                ).alias("last_fetch_round"),
            )
            .orderBy("domain")
        )


def build_seed_frontier(spark: SparkSession, seeds, cfg: CrawlConfig) -> DataFrame:
    """queue() applied to the user's seed list in order
    (crawler.js:576-618). Seeds keep their fragments in the seen key
    (the Page-ctor strip happens at fetch time, not here — the P2
    asymmetry, crawler.js:66 vs :588)."""
    rows = []
    for i, s in enumerate(seeds):
        if isinstance(s, str):
            rows.append((s, None, False, i))
        else:
            url, referrer, is_external = (tuple(s) + (None, False))[:3]
            rows.append((url, referrer, bool(is_external), i))
    df = spark.createDataFrame(
        rows, "raw_url string, referrer string, is_external boolean, pos int"
    )
    if not cfg.crawl_external:  # F3 before anything else
        df = df.where(~F.col("is_external"))
    df = df.withColumn("url", canonicalize_url(F.col("raw_url")))
    for pat in cfg.exclude_patterns:  # F4
        df = df.where(~F.col("url").rlike("(?i)" + pat))
    if cfg.robots:  # robots extension — same gate as link candidates
        from node_crawler_spark.operators.robots import robots_gate

        df = robots_gate(df, cfg.robots, "url")
    # first occurrence wins (D1/D2), seq = insertion order (O1)
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("pos")
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumn("seq", F.row_number().over(Window.orderBy("pos")).cast("long"))
        .select(
            "url", "seq", "referrer", "is_external",
            (~F.col("is_external")).alias("crawl_links"),
            F.lit(0).alias("depth"),
        )
    )
    return df


def run_crawl(
    spark: SparkSession,
    cfg: CrawlConfig,
    pages: DataFrame,
    http_meta: DataFrame,
    seeds,
    store_root: str,
    resume: bool = False,
    initial_frontier: DataFrame | None = None,
    pages_prepared: bool = False,
    on_round=None,
    on_round_live=None,
    priority_ranks: DataFrame | None = None,
) -> CrawlResult:
    """``initial_frontier`` (url, seq, referrer, is_external,
    crawl_links) bypasses seed queueing — the steady-state shape for a
    resumed/bulk frontier (and the scaling benchmark's single big
    round). ``pages_prepared=True`` declares that ``pages`` already
    scans with HashPartitioning(url) — a bucketed table
    (sources/pagestore.bucketize_pages) or Iceberg bucket transform —
    so the driver skips its own one-time repartition+persist.

    ``on_round(r, store)`` — called after each round commits (the
    Crawler facade's incremental event delivery). It may return an
    iterable of ``(url, referrer, is_external)`` seeds queued by
    user callbacks mid-crawl (crawler.js queue() is callable any
    time, :576-618); they join the NEXT round's frontier through the
    same gate chain (external/exclude/robots/seen) with seqs minted
    above the current watermark — i.e. after every url queued by the
    rounds that already ran, exactly where the reference would slot
    them when the enqueueing callback belongs to the last-completed
    page of its round (COVERAGE.md documents the general-case
    ordering deviation).

    ``on_round_live(r, tables)`` — called MID-round, after the round's
    sink tables (crawled/errors/redirects DataFrames, passed in the
    dict) are resolved but BEFORE the round commits. This is the exact
    reference-order path for mid-crawl queue(): it may return a list of
    ``(anchor_seq, event_idx_or_None, url, referrer, is_external)``
    tuples — urls queued from a page's callback, anchored at that
    page's seq. They re-enter THIS round's insert resolution at the
    reference's sequential insertion point: a terminal-callback
    queue() after the enqueueing page's own links (band BAND_QUEUED;
    crawler.js:157 fires the callback after the page's links queued;
    queue() pushes immediately, :576-618), an onRedirect-callback
    queue() right after that hop's landing insert and BEFORE the
    page's links (band 2*event_idx+1; :484-492). When it
    returns queued urls the round's insert stream is re-resolved with
    them included — ordering, first-wins dedup, seen probe and the
    redirect-drop walk all see the queued rows at their exact
    sequential position."""
    store = SnapshotStore(store_root)
    http_by_url = prepare_http_meta(http_meta).persist()
    # page-body side prepared ONCE per crawl (repartition+sort+persist
    # on the join key — sources/pagestore.py): every round's expand
    # join then exchanges/sorts only the round-sized fetched side.
    # A caller whose `pages` is already a bucketed/Iceberg-bucket scan
    # passes pages_prepared=True and the projection joins in place
    # straight off storage.
    from node_crawler_spark.sources.pagestore import (
        _project_body,
        prepare_body_side,
    )

    if pages_prepared:
        body_side = _project_body(pages)
    else:
        body_side = prepare_body_side(
            pages, spark.sparkContext.defaultParallelism
        )

    cookie_schema = (
        "domain string, setter_seq long"
        if cfg.sequential_cookies
        else "domain string"
    )
    # one probe per crawl: if no scripted response ever sets a cookie,
    # every jar stays empty — skip the per-round cookie fold entirely
    cookies_possible = (
        cfg.use_cookies
        and "set_cookie" in http_meta.columns
        and not http_meta.where(F.col("set_cookie").isNotNull()).isEmpty()
    )
    last = store.last_committed_round() if resume else None
    if last is not None:
        manifest = store.read_manifest(last)
        max_seq = int(manifest["max_seq"])
        frontier = store.read_table(spark, last, "next_frontier")
        n_frontier = manifest.get("tables", {}).get("next_frontier", {}).get("rows")
        if n_frontier is None:  # pre-lineage store layout
            n_frontier = frontier.count()
        start_round = last + 1
        seen_state = store.read_seen(spark).select("url", "seq").localCheckpoint()
        cookie_state = store.read_table(spark, last, "cookies")
        if cookie_state is None:
            cookie_state = spark.createDataFrame([], cookie_schema)
        elif cfg.sequential_cookies and "setter_seq" not in cookie_state.columns:
            # resume across a mode flip: a cookie committed by an earlier
            # (non-sequential) run is crawl-globally visible, which in
            # sequential terms is a setter BEFORE every remaining page —
            # setter_seq 0 encodes exactly that
            cookie_state = cookie_state.select(
                "domain", F.lit(0).cast("long").alias("setter_seq")
            )
        elif not cfg.sequential_cookies and "setter_seq" in cookie_state.columns:
            # the reverse flip: earlier-round cookies become globally
            # visible, which is the non-sequential contract verbatim
            cookie_state = cookie_state.select("domain").distinct()
        cookie_state = cookie_state.localCheckpoint()
        n_cookie_domains = cookie_state.count()
    else:
        if initial_frontier is not None:
            frontier = initial_frontier
            if "depth" not in frontier.columns:
                frontier = frontier.withColumn("depth", F.lit(0))
        else:
            frontier = build_seed_frontier(spark, seeds, cfg)
        seen_delta = frontier.select(
            "url", "seq", F.lit(0).alias("round"), F.lit("seed").alias("kind")
        )
        # watermark = max(seq), NOT count: a supplied initial_frontier
        # may carry non-contiguous seqs and count would collide new seqs
        wm = frontier.agg(F.max("seq").alias("m")).first().m
        max_seq = int(wm) if wm is not None else 0
        m0 = store.write_round(
            0,
            {"seen_delta": seen_delta, "next_frontier": frontier},
            extra={"max_seq": max_seq, "killed": False},
            known_counts={"seen_delta": max_seq},
        )
        n_frontier = m0["tables"]["next_frontier"]["rows"]
        frontier = store.read_table(spark, 0, "next_frontier")
        start_round = 1
        seen_state = frontier.select("url", "seq").localCheckpoint()
        cookie_state = spark.createDataFrame([], cookie_schema)
        n_cookie_domains = 0

    rounds_run = start_round - 1
    prev_inserts = max_seq  # round-size hint for the O1 rank strategy
    # adaptive backoff state: domains that errored in the PREVIOUS
    # round (cfg.error_backoff). One-round binary memory, so resume
    # reconstructs it exactly from the last committed errors table.
    backoff_state = None
    if cfg.error_backoff and last is not None:
        from node_crawler_spark.operators.politeness import domain_of

        prev_err = store.read_table(spark, last, "errors")
        if prev_err is not None:
            bd = (
                prev_err.select(domain_of(F.col("url")).alias("_domain"))
                .distinct()
                .localCheckpoint()
            )
            backoff_state = bd if bd.count() > 0 else None
    # D1 bloom sidecar: seeded with the current seen set, fed each
    # round's delta; probes engage once the seen set is big enough that
    # skipping the exact-join shuffle pays for the filter pass
    bloom = None
    if cfg.use_bloom_prefilter:
        from node_crawler_spark.operators.seenset import CuckooSeenSet

        filter_cls = (
            CuckooSeenSet if cfg.seen_filter == "cuckoo" else BloomSeenSet
        )
        bloom = filter_cls.from_config(spark, cfg)
        bloom.insert(seen_state.select("url"), n_keys=max_seq)
    kill_marker = os.path.join(store_root, "KILL")
    pending_seeds: list = []
    # AQE pays at bulk-round scale (runtime coalescing, skew splits);
    # on tiny rounds (BFS warm-up, drain tail) its per-exchange stage
    # materialization multiplies the round's JOB count ~1.6× for data
    # that fits one partition anyway — and on the job-scheduling floor
    # the job count IS the round's cost. Toggle it by round size; never
    # force it on if the session was built with it off.
    aqe_session = (
        spark.conf.get("spark.sql.adaptive.enabled", "true").lower() == "true"
    )
    for r in range(start_round, cfg.max_rounds + 1):
        tm = _Timer(f"round {r}")
        if aqe_session:
            small_round = max(n_frontier, prev_inserts) < 20_000
            spark.conf.set(
                "spark.sql.adaptive.enabled", str(not small_round).lower()
            )
        if os.path.exists(kill_marker):
            # F7 kill switch (crawler.js:626-632): drop queued work,
            # leave committed state intact. Unlike the reference, the
            # checkpointed crawl CAN resume later (north_rule) once the
            # marker is removed.
            break
        extra_seeds = None  # mid-crawl queue()ed urls admitted this round
        if pending_seeds:
            from pyspark.sql import Window

            extra = build_seed_frontier(spark, pending_seeds, cfg).join(
                seen_state.select("url"), "url", "left_anti"
            )
            extra = (
                extra.withColumn(
                    "seq",
                    (F.lit(max_seq)
                     + F.row_number().over(Window.orderBy("seq"))).cast("long"),
                )
                # peers of this round's frontier: fetched-round r ⇒ depth r-1
                .withColumn("depth", F.lit(r - 1))
                .localCheckpoint()
            )
            n_extra = extra.count()
            pending_seeds = []
            if n_extra > 0:
                extra_seeds = extra
                max_seq += n_extra
                n_frontier += n_extra
                frontier = frontier.unionByName(extra)
                seen_state = seen_state.unionByName(extra.select("url", "seq"))
                if bloom is not None:
                    bloom.insert(extra.select("url"), n_keys=n_extra)
        # drain check (S6/A1) from the committed manifest's lineage count
        # — no per-round emptiness job against the frontier parquet
        if n_frontier == 0:
            break
        # seen probes run against the in-memory checkpointed state (one
        # flat scan) — NOT a re-read of every round's delta files. The
        # store stays the commit-protocol source of truth for resume.
        # (probe_from_store switches to the bucket-pruned cold path —
        # wired below once the round's candidate buckets are known.)
        seen = seen_state

        scheduled, deferred = apply_domain_budget(
            frontier, cfg, salt_shards=cfg.seen_salt_buckets, round_idx=r,
            ranks=priority_ranks, backoff=backoff_state,
        )
        # without politeness rules `scheduled` IS the (nonempty) frontier
        # — only a budget/delay config can produce an empty schedule, so
        # only then is the emptiness probe worth a job
        has_politeness = bool(cfg.politeness) or cfg.default_domain_budget > 0
        if has_politeness and scheduled.isEmpty():
            # crawl-delay can legitimately shut every domain for a
            # round (D > round_time phases) — skip ahead, the gate
            # reopens within ceil(D/T) rounds. Without delay rules an
            # empty schedule is budget starvation: stop.
            if any(p.crawl_delay_ms > 0 for p in cfg.politeness):
                rounds_run = r
                continue
            break
        tm.mark("schedule")

        round_persists: list = []

        def _fetch_expand(jar_df):
            fetched = run_fetch(
                scheduled, http_by_url, cfg, persisted=round_persists,
                # crawl-global jar: domains whose cookies earlier
                # rounds committed (round-barrier visibility by
                # default; per-seq with setter_seq in sequential-
                # cookies mode; None skips the join)
                cookie_jar=jar_df,
            )
            tm.mark("fetch")
            ex = attach_bodies_and_links(
                fetched, pages, body_side=body_side
            ).persist()
            # eager materialization: every downstream consumer (links,
            # landings, sinks, frontier) reads this cache; leaving it
            # lazy lets the first consumer's job interleave cache
            # population with its own shuffle and measurably
            # destabilizes the round (~2×). The same job also answers
            # whether the round produced ANY redirect event, saving
            # resolve_round_inserts its landings.isEmpty probe job.
            n_ev = ex.agg(
                F.sum((F.size("events") > 0).cast("int")).alias("n")
            ).first()[0] or 0
            tm.mark("expand")
            return ex, n_ev == 0

        expanded, no_landings = _fetch_expand(
            cookie_state if n_cookie_domains > 0 else None
        )

        if cookies_possible and cfg.sequential_cookies:
            # within-round sequential visibility (workers=1 parity):
            # merge this round's setters (min seq per domain) into the
            # jar and re-fetch until no domain's earliest setter
            # improves — each pass can only ADD cookies / move a
            # setter earlier, so the fixpoint is monotone and bounded
            # by the round's cookie-setting chains (practically ≤2).
            def _merge_setters(exp, state):
                setters = exp.select(
                    "seq", F.explode("jar").alias("domain")
                ).groupBy("domain").agg(F.min("seq").alias("setter_seq"))
                return (
                    state.unionByName(setters)
                    .groupBy("domain")
                    .agg(F.min("setter_seq").alias("setter_seq"))
                    .localCheckpoint()
                )

            converged = False
            for _pass in range(8):
                merged = _merge_setters(expanded, cookie_state)
                if merged.exceptAll(cookie_state).isEmpty():
                    converged = True
                    break
                cookie_state = merged
                n_cookie_domains = cookie_state.count()
                expanded.unpersist()
                expanded, no_landings = _fetch_expand(cookie_state)
            if not converged:
                # pass bound exhausted (a >8-deep same-round unlock
                # chain): fold the FINAL fetch's setters so the
                # committed jar is still complete for next round, and
                # say so — silent truncation here would 403 next-round
                # pages invisibly.
                merged = _merge_setters(expanded, cookie_state)
                if not merged.exceptAll(cookie_state).isEmpty():
                    print(
                        "[node_crawler_spark] WARN: sequential-cookies "
                        "fixpoint hit the 8-pass bound without "
                        "converging this round; committing the folded "
                        "jar (this round's fetches may predate it)",
                        flush=True,
                    )
                    cookie_state = merged
                    n_cookie_domains = cookie_state.count()

        links = link_candidates(expanded, cfg)
        landings = landing_candidates(expanded)
        if cfg.probe_from_store:
            # cold-probe path: the exact join reads only the candidate
            # urls' hash buckets from the bucket-partitioned store
            # (partition filters prune everything else). The collect is
            # ≤ seen_buckets ints.
            bks = {
                row.b
                for row in links.select(
                    SnapshotStore.bucket_of(F.col("ins_url"), store.seen_buckets).alias("b")
                )
                .unionByName(
                    landings.select(
                        SnapshotStore.bucket_of(F.col("ins_url"), store.seen_buckets).alias("b")
                    )
                )
                .distinct()
                .collect()
            }
            pruned = store.read_seen_pruned(spark, sorted(bks))
            if pruned is not None:
                seen = pruned.select("url", "seq")
                if extra_seeds is not None:
                    # this round's mid-crawl seeds aren't in the store
                    # yet — without this union a link to one of them
                    # would re-insert the url under a second seq
                    seen = seen.unionByName(extra_seeds.select("url", "seq"))
        _bloom_arg = (
            bloom
            if bloom is not None
            and bloom.n_keys
            >= max(cfg.bloom_min_keys, cfg.bloom_engage_ratio * prev_inserts)
            else None
        )

        def _resolve(candidates):
            # O1 two-phase rank once rounds get big (hint: last round's
            # insert volume); small rounds take the 1-job window path
            ins, drp, nd, pairs = resolve_round_inserts(
                landings, candidates, seen, max_seq,
                large_round=prev_inserts > 50_000,
                bloom=_bloom_arg,
                residue_cap=cfg.redirect_residue_cap,
                landings_empty=no_landings,
            )
            # drops participate in sinks only when nonempty (n_drops is
            # driver-known on both common paths); the DataFrame is only
            # materialized on the rare executor-walk path — small local
            # pair lists become literal predicates in _build_sinks,
            # skipping three broadcast jobs per drop-bearing round
            use_df = nd and (pairs is None or nd > 5000)
            return ins.persist(), (drp.persist() if use_df else drp), nd, pairs

        inserts, drops, n_drops, drop_pairs = _resolve(links)
        n_inserts = inserts.count()
        tm.mark("inserts")

        def _build_sinks(drops, n_drops, drop_pairs):
            literal = (
                n_drops > 0 and drop_pairs is not None and n_drops <= 5000
            )
            if n_drops == 0:
                not_dropped = lambda df: df
            elif literal:
                # driver-local pairs → pure codegen predicates: no
                # broadcast exchange jobs for the three sink filters
                drop_seqs = sorted({p for p, _ in drop_pairs})
                not_dropped = lambda df: df.where(
                    ~F.col("seq").isin(drop_seqs)
                )
            else:
                not_dropped = lambda df: df.join(
                    F.broadcast(
                        drops.select(F.col("parent_seq").alias("seq"))
                    ),
                    on="seq",
                    how="left_anti",
                )
            crawled = not_dropped(expanded.where(F.col("ok"))).select(
                F.lit(r).alias("round"), "seq",
                F.col("page_url").alias("url"),
                F.col("url").alias("queued_url"),
                "referrer", "is_external", "type", "text", "links",
                "redirects", "attempt",
            )
            errors = not_dropped(expanded.where(~F.col("ok"))).select(
                F.lit(r).alias("round"), "seq",
                F.col("page_url").alias("url"),
                F.col("url").alias("queued_url"),
                "referrer", "is_external", "type", "error_code",
                F.col("status_code"), "attempt",
            )
            ev_rows = expanded.where(F.size("events") > 0).select(
                "seq", F.explode("events").alias("ev")
            )
            if literal:
                # map(seq -> drop_idx) as ONE parsed SQL literal (a
                # py4j Column tree would cost a round trip per entry)
                dmap = F.expr(
                    "map(" + ",".join(
                        f"{int(s)}L,{int(d)}" for s, d in drop_pairs
                    ) + ")"
                )
                di = dmap[F.col("seq")]
                ev_rows = ev_rows.where(
                    di.isNull() | (F.col("ev.event_idx") <= di)
                )
            elif n_drops > 0:
                ev_rows = (
                    ev_rows.join(
                        F.broadcast(drops),
                        F.col("seq") == F.col("parent_seq"),
                        "left",
                    ).where(
                        F.col("drop_idx").isNull()
                        | (F.col("ev.event_idx") <= F.col("drop_idx"))
                    )
                )
            redirect_sink = ev_rows.select(
                F.lit(r).alias("round"), "seq",
                F.col("ev.event_idx").alias("event_idx"),
                F.col("ev.pre_url").alias("pre_url"),
                F.col("ev.final_raw").alias("final_url"),
                F.col("ev.clean_final").alias("clean_final"),
                F.col("ev.status_code").alias("status_code"),
                F.col("ev.redirects_before").alias("redirects_before"),
            )
            return crawled, errors, redirect_sink

        crawled, errors, redirect_sink = _build_sinks(drops, n_drops, drop_pairs)

        if on_round_live is not None:
            # mid-round delivery: callbacks fire now (pre-commit) and
            # may queue() urls anchored at the page being delivered
            anchored = on_round_live(
                r, {"crawled": crawled, "errors": errors,
                    "redirects": redirect_sink},
            ) or []
            if anchored:
                qc = queued_candidates(spark, anchored, scheduled, cfg)
                # pass 2: the queued rows join the round's insert stream
                # at their anchor bands (terminal → after the page's
                # links, onRedirect → after that hop's landing) —
                # re-resolve the
                # whole stream so ordering/dedup/drops are exact. Pages
                # whose callbacks already fired were, by construction,
                # not dropped in pass 1, so the REBUILT SINKS are
                # reference-exact (the walk drops any page whose later
                # landing collides with a queued url — including the
                # queueing page ITSELF, when a RETRY attempt's chain
                # lands on a url its earlier attempt's onRedirect
                # callback queued; crawler.js:497-500 fires onRedirect
                # once per attempt, AFTER that attempt's landing
                # seen-insert). The live event stream, however, already
                # delivered pass-1 events: when a queued url equals a
                # LATER landing — a later page's, or a later attempt's
                # of the queueing page itself — the dropped page's
                # terminal event has already fired. Documented
                # deviation (COVERAGE.md): sinks exact, stream
                # over-delivers in exactly this pathological case.
                inserts.unpersist()
                if n_drops and (drop_pairs is None or n_drops > 5000):
                    drops.unpersist()
                inserts, drops, n_drops, drop_pairs = _resolve(
                    links.unionByName(qc)
                )
                n_inserts = inserts.count()
                crawled, errors, redirect_sink = _build_sinks(
                    drops, n_drops, drop_pairs
                )
                tm.mark("queued-reresolve")

        # crawl-global cookie jar: fold every domain any chain cookied
        # this round into the committed jar (visible from round r+1).
        # Sequential mode already folded setters inside its fixpoint.
        if cookies_possible and not cfg.sequential_cookies:
            cookie_state = (
                cookie_state.unionByName(
                    expanded.select(F.explode("jar").alias("domain"))
                )
                .distinct()
                .localCheckpoint()
            )
            n_cookie_domains = cookie_state.count()

        # kind 1 = links, kind 2 = mid-round queue()ed urls — both are
        # fetchable pages; kind 0 landings are seen-only inserts
        new_frontier = inserts.where(F.col("kind") >= 1).select(
            F.col("ins_url").alias("url"),
            F.col("_new_seq").alias("seq"),
            "referrer", "is_external", "crawl_links", "depth",
        )
        seen_delta = inserts.select(
            F.col("ins_url").alias("url"),
            F.col("_new_seq").alias("seq"),
            F.lit(r).alias("round"),
            F.when(F.col("kind") == 0, F.lit("landing"))
            .when(F.col("kind") == 2, F.lit("queued"))
            .otherwise(F.lit("link")).alias("kind"),
        )
        n_delta = n_inserts
        if extra_seeds is not None:
            # mid-crawl queue()ed urls commit with the round they were
            # first fetched in — resume replays them like any insert
            seen_delta = seen_delta.unionByName(
                extra_seeds.select(
                    "url", "seq", F.lit(r).alias("round"),
                    F.lit("seed").alias("kind"),
                )
            )
            n_delta += extra_seeds.count()
        next_frontier = new_frontier.unionByName(deferred)

        # the manifest is the atomic commit point: max_seq is final at
        # publish time (n_inserts was materialized above), so a kill at
        # any instant leaves either no round r or a consistent one — no
        # placeholder-then-patch window (ADVICE r1)
        max_seq += n_inserts
        # small rounds (BFS warm-up, drain tail): writing each sink with
        # the session's full parallelism costs ~P tasks + P-file commit
        # protocol per table for a handful of rows — coalesce to a few
        # partitions. Bound by round size, never applied to bulk rounds.
        small = max(n_frontier, n_inserts) < 20_000
        shrink = (lambda df: df.coalesce(4)) if small else (lambda df: df)
        round_tables = {
            "crawled": shrink(crawled),
            "errors": shrink(errors),
            "redirects": shrink(redirect_sink),
            "seen_delta": seen_delta,
            "next_frontier": shrink(next_frontier),
        }
        if cookies_possible:  # resume reads it; absent table = empty jar
            round_tables["cookies"] = cookie_state
        manifest = store.write_round(
            r,
            round_tables,
            extra={"max_seq": max_seq, "killed": False},
            known_counts={"seen_delta": n_delta},
        )
        n_frontier = manifest["tables"]["next_frontier"]["rows"]
        tm.mark("commit")
        prev_inserts = n_inserts
        if cfg.error_backoff:
            from node_crawler_spark.operators.politeness import domain_of

            bd = (
                errors.select(domain_of(F.col("url")).alias("_domain"))
                .distinct()
                .localCheckpoint()
            )
            backoff_state = bd if bd.count() > 0 else None
        # extras entered seen_state (and the bloom) at injection time —
        # only the round's own inserts feed the in-memory state here
        delta_ckpt = inserts.select(
            F.col("ins_url").alias("url"), F.col("_new_seq").alias("seq")
        ).localCheckpoint()
        seen_state = seen_state.unionByName(delta_ckpt)
        if r % 10 == 0:  # bound the union width on long crawls
            seen_state = seen_state.coalesce(
                spark.sparkContext.defaultParallelism
            ).localCheckpoint()
        if bloom is not None and n_inserts > 0:
            bloom.insert(delta_ckpt.select("url"), n_keys=n_inserts)
            bloom.rebuild_if_overloaded(seen_state.select("url"))
        if cfg.compact_every > 0 and r % cfg.compact_every == 0:
            # fold the delta log into the bucketed base and restart the
            # in-memory lineage from the flat compacted scan
            store.compact_seen(spark, r)
            seen_state = (
                store.read_seen(spark)
                .select("url", "seq")
                .repartition(spark.sparkContext.defaultParallelism)
                .localCheckpoint()
            )

        expanded.unpersist()
        inserts.unpersist()
        if n_drops and (drop_pairs is None or n_drops > 5000):
            drops.unpersist()
        for df in round_persists:
            df.unpersist()
        frontier = store.read_table(spark, r, "next_frontier")
        rounds_run = r
        if on_round is not None:
            # incremental delivery; user callbacks may queue() new urls
            pending_seeds.extend(on_round(r, store) or [])
        tm.report()

    http_by_url.unpersist()
    if not pages_prepared:
        body_side.unpersist()
    if aqe_session:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return CrawlResult(store=store, rounds=rounds_run, max_seq=max_seq)
