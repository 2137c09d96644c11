"""Frontier expansion — content gate (F5), body decode (P7), link
extraction + resolution (P5/P4), queue gates (F1-F4 + robots), the
seen-set insert stream with redirect-drop resolution (D1-D4), and the
deterministic discovery-order ranking (O1).

Reference semantics (file:line = /root/reference/crawler.js):
  * :323-336  body kept only for ``text/*`` content-type, non-media
    url, internal page; everything else fetches headers only (``''``).
  * :93-107 + :132-155  links of a 200 page (document order, dupes
    kept) resolved against the *final* page url; non-page protocols and
    host-less links skipped; externality judged against the page's
    ctor-time ``urlData.href`` (urlData is never updated on redirect).
  * :576-618  queue(): external-gate → canonicalize → seen probe →
    exclude patterns → insert into seen → enqueue. Excluded and
    external-gated urls never enter the seen set.
  * :474-504  a redirect landing is inserted into seen when first seen;
    a landing already present drops the whole page (``return null``)
    *after* the onRedirect event fired.
  * Ordering: with workers=1 the async FIFO queue is exactly
    seq-ordered BFS; within one page the seen inserts are its redirect
    landings in hop order — each immediately followed by any urls
    queue()d from its onRedirect callback (:484-492 inserts the
    landing FIRST, then fires onRedirect) — then its links in document
    order (:157), then urls queue()d from the terminal callback. The
    global insert stream of a round therefore sorts by
    (parent_seq, band, pos) where ``band`` is a pure ORDERING column
    (landing of hop e → 2e, onRedirect-queued at hop e → 2e+1, links →
    BAND_LINKS, terminal-queued → BAND_QUEUED) while ``kind`` stays
    the SEMANTIC label (0 landing / 1 link / 2 queued). New seqs
    continue the global counter (SURVEY.md §2.7 O1).

Scale posture: everything is per-round-sized (the new candidate set),
not seen-set-sized. The one global ordering window runs over the
round's *first-occurrence inserts only*; the seen probe is a left-anti
join against the (10^10-row) seen table — AQE-shuffled on url, with the
candidate side orders of magnitude smaller, plus an optional broadcast
bloom pre-filter (operators/seenset.py). Redirect-drop resolution is a
fixed-point loop over the round's *redirect events only* (a tiny
residue; bounded iterations).
"""

from __future__ import annotations

import os as _os
import time as _time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PROF = _os.environ.get("NC_SPARK_PROFILE", "") == "1"

# Ordering bands of the insert stream (docstring above): landings and
# onRedirect-queued urls interleave at 2e / 2e+1 per hop e; links and
# terminal-queued urls sort after every hop. 1<<30 keeps the bands
# int-typed with room for max_redirects hops below.
BAND_LINKS = 1 << 30
BAND_QUEUED = (1 << 30) + 1


def _pmark(label, t0):
    if _PROF:
        print(f"[profile:ins] {label}={_time.perf_counter() - t0:.1f}s", flush=True)
    return _time.perf_counter()

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.functions.html import decode_body, extract_links
from node_crawler_spark.functions.urlkit import resolve_links
from node_crawler_spark.operators.fetch import MEDIA_EXT_RE
from node_crawler_spark.operators.seenset import BloomSeenSet, mark_seen


def _proto(c):
    return F.lower(F.regexp_extract(c, r"^([a-zA-Z0-9.+-]+:)", 1))


def _hostport(c):
    from node_crawler_spark.functions.urlkit import hostport_col

    return hostport_col(c)


def attach_bodies(
    fetched: DataFrame, pages: DataFrame, body_side: DataFrame | None = None
) -> DataFrame:
    """F5 + P7: join the page store for rows passing the content gate,
    pick the latest warc_ts snapshot per page, decode (gunzip + UTF-8).

    The pages join is keyed on the final page_url; the latest-snapshot
    window runs on the *joined* (round-sized) result so the 100 TB page
    table itself is never windowed — Catalyst prunes the scan to
    (url, warc_ts, html) and pushes the join keys down.

    ``body_side``: a pre-prepared (p_url, p_ts, p_html) side — bucketed
    table scan or key-partitioned persisted projection
    (sources/pagestore.py). When given, the SMJ exchanges/sorts only
    the round-sized fetched side; the page side joins in place.
    """
    gate = (
        F.col("ok")
        & F.col("content_type_raw").isNotNull()
        & F.col("content_type_raw").contains("text/")
        & ~F.col("params_url").rlike(MEDIA_EXT_RE)
        # params.isExternal of the final attempt (crawler.js:332-335) —
        # a redirect that flipped is_external mid-attempt does NOT stop
        # the body download of that attempt
        & ~F.col("params_external")
    )
    gated = fetched.withColumn("_wants_body", gate)

    if body_side is None:
        from node_crawler_spark.sources.pagestore import _project_body

        body_side = _project_body(pages)
    with_body = (
        gated.where(F.col("_wants_body"))
        .join(body_side, F.col("page_url") == F.col("p_url"), "left")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("seq").orderBy(F.col("p_ts").desc_nulls_last())
            ),
        )
        .where(F.col("_rn") == 1)
        .withColumn("text", decode_body(F.col("p_html"), F.col("gzipped")))
        .drop("p_url", "p_ts", "p_html", "_rn")
    )
    without_body = gated.where(~F.col("_wants_body")).withColumn("text", F.lit(""))
    return with_body.unionByName(without_body).drop("_wants_body")


def attach_bodies_and_links(
    fetched: DataFrame, pages: DataFrame, body_side: DataFrame | None = None
) -> DataFrame:
    """Fused F5+P7+P5+P4: the content-gated pages join followed by ONE
    Arrow pass producing (text, links). Equivalent to
    extract_and_resolve(attach_bodies(...)) but with a single
    JVM↔Python round-trip for the body bytes — the hot path at scale.

    ``body_side`` as in attach_bodies: when the page store side is
    bucketed / key-partition-persisted, each round's join leaves it
    unexchanged and unsorted."""
    from node_crawler_spark.functions.html import decode_extract_resolve

    gate = (
        F.col("ok")
        & F.col("content_type_raw").isNotNull()
        & F.col("content_type_raw").contains("text/")
        & ~F.col("params_url").rlike(MEDIA_EXT_RE)
        & ~F.col("params_external")
    )
    gated = fetched.withColumn("_wants_body", gate)
    if body_side is None:
        from node_crawler_spark.sources.pagestore import _project_body

        body_side = _project_body(pages)
    with_body = (
        gated.where(F.col("_wants_body"))
        .join(body_side, F.col("page_url") == F.col("p_url"), "left")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("seq").orderBy(F.col("p_ts").desc_nulls_last())
            ),
        )
        .where(F.col("_rn") == 1)
        .withColumn(
            "_tl",
            decode_extract_resolve(
                F.col("p_html"), F.col("gzipped"), F.col("page_url")
            ),
        )
        .withColumn("text", F.col("_tl.text"))
        .withColumn("links", F.col("_tl.links"))
        .drop("p_url", "p_ts", "p_html", "_rn", "_tl")
    )
    without_body = (
        gated.where(~F.col("_wants_body"))
        .withColumn("text", F.lit(""))
        .withColumn("links", F.array().cast("array<string>"))
    )
    return with_body.unionByName(without_body).drop("_wants_body")


def extract_and_resolve(with_text: DataFrame) -> DataFrame:
    """P5 + P4: anchor hrefs in document order, resolved against the
    final page url (Page.setHTML + addLink). Adds ``links`` (the sink
    column) in one Arrow pass — no explode/re-aggregate shuffle."""
    return with_text.withColumn(
        "links",
        F.when(
            F.col("ok") & (F.col("text") != ""),
            resolve_links(F.col("page_url"), extract_links(F.col("text"))),
        ).otherwise(F.array().cast("array<string>")),
    )


def link_candidates(expanded: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Per-link queue() candidates after F1/F2/F3/F4 + robots gates.
    Dedup (D1-D4) and ordering happen in resolve_round_inserts."""
    exploded = (
        expanded.where(F.col("ok") & F.col("crawl_links") & (F.size("links") > 0))
        .select(
            F.col("seq").alias("parent_seq"),
            F.col("url").alias("parent_ctor_url"),
            F.col("page_url").alias("parent_page_url"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("links").alias("pos", "resolved"),
        )
    )
    # F1 — non-page links (crawler.js:139-146): protocol or empty host
    proto = _proto(F.col("resolved"))
    host = _hostport(F.col("resolved"))
    c = exploded.where(
        ~proto.isin("mailto:", "javascript:", "tel:") & (host != "")
    )
    # F2 — externality vs the parent's ctor-time href (crawler.js:149)
    c = c.withColumn(
        "is_external",
        (_proto(F.col("parent_ctor_url")) != proto)
        | (_hostport(F.col("parent_ctor_url")) != host),
    )
    # F3 — external-crawl gate (crawler.js:584-586): gated links never
    # reach the seen insert
    if not cfg.crawl_external:
        c = c.where(~F.col("is_external"))
    # Page ctor fragment strip (crawler.js:66); resolved is already
    # canonical (node_resolve normalizes), so strip stays canonical
    c = c.withColumn("ins_url", F.regexp_replace("resolved", "#.*", ""))
    # F4 — exclude patterns, case-insensitive RegExp(p,'gi') (crawler.js:595-604)
    for pat in cfg.exclude_patterns:
        c = c.where(~F.col("ins_url").rlike("(?i)" + pat))
    # robots extension (north_star; absent in reference): RFC 9309
    # allow/disallow rules behave as an extra exclude gate
    if cfg.robots:
        from node_crawler_spark.operators.robots import robots_gate

        c = robots_gate(c, cfg.robots, "ins_url")
    return c.select(
        "parent_seq",
        F.lit(1).alias("kind"),
        F.lit(BAND_LINKS).alias("band"),
        F.col("pos"),
        "ins_url",
        F.col("parent_page_url").alias("referrer"),
        "is_external",
        (~F.col("is_external")).alias("crawl_links"),
        "depth",
    )


def queued_candidates(spark, items, frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Mid-crawl ``queue()`` calls anchored at the enqueueing page
    (crawler.js:576-618 invoked from inside a callback): candidates at
    the reference's exact sequential insertion point. A queue() from
    the TERMINAL pageCrawl/error callback slots AFTER the page's own
    links (crawler.js:157 queues links before the terminal callback
    fires) — band BAND_QUEUED; a queue() from an onRedirect callback
    slots right after that hop's landing insert and BEFORE the page's
    links (:484-492 inserts the landing, then fires onRedirect, then
    link extraction happens much later at :157) — band 2*event_idx+1.
    Both are BEFORE every later page's inserts. Gate chain identical
    to queue(): external gate → canonicalize (urlData.href, fragment
    KEPT in the seen key — the P2 asymmetry, same as seeds) → exclude
    patterns ('gi') → robots extension; the seen probe + first-wins
    happen in resolve_round_inserts with the rest of the round's
    stream.

    ``items``: [(anchor_seq, event_idx_or_None, url, referrer,
    is_external), ...] in call order — event_idx is the redirect
    event's index when the call came from an onRedirect callback, None
    from a terminal callback. ``frontier``: the round's scheduled
    frontier — joined (broadcast, tiny side) to give each queued url
    depth = anchor page's depth + 1, like a link of that page."""
    from node_crawler_spark.functions.urlkit import canonicalize_url

    rows = [
        (int(a), BAND_QUEUED if e is None else 2 * int(e) + 1,
         i, u, ref, bool(ext))
        for i, (a, e, u, ref, ext) in enumerate(items)
    ]
    c = spark.createDataFrame(
        rows,
        "parent_seq long, band int, pos int, raw string, referrer string, "
        "is_external boolean",
    )
    if not cfg.crawl_external:  # F3 (crawler.js:584-586)
        c = c.where(~F.col("is_external"))
    c = c.withColumn("ins_url", canonicalize_url(F.col("raw")))
    for pat in cfg.exclude_patterns:  # F4 (crawler.js:595-604)
        c = c.where(~F.col("ins_url").rlike("(?i)" + pat))
    if cfg.robots:
        from node_crawler_spark.operators.robots import robots_gate

        c = robots_gate(c, cfg.robots, "ins_url")
    depth_map = frontier.select(
        F.col("seq").alias("parent_seq"), (F.col("depth") + 1).alias("depth")
    )
    return F.broadcast(c).join(depth_map, "parent_seq").select(
        "parent_seq",
        F.lit(2).alias("kind"),
        "band",
        "pos",
        "ins_url",
        "referrer",
        "is_external",
        (~F.col("is_external")).alias("crawl_links"),
        "depth",
    )


def landing_candidates(fetched: DataFrame) -> DataFrame:
    """D3 — every redirect event's clean_final is a seen-insert
    candidate at stream position (parent_seq, kind=0, event_idx)."""
    return fetched.where(F.size("events") > 0).select(
        F.col("seq").alias("parent_seq"),
        F.lit(0).alias("kind"),
        F.explode("events").alias("ev"),
    ).select(
        "parent_seq", "kind",
        (F.col("ev.event_idx") * 2).alias("band"),
        F.col("ev.event_idx").alias("pos"),
        F.col("ev.clean_final").alias("ins_url"),
        F.lit(None).cast("string").alias("referrer"),
        F.lit(None).cast("boolean").alias("is_external"),
        F.lit(None).cast("boolean").alias("crawl_links"),
        F.lit(None).cast("int").alias("depth"),
    )


def assign_global_seq(
    first_occurrence: DataFrame, max_seq: int, large_round: bool
) -> DataFrame:
    """O1 — dense global rank over the round's first-occurrence insert
    stream, ordered by (parent_seq, band, pos).

    Small rounds: one single-partition window (cheapest job count).
    Large rounds (``large_round=True``, driver decides from the
    previous round's frontier size): deterministic two-phase rank —
    bucket by parent_seq range (parent_seq is monotone with stream
    order, so range buckets align with the global order), rank within
    buckets in parallel, then add per-bucket offsets (a P-row collect).
    No single-partition shuffle at any size.
    """
    order_cols = [F.col("parent_seq"), F.col("band"), F.col("pos")]
    if not large_round:
        return first_occurrence.withColumn(
            "_new_seq", F.lit(max_seq) + F.row_number().over(Window.orderBy(*order_cols))
        )

    spark = first_occurrence.sparkSession
    P = spark.sparkContext.defaultParallelism * 4
    bounds = first_occurrence.agg(
        F.min("parent_seq").alias("lo"), F.max("parent_seq").alias("hi")
    ).first()
    if bounds.lo is None:
        return first_occurrence.withColumn("_new_seq", F.lit(None).cast("long"))
    lo, hi = int(bounds.lo), int(bounds.hi)
    span = max(hi - lo + 1, 1)
    bucket = F.least(
        F.lit(P - 1),
        ((F.col("parent_seq") - F.lit(lo)) * F.lit(P) / F.lit(span)).cast("int"),
    )
    b = first_occurrence.withColumn("_bkt", bucket)
    counts = {
        r._bkt: r["count"] for r in b.groupBy("_bkt").count().collect()
    }
    offsets, acc = {}, max_seq
    for k in range(P):
        offsets[k] = acc
        acc += counts.get(k, 0)
    omap = F.create_map(
        *[x for k in sorted(offsets) for x in (F.lit(k), F.lit(offsets[k]))]
    )
    w = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.withColumn("_new_seq", omap[F.col("_bkt")] + F.row_number().over(w))
        .drop("_bkt")
    )


def _sequential_walk(rows):
    """The reference's sequential interleaving of seen inserts and
    redirect-landing drops (crawler.js:474-504 + :576-618), over the
    contested residue only. Inherently sequential — a drop removes a
    page's later link inserts, which can un-collide a later landing;
    the relational fixed point oscillates on exactly these chains.
    Returns (keep_keys, drop_pairs)."""
    from collections import defaultdict

    by_page = defaultdict(list)
    for row in rows:
        by_page[row.parent_seq].append(row)
    added: set[str] = set()
    keep_keys: list[tuple[int, int, int]] = []
    drop_pairs: list[tuple[int, int]] = []
    for pseq in sorted(by_page):
        page_rows = sorted(by_page[pseq], key=lambda r: (r.band, r.pos))
        drop_at = None
        drop_band = None
        for row in page_rows:
            if drop_at is not None and row.band > drop_band + 1:
                # crawler.js:497-500 — page finished at the drop. Rows
                # at band drop_band+1 are the DROPPING hop's own
                # onRedirect-queued urls: its callback fired before
                # the wasAdded return (:491), so they still insert.
                break
            if row.kind == 0:  # landing insert (D3)
                if drop_at is not None:
                    break  # a later hop never fires after a drop
                if row.in_seen or row.ins_url in added:
                    drop_at = row.pos
                    drop_band = row.band
                    drop_pairs.append((pseq, row.pos))
                else:
                    added.add(row.ins_url)
                    keep_keys.append((pseq, row.band, row.pos))
            else:  # link / queued insert (D1/D2, queue() :576-618)
                if not row.in_seen and row.ins_url not in added:
                    added.add(row.ins_url)
                    keep_keys.append((pseq, row.band, row.pos))
    return keep_keys, drop_pairs


def resolve_round_inserts(
    landings: DataFrame,
    links: DataFrame,
    seen: DataFrame,
    max_seq: int,
    large_round: bool = False,
    bloom: BloomSeenSet | None = None,
    residue_cap: int = 200_000,
    landings_empty: bool | None = None,
):
    """The round's seen-insert stream: first occurrence wins, redirect
    landings that collide drop their page (crawler.js:484-500).

    Returns (inserts, drops, n_drops, drop_pairs) where inserts = the
    first-occurrence stream rows with their assigned global seq, drops
    = a (parent_seq, drop_idx) DataFrame of pages killed by a
    colliding landing, n_drops = their count, and drop_pairs = the
    same pairs as a DRIVER-LOCAL list when they are already local
    (statically [] on the no-redirect fast path; the driver residue
    walk returns them locally; None only on the rare executor-walk
    path). A driver-known empty list lets the caller skip three
    per-round broadcast jobs entirely, and a small local list lets it
    filter the sinks with literal codegen predicates instead of
    broadcast anti-joins — the job floor IS the round's fixed cost.

    Drop resolution is a fixed point because a dropped page contributes
    no link inserts, which can in turn un-collide a later landing. The
    loop runs only over the round's redirect events (tiny); each pass
    is one window + one anti-join on round-sized data.
    """
    spark = landings.sparkSession
    t0 = _time.perf_counter()
    seen_keys = seen.select(F.col("url").alias("ins_url")).distinct()
    drops = spark.createDataFrame([], "parent_seq long, drop_idx int")

    # Fast path — the overwhelmingly common round has no redirect
    # events, hence no drops: one window + one anti-join, no fixed
    # point, no stream union. The caller usually already knows the
    # answer (driver: the expand-materialization agg counts redirect
    # events) — ``landings_empty`` skips the probe job; None probes.
    empty_landings = (
        landings.isEmpty() if landings_empty is None else landings_empty
    )
    t0 = _pmark("landings.isEmpty", t0)
    if empty_landings:
        if bloom is not None:
            # the bloom probe splits into maybe/definitely-not branches
            # whose union would otherwise recompute the links lineage
            # (explode + url gates) once per branch
            links = links.localCheckpoint()
        w = Window.partitionBy("ins_url").orderBy("parent_seq", "band", "pos")
        probed = (
            mark_seen(links, seen_keys, bloom)
            .withColumn("_rank", F.row_number().over(w))
            .withColumn("_collides", F.col("_seen") | (F.col("_rank") > 1))
        )
        fo = probed.where(~F.col("_collides"))
        if large_round:
            fo = fo.localCheckpoint()  # rank pass reads it 3×
        inserts = assign_global_seq(fo, max_seq, large_round).drop(
            "_seen", "_rank", "_collides"
        )
        return inserts, drops, 0, []

    # Contested-subset fixpoint: drop resolution can only disturb urls
    # reachable from redirect-bearing pages — the landing urls, the
    # link urls of pages that have a landing (their links vanish if the
    # page drops), and every stream row sharing one of those urls. The
    # (usually ~98%) remainder of the stream gets its collision pass
    # exactly once; only the contested residue iterates.
    #
    # TWO materializations carry the whole split (was five): the raw
    # stream once (the links lineage — explode + parse_url gates over
    # the whole round — must not re-run per consumer), then ONE probed
    # + contested-flagged result that every later branch filters. On
    # the job-scheduling floor the checkpoint count is the round's
    # fixed cost, so the fusion is worth ~4 jobs per redirect round.
    # LAZY checkpoints: the first full action over this chain
    # (contested.count, which computes every partition of marked_all
    # and therefore of full_stream) materializes BOTH in one job —
    # eager here cost two extra jobs per redirect round on the job
    # floor. Lineage truncation still happens at materialization.
    full_stream = landings.unionByName(links).localCheckpoint(eager=False)
    t0 = _pmark("stream.ckpt", t0)
    landings_m = full_stream.where(F.col("kind") == 0)
    pages_with_landing = landings_m.select("parent_seq").distinct()
    core_urls = (
        landings_m.select("ins_url")
        .unionByName(
            # kind >= 1: links AND queued (kind=2) inserts of a
            # landing-bearing page vanish if the page drops
            full_stream.where(F.col("kind") >= 1)
            .join(F.broadcast(pages_with_landing), "parent_seq")
            .select("ins_url")
        )
        .distinct()
    )
    marked_all = (
        mark_seen(full_stream, seen_keys, bloom)
        .join(core_urls.withColumn("_core", F.lit(True)), "ins_url", "left")
        .withColumn("_core", F.coalesce(F.col("_core"), F.lit(False)))
    )
    t0 = _pmark("marked.plan", t0)
    # persist, NOT localCheckpoint: Dataset→RDD conversion under AQE
    # (which localCheckpoint does even with eager=False) executes every
    # shuffle query stage of the plan right at the call, stage-serially
    # — measured 9-50 s here at wide parallelism while the persist form
    # lets contested.count materialize the same stages inside ONE
    # normal action (independent stages overlap, result stage fuses).
    # Compute-once is what the consumers below need; lineage stays un-
    # truncated but is bounded (the residue fixpoint builds on the
    # CHECKPOINTED merged stream below, not on marked_all).
    marked_all = marked_all.persist()
    # One live frame at a time: the PREVIOUS contested round's frame is
    # dead once its merged stream materialized (the driver's
    # inserts.count in that round's commit path), which has certainly
    # happened by the time a later round re-enters here. Unpersisting
    # it keeps a long crawl's cache registry bounded instead of leaving
    # one dead round-sized block per contested round to LRU eviction.
    prev = getattr(resolve_round_inserts, "_live_persisted", None)
    if prev is not None:
        prev.unpersist()
    resolve_round_inserts._live_persisted = marked_all
    t0 = _pmark("marked.ckpt", t0)
    stream = marked_all.where(F.col("_core")).drop("_seen", "_core")
    w_rest = Window.partitionBy("ins_url").orderBy("parent_seq", "band", "pos")
    rest_probed = (
        marked_all.where(~F.col("_core"))
        .withColumn("_rank", F.row_number().over(w_rest))
        .withColumn("_collides", F.col("_seen") | (F.col("_rank") > 1))
    )

    # Exact sequential resolution of the contested residue. A
    # simultaneous relational fixed point does not converge here
    # (drop → links vanish → a later landing un-collides → un-drop →
    # oscillation): the reference resolves these interleavings
    # *sequentially*, and sequential-vs-simultaneous genuinely differ.
    # The contested set is bounded by the round's redirect fan (pages
    # with a redirect event + rows sharing their urls — ~2% of a real
    # crawl). Below ``residue_cap`` rows the walk runs on the driver
    # (one collect, broadcast back); an adversarial all-redirect round
    # instead runs the SAME walk in a single executor task via
    # applyInPandas — sequential either way (it must be), but never an
    # unbounded driver-memory path.
    # the walk input is a filter+projection of the checkpointed
    # marked_all — no extra materialization needed
    marked = marked_all.where(F.col("_core")).select(
        "parent_seq", "kind", "band", "pos", "ins_url",
        F.col("_seen").alias("in_seen"),
    )
    n_contested = marked.count()
    t0 = _pmark("contested.count", t0)
    if n_contested <= residue_cap:
        keep_keys, drop_pairs = _sequential_walk(marked.collect())
        t0 = _pmark("contested.walk.driver", t0)
        n_drops = len(drop_pairs)
        keep_df = spark.createDataFrame(
            keep_keys or [], "parent_seq long, band int, pos int"
        )
        drops = spark.createDataFrame(
            drop_pairs or [], "parent_seq long, drop_idx int"
        )
        contested_keep = stream.join(
            F.broadcast(keep_df), ["parent_seq", "band", "pos"], "left_semi"
        )
    else:
        import pandas as pd

        def walk_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
            keep_keys, drop_pairs = _sequential_walk(
                list(pdf.itertuples(index=False))
            )
            keep = pd.DataFrame(
                keep_keys, columns=["parent_seq", "band", "pos"]
            ).assign(keep=True, drop_idx=None)
            drp = pd.DataFrame(
                drop_pairs, columns=["parent_seq", "drop_idx"]
            ).assign(band=None, pos=None, keep=False)
            cols = ["parent_seq", "band", "pos", "keep", "drop_idx"]
            return pd.concat(
                [keep[cols], drp[cols]], ignore_index=True
            )

        walked = (
            marked.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(
                lambda _key, pdf: walk_pdf(pdf.drop(columns=["_g"])),
                "parent_seq long, band int, pos int, keep boolean, drop_idx int",
            )
            .localCheckpoint()
        )
        t0 = _pmark("contested.walk.executor", t0)
        keep_df = walked.where(F.col("keep")).select("parent_seq", "band", "pos")
        drops = walked.where(~F.col("keep")).select("parent_seq", "drop_idx")
        n_drops = drops.count()  # rare path; walked is checkpointed
        drop_pairs = None  # executor-side only — not available locally
        contested_keep = stream.join(
            keep_df, ["parent_seq", "band", "pos"], "left_semi"
        )
    rest_keep = rest_probed.where(~F.col("_collides")).drop(
        "_seen", "_core", "_rank", "_collides"
    )
    # one materialization of the merged stream — the seq assigner (and
    # every downstream consumer) re-reads it several times
    t0 = _pmark("walk", t0)
    # lazy: the driver's inserts.count() (or the seq assigner's own
    # bucket-offset action on large rounds) materializes it
    merged = contested_keep.unionByName(rest_keep).localCheckpoint(eager=False)
    t0 = _pmark("merged.ckpt", t0)
    inserts = assign_global_seq(merged, max_seq, large_round)
    t0 = _pmark("assign_seq", t0)
    return inserts, drops, n_drops, drop_pairs
