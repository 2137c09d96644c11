"""Fetch resolution — the engine's J1/J2 (frontier × page-store join),
J3 (bounded redirect chase), O2 (retry-in-place) and O3 (redirect cap).

Reference semantics being reproduced (file:line = /root/reference):
  * crawler.js:195-446  ``_request``: follow any status whose string
    starts with "30" when a ``location`` header is present
    (crawler.js:265-269); relative locations resolved against the
    *current hop* url (crawler.js:292); at most 10 hops are followed —
    the 11th raises ``MAX_REDIRECTS_REACHED`` (counter check
    ``redirects > 9`` *before* increment, crawler.js:283-291).
  * crawler.js:301-312  internal 401 + configured auth re-requests the
    same url with credentials (invisible to hop/retry counters).
  * crawler.js:521-542  ``_onResponse``: a landing url different from
    ``page.url`` swaps the page's url to ``urllib.parse(final).href``,
    appends the old url to ``page.redirects`` and may flip
    ``isExternal`` (protocol/host differ, crawler.js:111-117).
  * crawler.js:544-553  HPE_INVALID_CONSTANT forgiveness for external
    pages with a content-length header and status 200.
  * crawler.js:558-570  retry-in-place: on (error || status != 200)
    re-run ``_crawlPage`` with the same pageInfo up to ``retries``
    times; the retried request starts from the (possibly
    redirect-swapped) page.url with a fresh hop counter.
  * crawler.js:466-469  ``page.type`` updated from the final response's
    content-type (``;...`` stripped, trimmed) — sticky across attempts.

Physical design (100 TB posture): the fetch is a driver-bounded loop of
equi-joins on the *current hop url*. Iteration 1 carries the whole
scheduled frontier (sort-merge / shuffled-hash on ``url``, AQE decides;
broadcast when the round is small); every later iteration only carries
rows still in flight (redirect hops + retries — a tiny, AQE-coalesced
residue). Worst-case iterations = (retries + 1) * 11, a config-bounded
constant. No collect, no per-row Python: the only UDF in the loop is
the Arrow-vectorized relative-``Location`` resolver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.functions.urlkit import canonicalize_url, resolve_url

# crawler.js:210 — COMMON_MEDIA_EXT, anchored at end of the *requested* url
MEDIA_EXT_RE = (
    r"\.(?:3gp|aif|asf|asx|avi|flv|iff|m3u|m4a|m4p|m4v|mov|mp3|mp4|mpa|mpg|"
    r"mpeg|ogg|ra|raw|rm|swf|vob|wav|wma|wmv)$"
)

# One redirect event per _processRedirect call (crawler.js:474-504).
REDIRECT_EVENT_TYPE = T.StructType(
    [
        T.StructField("event_idx", T.IntegerType()),
        T.StructField("pre_url", T.StringType()),       # page.url before swap
        T.StructField("final_raw", T.StringType()),     # finalURL as observed
        T.StructField("clean_final", T.StringType()),   # parse(final).href
        T.StructField("status_code", T.IntegerType()),
        T.StructField("redirects_before", T.ArrayType(T.StringType())),
    ]
)

FETCHED_COLUMNS = [
    "url", "seq", "referrer", "is_external", "crawl_links", "depth",
    "page_url", "params_url", "params_external", "attempt", "type",
    "content_type_raw", "gzipped", "status_code", "error_code",
    "redirects", "events", "ok", "jar",
]


def _meta_columns(http_meta: DataFrame):
    cols = [
        F.col("status_code").alias("m_status"),
        F.col("location").alias("m_location"),
        F.col("content_type").alias("m_content_type"),
        F.col("content_encoding").alias("m_content_encoding"),
        F.col("content_length").alias("m_content_length"),
        F.col("error_code").alias("m_error_code"),
        F.col("requires_auth").alias("m_requires_auth"),
    ]
    # optional cookie columns (cookieSpec.js model; absent ⇒ null)
    for opt in ("set_cookie", "requires_cookie"):
        if opt in http_meta.columns:
            cols.append(F.col(opt).alias(f"m_{opt}"))
        else:
            typ = "string" if opt == "set_cookie" else "boolean"
            cols.append(F.lit(None).cast(typ).alias(f"m_{opt}"))
    return cols


_META_FIELDS = (
    "m_status", "m_location", "m_content_type", "m_content_encoding",
    "m_content_length", "m_error_code", "m_requires_auth",
    "m_set_cookie", "m_requires_cookie",
)


def prepare_http_meta(http_meta: DataFrame) -> DataFrame:
    """ONE row per url: a map attempt→response plus the last scripted
    attempt (reference: a retried request that runs out of scripted
    attempts observes the last response again).

    Why a map instead of the r1 (exact, last) pair of tables: the
    fetch loop used to run TWO joins per iteration — an exact
    (url, attempt) join plus a fallback join that reshuffled the whole
    last-attempt table for a tiny miss side, every iteration. The
    per-url grouping makes it one equi-join on url with the
    exact-vs-fallback choice as a map lookup in codegen, and the
    result is persisted pre-partitioned on the join key, so each
    iteration exchanges only the (shrinking) pending side."""
    meta_struct = F.struct(*_meta_columns(http_meta))
    per_attempt = (
        http_meta.select(
            F.col("url").alias("m_url"),
            F.col("attempt").alias("m_attempt"),
            meta_struct.alias("m_row"),
        )
        .groupBy("m_url", "m_attempt")
        .agg(F.first("m_row").alias("m_row"))
    )
    spark = http_meta.sparkSession
    return (
        per_attempt.groupBy("m_url")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("m_attempt"), F.col("m_row")))
            ).alias("m_map"),
            F.max_by("m_row", "m_attempt").alias("m_last"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "m_url")
    )


def _join_meta(pending: DataFrame, http_by_url: DataFrame) -> DataFrame:
    """Effective http response for each in-flight row at its current
    hop url and attempt number (exact attempt, else last scripted
    attempt, else transport error — modeled as a join miss). Single
    equi-join; the choice is a codegen map lookup."""
    j = pending.join(
        http_by_url, pending.cur_url == http_by_url.m_url, "left"
    ).drop("m_url")
    chosen = F.col("m_map")[F.col("attempt")]
    # an exact-attempt row with neither status nor error defers to the
    # last attempt — the r1 two-join semantics, preserved
    use_last = chosen.isNull() | (
        chosen["m_status"].isNull() & chosen["m_error_code"].isNull()
    )
    j = j.withColumn(
        "_eff", F.when(use_last, F.col("m_last")).otherwise(chosen)
    ).drop("m_map", "m_last")
    j = j.withColumns({f: F.col("_eff")[f] for f in _META_FIELDS})
    return j.drop("_eff")


def _is_external_pair(a, b):
    """crawler.js:111-117 — protocol OR host (host:port, www counts)
    differ. Stays JVM-side via built-in parse_url."""
    from node_crawler_spark.functions.urlkit import hostport_col

    proto = lambda c: F.lower(F.regexp_extract(c, r"^([a-zA-Z0-9.+-]+:)", 1))
    return (proto(a) != proto(b)) | (hostport_col(a) != hostport_col(b))


def run_fetch(
    scheduled: DataFrame,
    http_by_url: DataFrame,
    cfg: CrawlConfig,
    persisted: list | None = None,
    cookie_jar: DataFrame | None = None,
) -> DataFrame:
    """Resolve every scheduled fetch to its terminal outcome.

    ``scheduled`` columns: url (canonical seen key, fragment kept),
    seq, referrer, is_external, crawl_links. Returns FETCHED_COLUMNS;
    ``page_url`` is the final (post-redirect) page url, ``events`` the
    ordered redirect events for the S5 sink + D3 seen inserts.

    ``cookie_jar``: (domain) table of domains whose cookies were
    committed by earlier rounds — the crawl-global jar
    (crawler.js:31-36 keeps one jar for the whole crawl). Visibility
    has a round barrier: a cookie set in round r gates fetches from
    round r+1 on (plus the chain-local jar within a page's own
    redirect/retry chain); same-round cross-page visibility — a race
    under the reference's 4 workers too — is deliberately out. With a
    ``setter_seq`` column (cfg.sequential_cookies, one row per domain),
    the gate is per-page instead: visible iff setter_seq < the
    fetching page's seq — the workers=1 sequential reference, driven
    to a within-round fixpoint by plans/driver.py.
    """
    events_ddl = f"array<{REDIRECT_EVENT_TYPE.simpleString()}>"
    empty_events = F.expr(f"cast(array() as {events_ddl})")

    pending = scheduled.select(
        "url", "seq", "referrer", "is_external", "crawl_links", "depth",
        # Page ctor strips the fragment (crawler.js:66); urlData keeps it.
        F.regexp_replace("url", "#.*", "").alias("page_url"),
    ).withColumns(
        {
            "cur_url": F.col("page_url"),
            "params_url": F.col("page_url"),   # _request params.url, per attempt
            # params.isExternal is also frozen per attempt (crawler.js:454-460):
            # a redirect may flip page.isExternal only AFTER the content gate
            # and auth check of the attempt that discovered it ran
            "params_external": F.col("is_external"),
            "attempt": F.lit(0),
            "hops": F.lit(0),
            # last hop url that actually produced an HTTP response —
            # crawler.js's `response` var: on a transport error mid-chain,
            # finalURL is this url, not the dead hop (requestSpec model)
            "resp_url": F.lit(None).cast("string"),
            "type": F.lit(""),
            "content_type_raw": F.lit(None).cast("string"),
            "gzipped": F.lit(False),
            "redirects": F.array().cast("array<string>"),
            "events": empty_events,
            # cookie jar, modeled chain-locally: domains that set a
            # cookie during this page's redirect chain (crawler.js:31-36,
            # :272-278 — cookies are saved on 30x hops and replayed on
            # later hops via the request's cookie header)
            "jar": F.array().cast("array<string>"),
        }
    )

    done_parts: list[DataFrame] = []
    max_iters = (cfg.retries + 1) * (cfg.max_redirects + 2)

    for it in range(max_iters):
        # columnar-cache the join output (one compute serves both the
        # finished split and the residue filter); lineage stays shallow
        # because `pending` below is checkpointed every iteration, so no
        # row-RDD localCheckpoint (2× heavier write) is needed here
        j = _join_meta(pending, http_by_url).persist()
        if persisted is not None:
            persisted.append(j)

        # crawler.js:301-312 — internal 401 + auth ⇒ authorized re-request
        auth_ok = (
            F.col("m_requires_auth").eqNullSafe(True)
            & F.lit(cfg.auth)
            & ~F.col("params_external")   # crawler.js:303 params.isExternal
            & (F.col("m_status") == 401)
        )
        j = j.withColumn("eff_status", F.when(auth_ok, F.lit(200)).otherwise(F.col("m_status")))

        # cookie gate: a requires_cookie row answers 403 unless this
        # chain stored a cookie for the url's domain OR an earlier
        # round committed one (crawl-global jar, crawler.js:31-36;
        # jar:false disables both). Cookie domains are HOSTNAME-only
        # on purpose — RFC 6265 cookies ignore the port (unlike every
        # other domain key in this engine, which is host:port via
        # urlkit.hostport_col).
        cur_dom = F.lower(F.coalesce(F.parse_url("cur_url", F.lit("HOST")), F.lit("")))
        have_cookie = F.array_contains(F.col("jar"), cur_dom)
        if cookie_jar is not None:
            if "setter_seq" in cookie_jar.columns:
                # sequential-cookies mode: a committed cookie is
                # visible only to pages AFTER its setter in the global
                # processing order (strict <: a page never needs its
                # own global entry — the chain-local jar covers it).
                # The jar must be one row per domain (min setter_seq)
                # or the join would fan out the chain rows.
                j = j.join(
                    F.broadcast(
                        cookie_jar.select(
                            F.col("domain").alias("_g_dom"),
                            F.col("setter_seq").alias("_g_seq"),
                        )
                    ),
                    (cur_dom == F.col("_g_dom"))
                    & (F.col("_g_seq") < F.col("seq")),
                    "left",
                ).drop("_g_dom")
                have_cookie = have_cookie | F.col("_g_seq").isNotNull()
                j = j.withColumn("_have_cookie", have_cookie).drop("_g_seq")
            else:
                j = j.join(
                    F.broadcast(
                        cookie_jar.select(
                            F.col("domain").alias("_g_dom")
                        ).withColumn("_g_jar", F.lit(True))
                    ),
                    cur_dom == F.col("_g_dom"),
                    "left",
                ).drop("_g_dom")
                have_cookie = have_cookie | F.col("_g_jar").isNotNull()
                j = j.withColumn("_have_cookie", have_cookie).drop("_g_jar")
            have_cookie = F.col("_have_cookie")
        cookie_missing = (
            F.col("m_requires_cookie").eqNullSafe(True)
            & (F.lit(not cfg.use_cookies) | ~have_cookie)
        )
        j = j.withColumn(
            "eff_status", F.when(cookie_missing, F.lit(403)).otherwise(F.col("eff_status"))
        ).drop("_have_cookie")

        is_redirect = (
            F.col("eff_status").isNotNull()
            & F.col("eff_status").cast("string").startswith("30")
            & F.col("m_location").isNotNull()
        )
        hop = j.where(is_redirect & (F.col("hops") <= cfg.max_redirects))
        terminal = j.where(~is_redirect | (F.col("hops") > cfg.max_redirects))

        # ---- terminal rows: end of one attempt --------------------------
        t = terminal.withColumns(
            {
                "a_error": F.when(
                    is_redirect & (F.col("hops") > cfg.max_redirects),
                    F.lit("MAX_REDIRECTS_REACHED"),
                ).otherwise(
                    F.when(
                        F.col("m_status").isNull() & F.col("m_error_code").isNull(),
                        F.lit("ENOTFOUND"),  # join miss = transport error
                    ).otherwise(F.col("m_error_code"))
                ),
                "a_status": F.col("eff_status"),
                # crawler.js:466-469 — type sticky, updated when header present
                "type": F.when(
                    F.col("m_content_type").isNotNull(),
                    F.trim(F.regexp_replace("m_content_type", ";.*", "")),
                ).otherwise(F.col("type")),
                # the body-download gate reads the per-response contentType
                # var (crawler.js:255): NOT sticky — a final 200 without a
                # content-type header downloads nothing even if an earlier
                # attempt had text/html
                "content_type_raw": F.col("m_content_type"),
                "gzipped": F.col("m_content_encoding").eqNullSafe("gzip"),
                # landing = finalURL = the last url that RESPONDED: the
                # current hop if it answered, else the prior 30x hop (a
                # transport error mid-chain leaves `response` at hop N-1)
                "landing": F.when(
                    F.col("m_status").isNotNull(), F.col("cur_url")
                ).otherwise(F.coalesce(F.col("resp_url"), F.col("page_url"))),
            }
        )

        # terminal responses with Set-Cookie also feed the jar (the
        # request lib's jar stores cookies from every response, not
        # just 30x hops) — surfaced in the output so the driver can
        # commit them to the crawl-global jar for later rounds
        t = t.withColumn(
            "jar",
            F.when(
                F.col("m_set_cookie").isNotNull()
                & F.lit(cfg.use_cookies)
                & F.col("m_status").isNotNull(),
                F.array_union(
                    F.col("jar"),
                    F.array(
                        F.lower(F.coalesce(F.parse_url("cur_url", F.lit("HOST")), F.lit("")))
                    ),
                ),
            ).otherwise(F.col("jar")),
        )

        # redirect bookkeeping (crawler.js:521-542, :474-504)
        redirected = F.col("landing") != F.col("page_url")
        clean_final = canonicalize_url(F.col("landing"))
        t = t.withColumns(
            {
                "is_external": F.when(
                    redirected & ~F.col("is_external")
                    & _is_external_pair(F.col("page_url"), F.col("landing")),
                    F.lit(True),
                ).otherwise(F.col("is_external")),
                "events": F.when(
                    redirected,
                    F.concat(
                        F.col("events"),
                        F.array(
                            F.struct(
                                F.size("events").alias("event_idx"),
                                F.col("page_url").alias("pre_url"),
                                F.col("landing").alias("final_raw"),
                                clean_final.alias("clean_final"),
                                F.col("a_status").cast("int").alias("status_code"),
                                F.col("redirects").alias("redirects_before"),
                            )
                        ),
                    ),
                ).otherwise(F.col("events")),
                "redirects": F.when(
                    redirected, F.concat("redirects", F.array("page_url"))
                ).otherwise(F.col("redirects")),
                "page_url": F.when(redirected, clean_final).otherwise(F.col("page_url")),
            }
        )

        # crawler.js:544-553 — HPE forgiveness for externals
        forgiven = (
            F.col("a_error").eqNullSafe("HPE_INVALID_CONSTANT")
            & F.col("m_content_length").isNotNull()
            & (F.col("a_status") == 200)
            & F.col("is_external")
        )
        t = t.withColumn("a_error", F.when(forgiven, F.lit(None)).otherwise(F.col("a_error")))

        ok = F.col("a_error").isNull() & (F.col("a_status") == 200)
        finished = t.where(ok | (F.col("attempt") >= cfg.retries)).select(
            "url", "seq", "referrer", "is_external", "crawl_links", "depth",
            "page_url", "params_url", "params_external", "attempt", "type",
            "content_type_raw", "gzipped",
            F.col("a_status").cast("int").alias("status_code"),
            F.col("a_error").alias("error_code"),
            "redirects", "events",
            ok.alias("ok"),
            "jar",
        )
        done_parts.append(finished)

        retrying = t.where(~ok & (F.col("attempt") < cfg.retries)).select(
            "url", "seq", "referrer", "is_external", "crawl_links", "depth", "page_url",
            F.col("page_url").alias("cur_url"),
            F.col("page_url").alias("params_url"),
            F.col("is_external").alias("params_external"),
            (F.col("attempt") + 1).alias("attempt"),
            F.lit(0).alias("hops"),
            # per-attempt state resets: a retry is a fresh _request call
            F.lit(None).cast("string").alias("resp_url"),
            "type",
            F.lit(None).cast("string").alias("content_type_raw"),
            "gzipped", "redirects", "events",
            "jar",
        )

        # ---- redirect hops: resolve Location against the hop url ------
        # cookies are saved only on 30x responses (crawler.js:272-278)
        hop_jar = F.when(
            F.col("m_set_cookie").isNotNull() & F.lit(cfg.use_cookies),
            F.array_union(
                F.col("jar"),
                F.array(
                    F.lower(F.coalesce(F.parse_url("cur_url", F.lit("HOST")), F.lit("")))
                ),
            ),
        ).otherwise(F.col("jar"))
        hopping = hop.select(
            "url", "seq", "referrer", "is_external", "crawl_links", "depth", "page_url",
            resolve_url(F.col("cur_url"), F.col("m_location")).alias("cur_url"),
            "params_url", "params_external", "attempt",
            (F.col("hops") + 1).alias("hops"),
            # this hop's url responded (30x) — it becomes the fallback
            # landing if a later hop transport-errors
            F.col("cur_url").alias("resp_url"),
            "type", "content_type_raw", "gzipped", "redirects", "events",
            hop_jar.alias("jar"),
        )

        # Checkpoint the RESIDUE, not the full join: the pending rows
        # (redirect hops + retries, a tiny fraction) are re-read by the
        # next iteration's join and the emptiness probe, so they get an
        # eager localCheckpoint — which also truncates lineage each
        # iteration (the loop otherwise compounds the expression tree
        # ~11× deep and the unions/broadcast joins compound partition
        # counts exponentially; the coalesce bounds that too). The big
        # finished branch is consumed exactly once downstream (the
        # driver persists the expanded round), so materializing the
        # whole join here would write the round to the block store a
        # second time for nothing — that single change is worth ~20 s
        # per 400k-row round. On a real cluster the residue checkpoint
        # would be a reliable checkpoint or a small intermediate table.
        base_parts = scheduled.sparkSession.sparkContext.defaultParallelism
        # LAZY checkpoint + count: count() computes every partition, so
        # the one job both materializes the checkpoint AND answers the
        # emptiness probe — the eager-ckpt + isEmpty pair cost 2 jobs
        # per hop on the round's job floor
        pending = (
            retrying.unionByName(hopping)
            .coalesce(base_parts)
            .localCheckpoint(eager=False)
        )
        if persisted is not None:
            persisted.append(pending)
        if pending.count() == 0:
            break

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out
