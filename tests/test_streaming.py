"""Structured Streaming: seed-inbox ingestion (canonicalize + gate +
dedup in foreachBatch) with availableNow draining."""

from __future__ import annotations

import os

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.streaming.seeds import read_inbox, start_seed_ingest


def _write_seed_file(d, name, urls):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as fh:
        fh.write("\n".join(urls) + "\n")


def test_seed_ingest_drains_and_dedups(spark, tmp_path):
    seeds_dir = str(tmp_path / "seeds")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")

    _write_seed_file(seeds_dir, "a.txt", [
        "http://www.site.test",          # canonicalizes → trailing slash
        "http://www.site.test/page",
        "http://WWW.Site.test/page",     # same after canonicalization
        "http://www.site.test/private/x",
    ])
    cfg = CrawlConfig(exclude_patterns=("/private",))
    q = start_seed_ingest(spark, seeds_dir, inbox, ckpt, cfg, available_now=True)
    q.awaitTermination(120)

    rows = {r.url for r in read_inbox(spark, inbox).collect()}
    assert rows == {"http://www.site.test/", "http://www.site.test/page"}

    # second drop: dup of existing + one new url
    _write_seed_file(seeds_dir, "b.txt", [
        "http://www.site.test/page",
        "http://www.site.test/new",
    ])
    q = start_seed_ingest(spark, seeds_dir, inbox, ckpt, cfg, available_now=True)
    q.awaitTermination(120)

    inbox_df = read_inbox(spark, inbox)
    urls = [r.url for r in inbox_df.collect()]
    assert sorted(urls) == [
        "http://www.site.test/",
        "http://www.site.test/new",
        "http://www.site.test/page",
    ], "no duplicates across micro-batches"


def test_token_bucket_stateful_politeness(spark, tmp_path):
    """applyInPandasWithState token bucket (§2.9): capacity 2, refill 2
    — batch 1 admits 2 of 4 hot-domain urls; the refill admits 2 more
    in batch 2; the cold domain is independent state."""
    from node_crawler_spark.streaming.token_bucket import start_token_bucket

    urls_dir = str(tmp_path / "urls")
    out_dir = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "tb_ckpt")

    _write_seed_file(urls_dir, "b1.txt", [
        "http://hot.test/p1", "http://hot.test/p2",
        "http://hot.test/p3", "http://hot.test/p4",
        "http://cold.test/x",
    ])
    q = start_token_bucket(spark, urls_dir, out_dir, ckpt,
                           capacity=2, refill=2, available_now=True)
    q.awaitTermination(120)

    rows = spark.read.parquet(out_dir).collect()
    hot = {r.url: r.admitted for r in rows if r.domain == "hot.test"}
    assert sum(hot.values()) == 2, hot      # 2 of 4 admitted
    assert len(hot) == 4
    assert all(r.admitted for r in rows if r.domain == "cold.test")

    # batch 2: refill lets two deferred urls through on resubmission
    _write_seed_file(urls_dir, "b2.txt", [
        u for u, ok in sorted(hot.items()) if not ok
    ])
    q = start_token_bucket(spark, urls_dir, out_dir, ckpt,
                           capacity=2, refill=2, available_now=True)
    q.awaitTermination(120)
    rows2 = spark.read.parquet(out_dir).collect()
    hot_admitted = [r.url for r in rows2 if r.domain == "hot.test" and r.admitted]
    assert len(hot_admitted) == 4, "refill admits the deferred pair"


def test_windowed_domain_counts_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windowed aggregation semantics (metrics.py): append
    mode emits a window exactly once when the watermark passes its
    end; a row that lands in a still-open window is counted even if it
    is behind the watermark (Spark drops only rows whose WINDOW END is
    behind the watermark); and a row arriving after its window was
    finalized is DROPPED — never re-emitted or double-counted. Three
    availableNow runs share one checkpoint so the watermark genuinely
    persists between them."""
    import datetime as dt

    from node_crawler_spark.streaming.metrics import windowed_domain_counts

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "url string, warc_ts timestamp"

    def ts(h, m):
        return dt.datetime(2025, 1, 1, h, m)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_domain_counts(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.win_start, r.domain): r.pages
            for r in spark.read.parquet(out).collect()
        }

    spark.createDataFrame(
        [
            ("http://d1.test/a", ts(10, 5)),
            ("http://d1.test/b", ts(10, 20)),
            ("http://d2.test/a", ts(10, 10)),
            ("http://d1.test/c", ts(11, 0)),   # max event time → watermark 10:30
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    assert run() == {}, "no window closed yet (watermark 10:30 < 11:00)"

    spark.createDataFrame(
        [
            # behind the 10:30 watermark but window [10,11) end 11:00 is
            # still ahead of it → the window is open, the row COUNTS
            ("http://d1.test/late_but_open", ts(10, 6)),
            ("http://d2.test/adv", ts(12, 0)),  # watermark → 11:30, closes [10,11)
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    got = run()
    assert got[(ts(10, 0), "d1.test")] == 3, "open-window late row counts"
    assert got[(ts(10, 0), "d2.test")] == 1
    assert set(ws for ws, _ in got) == {ts(10, 0)}, "11:00/12:00 windows still open"

    spark.createDataFrame(
        [
            # window [10,11) end 11:00 is behind the 11:30 watermark →
            # finalized window, row is dropped at the state operator
            ("http://d1.test/too_late", ts(10, 40)),
            ("http://d2.test/adv2", ts(13, 0)),  # watermark → 12:30, closes [11,12)
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    got = run()
    assert got[(ts(10, 0), "d1.test")] == 3, "finalized window never re-emitted"
    assert got[(ts(11, 0), "d1.test")] == 1, "[11,12) closes with only d1/c"
    assert (ts(11, 0), "d2.test") not in got
    assert set(ws for ws, _ in got) == {ts(10, 0), ts(11, 0)}, "[12,13) still open"


def test_warc_ingest_stream_incremental(spark, tmp_path):
    """CDX-driven streaming ingestion: two index drops, two
    availableNow runs sharing one checkpoint — the second run ingests
    ONLY the newly indexed records (file-source exactly-once), and
    every page body round-trips byte-identical."""
    import datetime

    from node_crawler_spark.sources.warc import warc_bytes_indexed
    from node_crawler_spark.streaming.warc_ingest import start_warc_ingest

    ts = datetime.datetime(2026, 3, 1, 12, 0, 0)

    def recs(seg, n):
        return [
            {"url": f"http://s{seg}.test/p{i}", "ts": ts,
             "body": f"<html><body>seg{seg} page{i}</body></html>".encode()}
            for i in range(n)
        ]

    cdx_dir = tmp_path / "cdx"
    cdx_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drop_segment(seg, n):
        warc_path = tmp_path / f"seg{seg}.warc.gz"
        blob, cdx = warc_bytes_indexed(
            recs(seg, n), per_record_gzip=True, warc_file=str(warc_path)
        )
        warc_path.write_bytes(blob)
        lines = "\n".join(
            f'{r["url"]},{r["warc_ts"]:%Y-%m-%dT%H:%M:%S.000Z},'
            f'{r["warc_file"]},{r["offset"]},{r["length"]},{r["status_code"]}'
            for r in cdx
        )
        (cdx_dir / f"seg{seg}.csv").write_text(lines + "\n")

    drop_segment(1, 3)
    q = start_warc_ingest(spark, str(cdx_dir), out, ckpt)
    q.awaitTermination(120)
    urls1 = sorted(r.url for r in spark.read.parquet(f"{out}/pages").collect())
    assert urls1 == [f"http://s1.test/p{i}" for i in range(3)]

    drop_segment(2, 2)
    q = start_warc_ingest(spark, str(cdx_dir), out, ckpt)
    q.awaitTermination(120)
    pages = spark.read.parquet(f"{out}/pages").collect()
    urls2 = sorted(r.url for r in pages)
    assert urls2 == (
        [f"http://s1.test/p{i}" for i in range(3)]
        + [f"http://s2.test/p{i}" for i in range(2)]
    ), "second run must add exactly the new segment, no re-ingest"

    bodies = {r.url: bytes(r.html) for r in pages}
    assert bodies["http://s2.test/p1"] == b"<html><body>seg2 page1</body></html>"
    http = spark.read.parquet(f"{out}/http_meta").collect()
    assert sorted(r.url for r in http) == urls2
    assert all(r.status_code == 200 for r in http)


def test_dedup_frontier_stream(spark, tmp_path):
    """Streaming seen-set: first occurrence passes, later duplicates
    drop — across micro-batches sharing one checkpoint (state
    persistence), exact within the watermark horizon."""
    import datetime

    from node_crawler_spark.streaming.dedup import dedup_frontier_stream

    src = tmp_path / "links"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2026, 3, 1, 12, 0, 0)

    def drop(name, rows):
        lines = "\n".join(
            f"{u},{(t0 + datetime.timedelta(seconds=s)):%Y-%m-%dT%H:%M:%S}.000Z"
            for u, s in rows
        )
        (src / f"{name}.csv").write_text(lines + "\n")

    def run():
        stream = (
            spark.readStream.schema("url string, discovered_ts timestamp")
            .csv(str(src))
        )
        q = (
            dedup_frontier_stream(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: a duplicated within the batch
    drop("b1", [("http://a.test/", 0), ("http://b.test/", 1),
                ("http://a.test/", 2)])
    run()
    got1 = sorted(r.url for r in spark.read.parquet(out).collect())
    assert got1 == ["http://a.test/", "http://b.test/"]

    # batch 2: re-offers a and b (must drop — state persisted), adds c
    drop("b2", [("http://a.test/", 30), ("http://c.test/", 31),
                ("http://b.test/", 32)])
    run()
    got2 = sorted(r.url for r in spark.read.parquet(out).collect())
    assert got2 == ["http://a.test/", "http://b.test/", "http://c.test/"]


def test_cms_heavy_hitters_stream_merges_across_batches(spark, tmp_path):
    """Streaming CMS: two micro-batch drops sharing one checkpoint;
    the merged counter matrix must equal the BATCH matrix built over
    the full stream cell-for-cell (integer-exact mergeability — the
    property that lets per-batch partials stand in for a global
    aggregation at any cardinality), and point estimates must be
    exact here (no collisions at this size) and never underestimates."""
    from node_crawler_spark.streaming.heavy_hitters import (
        cms_counters,
        cms_estimate,
        cms_partial,
        start_cms_query,
    )

    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = ["http://hot.test/"] * 5 + ["http://warm.test/"] * 2
    b2 = ["http://hot.test/"] * 3 + ["http://cold.test/"]

    def run(name, urls):
        (src / f"{name}.csv").write_text("\n".join(urls) + "\n")
        stream = spark.readStream.schema("url string").csv(str(src))
        q = start_cms_query(stream, state, ckpt)
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    merged = {
        (r.r, r.c): r.cnt for r in cms_counters(spark, state).collect()
    }
    batch = {
        (r.r, r.c): r.cnt
        for r in cms_partial(
            spark.createDataFrame([(u,) for u in b1 + b2], "url string")
        ).collect()
    }
    assert merged == batch

    keys = spark.createDataFrame(
        [("http://hot.test/",), ("http://warm.test/",),
         ("http://cold.test/",), ("http://never.test/",)],
        "k string",
    )
    est = {r.k: r.cms_estimate for r in cms_estimate(spark, state, keys).collect()}
    assert est["http://hot.test/"] == 8
    assert est["http://warm.test/"] == 2
    assert est["http://cold.test/"] == 1
    assert est["http://never.test/"] >= 0  # CMS never underestimates


def test_hll_distinct_stream_merges_to_batch_registers(spark, tmp_path):
    """Streaming HLL: two micro-batch drops (with a REPLAYED url in
    both — max-merge must absorb it); the merged register file must
    equal the batch register file over the union register-for-register,
    and the per-group estimate must match the batch estimate exactly."""
    from node_crawler_spark.streaming.cardinality import (
        hll_estimate,
        hll_partial,
        hll_registers,
        start_hll_query,
    )

    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = [("a.test", f"http://a.test/{i}") for i in range(40)] + [
        ("b.test", "http://b.test/only")
    ]
    b2 = [("a.test", f"http://a.test/{i}") for i in range(20, 60)] + [
        ("b.test", "http://b.test/only")  # exact replay across batches
    ]

    def run(name, rows):
        (src / f"{name}.csv").write_text(
            "\n".join(f"{g},{u}" for g, u in rows) + "\n"
        )
        stream = spark.readStream.schema("g string, url string").csv(str(src))
        q = start_hll_query(stream, state, ckpt)
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    merged = {
        (r.g, r.bucket): r.r for r in hll_registers(spark, state).collect()
    }
    batch = {
        (r.g, r.bucket): r.r
        for r in hll_partial(
            spark.createDataFrame(b1 + b2, "g string, url string")
        ).collect()
    }
    assert merged == batch

    est = {r.g: r.hll_estimate for r in hll_estimate(spark, state).collect()}
    assert set(est) == {"a.test", "b.test"}
    # The raw estimator (no small-range ln() correction, by design —
    # see sk_hll_distinct) floors near alpha*m^2/m_empty ~ 182 at tiny
    # cardinality, so absolute values are not meaningful here; the
    # merge-exactness assert above is the test. Ordering still holds:
    # 60 distincts fill more registers than 1.
    assert est["a.test"] > est["b.test"] > 0


def test_cms_state_is_replay_idempotent(spark, tmp_path):
    """Adversarial foreachBatch-replay simulation: append a DUPLICATE
    partial for an already-folded batch_id (what a retried micro-batch
    does) and require the merged matrix and estimates unchanged."""
    from node_crawler_spark.streaming.heavy_hitters import (
        cms_counters,
        cms_partial,
        start_cms_query,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    urls = ["http://x.test/"] * 4 + ["http://y.test/"]
    (src / "b1.csv").write_text("\n".join(urls) + "\n")
    stream = spark.readStream.schema("url string").csv(str(src))
    q = start_cms_query(stream, state, ckpt)
    q.awaitTermination(120)

    before = {(r.r, r.c): r.cnt for r in cms_counters(spark, state).collect()}

    # replay batch 0: identical partial, same batch_id, appended again
    (
        cms_partial(spark.createDataFrame([(u,) for u in urls], "url string"))
        .withColumn("batch_id", F.lit(0))
        .write.mode("append")
        .parquet(state)
    )
    after = {(r.r, r.c): r.cnt for r in cms_counters(spark, state).collect()}
    assert after == before


def test_hist_quantiles_stream_merges_to_batch(spark, tmp_path):
    """Streaming histogram quantiles: two drops on one checkpoint; the
    merged histogram equals the batch histogram over the union
    cell-for-cell, and the quantile read-out matches the batch
    read-out exactly (same integer coverage test)."""
    from node_crawler_spark.streaming.quantiles import (
        hist_counters,
        hist_partial,
        hist_quantiles,
        start_hist_query,
    )

    src = tmp_path / "rows"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = [("en", 10 + 64 * (i % 5)) for i in range(50)]
    b2 = [("en", 300 + 7 * i) for i in range(30)] + [("de", 99)]

    def run(name, rows):
        (src / f"{name}.csv").write_text(
            "\n".join(f"{g},{v}" for g, v in rows) + "\n"
        )
        stream = spark.readStream.schema("g string, n_chars long").csv(str(src))
        q = start_hist_query(stream, state, ckpt)
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    merged = {(r.g, r.b): r.cnt for r in hist_counters(spark, state).collect()}
    batch = {
        (r.g, r.b): r.cnt
        for r in hist_partial(
            spark.createDataFrame(b1 + b2, "g string, n_chars long")
        ).collect()
    }
    assert merged == batch

    got = {r.g: r for r in hist_quantiles(spark, state).collect()}
    assert got["en"].n_rows == 80
    assert got["de"].n_rows == 1
    # de: single value 99 → bucket 1 → upper edge 128 for every pct
    assert (got["de"].p50_est, got["de"].p99_est) == (128, 128)
    # en p50: exact median of the union is in the bucket the estimate names
    vals = sorted(v for g, v in b1 + b2 if g == "en")
    p50_true = vals[int(0.5 * (len(vals) - 1))]
    assert got["en"].p50_est - 64 < p50_true <= got["en"].p50_est


def test_kmv_distinct_stream_merges_to_batch(spark, tmp_path):
    """Streaming KMV: two drops (with replayed urls) on one checkpoint;
    the merged K-smallest set equals the batch K-smallest set over the
    union value-for-value (so the estimate is identical too — it is a
    pure function of those values)."""
    from node_crawler_spark.streaming.kmv import (
        kmv_estimate,
        kmv_partial,
        kmv_values,
        start_kmv_query,
    )

    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = [("a.test", f"http://a.test/{i}") for i in range(120)]
    b2 = [("a.test", f"http://a.test/{i}") for i in range(80, 200)] + [
        ("b.test", f"http://b.test/{i}") for i in range(5)
    ]

    def run(name, rows):
        (src / f"{name}.csv").write_text(
            "\n".join(f"{g},{u}" for g, u in rows) + "\n"
        )
        stream = spark.readStream.schema("g string, url string").csv(str(src))
        q = start_kmv_query(stream, state, ckpt)
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    merged = sorted(
        (r.g, r.hv) for r in kmv_values(spark, state).collect()
    )
    batch = sorted(
        (r.g, r.hv)
        for r in kmv_partial(
            spark.createDataFrame(b1 + b2, "g string, url string")
        ).collect()
    )
    assert merged == batch

    est = {r.g: r for r in kmv_estimate(spark, state).collect()}
    assert est["a.test"].k_used == 64          # 200 distinct > K
    assert est["b.test"].k_used == 5           # undersaturated group
    assert 80 < est["a.test"].kmv_estimate < 500  # ~200 ± sketch error


def test_user_sessions_stream_merges_and_finalizes_once(spark, tmp_path):
    """Streaming sessionization (streaming/sessions.py — the streaming
    face of the oracle-checked w_user_sessions): session windows merge
    as events arrive within the gap; a session is emitted EXACTLY once,
    when the watermark (persisted in the checkpoint across runs) passes
    its end; a late event behind the watermark is dropped and cannot
    reopen or extend an already-finalized session."""
    import datetime as dt

    from node_crawler_spark.streaming.sessions import user_sessions_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "user_id long, ts timestamp"

    def ts(h, m):
        return dt.datetime(2025, 1, 1, h, m)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            user_sessions_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.user_id, r.sess_start): (r.sess_end, r.n_events)
            for r in spark.read.parquet(out).collect()
        }

    # batch 1: u1 has two stubs bridged by a middle event (one merged
    # session); u2 one event; u3's 11:00 event drives the watermark
    spark.createDataFrame(
        [
            (1, ts(10, 0)),
            (1, ts(10, 4)),   # bridges 10:00 and 10:08 into ONE session
            (1, ts(10, 8)),
            (2, ts(10, 1)),
            (3, ts(11, 0)),   # max event time → watermark 10:30 next run
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    # availableNow runs a trailing commit batch, so the watermark (10:30)
    # already finalizes the two sessions it passed; u3's stays open
    assert run() == {
        (1, ts(10, 0)): (ts(10, 13), 3),  # [10:00, 10:08+gap) — merged, 3 events
        (2, ts(10, 1)): (ts(10, 6), 1),
    }

    # batch 2: a LATE u1 event behind the watermark (dropped — must not
    # extend or re-emit the finalized session) + a 12:00 event pushing
    # the watermark past u3's session end
    spark.createDataFrame(
        [(1, ts(10, 6)), (4, ts(12, 0))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    got = run()
    assert got == {
        (1, ts(10, 0)): (ts(10, 13), 3),  # unchanged: late event dropped
        (2, ts(10, 1)): (ts(10, 6), 1),
        (3, ts(11, 0)): (ts(11, 5), 1),
    }

    # batch 3: push the watermark past u4's session — emitted exactly once
    spark.createDataFrame([(5, ts(13, 0))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = run()
    assert got[(4, ts(12, 0))] == (ts(12, 5), 1)
    assert len(got) == 4


def test_incremental_neardup_stream_equals_single_shot(spark, tmp_path):
    """Streaming incremental near-dup (streaming/neardup.py): two
    document micro-batches folded against a growing band+shingle index.
    The union of per-batch flags must equal the single-shot near-dup
    over the WHOLE corpus pair-for-pair (batch1-internal + cross +
    batch2-internal = all pairs), and a replayed fold must change
    nothing (state and sink rows are pure functions of the text)."""
    from node_crawler_spark.queries import (
        MH_JACCARD_PPM,
        _exact_jaccard,
        _minhash_bands,
        _shingles_from,
    )
    from node_crawler_spark.streaming.neardup import (
        neardup_flagged,
        neardup_fold,
        start_neardup_query,
    )
    import pyspark.sql.functions as F

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "river bank today")
    uniq1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq2 = "one two three four five six seven eight nine ten eleven"
    uniq3 = "red orange yellow green blue indigo violet colors of light"
    b1 = [(1, base), (2, base + " again"), (3, uniq1), (4, uniq2)]
    b2 = [(5, uniq1 + " extra"), (6, uniq2 + " more"),
          (7, uniq2 + " more words"), (8, uniq3)]
    schema = "doc_id long, text string"

    src = tmp_path / "docs"
    src.mkdir()
    state = str(tmp_path / "state")
    dups = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")

    def run(name, rows):
        import json

        (src / f"{name}.json").write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
            + "\n"
        )
        stream = spark.readStream.schema(schema).json(str(src))
        q = start_neardup_query(stream, state, dups, ckpt)
        q.awaitTermination(120)

    run("b1", b1)
    run("b2", b2)

    streamed = sorted(
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in neardup_flagged(spark, dups).collect()
    )

    # single-shot truth over the union, same machinery
    union = spark.createDataFrame(b1 + b2, schema)
    sh = _shingles_from(union).localCheckpoint()
    bands = _minhash_bands(sh)
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    single = sorted(
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in _exact_jaccard(sh, pairs)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b", "jaccard_ppm")
        .collect()
    )
    assert streamed == single
    # the fixture must exercise both a cross-batch and a within-batch
    # flag (collisions are deterministic functions of the text)
    flagged_pairs = {(a, b) for a, b, _ in streamed}
    assert (1, 2) in flagged_pairs            # within batch 1
    assert (3, 5) in flagged_pairs            # cross batch
    assert (6, 7) in flagged_pairs            # within batch 2
    assert (4, 8) not in flagged_pairs        # unrelated texts stay apart

    # replayed fold: state and sink rows are byte-identical → absorbed
    n_state = spark.read.parquet(f"{state}/shingles").distinct().count()
    neardup_fold(spark.createDataFrame(b2, schema), 99, state, dups)
    assert sorted(
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in neardup_flagged(spark, dups).collect()
    ) == single
    assert (
        spark.read.parquet(f"{state}/shingles").distinct().count() == n_state
    )


def test_sketch_state_readers_empty_before_first_batch(spark, tmp_path):
    """ADVICE r3: estimate queries on a fresh pipeline (no micro-batch
    committed yet → state dir absent) must return EMPTY results, not
    raise AnalysisException — for all four sketch faces."""
    from node_crawler_spark.streaming.cardinality import hll_estimate, hll_registers
    from node_crawler_spark.streaming.heavy_hitters import cms_counters, cms_estimate
    from node_crawler_spark.streaming.kmv import kmv_estimate, kmv_values
    from node_crawler_spark.streaming.quantiles import hist_counters, hist_quantiles

    missing = str(tmp_path / "never_written")
    assert hll_registers(spark, missing).count() == 0
    assert hll_estimate(spark, missing).count() == 0
    assert kmv_values(spark, missing).count() == 0
    assert kmv_estimate(spark, missing).count() == 0
    assert cms_counters(spark, missing).count() == 0
    probe = spark.createDataFrame([("a",)], "k string")
    # CMS point-estimates against empty state: every key reads 0
    est = cms_estimate(spark, missing, probe).collect()
    assert all(r.cms_estimate == 0 for r in est)
    assert hist_counters(spark, missing).count() == 0
    assert hist_quantiles(spark, missing).count() == 0
