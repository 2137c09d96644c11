"""WARC source: round-trip (serialize → read, plain AND per-record
gzip) and an end-to-end crawl off a WARC archive golden-checked
against the sequential reference simulator."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.warc import (
    parse_warc_file,
    read_warc,
    warc_bytes,
    warc_tables,
)
from tests.reference_sim import simulate

_TS = datetime.datetime(2026, 3, 1, 12, 0, 0)


def _site_records():
    def html(*hrefs):
        return (
            "<html><body>"
            + "".join(f'<a href="{h}">x</a>' for h in hrefs)
            + "</body></html>"
        ).encode("utf-8")

    return [
        {"url": "http://site.test/", "ts": _TS,
         "body": html("/a", "/b", "/r")},
        {"url": "http://site.test/a", "ts": _TS, "body": html("/b")},
        {"url": "http://site.test/b", "ts": _TS, "body": html("/missing")},
        {"url": "http://site.test/r", "ts": _TS, "body": b"", "status": 301,
         "http_headers": [("Content-Type", "text/html"), ("Location", "/a")]},
        {"url": "http://site.test/missing", "ts": _TS, "body": b"",
         "status": 404},
    ]


def test_roundtrip_plain_equals_gzip(spark, tmp_path):
    recs = _site_records()
    plain = tmp_path / "site.warc"
    gz = tmp_path / "site.warc.gz"
    plain.write_bytes(warc_bytes(recs))
    gz.write_bytes(warc_bytes(recs, per_record_gzip=True))

    a = sorted(read_warc(spark, str(plain)).collect(), key=lambda r: r.url)
    b = sorted(read_warc(spark, str(gz)).collect(), key=lambda r: r.url)

    assert [r.url for r in a] == sorted(r["url"] for r in recs)
    for ra, rb in zip(a, b):
        assert (ra.url, ra.status_code, ra.content_type, ra.location) == (
            rb.url, rb.status_code, rb.content_type, rb.location
        )
        assert bytes(ra.html) == bytes(rb.html), "gzip path altered bytes"
    by_url = {r["url"]: r for r in recs}
    for r in a:
        assert bytes(r.html) == by_url[r.url]["body"], "body not byte-identical"
        assert r.warc_ts == _TS
        assert r.status_code == by_url[r.url].get("status", 200)
    red = next(r for r in a if r.url == "http://site.test/r")
    assert red.location == "/a"


def test_parse_warc_file_skips_non_response():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rows = parse_warc_file("x", info + warc_bytes(_site_records()[:1]))
    assert len(rows) == 1 and rows[0][0] == "http://site.test/"


def test_warc_crawl_e2e_matches_simulator(spark, tmp_path):
    path = tmp_path / "site.warc.gz"
    path.write_bytes(warc_bytes(_site_records(), per_record_gzip=True))

    records = read_warc(spark, str(path))
    pages, http = warc_tables(records)

    cfg = CrawlConfig()
    seeds = ["http://site.test/"]
    res = run_crawl(spark, cfg, pages, http, seeds, str(tmp_path / "out"))

    # simulator inputs derived from the SAME parsed records
    parsed = parse_warc_file("x", path.read_bytes())
    pages_rows = [(u, ts, body, None, None)
                  for (u, ts, st, ct, ce, cl, loc, sc, body, _f) in parsed]
    http_rows = [(u, 0, st, loc, ct, ce, cl, None, st == 401, sc, False)
                 for (u, ts, st, ct, ce, cl, loc, sc, body, _f) in parsed]
    sim = simulate(cfg, seeds, pages_rows, http_rows)

    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == sim.seen

    crawled = {r.url: r for r in res.crawled(spark).collect()}
    exp = {c["url"]: c for c in sim.crawled}
    assert sorted(crawled) == sorted(exp)
    for u in exp:
        assert crawled[u].text == exp[u]["text"], f"{u}: text not byte-identical"
        assert list(crawled[u].links) == list(exp[u]["links"])

    errors = {r.url for r in res.errors(spark).collect()}
    assert errors == {c["url"] for c in sim.errors}


def test_cdx_range_reads_match_full_read(spark, tmp_path):
    from node_crawler_spark.sources.warc import (
        CDX_SCHEMA,
        read_warc_by_cdx,
        warc_bytes_indexed,
    )

    path = tmp_path / "site.warc.gz"
    blob, cdx = warc_bytes_indexed(
        _site_records(), per_record_gzip=True, warc_file=str(path)
    )
    path.write_bytes(blob)

    cdx_df = spark.createDataFrame(
        [tuple(r[k] for k in ("url", "warc_ts", "warc_file", "offset",
                              "length", "status_code"))
         for r in cdx],
        CDX_SCHEMA,
    ).repartition(3)

    via_cdx = sorted(read_warc_by_cdx(cdx_df).collect(), key=lambda r: r.url)
    full = sorted(read_warc(spark, str(path)).collect(), key=lambda r: r.url)
    assert [(r.url, r.status_code, bytes(r.html)) for r in via_cdx] == [
        (r.url, r.status_code, bytes(r.html)) for r in full
    ]

    # index-pruned read: the predicate drops records BEFORE any byte IO
    subset = read_warc_by_cdx(
        cdx_df.where("url like '%/a' or url like '%/b'")
    ).collect()
    assert sorted(r.url for r in subset) == [
        "http://site.test/a", "http://site.test/b"
    ]


def test_parser_roundtrip_adversarial_bodies():
    """Property: serialize→parse is identity for ANY body bytes —
    including bodies that embed WARC record markers, CRLF-CRLF runs,
    gzip magic, and NULs (Content-Length framing, not delimiters)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    marker = st.sampled_from(
        [b"WARC/1.0\r\n", b"\r\n\r\n", b"\x1f\x8b", b"HTTP/1.1 200 OK\r\n",
         b"Content-Length: 0\r\n", b"\x00\x00"]
    )
    chunk = st.one_of(st.binary(max_size=40), marker)
    body = st.lists(chunk, max_size=8).map(b"".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(body, min_size=1, max_size=4), st.booleans())
    def prop(bodies, gz):
        recs = [
            {"url": f"http://h.test/{i}", "ts": _TS, "body": b,
             "status": 200}
            for i, b in enumerate(bodies)
        ]
        rows = parse_warc_file("f", warc_bytes(recs, per_record_gzip=gz))
        assert [(r[0], r[8]) for r in rows] == [
            (r["url"], r["body"]) for r in recs
        ]

    prop()


def test_warc_robots_record_gates_crawl(spark, tmp_path):
    """Integration: a robots.txt RESPONSE RECORD inside the archive
    (exactly how Common Crawl ships robots) is parsed from the
    WARC-derived page store and gates the crawl — /b disallowed ⇒
    never fetched; simulator agrees under the same derived rule."""
    import dataclasses

    from node_crawler_spark.operators.robots import (
        robots_rules_from_pages,
        rules_tuples,
    )

    recs = _site_records() + [
        {"url": "http://site.test/robots.txt", "ts": _TS,
         "body": b"User-agent: *\nDisallow: /b\n",
         "http_headers": [("Content-Type", "text/plain")]},
    ]
    path = tmp_path / "site.warc.gz"
    path.write_bytes(warc_bytes(recs, per_record_gzip=True))

    pages, http = warc_tables(read_warc(spark, str(path)))
    derived = rules_tuples(robots_rules_from_pages(pages))
    assert ("site.test", "/b", False) in derived

    cfg = dataclasses.replace(CrawlConfig(), robots=derived)
    seeds = ["http://site.test/"]
    res = run_crawl(spark, cfg, pages, http, seeds, str(tmp_path / "out"))

    parsed = parse_warc_file("x", path.read_bytes())
    pages_rows = [(u, ts, body, None, None)
                  for (u, ts, st, ct, ce, cl, loc, sc, body, _f) in parsed]
    http_rows = [(u, 0, st, loc, ct, ce, cl, None, st == 401, sc, False)
                 for (u, ts, st, ct, ce, cl, loc, sc, body, _f) in parsed]
    sim = simulate(cfg, seeds, pages_rows, http_rows)

    seen = [r.url for r in sorted(res.seen(spark).collect(), key=lambda r: r.seq)]
    assert seen == sim.seen
    assert "http://site.test/b" not in seen


def test_export_roundtrip(spark, tmp_path):
    """Distributed export sink: page store → part-WARCs + CDX
    sidecars (executor-side) → read back byte-identical, both via the
    files and via the CDX sidecars."""
    from node_crawler_spark.sources.warc import export_warc, read_warc

    path = tmp_path / "in.warc.gz"
    path.write_bytes(warc_bytes(_site_records(), per_record_gzip=True))
    pages, http = warc_tables(read_warc(spark, str(path)))

    out = str(tmp_path / "export")
    manifest = export_warc(
        pages.repartition(2), http.repartition(2), out
    ).collect()
    assert sum(m.n_records for m in manifest) == 5
    assert all(m.warc_file.endswith(".warc.gz") for m in manifest)

    back = read_warc(spark, f"{out}/*.warc.gz").collect()
    orig = {r["url"]: r for r in _site_records()}
    assert sorted(r.url for r in back) == sorted(orig)
    for r in back:
        assert bytes(r.html) == orig[r.url]["body"]
        assert r.status_code == orig[r.url].get("status", 200)
    red = next(r for r in back if r.url == "http://site.test/r")
    assert red.location == "/a"

    # the CDX sidecars drive the range reader directly
    from node_crawler_spark.sources.warc import CDX_SCHEMA, read_warc_by_cdx

    cdx = spark.read.schema(CDX_SCHEMA).csv(f"{out}/*.cdx.csv")
    via = read_warc_by_cdx(cdx).collect()
    assert sorted(r.url for r in via) == sorted(orig)


def test_wet_round_trip_and_documents_face(spark, tmp_path):
    """WET (conversion-record) archives: serialize → read_wet →
    byte/field-identical; wet_documents maps to the documents shape;
    export_wet shards executor-side and re-reads identically."""
    import datetime

    from node_crawler_spark.sources.warc import (
        export_wet,
        read_wet,
        wet_bytes,
        wet_documents,
    )

    ts = datetime.datetime(2026, 3, 1, 12, 0, 0)
    recs = [
        {"url": "http://a.test/x", "ts": ts, "text": "hello world"},
        {"url": "http://a.test:8080/y", "ts": ts, "text": "héllo ünïcode"},
        {"url": "http://b.test/", "ts": ts, "text": ""},
    ]
    p = tmp_path / "c.warc.wet.gz"
    p.write_bytes(wet_bytes(recs, per_record_gzip=True))

    wet = read_wet(spark, str(p))
    rows = {r.url: r for r in wet.collect()}
    assert len(rows) == 3
    assert rows["http://a.test/x"].text == "hello world"
    assert rows["http://a.test:8080/y"].text == "héllo ünïcode"
    assert rows["http://b.test/"].text == ""
    assert rows["http://a.test/x"].warc_ts == ts

    docs = {r.url: r for r in wet_documents(wet).collect()}
    assert docs["http://a.test:8080/y"].source == "a.test:8080"
    assert docs["http://a.test/x"].n_chars == 11

    # a mixed archive: response records are skipped by the WET reader
    from node_crawler_spark.sources.warc import warc_bytes

    mixed = tmp_path / "mixed.warc.gz"
    mixed.write_bytes(
        warc_bytes(
            [{"url": "http://a.test/r", "ts": ts, "body": b"<html></html>"}],
            per_record_gzip=True,
        )
        + wet_bytes(recs[:1], per_record_gzip=True)
    )
    assert read_wet(spark, str(mixed)).count() == 1

    # distributed export → re-read round-trip
    out = tmp_path / "shards"
    manifest = export_wet(wet.repartition(2), str(out))
    m = manifest.collect()
    assert sum(r.n_records for r in m) == 3
    back = {r.url: r for r in read_wet(spark, str(out) + "/*.wet.gz").collect()}
    assert {u: r.text for u, r in back.items()} == {
        u: r.text for u, r in rows.items()
    }


def test_cli_export_wet(spark, tmp_path, capsys):
    """--export-wet: the visited pages' extracted text round-trips
    through WET shards byte-identically."""
    import json

    from node_crawler_spark.cli import main
    from node_crawler_spark.sources.warc import read_wet

    path = tmp_path / "site.warc.gz"
    path.write_bytes(warc_bytes(_site_records(), per_record_gzip=True))

    rc = main(
        [
            "--seeds", "http://site.test/",
            "--warc", str(path),
            "--store", str(tmp_path / "store"),
            "--export-wet", str(tmp_path / "wet"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported_wet"]["records"] >= 3

    back = {r.url: r for r in read_wet(spark, str(tmp_path / "wet")).collect()}
    # extracted text of the seed page must match the crawl's committed
    # text (byte-identical discipline carried through the WET sink)
    from node_crawler_spark.sources.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"))
    crawled = {
        r.url: r.text
        for r in spark.read.parquet(
            str(tmp_path / "store") + "/rounds/r=*/crawled"
        ).collect()
    }
    assert set(back) == set(crawled)
    for u, t in crawled.items():
        assert back[u].text == t, u
    assert back["http://site.test/"].warc_ts == _TS


def test_wat_round_trip_edges_and_export(spark, tmp_path):
    """WAT (metadata-record) archives — the Common Crawl trio's third
    face: serialize → read_wat field-identical (plain == gzip); mixed
    archives keep only metadata records; wat_edges matches the link
    arrays; export_wat shards executor-side and re-reads identically;
    the edges drive PageRank directly (the WAT's whole point: rank
    without the bodies)."""
    import datetime

    from node_crawler_spark.operators.linkgraph import pagerank
    from node_crawler_spark.sources.warc import (
        export_wat,
        read_wat,
        warc_bytes,
        wat_bytes,
        wat_edges,
    )

    ts = datetime.datetime(2026, 3, 1, 12, 0, 0)
    recs = [
        {
            "url": "http://a.test/",
            "ts": ts,
            "links": ["http://a.test/x", "http://b.test/"],
            "title": "A — hömé",
        },
        {"url": "http://a.test/x", "ts": ts, "links": ["http://b.test/"]},
        {"url": "http://b.test/", "ts": ts, "links": []},
    ]
    plain = tmp_path / "m.warc.wat"
    gz = tmp_path / "m.warc.wat.gz"
    plain.write_bytes(wat_bytes(recs, per_record_gzip=False))
    gz.write_bytes(wat_bytes(recs, per_record_gzip=True))

    wat = read_wat(spark, str(gz))
    rows = {r.url: r for r in wat.collect()}
    assert len(rows) == 3
    assert rows["http://a.test/"].links == [
        "http://a.test/x",
        "http://b.test/",
    ]
    assert rows["http://a.test/"].title == "A — hömé"
    assert rows["http://a.test/x"].title is None
    assert rows["http://b.test/"].links == []
    assert rows["http://a.test/"].warc_ts == ts
    rows_plain = {r.url: r for r in read_wat(spark, str(plain)).collect()}
    assert {u: (r.links, r.title) for u, r in rows_plain.items()} == {
        u: (r.links, r.title) for u, r in rows.items()
    }

    # a mixed archive: response records are skipped by the WAT reader
    mixed = tmp_path / "mixed.warc.gz"
    mixed.write_bytes(
        warc_bytes(
            [{"url": "http://a.test/r", "ts": ts, "body": b"<html></html>"}],
            per_record_gzip=True,
        )
        + wat_bytes(recs[:1], per_record_gzip=True)
    )
    assert read_wat(spark, str(mixed)).count() == 1

    # edges face: exactly the link arrays, exploded
    edges = {(r.src, r.dst) for r in wat_edges(wat).collect()}
    assert edges == {
        ("http://a.test/", "http://a.test/x"),
        ("http://a.test/", "http://b.test/"),
        ("http://a.test/x", "http://b.test/"),
    }

    # the rank loop runs straight off the WAT (b.test is the sink and
    # must out-rank both linkers)
    ranks = {
        r.url: r.rank
        for r in pagerank(wat_edges(wat).distinct(), iters=10).collect()
    }
    assert ranks["http://b.test/"] > ranks["http://a.test/x"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9

    # distributed export → re-read round-trip
    out = tmp_path / "shards"
    manifest = export_wat(wat.repartition(2), str(out))
    m = manifest.collect()
    assert sum(r.n_records for r in m) == 3
    back = {
        r.url: r for r in read_wat(spark, str(out) + "/*.wat.gz").collect()
    }
    assert {u: (r.links, r.title) for u, r in back.items()} == {
        u: (r.links, r.title) for u, r in rows.items()
    }


def test_wat_export_from_crawl_matches_crawled_links(spark, tmp_path):
    """Crawl → export_wat → read_wat: the archived link graph equals
    the crawled sink's link arrays exactly (crawler.js:93-107's
    page.links, archived without bodies)."""
    import datetime

    from pyspark.sql import functions as F

    from node_crawler_spark.sources.fixtures import scenario
    from node_crawler_spark.sources.warc import export_wat, read_wat, wat_edges

    s = scenario("basic_link_crawl")
    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "st"))
    crawled = res.crawled(spark)
    ts = datetime.datetime(2026, 3, 1)
    src = crawled.select(
        "url", F.lit(ts).cast("timestamp").alias("warc_ts"), "links"
    )
    out = tmp_path / "wat"
    export_wat(src, str(out))
    back = read_wat(spark, str(out) + "/*.wat.gz")
    want = {
        (r.url, tuple(r.links or [])) for r in crawled.collect()
    }
    got = {(r.url, tuple(r.links)) for r in back.collect()}
    assert got == want
    # edge count equals the sum of link-array lengths (order kept in pos)
    n_links = sum(len(r.links or []) for r in crawled.collect())
    assert wat_edges(back).count() == n_links


def test_cli_export_wat(spark, tmp_path, capsys):
    """--export-wat: the visited pages' outlink graph round-trips
    through WAT shards exactly (links per url, snapshot warc_ts)."""
    import json

    from node_crawler_spark.cli import main
    from node_crawler_spark.sources.warc import read_wat

    path = tmp_path / "site.warc.gz"
    path.write_bytes(warc_bytes(_site_records(), per_record_gzip=True))

    rc = main(
        [
            "--seeds", "http://site.test/",
            "--warc", str(path),
            "--store", str(tmp_path / "store"),
            "--export-wat", str(tmp_path / "wat"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported_wat"]["records"] >= 3

    back = {r.url: r for r in read_wat(spark, str(tmp_path / "wat")).collect()}
    crawled = {
        r.url: list(r.links or [])
        for r in spark.read.parquet(
            str(tmp_path / "store") + "/rounds/r=*/crawled"
        ).collect()
    }
    assert set(back) == set(crawled)
    for u, links in crawled.items():
        assert back[u].links == links, u
    assert back["http://site.test/"].warc_ts == _TS


def test_non_latin1_url_exports_do_not_crash():
    """ADVICE r3: a crawled IRI with characters beyond U+00FF used to
    raise UnicodeEncodeError in the record builders (header block is
    latin-1). Non-latin-1 chars are now percent-encoded (UTF-8);
    latin-1-encodable URLs stay byte-identical."""
    from datetime import datetime

    from node_crawler_spark.sources.warc import (
        _uri_header_safe,
        iter_warc_records,
        warc_conversion_record,
        warc_metadata_record,
        warc_response_record,
    )

    iri = "http://example.com/café/日本語?q=✓"
    ts = datetime(2026, 1, 1, 0, 0, 0)
    for blob in (
        warc_response_record(iri, ts, b"<html></html>"),
        warc_conversion_record(iri, ts, "text"),
        warc_metadata_record(iri, ts, ["http://example.com/a"]),
    ):
        (hdrs, _payload), = list(iter_warc_records(blob))
        uri = hdrs["warc-target-uri"]
        # latin-1 part survives verbatim, the rest is %-encoded UTF-8
        assert uri == "http://example.com/café/%E6%97%A5%E6%9C%AC%E8%AA%9E?q=%E2%9C%93"
    # pure-ASCII and latin-1 URLs are untouched (golden round-trips)
    assert _uri_header_safe("http://a.com/x?y=1#z") == "http://a.com/x?y=1#z"
    assert _uri_header_safe("http://a.com/café") == "http://a.com/café"


def test_non_latin1_http_header_values_do_not_crash():
    """The HTTP header block is latin-1 too: a redirect row exports a
    ``Location:`` header carrying the landing URL (export_warc), so a
    non-latin-1 redirect target used to crash the partition the same
    way the Target-URI did. Location gets the percent-encoding guard;
    arbitrary header values (Set-Cookie etc.) fall back to latin-1
    'replace' rather than raising."""
    from datetime import datetime

    from node_crawler_spark.sources.warc import (
        iter_warc_records,
        warc_response_record,
    )

    ts = datetime(2026, 1, 1, 0, 0, 0)
    blob = warc_response_record(
        "http://example.com/start",
        ts,
        b"",
        status=301,
        http_headers=[
            ("Content-Type", "text/html"),
            ("Location", "http://example.com/日本語"),
            ("Set-Cookie", "name=café✓"),
        ],
    )
    (hdrs, payload), = list(iter_warc_records(blob))
    http_head = payload.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    assert "Location: http://example.com/%E6%97%A5%E6%9C%AC%E8%AA%9E" in http_head
    # non-latin-1 values write their UTF-8 bytes via the latin-1
    # identity: mojibake in the latin-1 view, but the archive carries
    # the EXACT original bytes (reversible — unlike the pre-r5
    # 'replace' fallback, which destroyed them). (ADVICE r4)
    assert "Set-Cookie: name=café✓".encode("utf-8") in payload
    cookie_line = [
        ln for ln in http_head.split("\r\n") if ln.startswith("Set-Cookie:")
    ][0]
    assert cookie_line[len("Set-Cookie: "):].encode("latin-1") == \
        "name=café✓".encode("utf-8")
    # latin-1-safe headers stay byte-identical
    blob2 = warc_response_record(
        "http://example.com/", ts, b"", status=301,
        http_headers=[("Location", "http://example.com/café")],
    )
    (_, payload2), = list(iter_warc_records(blob2))
    assert b"Location: http://example.com/caf\xe9" in payload2


def test_export_redirect_hop_without_stored_body(spark, tmp_path):
    """Redirect hops (30x rows) have no page-store body, so the export
    join leaves their warc_ts NULL — strftime on the NaT used to fail
    the partition. They now export with the deterministic epoch
    WARC-Date and their (guarded) Location header, and round-trip
    through read_warc."""
    import os

    from node_crawler_spark.config import CrawlConfig
    from node_crawler_spark.sources.fixtures import BASE, Scenario, _links
    from node_crawler_spark.sources.warc import (
        export_warc,
        iter_warc_records,
        read_warc,
        warc_tables,
    )

    s = Scenario(name="hop_export", cfg=CrawlConfig(retries=0),
                 seeds=[f"{BASE}/r"])
    s.page(f"{BASE}/r", status=301, location="/café/日本語",
           content_type=None, store_body=False)
    s.page(f"{BASE}/café/日本語", _links())
    pages, http = s.dfs(spark)
    out = str(tmp_path / "w")
    export_warc(pages, http, out, per_record_gzip=False).collect()

    locations, dates = [], []
    for root, _d, files in os.walk(out):
        for f in files:
            if not f.endswith(".warc"):
                continue
            blob = open(os.path.join(root, f), "rb").read()
            for hdrs, payload in iter_warc_records(blob):
                dates.append(hdrs["warc-date"])
                locations += [
                    line for line in payload.split(b"\r\n")
                    if line.startswith(b"Location:")
                ]
    # latin-1 chars byte-preserved, beyond-latin-1 percent-encoded
    assert locations == [b"Location: /caf\xe9/%E6%97%A5%E6%9C%AC%E8%AA%9E"]
    assert "1970-01-01T00:00:00Z" in dates  # the body-less hop's sentinel
    bp, bh = warc_tables(read_warc(spark, out))
    assert bh.count() == 2
