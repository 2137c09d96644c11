"""S7 — the debugger.js-analog CLI, end to end: parquet inputs →
run_crawl → per-round metrics + JSON summary (previously the one §2.1
row without a pytest)."""

from __future__ import annotations

import json

from node_crawler_spark.cli import build_arg_parser, config_from_args, main
from node_crawler_spark.sources.fixtures import scenario


def test_config_from_args_parses_new_knobs():
    ap = build_arg_parser()
    args = ap.parse_args(
        [
            "--seeds", "http://a.test/",
            "--pages", "p", "--http-meta", "h", "--store", "s",
            "--budget", "a.test=3:1500",
            "--budget", "b.test=0:4000",
            "--exclude", r"\.pdf$",
            "--priority", "dfs",
            "--compact-every", "4",
            "--probe-from-store",
            "--error-backoff",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.error_backoff
    assert cfg.politeness[0].budget == 3
    assert cfg.politeness[0].crawl_delay_ms == 1500
    assert cfg.politeness[1].budget == 0  # delay-only rule
    assert cfg.politeness[1].crawl_delay_ms == 4000
    assert cfg.priority == "dfs"
    assert cfg.compact_every == 4
    assert cfg.probe_from_store
    assert cfg.use_bloom_prefilter


def test_cli_end_to_end(spark, tmp_path, capsys):
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))

    rc = main(
        [
            "--seeds", *s.seeds,
            "--pages", str(tmp_path / "pages"),
            "--http-meta", str(tmp_path / "http"),
            "--store", str(tmp_path / "store"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr()
    summary = json.loads(out.out.strip().splitlines()[-1])
    assert summary["urls_seen"] == 6  # chain4: /, a, b, a2, c, d
    assert summary["rounds"] >= 4
    assert any("seen_delta" in row for row in summary["per_round"])
    assert "round 1:" in out.err


def test_cli_warc_input(spark, tmp_path, capsys):
    """--warc replaces --pages/--http-meta: crawl off an archive."""
    from tests.test_warc import _site_records
    from node_crawler_spark.sources.warc import warc_bytes

    path = tmp_path / "site.warc.gz"
    path.write_bytes(warc_bytes(_site_records(), per_record_gzip=True))

    rc = main(
        [
            "--seeds", "http://site.test/",
            "--warc", str(path),
            "--store", str(tmp_path / "store"),
            "--export-warc", str(tmp_path / "archive"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["urls_seen"] == 5
    # crawled pages: /, /a, /b (the 301 and 404 are not 200s)
    crawled = spark.read.parquet(
        str(tmp_path / "store" / "rounds" / "r=*" / "crawled")
    )
    assert sorted(r.url for r in crawled.collect()) == [
        "http://site.test/", "http://site.test/a", "http://site.test/b"
    ]
    exported = summary["exported_warc"]
    assert exported["records"] == 5
    from node_crawler_spark.sources.warc import read_warc
    back = read_warc(spark, str(tmp_path / "archive") + "/*.warc.gz")
    assert back.count() == 5


def test_cli_export_anchors(spark, tmp_path, capsys):
    """--export-anchors: parquet rollup of anchor texts over the
    visited slice, targets restricted to crawled urls."""
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))

    rc = main(
        [
            "--seeds", *s.seeds,
            "--pages", str(tmp_path / "pages"),
            "--http-meta", str(tmp_path / "http"),
            "--store", str(tmp_path / "store"),
            "--export-anchors", str(tmp_path / "anchors"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported_anchors"]["dir"] == str(tmp_path / "anchors")

    rollup = {
        r.url: r
        for r in spark.read.parquet(str(tmp_path / "anchors")).collect()
    }
    assert summary["exported_anchors"]["targets"] == len(rollup)
    # chain4: /c is linked from both /b and /a2; every fixture anchor
    # carries text "x"; all targets are crawled urls.
    base = "http://www.site.test"
    c = rollup[f"{base}/c"]
    assert (c.n_refs, c.n_sources, c.texts) == (2, 2, ["x"])
    assert set(rollup) <= {
        f"{base}{p}" for p in ["/", "/a", "/b", "/a2", "/c", "/d"]
    }


def test_cli_curate_standalone(spark, tmp_path, capsys):
    """--curate runs the training-data pipeline with no crawl args and
    writes the same verdicts the oracle-checked query produces."""
    from node_crawler_spark.queries import pipeline_curate

    rc = main(
        [
            "--curate", "/root/testdata/sf0.001",
            "--curate-out", str(tmp_path / "curated"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    out = spark.read.parquet(str(tmp_path / "curated"))
    direct = pipeline_curate(spark, "/root/testdata/sf0.001")
    assert summary["docs"] == direct.count()
    assert summary["kept"] == direct.where("keep").count()
    assert sorted(out.columns) == sorted(direct.columns)
    got = {r["doc_id"]: r["keep"] for r in out.collect()}
    want = {r["doc_id"]: r["keep"] for r in direct.collect()}
    assert got == want
