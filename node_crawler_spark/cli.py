"""Operational CLI — the debugger.js analog (S7, debugger.js:8-108).

Run with spark-submit (north_rule; spark-submit takes a file, not -m,
so scripts/submit_crawl.py is the thin primary resource):

    spark-submit --master <cluster> --py-files nc_spark.zip \\
        scripts/submit_crawl.py \\
        --seeds http://www.site.test/ \\
        --pages /data/pages_parquet --http-meta /data/http_meta_parquet \\
        --store /data/crawl_store --exclude '\\.pdf$' --retries 1

The spark-submit-provided master flows through (session.build_session
honors a pre-set spark.master); tests/test_spark_submit.py runs this
end-to-end with the package imported from the zip.

or plain ``python -m node_crawler_spark.cli``. Prints per-round
metrics (the reference's --status-codes / --page counters) and a final
JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys

from node_crawler_spark.config import CrawlConfig, PolitenessRule


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="node-crawler-spark")
    ap.add_argument("--seeds", nargs="+", default=[],
                    help="seed urls (queue order)")
    ap.add_argument("--seeds-from-sitemaps", action="store_true",
                    help="also seed from sitemaps discovered in the page "
                    "store (robots.txt Sitemap: declarations + "
                    "/sitemap.xml, <sitemapindex> followed); sitemap "
                    "entries pass the normal queue gates like any seed")
    ap.add_argument("--seeds-changed", action="store_true",
                    help="also seed every url whose two latest page-store "
                    "snapshots differ (content-change re-crawl); changed "
                    "urls pass the normal queue gates like any seed")
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument("--http-meta", help="http_meta table path (parquet)")
    ap.add_argument(
        "--warc",
        help="crawl straight off a WARC archive (.warc/.warc.gz file, "
        "directory or glob) — derives pages + http_meta from the "
        "response records instead of --pages/--http-meta",
    )
    ap.add_argument(
        "--export-warc",
        help="after the crawl, archive the VISITED slice of the page "
        "store (seen-set semi-join) as part-WARCs + CDX sidecars "
        "into this directory",
    )
    ap.add_argument(
        "--export-wet",
        help="after the crawl, shard the VISITED pages' extracted text "
        "as WET archives (WARC conversion records, Common Crawl "
        "layout) into this directory",
    )
    ap.add_argument(
        "--export-wat",
        help="after the crawl, shard the VISITED pages' outlink graph "
        "as WAT archives (WARC metadata records with JSON link "
        "envelopes, Common Crawl layout) into this directory",
    )
    ap.add_argument(
        "--export-anchors",
        help="after the crawl, write the per-target anchor-text rollup "
        "(n_refs, n_sources, capped distinct texts) over the VISITED "
        "slice of the page store as parquet into this directory",
    )
    ap.add_argument(
        "--report",
        help="after the crawl, write the per-domain operations report "
        "(seen/crawled/errors/redirects/last round) as parquet into "
        "this directory",
    )
    ap.add_argument("--store",
                    help="snapshot-store root (checkpoints); required "
                    "unless --curate")
    ap.add_argument("--resume", action="store_true", help="resume from last committed round")
    ap.add_argument("--crawl-external", action="store_true")
    ap.add_argument("--exclude", action="append", default=[], help="exclude regex (repeatable)")
    ap.add_argument("--retries", type=int, default=0)
    ap.add_argument("--auth", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=1000)
    ap.add_argument("--budget", action="append", default=[],
                    help="politeness domain=budget[:delay_ms] (repeatable; "
                         "budget 0 = unlimited, delay-only rule)")
    ap.add_argument("--robots", action="append", default=[],
                    help="robots rule domain=/pattern (RFC 9309: '*' "
                         "wildcard, trailing '$' anchor; prefix the "
                         "pattern with '+' for an Allow rule; "
                         "repeatable)")
    ap.add_argument("--robots-from-store", action="store_true",
                    help="also derive rules from robots.txt snapshots "
                         "found in the page store")
    ap.add_argument("--robots-delay-from-store", action="store_true",
                    help="honor Crawl-delay from robots.txt snapshots in "
                         "the page store (delay-only politeness rules; "
                         "explicit --budget rules win)")
    ap.add_argument("--error-backoff", action="store_true",
                    help="a domain with errors last round runs this "
                         "round at half its budget (min 1); a clean "
                         "round restores it")
    ap.add_argument("--priority", choices=["fifo", "dfs"], default="fifo",
                    help="within-domain scheduling priority (O4)")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="fold seen deltas into the bucketed base every N rounds")
    ap.add_argument("--probe-from-store", action="store_true",
                    help="bucket-pruned cold seen probe from the store")
    ap.add_argument(
        "--ranks-from-store",
        help="previous crawl's store root: PageRank its crawled link "
        "graph and schedule THIS crawl's budgeted slots by rank "
        "(sets priority=rank; the re-crawl loop)",
    )
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"],
                    default="bloom",
                    help="approximate-membership structure for the seen "
                    "prefilter (cuckoo = deletion-capable fingerprints)")
    ap.add_argument("--no-bloom", action="store_true",
                    help="disable the bloom seen prefilter")
    ap.add_argument(
        "--curate",
        help="standalone curation mode (no crawl): directory holding a "
        "documents.parquet table; runs the full training-data curation "
        "pipeline (language-ID + token floor + repetition gate + exact "
        "and MinHash near-dup keepers + decontamination) and writes "
        "per-document gate verdicts + the keep decision",
    )
    ap.add_argument("--curate-out",
                    help="output parquet dir for --curate")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    return ap


def config_from_args(args) -> CrawlConfig:
    politeness = []
    for spec in args.budget:
        domain, _, rest = spec.partition("=")
        budget, _, delay = rest.partition(":")
        politeness.append(
            PolitenessRule(
                domain=domain,
                budget=int(budget),
                crawl_delay_ms=int(delay) if delay else 0,
            )
        )
    robots = []
    for spec in args.robots:
        domain, _, pattern = spec.partition("=")
        if pattern.startswith("+"):
            robots.append((domain, pattern[1:], True))
        else:
            robots.append((domain, pattern, False))
    return CrawlConfig(
        crawl_external=args.crawl_external,
        exclude_patterns=tuple(args.exclude),
        retries=args.retries,
        auth=args.auth,
        max_rounds=args.max_rounds,
        politeness=tuple(politeness),
        robots=tuple(robots),
        priority=args.priority,
        error_backoff=args.error_backoff,
        compact_every=args.compact_every,
        probe_from_store=args.probe_from_store,
        use_bloom_prefilter=not args.no_bloom,
        seen_filter=args.seen_filter,
    )


def _curate_main(args) -> int:
    """Standalone curation over a documents table — the training-data
    half of the engine behind one flag, no crawl required. The
    directory contract matches the query registry's (documents.parquet
    inside), so the pipeline is byte-for-byte the oracle-checked
    ``pipeline_curate``."""
    from pyspark.sql import SparkSession

    from node_crawler_spark.queries import pipeline_curate
    from node_crawler_spark.session import build_session

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(
        app_name="node-crawler-spark-curate",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    verdicts = pipeline_curate(spark, args.curate)
    verdicts.write.mode("overwrite").parquet(args.curate_out)
    out = spark.read.parquet(args.curate_out)
    summary = {
        "curated": args.curate,
        "out": args.curate_out,
        "docs": out.count(),
        "kept": out.where("keep").count(),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def main(argv=None) -> int:
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.curate:
        if not args.curate_out:
            parser.error("--curate requires --curate-out")
        return _curate_main(args)
    if not args.store:
        parser.error("--store is required for a crawl")
    if not args.warc and not (args.pages and args.http_meta):
        parser.error("either --warc or both --pages and --http-meta required")
    if not args.seeds and not args.seeds_from_sitemaps and not args.seeds_changed:
        parser.error(
            "--seeds, --seeds-from-sitemaps and/or --seeds-changed required"
        )
    cfg = config_from_args(args)

    from pyspark.sql import SparkSession

    from node_crawler_spark.plans.driver import run_crawl
    from node_crawler_spark.session import build_session

    # getOrCreate may hand us a pre-existing session (embedded use /
    # tests) — only stop what we started
    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(
        app_name="node-crawler-spark",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    if args.warc:
        from node_crawler_spark.sources.warc import read_warc, warc_tables

        pages, http_meta = warc_tables(read_warc(spark, args.warc))
    else:
        pages = spark.read.parquet(args.pages)
        http_meta = spark.read.parquet(args.http_meta)

    if args.robots_from_store:
        import dataclasses

        from node_crawler_spark.operators.robots import (
            robots_rules_from_pages,
            rules_tuples,
        )

        derived = rules_tuples(robots_rules_from_pages(pages))
        cfg = dataclasses.replace(cfg, robots=cfg.robots + derived)

    if args.robots_delay_from_store:
        from node_crawler_spark.operators.robots import (
            delay_tuples,
            merge_robots_delays,
            robots_delays_from_pages,
        )

        cfg = merge_robots_delays(cfg, delay_tuples(robots_delays_from_pages(pages)))

    seeds = list(args.seeds)
    if args.seeds_from_sitemaps:
        from node_crawler_spark.operators.sitemaps import (
            seed_tuples,
            seeds_from_sitemaps,
        )

        have = set(seeds)
        seeds += [
            u
            for u in seed_tuples(seeds_from_sitemaps(pages))
            if u not in have
        ]

    if args.seeds_changed:
        from node_crawler_spark.operators.churn import (
            changed_tuples,
            changed_urls,
        )

        have = set(seeds)
        seeds += [
            u for u in changed_tuples(changed_urls(pages)) if u not in have
        ]

    priority_ranks = None
    if args.ranks_from_store:
        import dataclasses

        from node_crawler_spark.operators.linkgraph import link_edges, pagerank

        prev_crawled = spark.read.parquet(
            f"{args.ranks_from_store}/rounds/r=*/crawled"
        )
        priority_ranks = pagerank(link_edges(prev_crawled), iters=10)
        cfg = dataclasses.replace(cfg, priority="rank")

    res = run_crawl(
        spark, cfg, pages, http_meta, seeds, args.store,
        resume=args.resume, priority_ranks=priority_ranks,
    )

    per_round = []
    for r in range(res.rounds + 1):
        try:
            m = res.store.read_manifest(r)
        except FileNotFoundError:
            continue
        row = {"round": r}
        for t, entry in m.get("tables", {}).items():
            if "rows" in entry:
                row[t] = entry["rows"]
        per_round.append(row)
        print(f"round {r}: " + " ".join(f"{k}={v}" for k, v in row.items() if k != "round"),
              file=sys.stderr)

    summary = {
        "rounds": res.rounds,
        "urls_seen": res.max_seq,
        "store": args.store,
        "per_round": per_round,
    }

    if args.export_warc:
        from node_crawler_spark.sources.warc import export_warc

        seen_urls = res.seen(spark).select("url")
        manifest = export_warc(
            pages.join(seen_urls, "url", "left_semi"),
            http_meta.join(seen_urls, "url", "left_semi"),
            args.export_warc,
        ).collect()
        summary["exported_warc"] = {
            "dir": args.export_warc,
            "files": len(manifest),
            "records": sum(m.n_records for m in manifest),
        }
    if args.export_wet:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from node_crawler_spark.sources.warc import export_wet

        w = Window.partitionBy("url").orderBy(
            F.col("warc_ts").desc_nulls_last()
        )
        latest_ts = (
            pages.select("url", "warc_ts")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        docs = (
            res.crawled(spark)
            .select("url", "text")
            .join(latest_ts, "url", "left")
            .select(
                "url",
                F.coalesce(
                    "warc_ts", F.to_timestamp(F.lit("1970-01-01"))
                ).alias("warc_ts"),
                "text",
            )
        )
        wet_manifest = export_wet(docs, args.export_wet).collect()
        summary["exported_wet"] = {
            "dir": args.export_wet,
            "files": len(wet_manifest),
            "records": sum(m.n_records for m in wet_manifest),
        }
    if args.export_wat:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from node_crawler_spark.sources.warc import export_wat

        w = Window.partitionBy("url").orderBy(
            F.col("warc_ts").desc_nulls_last()
        )
        latest_ts = (
            pages.select("url", "warc_ts")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        graph = (
            res.crawled(spark)
            .select("url", "links")
            .join(latest_ts, "url", "left")
            .select(
                "url",
                F.coalesce(
                    "warc_ts", F.to_timestamp(F.lit("1970-01-01"))
                ).alias("warc_ts"),
                "links",
            )
        )
        wat_manifest = export_wat(graph, args.export_wat).collect()
        summary["exported_wat"] = {
            "dir": args.export_wat,
            "files": len(wat_manifest),
            "records": sum(m.n_records for m in wat_manifest),
        }

    if args.export_anchors:
        from node_crawler_spark.operators.anchortext import anchor_texts

        seen_urls = res.seen(spark).select("url")
        rollup = anchor_texts(
            pages.join(seen_urls, "url", "left_semi")
        ).join(seen_urls, "url", "left_semi")
        rollup.write.mode("overwrite").parquet(args.export_anchors)
        summary["exported_anchors"] = {
            "dir": args.export_anchors,
            "targets": spark.read.parquet(args.export_anchors).count(),
        }
    if args.report:
        res.report(spark).write.mode("overwrite").parquet(args.report)
        summary["report"] = {
            "dir": args.report,
            "domains": spark.read.parquet(args.report).count(),
        }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
