"""North-rule packaging proof: the crawl runs under REAL
``spark-submit --py-files nc_spark.zip`` (north_rule: "run via
spark-submit --py-files on a multi-executor cluster"), with the
package imported from the zip — not the repo checkout — and the
spark-submit-provided ``--master`` flowing through to the session.

The subprocess runs from an empty cwd with PYTHONPATH scrubbed, so the
only way ``import node_crawler_spark`` can resolve is the zip shipped
via ``--py-files``; the result is pinned to the sequential reference
simulator, same as every golden.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

from node_crawler_spark.sources.fixtures import scenario
from tests.reference_sim import simulate

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_pyfiles_zip(dest: Path) -> Path:
    """The deploy artifact: every .py in the package, repo-relative, so
    the zip root exposes ``node_crawler_spark/`` for import."""
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "node_crawler_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    return dest


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    s = scenario("relative_links")  # default CrawlConfig == CLI defaults
    pages, http = s.dfs(spark)
    pages_dir = str(tmp_path / "pages")
    http_dir = str(tmp_path / "http")
    pages.write.parquet(pages_dir)
    http.write.parquet(http_dir)

    zip_path = build_pyfiles_zip(tmp_path / "nc_spark.zip")
    # copy the launcher out of the repo: spark-submit puts the primary
    # resource's directory on sys.path, so running it in place would
    # let the import fall back to the checkout
    launcher = tmp_path / "submit_crawl.py"
    shutil.copy(REPO / "scripts" / "submit_crawl.py", launcher)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(launcher),
            "--seeds", *s.seeds,
            "--pages", pages_dir,
            "--http-meta", http_dir,
            "--store", str(tmp_path / "store"),
            "--shuffle-partitions", "4",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    assert summary["urls_seen"] == len(sim.seen)
    assert summary["rounds"] >= 1
    # per-round metrics carry the counted table (seen_delta) and they
    # sum to the oracle's seen set
    assert sum(r.get("seen_delta", 0) for r in summary["per_round"]) == len(
        sim.seen
    )
    # the store the submitted job committed is readable back here, and
    # its crawled sink matches the oracle's onPageCrawl urls
    crawled_urls = set()
    for rd in sorted((tmp_path / "store" / "rounds").glob("r=*/crawled")):
        crawled_urls |= {
            r.queued_url
            for r in spark.read.parquet(str(rd)).select("queued_url").collect()
        }
    assert crawled_urls == {c["queued_url"] for c in sim.crawled}
