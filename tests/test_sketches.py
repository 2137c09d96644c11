"""Sketch-family properties the DuckDB oracle cannot falsify.

The oracle gate proves each sketch query computes the same answer as
an independent SQL engine on ONE fixed file layout. What it cannot
prove is the property that makes a sketch usable at 100 TB: the
estimate must be a pure function of the SET of inputs — independent
of file order, file count, and partitioning — because on a cluster
the map-side partial states are merged in nondeterministic order.
A float-accumulating or order-sensitive "sketch" passes the oracle
and fails here.

So: rewrite documents.parquet scrambled (rows reordered by a hash,
split across 7 files instead of 1) and assert every sketch query
returns BIT-IDENTICAL rows vs the canonical layout. Plus a semantic
bound the oracle also can't see: the histogram quantile estimate is
within one bucket width of the exact quantile by construction.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_crawler_spark.queries import (  # noqa: E402
    HISTQ_WIDTH,
    QUERIES,
)

SF = "/root/testdata/sf0.001"
SKETCHES = ["sk_hll_distinct", "sk_cms_heavy", "sk_kmv_distinct", "sk_hist_quantiles"]


@pytest.fixture(scope="module")
def scrambled_sf(spark, tmp_path_factory):
    """sf0.001 with documents.parquet re-laid-out: rows reordered by
    xxhash64(doc_id), 7 files instead of 1; other tables copied as-is."""
    root = tmp_path_factory.mktemp("scrambled_sf")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SF}/{t}.parquet"
        dst = str(root / f"{t}.parquet")
        if t == "documents":
            df = spark.read.parquet(src)
            (
                df.selectExpr("*", "xxhash64(doc_id) AS _k")
                .orderBy("_k")
                .drop("_k")
                .repartition(7)
                .write.parquet(dst)
            )
        else:
            shutil.copy(src, dst)
    return str(root)


@pytest.mark.parametrize("name", SKETCHES)
def test_sketch_is_layout_invariant(spark, scrambled_sf, name):
    q = QUERIES[name]
    base = [tuple(r) for r in q(spark, SF).collect()]
    scr = [tuple(r) for r in q(spark, scrambled_sf).collect()]
    assert base == scr
    assert len(base) > 0


def test_pq_is_layout_invariant(spark, tmp_path):
    """The PQ training chain is deterministic BY DESIGN (sorted
    codebook collects, decimal-exact means, integer ADC sums); this
    falsifies it: scramble embeddings.parquet's row order and file
    count and require bit-identical top-10 + recall rows."""
    root = tmp_path / "sf"
    root.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SF}/{t}.parquet"
        dst = str(root / f"{t}.parquet")
        if t == "embeddings":
            (
                spark.read.parquet(src)
                .selectExpr("*", "xxhash64(vec_id) AS _k")
                .orderBy("_k")
                .drop("_k")
                .repartition(5)
                .write.parquet(dst)
            )
        else:
            shutil.copy(src, dst)
    for name in ("sim_ann_pq_topk", "sim_ann_pq_recall"):
        base = [tuple(r) for r in QUERIES[name](spark, SF).collect()]
        scr = [tuple(r) for r in QUERIES[name](spark, str(root)).collect()]
        assert base == scr
        assert len(base) > 0


def test_hist_quantile_within_one_bucket_width(spark):
    rows = {
        r["lang"]: r for r in QUERIES["sk_hist_quantiles"](spark, SF).collect()
    }
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT lang, quantile_disc(n_chars, 0.50) AS p50, "
        f"quantile_disc(n_chars, 0.90) AS p90, "
        f"quantile_disc(n_chars, 0.99) AS p99 "
        f"FROM '{SF}/documents.parquet' GROUP BY lang"
    ).fetchall()
    assert exact
    for lang, p50, p90, p99 in exact:
        r = rows[lang]
        for est, true in (
            (r["p50_est"], p50),
            (r["p90_est"], p90),
            (r["p99_est"], p99),
        ):
            # estimate = upper edge of the covering bucket: true value
            # lies in (est - W, est]
            assert est - HISTQ_WIDTH < true <= est, (lang, est, true)
