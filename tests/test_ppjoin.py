"""Prefix-filtered similarity join (queries.py::d_prefix_filter_pairs):
the prefix principle is LOSSLESS at the threshold — unlike the
SHINGLE_DF_CAP approximation — and the prefix index is materially
smaller than the full inverted index. Both properties checked against
brute-force truth in DuckDB (no sampling, exact set equality)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_crawler_spark.queries import (
    D_PPJOIN_SQL,
    MH_JACCARD_PPM,
    _SHINGLES_CTE,
)

BRUTE_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM shingles a JOIN shingles b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
          FROM cand p
          JOIN shingles sa ON sa.doc_id = p.doc_a
          JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
          GROUP BY p.doc_a, p.doc_b)
SELECT doc_a, doc_b,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) AS jaccard_ppm
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common)
        >= {MH_JACCARD_PPM}
ORDER BY doc_a, doc_b
"""

INDEX_SIZES_SQL = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
ranked AS (
  SELECT s.doc_id, s.shingle, z.n_sh,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY d.df, s.shingle) AS r
  FROM shingles s JOIN dfreq d USING (shingle) JOIN sizes z USING (doc_id))
SELECT COUNT(*) AS full_postings,
       SUM(CASE WHEN r <= n_sh - ((n_sh + 1) // 2) + 1 THEN 1 ELSE 0 END)
         AS prefix_postings
FROM ranked
"""


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_prefix_filter_is_lossless(sf_dir):
    """PPJoin output == brute-force all-pairs truth at t=0.5 — the
    prefix filter admits every qualifying pair (and the rerank keeps
    nothing below threshold, so the sets are EQUAL, not just ⊇)."""
    con = _con(sf_dir)
    ppj = con.execute(D_PPJOIN_SQL).fetchall()
    brute = con.execute(BRUTE_SQL).fetchall()
    assert ppj == brute
    assert len(brute) > 0, "corpus has no near-dup pairs — test vacuous"


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_prefix_index_materially_smaller(sf_dir):
    """The indexed postings are ≈ (1−t) of the full inverted index —
    the scale win that makes the candidate join affordable."""
    con = _con(sf_dir)
    full, prefix = con.execute(INDEX_SIZES_SQL).fetchone()
    assert prefix < full
    # t = 0.5 ⇒ per-doc prefix is n − ⌈n/2⌉ + 1 ≤ n/2 + 1
    assert prefix <= full * 0.5 + con.execute(
        "SELECT COUNT(*) FROM documents"
    ).fetchone()[0]
