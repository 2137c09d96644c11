"""Document-frequency cap for shingle inverted-index joins (VERDICT r2
item 2 / task 3): a boilerplate shingle shared by most documents must
not quadratically explode the candidate join, and true near-dup pairs
with any non-hot shared shingle must still surface with their TRUE
jaccard (rerank runs over full shingle sets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_crawler_spark.queries import (
    SHINGLE_DF_CAP,
    _exact_jaccard,
    ngram_jaccard_pairs,
)

BOILER = "all rights reserved contact us privacy policy terms of service apply"
N_BOILER = 120  # > SHINGLE_DF_CAP, every shingle hot


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    """documents.parquet where 120 docs are identical boilerplate and
    two docs are true near-dups with unique content."""
    rows = [(i, BOILER, "en", "web", len(BOILER)) for i in range(N_BOILER)]
    a = "zeta quark nebula vortex lattice prism echo cinder umbra glyph"
    b = "zeta quark nebula vortex lattice prism echo cinder umbra motif"
    rows += [(1000, a, "en", "web", len(a)), (1001, b, "en", "web", len(b))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("advdocs")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _bigram_shingles(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 2)
    return w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("shingle"),
    ).distinct()


def test_uncapped_join_explodes_capped_join_does_not(spark, adv_dir):
    sh = _bigram_shingles(spark, adv_dir)

    def n_candidates(df_cap):
        cand = sh
        if df_cap is not None:
            low = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") <= df_cap)
                .select("shingle")
            )
            cand = sh.join(low, "shingle", "left_semi")
        return (
            cand.alias("a")
            .join(
                cand.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )

    uncapped = n_candidates(None)
    capped = n_candidates(SHINGLE_DF_CAP)
    # the boilerplate cluster alone is C(120,2) = 7140 pairs uncapped
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2
    # capped: only the unique-content near-dup pair survives discovery
    assert capped == 1


def test_true_near_dup_found_with_true_jaccard(spark, adv_dir):
    out = {
        (r.doc_a, r.doc_b): r.jaccard_ppm
        for r in ngram_jaccard_pairs(spark, adv_dir).collect()
    }
    # 9 bigrams each, 8 shared ⇒ jaccard 8/10 = 0.8 — TRUE value,
    # computed over the full shingle sets (not the capped subset)
    assert out == {(1000, 1001): 800000}


def test_rerank_counts_hot_shingles_too(spark, adv_dir):
    """A pair discovered via a low-df shingle gets credit for hot
    shared shingles in its jaccard: add the boilerplate to both
    near-dup docs; their jaccard must count those shingles."""
    sh = _bigram_shingles(spark, adv_dir)
    # synthesize: docs 1000/1001 also share the (hot) boilerplate bigrams
    boiler_sh = (
        sh.where(F.col("doc_id") == 0)
        .select("shingle")
        .crossJoin(spark.createDataFrame([(1000,), (1001,)], "doc_id long"))
        .select("doc_id", "shingle")
    )
    sh2 = sh.unionByName(boiler_sh).distinct()
    res = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard_ppm)
        for r in _exact_jaccard(sh2, None, df_cap=SHINGLE_DF_CAP)
        .where((F.col("doc_a") == 1000) & (F.col("doc_b") == 1001))
        .collect()
    }
    n_common, jac = res[(1000, 1001)]
    # 8 unique shared bigrams + 10 boilerplate bigrams (11 words); no
    # stitch bigrams (we unioned shingle sets, not texts): shared =
    # 18, sizes = 19 each ⇒ union = 20 ⇒ j = 0.9 — hot shingles DO
    # count in the rerank
    assert n_common == 18
    assert jac == 900000
