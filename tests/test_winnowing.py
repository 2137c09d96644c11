"""Winnowing's defining guarantee (Schleimer et al. 2003, Thm 1): any
run of ≥ w+k−1 shared tokens yields at least one SHARED fingerprint —
the property that makes it a partial-overlap detector rather than a
whole-document hash. The oracle gate proves cross-engine equality of
the fingerprint streams; this pins the semantic guarantee itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_crawler_spark.queries import WN_K, WN_W, t_winnowing

_GUARANTEE = WN_W + WN_K - 1  # 6 tokens


def _docs(spark, tmp_path):
    shared = "a3 a4 a5 a6 a7 a8"  # exactly w+k-1 = 6 tokens
    rows = [
        (1, f"a1 a2 {shared} a9 a10"),
        (2, f"z1 z2 {shared} z3 z4"),   # same run, different context
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
        (4, f"a1 a2 {shared} a9 a10"),  # byte-identical to doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return df


def _fp_sets(df):
    sel = (
        df.select(
            "doc_id", F.expr("split(lower(trim(text)), '\\\\s+')").alias("w")
        )
        .where(F.size("w") >= WN_K + WN_W - 1)
        .withColumn(
            "hs",
            F.expr(
                f"transform(transform(sequence(0, size(w) - {WN_K}), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])), "
                "g -> CAST(conv(substring(md5(concat('wn:', g)), 1, 15), "
                "16, 10) AS BIGINT))"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(1, size(hs) - {WN_W - 1}), "
                f"i -> array_min(slice(hs, i, {WN_W}))))"
            ).alias("fps"),
        )
    )
    return {r.doc_id: set(r.fps) for r in sel.collect()}


def test_shared_run_guarantees_shared_fingerprint(spark, tmp_path):
    df = _docs(spark, tmp_path)
    fps = _fp_sets(df)
    assert fps[1] & fps[2], "w+k-1 shared tokens must share a fingerprint"
    assert not fps[1] & fps[3]
    assert not fps[2] & fps[3]
    assert fps[1] == fps[4]  # identical text => identical fingerprint set


def test_winnowing_query_is_deterministic_per_text(spark, tmp_path):
    _docs(spark, tmp_path)
    out = {r.doc_id: r for r in t_winnowing(spark, str(tmp_path)).collect()}
    assert out[1].fp_md5 == out[4].fp_md5
    assert out[1].n_windows == out[4].n_windows
    assert out[1].fp_md5 != out[3].fp_md5
    for r in out.values():
        assert 0 < r.n_fp <= r.n_windows
        assert 0 < r.density_ppm <= 1_000_000
