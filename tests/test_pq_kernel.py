"""The Arrow PQ-assignment kernel must equal the literal-expression
argmin tree row-for-row (same codes, incl. ties → min code): the
kernel is the hot path (no ~10 s/use Catalyst constant), the literal
tree is the no-Python reference implementation, and the DuckDB oracle
pins both to ROW_NUMBER ... ORDER BY d, code."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_crawler_spark.queries import (
    _ivf_v,
    _pq_assign_expr,
    _pq_assign_udf,
    _pq_codebook,
    _pq_sub,
)

SF_DIR = "/root/testdata/sf0.001"


def test_arrow_assign_equals_literal_tree(spark):
    v = _ivf_v(spark, SF_DIR)
    sub = _pq_sub(v).localCheckpoint()
    rows = sorted(
        _pq_codebook(sub).collect(), key=lambda r: (r.m, r.code)
    )
    both = sub.select(
        "vec_id",
        "m",
        _pq_assign_expr(rows).alias("code_lit"),
        _pq_assign_udf(rows)(F.col("m"), F.col("sv")).alias("code_arrow"),
    )
    n = both.count()
    assert n > 0
    mismatches = both.where(F.col("code_lit") != F.col("code_arrow")).count()
    assert mismatches == 0
    # every subspace actually uses several codewords (a degenerate
    # all-one-code assignment would make the equality vacuous)
    n_codes = (
        both.groupBy("m")
        .agg(F.countDistinct("code_arrow").alias("k"))
        .agg(F.min("k"))
        .collect()[0][0]
    )
    assert n_codes >= 2


def test_arrow_assign_tie_breaks_to_min_code(spark):
    # two IDENTICAL codewords in one subspace: the argmin must pick the
    # smaller code, matching ORDER BY d, code
    from collections import namedtuple

    R = namedtuple("R", "m code cw")
    cb = [R(0, 3, [1.0, 0.0]), R(0, 7, [1.0, 0.0]), R(0, 9, [5.0, 5.0])]
    df = spark.createDataFrame(
        [(1, 0, [1.1, 0.1]), (2, 0, [4.9, 4.9])],
        "vec_id int, m int, sv array<double>",
    )
    got = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id", _pq_assign_udf(cb)(F.col("m"), F.col("sv")).alias("code")
        ).collect()
    }
    assert got == {1: 3, 2: 9}
