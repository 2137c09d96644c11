"""Regression guard for the round-4 oracle determinism discipline.

Cross-engine decimal rounding of binary doubles (`ROUND(x, k)` /
`F.round(x, k)` with k ≥ 1) is the ONLY construct the driver's
CORRECTNESS gate ever disagreed with the local replica on (r2: four
DECIMAL-rendering rows; r3: two ROUND-of-ratio rows — all rows/schema
green, hash red). Round 4 removed it from every output and ORDER BY
key of every registry entry that has not already proven ROUND-safe in
the driver environment, replacing it with exact BIGINT floor-divisions
(`a * 10^k div b`) or `floor(x * 10^k)` over bit-exact IEEE doubles.

This test freezes that state: any NEW query (or edit to a
not-driver-proven one) that reintroduces a scale>=1 round on either
engine fails here, before it can fail in the driver. Rounding to an
integer (scale 0, e.g. the w_running_totals cents snap of a 2-decimal
quantity, which never sits on a .5 boundary) stays allowed.

The allowlist below is EXACTLY the set of registry entries that carry
a hash-green row in CORRECTNESS_r01/r02/r03.json while still using
ROUND — grandfathered because the driver itself proved their values
round identically there. Do not add to it without a green driver row.
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from node_crawler_spark import queries as qmod

# Driver-proven ROUND-safe (hash-green CORRECTNESS rows r1-r3).
DRIVER_PROVEN_ROUND_SAFE = {
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_supplier_rollup",
    "p_part_type_stats",
    "o_domain_budget",
    "t_quality_score",
    "t_repetition_filter",
    "sim_cosine_topk",
    "sim_label_centroid_norm",
    "dedup_embedding_cosine",
    "sim_ann_lsh_pairs",
    "sim_ann_lsh_recall",
    "sim_ann_ivf_topk",
    "sim_ann_ivf_recall",
    "w_event_hourly",
    "a_rollup_counts",
    "w_value_delta",
    "t_length_quantiles",
    "t_blocklist_wash",
    "t_tfidf_topterms",
    "w_funnel",
    "dedup_semantic",
    "w_retention_cohorts",
    # hash-green in CORRECTNESS_r03 with ROUND(...,6) in its oracle;
    # invisible to the pre-r4 regex (nested parens), caught by the
    # paren-matching scanner.
    "pipeline_curate",
}

# Call-open markers; the scale argument is extracted by a real
# paren-matching scan (_scaled_round) — a bounded regex over the
# argument list cannot traverse arbitrarily nested parentheses (e.g.
# `F.round(F.abs(a - F.col("b")) / n, 4)`), which is exactly the form
# the r3 hash failures used.
_SPARK_ROUND_OPEN = re.compile(r"F\.round\s*\(")
_SQL_ROUND_OPEN = re.compile(r"(?i)\bround\s*\(")


def _scaled_round(text: str, opener: re.Pattern) -> bool:
    """True iff any ROUND(...) call in ``text`` carries a scale
    argument other than a literal 0 (scale omitted == 0 == allowed).

    Walks the argument list with a parenthesis-depth counter (skipping
    quoted strings), so nesting depth in the first argument is
    irrelevant — the last TOP-LEVEL comma-separated argument is the
    scale whenever at least one top-level comma exists."""
    for m in opener.finditer(text):
        i, depth = m.end(), 1
        last_arg_start, saw_comma, scale = i, False, None
        while i < len(text) and depth:
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and saw_comma:
                    scale = text[last_arg_start:i]
            elif c == "," and depth == 1:
                saw_comma, last_arg_start = True, i + 1
            elif c in "'\"":
                q = c
                i += 1
                while i < len(text) and text[i] != q:
                    i += 1
            i += 1
        if scale is not None and scale.strip() != "0":
            return True
    return False


def _function_sources() -> dict[str, str]:
    src = open(qmod.__file__.replace(".pyc", ".py")).read()
    tree = ast.parse(src)
    lines = src.split("\n")
    return {
        n.name: "\n".join(lines[n.lineno - 1 : n.end_lineno])
        for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef)
    }


def test_no_new_spark_round_outside_proven_set():
    funcs = _function_sources()
    queries = entrymod.queries()
    offenders = []
    for name, fn in queries.items():
        if name in DRIVER_PROVEN_ROUND_SAFE:
            continue
        body = funcs.get(getattr(fn, "__name__", ""), "")
        if _scaled_round(body, _SPARK_ROUND_OPEN):
            offenders.append(name)
    assert offenders == [], (
        f"F.round(x, k>=1) reintroduced in not-driver-proven queries "
        f"{offenders} — use exact BIGINT div / floor(x * 10^k) instead "
        f"(see README 'Oracle determinism discipline')"
    )


def test_no_new_sql_round_outside_proven_set():
    oracles = entrymod.oracle_sql()
    offenders = []
    for name, sql in oracles.items():
        if name in DRIVER_PROVEN_ROUND_SAFE:
            continue
        if _scaled_round(sql, _SQL_ROUND_OPEN):
            offenders.append(name)
    assert offenders == [], (
        f"ROUND(x, k>=1) reintroduced in not-driver-proven oracles "
        f"{offenders} — mirror the Spark side's integer/floored form"
    )


def test_scanner_catches_nested_forms():
    """The detector must traverse arbitrarily nested first arguments —
    the r3 hash-failing forms themselves — and must still allow
    scale-0 snaps and scale-omitted calls."""
    flagged = [
        'F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4)',
        'ROUND(ABS(x - f(y)) / n, 4)',
        'ROUND(SUM(CASE WHEN f(x) THEN 1 END) / c, 4)',
        "F.round(F.col('a'), 2)",
        "round(x / y, 6)",
    ]
    allowed = [
        "F.round(F.abs(a - b) * 100, 0)",
        "ROUND(SUM(CASE WHEN f(x) THEN 1 END) / c, 0)",
        "ROUND(x / y)",
        "F.round(expr)",
        "x_round(a, 4)",  # not a ROUND call (SQL \\b guard)
    ]
    for s in flagged:
        opener = _SPARK_ROUND_OPEN if s.startswith("F.") else _SQL_ROUND_OPEN
        assert _scaled_round(s, opener), f"missed: {s}"
    for s in allowed:
        opener = _SPARK_ROUND_OPEN if s.startswith("F.") else _SQL_ROUND_OPEN
        assert not _scaled_round(s, opener), f"false positive: {s}"


def test_allowlist_matches_registry():
    """Every allowlisted name must still exist (catches renames that
    would silently widen the lint's blind spot)."""
    missing = DRIVER_PROVEN_ROUND_SAFE - set(entrymod.queries())
    assert missing == set(), f"allowlisted but gone from registry: {missing}"
