"""Driver-contract query registry (SURVEY.md §2 → /root/testdata).

Each entry pairs a PySpark DataFrame builder with an ANSI-SQL oracle
that DuckDB runs on the same parquet — the driver's CORRECTNESS gate.
The crawl-shaped tables (pages/http_meta) don't exist in
/root/testdata, so the crawl operators appear here as their
*relational shapes* on the TPC-H-ish tables (filter / anti-join /
window-rank / first-wins dedup / budget-top-k / latest-snapshot …),
each docstring citing the SURVEY §2 row it stands for; their crawl
semantics proper are pinned by the golden scenario suite
(tests/test_crawl_scenarios.py) against the reference simulator.

The webtext / training-data operators (exact + MinHash/SimHash dedup,
token counting, quality scoring, language id, fingerprinting, cosine
similarity search) run on the ``documents`` / ``embeddings`` tables.

Cross-engine determinism rules (every query here follows them):
  * a total ORDER BY on every result (the driver's value hash is
    row-order-sensitive);
  * every computed column aliased identically on both sides;
  * money aggregates computed in exact decimal(18,2) but OUTPUT as
    ROUND(x,2) doubles — DECIMAL result columns proved sensitive to
    the driver environment's decimal rendering (r2: 4 hash fails that
    passed the strict local replica) while every double-output query
    passed both; green legacy rows that still emit decimal are left
    untouched;
  * decimal factors cast BEFORE multiplying (double-product rounding
    diverges between engines);
  * hash families built from md5 hex (portable: Spark ``conv(hex)``
    == DuckDB ``CAST('0x…' AS BIGINT)``) — so MinHash/SimHash/LSH
    bucket layouts are bit-identical across engines and fully
    oracle-checkable, not rows-only;
  * floating-point folds written in the same association order on
    both sides (Spark ``aggregate`` left fold == SQL left-assoc
    ``a*b + c*d + …``), making even pre-rounding doubles identical.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series'
                     # type hints against the defining module's globals

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Portable 60-bit hash (identical in Spark and DuckDB)
# ---------------------------------------------------------------------------

def _phash(col, salt: str):
    """60-bit integer hash from md5 hex — engine-portable.
    Spark: conv(substr(md5(s),1,15),16,10); DuckDB: '0x'||substr ⇒ BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def _phash_sql(expr: str, salt: str) -> str:
    return f"CAST('0x' || substr(md5('{salt}:' || ({expr})), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Aggregations / joins (A3, J1, O1 analogs) — TPC-H classics
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """A3 per-run counters analog: grouped aggregate with decimal-exact
    sums (TPC-H Q1 shape) on lineitem.

    Output discipline (round-3): the sums aggregate in exact
    decimal(18,2) but the RESULT columns are ROUND(x,2) doubles — the
    DECIMAL-rendering class diverged in the driver env despite passing
    the strict local gate, and every double-output query passes.  The
    shipdate filter compares against a DATE literal (not a timestamp
    string) so no session-timezone cast can shift row membership."""
    l = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2002-09-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2002-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    """J1 fetch-join analog: 3-way join + ranked top-k with a total
    tiebreak (TPC-H Q3 shape). Catalyst broadcasts the dimension side.

    Exact decimal arithmetic throughout: each factor is cast to
    decimal BEFORE multiplying (double→decimal cast of the *product*
    hits HALF_UP-vs-binary rounding divergence between engines), and
    the aggregate is pinned to decimal(18,2) on both sides."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(12,4)") - F.col("l_discount").cast("decimal(12,4)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("decimal(18,2)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 2)
            AS DECIMAL(18,2)) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_supplier_rollup(spark, sf_dir):
    """J1 dimension-chain analog on the remaining TPC-H dims: region ⋈
    nation ⋈ supplier rollup (both dim joins broadcast)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.countDistinct("n_name").alias("n_nations"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


Q5_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers, COUNT(DISTINCT n_name) AS n_nations,
       ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def p_part_type_stats(spark, sf_dir):
    """Projection/aggregate over part: per-type counts + pinned-decimal
    retail-price stats (completes table coverage of /root/testdata)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
            F.round(F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double"), 2).alias("total_price"),
        )
        .orderBy("p_type")
    )


P_PART_SQL = """
SELECT p_type, COUNT(*) AS n_parts,
       ROUND(MIN(p_retailprice), 2) AS min_price,
       ROUND(MAX(p_retailprice), 2) AS max_price,
       ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
FROM part
GROUP BY p_type
ORDER BY p_type
"""


# ---------------------------------------------------------------------------
# Filters / projections (F1-F5, P2, P6 analogs)
# ---------------------------------------------------------------------------

def f_filter_gates(spark, sf_dir):
    """F1/F3/F5 predicate-gate shape: multi-clause filter + count by
    kind (non-page-protocol / external / content-type gates)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.where(
            ~F.col("event_type").isin("error", "timeout")
            & (F.col("value") > 5.0)
            & (F.col("user_id") % 7 != 0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total_value"),
        )
        .orderBy("event_type")
    )


F_FILTER_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
FROM events
WHERE event_type NOT IN ('error','timeout') AND value > 5.0 AND user_id % 7 <> 0
GROUP BY event_type
ORDER BY event_type
"""


def f_exclude_rlike(spark, sf_dir):
    """F4 exclude-pattern gate: case-insensitive regex rejection
    (RegExp(p,'gi'), crawler.js:595-604)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(~F.col("text").rlike("(?i)hash\\s+join"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


F_EXCLUDE_SQL = """
SELECT lang, COUNT(*) AS kept, MIN(doc_id) AS first_doc
FROM documents
WHERE NOT regexp_matches(text, 'hash\\s+join', 'i')
GROUP BY lang
ORDER BY lang
"""


def p_mime_normalize(spark, sf_dir):
    """P6 content-type normalization: trim(regexp_replace(ct,';.*',''))
    (crawler.js:466-469), applied to a suffixed source tag."""
    d = _t(spark, sf_dir, "documents")
    tagged = d.withColumn(
        "tagged", F.concat("source", F.lit("; charset=utf-8"))
    )
    return (
        tagged.select(
            "doc_id",
            F.trim(F.regexp_replace("tagged", ";.*", "")).alias("mime"),
        )
        .groupBy("mime")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("mime")
    )


P_MIME_SQL = """
SELECT TRIM(REGEXP_REPLACE(source || '; charset=utf-8', ';.*', '')) AS mime,
       COUNT(*) AS n
FROM documents
GROUP BY 1
ORDER BY mime
"""


def p_fragment_strip(spark, sf_dir):
    """P2 fragment strip: url.replace(/#.*/,'') (crawler.js:66) on a
    synthesized url-shaped key."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.concat(F.lit("http://corpus.test/"), "source", F.lit("#sec"),
                     F.col("doc_id").cast("string")),
            "#.*", "",
        ).alias("fetch_url"),
    ).orderBy("doc_id")


P_FRAG_SQL = """
SELECT doc_id,
       REGEXP_REPLACE('http://corpus.test/' || source || '#sec' || CAST(doc_id AS VARCHAR),
                      '#.*', '') AS fetch_url
FROM documents
ORDER BY doc_id
"""


def s_status_prefix(spark, sf_dir):
    """The status-'30'-prefix redirect test (crawler.js:265-269) as a
    string-prefix classifier."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "is_redirectish",
            F.col("o_orderkey").cast("string").startswith("30"),
        )
        .groupBy("is_redirectish")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("is_redirectish")
    )


S_STATUS_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) LIKE '30%' AS is_redirectish, COUNT(*) AS n
FROM orders GROUP BY 1
ORDER BY is_redirectish
"""


# ---------------------------------------------------------------------------
# Dedup / set membership (D1-D4, J4) and joins (J1/J4)
# ---------------------------------------------------------------------------

def j_anti_join_seen(spark, sf_dir):
    """D1/J4 seen-set probe: left-anti join (customers that never
    ordered = frontier urls not in seen)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("never_seen"))
        .orderBy("c_mktsegment")
    )


J_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS never_seen
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def j_left_outer_fetch(spark, sf_dir):
    """J1 frontier×pages left join: misses are transport errors
    (orders with no lineitems)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    joined = o.join(l, o.o_orderkey == l.l_orderkey, "left")
    return (
        joined.groupBy(F.col("l_orderkey").isNull().alias("is_miss"))
        .agg(F.countDistinct("o_orderkey").alias("orders_n"))
        .orderBy("is_miss")
    )


J_LEFT_SQL = """
SELECT l.l_orderkey IS NULL AS is_miss, COUNT(DISTINCT o.o_orderkey) AS orders_n
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY is_miss
"""


def d_first_wins(spark, sf_dir):
    """D3 within-round first-wins dedup: row_number()==1 per key in
    deterministic (seq) order (crawler.js:484-488 landing dedup)."""
    l = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return (
        l.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey")
    )


D_FIRST_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate FROM (
  SELECT l_orderkey, l_linenumber, l_shipdate,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate, l_linenumber) AS rn
  FROM lineitem) WHERE rn = 1
ORDER BY l_orderkey
"""


def u_union_frontier(spark, sf_dir):
    """Frontier accumulation (crawler.js:607): union + distinct."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.union(b).distinct().agg(
        F.count(F.lit(1)).alias("frontier_size"),
        F.min("o_custkey").alias("min_key"),
        F.max("o_custkey").alias("max_key"),
    )


U_UNION_SQL = """
SELECT COUNT(*) AS frontier_size, MIN(o_custkey) AS min_key, MAX(o_custkey) AS max_key
FROM (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


# ---------------------------------------------------------------------------
# Ordering / budgets / snapshots (O1, J6, warc_ts)
# ---------------------------------------------------------------------------

def o_domain_budget(spark, sf_dir):
    """J6 per-domain politeness budget: FIFO top-3 per supplier
    (salted two-phase in the engine; plain window here)."""
    l = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        l.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("scheduled"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("sched_qty"),
        )
        .orderBy("l_suppkey")
    )


O_BUDGET_SQL = """
SELECT l_suppkey, COUNT(*) AS scheduled,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sched_qty
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
  FROM lineitem) WHERE rk <= 3
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


def o_global_seq(spark, sf_dir):
    """O1 global discovery rank: deterministic total order → dense seq
    (engine ranks (round, parent_seq, pos); here (regionkey, name))."""
    n = _t(spark, sf_dir, "nation")
    w = Window.orderBy("n_regionkey", "n_name")
    return (
        n.withColumn("seq", F.row_number().over(w))
        .select("seq", "n_name", "n_regionkey")
        .orderBy("seq")
    )


O_SEQ_SQL = """
SELECT ROW_NUMBER() OVER (ORDER BY n_regionkey, n_name) AS seq, n_name, n_regionkey
FROM nation
ORDER BY seq
"""


def a_latest_snapshot(spark, sf_dir):
    """Latest warc_ts snapshot per url (SURVEY §2.8 date handling):
    most recent event per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


A_LATEST_SQL = """
SELECT user_id, event_id, event_type FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Webtext / training-data operators (documents, embeddings)
# ---------------------------------------------------------------------------

def t_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) — per-doc exact ints."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), "\\s+")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
    ).orderBy("doc_id")


T_TOKENS_SQL = """
SELECT doc_id, LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
       LENGTH(text) AS len_chars
FROM documents
ORDER BY doc_id
"""


def t_quality_score(spark, sf_dir):
    """Quality scoring: stopword ratio + punctuation density, rounded
    to 4 decimals (deterministic across engines)."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim("text"), "\\s+"))
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
        F.lit(" (the|a|and|of|to|in) "),
    )
    punct = F.regexp_count(F.col("text"), F.lit("[.,!?;]"))
    return d.select(
        "doc_id",
        tokens.alias("n_tokens"),
        stop.alias("n_stopwords"),
        punct.alias("n_punct"),
        F.round(stop.cast("double") / tokens, 4).alias("stopword_ratio"),
    ).orderBy("doc_id")


T_QUALITY_SQL = """
SELECT doc_id,
       LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
       LEN(regexp_extract_all(' ' || text || ' ', ' (the|a|and|of|to|in) ')) AS n_stopwords,
       LEN(regexp_extract_all(text, '[.,!?;]')) AS n_punct,
       ROUND(CAST(LEN(regexp_extract_all(' ' || text || ' ', ' (the|a|and|of|to|in) ')) AS DOUBLE)
             / LEN(string_split_regex(TRIM(text), '\\s+')), 4) AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


GOPHER_STOPS = ("the", "a", "and", "of", "to", "in", "is", "it")


def t_filter_agreement(spark, sf_dir):
    """Quality-filter ENSEMBLE agreement (what Dolma/DCLM publish
    before compositing filters: if two quality signals reject the
    same documents they are redundant, if they disagree the union
    is stricter than either and the overlap table is the evidence):
    the Gopher rule verdict (t_gopher_rules' gopher_any, per doc)
    cross-tabulated against the unigram-surprisal LM verdict
    (t_zipf_surprisal's keep flag) — one row per (rule_keep, lm_keep)
    cell with counts and corpus share in exact BIGINT ppm. The
    off-diagonal cells are the interesting mass: docs one filter
    passes and the other kills.

    100 TB posture: each filter's per-doc verdict is its verified
    pipeline (two hash aggregates for the rules, one join + one
    aggregate for surprisal); the cross-tab is one join on doc_id +
    one 4-cell rollup + a 1-row totals crossJoin.

    Measured at sf0.01: lm_keep is True for every document (the
    ~30-word vocabulary cannot produce > 12 bits mean surprisal), so
    the ensemble is entirely rule-driven here — the matrix says
    "your LM filter is a no-op on this corpus", which is exactly the
    redundancy diagnosis the table exists to make."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    per = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("length(w) * cnt")).alias("chars"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.expr(f"if(w IN ({stops}), 1, 0)")).alias("n_stop"),
    )
    rule_keep = per.select(
        "doc_id",
        F.expr(
            "NOT (n < 50 OR n > 100000 "
            "OR chars * 100 div n < 300 OR chars * 100 div n > 1000 "
            "OR n_stop < 2 "
            "OR max_cnt * 1000000L div n > 100000)"
        ).alias("rule_keep"),
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("vcnt"))
    tot = vocab.agg(F.sum("vcnt").alias("total"))
    bits = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("total DIV vcnt"))) - F.lit(1))
            .cast("long")
            .alias("bits"),
        )
    )
    lm_keep = (
        bits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("bits").alias("sb"))
        .select(
            "doc_id",
            (
                F.expr("sb * 1000000L div n_tokens")
                <= F.lit(SURPRISAL_MAX_PPM)
            ).alias("lm_keep"),
        )
    )
    cells = rule_keep.join(lm_keep, "doc_id").groupBy(
        "rule_keep", "lm_keep"
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    total = cells.agg(F.sum("n_docs").alias("total_docs"))
    return (
        cells.crossJoin(total)
        .select(
            "rule_keep",
            "lm_keep",
            "n_docs",
            F.expr("n_docs * 1000000L div total_docs").alias("share_ppm"),
        )
        .orderBy("rule_keep", "lm_keep")
    )


def _filter_agreement_sql() -> str:
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    return f"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents),
wc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY doc_id, w),
per AS (SELECT doc_id, SUM(cnt) AS n, SUM(length(w) * cnt) AS chars,
               MAX(cnt) AS max_cnt,
               SUM(CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END) AS n_stop
        FROM wc GROUP BY doc_id),
rule_keep AS (SELECT doc_id,
       NOT (n < 50 OR n > 100000
            OR chars * 100 // n < 300 OR chars * 100 // n > 1000
            OR n_stop < 2
            OR max_cnt * 1000000 // n > 100000) AS rule_keep
  FROM per),
vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS vcnt FROM toks GROUP BY w),
tot AS (SELECT CAST(SUM(vcnt) AS BIGINT) AS total FROM vocab),
bits AS (SELECT doc_id, length(bin(total // vcnt)) - 1 AS bits
         FROM toks JOIN vocab USING (w) CROSS JOIN tot),
lm_keep AS (SELECT doc_id,
       SUM(bits) * 1000000 // COUNT(*) <= {SURPRISAL_MAX_PPM} AS lm_keep
  FROM bits GROUP BY doc_id),
cells AS (SELECT rule_keep, lm_keep, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM rule_keep JOIN lm_keep USING (doc_id)
          GROUP BY rule_keep, lm_keep),
total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM cells)
SELECT rule_keep, lm_keep, n_docs,
       n_docs * 1000000 // total_docs AS share_ppm
FROM cells CROSS JOIN total
ORDER BY rule_keep, lm_keep
"""


def t_vocab_overlap_langs(spark, sf_dir):
    """Cross-language vocabulary overlap matrix — the corpus-level
    corroboration of what t_lang_id_confusion showed at the document
    level: if the lang labels were real, per-lang vocabularies would
    be near-disjoint (real de/zh/en share little surface vocabulary);
    a Jaccard near 1 between every label pair proves the labels
    partition NOTHING lexically. On a real multilingual corpus this
    matrix is the input to language-family-aware dedup and
    shared-vocabulary tokenizer sizing (how much BPE vocab the
    languages can share). Per label pair: vocabulary sizes, shared
    words, and Jaccard in exact BIGINT ppm.

    Measured at sf0.01: 1,000,000 ppm — Jaccard exactly 1 for all
    ten pairs (every label carries the identical 31-word vocabulary),
    the corpus-level proof of t_lang_id_confusion's per-document
    diagnosis.

    100 TB posture: one distinct per (lang, word) — the exact-dedup
    shape — then the pair intersection is an inverted-index self-join
    on the word key (words appear in ≤ |langs| rows, so candidates
    are bounded by |langs|² per word, never corpus-sized); sizes
    broadcast back onto the ≤ |langs|²/2-row pair table."""
    d = _t(spark, sf_dir, "documents")
    lv = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("g"),
        )
        .where(F.length("g") > 0)
        .distinct()
        .localCheckpoint()
    )
    sizes = lv.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a, b = lv.alias("a"), lv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "n_common * 1000000L div (n_a + n_b - n_common)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("lang_a", "lang_b")
    )


T_VOCAB_OVERLAP_SQL = """
WITH lv AS (
  SELECT DISTINCT lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS g
  FROM documents),
lv2 AS (SELECT lang, g FROM lv WHERE length(g) > 0),
sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM lv2 GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM lv2 a JOIN lv2 b ON a.g = b.g AND a.lang < b.lang
  GROUP BY a.lang, b.lang)
SELECT lang_a, lang_b, sa.n AS n_a, sb.n AS n_b, n_common,
       n_common * 1000000 // (sa.n + sb.n - n_common) AS jaccard_ppm
FROM inter
JOIN sizes sa ON inter.lang_a = sa.lang
JOIN sizes sb ON inter.lang_b = sb.lang
ORDER BY lang_a, lang_b
"""


def t_filter_length_bias(spark, sf_dir):
    """Length bias of the quality filter — the check that asks
    whether a rule suite is secretly just a length filter (a known
    failure mode of web-quality heuristics: Gopher's word-count rule
    dominates short docs, so without this table a curator can't tell
    whether the OTHER rules carry any signal; Dolma's ablations
    normalize for exactly this). Gopher verdicts banded by log2
    document length: per band, doc count, rejections by the
    word-count rule alone, rejections by any OTHER rule, and each
    rate in exact BIGINT ppm — if other_reject_ppm is flat across
    bands while wc_reject_ppm steps from 10⁶ to 0 at the 50-word
    boundary, the suite's non-length rules are length-independent
    (the healthy reading).

    100 TB posture: the verified two-aggregate Gopher pipeline plus
    ONE hash(band) rollup; band table ≤ 40 rows at any corpus
    size.

    Measured at sf0.01: wc_reject steps 10⁶ → 0 at the 50-word
    boundary as designed, but other_reject_ppm FALLS 956,521 →
    195,979 across the bands — the non-length rules are strongly
    length-correlated here (short docs rarely collect 2 stopwords
    and their top-word share is noisy), i.e. the suite IS partly a
    length filter in disguise on this corpus: the unhealthy reading,
    caught."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    per = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("length(w) * cnt")).alias("chars"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.expr(f"if(w IN ({stops}), 1, 0)")).alias("n_stop"),
    )
    flags = per.select(
        F.expr("length(bin(n))").alias("band"),
        F.expr("if(n < 50 OR n > 100000, 1L, 0L)").alias("wc_reject"),
        F.expr(
            "if(chars * 100 div n < 300 OR chars * 100 div n > 1000 "
            "OR n_stop < 2 "
            "OR max_cnt * 1000000L div n > 100000, 1L, 0L)"
        ).alias("other_reject"),
    )
    return (
        flags.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("wc_reject").alias("n_wc_reject"),
            F.sum("other_reject").alias("n_other_reject"),
        )
        .select(
            "band",
            F.expr("shiftleft(1L, band - 1)").alias("min_words"),
            "n_docs",
            F.expr("n_wc_reject * 1000000L div n_docs").alias(
                "wc_reject_ppm"
            ),
            F.expr("n_other_reject * 1000000L div n_docs").alias(
                "other_reject_ppm"
            ),
        )
        .orderBy("band")
    )


def _filter_length_bias_sql() -> str:
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    return f"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents),
wc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY doc_id, w),
per AS (SELECT doc_id, SUM(cnt) AS n, SUM(length(w) * cnt) AS chars,
               MAX(cnt) AS max_cnt,
               SUM(CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END) AS n_stop
        FROM wc GROUP BY doc_id),
flags AS (SELECT length(bin(n)) AS band,
       CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS wc_reject,
       CASE WHEN chars * 100 // n < 300 OR chars * 100 // n > 1000
              OR n_stop < 2
              OR max_cnt * 1000000 // n > 100000 THEN 1 ELSE 0 END
         AS other_reject
  FROM per)
SELECT band, (1::BIGINT << (band - 1)) AS min_words,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(wc_reject) AS BIGINT) * 1000000
         // CAST(COUNT(*) AS BIGINT) AS wc_reject_ppm,
       CAST(SUM(other_reject) AS BIGINT) * 1000000
         // CAST(COUNT(*) AS BIGINT) AS other_reject_ppm
FROM flags GROUP BY band ORDER BY band
"""


T_FILTER_LEN_SQL = _filter_length_bias_sql()


def t_lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix — the evaluation row the t_lang_id
    heuristic owes (same discipline as the ANN family: every
    approximate operator ships with its quantifier; CLD/fastText
    releases publish exactly this table). The stopword-threshold
    predictor is scored against the corpus' labeled ``lang`` column:
    one row per (true lang, predicted) cell with counts and the
    per-true-lang recall in exact BIGINT ppm, plus each cell's share
    of the corpus — the table that says WHERE the heuristic fails.
    Measured at sf0.01: every label row reads ~86-89% 'en' — the
    synthetic generator mints English-vocab text under ALL lang
    labels, so the text carries no language signal and the matrix
    says so (uniform rows = predictor and label are independent).
    That diagnosis — "your lang column is decorrelated from your
    text" — is exactly what this table catches first on a real
    corpus with broken upstream labels.

    100 TB posture: the predictor is pure codegen (regexp_count +
    threshold) in the scan's Project; ONE hash(lang, pred) aggregate
    (≤ langs × 2 cells) + a broadcast per-lang totals join."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim("text"), "\\s+"))
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
        F.lit(" (the|a|and|of|to|in|is|it) "),
    )
    pred = F.when(stop.cast("double") / tokens > 0.02, F.lit("en")).otherwise(
        F.lit("unk")
    )
    cells = d.select(F.col("lang").alias("true_lang"), pred.alias("pred"))
    mat = cells.groupBy("true_lang", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = cells.groupBy("true_lang").agg(
        F.count(F.lit(1)).alias("lang_total")
    )
    return (
        mat.join(F.broadcast(totals), "true_lang")
        .select(
            "true_lang",
            "pred",
            "n",
            "lang_total",
            F.expr("n * 1000000L div lang_total").alias("cell_ppm"),
        )
        .orderBy("true_lang", "pred")
    )


T_LANG_CONF_SQL = """
WITH cells AS (
  SELECT lang AS true_lang,
         CASE WHEN CAST(LEN(regexp_extract_all(' ' || text || ' ',
                    ' (the|a|and|of|to|in|is|it) ')) AS DOUBLE)
                   / LEN(string_split_regex(TRIM(text), '\\s+')) > 0.02
              THEN 'en' ELSE 'unk' END AS pred
  FROM documents),
mat AS (SELECT true_lang, pred, CAST(COUNT(*) AS BIGINT) AS n
        FROM cells GROUP BY true_lang, pred),
totals AS (SELECT true_lang, CAST(COUNT(*) AS BIGINT) AS lang_total
           FROM cells GROUP BY true_lang)
SELECT true_lang, pred, n, lang_total,
       n * 1000000 // lang_total AS cell_ppm
FROM mat JOIN totals USING (true_lang)
ORDER BY true_lang, pred
"""


def t_gopher_rules(spark, sf_dir):
    """Gopher quality-filter rule suite (Rae et al. 2021, Appendix A
    — the published doc-level rejection rules every web-scale LLM
    corpus since MassiveText applies before training) with per-rule
    rejection tallies, so a curator sees WHICH rule costs how much
    corpus (the number that decides whether to re-tune a threshold
    before a 100 TB pass). Rules, thresholds calibrated to this
    corpus' scale (originals in parens): word_count outside [50,
    100000] (same), mean word length outside [3, 10] chars (same),
    fewer than 2 distinct stop words (same), most-frequent-word share
    > 10% (Gopher uses 20% on natural text; the synthetic vocab is
    ~30 words so the duplication signal sits lower). All arithmetic
    exact BIGINT (mean length ×100 floor, share in ppm) — no float
    thresholds to drift across engines. Output: one row per rule plus
    `gopher_any`, with corpus size, rejection count, and rejection
    rate in ppm.

    100 TB posture: two hash aggregates — (doc_id, word) counts, then
    per-doc stats — and a scalar rollup; the rule unpivot explodes a
    5-element literal array on ONE row. Same cost profile as
    t_quality_score at any corpus size.

    Measured at sf0.01: word_count rejects 44.6%, top_word 37.6%,
    stop_words 36.6%, gopher_any 59.0%; mean_word_len rejects 0 —
    the synthetic vocab's lengths are uniform, an honest null (on
    natural text this rule is also the rarest trigger)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    per = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("length(w) * cnt")).alias("chars"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.expr(f"if(w IN ({stops}), 1, 0)")).alias("n_stop"),
    )
    flags = per.select(
        F.expr("if(n < 50 OR n > 100000, 1L, 0L)").alias("word_count"),
        F.expr(
            "if(chars * 100 div n < 300 OR chars * 100 div n > 1000, 1L, 0L)"
        ).alias("mean_word_len"),
        F.expr("if(n_stop < 2, 1L, 0L)").alias("stop_words"),
        F.expr("if(max_cnt * 1000000L div n > 100000, 1L, 0L)").alias(
            "top_word"
        ),
    ).withColumn(
        "gopher_any",
        F.expr(
            "if(word_count + mean_word_len + stop_words + top_word > 0, 1L, 0L)"
        ),
    )
    rule_cols = [
        "gopher_any",
        "mean_word_len",
        "stop_words",
        "top_word",
        "word_count",
    ]
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(c).alias(c) for c in rule_cols],
    )
    return (
        agg.select(
            "n_docs",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("rule"),
                            F.col(c).alias("n_rejected"),
                        )
                        for c in rule_cols
                    ]
                )
            ).alias("r"),
        )
        .select(
            F.col("r.rule").alias("rule"),
            "n_docs",
            F.col("r.n_rejected").alias("n_rejected"),
            F.expr("r.n_rejected * 1000000L div n_docs").alias("reject_ppm"),
        )
        .orderBy("rule")
    )


def _gopher_sql() -> str:
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    rule_cols = [
        "gopher_any",
        "mean_word_len",
        "stop_words",
        "top_word",
        "word_count",
    ]
    unpivot = "\nUNION ALL ".join(
        f"SELECT '{c}' AS rule, n_docs, {c} AS n_rejected, "
        f"{c} * 1000000 // n_docs AS reject_ppm FROM agg"
        for c in rule_cols
    )
    return f"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents),
wc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY doc_id, w),
per AS (SELECT doc_id, SUM(cnt) AS n, SUM(length(w) * cnt) AS chars,
               MAX(cnt) AS max_cnt,
               SUM(CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END) AS n_stop
        FROM wc GROUP BY doc_id),
flags AS (SELECT
    CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS word_count,
    CASE WHEN chars * 100 // n < 300 OR chars * 100 // n > 1000
         THEN 1 ELSE 0 END AS mean_word_len,
    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS stop_words,
    CASE WHEN max_cnt * 1000000 // n > 100000 THEN 1 ELSE 0 END AS top_word
  FROM per),
f2 AS (SELECT *, CASE WHEN word_count + mean_word_len + stop_words + top_word
                           > 0 THEN 1 ELSE 0 END AS gopher_any FROM flags),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               {", ".join(f"CAST(SUM({c}) AS BIGINT) AS {c}" for c in rule_cols)}
        FROM f2)
SELECT rule, n_docs, n_rejected, reject_ppm FROM ({unpivot})
ORDER BY rule
"""


T_GOPHER_SQL = _gopher_sql()


def t_lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-fraction thresholding."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim("text"), "\\s+"))
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
        F.lit(" (the|a|and|of|to|in|is|it) "),
    )
    pred = F.when(stop.cast("double") / tokens > 0.02, F.lit("en")).otherwise(
        F.lit("unk")
    )
    return d.select("doc_id", pred.alias("pred_lang")).orderBy("doc_id")


T_LANG_SQL = """
SELECT doc_id,
  CASE WHEN CAST(LEN(regexp_extract_all(' ' || text || ' ',
        ' (the|a|and|of|to|in|is|it) ')) AS DOUBLE)
        / LEN(string_split_regex(TRIM(text), '\\s+')) > 0.02
       THEN 'en' ELSE 'unk' END AS pred_lang
FROM documents
ORDER BY doc_id
"""


def t_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of whitespace-normalized lowercase
    text (exact-dup key; identical hex in Spark and DuckDB)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", "\\s+", " "))).alias("fingerprint"),
    ).orderBy("doc_id")


T_FP_SQL = """
SELECT doc_id, MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
ORDER BY doc_id
"""


REP_TOP_BIGRAM_MAX = 0.10   # Gopher-style repetition gates: most-frequent
REP_DUP_TRIGRAM_MAX = 0.05  # bigram share / repeated-trigram share


def t_repetition_filter(spark, sf_dir):
    """Repetition-based quality filter (Gopher-style, adapted to
    single-line text): per document, the frequency share of the most
    common word bigram and the fraction of trigram occurrences that
    are repeats; documents over either threshold are dropped. All
    built-in expressions — two explode+groupBy passes keyed by doc_id,
    no UDFs, scales as a pair of hash aggregations."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w"))
    bi = w.where(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("g"),
    )
    top_bi = (
        bi.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c"), 6
            ).alias("top_bigram_frac")
        )
    )
    tri = w.where(F.size("w") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
            )
        ).alias("g"),
    )
    dup_tri = tri.groupBy("doc_id").agg(
        F.round(
            F.lit(1.0)
            - F.count_distinct("g").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_trigram_frac")
    )
    return (
        d.select("doc_id")
        .join(top_bi, "doc_id", "left")
        .join(dup_tri, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX)
            & (F.col("dup_trigram_frac") <= REP_DUP_TRIGRAM_MAX),
        )
        .orderBy("doc_id")
    )


T_REPETITION_SQL = f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
bi AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1])) AS g
       FROM w WHERE len(w) >= 2),
bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g),
top_bi AS (SELECT doc_id,
                  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_frac
           FROM bc GROUP BY doc_id),
tri AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM w WHERE len(w) >= 3),
dup_tri AS (SELECT doc_id,
                   ROUND(1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6)
                     AS dup_trigram_frac
            FROM tri GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac,
       COALESCE(dup_trigram_frac, 0.0) AS dup_trigram_frac,
       COALESCE(top_bigram_frac, 0.0) <= {REP_TOP_BIGRAM_MAX}
         AND COALESCE(dup_trigram_frac, 0.0) <= {REP_DUP_TRIGRAM_MAX} AS keep
FROM documents d
LEFT JOIN top_bi ON top_bi.doc_id = d.doc_id
LEFT JOIN dup_tri ON dup_tri.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def d_exact_dedup(spark, sf_dir):
    """Exact dedup via hash-groupBy: one keeper (min doc_id) per
    normalized-text group + group size."""
    d = _t(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.regexp_replace("text", "\\s+", " ")))
    return (
        d.groupBy(key.alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("fingerprint")
    )


D_EXACT_SQL = """
SELECT MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS keeper, COUNT(*) AS dup_count
FROM documents GROUP BY 1
ORDER BY fingerprint
"""


def d_dup_locality(spark, sf_dir):
    """Duplicate-cluster LOCALITY split — the diagnosis that decides
    which dedup machinery a corpus actually needs (the question
    d_mirror_sources answers for one pair of hosts, asked of the
    whole corpus): a duplicate cluster confined to one source is
    template/boilerplate mass (fix with URL rules and line dedup,
    cheap), a cluster spanning sources is mirror mass (needs the
    cross-host content dedup, expensive at 10^10 urls — Common
    Crawl's own dedup reports split exactly this way). The cluster
    key is the ORDERLESS word-set fingerprint (md5 of the sorted
    distinct word list) — byte-exact dedup finds nothing at sf0.01
    because the synthetic duplicates are shuffles and small edits,
    which is precisely the orderless detector's case (the
    bag-of-words analog of SURT's order-normalization for urls);
    clusters (≥ 2 docs) classify by their distinct-source count;
    output per class: clusters, docs, removable docs (docs −
    clusters), and each class' share of all removable duplicate mass
    in exact BIGINT ppm.

    100 TB posture: one hash(fingerprint) aggregate carrying
    count_distinct(source) in the same pass (no second shuffle);
    the class rollup runs on the CLUSTER table; totals are a 1-row
    crossJoin."""
    d = _t(spark, sf_dir, "documents")
    key = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(F.split(F.lower(F.trim("text")), "\\s+"))
            ),
            " ",
        )
    )
    clusters = (
        d.groupBy(key.alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("source").alias("n_sources"),
        )
        .where(F.col("sz") >= 2)
    )
    classed = clusters.select(
        F.when(F.col("n_sources") == 1, F.lit("intra_source"))
        .otherwise(F.lit("cross_source"))
        .alias("locality"),
        "sz",
    )
    per = classed.groupBy("locality").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        F.sum(F.expr("sz - 1")).alias("n_removable"),
    )
    total = per.agg(F.sum("n_removable").alias("total_removable"))
    return (
        per.crossJoin(total)
        .select(
            "locality",
            "n_clusters",
            "n_docs",
            "n_removable",
            F.expr(
                "n_removable * 1000000L div total_removable"
            ).alias("removable_share_ppm"),
        )
        .orderBy("locality")
    )


D_DUP_LOCALITY_SQL = """
WITH clusters AS (
  SELECT md5(array_to_string(list_sort(list_distinct(
           string_split_regex(lower(trim(text)), '\\s+'))), ' '))
           AS fingerprint,
         CAST(COUNT(*) AS BIGINT) AS sz,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM documents GROUP BY 1
  HAVING COUNT(*) >= 2),
classed AS (
  SELECT CASE WHEN n_sources = 1 THEN 'intra_source'
              ELSE 'cross_source' END AS locality, sz
  FROM clusters),
per AS (
  SELECT locality, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(sz) AS BIGINT) AS n_docs,
         CAST(SUM(sz - 1) AS BIGINT) AS n_removable
  FROM classed GROUP BY locality),
total AS (SELECT CAST(SUM(n_removable) AS BIGINT) AS total_removable FROM per)
SELECT locality, n_clusters, n_docs, n_removable,
       n_removable * 1000000 // total_removable AS removable_share_ppm
FROM per CROSS JOIN total
ORDER BY locality
"""


def d_dedup_quality_shift(spark, sf_dir):
    """Dedup × quality interaction (RefinedWeb §6.2 / Dolma report
    the same effect: duplicates skew low-quality, so dedup shifts the
    surviving corpus' quality distribution — the audit that says
    whether dedup is quietly doing part of the quality filter's job,
    which matters when tuning either). Clusters are the orderless
    word-set fingerprints (d_dup_locality's key — the dup structure
    this corpus actually has); the keeper policy is keep-lowest-id;
    quality verdict is t_gopher_rules' gopher_any. Output: the full
    corpus vs the post-dedup survivors, each with document count and
    Gopher rejection rate in exact BIGINT ppm — a survivor rate below
    the corpus rate means dedup removed disproportionately bad docs.

    100 TB posture: one fingerprint aggregate for keepers (min
    doc_id — the exact-dedup shape), the verified two-aggregate
    Gopher verdict, one join + one 2-row rollup.

    Measured at sf0.01: corpus 590,000 ppm rejected vs survivors
    647,982 — the INVERSE of RefinedWeb's natural-web finding:
    this corpus' duplicates are disproportionately the longer,
    rule-passing docs, so dedup removes GOOD mass here. Either sign
    is exactly what the audit exists to surface before anyone tunes
    a filter assuming the web's usual direction."""
    d = _t(spark, sf_dir, "documents")
    key = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(F.split(F.lower(F.trim("text")), "\\s+"))
            ),
            " ",
        )
    )
    keepers = (
        d.select("doc_id", key.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("kept"))
    )
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    per = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("length(w) * cnt")).alias("chars"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.expr(f"if(w IN ({stops}), 1, 0)")).alias("n_stop"),
    )
    verdict = per.select(
        "doc_id",
        F.expr(
            "if(n < 50 OR n > 100000 "
            "OR chars * 100 div n < 300 OR chars * 100 div n > 1000 "
            "OR n_stop < 2 "
            "OR max_cnt * 1000000L div n > 100000, 1L, 0L)"
        ).alias("rejected"),
    )
    j = verdict.join(keepers, "doc_id", "left").select(
        "rejected", F.expr("coalesce(kept, false)").alias("kept")
    )
    pops = j.select(F.lit("corpus").alias("population"), "rejected").unionByName(
        j.where("kept").select(
            F.lit("survivors").alias("population"), "rejected"
        )
    )
    return (
        pops.groupBy("population")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("rejected").alias("n_rejected"),
        )
        .select(
            "population",
            "n_docs",
            "n_rejected",
            F.expr("n_rejected * 1000000L div n_docs").alias("reject_ppm"),
        )
        .orderBy("population")
    )


def _dedup_quality_sql() -> str:
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    return f"""
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                 string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS fp
        FROM documents)
  GROUP BY fp),
toks AS (SELECT doc_id,
                unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
         FROM documents),
wc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY doc_id, w),
per AS (SELECT doc_id, SUM(cnt) AS n, SUM(length(w) * cnt) AS chars,
               MAX(cnt) AS max_cnt,
               SUM(CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END) AS n_stop
        FROM wc GROUP BY doc_id),
verdict AS (SELECT doc_id,
       CASE WHEN n < 50 OR n > 100000
              OR chars * 100 // n < 300 OR chars * 100 // n > 1000
              OR n_stop < 2
              OR max_cnt * 1000000 // n > 100000 THEN 1 ELSE 0 END AS rejected
  FROM per),
j AS (SELECT v.rejected, k.doc_id IS NOT NULL AS kept
      FROM verdict v LEFT JOIN keepers k ON v.doc_id = k.doc_id),
pops AS (
  SELECT 'corpus' AS population, rejected FROM j
  UNION ALL
  SELECT 'survivors', rejected FROM j WHERE kept)
SELECT population, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(rejected) AS BIGINT) AS n_rejected,
       CAST(SUM(rejected) AS BIGINT) * 1000000
         // CAST(COUNT(*) AS BIGINT) AS reject_ppm
FROM pops GROUP BY population ORDER BY population
"""


D_DEDUP_QUALITY_SQL = _dedup_quality_sql()


def d_cluster_size_histogram(spark, sf_dir):
    """Duplicate-cluster size distribution — the headline table of
    every dedup report (CCNet, C4, RefinedWeb all lead with it: what
    share of the corpus is singletons vs mass-duplicated boilerplate,
    because that one histogram decides whether exact dedup is enough
    or near-dup must follow). Exact-dedup clusters (d_exact_dedup's
    fingerprint) banded by log2 cluster size: per band, cluster
    count, document count, share of all documents in exact BIGINT
    ppm, and the REMOVAL ppm (docs minus keepers — what dedup
    deletes) — band 1 is the singleton mass, the high bands are the
    boilerplate tail.

    100 TB posture: the exact-dedup hash aggregate (the D1 shuffle
    shape) + one aggregate on the CLUSTER table + a 1-row totals
    crossJoin; band table ≤ 40 rows at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.regexp_replace("text", "\\s+", " ")))
    clusters = d.groupBy(key.alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    bands = (
        clusters.select(F.expr("length(bin(sz))").alias("band"), "sz")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
        )
    )
    total = bands.agg(F.sum("n_docs").alias("total_docs"))
    return (
        bands.crossJoin(total)
        .select(
            "band",
            F.expr("shiftleft(1L, band - 1)").alias("min_size"),
            "n_clusters",
            "n_docs",
            F.expr("n_docs * 1000000L div total_docs").alias("doc_share_ppm"),
            F.expr(
                "(n_docs - n_clusters) * 1000000L div total_docs"
            ).alias("removal_ppm"),
        )
        .orderBy("band")
    )


D_CLUSTER_HIST_SQL = """
WITH clusters AS (
  SELECT MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS fingerprint,
         CAST(COUNT(*) AS BIGINT) AS sz
  FROM documents GROUP BY 1),
bands AS (
  SELECT length(bin(sz)) AS band, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(sz) AS BIGINT) AS n_docs
  FROM clusters GROUP BY 1),
total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM bands)
SELECT band, (1::BIGINT << (band - 1)) AS min_size, n_clusters, n_docs,
       n_docs * 1000000 // total_docs AS doc_share_ppm,
       (n_docs - n_clusters) * 1000000 // total_docs AS removal_ppm
FROM bands CROSS JOIN total
ORDER BY band
"""


# ---------------------------------------------------------------------------
# Similarity search (embeddings) — exact baseline, LSH, IVF
# ---------------------------------------------------------------------------

def sim_cosine_topk(spark, sf_dir):
    """ANN baseline: brute-force cosine top-20 against the vec_id=0
    query vector. JVM-side: zip_with + aggregate, no Python in the
    scoring loop. Scores rounded to 4 decimals for cross-engine
    comparability."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("q_emb")
    )
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    dot = F.aggregate(
        F.zip_with("emb", "q_emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        v.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("emb")) * norm(F.col("q_emb"))), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(20)
    )


SIM_TOPK_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), q_emb)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q_emb, q_emb))), 4) AS cosine
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 20
"""


def sim_label_centroid_norm(spark, sf_dir):
    """Embedding aggregate shape: per-label mean-vector norm (rounded)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("label", F.col("embedding").cast("array<double>").alias("emb"))
    n = 64
    sums = v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        *[
            F.sum(F.col("emb").getItem(i)).alias(f"s{i}")
            for i in range(n)
        ],
    )
    sq = sum((F.col(f"s{i}") / F.col("n_vecs")) ** 2 for i in range(n))
    return sums.select(
        "label", "n_vecs", F.round(F.sqrt(sq), 4).alias("centroid_norm")
    ).orderBy("label")


SIM_CENTROID_SQL = f"""
SELECT label, COUNT(*) AS n_vecs,
       ROUND(sqrt({' + '.join(f'POW(SUM(embedding[{i + 1}]) / COUNT(*), 2)' for i in range(64))}), 4) AS centroid_norm
FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
GROUP BY label
ORDER BY label
"""


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: all-pairs exact (the oracle
    baseline for the LSH-bucketed scale path below). JVM-side math;
    the self-join shuffles on nothing smaller at this shape, so at
    scale you run sim_ann_lsh_pairs instead and this only on samples."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    norm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    vn = v.withColumn("nrm", norm)
    a, b = vn.alias("a"), vn.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )


DEDUP_EMB_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb)
             / (sqrt(list_dot_product(a.emb, a.emb))
                * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND ROUND(list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb))
               * sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.45
ORDER BY vec_a, vec_b
"""


# ---- random-hyperplane LSH (engine-portable) ------------------------------

LSH_PLANES, LSH_DIM, LSH_BANDS, LSH_BITS = 16, 64, 2, 8


def _lsh_coefs() -> list[list[float]]:
    """Deterministic pseudo-random hyperplane coefficients in
    [-0.5, 0.5], 6-decimal literals — embedded identically in the
    Spark plan and the DuckDB oracle SQL (an LCG, not Python hash(),
    so the values are printable and reproducible everywhere)."""
    x = 1234567891
    out = []
    for _p in range(LSH_PLANES):
        row = []
        for _d in range(LSH_DIM):
            x = (1103515245 * x + 12345) % (1 << 31)
            row.append(round(x / float(1 << 31) - 0.5, 6))
        out.append(row)
    return out


_LSH_COEFS = _lsh_coefs()


def _dot_sql(a: str, b: str, dim: int = LSH_DIM) -> str:
    """Left-associated explicit dot product — the same FP association
    order as Spark's aggregate() left fold, so doubles match exactly."""
    return " + ".join(f"{a}[{i + 1}]*{b}[{i + 1}]" for i in range(dim))


def _proj_sql(emb: str, coefs: list[float]) -> str:
    return " + ".join(f"{emb}[{i + 1}]*({c!r})" for i, c in enumerate(coefs))


def sim_ann_lsh_pairs(spark, sf_dir):
    """ANN scale path: random-hyperplane LSH — 16 deterministic
    hyperplanes, 2 bands × 8 bits; pairs sharing a band bucket get
    exact cosine rerank. Collisions ∝ bucket sizes, never n² — the
    10^10-row strategy. Coefficients are shared literals and the FP
    fold order matches the SQL oracle, so the bucket layout itself is
    oracle-verified (not rows-only)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    bits = []
    for p in range(LSH_PLANES):
        coef = F.array(*[F.lit(c) for c in _LSH_COEFS[p]])
        proj = F.aggregate(
            F.zip_with("emb", coef, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)).alias(f"b{p}"))
    hashed = v.select("vec_id", "emb", *bits)
    band_sigs = [
        sum(F.col(f"b{band * LSH_BITS + j}") * (1 << j) for j in range(LSH_BITS))
        for band in range(LSH_BANDS)
    ]
    all_bands = hashed.select(
        "vec_id", "emb", F.posexplode(F.array(*band_sigs)).alias("band", "bucket")
    )
    a, b = all_bands.alias("a"), all_bands.alias("b")
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                dot / (norm(F.col("a.emb")) * norm(F.col("b.emb"))), 4
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.45)
        .distinct()
        .orderBy("vec_a", "vec_b")
    )


def _lsh_ctes() -> str:
    """The shared v/hashed/bands CTE block of the LSH SQL oracles."""
    bit_cols = ",\n       ".join(
        f"CASE WHEN ({_proj_sql('emb', _LSH_COEFS[p])}) > 0 THEN 1 ELSE 0 END AS b{p}"
        for p in range(LSH_PLANES)
    )
    band_rows = "\n  UNION ALL ".join(
        "SELECT vec_id, emb, {band} AS band, ({sig}) AS bucket FROM hashed".format(
            band=band,
            sig=" + ".join(
                f"b{band * LSH_BITS + j}*{1 << j}" for j in range(LSH_BITS)
            ),
        )
        for band in range(LSH_BANDS)
    )
    return f"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
hashed AS (SELECT vec_id, emb,
       {bit_cols}
FROM v),
bands AS ({band_rows})"""


def _lsh_sql() -> str:
    return f"""
WITH {_lsh_ctes()}
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(({_dot_sql('a.emb', 'b.emb')})
             / (sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')})), 4) AS cosine
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND(({_dot_sql('a.emb', 'b.emb')})
            / (sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')})), 4) >= 0.45
ORDER BY vec_a, vec_b
"""


SIM_LSH_SQL = _lsh_sql()


def sim_ann_lsh_recall(spark, sf_dir):
    """LSH quality, quantified: recall of the band-bucket candidate
    pairs against the exact all-pairs cosine ≥ 0.45 truth
    (dedup_embedding_cosine). One row: n_true, n_found, n_hit,
    recall — all oracle-reproduced (the hyperplanes are shared
    literals)."""
    truth = dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b")
    found = sim_ann_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    hit = truth.join(found, ["vec_a", "vec_b"], "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true",
            "n_found",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_true"), 4).alias(
                "recall"
            ),
        )
    )


def _lsh_recall_sql() -> str:
    return f"""
WITH {_lsh_ctes()},
found AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE ROUND(({_dot_sql('a.emb', 'b.emb')})
                / (sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')})), 4) >= 0.45),
truth AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM v a, v b
          WHERE a.vec_id < b.vec_id
            AND ROUND(({_dot_sql('a.emb', 'b.emb')})
                / (sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')})), 4) >= 0.45),
hit AS (SELECT * FROM truth WHERE (vec_a, vec_b) IN (SELECT (vec_a, vec_b) FROM found))
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM found) AS n_found,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM truth), 4) AS recall
"""


SIM_LSH_RECALL_SQL = _lsh_recall_sql()


# ---- IVF ANN (engine-portable, TRAINED quantizer) -------------------------

IVF_KMEANS_ITERS = 2   # deterministic Lloyd iterations over the label init
IVF_NPROBE = 2


def _arr_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _arr_norm(c):
    return F.sqrt(_arr_dot(c, c))


def _ivf_v(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )


def _dec_centroids(assigned, cell_col: str):
    """Mean vector per cell with decimal(24,10) per-dimension sums —
    exact and reduction-order-independent, so both engines produce
    bit-identical centroid doubles regardless of partitioning."""
    dim = LSH_DIM
    sums = assigned.groupBy(cell_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col("emb").getItem(i).cast("decimal(24,10)")).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    return sums.select(
        F.col(cell_col).alias("cell"),
        F.array(
            *[(F.col(f"s{i}").cast("double") / F.col("n")) for i in range(dim)]
        ).alias("cent"),
    )


def _argmax_cell(cent_rows):
    """Map-side nearest-cell expression: per row, score every centroid
    (embedded as literals — the K×dim quantizer is tiny, the same class
    as the LSH hyperplane literals) and argmax via array_max over
    (score, -cell) structs — max score, MIN cell on ties, exactly the
    SQL oracle's ROW_NUMBER ... ORDER BY score DESC, cell. The dot is
    the shared left fold; |cent| is precomputed in Python with the
    identical left association (IEEE doubles, same bits)."""
    import functools
    import math

    structs = []
    for r in cent_rows:
        coefs = [float(c) for c in r.cent]
        dot = _arr_dot(F.col("emb"), F.array(*[F.lit(c) for c in coefs]))
        nrm = math.sqrt(functools.reduce(lambda a, c: a + c * c, coefs, 0.0))
        structs.append(
            F.struct(
                (dot / F.lit(nrm)).alias("score"),
                F.lit(-r.cell).alias("negcell"),
            )
        )
    return (-F.array_max(F.array(*structs))["negcell"]).cast("int")


def _ivf_trained_cents(v):
    """Train the coarse quantizer: label-means init, then
    IVF_KMEANS_ITERS Lloyd iterations (assign to argmax
    dot(emb,cent)/|cent|, recompute decimal-exact means). Each
    iteration collects the K tiny centroids (bounded driver data, like
    the bucket-prune collect) and re-scans the big table ONCE with a
    map-only argmax + one cell groupBy — no crossJoin row blowup, no
    per-vector shuffle, the 100 TB shape. Ties break on cell id;
    scores share the SQL oracle's left-fold FP association, so
    assignments match across engines."""
    cents = _dec_centroids(v.select(F.col("label").alias("c0"), "emb"), "c0")
    for _ in range(IVF_KMEANS_ITERS):
        cent_rows = sorted(cents.collect(), key=lambda r: r.cell)
        assigned = v.select(
            "vec_id", "emb", _argmax_cell(cent_rows).alias("cell")
        )
        cents = _dec_centroids(assigned, "cell")
    return cents, assigned


def sim_ann_ivf_topk(spark, sf_dir):
    """IVF ANN with a TRAINED coarse quantizer: label-means seed two
    deterministic k-means iterations (VERDICT r2 item 5); the query
    probes the nprobe=2 nearest trained cells and exact cosine reranks
    inside their inverted lists. Centroids broadcast (K tiny); the big
    table is touched once per probe — never n².

    Determinism: per-dimension sums go through decimal(24,10) (exact,
    order-independent — double sums would differ across engines by
    reduction order), then back to double; all dot products use the
    same left-fold association as the SQL oracle, so cell assignments
    and probe picks are oracle-verified, not rows-only."""
    v = _ivf_v(spark, sf_dir)
    cents, assigned = _ivf_trained_cents(v)

    q = v.where(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            _arr_dot(F.col("cent"), F.col("q_emb"))
            / (_arr_norm(F.col("cent")) * _arr_norm(F.col("q_emb"))),
        )
        .orderBy(F.col("sim").desc(), F.col("cell"))
        .limit(IVF_NPROBE)
        .select("cell")
    )
    candidates = assigned.join(F.broadcast(probe_cells), "cell", "left_semi")
    return (
        candidates.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _arr_dot(F.col("emb"), F.col("q_emb"))
                / (_arr_norm(F.col("emb")) * _arr_norm(F.col("q_emb"))),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def sim_ann_ivf_recall(spark, sf_dir):
    """IVF quality, quantified (symmetric with sim_ann_lsh_recall):
    recall@10 of the nprobe=2 trained-quantizer answer against the
    brute-force cosine top-10 truth. One row: n_true, n_found, n_hit,
    recall."""
    truth = sim_cosine_topk(spark, sf_dir).limit(10).select("vec_id")
    found = sim_ann_ivf_topk(spark, sf_dir).select("vec_id")
    hit = truth.join(found, "vec_id", "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true",
            "n_found",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_true"), 4).alias(
                "recall"
            ),
        )
    )


def _ivf_cent_list() -> str:
    return ", ".join(
        f"CAST(SUM(CAST(emb[{i + 1}] AS DECIMAL(24,10))) AS DOUBLE) / COUNT(*)"
        for i in range(LSH_DIM)
    )


def _ivf_trained_ctes() -> tuple[str, str, str]:
    """(CTE block, final-cents name, final-assignment name) for the
    trained quantizer, mirroring _ivf_trained_cents step for step.

    Every CTE is ``AS MATERIALIZED``: without the hint DuckDB's
    optimizer re-inlines each reference, and the k-means chain
    (a2 → c1 → a1 → c0 → v, with 64-term dot products at every level)
    blows up exponentially during planning — observed as a flaky
    OutOfMemoryException on a 500-row input."""
    cent_list = _ivf_cent_list()
    score = f"({_dot_sql('emb', 'cent')}) / sqrt({_dot_sql('cent', 'cent')})"
    ctes = [
        "v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT label AS cell, [{cent_list}] AS cent FROM v GROUP BY label)",
    ]
    prev = "c0"
    for it in range(1, IVF_KMEANS_ITERS + 1):
        ctes.append(
            f"""a{it} AS MATERIALIZED (
  SELECT vec_id, emb, cell FROM (
    SELECT v.vec_id, v.emb, {prev}.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {score} DESC, {prev}.cell) AS rn
    FROM v, {prev}) WHERE rn = 1)"""
        )
        ctes.append(
            f"c{it} AS MATERIALIZED (SELECT cell, [{cent_list}] AS cent FROM a{it} GROUP BY cell)"
        )
        prev = f"c{it}"
    return ",\n".join(ctes), prev, f"a{IVF_KMEANS_ITERS}"


def _ivf_sql() -> str:
    ctes, cfin, afin = _ivf_trained_ctes()
    return f"""
WITH {ctes},
q AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
probe AS (
  SELECT cell FROM {cfin}, q
  ORDER BY ({_dot_sql('cent', 'q_emb')})
           / (sqrt({_dot_sql('cent', 'cent')}) * sqrt({_dot_sql('q_emb', 'q_emb')})) DESC, cell
  LIMIT {IVF_NPROBE})
SELECT vec_id,
       ROUND(({_dot_sql('emb', 'q_emb')})
             / (sqrt({_dot_sql('emb', 'emb')}) * sqrt({_dot_sql('q_emb', 'q_emb')})), 4) AS cosine
FROM {afin} a, q
WHERE a.cell IN (SELECT cell FROM probe) AND vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def _ivf_recall_sql() -> str:
    ctes, cfin, afin = _ivf_trained_ctes()
    return f"""
WITH {ctes},
q AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
probe AS (
  SELECT cell FROM {cfin}, q
  ORDER BY ({_dot_sql('cent', 'q_emb')})
           / (sqrt({_dot_sql('cent', 'cent')}) * sqrt({_dot_sql('q_emb', 'q_emb')})) DESC, cell
  LIMIT {IVF_NPROBE}),
found AS (
  SELECT vec_id FROM {afin} a, q
  WHERE a.cell IN (SELECT cell FROM probe) AND vec_id <> 0
  ORDER BY ROUND(({_dot_sql('emb', 'q_emb')})
                 / (sqrt({_dot_sql('emb', 'emb')}) * sqrt({_dot_sql('q_emb', 'q_emb')})), 4) DESC, vec_id
  LIMIT 10),
truth AS (
  SELECT vec_id FROM v, q
  WHERE vec_id <> 0
  ORDER BY ROUND(({_dot_sql('emb', 'q_emb')})
                 / (sqrt({_dot_sql('emb', 'emb')}) * sqrt({_dot_sql('q_emb', 'q_emb')})), 4) DESC, vec_id
  LIMIT 10),
hit AS (SELECT vec_id FROM truth WHERE vec_id IN (SELECT vec_id FROM found))
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM found) AS n_found,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM truth), 4) AS recall
"""


SIM_IVF_SQL = _ivf_sql()
SIM_IVF_RECALL_SQL = _ivf_recall_sql()


def sim_ivf_cell_stats(spark, sf_dir):
    """IVF index-balance audit — the table an ANN deployment reads
    before picking nlist/nprobe (FAISS wiki's first tuning rule:
    unbalanced inverted lists make probe cost skew — one hot cell and
    every query that probes it pays its whole list; loose cells leak
    recall at fixed nprobe). Per trained cell (the same quantizer
    sim_ann_ivf_topk probes): list size, share of all vectors in
    exact BIGINT ppm (the balance number), and the mean / minimum
    cosine of members to their own centroid (the tightness numbers —
    mean via decimal(24,10) sums so the reduction order can't drift,
    min is order-free; both emitted as floor(x·1e6) BIGINTs).

    100 TB posture: training is _ivf_trained_cents' map-only argmax
    passes (K tiny centroids collected per iteration, the bounded
    bucket-prune-style driver data); the audit itself is one
    broadcast join of the K-row centroid table onto the assignment +
    ONE hash(cell) aggregate + a 1-row totals crossJoin."""
    v = _ivf_v(spark, sf_dir)
    cents, assigned = _ivf_trained_cents(v)
    cos = _arr_dot(F.col("emb"), F.col("cent")) / (
        F.sqrt(_arr_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_arr_dot(F.col("cent"), F.col("cent")))
    )
    scored = assigned.join(F.broadcast(cents), "cell").select(
        "cell", cos.alias("cos")
    )
    per = scored.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cos").cast("decimal(24,10)")).alias("s"),
        F.min("cos").alias("mn"),
    )
    total = per.agg(F.sum("n").alias("total_vecs"))
    return (
        per.crossJoin(total)
        .select(
            "cell",
            "n",
            F.expr("n * 1000000L div total_vecs").alias("share_ppm"),
            F.floor(
                F.expr("cast(s as double) / n") * F.lit(1000000.0)
            ).alias("mean_cos_e6"),
            F.floor(F.col("mn") * F.lit(1000000.0)).alias("min_cos_e6"),
        )
        .orderBy("cell")
    )


def _ivf_cell_stats_sql() -> str:
    ctes, cfin, afin = _ivf_trained_ctes()
    cos = (
        f"({_dot_sql('emb', 'cent')}) / (sqrt({_dot_sql('emb', 'emb')})"
        f" * sqrt({_dot_sql('cent', 'cent')}))"
    )
    return f"""
WITH {ctes},
scored AS MATERIALIZED (
  SELECT a.cell, {cos} AS cos
  FROM {afin} a JOIN {cfin} c USING (cell)),
per AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(cos AS DECIMAL(24,10))) AS s, MIN(cos) AS mn
        FROM scored GROUP BY cell),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_vecs FROM per)
SELECT cell, n, n * 1000000 // total_vecs AS share_ppm,
       CAST(FLOOR(CAST(s AS DOUBLE) / n * 1000000.0) AS BIGINT)
         AS mean_cos_e6,
       CAST(FLOOR(mn * 1000000.0) AS BIGINT) AS min_cos_e6
FROM per CROSS JOIN total ORDER BY cell
"""


SIM_IVF_CELL_STATS_SQL = _ivf_cell_stats_sql()


# ---------------------------------------------------------------------------
# Product quantization ANN (IVF-PQ's compression half, r3f)
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_SUBDIM = LSH_DIM // PQ_M
PQ_K = 16         # codewords per subspace → 4 bits/subspace, 32 bits/vector
PQ_ITERS = 2      # deterministic Lloyd iterations per subspace
PQ_SCALE = 1000000000.0  # ADC distances → integer nanounits (exact sums)


def _pq_sub(v):
    """(vec_id, m, sv): the M subvectors of every embedding."""
    parts = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice("emb", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        )
        for m in range(PQ_M)
    ]
    return v.select("vec_id", F.explode(F.array(*parts)).alias("p")).select(
        "vec_id", F.col("p.m").alias("m"), F.col("p.sv").alias("sv")
    )


def _pq_dist_lit(sv: str, cw) -> str:
    """Left-folded squared L2 distance to a literal codeword as a SQL
    string — the same FP association as the oracle's explicit chain.
    Literals round-trip bit-exactly via CAST('repr' AS DOUBLE). Built
    as ONE string (not a py4j Column tree): the Column version cost
    ~13 s of py4j round trips PER assignment expression."""
    return " + ".join(
        f"({sv}[{i}] - CAST('{float(cw[i])!r}' AS DOUBLE))"
        f" * ({sv}[{i}] - CAST('{float(cw[i])!r}' AS DOUBLE))"
        for i in range(PQ_SUBDIM)
    )


def _pq_dist_col(a_col, b_col):
    """Same fold, both sides columns (array<double>)."""
    import functools

    terms = [
        (a_col.getItem(i) - b_col.getItem(i))
        * (a_col.getItem(i) - b_col.getItem(i))
        for i in range(PQ_SUBDIM)
    ]
    return functools.reduce(lambda a, b: a + b, terms)


def _pq_assign_expr(cent_rows):
    """Map-side nearest-codeword expression per subspace — the
    _argmax_cell pattern: the K×M codebook (128 rows, tiny) is
    embedded as literals and each row argmins over its own subspace's
    codewords via array_max((−d, −code)) = min d, min code on ties,
    exactly the oracle's ROW_NUMBER ... ORDER BY d, code.

    Kept as the no-Python reference implementation (test-pinned equal
    to the Arrow kernel below); the hot path uses _pq_assign_udf —
    this literal tree costs ~10 s of data-size-INDEPENDENT Catalyst
    analysis + interpreted eval per use (×3 uses: 2 Lloyd iterations +
    the final encode), the r3 bench caveat."""
    by_m: dict[int, list] = {}
    for r in cent_rows:
        by_m.setdefault(r.m, []).append(r)
    branches = []
    for m in sorted(by_m):
        structs = ", ".join(
            f"named_struct('negd', -({_pq_dist_lit('sv', r.cw)}), "
            f"'negcode', {-r.code})"
            for r in sorted(by_m[m], key=lambda x: x.code)
        )
        pick = f"CAST(-(array_max(array({structs})).negcode) AS INT)"
        branches.append(f"WHEN m = {m} THEN {pick}")
    return F.expr("CASE " + " ".join(branches) + " END")


def _pq_assign_udf(cent_rows):
    """Arrow-vectorized nearest-codeword assignment: the collected
    K×M codebook (128 rows, driver-bounded) closes over a pandas_udf
    that argmins each batch against its subspace's codewords in numpy.
    Same map-only, shuffle-free scan shape as the literal-expression
    variant (broadcast-by-closure is the 100 TB posture for a
    128-row dim table), but with none of its ~10 s/use Catalyst
    constant. Bit-exact with the literal tree AND the oracle's
    ROW_NUMBER ... ORDER BY d, code: the squared-L2 accumulates in the
    SAME left-fold order per dimension (float64 IEEE ops identical to
    the JVM's doubles), and np.argmin's first-minimum tie-break equals
    min-code because rows are sorted by code."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    by_m: dict[int, list] = {}
    for r in cent_rows:
        by_m.setdefault(int(r.m), []).append(
            (int(r.code), np.asarray(r.cw, dtype=np.float64))
        )
    tables: dict[int, tuple] = {}
    for m, lst in by_m.items():
        lst.sort(key=lambda t: t[0])
        codes = np.array([c for c, _ in lst], dtype=np.int64)
        mat = np.stack([w for _, w in lst])  # K × SUBDIM
        tables[m] = (codes, mat)

    @pandas_udf("int")
    def assign(m_s: pd.Series, sv_s: pd.Series) -> pd.Series:
        mv = m_s.to_numpy()
        out = np.empty(len(mv), dtype=np.int64)
        for m in np.unique(mv):
            idx = np.nonzero(mv == m)[0]
            codes, mat = tables[int(m)]
            x = np.stack(sv_s.iloc[idx].to_numpy())  # n × SUBDIM
            # left-folded Σ_i (x_i − c_i)² — the oracle's fold order
            d = np.zeros((len(idx), mat.shape[0]), dtype=np.float64)
            for i in range(mat.shape[1]):
                diff = x[:, i : i + 1] - mat[None, :, i]
                d = d + diff * diff
            out[idx] = codes[np.argmin(d, axis=1)]
        return pd.Series(out.astype(np.int32))

    return assign


def _pq_dec_cents(assigned):
    """Per-(subspace, code) mean codeword with decimal(24,10) sums —
    exact, reduction-order-independent (the _dec_centroids discipline)."""
    sums = assigned.groupBy("m", "code").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col("sv").getItem(i).cast("decimal(24,10)")).alias(f"s{i}")
            for i in range(PQ_SUBDIM)
        ],
    )
    return sums.select(
        "m",
        "code",
        F.array(
            *[(F.col(f"s{i}").cast("double") / F.col("n")) for i in range(PQ_SUBDIM)]
        ).alias("cw"),
    )


def _pq_codebook(sub):
    """Train the PQ codebook: first-K-vectors init (vec_id 1..PQ_K —
    deterministic, distinct), PQ_ITERS Lloyd iterations. Each
    iteration collects the 128-row codebook (bounded driver data) and
    re-scans the subvector table ONCE with a map-only argmin — no
    crossJoin blowup, the 100 TB shape."""
    book = sub.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= PQ_K)).select(
        "m", F.col("vec_id").cast("int").alias("code"), F.col("sv").alias("cw")
    )
    for _ in range(PQ_ITERS):
        rows = sorted(book.collect(), key=lambda r: (r.m, r.code))
        assigned = sub.select(
            "vec_id", "m", "sv",
            _pq_assign_udf(rows)(F.col("m"), F.col("sv")).alias("code"),
        )
        book = _pq_dec_cents(assigned).localCheckpoint()
    return book


def sim_ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jégou-Douze-Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public):
    the compression half of IVF-PQ, beside the existing IVF coarse
    quantizer and LSH. Vectors are encoded as PQ_M 4-bit codes (32
    bits vs 64×8 bytes raw — the 128× memory cut that makes
    billion-vector search fit a cluster); the query is answered by
    asymmetric distance computation (ADC): a PQ_M×PQ_K lookup table of
    query-to-codeword distances, then each candidate's approximate
    distance is the sum of M table entries — no raw-vector access.

    Determinism end-to-end: codebook means go through decimal(24,10)
    (exact, order-free); every squared-L2 is the same left-folded
    expression tree in both engines; ADC entries are scaled to BIGINT
    nanounits (floor(d·1e9)) BEFORE the per-vector sum, so the sum is
    exact integer arithmetic and the output column is a BIGINT — no
    float accumulation, no decimal rendering anywhere. Plan: encode =
    one map-only argmin scan; ADC = one broadcast join of the 8-row
    query-subvector table against the 128-row codebook + one equi-join
    on (m,code) + one hash aggregate keyed by vec_id; top-10 is
    TakeOrderedAndProject."""
    return _pq_adc(spark, sf_dir).orderBy("adc_nano", "vec_id").limit(10)


def _pq_adc(spark, sf_dir):
    """(vec_id, adc_nano) for every non-query vector: train, encode,
    build the query's distance table, sum integer table entries."""
    v = _ivf_v(spark, sf_dir)
    sub = _pq_sub(v).localCheckpoint()
    book = _pq_codebook(sub)
    enc = sub.select(
        "vec_id",
        "m",
        "sv",
        _pq_assign_udf(
            sorted(book.collect(), key=lambda r: (r.m, r.code))
        )(F.col("m"), F.col("sv")).alias("code"),
    ).select("vec_id", "m", "code")
    qs = sub.where(F.col("vec_id") == 0).select(
        "m", F.col("sv").alias("qsv")
    )
    dtab = book.join(F.broadcast(qs), "m").select(
        "m",
        "code",
        F.floor(_pq_dist_col(F.col("qsv"), F.col("cw")) * PQ_SCALE)
        .cast("long")
        .alias("d_i"),
    )
    return (
        enc.where(F.col("vec_id") != 0)
        .join(F.broadcast(dtab), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d_i").alias("adc_nano"))
    )


PQ_RERANK = 50  # ADC shortlist size for the exact rerank stage


def sim_ann_pq_recall(spark, sf_dir):
    """PQ quality, quantified (symmetric with the LSH and IVF recall
    rows) against the exact squared-L2 brute-force top-10 truth, at
    BOTH stages of the production IVF-PQ design: recall_adc = the raw
    32-bit-code ADC top-10 (isolates pure quantization loss), and
    recall_rerank = exact rerank of the ADC top-PQ_RERANK shortlist —
    the standard two-stage read path, where ADC only needs to be good
    enough to keep true neighbors inside a C-candidate shortlist.
    One row: n_true, n_hit_adc, recall_adc, n_hit_rerank,
    recall_rerank."""
    import functools

    v = _ivf_v(spark, sf_dir)
    q = v.where(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    terms = [
        (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        * (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        for i in range(LSH_DIM)
    ]
    d = functools.reduce(lambda a, b: a + b, terms)
    exact = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", d.alias("d"))
    )
    truth = exact.orderBy("d", "vec_id").limit(10).select("vec_id")
    adc = _pq_adc(spark, sf_dir).localCheckpoint()
    found_adc = adc.orderBy("adc_nano", "vec_id").limit(10).select("vec_id")
    shortlist = adc.orderBy("adc_nano", "vec_id").limit(PQ_RERANK).select("vec_id")
    found_rr = (
        exact.join(F.broadcast(shortlist), "vec_id", "left_semi")
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    hit_adc = truth.join(found_adc, "vec_id", "left_semi")
    hit_rr = truth.join(found_rr, "vec_id", "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(hit_adc.agg(F.count(F.lit(1)).alias("n_hit_adc")))
        .crossJoin(hit_rr.agg(F.count(F.lit(1)).alias("n_hit_rerank")))
        .select(
            "n_true",
            "n_hit_adc",
            F.expr("n_hit_adc * 1000000L div n_true").alias(
                "recall_adc_ppm"
            ),
            "n_hit_rerank",
            F.expr("n_hit_rerank * 1000000L div n_true").alias(
                "recall_rerank_ppm"
            ),
        )
    )


def _pq_sqdist_sql(a: str, b: str, dim: int = PQ_SUBDIM) -> str:
    return " + ".join(
        f"({a}[{i + 1}]-{b}[{i + 1}])*({a}[{i + 1}]-{b}[{i + 1}])"
        for i in range(dim)
    )


def _pq_ctes(src: str = "v", include_base: bool = True) -> tuple[str, str, str]:
    """(CTE block, final codebook name, encoding name) mirroring
    _pq_codebook + the final encode, step for step. MATERIALIZED for
    the same planner-blowup reason as _ivf_trained_ctes. ``src`` is
    the (vec_id, emb) table to quantize — 'v' for raw embeddings,
    a residual CTE for composed IVF-PQ; ``include_base=False`` skips
    emitting the 'v' CTE when the caller's chain already defines it."""
    sub_rows = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, emb[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}] AS sv FROM {src}"
        for m in range(PQ_M)
    )
    cent_list = ", ".join(
        f"CAST(SUM(CAST(sv[{i + 1}] AS DECIMAL(24,10))) AS DOUBLE) / COUNT(*)"
        for i in range(PQ_SUBDIM)
    )
    ctes = []
    if include_base:
        ctes.append(
            "v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"
        )
    ctes += [
        f"sub AS MATERIALIZED ({sub_rows})",
        f"b0 AS MATERIALIZED (SELECT m, CAST(vec_id AS INT) AS code, sv AS cw "
        f"FROM sub WHERE vec_id BETWEEN 1 AND {PQ_K})",
    ]
    prev = "b0"
    for it in range(1, PQ_ITERS + 1):
        ctes.append(
            f"""pa{it} AS MATERIALIZED (
  SELECT vec_id, m, sv, code FROM (
    SELECT s.vec_id, s.m, s.sv, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {_pq_sqdist_sql('s.sv', 'c.cw')} ASC, c.code) AS rn
    FROM sub s JOIN {prev} c ON c.m = s.m) WHERE rn = 1)"""
        )
        ctes.append(
            f"b{it} AS MATERIALIZED (SELECT m, code, [{cent_list}] AS cw "
            f"FROM pa{it} GROUP BY m, code)"
        )
        prev = f"b{it}"
    ctes.append(
        f"""enc AS MATERIALIZED (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {_pq_sqdist_sql('s.sv', 'c.cw')} ASC, c.code) AS rn
    FROM sub s JOIN {prev} c ON c.m = s.m) WHERE rn = 1)"""
    )
    return ",\n".join(ctes), prev, "enc"


def _pq_sql() -> str:
    ctes, bfin, enc = _pq_ctes()
    return f"""
WITH {ctes},
qs AS (SELECT m, sv AS qsv FROM sub WHERE vec_id = 0),
dtab AS MATERIALIZED (
  SELECT c.m, c.code,
         CAST(FLOOR(({_pq_sqdist_sql('q.qsv', 'c.cw')}) * {PQ_SCALE!r}) AS BIGINT) AS d_i
  FROM {bfin} c JOIN qs q ON q.m = c.m)
SELECT e.vec_id, CAST(SUM(d.d_i) AS BIGINT) AS adc_nano
FROM {enc} e JOIN dtab d ON d.m = e.m AND d.code = e.code
WHERE e.vec_id <> 0
GROUP BY e.vec_id
ORDER BY adc_nano, vec_id
LIMIT 10
"""


SIM_PQ_SQL = _pq_sql()


def _pq_recall_sql() -> str:
    ctes, bfin, enc = _pq_ctes()
    full_d = " + ".join(
        f"(a.emb[{i + 1}]-q.q_emb[{i + 1}])*(a.emb[{i + 1}]-q.q_emb[{i + 1}])"
        for i in range(LSH_DIM)
    )
    return f"""
WITH {ctes},
qs AS (SELECT m, sv AS qsv FROM sub WHERE vec_id = 0),
dtab AS MATERIALIZED (
  SELECT c.m, c.code,
         CAST(FLOOR(({_pq_sqdist_sql('q.qsv', 'c.cw')}) * {PQ_SCALE!r}) AS BIGINT) AS d_i
  FROM {bfin} c JOIN qs q ON q.m = c.m),
adc AS MATERIALIZED (
  SELECT e.vec_id, SUM(d.d_i) AS adc_nano
  FROM {enc} e JOIN dtab d ON d.m = e.m AND d.code = e.code
  WHERE e.vec_id <> 0
  GROUP BY e.vec_id),
found_adc AS MATERIALIZED (
  SELECT vec_id FROM adc ORDER BY adc_nano, vec_id LIMIT 10),
shortlist AS MATERIALIZED (
  SELECT vec_id FROM adc ORDER BY adc_nano, vec_id LIMIT {PQ_RERANK}),
qq AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
exact AS MATERIALIZED (
  SELECT a.vec_id, ({full_d}) AS d
  FROM v a, qq q WHERE a.vec_id <> 0),
truth AS MATERIALIZED (
  SELECT vec_id FROM exact ORDER BY d, vec_id LIMIT 10),
found_rr AS MATERIALIZED (
  SELECT e.vec_id FROM exact e JOIN shortlist s ON s.vec_id = e.vec_id
  ORDER BY e.d, e.vec_id LIMIT 10)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM truth t JOIN found_adc f ON f.vec_id = t.vec_id) AS n_hit_adc,
       (SELECT COUNT(*) FROM truth t JOIN found_adc f ON f.vec_id = t.vec_id) * 1000000
             // (SELECT COUNT(*) FROM truth) AS recall_adc_ppm,
       (SELECT COUNT(*) FROM truth t JOIN found_rr f ON f.vec_id = t.vec_id) AS n_hit_rerank,
       (SELECT COUNT(*) FROM truth t JOIN found_rr f ON f.vec_id = t.vec_id) * 1000000
             // (SELECT COUNT(*) FROM truth) AS recall_rerank_ppm
"""


SIM_PQ_RECALL_SQL = _pq_recall_sql()


def _resid_list(emb: str, cent: str) -> str:
    return "[" + ", ".join(
        f"{emb}[{i + 1}]-{cent}[{i + 1}]" for i in range(LSH_DIM)
    ) + "]"


def sim_ann_ivfpq_topk(spark, sf_dir):
    """Composed IVF-PQ (Jégou et al. 2011, §IV — the architecture
    FAISS calls IVFPQ and every billion-vector deployment runs): the
    trained coarse quantizer routes each vector to a cell, PQ encodes
    the RESIDUAL emb − centroid(cell) (residuals are centered, so the
    same code budget quantizes them far better than raw vectors), and
    a query probes nprobe cells, building a PER-CELL ADC table from
    its per-cell query residual. Candidates join their cell's table on
    (cell, m, code) — the inner join against the probed-cells-only
    table IS the probe filter; vectors in unprobed cells match nothing.

    Every ingredient reuses an already-oracle-verified chain: the
    coarse k-means from sim_ann_ivf_topk, the per-subspace codebook
    discipline from sim_ann_pq_topk, integer-nanounit ADC sums, the
    shared FP fold. Plan: two map-only argmin scans (cell, then code),
    one broadcast of the ≤ nprobe·M·K distance table, one hash
    aggregate keyed by vec_id."""
    v = _ivf_v(spark, sf_dir)
    cents, assigned = _ivf_trained_cents(v)
    cents = cents.localCheckpoint()
    resid = (
        assigned.join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            "cell",
            F.array(
                *[
                    F.col("emb").getItem(i) - F.col("cent").getItem(i)
                    for i in range(LSH_DIM)
                ]
            ).alias("emb"),
        )
        .localCheckpoint()
    )
    sub = _pq_sub(resid.select("vec_id", "emb")).localCheckpoint()
    book = _pq_codebook(sub)
    enc = sub.select(
        "vec_id",
        "m",
        _pq_assign_udf(
            sorted(book.collect(), key=lambda r: (r.m, r.code))
        )(F.col("m"), F.col("sv")).alias("code"),
    )
    q = v.where(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            _arr_dot(F.col("cent"), F.col("q_emb"))
            / (_arr_norm(F.col("cent")) * _arr_norm(F.col("q_emb"))),
        )
        .orderBy(F.col("sim").desc(), F.col("cell"))
        .limit(IVF_NPROBE)
        .select("cell")
    )
    qres = (
        cents.join(F.broadcast(probe_cells), "cell")
        .crossJoin(F.broadcast(q))
        .select(
            "cell",
            F.array(
                *[
                    F.col("q_emb").getItem(i) - F.col("cent").getItem(i)
                    for i in range(LSH_DIM)
                ]
            ).alias("emb"),
        )
    )
    parts = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice("emb", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        )
        for m in range(PQ_M)
    ]
    qsub = qres.select("cell", F.explode(F.array(*parts)).alias("p")).select(
        "cell", F.col("p.m").alias("m"), F.col("p.sv").alias("qsv")
    )
    dtab = book.join(F.broadcast(qsub), "m").select(
        "cell",
        "m",
        "code",
        F.floor(_pq_dist_col(F.col("qsv"), F.col("cw")) * PQ_SCALE)
        .cast("long")
        .alias("d_i"),
    )
    return (
        enc.where(F.col("vec_id") != 0)
        .join(assigned.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(dtab), ["cell", "m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d_i").alias("adc_nano"))
        .orderBy("adc_nano", "vec_id")
        .limit(10)
    )


def _ivfpq_sql() -> str:
    ivf_ctes, cfin, afin = _ivf_trained_ctes()
    pq_ctes, bfin, enc = _pq_ctes(src="resid", include_base=False)
    qsub_rows = " UNION ALL ".join(
        f"SELECT cell, {m} AS m, emb[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}] AS sv FROM qres"
        for m in range(PQ_M)
    )
    return f"""
WITH {ivf_ctes},
resid AS MATERIALIZED (
  SELECT a.vec_id, {_resid_list('a.emb', 'c.cent')} AS emb
  FROM {afin} a JOIN {cfin} c ON c.cell = a.cell),
{pq_ctes},
q AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
probe AS MATERIALIZED (
  SELECT cell FROM {cfin}, q
  ORDER BY ({_dot_sql('cent', 'q_emb')})
           / (sqrt({_dot_sql('cent', 'cent')}) * sqrt({_dot_sql('q_emb', 'q_emb')})) DESC, cell
  LIMIT {IVF_NPROBE}),
qres AS MATERIALIZED (
  SELECT c.cell, {_resid_list('q.q_emb', 'c.cent')} AS emb
  FROM {cfin} c JOIN probe p ON p.cell = c.cell, q),
qsub AS ({qsub_rows}),
dtab AS MATERIALIZED (
  SELECT s.cell, b.m, b.code,
         CAST(FLOOR(({_pq_sqdist_sql('s.sv', 'b.cw')}) * {PQ_SCALE!r}) AS BIGINT) AS d_i
  FROM qsub s JOIN {bfin} b ON b.m = s.m)
SELECT e.vec_id, CAST(SUM(d.d_i) AS BIGINT) AS adc_nano
FROM {enc} e
JOIN {afin} a ON a.vec_id = e.vec_id
JOIN dtab d ON d.cell = a.cell AND d.m = e.m AND d.code = e.code
WHERE e.vec_id <> 0
GROUP BY e.vec_id
ORDER BY adc_nano, e.vec_id
LIMIT 10
"""


SIM_IVFPQ_SQL = _ivfpq_sql()


def sim_ann_ivfpq_recall(spark, sf_dir):
    """Composed IVF-PQ quality, quantified (the last recall row — LSH,
    IVF, PQ and IVFPQ are now all graded the same way): recall@10 of
    the probed+quantized answer against the exact squared-L2
    brute-force top-10. Unlike sim_ann_pq_recall this number folds in
    BOTH loss sources — coarse-probe misses (the true neighbor's cell
    wasn't probed) and residual-quantization error. One row: n_true,
    n_hit, recall."""
    import functools

    v = _ivf_v(spark, sf_dir)
    q = v.where(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    terms = [
        (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        * (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        for i in range(LSH_DIM)
    ]
    d = functools.reduce(lambda a, b: a + b, terms)
    truth = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    found = sim_ann_ivfpq_topk(spark, sf_dir).select("vec_id")
    hit = truth.join(found, "vec_id", "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true",
            "n_hit",
            F.expr("n_hit * 1000000L div n_true").alias("recall_ppm"),
        )
    )


def _ivfpq_recall_sql() -> str:
    body = _ivfpq_sql().strip()
    assert body.startswith("WITH ")
    # reuse the full topk statement as a CTE
    full_d = " + ".join(
        f"(a.emb[{i + 1}]-qq.q_emb[{i + 1}])*(a.emb[{i + 1}]-qq.q_emb[{i + 1}])"
        for i in range(LSH_DIM)
    )
    select_at = body.index("SELECT e.vec_id, CAST(SUM(d.d_i)")
    ctes, final_select = body[:select_at].rstrip().rstrip(","), body[select_at:]
    return f"""{ctes},
found AS MATERIALIZED (
  {final_select}),
qq2 AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
truth AS MATERIALIZED (
  SELECT a.vec_id FROM v a, qq2 qq WHERE a.vec_id <> 0
  ORDER BY ({full_d}), a.vec_id LIMIT 10)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM truth t JOIN found f ON f.vec_id = t.vec_id) AS n_hit,
       (SELECT COUNT(*) FROM truth t JOIN found f ON f.vec_id = t.vec_id) * 1000000
             // (SELECT COUNT(*) FROM truth) AS recall_ppm
"""


SIM_IVFPQ_RECALL_SQL = _ivfpq_recall_sql()

IVFPQ_NPROBES = (1, 2, 4)


def sim_ann_ivfpq_nprobe(spark, sf_dir):
    """The recall-vs-nprobe curve for composed IVF-PQ — the knob a
    production deployment actually tunes (probe more cells → scan more
    inverted lists → higher recall, linearly more work). ONE trained
    index (coarse cells + residual codebook, both the oracle-verified
    chains) is shared across the sweep; each nprobe re-probes and
    re-scores only. One row per nprobe: n_hit@10 and recall@10 vs the
    exact squared-L2 truth."""
    import functools

    v = _ivf_v(spark, sf_dir)
    cents, assigned = _ivf_trained_cents(v)
    cents = cents.localCheckpoint()
    assigned = assigned.localCheckpoint()
    resid = (
        assigned.join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            F.array(
                *[
                    F.col("emb").getItem(i) - F.col("cent").getItem(i)
                    for i in range(LSH_DIM)
                ]
            ).alias("emb"),
        )
        .localCheckpoint()
    )
    sub = _pq_sub(resid).localCheckpoint()
    book = _pq_codebook(sub).localCheckpoint()
    enc = sub.select(
        "vec_id",
        "m",
        _pq_assign_udf(
            sorted(book.collect(), key=lambda r: (r.m, r.code))
        )(F.col("m"), F.col("sv")).alias("code"),
    ).localCheckpoint()
    q = v.where(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    terms = [
        (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        * (F.col("emb").getItem(i) - F.col("q_emb").getItem(i))
        for i in range(LSH_DIM)
    ]
    d = functools.reduce(lambda a, b: a + b, terms)
    truth = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
        .localCheckpoint()
    )
    ranked = (
        cents.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            _arr_dot(F.col("cent"), F.col("q_emb"))
            / (_arr_norm(F.col("cent")) * _arr_norm(F.col("q_emb"))),
        )
        .localCheckpoint()
    )
    parts = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice("emb", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        )
        for m in range(PQ_M)
    ]
    out = None
    for np_ in IVFPQ_NPROBES:
        probe = (
            ranked.orderBy(F.col("sim").desc(), F.col("cell"))
            .limit(np_)
            .select("cell")
        )
        qres = (
            cents.join(F.broadcast(probe), "cell")
            .crossJoin(F.broadcast(q))
            .select(
                "cell",
                F.array(
                    *[
                        F.col("q_emb").getItem(i) - F.col("cent").getItem(i)
                        for i in range(LSH_DIM)
                    ]
                ).alias("emb"),
            )
        )
        qsub = qres.select(
            "cell", F.explode(F.array(*parts)).alias("p")
        ).select("cell", F.col("p.m").alias("m"), F.col("p.sv").alias("qsv"))
        dtab = book.join(F.broadcast(qsub), "m").select(
            "cell",
            "m",
            "code",
            F.floor(_pq_dist_col(F.col("qsv"), F.col("cw")) * PQ_SCALE)
            .cast("long")
            .alias("d_i"),
        )
        found = (
            enc.where(F.col("vec_id") != 0)
            .join(assigned.select("vec_id", "cell"), "vec_id")
            .join(F.broadcast(dtab), ["cell", "m", "code"])
            .groupBy("vec_id")
            .agg(F.sum("d_i").alias("adc_nano"))
            .orderBy("adc_nano", "vec_id")
            .limit(10)
            .select("vec_id")
        )
        hit = truth.join(found, "vec_id", "left_semi")
        row = hit.agg(F.count(F.lit(1)).alias("n_hit")).select(
            F.lit(np_).alias("nprobe"),
            "n_hit",
            F.expr("n_hit * 1000000L div 10").alias("recall_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


def _ivfpq_nprobe_sql() -> str:
    ivf_ctes, cfin, afin = _ivf_trained_ctes()
    pq_ctes, bfin, enc = _pq_ctes(src="resid", include_base=False)
    full_d = " + ".join(
        f"(a.emb[{i + 1}]-qq.q_emb[{i + 1}])*(a.emb[{i + 1}]-qq.q_emb[{i + 1}])"
        for i in range(LSH_DIM)
    )
    per_np = []
    selects = []
    for np_ in IVFPQ_NPROBES:
        qsub_rows = " UNION ALL ".join(
            f"SELECT cell, {m} AS m, emb[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}] AS sv FROM qres{np_}"
            for m in range(PQ_M)
        )
        per_np.append(f"""probe{np_} AS MATERIALIZED (
  SELECT cell FROM {cfin}, q
  ORDER BY ({_dot_sql('cent', 'q_emb')})
           / (sqrt({_dot_sql('cent', 'cent')}) * sqrt({_dot_sql('q_emb', 'q_emb')})) DESC, cell
  LIMIT {np_}),
qres{np_} AS MATERIALIZED (
  SELECT c.cell, {_resid_list('q.q_emb', 'c.cent')} AS emb
  FROM {cfin} c JOIN probe{np_} p ON p.cell = c.cell, q),
dtab{np_} AS MATERIALIZED (
  SELECT s.cell, b.m, b.code,
         CAST(FLOOR(({_pq_sqdist_sql('s.sv', 'b.cw')}) * {PQ_SCALE!r}) AS BIGINT) AS d_i
  FROM ({qsub_rows}) s JOIN {bfin} b ON b.m = s.m),
found{np_} AS MATERIALIZED (
  SELECT e.vec_id FROM {enc} e
  JOIN {afin} a ON a.vec_id = e.vec_id
  JOIN dtab{np_} d ON d.cell = a.cell AND d.m = e.m AND d.code = e.code
  WHERE e.vec_id <> 0
  GROUP BY e.vec_id
  ORDER BY SUM(d.d_i), e.vec_id
  LIMIT 10)""")
        selects.append(
            f"SELECT {np_} AS nprobe, "
            f"(SELECT COUNT(*) FROM truth t JOIN found{np_} f ON f.vec_id = t.vec_id) AS n_hit, "
            f"(SELECT COUNT(*) FROM truth t JOIN found{np_} f ON f.vec_id = t.vec_id) * 1000000 // 10 AS recall_ppm"
        )
    np_block = ",\n".join(per_np)
    sel_block = " UNION ALL ".join(selects)
    return f"""
WITH {ivf_ctes},
resid AS MATERIALIZED (
  SELECT a.vec_id, {_resid_list('a.emb', 'c.cent')} AS emb
  FROM {afin} a JOIN {cfin} c ON c.cell = a.cell),
{pq_ctes},
q AS (SELECT emb AS q_emb FROM v WHERE vec_id = 0),
truth AS MATERIALIZED (
  SELECT a.vec_id FROM v a, q qq WHERE a.vec_id <> 0
  ORDER BY ({full_d}), a.vec_id LIMIT 10),
{np_block}
{sel_block}
ORDER BY nprobe
"""


SIM_IVFPQ_NPROBE_SQL = _ivfpq_nprobe_sql()


# ---------------------------------------------------------------------------
# Near-dup family on documents (engine-portable hashes → full oracles)
# ---------------------------------------------------------------------------

MH_PERMS, MH_BANDS, MH_ROWS = 16, 4, 4   # 4 bands × 4 rows
# Rerank threshold (jaccard 0.5) in integer ppm: every jaccard the
# family emits or filters on is the exact BIGINT floor-division
# n_common*1000000 div union — never a ROUND(double, k) ratio, the
# float-ratio class that hash-failed in the r3 driver environment
# (VERDICT r3 "What's wrong" #1).
MH_JACCARD_PPM = 500000
SHINGLE_WORDS = 3                         # word 3-grams
# Document-frequency cap for the inverted-index candidate joins
# (VERDICT r2 item 2): a shingle appearing in > cap docs (boilerplate,
# navigation chrome) is excluded from CANDIDATE GENERATION — df=10⁵
# would make 10¹⁰ pairs from one key. The exact-Jaccard rerank still
# runs over FULL shingle sets, so reported values are true Jaccard;
# what the cap costs is pairs whose EVERY shared shingle is hot — i.e.
# members of a mass-duplicate cluster larger than the cap, which the
# exact-dedup pass (d_exact_dedup) catches first. Both engines apply
# the identical cap, so the oracle gate stays value-exact.
SHINGLE_DF_CAP = 50


def _shingles_from(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per (doc_id, text) DataFrame —
    the kernel behind _doc_shingles, reused by the streaming
    incremental near-dup face (streaming/neardup.py) so batch and
    stream shingle identically."""
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= SHINGLE_WORDS)
    # The explode + per-shingle md5 below is the md5-heavy map of the
    # whole minhash family; a single-row-group parquet file gives the
    # scan ONE task, so without this spread the hashing runs on one
    # core (measured: ~4 s of the fresh minhash cost at sf0.1).
    # Explicit numPartitions is exempt from AQE coalescing.
    par = max(2, int(d.sparkSession.sparkContext.defaultParallelism))
    w = w.repartition(par)
    return w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
            )
        ).alias("shingle"),
    ).distinct()


def _doc_shingles(spark, sf_dir):
    """Distinct word-3-gram shingles per document (lowercased,
    whitespace-tokenized) — shared by MinHash, recall, and the exact
    Jaccard path."""
    return _shingles_from(_t(spark, sf_dir, "documents"))


_SHINGLES_CTE = """
words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents),
shingles AS (SELECT DISTINCT doc_id,
                    unnest(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
             FROM words WHERE len(w) >= 3)
"""


def _minhash_bands(shingles: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): 16 portable min-hashes in ONE groupBy
    pass, banded 4×4 via a posexplode (no per-band recompute of the
    aggregate lineage — the r1 plan re-read it 4×).

    One md5 per shingle, not 16: Kirsch-Mitzenmacher double hashing
    h_i = h1 + i·h2 with h1 = 60 bits (hex 1-15) and h2 = 48 bits
    (hex 17-28) of the same digest — i·h2 < 2^52 so the sum never
    overflows a signed 64-bit int in either engine (Spark ANSI mode
    would error on overflow; DuckDB would too)."""
    h1 = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("shingle"), 17, 12), 16, 10).cast("long")
    hashed = shingles.select("doc_id", h1.alias("_h1"), h2.alias("_h2"))
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"h{i}")
            for i in range(MH_PERMS)
        ]
    )
    band_buckets = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"h{b * MH_ROWS + j}").cast("string")
                    for j in range(MH_ROWS)
                ],
            )
        )
        for b in range(MH_BANDS)
    ]
    return mins.select(
        "doc_id", F.posexplode(F.array(*band_buckets)).alias("band", "bucket")
    )


def _minhash_bands_sql() -> str:
    h1 = "CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)"
    h2 = "CAST('0x' || substr(md5(shingle), 17, 12) AS BIGINT)"
    mins_cols = ",\n       ".join(
        f"MIN(({h1}) + {i} * ({h2})) AS h{i}" for i in range(MH_PERMS)
    )
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM mins".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(h{b * MH_ROWS + j} AS VARCHAR)" for j in range(MH_ROWS)
            ),
        )
        for b in range(MH_BANDS)
    )
    return f"""mins AS (SELECT doc_id,
       {mins_cols}
FROM shingles GROUP BY doc_id),
bands AS ({band_rows})"""


def _exact_jaccard(
    shingles: DataFrame,
    pairs: DataFrame | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard per candidate pair. ``pairs=None`` discovers
    candidates via the inverted-index self-join — with ``df_cap`` set,
    shingles in more than ``df_cap`` documents are dropped from the
    CANDIDATE join only (one hot key with df=10⁵ would emit 10¹⁰
    pairs); the per-pair intersection count then runs over the full
    shingle sets, so every emitted jaccard is the true value. See
    SHINGLE_DF_CAP for the miss characterization."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if pairs is None:
        cand_side = shingles
        if df_cap is not None:
            low_df = (
                shingles.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") <= df_cap)
                .select("shingle")
            )
            cand_side = shingles.join(low_df, "shingle", "left_semi")
        pairs = (
            cand_side.alias("a")
            .join(
                cand_side.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    inter = (
        pairs.join(
            shingles.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            shingles.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard_ppm",
            F.expr("n_common * 1000000L div (sh_a + sh_b - n_common)"),
        )
    )


def minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-dup: word-3-gram shingles → 16 portable
    min-hashes → 4×4 band-bucket join → exact Jaccard rerank ≥ 0.5.
    The whole pipeline (hash family, banding, rerank) is replicated in
    the DuckDB oracle — wrong buckets fail the gate, not just wrong
    row counts. Band-bucket join = the LSH scale path: candidates ∝
    collisions, never n²."""
    sh = _doc_shingles(spark, sf_dir)
    bands = _minhash_bands(sh)
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        _exact_jaccard(sh, pairs)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b", "jaccard_ppm")
        .orderBy("doc_a", "doc_b")
    )


MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_bands_sql()},
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
          FROM pairs p
          JOIN shingles sa ON sa.doc_id = p.doc_a
          JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
          GROUP BY p.doc_a, p.doc_b)
SELECT doc_a, doc_b,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) AS jaccard_ppm
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= {MH_JACCARD_PPM}
ORDER BY doc_a, doc_b
"""


CC_MAX_ITERS = 20  # ≥ pair-graph diameter at any plausible SF; asserted converged


def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER assignment: connected components over the
    MinHash near-dup pair graph (minhash_near_dup's output edges), so
    transitively-linked documents collapse to one keeper —
    cluster_id = min doc_id reachable, the standard dedup contract
    (A~B, B~C ⇒ A,B,C one cluster even if A~C missed the threshold).

    Spark-first iteration: min-label propagation to a fixpoint — each
    step is one edge-join + groupBy-min + least() (no windows, no n²,
    shuffle keyed by doc_id), converging in ≤ graph-diameter steps
    (bounded by CC_MAX_ITERS; the loop exits early on no-change, and
    at 100 TB near-dup components are shallow — chains longer than a
    few hops mean the threshold is mis-set). The DuckDB oracle computes
    the same labels independently via WITH RECURSIVE transitive
    closure, so convergence itself is gate-checked."""
    return _cc_labels(spark, sf_dir).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    ).orderBy("doc_id")


def _cc_labels(spark, sf_dir) -> DataFrame:
    """(doc_id, cluster_id) via min-label propagation over the MinHash
    near-dup pair graph — the loop behind dedup_clusters, shared with
    dedup_keeper_policy."""
    pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()  # frozen once; every iteration re-joins it
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("cluster_id").alias("lbl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_min"))
            .select(F.col("src").alias("doc_id"), "nbr_min")
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nbr_min", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = not (
            new_labels.select("doc_id", F.col("cluster_id").alias("new_cl"))
            .join(
                labels.select("doc_id", F.col("cluster_id").alias("old_cl")),
                "doc_id",
            )
            .where(F.col("new_cl") != F.col("old_cl"))
            .isEmpty()
        )
        labels = new_labels
        if not changed:
            break
    return labels.select("doc_id", "cluster_id")


def dedup_keeper_policy(spark, sf_dir):
    """Keeper SELECTION policy for near-dup clusters — dedup_clusters
    answers "which docs are together"; this answers the production
    question "which copy do we keep": the LONGEST version (max
    n_chars, doc_id tiebreak) per multi-doc cluster — the
    keep-most-complete rule real pipelines apply to mirrored/truncated
    page families (min-doc_id keeps whichever copy happened to be
    crawled first, including the truncated one). One join of the
    labels onto documents + one partitioned window; clusters are tiny
    by construction so the window never sees a hot partition."""
    labels = _cc_labels(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id")
    rk = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        labels.join(d, "doc_id")
        .withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("rk", F.row_number().over(rk))
        .where((F.col("rk") == 1) & (F.col("n_docs") >= 2))
        .select(
            "cluster_id",
            "n_docs",
            F.col("doc_id").alias("keeper_doc"),
            F.col("n_chars").alias("keeper_chars"),
        )
        .orderBy("cluster_id")
    )


# formatted below, after _minhash_near_ctes is defined
_DEDUP_KEEPER_TEMPLATE = """
WITH RECURSIVE {near_ctes},
cedges AS (SELECT doc_a AS src, doc_b AS dst FROM near
           UNION ALL SELECT doc_b, doc_a FROM near),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN cedges e ON e.src = r.doc_id
),
labels AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id),
sized AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY l.cluster_id) AS n_docs
  FROM labels l JOIN documents d USING (doc_id))
SELECT cluster_id, n_docs, doc_id AS keeper_doc, n_chars AS keeper_chars
FROM sized WHERE rk = 1 AND n_docs >= 2
ORDER BY cluster_id
"""


def _minhash_near_ctes() -> str:
    """CTE block ending in ``near(doc_a, doc_b)`` — MINHASH_SQL's
    pipeline as a reusable prefix."""
    return f"""{_SHINGLES_CTE},
{_minhash_bands_sql()},
mpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
msizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
minter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
           FROM mpairs p
           JOIN shingles sa ON sa.doc_id = p.doc_a
           JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
           GROUP BY p.doc_a, p.doc_b),
near AS (SELECT doc_a, doc_b FROM minter
         JOIN msizes sa ON sa.doc_id = doc_a JOIN msizes sb ON sb.doc_id = doc_b
         WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= {MH_JACCARD_PPM})"""


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_minhash_near_ctes()},
cedges AS (SELECT doc_a AS src, doc_b AS dst FROM near
           UNION ALL SELECT doc_b, doc_a FROM near),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN cedges e ON e.src = r.doc_id
)
SELECT doc_id, MIN(lbl) AS cluster_id, doc_id = MIN(lbl) AS is_keeper
FROM reach GROUP BY doc_id ORDER BY doc_id
"""


DEDUP_KEEPER_SQL = _DEDUP_KEEPER_TEMPLATE.format(
    near_ctes=_minhash_near_ctes()
)


CURATE_MIN_TOKENS = 5  # drop near-empty documents from the training set


def t_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the training-data op that removes
    documents overlapping an evaluation set (word-n-gram collision, the
    standard GPT-3/PaLM-style 13-gram check; n=4 here because the
    synthetic corpus' ~30-word vocabulary makes 13-grams vacuous).

    Benchmark set = docs with doc_id % 25 == 0 (stand-in for a held-out
    eval suite). A corpus doc is contaminated iff it shares ≥1 distinct
    word-4-gram with any benchmark doc; output = contaminated docs with
    their shared-gram counts.

    100 TB posture: the benchmark side is tiny (eval suites are
    thousands of docs vs billions in the corpus), so its distinct grams
    BROADCAST — the corpus is scanned once, gram-exploded map-side, and
    semi-joined with no corpus shuffle at all; the only shuffle is the
    final per-doc count, keyed by doc_id."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 4)
    grams = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 4), "
                "i -> concat(w[i],' ',w[i+1],' ',w[i+2],' ',w[i+3]))"
            )
        ).alias("g"),
    ).distinct()
    bench = (
        grams.where(F.col("doc_id") % 25 == 0).select("g").distinct()
    )
    return (
        grams.where(F.col("doc_id") % 25 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy("doc_id")
    )


T_DECONTAM_SQL = """
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
  FROM words WHERE len(w) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0)
SELECT doc_id, COUNT(*) AS n_shared_grams
FROM grams
WHERE doc_id % 25 <> 0 AND g IN (SELECT g FROM bench)
GROUP BY doc_id
ORDER BY doc_id
"""


def pipeline_curate(spark, sf_dir):
    """Flagship training-data curation pipeline — the composition a
    100 TB pretraining run actually executes, end to end in one plan:
    language-ID + token floor + repetition gate + exact-dup keeper +
    MinHash near-dup cluster keeper + benchmark decontamination, folded
    into a single per-document ``keep`` decision with every gate's
    verdict kept as a column (so rejected docs are auditable, not
    silently dropped).

    Every stage is a reused oracle-green operator (t_lang_id,
    t_quality_score, t_repetition_filter, d_exact_dedup's keeper rule,
    dedup_clusters, t_decontaminate); the joins are all on doc_id, so
    once the first stage shuffles onto doc_id the rest co-locate — at
    scale this is a chain of hash aggregations + one label-propagation
    fixpoint + one broadcast semi-join, never n². The DuckDB oracle
    recomputes all six gates independently.

    decontam_ok drops both the contaminated docs AND the benchmark
    members themselves (eval documents must never train)."""
    d = _t(spark, sf_dir, "documents")
    lang = t_lang_id(spark, sf_dir)
    qual = t_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "stopword_ratio"
    )
    rep = t_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_ok")
    )
    docfp = d.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", "\\s+", " "))).alias("fingerprint"),
    )
    exact = docfp.join(
        docfp.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper")),
        "fingerprint",
    ).select("doc_id", (F.col("doc_id") == F.col("keeper")).alias("exact_keeper"))
    near = dedup_clusters(spark, sf_dir).select(
        "doc_id", F.col("is_keeper").alias("near_keeper")
    )
    contam = t_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_hit")
    )
    return (
        d.select("doc_id")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(exact, "doc_id")
        .join(near, "doc_id")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "pred_lang",
            "n_tokens",
            "stopword_ratio",
            "rep_ok",
            "exact_keeper",
            "near_keeper",
            ((F.col("doc_id") % 25 != 0) & F.col("_hit").isNull()).alias(
                "decontam_ok"
            ),
        )
        .withColumn(
            "keep",
            (F.col("pred_lang") == "en")
            & (F.col("n_tokens") >= CURATE_MIN_TOKENS)
            & F.col("rep_ok")
            & F.col("exact_keeper")
            & F.col("near_keeper")
            & F.col("decontam_ok"),
        )
        .orderBy("doc_id")
    )


PIPELINE_CURATE_SQL = f"""
SELECT d.doc_id, l.pred_lang, q.n_tokens, q.stopword_ratio,
       r.keep AS rep_ok, e.exact_keeper, n.is_keeper AS near_keeper,
       (d.doc_id % 25 <> 0 AND c.doc_id IS NULL) AS decontam_ok,
       (l.pred_lang = 'en' AND q.n_tokens >= {CURATE_MIN_TOKENS}
        AND r.keep AND e.exact_keeper AND n.is_keeper
        AND d.doc_id % 25 <> 0 AND c.doc_id IS NULL) AS keep
FROM documents d
JOIN ({T_LANG_SQL}) l ON l.doc_id = d.doc_id
JOIN (SELECT doc_id, n_tokens, stopword_ratio FROM ({T_QUALITY_SQL})) q
  ON q.doc_id = d.doc_id
JOIN ({T_REPETITION_SQL}) r ON r.doc_id = d.doc_id
JOIN (SELECT doc_id,
             doc_id = MIN(doc_id) OVER (
               PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))
             ) AS exact_keeper
      FROM documents) e ON e.doc_id = d.doc_id
JOIN ({DEDUP_CLUSTERS_SQL}) n ON n.doc_id = d.doc_id
LEFT JOIN ({T_DECONTAM_SQL}) c ON c.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def minhash_recall(spark, sf_dir):
    """LSH quality, quantified (the checked scalar the hash family
    owes): recall of the band-bucket candidate set against the exact
    Jaccard ≥ 0.5 truth. One row: n_true, n_candidates, n_hit,
    recall_ppm (exact BIGINT floor-division) — all reproduced by the
    oracle."""
    sh = _doc_shingles(spark, sf_dir)
    truth = (
        _exact_jaccard(sh, None, df_cap=SHINGLE_DF_CAP)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b")
    )
    bands = _minhash_bands(sh)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.expr("n_hit * 1000000L div n_true").alias("recall_ppm"),
        )
    )


MINHASH_RECALL_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_bands_sql()},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
sh_low AS (SELECT * FROM shingles WHERE shingle IN
           (SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {SHINGLE_DF_CAP})),
cand_all AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh_low a JOIN sh_low b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter_all AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
              FROM cand_all p
              JOIN shingles sa ON sa.doc_id = p.doc_a
              JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY 1, 2),
truth AS (SELECT doc_a, doc_b FROM inter_all
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= {MH_JACCARD_PPM}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
hit AS (SELECT * FROM truth WHERE (doc_a, doc_b) IN (SELECT (doc_a, doc_b) FROM cand))
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       (SELECT COUNT(*) FROM hit) * 1000000
           // (SELECT COUNT(*) FROM truth) AS recall_ppm
"""


def d_shingle_df_spectrum(spark, sf_dir):
    """Shingle document-frequency spectrum — the sizing evidence
    behind SHINGLE_DF_CAP (VERDICT r2 flagged the uncapped
    inverted-index join as the 100 TB scale-killer: one df=10⁵
    boilerplate shingle mints 10¹⁰ candidate pairs; the cap fixes it,
    and THIS table is how the cap value is chosen — the join cost is
    Σ df² over the index, so the spectrum shows exactly which df
    bands carry the quadratic mass). Per log2-df band: shingle count,
    posting count, posting share in exact BIGINT ppm, the Σdf²
    pair-cost share in ppm (the quadratic column — the one the cap
    is aimed at), and the shingles the deployed cap drops.

    100 TB posture: one hash(shingle) df aggregate (the inverted
    index's own build shuffle) + one ≤ 40-row band rollup + a 1-row
    totals crossJoin."""
    sh = _doc_shingles(spark, sf_dir)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    bands = (
        dfreq.select(
            F.expr("length(bin(df))").alias("band"),
            "df",
            F.expr(
                f"if(df > {SHINGLE_DF_CAP}, 1L, 0L)"
            ).alias("capped"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").alias("n_postings"),
            F.sum(F.expr("df * df")).alias("sum_df_sq"),
            F.sum("capped").alias("n_capped"),
        )
    )
    totals = bands.agg(
        F.sum("n_postings").alias("tot_post"),
        F.sum("sum_df_sq").alias("tot_sq"),
    )
    return (
        bands.crossJoin(totals)
        .select(
            "band",
            F.expr("shiftleft(1L, band - 1)").alias("min_df"),
            "n_shingles",
            "n_postings",
            F.expr("n_postings * 1000000L div tot_post").alias(
                "posting_share_ppm"
            ),
            F.expr("sum_df_sq * 1000000L div tot_sq").alias(
                "paircost_share_ppm"
            ),
            "n_capped",
        )
        .orderBy("band")
    )


D_DF_SPECTRUM_SQL = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
          FROM shingles GROUP BY shingle),
bands AS (
  SELECT length(bin(df)) AS band, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(df) AS BIGINT) AS n_postings,
         CAST(SUM(df * df) AS BIGINT) AS sum_df_sq,
         CAST(SUM(CASE WHEN df > {SHINGLE_DF_CAP} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_capped
  FROM dfreq GROUP BY 1),
totals AS (SELECT CAST(SUM(n_postings) AS BIGINT) AS tot_post,
                  CAST(SUM(sum_df_sq) AS BIGINT) AS tot_sq FROM bands)
SELECT band, (1::BIGINT << (band - 1)) AS min_df, n_shingles, n_postings,
       n_postings * 1000000 // tot_post AS posting_share_ppm,
       sum_df_sq * 1000000 // tot_sq AS paircost_share_ppm,
       n_capped
FROM bands CROSS JOIN totals
ORDER BY band
"""


MH_SWEEP = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))


def minhash_banding_sweep(spark, sf_dir):
    """Recall/precision vs banding configuration — the (bands × rows)
    S-curve a dedup deployment tunes against (Leskovec/Rajaraman/
    Ullman MMDS §3.4: collision probability 1−(1−s^r)^b; many narrow
    bands catch everything and flood the rerank, few wide bands are
    precise and blind). Same discipline as sim_ann_ivfpq_nprobe: ONE
    shared index (the 16 Kirsch-Mitzenmacher min-hashes, computed
    once and localCheckpointed) swept through five splits of the same
    signature — 16×1, 8×2, 4×4 (the deployed minhash_near_dup
    config), 2×8, 1×16 — so the sweep measures the banding choice,
    nothing else. Truth is minhash_recall's df-capped exact-Jaccard ≥
    0.5 set; recall and precision in exact BIGINT ppm.

    100 TB posture: all five configs ride ONE tagged band table and
    ONE self-join on (config, band, bucket) — candidates stay
    collision-bounded per config, never n²; counts are three hash
    aggregates on the pair table.

    Measured at sf0.01: recall flat at 960000 ppm (the synthetic
    dups are near-identical, Jaccard ≈ 1, so even 1×16 catches them;
    the one miss sits at the 0.5 threshold where 1−(1−s^r)^b bites)
    while precision rises monotonically 170212 → 183206 ppm as bands
    widen — the sweep's tuning signal is the candidate-set cost, 141
    → 131 pairs."""
    sh = _doc_shingles(spark, sf_dir).localCheckpoint()
    truth = (
        _exact_jaccard(sh, None, df_cap=SHINGLE_DF_CAP)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    h1 = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("shingle"), 17, 12), 16, 10).cast("long")
    hashed = sh.select("doc_id", h1.alias("_h1"), h2.alias("_h2"))
    mins = (
        hashed.groupBy("doc_id")
        .agg(
            *[
                F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"h{i}")
                for i in range(MH_PERMS)
            ]
        )
        .localCheckpoint()
    )
    banded = None
    for nb, nr in MH_SWEEP:
        buckets = [
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * nr + j}").cast("string")
                        for j in range(nr)
                    ],
                )
            )
            for b in range(nb)
        ]
        part = mins.select(
            F.lit(nb).alias("n_bands"),
            "doc_id",
            F.posexplode(F.array(*buckets)).alias("band", "bucket"),
        )
        banded = part if banded is None else banded.unionByName(part)
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.n_bands") == F.col("b.n_bands"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.n_bands").alias("n_bands"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    ccnt = cand.groupBy("n_bands").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    hcnt = (
        cand.join(truth, ["doc_a", "doc_b"])
        .groupBy("n_bands")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    cfgs = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nb).alias("n_bands"), F.lit(nr).alias("n_rows")
                    )
                    for nb, nr in MH_SWEEP
                ]
            )
        ).alias("c")
    ).select("c.n_bands", "c.n_rows")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    return (
        cfgs.join(ccnt, "n_bands", "left")
        .join(hcnt, "n_bands", "left")
        .crossJoin(nt)
        .select(
            "n_bands",
            "n_rows",
            "n_true",
            F.expr("coalesce(n_candidates, 0L)").alias("n_candidates"),
            F.expr("coalesce(n_hit, 0L)").alias("n_hit"),
            F.expr(
                "if(n_true = 0, 0L, coalesce(n_hit, 0L) * 1000000L div n_true)"
            ).alias("recall_ppm"),
            F.expr(
                "if(coalesce(n_candidates, 0L) = 0, 0L, "
                "coalesce(n_hit, 0L) * 1000000L div n_candidates)"
            ).alias("precision_ppm"),
        )
        .orderBy(F.col("n_bands").desc())
    )


def _mh_sweep_sql() -> str:
    h1 = "CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)"
    h2 = "CAST('0x' || substr(md5(shingle), 17, 12) AS BIGINT)"
    mins_cols = ",\n       ".join(
        f"MIN(({h1}) + {i} * ({h2})) AS h{i}" for i in range(MH_PERMS)
    )
    band_rows = []
    for nb, nr in MH_SWEEP:
        for b in range(nb):
            expr = " || ',' || ".join(
                f"CAST(h{b * nr + j} AS VARCHAR)" for j in range(nr)
            )
            band_rows.append(
                f"SELECT {nb} AS n_bands, doc_id, {b} AS band, "
                f"md5({expr}) AS bucket FROM mins"
            )
    bands_all = "\n  UNION ALL ".join(band_rows)
    cfg_vals = ",".join(f"({nb},{nr})" for nb, nr in MH_SWEEP)
    return f"""
WITH {_SHINGLES_CTE},
mins AS MATERIALIZED (SELECT doc_id,
       {mins_cols}
FROM shingles GROUP BY doc_id),
bands_all AS MATERIALIZED ({bands_all}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
sh_low AS (SELECT * FROM shingles WHERE shingle IN
           (SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {SHINGLE_DF_CAP})),
cand_all AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh_low a JOIN sh_low b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter_all AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
              FROM cand_all p
              JOIN shingles sa ON sa.doc_id = p.doc_a
              JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY 1, 2),
truth AS MATERIALIZED (SELECT doc_a, doc_b FROM inter_all
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= {MH_JACCARD_PPM}),
cand AS MATERIALIZED (SELECT DISTINCT a.n_bands, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_all a JOIN bands_all b
    ON a.n_bands = b.n_bands AND a.band = b.band AND a.bucket = b.bucket
   AND a.doc_id < b.doc_id),
ccnt AS (SELECT n_bands, CAST(COUNT(*) AS BIGINT) AS n_candidates
         FROM cand GROUP BY n_bands),
hcnt AS (SELECT n_bands, CAST(COUNT(*) AS BIGINT) AS n_hit
         FROM cand JOIN truth USING (doc_a, doc_b) GROUP BY n_bands),
cfgs AS (SELECT * FROM (VALUES {cfg_vals}) AS t(n_bands, n_rows)),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth)
SELECT cfgs.n_bands, cfgs.n_rows, nt.n_true,
       COALESCE(ccnt.n_candidates, 0) AS n_candidates,
       COALESCE(hcnt.n_hit, 0) AS n_hit,
       CASE WHEN nt.n_true = 0 THEN 0
            ELSE COALESCE(hcnt.n_hit, 0) * 1000000 // nt.n_true
       END AS recall_ppm,
       CASE WHEN COALESCE(ccnt.n_candidates, 0) = 0 THEN 0
            ELSE COALESCE(hcnt.n_hit, 0) * 1000000 // ccnt.n_candidates
       END AS precision_ppm
FROM cfgs CROSS JOIN nt
LEFT JOIN ccnt ON cfgs.n_bands = ccnt.n_bands
LEFT JOIN hcnt ON cfgs.n_bands = hcnt.n_bands
ORDER BY cfgs.n_bands DESC
"""


MH_SWEEP_SQL = _mh_sweep_sql()


def simhash_fingerprint(spark, sf_dir):
    """SimHash-16: sign-aggregated token-hash bits per document, built
    from the portable md5-derived hash so the oracle reproduces the
    exact fingerprints."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w")
    ).withColumn("h", _phash(F.col("w"), "sh"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(16)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)))
            for i in range(16)
        ).alias("simhash16"),
    )
    return sim.orderBy("doc_id")


SIMHASH_SQL = """
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents),
h AS (SELECT doc_id, {h} AS h FROM toks),
bit_sums AS (SELECT doc_id,
       {bits}
FROM h GROUP BY doc_id)
SELECT doc_id, {sig} AS simhash16
FROM bit_sums
ORDER BY doc_id
""".format(
    h=_phash_sql("w", "sh"),
    bits=",\n       ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(16)
    ),
    sig=" + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    ),
)


def ngram_jaccard_pairs(spark, sf_dir):
    """Word-bigram Jaccard near-dup (exact, bounded by inverted-index
    join on shared shingles — not n²)."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 2)
    shingled = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("shingle"),
    ).distinct()
    return (
        _exact_jaccard(shingled, None, df_cap=SHINGLE_DF_CAP)
        .where(F.col("jaccard_ppm") >= 800000)
        .select("doc_a", "doc_b", "jaccard_ppm")
        .orderBy("doc_a", "doc_b")
    )


NGRAM_SQL = """
WITH words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
               FROM documents),
shingles AS (SELECT DISTINCT doc_id,
                    unnest(list_transform(range(1, len(w)),
                           i -> w[i] || ' ' || w[i+1])) AS shingle
             FROM words WHERE len(w) >= 2),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
sh_low AS (SELECT * FROM shingles WHERE shingle IN
           (SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {cap})),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM sh_low a JOIN sh_low b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
          FROM cand p
          JOIN shingles sa ON sa.doc_id = p.doc_a
          JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) AS jaccard_ppm
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= 800000
ORDER BY doc_a, doc_b
""".format(cap=SHINGLE_DF_CAP)


def w_event_hourly(spark, sf_dir):
    """Tumbling event-time windows (the batch face of Structured
    Streaming's ``F.window`` — streaming/metrics.py runs the same
    operator under a watermark): per-hour, per-type event counts and
    value sums over the events table. Exact decimal(18,2) sums before
    the round-to-double so the hash is order-independent; the groupBy
    shuffles once on (window, event_type) — scales as a plain hash
    aggregation at any data size."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


W_EVENT_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY win_start, event_type
"""


def w_user_sessions(spark, sf_dir):
    """Gap-based sessionization with ``F.session_window`` (5-minute
    inactivity gap) — the operator Structured Streaming uses for
    streaming sessions, oracle-checked here in batch against a DuckDB
    gaps-and-islands rewrite. Semantics pinned exactly: a session is
    [first_ts, last_ts + gap); an event extends it iff its ts is
    STRICTLY inside (diff < gap starts the same session, diff == gap a
    new one). Shuffles once on user_id; per-user state is one open
    session — the same bound the streaming form holds under a
    watermark."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
        .orderBy("user_id", "sess_start")
    )


W_USER_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL '5 minutes'
              THEN 0 ELSE 1 END AS new_sess
  FROM events
),
grp AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL '5 minutes' AS sess_end,
       COUNT(*) AS n_events
FROM grp
GROUP BY user_id, sid
ORDER BY user_id, sess_start
"""


def p_props_json(spark, sf_dir):
    """JSON scalar extraction (SURVEY §2.8 map/JSON row): pull the
    integer field out of the events table's JSON ``props`` column and
    aggregate it per event type. Extraction is a shared regexp —
    literally the same pattern string on both engines — rather than
    the engine-native JSON function pair (``get_json_object`` vs
    DuckDB ``json_extract_string``), whose equivalence proved
    version-dependent in the driver environment (r3 hash fail).
    ``regexp_extract`` runs JVM-side (codegen), no UDF; all
    aggregates integer-exact so the hash is engine-independent."""
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k"\s*:\s*(-?\d+)', 1).cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


P_PROPS_JSON_SQL = r"""
WITH ext AS (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1), '')
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(k) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM ext
GROUP BY event_type
ORDER BY event_type
"""


def a_rollup_counts(spark, sf_dir):
    """Grouping-sets metrics (SURVEY §2.7/§2.8 bonus row: crawl
    dashboards want per-(domain,status) AND per-domain AND grand
    totals in one pass): ROLLUP over (event_type, value-bucket) with
    explicit GROUPING flags. One shuffle; Spark expands the rollup
    map-side (partial aggregation per grouping set), so it scales as a
    single hash aggregate. NULL ordering pinned NULLS LAST on both
    engines (Spark's asc default is NULLS FIRST, DuckDB's NULLS LAST)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "big", (F.col("value") > 50).cast("int")
    )
    return (
        e.rollup("event_type", "big")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("big").cast("int").alias("g_big"),
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select("event_type", "big", "g_type", "g_big", "n", "sum_value")
        .orderBy(
            "g_type",
            "g_big",
            F.col("event_type").asc_nulls_last(),
            F.col("big").asc_nulls_last(),
        )
    )


A_ROLLUP_SQL = """
SELECT event_type,
       CASE WHEN value > 50 THEN 1 ELSE 0 END AS big,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS INTEGER) AS g_big,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY ROLLUP(event_type, CASE WHEN value > 50 THEN 1 ELSE 0 END)
ORDER BY g_type, g_big, event_type NULLS LAST, big NULLS LAST
"""


def w_value_delta(spark, sf_dir):
    """Analytic window beyond row_number (LAG): per-user event-to-event
    value deltas, aggregated to total absolute movement. The subtraction
    happens in exact decimal(18,2) (cast BEFORE the lag diff) so the
    per-user sum is order-independent and engine-exact; tiebreak on
    event_id makes the lag order total. One shuffle on user_id shared
    by the window and the groupBy — Catalyst reuses the partitioning."""
    e = _t(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast("decimal(18,2)")
    d = v - F.lag(v).over(win)
    return (
        e.select("user_id", d.alias("d"))
        .groupBy("user_id")
        .agg(
            F.count("d").alias("n_steps"),
            F.round(F.sum(F.abs(F.col("d"))).cast("double"), 2).alias(
                "sum_abs_delta"
            ),
        )
        .orderBy("user_id")
    )


W_VALUE_DELTA_SQL = """
WITH stepped AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2))
           - LAG(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
  FROM events
)
SELECT user_id, COUNT(d) AS n_steps,
       ROUND(CAST(SUM(ABS(d)) AS DOUBLE), 2) AS sum_abs_delta
FROM stepped
GROUP BY user_id
ORDER BY user_id
"""


def t_length_quantiles(spark, sf_dir):
    """Length-distribution stats per language — the profiling step a
    curation pipeline runs before choosing token floors/ceilings.
    Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: both index at p·(n−1) and linearly interpolate),
    rounded to 2dp doubles. Exact percentile sorts within each group;
    at 100 TB the profiling run switches to approx_percentile — kept
    exact here because the gate demands bit-equality."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 2).alias("med_chars"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 2).alias("p90_chars"),
        )
        .orderBy("lang")
    )


T_LEN_QUANTILES_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS med_chars,
       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


SUBSTR_W = 50        # exact-substring window length (chars)
SUBSTR_ANCHOR = 8    # anchor gram length == expected anchor spacing
SUBSTR_DF_CAP = 50   # boilerplate-window document-frequency cap


def d_substring_dup(spark, sf_dir):
    """Exact-substring dedup (the Lee-et-al.-style third dedup family
    next to exact-hash and MinHash): find document pairs sharing a
    verbatim ≥50-char run, via winnowing-style CONTENT-DEFINED anchors
    — a position p is an anchor iff the 60-bit md5 hash of the 8-char
    gram at p ≡ 0 (mod 8), so the same substring produces the same
    anchored windows at ANY offset in any document (a fixed-stride
    grid would only match offset-aligned repeats). Each anchored
    50-char window is hashed; pairs come from an inverted-index
    self-join on window hash with the same document-frequency cap
    discipline as the shingle joins (df > 50 windows are boilerplate
    and dropped — no df² pair blowup from a hot window).

    100 TB posture: anchor selection + window hashing are pure
    map-side codegen (filter over sequence — only the ~1/8 anchor
    positions explode); the join is bounded by window sharing, never
    n². The per-position md5 is the portability price of the oracle —
    a production run swaps it for a rolling Rabin fingerprint in one
    Arrow kernel pass."""
    d = _t(spark, sf_dir, "documents").where(F.length("text") >= SUBSTR_W)
    # explode + WHERE instead of a higher-order filter() lambda: the
    # anchor predicate stays in whole-stage codegen. wins is read three
    # times (df-cap aggregate + both self-join sides) — persist so the
    # per-position md5 pass runs once, not three times.
    wins = (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.expr(f"sequence(1, length(text) - {SUBSTR_W} + 1)")
            ).alias("i"),
        )
        .where(
            F.expr(
                f"cast(conv(substring(md5(substring(text, i, "
                f"{SUBSTR_ANCHOR})), 1, 15), 16, 10) as bigint) "
                f"% {SUBSTR_ANCHOR} = 0"
            )
        )
        .select(
            "doc_id",
            F.md5(F.expr(f"substring(text, i, {SUBSTR_W})")).alias("h"),
        )
        .distinct()
        .persist()
    )
    hot = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > SUBSTR_DF_CAP)
        .select("h")
    )
    capped = wins.join(F.broadcast(hot), "h", "left_anti")
    a = capped.select(F.col("doc_id").alias("doc_a"), "h")
    b = capped.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
        .orderBy("doc_a", "doc_b")
    )


D_SUBSTR_SQL = f"""
WITH pos AS (
  SELECT doc_id, i
  FROM documents, UNNEST(range(1, length(text) - {SUBSTR_W} + 2)) AS t(i)
  WHERE length(text) >= {SUBSTR_W}
    AND CAST('0x' || substr(md5(substr(text, i, {SUBSTR_ANCHOR})), 1, 15)
             AS BIGINT) % {SUBSTR_ANCHOR} = 0
),
wins AS (
  SELECT DISTINCT d.doc_id, md5(substr(d.text, p.i, {SUBSTR_W})) AS h
  FROM documents d JOIN pos p ON p.doc_id = d.doc_id
),
capped AS (
  SELECT * FROM wins WHERE h NOT IN (
    SELECT h FROM wins GROUP BY h HAVING COUNT(*) > {SUBSTR_DF_CAP})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_windows
FROM capped a JOIN capped b USING (h)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_a, doc_b
"""


# Per-language keep rates (per mille) for the stratified sampler —
# the data-mixing step of a training run: downsample the dominant
# language, keep most of the low-resource ones.
SAMPLE_RATES = {"en": 350, "de": 800, "es": 800, "fr": 800, "zh": 600}


def t_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling — the corpus-mixing operator
    (per-language keep rates a la training-data recipes). Membership is
    decided by the portable 60-bit md5 hash of the doc id mod 1000
    against the language's per-mille rate, NOT rand(): the sample is
    reproducible across runs, engines and cluster sizes, and any
    subset relation between two rates holds exactly (rate 350 ⊂ rate
    800 — useful for nested data-scale ablations). Keep rate is
    reported as exact BIGINT ppm floor-division (kept_ppm), never a
    rounded double ratio — the ROUND(double,4) float-ratio class
    hash-failed in the r3 driver environment.

    100 TB posture: pure map-side codegen filter + one groupBy(lang)
    partial-aggregated rollup; no shuffle of the kept rows themselves
    — a production sampler writes the kept set straight out with this
    same predicate pushed into the scan."""
    d = _t(spark, sf_dir, "documents")
    rate = F.lit(None).cast("int")
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    keep = (
        F.pmod(_phash(F.col("doc_id").cast("string"), "samp"), F.lit(1000))
        < F.coalesce(rate, F.lit(0))
    ).cast("int")
    return (
        d.select("lang", "n_chars", keep.alias("_k"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("_k").alias("n_kept"),
            F.expr("SUM(_k) * 1000000L div COUNT(*)").alias("kept_ppm"),
            F.sum(F.col("_k") * F.col("n_chars")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


_SAMPLE_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
) + " ELSE 0 END"

T_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_phash_sql("CAST(doc_id AS VARCHAR)", "samp")} % 1000
                     < {_SAMPLE_RATE_CASE} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN {_phash_sql("CAST(doc_id AS VARCHAR)", "samp")} % 1000
                     < {_SAMPLE_RATE_CASE} THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS kept_ppm,
       CAST(SUM(CASE WHEN {_phash_sql("CAST(doc_id AS VARCHAR)", "samp")} % 1000
                     < {_SAMPLE_RATE_CASE} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Round-3 batch 2: blocklist washing, TF-IDF terms, funnel, SemDeDup
# ---------------------------------------------------------------------------

# C4-style word blocklist (Raffel et al. 2020 wash badlisted pages; here
# the "bad" terms are corpus words so the gate exercises real splits).
BLOCKLIST_WORDS = ("spark", "hash", "window")
BLOCKLIST_MAX_FRAC = 0.06


def t_blocklist_wash(spark, sf_dir):
    """Blocklist washing (C4-style bad-word filter + redaction): per
    document, count blocklisted tokens, drop documents whose
    blocklisted fraction exceeds the threshold, and fingerprint the
    WASHED text (blocklisted tokens removed) so the redaction itself
    is gate-checked, not just the counts. Pure codegen — split /
    filter / array_join / md5, no UDF, map-side only until the final
    ORDER BY: at 100 TB this is a scan-shaped pass whose output
    writes straight back out."""
    d = _t(spark, sf_dir, "documents")
    in_list = ", ".join(f"'{x}'" for x in BLOCKLIST_WORDS)
    w = d.select(
        "doc_id",
        F.split(F.lower(F.trim("text")), "\\s+").alias("w"),
    ).withColumn("washed", F.expr(f"filter(w, x -> NOT x IN ({in_list}))"))
    n_tokens = F.size("w").cast("long")
    n_blocked = (F.size("w") - F.size("washed")).cast("long")
    frac = F.round(n_blocked.cast("double") / n_tokens, 6)
    return w.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_blocked.alias("n_blocked"),
        frac.alias("blocked_frac"),
        (frac <= BLOCKLIST_MAX_FRAC).alias("keep"),
        F.md5(F.array_join("washed", " ")).alias("washed_fp"),
    ).orderBy("doc_id")


_BLOCK_IN = ", ".join(f"'{x}'" for x in BLOCKLIST_WORDS)

T_BLOCKLIST_SQL = f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
f AS (SELECT doc_id, w,
             list_filter(w, x -> x NOT IN ({_BLOCK_IN})) AS washed
      FROM w)
SELECT doc_id,
       len(w) AS n_tokens,
       len(w) - len(washed) AS n_blocked,
       ROUND(CAST(len(w) - len(washed) AS DOUBLE) / len(w), 6) AS blocked_frac,
       ROUND(CAST(len(w) - len(washed) AS DOUBLE) / len(w), 6)
         <= {BLOCKLIST_MAX_FRAC} AS keep,
       md5(array_to_string(washed, ' ')) AS washed_fp
FROM f
ORDER BY doc_id
"""


TFIDF_TOP_K = 10


def t_tfidf_topterms(spark, sf_dir):
    """Corpus term statistics: per-language top-K terms by TF-IDF
    (tf = term occurrences within the language, idf = ln(N/df) over
    documents). Two hash aggregations (one keyed (lang,term), one
    keyed term) + a broadcast one-row total + a per-lang top-K window
    — the window partitions on lang so no single-partition sort.
    Scores are ROUND(x,6) doubles with term as the deterministic
    tiebreak, so ranking is engine-stable."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("term"),
    )
    tf = words.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfx = words.groupBy("term").agg(F.count_distinct("doc_id").alias("df_docs"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfx, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "term",
            "tf",
            "df_docs",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_docs")),
                6,
            ).alias("tfidf"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.col("tfidf").desc(), F.col("term")
        )
    )
    return (
        scored.withColumn("rank", rn.cast("long"))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .orderBy("lang", "rank")
    )


T_TFIDF_SQL = f"""
WITH words AS (SELECT doc_id, lang,
                      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
               FROM documents),
tf AS (SELECT lang, term, COUNT(*) AS tf FROM words GROUP BY lang, term),
dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df_docs FROM words GROUP BY term),
tot AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (SELECT lang, term, tf, df_docs,
                  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df_docs), 6) AS tfidf
           FROM tf JOIN dfx USING (term), tot),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY tfidf DESC, term) AS rank
           FROM scored)
SELECT lang, term, tf, df_docs, tfidf, rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
ORDER BY lang, rank
"""


def w_funnel(spark, sf_dir):
    """Event-funnel conversion (view → click → purchase, strictly
    ordered by event time per user, each step within a 1-day
    conversion window — timestamp arithmetic is exact, so the window
    edge is engine-identical): the classic product-analytics
    operator. Each stage is a groupBy(user_id) min-timestamp refined
    by a same-key join against the previous stage. Plan audit
    (local[4], sf0.01): each stage shuffles only ITS event-type slice
    on user_id — the three slices are disjoint, so total shuffled
    volume ≈ one pass over events — and joins the prior stage's user
    list by broadcast while conversions are small; at funnel widths
    where that list outgrows broadcast, AQE falls back to a
    sort-merge join already co-partitioned with the stage's own
    groupBy exchange. The four count aggregates are one-row
    broadcasts."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 1 DAY")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    one = (
        e.agg(F.count_distinct("user_id").alias("n_users"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )
    return one.select(
        "n_users",
        "n_viewed",
        "n_clicked",
        "n_purchased",
        F.round(
            F.col("n_clicked").cast("double") / F.col("n_viewed"), 6
        ).alias("click_rate"),
        F.round(
            F.col("n_purchased").cast("double") / F.col("n_clicked"), 6
        ).alias("purchase_rate"),
        F.round(
            F.col("n_purchased").cast("double") / F.col("n_viewed"), 6
        ).alias("funnel_rate"),
    )


W_FUNNEL_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        AND e.ts <= v.v_ts + INTERVAL 1 DAY GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        AND e.ts <= c.c_ts + INTERVAL 1 DAY GROUP BY e.user_id)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked,
       (SELECT COUNT(*) FROM p) AS n_purchased,
       ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 6) AS click_rate,
       ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM c), 6) AS purchase_rate,
       ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 6) AS funnel_rate
"""


SEMDEDUP_TAU = 0.45


def dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public):
    cluster the embeddings with the TRAINED IVF coarse quantizer,
    then inside each cell drop every vector that has a smaller-id
    cell-mate with cosine ≥ τ (greedy keep-lowest-id — the
    deterministic variant of the paper's keep-one-per-group). The
    pair join is WITHIN-CELL only, so candidates are bounded by cell
    sizes exactly like the LSH buckets — never n² — and the cells
    come from the same k-means chain the ANN queries verify.
    Output: one row per vector with its cell and keep flag."""
    v = _ivf_v(spark, sf_dir)
    _cents, assigned = _ivf_trained_cents(v)
    assigned = assigned.localCheckpoint(eager=False)
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(
        _arr_dot(F.col("a.emb"), F.col("b.emb"))
        / (_arr_norm(F.col("a.emb")) * _arr_norm(F.col("b.emb"))),
        4,
    )
    dups = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= SEMDEDUP_TAU)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dups, "vec_id", "left")
        .select("vec_id", "cell", F.col("dup").isNull().alias("keep"))
        .orderBy("vec_id")
    )


def _semdedup_sql() -> str:
    ctes, _cfin, afin = _ivf_trained_ctes()
    cos = (
        f"ROUND(({_dot_sql('a.emb', 'b.emb')}) / "
        f"(sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')})), 4)"
    )
    return f"""
WITH {ctes},
dups AS (SELECT DISTINCT b.vec_id
         FROM {afin} a JOIN {afin} b
           ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE {cos} >= {SEMDEDUP_TAU})
SELECT x.vec_id, x.cell,
       x.vec_id NOT IN (SELECT vec_id FROM dups) AS keep
FROM {afin} x
ORDER BY x.vec_id
"""


DEDUP_SEMANTIC_SQL = _semdedup_sql()


SEMDEDUP_SWEEP_PPM = (480000, 450000, 400000, 350000)


def dedup_semantic_sweep(spark, sf_dir):
    """SemDeDup threshold sweep (Abbas et al. 2023 §4 — the paper's
    entire tuning story is the τ knob: too high keeps paraphrase
    clusters, too low deletes topical diversity; a deployment reads
    the removal-vs-τ curve before committing a 100 TB pass).
    ONE trained index (the shared IVF k-means chain) and ONE
    within-cell pair table with cosines, swept through four
    thresholds bracketing the deployed SEMDEDUP_TAU = 0.45 (the
    synthetic embeddings' within-cell cosines top out at 0.49, so
    the paper's 0.9-ish natural-text range would read all-zero here
    — the sweep is calibrated to where this corpus' curve actually
    bends): per τ (exact integer ppm), the number of qualifying
    pairs, the number of vectors removed under keep-lowest-id (a
    vector dies iff its MAX cosine to any lower-id cell-mate ≥ τ —
    so the sweep needs only the per-vector max, one aggregate), and
    the corpus removal rate in BIGINT ppm.

    100 TB posture: within-cell pairs only (cell-size bounded, the
    dedup_semantic shape); the sweep itself adds NO joins — four
    conditional sums over the pair table + four over the per-vector
    max table, unpivoted from one scalar row."""
    v = _ivf_v(spark, sf_dir)
    _cents, assigned = _ivf_trained_cents(v)
    assigned = assigned.localCheckpoint(eager=False)
    a, b = assigned.alias("a"), assigned.alias("b")
    # cosine quantized ONCE to floor(x * 1e6) BIGINT ppm — the sweep's
    # threshold predicates are then pure integer comparisons
    cos = F.floor(
        _arr_dot(F.col("a.emb"), F.col("b.emb"))
        / (_arr_norm(F.col("a.emb")) * _arr_norm(F.col("b.emb")))
        * F.lit(1000000.0)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("b.vec_id").alias("vec_id"), cos.alias("cos_ppm"))
        .localCheckpoint()
    )
    mc = pairs.groupBy("vec_id").agg(F.max("cos_ppm").alias("mc"))
    pair_aggs = [
        F.sum(
            F.when(F.col("cos_ppm") >= t, 1).otherwise(0)
        ).alias(f"p{t}")
        for t in SEMDEDUP_SWEEP_PPM
    ]
    rem_aggs = [
        F.sum(
            F.when(F.col("mc") >= t, 1).otherwise(0)
        ).alias(f"r{t}")
        for t in SEMDEDUP_SWEEP_PPM
    ]
    pa = pairs.agg(*pair_aggs)
    ra = mc.agg(*rem_aggs)
    nv = assigned.agg(F.count(F.lit(1)).alias("n_vecs"))
    row = pa.crossJoin(ra).crossJoin(nv)
    return (
        row.select(
            "n_vecs",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tau_ppm"),
                            F.col(f"p{t}").alias("n_pairs"),
                            F.col(f"r{t}").alias("n_removed"),
                        )
                        for t in SEMDEDUP_SWEEP_PPM
                    ]
                )
            ).alias("s"),
        )
        .select(
            F.col("s.tau_ppm").alias("tau_ppm"),
            "n_vecs",
            F.col("s.n_pairs").alias("n_pairs"),
            F.col("s.n_removed").alias("n_removed"),
            F.expr("s.n_removed * 1000000L div n_vecs").alias("removal_ppm"),
        )
        .orderBy(F.col("tau_ppm").desc())
    )


def _semdedup_sweep_sql() -> str:
    ctes, _cfin, afin = _ivf_trained_ctes()
    cos = (
        f"CAST(FLOOR(({_dot_sql('a.emb', 'b.emb')}) / "
        f"(sqrt({_dot_sql('a.emb', 'a.emb')}) * sqrt({_dot_sql('b.emb', 'b.emb')}))"
        f" * 1000000.0) AS BIGINT)"
    )
    p_cols = ", ".join(
        f"CAST(SUM(CASE WHEN cos_ppm >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS p{t}"
        for t in SEMDEDUP_SWEEP_PPM
    )
    r_cols = ", ".join(
        f"CAST(SUM(CASE WHEN mc >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS r{t}"
        for t in SEMDEDUP_SWEEP_PPM
    )
    unpivot = "\nUNION ALL ".join(
        f"SELECT {t} AS tau_ppm, n_vecs, p{t} AS n_pairs, r{t} AS n_removed, "
        f"r{t} * 1000000 // n_vecs AS removal_ppm FROM row"
        for t in SEMDEDUP_SWEEP_PPM
    )
    return f"""
WITH {ctes},
pairs AS MATERIALIZED (
  SELECT b.vec_id, {cos} AS cos_ppm
  FROM {afin} a JOIN {afin} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id),
mc AS (SELECT vec_id, MAX(cos_ppm) AS mc FROM pairs GROUP BY vec_id),
pa AS (SELECT {p_cols} FROM pairs),
ra AS (SELECT {r_cols} FROM mc),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM {afin}),
row AS (SELECT * FROM pa CROSS JOIN ra CROSS JOIN nv)
SELECT tau_ppm, n_vecs, n_pairs, n_removed, removal_ppm FROM ({unpivot})
ORDER BY tau_ppm DESC
"""


DEDUP_SEMANTIC_SWEEP_SQL = _semdedup_sweep_sql()


SIMHASH_ND_BITS = 60          # fingerprint width for RETRIEVAL (the
SIMHASH_ND_BANDS = 4          # 16-bit demo hash collides too much to
SIMHASH_ND_HAMMING_MAX = 4    # band over: 642 hamming-0 false pairs
                              # at 500 docs; 60 bits / 4×15-bit bands
                              # cut candidates 33× at sf0.01)


def simhash_near_dup(spark, sf_dir):
    """SimHash near-dup retrieval (completes the SimHash family:
    simhash_fingerprint computes signatures, this finds the pairs):
    60-bit sign-aggregated token-hash fingerprint, Hamming-LSH
    banding (4 × 15-bit bands — a pair within Hamming distance d
    collides on ≥1 band with high probability; equal-band join keys
    bound candidates exactly like MinHash banding, never n²), exact
    bit_count(xor) rerank at distance ≤ 4. Entirely codegen — one
    60-column sign aggregate, a posexplode, a self-join on
    (band, value), no UDFs; the hash family is the same portable
    md5-derived one the oracle replicates bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w")
    ).withColumn("h", _phash(F.col("w"), "sh"))
    n = SIMHASH_ND_BITS
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            (
                F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(
                    F.lit(0)
                ).cast("long")
            )
            for i in range(n)
        ).alias("fp"),
    )
    width = n // SIMHASH_ND_BANDS
    mask = (1 << width) - 1
    bands = sim.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("fp", width * b).bitwiseAND(F.lit(mask))
                    for b in range(SIMHASH_ND_BANDS)
                ]
            )
        ).alias("b", "bv"),
    )
    a, bb = bands.alias("a"), bands.alias("b2")
    cand = (
        a.join(
            bb,
            (F.col("a.b") == F.col("b2.b"))
            & (F.col("a.bv") == F.col("b2.bv"))
            & (F.col("a.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b2.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fa"),
            F.col("b2.fp").alias("fb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_ND_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


SIMHASH_ND_SQL = """
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents),
hh AS (SELECT doc_id, {h} AS h FROM toks),
bs AS (SELECT doc_id,
       {bits}
FROM hh GROUP BY doc_id),
sim AS (SELECT doc_id, {sig} AS fp FROM bs),
bands AS (SELECT doc_id, fp, b, (fp >> ({w} * b)) & {mask} AS bv
          FROM sim, (SELECT unnest([{bandlist}]) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, a2.doc_id AS doc_b,
                a.fp AS fa, a2.fp AS fb
         FROM bands a JOIN bands a2
           ON a.b = a2.b AND a.bv = a2.bv AND a.doc_id < a2.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(CAST(xor(fa, fb) AS BIGINT)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(CAST(xor(fa, fb) AS BIGINT)) <= {hmax}
ORDER BY doc_a, doc_b
""".format(
    h=_phash_sql("w", "sh"),
    bits=",\n       ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_ND_BITS)
    ),
    sig=" + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_ND_BITS)
    ),
    w=SIMHASH_ND_BITS // SIMHASH_ND_BANDS,
    mask=(1 << (SIMHASH_ND_BITS // SIMHASH_ND_BANDS)) - 1,
    bandlist=",".join(str(b) for b in range(SIMHASH_ND_BANDS)),
    hmax=SIMHASH_ND_HAMMING_MAX,
)


def w_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts — the classic cohort-analysis
    operator: users cohorted by the week of their first ``signup``,
    week-N retention = distinct cohort members active in cohort_week
    + N (events at/after signup only). All timestamp math is exact
    (date_trunc to Monday on both engines, integer day diffs), so the
    gate checks values, not approximations. Two hash aggregations
    (first-signup per user, then (cohort, offset) distinct-count) and
    a broadcast of the tiny per-user cohort map — the events table is
    shuffled once on user_id at scale."""
    e = _t(spark, sf_dir, "events")
    f = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week"))
    )
    act = (
        e.join(f, "user_id")
        .where(F.date_trunc("week", F.col("ts")) >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
    )
    ret = act.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    size = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ret.join(size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            "cohort_size",
            F.round(
                F.col("n_users").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


W_RETENTION_SQL = """
WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
act AS (SELECT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT)
                 AS week_offset
        FROM events e JOIN f ON e.user_id = f.user_id
        WHERE date_trunc('week', e.ts) >= f.cohort_week),
ret AS (SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_users
        FROM act GROUP BY cohort_week, week_offset),
size AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM f
         GROUP BY cohort_week)
SELECT r.cohort_week, r.week_offset, r.n_users, s.cohort_size,
       ROUND(CAST(r.n_users AS DOUBLE) / s.cohort_size, 6) AS retention
FROM ret r JOIN size s ON r.cohort_week = s.cohort_week
ORDER BY r.cohort_week, r.week_offset
"""


BM25_TERMS = ("spark", "window", "merge")
BM25_K1, BM25_B, BM25_TOP = 1.2, 0.75, 20


def t_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval for a fixed query (Robertson/Sparck
    Jones; the Lucene idf variant ln((N-df+.5)/(df+.5)+1)) — the IR
    scoring operator beyond raw TF-IDF. Determinism: per-term scores
    are PIVOTED into columns and added in one fixed left-assoc order
    (a SUM over doubles would expose engine reduction order); avgdl
    is an exact integer-sum / count; every float expression is
    written with the same association on both engines. Shape: one
    explode + two hash aggs + broadcast one-row stats — the corpus
    is scanned once, only query-term postings are shuffled."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    )
    dl = w.select("doc_id", F.size("w").alias("dl"))
    stats = dl.agg(
        (F.sum(F.col("dl").cast("double")) / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    toks = w.select("doc_id", F.explode("w").alias("term")).where(
        F.col("term").isin(*BM25_TERMS)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfx = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
    )
    score = idf * F.col("tf") * (BM25_K1 + 1.0) / norm
    per_term = (
        tf.join(dfx, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", score.alias("s"))
    )
    pivoted = per_term.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{t}")
            for t in BM25_TERMS
        ]
    )
    total = F.lit(0.0)
    for t in BM25_TERMS:
        total = total + F.coalesce(F.col(f"s_{t}"), F.lit(0.0))
    return (
        pivoted.select(
            "doc_id", F.floor(total * F.lit(1000000.0)).alias("bm25_e6")
        )
        .orderBy(F.col("bm25_e6").desc(), "doc_id")
        .limit(BM25_TOP)
    )


_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)

T_BM25_SQL = """
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
dl AS (SELECT doc_id, len(w) AS dl FROM w),
stats AS (SELECT SUM(CAST(dl AS DOUBLE)) / COUNT(*) AS avgdl, COUNT(*) AS n
          FROM dl),
toks AS (SELECT doc_id, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN ({terms}) GROUP BY doc_id, term),
dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
        WHERE term IN ({terms}) GROUP BY term),
per_term AS (
  SELECT tf.doc_id, tf.term,
         ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * ({k1} + 1.0)
           / (tf + {k1} * (1.0 - {b} + {b} * CAST(dl AS DOUBLE) / avgdl)) AS s
  FROM tf JOIN dfx USING (term) JOIN dl ON tf.doc_id = dl.doc_id, stats),
pivoted AS (
  SELECT doc_id,
         {pivots}
  FROM per_term GROUP BY doc_id)
SELECT doc_id, CAST(FLOOR(({total}) * 1000000.0) AS BIGINT) AS bm25_e6
FROM pivoted
ORDER BY bm25_e6 DESC, doc_id
LIMIT {top}
""".format(
    terms=_BM25_IN,
    k1=BM25_K1,
    b=BM25_B,
    pivots=",\n         ".join(
        f"MAX(CASE WHEN term = '{t}' THEN s END) AS s_{t}" for t in BM25_TERMS
    ),
    total=" + ".join(f"COALESCE(s_{t}, 0.0)" for t in BM25_TERMS),
    top=BM25_TOP,
)


def t_corpus_mix(spark, sf_dir):
    """Corpus-composition report (training-data governance): per
    source, document/token share plus the Shannon entropy of its
    language mix — one groupBy(source, lang) then a per-source fold
    over the (tiny) per-lang counts via collect_list, entropy summed
    over langs in lang order (fixed fold order on both engines)."""
    d = _t(spark, sf_dir, "documents")
    sl = (
        d.select(
            "source",
            "lang",
            F.size(F.split(F.lower(F.trim("text")), "\\s+")).alias("toks"),
        )
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("toks").alias("toks"))
    )
    folded = sl.groupBy("source").agg(
        F.sum("docs").alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("lang", "docs"))).alias("ld"),
    )
    p = lambda s: s["docs"].cast("double") / F.col("n_docs")
    entropy = -F.aggregate(
        F.transform(F.col("ld"), lambda s: p(s) * F.log(p(s))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return folded.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(entropy * F.lit(1000000.0)).alias("lang_entropy_e6"),
    ).orderBy("source")


T_CORPUS_MIX_SQL = """
WITH sl AS (SELECT source, lang, COUNT(*) AS docs,
                   SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                     AS toks
            FROM documents GROUP BY source, lang),
fold AS (SELECT source, SUM(docs) AS n_docs, SUM(toks) AS n_tokens,
                list_sort(list({'lang': lang, 'docs': docs})) AS ld
         FROM sl GROUP BY source)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(-list_aggregate(
               list_transform(ld, s ->
                 (CAST(s['docs'] AS DOUBLE) / n_docs)
                   * ln(CAST(s['docs'] AS DOUBLE) / n_docs)),
               'sum') * 1000000.0) AS BIGINT) AS lang_entropy_e6
FROM fold
ORDER BY source
"""


PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def a_pivot_source_lang(spark, sf_dir):
    """Relational PIVOT (the wide-table OLAP operator): per-source
    document counts pivoted to one column per language. The pivot
    values are EXPLICIT literals — Spark then skips the extra
    distinct-values job and compiles the pivot to one hash aggregate
    with CASE columns (the same single-shuffle plan as the SQL
    mirror); missing cells are 0, not NULL, so the contract is
    total."""
    d = _t(spark, sf_dir, "documents")
    out = (
        d.groupBy("source")
        .pivot("lang", list(PIVOT_LANGS))
        .count()
        .na.fill(0, list(PIVOT_LANGS))
    )
    return out.select(
        "source", *[F.col(lang).cast("long").alias(lang) for lang in PIVOT_LANGS]
    ).orderBy("source")


A_PIVOT_SQL = """
SELECT source,
       {cols}
FROM documents
GROUP BY source
ORDER BY source
""".format(
    cols=",\n       ".join(
        # CAST: DuckDB types SUM(BIGINT) as HUGEINT, which the driver
        # hasher renders as float64/decimal128 (never int) — every
        # oracle OUTPUT column must be BIGINT-typed.
        f"CAST(SUM(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {lang}"
        for lang in PIVOT_LANGS
    )
)


def w_running_totals(spark, sf_dir):
    """Window FRAME semantics (beyond w_value_delta's LAG): per-user
    running SUM(value) (ROWS UNBOUNDED PRECEDING → CURRENT ROW) and a
    3-row moving average (ROWS 2 PRECEDING → CURRENT ROW), frame
    order pinned by (ts, event_id) so both engines fold the doubles
    in the identical sequence — running aggregates are sequential
    left-folds by construction, so even pre-rounding bits agree. One
    hash(user_id) Exchange serves both window specs."""
    e = _t(spark, sf_dir, "events")
    # value is a 2-decimal quantity stored as double: snap each row to
    # exact BIGINT cents first (round-to-integer never sits on a .5
    # boundary here), then every window aggregate is exact integer
    # arithmetic — no float accumulation, no terminal rounding at all
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    ec = e.select("event_id", "user_id", "ts", cents.alias("_c"))
    return (
        ec.select(
            "event_id",
            "user_id",
            "ts",
            F.sum("_c").over(run).alias("running_sum_cents"),
            F.expr(
                "sum(_c) OVER (PARTITION BY user_id ORDER BY ts, event_id "
                "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000L div "
                "count(_c) OVER (PARTITION BY user_id ORDER BY ts, event_id "
                "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
            ).alias("moving_avg3_e6"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


W_RUNNING_SQL = """
WITH ec AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS _c
  FROM events)
SELECT event_id, user_id, ts,
       CAST(SUM(_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS running_sum_cents,
       CAST(SUM(_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000
         // COUNT(_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS moving_avg3_e6
FROM ec
ORDER BY user_id, ts, event_id
"""


KMV_K = 64
_KMV_SPACE = 1 << 60  # _phash values are uniform in [0, 2^60)


def sk_kmv_merge(spark, sf_dir):
    """KMV sketch MERGEABILITY audit — the property that makes any
    sketch usable on a cluster at all (Bar-Yossef et al. 2002; the
    theta-sketch contract): sketch(A ∪ B) must equal
    merge(sketch(A), sketch(B)), because at 10^10 keys each partition
    builds its own K-set and only the tiny K-sets ever move. The
    corpus splits into deterministic halves (doc_id parity), each
    half sketches its distinct word-bigrams (K smallest portable
    hashes), the merge keeps the K smallest DISTINCT of the union
    (distinct matters — a bigram in both halves must count once), and
    the gate pins the invariant: the merged sketch's kth hash and
    estimate EQUAL the whole-corpus sketch's, bit for bit. A sketch
    family that fails this row is unusable distributed, whatever its
    single-node accuracy.

    Scale shape: three per-set top-K windows (each partition-local
    top-K + one K-row merge at size) + one 2K-row union — the moving
    data is K hashes per partition, never the keys."""
    d = _t(spark, sf_dir, "documents")

    def bigrams(df):
        w = df.select(
            "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
        ).where(F.size("w") >= 2)
        return (
            w.select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(w) - 2), "
                        "i -> concat(w[i], ' ', w[i+1]))"
                    )
                ).alias("g")
            )
            .distinct()
            .select(_phash(F.col("g"), "kmv").alias("hv"))
            .distinct()
        )

    def topk(hdf):
        # TakeOrderedAndProject: partition-local K-smallest + one
        # K-row final merge — the distributed shape the contract
        # describes. (A row_number over a global Window here would
        # move EVERY distinct hash into one partition first.)
        return hdf.orderBy("hv").limit(KMV_K)

    def sketch_stats(sk, prefix):
        est = (
            (F.col(f"{prefix}_k") - 1).cast("double")
            * F.lit(float(_KMV_SPACE))
            / F.col(f"{prefix}_kth")
        )
        return (
            sk.agg(
                F.max("hv").alias(f"{prefix}_kth"),
                F.count(F.lit(1)).alias(f"{prefix}_k"),
            ),
            est,
        )

    whole = topk(bigrams(d))
    h0 = topk(bigrams(d.where(F.expr("doc_id % 2 = 0"))))
    h1 = topk(bigrams(d.where(F.expr("doc_id % 2 = 1"))))
    merged = topk(h0.unionAll(h1).distinct())
    ws, w_est = sketch_stats(whole, "whole")
    ms, m_est = sketch_stats(merged, "merged")
    # estimates reported as floor(est * 100) BIGINT — FLOOR of a
    # bit-exact IEEE double is engine-independent, ROUND's decimal
    # re-rendering is not (the r3 driver-env hash-fail class)
    return ws.crossJoin(ms).select(
        F.lit(KMV_K).alias("k"),
        "whole_kth",
        "merged_kth",
        F.floor(w_est * F.lit(100.0)).alias("whole_est_e2"),
        F.floor(m_est * F.lit(100.0)).alias("merged_est_e2"),
        F.expr(
            "whole_kth = merged_kth AND whole_k = merged_k"
        ).alias("merge_invariant"),
    )


SK_KMV_MERGE_SQL = f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
bi AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i+1])) AS g
       FROM w WHERE len(w) >= 2),
hv_all AS (SELECT DISTINCT {_phash_sql('g', 'kmv')} AS hv FROM bi),
hv_0 AS (SELECT DISTINCT {_phash_sql('g', 'kmv')} AS hv FROM bi
         WHERE doc_id % 2 = 0),
hv_1 AS (SELECT DISTINCT {_phash_sql('g', 'kmv')} AS hv FROM bi
         WHERE doc_id % 2 = 1),
sk_all AS (SELECT hv FROM hv_all ORDER BY hv LIMIT {KMV_K}),
sk_0 AS (SELECT hv FROM hv_0 ORDER BY hv LIMIT {KMV_K}),
sk_1 AS (SELECT hv FROM hv_1 ORDER BY hv LIMIT {KMV_K}),
sk_m AS (SELECT hv FROM (SELECT DISTINCT hv FROM
                         (SELECT hv FROM sk_0 UNION ALL SELECT hv FROM sk_1))
         ORDER BY hv LIMIT {KMV_K}),
ws AS (SELECT MAX(hv) AS whole_kth, CAST(COUNT(*) AS BIGINT) AS whole_k
       FROM sk_all),
ms AS (SELECT MAX(hv) AS merged_kth, CAST(COUNT(*) AS BIGINT) AS merged_k
       FROM sk_m)
SELECT {KMV_K} AS k, whole_kth, merged_kth,
       CAST(FLOOR(CAST(whole_k - 1 AS DOUBLE) * {float(_KMV_SPACE)!r}
                  / whole_kth * 100.0) AS BIGINT) AS whole_est_e2,
       CAST(FLOOR(CAST(merged_k - 1 AS DOUBLE) * {float(_KMV_SPACE)!r}
                  / merged_kth * 100.0) AS BIGINT) AS merged_est_e2,
       whole_kth = merged_kth AND whole_k = merged_k AS merge_invariant
FROM ws CROSS JOIN ms
"""


def sk_kmv_distinct(spark, sf_dir):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002
    — the mergeable theta-sketch family): per language, estimate the
    distinct word-bigram count from only the K smallest hash values,
    next to the exact count and the realized relative error. UNLIKE
    HLL/approx_count_distinct, the KMV estimate is a pure function of
    the portable md5 hash, so the sketch itself is FULLY
    oracle-checked — no rows-only approximation gate. Scale shape:
    the K-smallest selection is a per-lang top-K window (partitioned,
    no global sort) and the sketch is mergeable by keeping the K
    smallest of a union — the 10^10-key path keeps K values per
    partition before one tiny final merge."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "lang", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 2)
    bi = w.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("g"),
    ).distinct()
    h = bi.select("lang", "g", _phash(F.col("g"), "kmv").alias("hv"))
    rn = F.row_number().over(Window.partitionBy("lang").orderBy("hv"))
    kth = (
        h.withColumn("rn", rn)
        .where(F.col("rn") <= KMV_K)
        .groupBy("lang")
        .agg(F.max("hv").alias("kth_hash"), F.count(F.lit(1)).alias("k_used"))
    )
    exact = bi.groupBy("lang").agg(F.count_distinct("g").alias("n_exact"))
    est = (
        (F.col("k_used") - 1).cast("double")
        * F.lit(float(_KMV_SPACE))
        / F.col("kth_hash")
    )
    return (
        exact.join(kth, "lang")
        .select(
            "lang",
            "n_exact",
            "k_used",
            F.floor(est * F.lit(100.0)).alias("kmv_estimate_e2"),
            F.floor(
                F.abs(est - F.col("n_exact"))
                / F.col("n_exact")
                * F.lit(1000000.0)
            ).alias("rel_err_ppm"),
        )
        .orderBy("lang")
    )


SK_KMV_SQL = f"""
WITH w AS (SELECT doc_id, lang,
                  string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
bi AS (SELECT DISTINCT lang,
              unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i+1])) AS g
       FROM w WHERE len(w) >= 2),
h AS (SELECT lang, g, {_phash_sql('g', 'kmv')} AS hv FROM bi),
rk AS (SELECT lang, hv,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn
       FROM h),
kth AS (SELECT lang, MAX(hv) AS kth_hash, COUNT(*) AS k_used
        FROM rk WHERE rn <= {KMV_K} GROUP BY lang),
exact AS (SELECT lang, COUNT(DISTINCT g) AS n_exact FROM bi GROUP BY lang)
SELECT e.lang, n_exact, k_used,
       CAST(FLOOR(CAST(k_used - 1 AS DOUBLE) * {float(_KMV_SPACE)} / kth_hash
                  * 100.0) AS BIGINT) AS kmv_estimate_e2,
       CAST(FLOOR(ABS(CAST(k_used - 1 AS DOUBLE) * {float(_KMV_SPACE)}
                      / kth_hash - n_exact) / n_exact * 1000000.0)
            AS BIGINT) AS rel_err_ppm
FROM exact e JOIN kth ON e.lang = kth.lang
ORDER BY e.lang
"""


WEIGHTED_SAMPLE_K = 50


def t_sample_weighted(spark, sf_dir):
    """Weighted priority sampling (Efraimidis-Spirakis A-ES, public):
    each doc gets key u^(1/w) with weight w = n_chars and u a
    hash-derived uniform — the top-K keys are a size-biased sample
    (selection probability ∝ weight), the standard corpus-mixing
    primitive for quality- or length-weighted subsets. Deterministic
    end to end: u comes from the portable md5 hash (not rand()), the
    rank key is floor(ln(u)/w * 1e10) BIGINT (monotone transform of
    u^(1/w); floored scaled integer, not ROUND — the cross-engine
    decimal-rounding class) with doc_id tiebreak, reproducible across
    engines, runs and cluster sizes — and the oracle checks the
    MEMBERSHIP, not just counts. Scale shape: orderBy+limit compiles
    to TakeOrderedAndProject (per-partition top-K then one K-row
    merge), never a global sort or single-partition window."""
    d = _t(spark, sf_dir, "documents")
    u = (
        (_phash(F.col("doc_id").cast("string"), "ws") + 1).cast("double")
        / F.lit(float(_KMV_SPACE))
    )
    pkey = F.floor(F.log(u) / F.col("n_chars") * F.lit(1e10))
    return (
        d.select("doc_id", "lang", "n_chars", pkey.alias("pkey_e10"))
        .orderBy(F.col("pkey_e10").desc(), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )


T_SAMPLE_WEIGHTED_SQL = f"""
WITH h AS (SELECT doc_id, lang, n_chars,
                  CAST({_phash_sql("CAST(doc_id AS VARCHAR)", "ws")} + 1
                       AS DOUBLE) / {float(_KMV_SPACE)} AS u
           FROM documents)
SELECT doc_id, lang, n_chars,
       CAST(FLOOR(ln(u) / n_chars * 1e10) AS BIGINT) AS pkey_e10
FROM h
ORDER BY pkey_e10 DESC, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


PR_SCALE = 1_000_000_000_000  # fixed-point rank units
PR_ITERS = 2
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as integer ratio


def g_pagerank_fixedpoint(spark, sf_dir):
    """Graph analytics with a FULL oracle: fixed-point integer
    PageRank over the supplier→customer graph (who supplied whose
    orders — lineitem ⋈ orders edges). Floating-point PageRank can't
    hash-match across engines (contribution sums expose reduction
    order), so ranks are BIGINT micro-units and every step is integer
    arithmetic — sums are order-independent, division is floor, both
    engines agree bit-exactly. The engine's float PageRank for crawl
    graphs lives in operators/linkgraph.py (numpy-oracle tested);
    this is its falsifiable relational twin. Per iteration: one
    equi-join on src + one hash aggregate on dst — the linkgraph
    shuffle shape."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = PR_SCALE // n
    teleport = PR_D_DEN - PR_D_NUM

    r = nodes.withColumn("rank", F.lit(base).cast("long"))
    for _ in range(PR_ITERS):
        rd = r.join(deg, r["node"] == deg["src"], "left").select(
            "node", "rank", "deg"
        )
        dangling = int(
            rd.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(rd.where(F.col("deg").isNotNull()), e["src"] == rd["node"])
            .select("dst", F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_rank = (
            F.lit((teleport * base) // PR_D_DEN)
            + F.expr(
                f"((coalesce(c, 0L) + {dangling // n}L) * {PR_D_NUM}L) "
                f"DIV {PR_D_DEN}L"
            )
        ).cast("long")
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select("node", new_rank.alias("rank"))
            .localCheckpoint()
        )
    # r is checkpoint-materialized — the cached graph sides can go
    e.unpersist()
    nodes.unpersist()
    return r.orderBy(F.col("rank").desc(), "node").limit(20)


def _pr_sql() -> str:
    base_expr = f"({PR_SCALE} // n)"
    tele = PR_D_DEN - PR_D_NUM
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT node, {base_expr} AS rank FROM nodes, nn)",
    ]
    prev = "r0"
    for it in range(1, PR_ITERS + 1):
        ctes.append(
            f"""dang{it} AS (SELECT COALESCE(SUM(rank), 0) AS dangling
  FROM {prev} r LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""c{it} AS MATERIALIZED (
  SELECT e.dst, SUM(r.rank // deg.deg) AS c
  FROM e JOIN {prev} r ON e.src = r.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{it} AS MATERIALIZED (
  SELECT nodes.node,
         ({tele} * {base_expr}) // {PR_D_DEN}
         + ((COALESCE(c{it}.c, 0) + dangling // n) * {PR_D_NUM}) // {PR_D_DEN}
           AS rank
  FROM nodes CROSS JOIN nn CROSS JOIN dang{it}
  LEFT JOIN c{it} ON nodes.node = c{it}.dst)"""
        )
        prev = f"r{it}"
    return (
        "WITH " + ",\n".join(ctes)
        # CAST: rank arithmetic propagates to HUGEINT in DuckDB; output
        # columns must be BIGINT so the driver hasher renders ints
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM {prev} "
        "ORDER BY rank DESC, node LIMIT 20"
    )


G_PAGERANK_SQL = _pr_sql()


HITS_SCALE = 1_000_000  # fixed-point score units (bounded so a*SCALE fits BIGINT)
HITS_ITERS = 2
HITS_TOP_K = 10


def g_hits_fixedpoint(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999) over the same
    supplier→customer bipartite graph as g_pagerank_fixedpoint — the
    graph family's second algorithm, again in ORDER-INDEPENDENT
    fixed-point integer arithmetic so both engines agree bit-exactly:
    auth = Σ incoming hub scores, hub = Σ outgoing auth scores, each
    step renormalized to L1 mass HITS_SCALE by floor division against
    a committed scalar total (the standard L2 norm needs sqrt — the
    L1 variant preserves the ranking and stays in BIGINT). Per half-
    iteration: one equi-join + one hash aggregate — the linkgraph
    shuffle shape; the normalizer is a one-scalar collect like
    PageRank's dangling mass. Output: top-{K} hubs and top-{K}
    authorities, kind-tagged."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    hub = (
        e.select("src").distinct()
        .withColumn("h", F.lit(HITS_SCALE).cast("long"))
    )
    auth = None
    for _ in range(HITS_ITERS):
        a_raw = (
            e.join(hub, "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        ).localCheckpoint()
        a_tot = int(a_raw.agg(F.sum("a")).collect()[0][0])
        auth = a_raw.select(
            "dst", F.expr(f"(a * {HITS_SCALE}L) DIV {a_tot}L").alias("a")
        ).localCheckpoint()
        h_raw = (
            e.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        ).localCheckpoint()
        h_tot = int(h_raw.agg(F.sum("h")).collect()[0][0])
        hub = h_raw.select(
            "src", F.expr(f"(h * {HITS_SCALE}L) DIV {h_tot}L").alias("h")
        ).localCheckpoint()
    e.unpersist()
    top_h = (
        hub.select(
            F.col("src").alias("node"), F.lit("hub").alias("kind"),
            F.col("h").alias("score"),
        )
        .orderBy(F.col("score").desc(), "node")
        .limit(HITS_TOP_K)
    )
    top_a = (
        auth.select(
            F.col("dst").alias("node"), F.lit("auth").alias("kind"),
            F.col("a").alias("score"),
        )
        .orderBy(F.col("score").desc(), "node")
        .limit(HITS_TOP_K)
    )
    return top_a.unionByName(top_h).orderBy(
        "kind", F.col("score").desc(), "node"
    )


def _hits_sql() -> str:
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        f"h0 AS (SELECT DISTINCT src, CAST({HITS_SCALE} AS BIGINT) AS h "
        "FROM e)",
    ]
    prev_h = "h0"
    for it in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""ar{it} AS MATERIALIZED (
  SELECT dst, SUM(h) AS a FROM e JOIN {prev_h} USING (src) GROUP BY dst)"""
        )
        ctes.append(f"at{it} AS (SELECT SUM(a) AS t FROM ar{it})")
        ctes.append(
            f"""a{it} AS MATERIALIZED (
  SELECT dst, (a * {HITS_SCALE}) // t AS a FROM ar{it} CROSS JOIN at{it})"""
        )
        ctes.append(
            f"""hr{it} AS MATERIALIZED (
  SELECT src, SUM(a) AS h FROM e JOIN a{it} USING (dst) GROUP BY src)"""
        )
        ctes.append(f"ht{it} AS (SELECT SUM(h) AS t FROM hr{it})")
        ctes.append(
            f"""h{it} AS MATERIALIZED (
  SELECT src, (h * {HITS_SCALE}) // t AS h FROM hr{it} CROSS JOIN ht{it})"""
        )
        prev_h = f"h{it}"
    n = HITS_ITERS
    return (
        "WITH " + ",\n".join(ctes) + f""",
top_a AS (SELECT dst AS node, 'auth' AS kind, CAST(a AS BIGINT) AS score
          FROM a{n} ORDER BY score DESC, node LIMIT {HITS_TOP_K}),
top_h AS (SELECT src AS node, 'hub' AS kind, CAST(h AS BIGINT) AS score
          FROM h{n} ORDER BY score DESC, node LIMIT {HITS_TOP_K})
SELECT * FROM (SELECT * FROM top_a UNION ALL SELECT * FROM top_h)
ORDER BY kind, score DESC, node"""
    )


G_HITS_SQL = _hits_sql()


def j_asof_join(spark, sf_dir):
    """AS-OF join — the time-series operator Spark lacks natively:
    each purchase event matched to the user's most recent view at or
    before it (ties on ts broken by larger event_id; purchases with
    no prior view keep NULLs — a LEFT as-of). Implemented the
    scale-safe way: union-tag the two event slices, ONE shuffle on
    user_id, and a running last(ignoreNulls) window carries the
    latest view forward — never an inequality join, never a per-key
    candidate explosion, cost O(n log n) in the partition sort. The
    ordering key (ts, tag, event_id) with view-tag 0 < purchase-tag 1
    pins `<=` semantics and the tiebreak exactly, so both engines
    agree row-for-row. Gap is integer microseconds via TZ-free
    timestampdiff / date_diff on the NTZ wall-clock values — no float
    time arithmetic, no session-timezone exposure."""
    e = _t(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("tag"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "tag",
        F.last("v_id", ignorenulls=True).over(w).alias("view_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return (
        carried.where(F.col("tag") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "view_id",
            "view_ts",
            F.expr("timestampdiff(MICROSECOND, view_ts, ts)").alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


J_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
         CASE WHEN event_type = 'view' THEN event_id END AS v_id,
         CASE WHEN event_type = 'view' THEN ts END AS v_ts
  FROM events WHERE event_type IN ('view', 'purchase')),
carried AS (
  SELECT user_id, ts, event_id, tag,
         last_value(v_id IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, tag, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
         last_value(v_ts IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, tag, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
  FROM tagged)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       view_id, view_ts,
       date_diff('microseconds', view_ts, ts) AS gap_us
FROM carried WHERE tag = 1 ORDER BY purchase_id
"""


RANGE_WIN_US = 3_600_000_000  # 1 hour in integer microseconds


def j_range_bucketed(spark, sf_dir):
    """Bucketed RANGE join — the scale technique for inequality-only
    joins: per purchase, count the clicks (any user) in the preceding
    hour. Naively `c.ts > p.ts - 1h AND c.ts <= p.ts` has no equality
    key, so Spark compiles it to BroadcastNestedLoopJoin — O(n·m) and
    a driver OOM at size. Instead both sides are binned into 1-hour
    buckets of integer microseconds: a purchase in bucket B can only
    see clicks from buckets B-1 and B, so each click is exploded into
    (own bucket, next bucket) and the join becomes an EQUI-join on
    the bucket key — shuffled hash join, candidates bounded by
    per-2-bucket click density, the exact range predicate applied
    after. Each (purchase, click) pair meets at exactly one key, so
    no dedup pass is needed. Left join keeps zero-click purchases."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    us = F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)")
    hour_bin = F.expr(f"timestampdiff(HOUR, {epoch}, ts)")  # integer floor
    e = _t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        us.alias("p_us"),
        hour_bin.alias("bin"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.explode(F.array(hour_bin, hour_bin + 1)).alias("bin"),
        us.alias("c_us"),
    )
    hit = F.when(
        (F.col("c_us") > F.col("p_us") - RANGE_WIN_US)
        & (F.col("c_us") <= F.col("p_us")),
        1,
    )
    return (
        p.join(c, "bin", "left")
        .groupBy("purchase_id")
        .agg(F.count(hit).alias("n_clicks_1h"))
        .orderBy("purchase_id")
    )


J_RANGE_SQL = f"""
SELECT p.event_id AS purchase_id, COUNT(c.ts) AS n_clicks_1h
FROM events p LEFT JOIN events c
  ON c.event_type = 'click'
 AND epoch_us(c.ts) > epoch_us(p.ts) - {RANGE_WIN_US}
 AND epoch_us(c.ts) <= epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
ORDER BY p.event_id
"""


def sk_cms_merge(spark, sf_dir):
    """CMS mergeability audit — the COUNTER-family contract,
    completing the trilogy with sk_kmv_merge (theta: K-smallest
    union) and sk_hll_merge (registers: elementwise max): count-min
    cells merge by elementwise ADDITION (Cormode & Muthukrishnan
    2005 §4.1), because frequencies over a disjoint stream split are
    additive — each partition keeps its own d×w matrix and only
    matrices move. Corpus word stream split by doc-id parity, each
    half sketched, merged cell-wise; the gate pins every cell of
    merge(sketch(A), sketch(B)) equal to sketch(A ⊎ B) — summarized
    as total mass, occupied-cell count, and an md5 over the sorted
    (row, col, count) stream so ANY cell mismatch flips the hash.

    Scale shape: three d·w-cell hash aggregates + one cell-wise sum
    over ≤ 2·d·w rows; the verdict aggregate runs on ≤ d·w rows."""
    d = _t(spark, sf_dir, "documents")

    def cells_of(df):
        words = df.select(
            F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w")
        )
        rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
        return (
            words.select("w", rows)
            .select("r", _cms_col(F.col("w"), F.col("r")).alias("c"))
            .groupBy("r", "c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    whole = cells_of(d)
    merged = (
        cells_of(d.where(F.expr("doc_id % 2 = 0")))
        .unionByName(cells_of(d.where(F.expr("doc_id % 2 = 1"))))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )

    def digest(cells, p):
        return cells.agg(
            F.sum("cnt").alias(f"{p}_mass"),
            F.count(F.lit(1)).alias(f"{p}_cells"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(
                                ",",
                                F.col("r").cast("string"),
                                F.col("c").cast("string"),
                                F.col("cnt").cast("string"),
                            )
                        )
                    ),
                )
            ).alias(f"{p}_md5"),
        )

    ws, ms = digest(whole, "whole"), digest(merged, "merged")
    return ws.crossJoin(ms).select(
        F.lit(CMS_D).alias("d"),
        F.lit(CMS_W).alias("w"),
        "whole_mass",
        "merged_mass",
        "whole_cells",
        "merged_cells",
        F.expr(
            "whole_mass = merged_mass AND whole_cells = merged_cells "
            "AND whole_md5 = merged_md5"
        ).alias("merge_invariant"),
    )


def _cms_merge_sql() -> str:
    def cells(flt: str, name: str) -> str:
        return f"""{name} AS (
  SELECT r, {_cms_col_sql('w', 'r')} AS c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents{flt}),
       (SELECT unnest(range(0, {CMS_D})) AS r)
  GROUP BY r, c)"""

    def digest(src: str, p: str) -> str:
        return f"""{p} AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS {p}_mass,
         CAST(COUNT(*) AS BIGINT) AS {p}_cells,
         md5(string_agg(CAST(r AS VARCHAR) || ',' || CAST(c AS VARCHAR)
             || ',' || CAST(cnt AS VARCHAR), '|'
             ORDER BY CAST(r AS VARCHAR) || ',' || CAST(c AS VARCHAR)
                      || ',' || CAST(cnt AS VARCHAR))) AS {p}_md5
  FROM {src})"""

    return f"""
WITH {cells('', 'whole')},
{cells(' WHERE doc_id % 2 = 0', 'h0')},
{cells(' WHERE doc_id % 2 = 1', 'h1')},
mergedc AS (
  SELECT r, c, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) GROUP BY r, c),
{digest('whole', 'ws')},
{digest('mergedc', 'ms')}
SELECT {CMS_D} AS d, {CMS_W} AS w,
       ws_mass AS whole_mass, ms_mass AS merged_mass,
       ws_cells AS whole_cells, ms_cells AS merged_cells,
       ws_mass = ms_mass AND ws_cells = ms_cells
         AND ws_md5 = ms_md5 AS merge_invariant
FROM ws CROSS JOIN ms
"""


CMS_D, CMS_W = 4, 256  # count-min depth × width
CMS_TOP_K = 10


def _cms_col(word_col, row_col):
    """Portable per-row CMS column index: md5-derived 60-bit hash of
    'cms{row}:{word}' mod width — same family as _phash but with the
    row id folded into the salt so the D rows are independent."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cms"),
                    row_col.cast("string"),
                    F.lit(":"),
                    word_col,
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(CMS_W))


def _cms_col_sql(word_expr: str, row_expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('cms' || CAST({row_expr} AS VARCHAR) "
        f"|| ':' || ({word_expr})), 1, 15) AS BIGINT) % {CMS_W}"
    )


def sk_cms_heavy(spark, sf_dir):
    """Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    a {CMS_D}×{CMS_W} counter matrix over the corpus word stream,
    probed with the exact top-{CMS_TOP_K} words — exact count, CMS
    estimate (min over rows), and the guaranteed-nonnegative
    overestimate. Like sk_kmv_distinct, the sketch is a pure function
    of the portable md5 hash family and integer sums, so it is FULLY
    oracle-checked — the counter matrix itself must agree bit-exactly
    across engines. Scale shape: building the sketch is ONE
    map-side-combinable hash aggregate into d·w = {CMS_D}·{CMS_W}
    cells (constant state per partition — mergeable across
    partitions, rounds, or streaming micro-batches by cell-wise sum);
    the probe side is K rows broadcast against the tiny counter
    table. No per-word state ever shuffles."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w")
    )
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    counters = (
        words.select("w", rows)
        .select("r", _cms_col(F.col("w"), F.col("r")).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "w")
        .limit(CMS_TOP_K)
    )
    probe_cells = probes.select(
        "w", "n_exact", rows
    ).select("w", "n_exact", "r", _cms_col(F.col("w"), F.col("r")).alias("c"))
    return (
        probe_cells.join(counters, ["r", "c"])
        .groupBy("w", "n_exact")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            F.col("w").alias("word"),
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.col("n_exact").desc(), "word")
    )


SK_CMS_SQL = f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents),
cells AS (
  SELECT w, r, {_cms_col_sql('w', 'r')} AS c
  FROM words, range(0, {CMS_D}) t(r)),
counters AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c),
probes AS (
  SELECT w, COUNT(*) AS n_exact FROM words GROUP BY w
  ORDER BY n_exact DESC, w LIMIT {CMS_TOP_K}),
probe_cells AS (
  SELECT w, n_exact, r, {_cms_col_sql('w', 'r')} AS c
  FROM probes, range(0, {CMS_D}) t(r)),
est AS (
  SELECT p.w, p.n_exact, MIN(cnt) AS cms_estimate
  FROM probe_cells p JOIN counters USING (r, c)
  GROUP BY p.w, p.n_exact)
SELECT w AS word, n_exact, cms_estimate,
       cms_estimate - n_exact AS overestimate
FROM est ORDER BY n_exact DESC, word
"""


def t_sampling_temperature(spark, sf_dir):
    """Temperature-based sampling weights (the multilingual-corpus
    rebalancing formula, p_i ∝ n_i^α — mBERT/XLM-R style): per
    language, the raw share, the α=0.5 tempered share, and the
    up/down-sampling factor the data loader applies. α is pinned to
    0.5 because sqrt is IEEE-754 correctly rounded — the ONLY
    transcendental either engine computes here, so the result is
    bit-identical where a general pow() could differ in the last ulp.
    Each sqrt is quantized ONCE to exact BIGINT micro-units
    (floor(sqrt·1e6) of a correctly-rounded double is
    engine-identical); from there the normalizer sum, both shares and
    the boost are pure integer floor-divisions — no decimal rounding
    anywhere. One tiny hash agg + a one-row broadcast — scan-shaped."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    sq = F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0))
    per = per.select("lang", "n_docs", sq.alias("_sq_e6"))
    tot = per.agg(
        F.sum("n_docs").alias("_n"),
        F.sum("_sq_e6").alias("_z"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.expr("n_docs * 1000000L div _n").alias("p_raw_ppm"),
            F.expr("_sq_e6 * 1000000L div _z").alias("p_temp_ppm"),
            F.expr(
                "(_sq_e6 * 1000000L div _z) * 1000000L div "
                "(n_docs * 1000000L div _n)"
            ).alias("boost_e6"),
        )
        .orderBy("lang")
    )


T_TEMPERATURE_SQL = """
WITH per AS (SELECT lang, COUNT(*) AS n_docs,
                    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0)
                         AS BIGINT) AS _sq_e6
             FROM documents GROUP BY lang),
tot AS (SELECT SUM(n_docs) AS _n, SUM(_sq_e6) AS _z FROM per)
SELECT lang, n_docs,
       CAST(n_docs * 1000000 // _n AS BIGINT) AS p_raw_ppm,
       CAST(_sq_e6 * 1000000 // _z AS BIGINT) AS p_temp_ppm,
       CAST((_sq_e6 * 1000000 // _z) * 1000000
         // (n_docs * 1000000 // _n) AS BIGINT) AS boost_e6
FROM per, tot ORDER BY lang
"""


MIRROR_DF_CAP = 50  # drop shingles present in more than this many sources
MIRROR_T_PPM = 500000  # jaccard_ppm at/above which two sources are mirrors


def d_mirror_sources(spark, sf_dir):
    """Mirror-host detection (the crawl-dedup move ABOVE document
    level: www/no-www mirrors, CDN clones, scraped re-hosts share
    most of their content): source-level trigram-shingle sets
    compared pairwise by Jaccard. The pair space is the inverted
    index on shared shingles — bounded by content sharing, never
    n(sources)² — with the same document-frequency discipline as the
    doc-level joins: a shingle present in > MIRROR_DF_CAP sources is
    boilerplate and is excluded from the intersection (documented
    approximation — it deflates a true mirror's measured overlap by
    at most the cap-frequency mass; set sizes in the union
    denominator stay exact).

    100 TB posture: state per source is one shingle set (hash agg),
    the join key space is shingles with df ≤ cap, and output is one
    row per overlapping host pair — this is how mirror maps of the
    whole web are actually built."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "source", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).where(F.size("w") >= 3)
    sh = w.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
            )
        ).alias("shingle"),
    ).distinct()
    sh = sh.persist()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    low = sh.join(
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= MIRROR_DF_CAP)
        .select("shingle"),
        "shingle",
    )
    inter = (
        low.alias("a")
        .join(low.alias("b"), "shingle")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.expr("n_common * 1000000L div (sa.n_sh + sb.n_sh - n_common)")
    return (
        inter.join(sizes.alias("sa"), F.col("src_a") == F.col("sa.source"))
        .join(sizes.alias("sb"), F.col("src_b") == F.col("sb.source"))
        .select(
            "src_a",
            "src_b",
            "n_common",
            jac.alias("jaccard_ppm"),
            (jac >= MIRROR_T_PPM).alias("is_mirror"),
        )
        .orderBy("src_a", "src_b")
    )


D_MIRROR_SQL = f"""
WITH w AS (SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents WHERE len(string_split_regex(lower(trim(text)),
                                                       '\\s+')) >= 3),
sh AS (SELECT DISTINCT source,
              unnest(list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       FROM w),
sizes AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
low AS (SELECT * FROM sh WHERE shingle IN
        (SELECT shingle FROM sh GROUP BY shingle
         HAVING COUNT(*) <= {MIRROR_DF_CAP})),
inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
          FROM low a JOIN low b
            ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY 1, 2)
SELECT src_a, src_b, n_common,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) AS jaccard_ppm,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common)
           >= {MIRROR_T_PPM} AS is_mirror
FROM inter JOIN sizes sa ON sa.source = src_a
           JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


PRIOR_K = 20  # pseudo-count for the source-prior shrinkage (integer)


def t_domain_prior(spark, sf_dir):
    """Source-level quality prior (the RefinedWeb/CCNet move of
    filtering by DOMAIN reputation, not just per-document signals):
    each source's mean quality is shrunk toward the global mean by an
    empirical-Bayes pseudo-count (small sources get the global prior,
    big sources earn their own), then blended 50/50 back into every
    document's score. Everything is exact BIGINT micro-units end to
    end: doc_score_e6 = chars*1e6 div words (an integer ratio), the
    per-source SUM is order-independent integer arithmetic, the
    shrunk prior uses n·mean = sum exactly so
    prior_e6 = (s·g_n + K·g_s) div ((n+K)·g_n), and the blend is an
    integer average — no float, no ROUND, nothing for cross-engine
    decimal rounding to disagree on. Shape: one per-doc scalar pass →
    one hash agg per source → a one-row global agg broadcast in → a
    broadcast join back to docs.

    100 TB posture: two partial-aggregating shuffles (source ≪ docs)
    and a broadcast of the source table; no window, no Python. The
    s·g_n product stays under 2^63 past sf1; a 10^10-doc deployment
    would divide first (the g_effective_diameter discipline)."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "source",
        F.expr(
            "n_chars * 1000000L div "
            "size(split(trim(text), '\\\\s+'))"
        ).alias("doc_score_e6"),
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_score_e6").alias("_s"),
    )
    glob = docs.agg(
        F.sum("doc_score_e6").alias("_gs"),
        F.count(F.lit(1)).alias("_gn"),
    )
    prior = (
        per_src.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "n_docs",
            F.expr("_s div n_docs").alias("source_mean_e6"),
            F.expr(
                f"(_s * _gn + {PRIOR_K} * _gs) div "
                f"((n_docs + {PRIOR_K}) * _gn)"
            ).alias("source_prior_e6"),
        )
    )
    return (
        docs.join(F.broadcast(prior), "source")
        .select(
            "doc_id",
            "source",
            "doc_score_e6",
            "source_mean_e6",
            "source_prior_e6",
            F.expr("(doc_score_e6 + source_prior_e6) div 2").alias(
                "adj_score_e6"
            ),
        )
        .orderBy("doc_id")
    )


T_DOMAIN_PRIOR_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         n_chars * 1000000
           // len(string_split_regex(trim(text), '\\s+')) AS doc_score_e6
  FROM documents),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, SUM(doc_score_e6) AS _s
  FROM docs GROUP BY source),
gm AS (
  SELECT SUM(doc_score_e6) AS _gs, COUNT(*) AS _gn FROM docs),
prior AS (
  SELECT source, n_docs, _s // n_docs AS source_mean_e6,
         (_s * _gn + {PRIOR_K} * _gs)
           // ((n_docs + {PRIOR_K}) * _gn) AS source_prior_e6
  FROM per_src, gm)
SELECT doc_id, docs.source, doc_score_e6,
       CAST(source_mean_e6 AS BIGINT) AS source_mean_e6,
       CAST(source_prior_e6 AS BIGINT) AS source_prior_e6,
       CAST((doc_score_e6 + source_prior_e6) // 2 AS BIGINT) AS adj_score_e6
FROM docs JOIN prior ON docs.source = prior.source
ORDER BY doc_id
"""


PACK_BUDGET = 256  # tokens per training sequence


def t_pack_sequences(spark, sf_dir):
    """Sequence packing — the concat-then-chunk step every LLM
    pretraining pipeline runs between curation and tokenized shards
    (GPT-2 style: concatenate the document stream, cut every
    PACK_BUDGET tokens). Each language is an independent stream
    (real pipelines pack per shard), so the prefix-sum window is
    PARTITIONED — no single-partition sort at any corpus size; within
    a stream docs are ordered by doc_id (deterministic). Per doc:
    whitespace token count, start offset in its stream, the pack
    (chunk) its first token lands in, and the offset inside that pack.
    One shuffle on lang; the arithmetic is pure codegen.

    100 TB posture: the window state is one running long per
    partition; packs never materialize — downstream writers consume
    (pack_id, offset) to lay out shards without a second pass."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select("doc_id", "lang", n_tok.alias("n_tokens"))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    return (
        t.select("doc_id", "lang", "n_tokens", start)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "start_off",
            F.floor(F.col("start_off") / PACK_BUDGET).alias("pack_id"),
            (F.col("start_off") % PACK_BUDGET).alias("pack_off"),
        )
        .orderBy("lang", "doc_id")
    )


T_PACK_SQL = f"""
WITH t AS (SELECT doc_id, lang,
                  len(string_split_regex(trim(text), '\\s+')) AS n_tokens
           FROM documents),
s AS (SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
      FROM t)
SELECT doc_id, lang, n_tokens, CAST(start_off AS BIGINT) AS start_off,
       CAST(FLOOR(CAST(start_off AS DOUBLE) / {PACK_BUDGET}) AS BIGINT)
         AS pack_id,
       CAST(start_off % {PACK_BUDGET} AS BIGINT) AS pack_off
FROM s ORDER BY lang, doc_id
"""


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def t_pii_scrub(spark, sf_dir):
    """PII redaction (the C4/RefinedWeb curation staple missing from
    the t_ family): emails, IPv4s, and phone-shaped tokens replaced by
    typed placeholders, with per-document detection counts and an md5
    fingerprint of the scrubbed text so the REDACTION itself is
    hash-checked cross-engine, not just the counts. The synthetic
    corpus carries no PII, so each document deterministically injects
    a doc_id-derived email (+ a second one on even ids), phone, and IP
    on BOTH engines — the patterns must then find exactly what was
    planted. Regex subset chosen to mean the same thing in Java
    (Spark) and RE2 (DuckDB): classes, bounded repetition, \\b.
    Scrub order pinned email → IP → phone on both sides.

    100 TB posture: pure map-side codegen (regexp over one column, no
    shuffle, no Python) — the scan IS the operator; output writes
    straight back out."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" cc admin@example.org"))
        .otherwise(F.lit("")),
        F.lit(" or call 555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    r = d.select("doc_id", raw.alias("raw"))
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw", PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )

    def n(pat):
        return F.size(F.regexp_extract_all("raw", F.lit(pat), 0)).cast("long")

    return r.select(
        "doc_id",
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IP).alias("n_ips"),
        n(PII_PHONE).alias("n_phones"),
        F.md5(scrub).alias("scrubbed_fp"),
    ).orderBy("doc_id")


T_PII_SQL = f"""
WITH raw AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           || CASE WHEN doc_id % 2 = 0 THEN ' cc admin@example.org'
                   ELSE '' END
           || ' or call 555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS raw
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(raw, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(raw, '{PII_IP}')) AS n_ips,
       len(regexp_extract_all(raw, '{PII_PHONE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
           '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_IP}', '<IP>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_fp
FROM raw ORDER BY doc_id
"""


ANCHOR_SAMPLE_K = 5


def a_anchor_rollup(spark, sf_dir):
    """Relational twin of ``operators/anchortext.py::anchor_texts``
    (the web-corpus rollup the reference lacks — crawler.js:93-107
    keeps only hrefs): per target, total reference count, distinct
    source count, and a bounded deterministic sample of distinct
    labels. Here the events table plays the edge list (user_id =
    target, event_type:day = anchor label). The load-bearing shape is
    the CAP BEFORE THE COLLECT: distinct labels are ranked by a
    per-target window and cut at K *before* the collect_list, so the
    aggregation buffer for a 10^8-in-degree hub holds ≤ K rows —
    Spark plans it as WindowGroupLimit (partial+final), pushing the
    cut below the shuffle. Sample serialized as a '|'-joined sorted
    string (order-pinned on both engines)."""
    e = _t(spark, sf_dir, "events")
    tag = F.concat_ws(":", "event_type", F.date_format("ts", "yyyy-MM-dd"))
    stats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
    )
    tags = e.select("user_id", tag.alias("tag")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("tag"))
    capped = tags.withColumn("_rn", rn).where(F.col("_rn") <= ANCHOR_SAMPLE_K)
    samp = capped.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_list("tag")), "|").alias(
            "tag_sample"
        )
    )
    return (
        stats.join(samp, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.coalesce("tag_sample", F.lit("")).alias("tag_sample"),
        )
        .orderBy("user_id")
    )


A_ANCHOR_SQL = f"""
WITH tags AS (SELECT DISTINCT user_id,
                     event_type || ':' || strftime(ts, '%Y-%m-%d') AS tag
              FROM events),
capped AS (SELECT user_id, tag,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tag) AS rn
           FROM tags),
samp AS (SELECT user_id, string_agg(tag, '|' ORDER BY tag) AS tag_sample
         FROM capped WHERE rn <= {ANCHOR_SAMPLE_K} GROUP BY user_id),
stats AS (SELECT user_id, COUNT(*) AS n_events,
                 COUNT(DISTINCT event_type) AS n_types
          FROM events GROUP BY user_id)
SELECT stats.user_id, n_events, n_types,
       COALESCE(tag_sample, '') AS tag_sample
FROM stats LEFT JOIN samp USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# BFS seed distance / LM-surprisal quality filter / boilerplate strip (r3d)
# ---------------------------------------------------------------------------

BFS_MAX_DEPTH = 6  # both engines stop expanding past this hop count
BFS_SEED_MOD = 10  # seeds = suppliers with s_suppkey % MOD == 1 (any SF)


def g_bfs_depth(spark, sf_dir):
    """BFS hop distance from a seed set — the crawl's own frontier-
    expansion loop (driver.py round loop; crawler.js:543-575 drains
    its queue in exactly this order) as a falsifiable graph query,
    completing the graph family beside PageRank, HITS and the
    connected components in dedup_clusters. Undirected supplier ↔
    customer edges (lineitem ⋈ orders); seeds are a deterministic
    supplier subset; dist(node) = first round that reaches it.

    Per round: one edge equi-join keyed on src + distinct + LEFT ANTI
    against the visited set — identical shuffle shape to the engine's
    seen probe (expand.py D1), frontier-bounded, localCheckpoint per
    hop so lineage stays O(1); terminates on empty frontier or
    BFS_MAX_DEPTH. The DuckDB oracle computes the same distances
    independently via a bounded WITH RECURSIVE walk + MIN(dist), so
    the Spark loop's convergence itself is gate-checked."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    e = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    seeds = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % BFS_SEED_MOD == 1)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
        )
    )
    dist = seeds.select("node", F.lit(0).alias("dist")).localCheckpoint()
    frontier = dist.select("node")
    for depth in range(1, BFS_MAX_DEPTH + 1):
        reached = (
            e.join(frontier, e["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(dist, "node", "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        dist = dist.unionByName(
            new.select("node", F.lit(depth).alias("dist"))
        ).localCheckpoint()
        frontier = new
    return dist.orderBy("node")


G_BFS_SQL = f"""
WITH RECURSIVE
fwd AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS MATERIALIZED (
  SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
seeds AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = 1),
walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {BFS_MAX_DEPTH})
SELECT node, MIN(dist) AS dist FROM walk GROUP BY node ORDER BY node
"""


ATTACK_HUBS = 10


def g_attack_tolerance(spark, sf_dir):
    """Attack tolerance / seed-robustness of crawl coverage (Albert,
    Jeong & Barabási, Nature 2000 "Error and attack tolerance of
    complex networks" — scale-free graphs shrug off random node loss
    but collapse when the HUBS go; for a crawler the hubs ARE the
    link routers, so this measures how much of the reachable web a
    bounded-depth crawl loses if the top hubs are dead, blocked by
    robots, or rate-limited to uselessness — the resilience number a
    seed-list review reads). Same seeds and BFS_MAX_DEPTH-bounded
    expansion as g_bfs_depth, run twice: on the full undirected graph
    and on the graph with the ATTACK_HUBS highest-degree nodes (and
    their edges) removed; output reach counts and the coverage loss
    in exact BIGINT ppm.

    100 TB posture: two bounded BFS loops in the engine's own
    frontier shuffle shape (edge equi-join + distinct + left-anti per
    hop, localCheckpoint per hop); hub selection is one degree
    aggregate + a K-row TakeOrdered; the removal is two broadcast
    anti-joins on the K-row hub set.

    Measured at sf0.01: coverage loss 6,250 ppm (0.6%) — this dense
    bipartite graph is attack-TOLERANT (every customer has ~30
    supplier routes, so no hub is load-bearing), the opposite of the
    scale-free web's collapse; the number, not the assumption, is
    what the query delivers."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    e = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    seeds = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % BFS_SEED_MOD == 1)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
        )
    )
    hubs = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), "src")
        .limit(ATTACK_HUBS)
        .select(F.col("src").alias("hub"))
        .localCheckpoint()
    )

    def reach(edges, sd) -> int:
        dist = sd.select("node").distinct().localCheckpoint()
        frontier = dist
        for _ in range(BFS_MAX_DEPTH):
            reached = (
                edges.join(frontier, edges["src"] == frontier["node"])
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            new = reached.join(dist, "node", "left_anti").localCheckpoint()
            if new.isEmpty():
                break
            dist = dist.unionByName(new).localCheckpoint()
            frontier = new
        return dist.count()

    base = reach(e, seeds)
    e2 = (
        e.join(F.broadcast(hubs), e["src"] == hubs["hub"], "left_anti")
        .join(F.broadcast(hubs), F.col("dst") == hubs["hub"], "left_anti")
        .localCheckpoint()
    )
    seeds2 = seeds.join(
        F.broadcast(hubs), seeds["node"] == hubs["hub"], "left_anti"
    )
    removed = reach(e2, seeds2)
    return spark.range(1).select(
        F.lit(ATTACK_HUBS).alias("n_hubs_removed"),
        F.lit(base).cast("long").alias("reach_base"),
        F.lit(removed).cast("long").alias("reach_removed"),
        F.expr(
            f"CAST(({base} - {removed}) AS BIGINT) * 1000000L div {base}"
        ).alias("coverage_loss_ppm"),
    )


G_ATTACK_SQL = f"""
WITH RECURSIVE fwd AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS MATERIALIZED (
  SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
hubs AS MATERIALIZED (
  SELECT node FROM deg ORDER BY deg DESC, node LIMIT {ATTACK_HUBS}),
e2 AS MATERIALIZED (
  SELECT src, dst FROM e
  WHERE src NOT IN (SELECT node FROM hubs)
    AND dst NOT IN (SELECT node FROM hubs)),
seeds AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = 1),
seeds2 AS (SELECT node FROM seeds
           WHERE node NOT IN (SELECT node FROM hubs)),
walk1(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1 FROM walk1 w JOIN e ON e.src = w.node
  WHERE w.dist < {BFS_MAX_DEPTH}),
walk2(node, dist) AS (
  SELECT node, 0 FROM seeds2
  UNION
  SELECT e2.dst, w.dist + 1 FROM walk2 w JOIN e2 ON e2.src = w.node
  WHERE w.dist < {BFS_MAX_DEPTH}),
base AS (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) AS reach_base
         FROM walk1),
removed AS (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) AS reach_removed
            FROM walk2)
SELECT {ATTACK_HUBS} AS n_hubs_removed, reach_base, reach_removed,
       (reach_base - reach_removed) * 1000000 // reach_base
         AS coverage_loss_ppm
FROM base CROSS JOIN removed
"""


def g_frontier_growth(spark, sf_dir):
    """Frontier growth profile — the per-round sizing table the crawl
    planner reads BEFORE committing executor counts (the round loop's
    cost is frontier-size-shaped: the branching factor says how fast
    rounds explode, and the round where growth turns negative is
    where the seen-set — not fetch bandwidth — becomes the
    bottleneck; g_effective_diameter says WHERE expansion stops
    paying, this says how steep the ride is). Per BFS depth from the
    g_bfs_depth seed set: newly-reached node count, cumulative reach,
    and the branching ratio new/previous in exact BIGINT ppm.

    100 TB posture: the bounded BFS loop in the engine's own frontier
    shuffle shape; the growth table is one aggregate over the
    (node, dist) result — ≤ BFS_MAX_DEPTH+1 rows out; the lag window
    runs over depths, never nodes."""
    dist = g_bfs_depth(spark, sf_dir)
    per = dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("dist")
    return (
        per.withColumn("cum_reach", F.sum("n_new").over(
            Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
        ))
        .withColumn("prev", F.lag("n_new").over(w))
        .select(
            "dist",
            "n_new",
            "cum_reach",
            F.expr("n_new * 1000000L div prev").alias("branching_ppm"),
        )
        .orderBy("dist")
    )


G_FRONTIER_GROWTH_SQL = f"""
WITH RECURSIVE fwd AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS MATERIALIZED (
  SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
seeds AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = 1),
walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {BFS_MAX_DEPTH}),
d AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node),
per AS (SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_new FROM d GROUP BY dist)
SELECT dist, n_new,
       CAST(SUM(n_new) OVER (ORDER BY dist
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_reach,
       n_new * 1000000 // LAG(n_new) OVER (ORDER BY dist) AS branching_ppm
FROM per
ORDER BY dist
"""


# keep docs whose mean token surprisal ≤ 12 bits — threshold held in
# integer ppm so the keep predicate is exact BIGINT floor-division on
# both engines (never a ROUND(double) comparison)
SURPRISAL_MAX_PPM = 12_000_000


def t_zipf_surprisal(spark, sf_dir):
    """Unigram-LM surprisal quality filter — the CCNet/Gopher
    perplexity-filter stage (PAPERS.md: LM-score filtering is the
    standard web-corpus quality gate) made falsifiable: rare-token
    soup scores high, natural text low. Per-token surprisal
    floor(log2(total/cnt)) is computed EXACTLY in integers as
    length(bin(total DIV cnt)) - 1 (floor(log2(floor(a/b))) ==
    floor(log2(a/b)) for a ≥ b ≥ 1), so there is no log(), no pow(),
    and no float accumulation anywhere — per-doc sums are BIGINT,
    order-independent, bit-identical across engines; the mean and the
    keep predicate are exact BIGINT ppm floor-divisions.

    Plan: two hash aggregates (vocabulary, per-doc) + one frequency
    join on term. The join is left unhinted: AQE broadcasts the vocab
    while it is small and switches to a shuffle join with skew
    splitting when it is not — hot stopword keys are the classic skew
    case and exactly what AQE skew-join handles; at open-web scale a
    min-count vocab prune bounds the table further."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("term"),
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    bits = (
        words.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("total DIV cnt"))) - F.lit(1))
            .cast("long")
            .alias("bits"),
        )
    )
    mean_bits = F.expr("sum_bits * 1000000L div n_tokens")
    return (
        bits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_bits",
            mean_bits.alias("mean_bits_ppm"),
            (mean_bits <= F.lit(SURPRISAL_MAX_PPM)).alias("keep"),
        )
        .orderBy("doc_id")
    )


T_SURPRISAL_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents),
vocab AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY term),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
bits AS (
  SELECT doc_id, length(bin(total // cnt)) - 1 AS bits
  FROM words JOIN vocab USING (term) CROSS JOIN tot),
docagg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(bits) AS sum_bits
  FROM bits GROUP BY doc_id)
SELECT doc_id, n_tokens, CAST(sum_bits AS BIGINT) AS sum_bits,
       CAST(sum_bits * 1000000 // n_tokens AS BIGINT) AS mean_bits_ppm,
       sum_bits * 1000000 // n_tokens <= {SURPRISAL_MAX_PPM} AS keep
FROM docagg ORDER BY doc_id
"""


BOILER_MIN_DF = 5  # shingle is boilerplate when ≥ this many docs of a source share it
BOILER_KEEP_PPM = 500000  # keep docs retaining ≥ this ppm after the strip


def t_boilerplate(spark, sf_dir):
    """Cross-document boilerplate measurement — the CCNet line-dedup
    stage at shingle granularity: navigation text / headers repeated
    across a source's documents are exactly the shingles whose
    within-source document frequency is high. Flags shingles with
    df ≥ BOILER_MIN_DF, scores each doc by its retained (non-
    boilerplate) ratio, and emits the keep decision. Distinct from
    d_mirror_sources (which compares sources pairwise) and
    t_repetition_filter (within-doc repetition): this is the
    cross-doc-within-source axis.

    Plan: one groupBy (source, shingle) for df, then the lookup join
    back on the SAME keys — the aggregate side reuses its exchange,
    and the join output is exactly |shingles| rows (each distinct
    (doc, shingle) matches one df row; no fan-out, so the hot-
    boilerplate shingle that motivates SHINGLE_DF_CAP elsewhere is
    harmless here — high df raises a counter, never a pair count)."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "source", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 3)
    sh = w.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
            )
        ).alias("shingle"),
    ).distinct()
    dfx = sh.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(dfx, ["source", "shingle"])
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= BOILER_MIN_DF).cast("long")).alias("n_boiler"),
        )
    )
    ratio = F.expr(
        "(n_shingles - n_boiler) * 1000000L div n_shingles"
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_shingles",
        "n_boiler",
        ratio.alias("retained_ppm"),
        (ratio >= F.lit(BOILER_KEEP_PPM)).alias("keep"),
    ).orderBy("doc_id")


T_BOILER_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM w WHERE len(w) >= 3),
dfx AS (SELECT source, shingle, COUNT(*) AS df
        FROM sh GROUP BY source, shingle),
per_doc AS (
  SELECT doc_id, sh.source, COUNT(*) AS n_shingles,
         SUM(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS n_boiler
  FROM sh JOIN dfx ON sh.source = dfx.source AND sh.shingle = dfx.shingle
  GROUP BY doc_id, sh.source)
SELECT doc_id, source, n_shingles, CAST(n_boiler AS BIGINT) AS n_boiler,
       CAST((n_shingles - n_boiler) * 1000000 // n_shingles
            AS BIGINT) AS retained_ppm,
       (n_shingles - n_boiler) * 1000000 // n_shingles
         >= {BOILER_KEEP_PPM} AS keep
FROM per_doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation) (r3e)
# ---------------------------------------------------------------------------

TRI_TOP_K = 20  # report the K most clustered parts


def _tri_corner_counts(spark, sf_dir):
    """Shared builder for the triangle family: (deg, per-node triangle
    counts) over the part co-purchase graph, degree-ordered.

    The scalable algorithm, not the naive one: every undirected edge is
    oriented from its LOWER-degree endpoint to its higher (ties by id),
    so wedge enumeration groups on the low-degree endpoint and the
    wedge count is sum(d_out(v) choose 2) with d_out bounded by O(sqrt(m))
    — the classic O(m^1.5) bound. A naive neighbor self-join on hot
    nodes is O(sum d(v)^2), quadratic in the hottest node's degree; the
    orientation is exactly what kills that. Each triangle is counted
    once (a<b<c in orientation order), then exploded back to its three
    corners for per-node counts. Plan: equi-join edge build (bounded by
    per-order basket size), one degree aggregate, two hash joins to
    attach degrees, wedge self-join on src + closing-edge hash join —
    all shuffle hash/sort-merge, no Python, no windows. e is
    localCheckpoint-ed once and reused by both wedge sides and the
    closing probe."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e = (
        edges.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v")
        .select(
            F.when(
                lower_first,
                F.struct(
                    F.col("u").alias("src"),
                    F.col("v").alias("dst"),
                    F.col("du").alias("dsrc"),
                    F.col("dv").alias("ddst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("src"),
                    F.col("u").alias("dst"),
                    F.col("dv").alias("dsrc"),
                    F.col("du").alias("ddst"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.dsrc", "o.ddst")
        .localCheckpoint()
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    wedges = (
        e1.join(e2, F.col("e1.src") == F.col("e2.src"))
        .where(
            (F.col("e1.ddst") < F.col("e2.ddst"))
            | (
                (F.col("e1.ddst") == F.col("e2.ddst"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    closing = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    counts = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg, counts


def g_triangle_counts(spark, sf_dir):
    """Per-node triangle counts over the part co-purchase graph — link
    graphs from a crawl (linkgraph.py; crawler.js:543-575 emits the
    edges) get their clustering structure measured this way (community
    detection, spam-farm detection: spam link farms are near-cliques).
    Completes the graph family beside PageRank, HITS, BFS and the
    connected components in dedup_clusters. Algorithm and plan notes:
    _tri_corner_counts."""
    _deg, counts = _tri_corner_counts(spark, sf_dir)
    return counts.orderBy(F.col("n_triangles").desc(), "part").limit(TRI_TOP_K)


def g_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient c(v) = 2·T(v) / (d(v)·(d(v)−1)) —
    the per-node near-clique score that rides on the degree-ordered
    triangle counts (spam link farms score ≈ 1, organic hubs ≪ 1;
    Watts–Strogatz 1998, public). Nodes with d < 2 are excluded (the
    coefficient is undefined). Deterministic: T and d are exact
    BIGINTs, the coefficient is ONE IEEE division of exact integers
    (2·T by d·(d−1)) rounded to 6 — no float accumulation anywhere.
    Plan: the triangle pipeline plus one left join deg⋈counts on node
    (missing count = 0 triangles), top-K is TakeOrderedAndProject."""
    deg, counts = _tri_corner_counts(spark, sf_dir)
    per_node = (
        deg.where(F.col("deg") >= 2)
        .join(counts.withColumnRenamed("part", "node"), "node", "left")
        .select(
            F.col("node").alias("part"),
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_tri"),
        )
    )
    coeff = F.expr("2 * n_tri * 1000000L div (deg * (deg - 1))")
    return (
        per_node.select(
            "part", "deg", "n_tri", coeff.alias("clust_coeff_ppm")
        )
        .orderBy(F.col("clust_coeff_ppm").desc(), "part")
        .limit(TRI_TOP_K)
    )


_TRI_BASE_CTE = """edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY node),
e AS MATERIALIZED (
  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN du ELSE dv END AS dsrc,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS ddst
  FROM edges
  JOIN deg d1 ON d1.node = edges.u
  JOIN deg d2 ON d2.node = edges.v
  , LATERAL (SELECT d1.deg AS du, d2.deg AS dv) x),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e1.src = e2.src
  WHERE e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
tri AS (
  SELECT w.a, w.b, w.c FROM wedges w JOIN e ON e.src = w.b AND e.dst = w.c),
counts AS (
  SELECT part, COUNT(*) AS n_triangles FROM (
    SELECT a AS part FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY part)"""


G_TRI_SQL = f"""
WITH {_TRI_BASE_CTE}
SELECT part, n_triangles FROM counts
ORDER BY n_triangles DESC, part LIMIT {TRI_TOP_K}
"""


G_CLUST_SQL = f"""
WITH {_TRI_BASE_CTE}
SELECT node AS part, deg, COALESCE(n_triangles, 0) AS n_tri,
       2 * COALESCE(n_triangles, 0) * 1000000
           // (deg * (deg - 1)) AS clust_coeff_ppm
FROM deg LEFT JOIN counts ON counts.part = deg.node
WHERE deg >= 2
ORDER BY clust_coeff_ppm DESC, part LIMIT {TRI_TOP_K}
"""


def g_clustering_by_degree(spark, sf_dir):
    """Clustering-vs-degree curve C(k) (Ravasz & Barabási PRE 2003 —
    hierarchical networks show C(k) ∝ k⁻¹: low-degree nodes sit in
    dense local cliques, hubs bridge between them; for a crawl graph
    a FLAT C(k) instead says the high-degree nodes are link farms —
    spam cliques keep their clustering as they grow, organic hubs
    dilute it, so the slope of this curve is a corpus-level spam
    signal). Per log2-degree band over the triangle pipeline's
    per-node (deg, triangles): node count, exact triangle and
    wedge-pair sums, and the band transitivity 2·ΣT / Σd(d−1) — the
    ratio-of-exact-sums form (ONE IEEE division per band; averaging
    per-node doubles would need order-sensitive float sums, this
    needs none).

    100 TB posture: the degree-ordered triangle machinery (wedges
    keyed by the LOWER-degree endpoint — the standard no-hub-blowup
    trick) + one hash(band) rollup over the NODE table.

    Measured at sf0.01: band transitivity 0.116 → 0.093 → 0.086
    across degree bands 32/64/128 — declining with degree, the
    organic (hierarchical, non-spam) reading."""
    deg, counts = _tri_corner_counts(spark, sf_dir)
    per_node = (
        deg.where(F.col("deg") >= 2)
        .join(counts.withColumnRenamed("part", "node"), "node", "left")
        .select(
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_tri"),
        )
    )
    return (
        per_node.select(
            F.expr("length(bin(deg))").alias("band"), "deg", "n_tri"
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("n_tri").alias("sum_tri"),
            F.sum(F.expr("deg * (deg - 1)")).alias("sum_pairs"),
        )
        .select(
            "band",
            F.expr("shiftleft(1L, band - 1)").alias("min_deg"),
            "n_nodes",
            "sum_tri",
            F.expr("2 * sum_tri * 1000000L div sum_pairs").alias(
                "band_clust_ppm"
            ),
        )
        .orderBy("band")
    )


G_CLUST_BY_DEG_SQL = f"""
WITH {_TRI_BASE_CTE},
per_node AS (
  SELECT deg, COALESCE(n_triangles, 0) AS n_tri
  FROM deg LEFT JOIN counts ON counts.part = deg.node
  WHERE deg >= 2),
bands AS (
  SELECT length(bin(deg)) AS band, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(n_tri) AS BIGINT) AS sum_tri,
         CAST(SUM(deg * (deg - 1)) AS BIGINT) AS sum_pairs
  FROM per_node GROUP BY 1)
SELECT band, (1::BIGINT << (band - 1)) AS min_deg, n_nodes, sum_tri,
       2 * sum_tri * 1000000 // sum_pairs AS band_clust_ppm
FROM bands ORDER BY band
"""


# ---------------------------------------------------------------------------
# Portable HyperLogLog distinct-count sketch (r3e)
# ---------------------------------------------------------------------------

def sk_hll_merge(spark, sf_dir):
    """HLL mergeability audit — the same distributed contract
    sk_kmv_merge pins for the theta family, proven for the register
    family (Flajolet et al. 2007 §4; Heule's HLL++ at Google leans
    entirely on it): sketch(A ∪ B) must equal elementwise
    register-max(sketch(A), sketch(B)) BIT FOR BIT, because at 10^10
    urls every partition keeps its own 256 registers and only
    registers ever move (this is also precisely what the streaming
    HLL face's idempotent register-max merge relies on,
    streaming/cardinality.py). Corpus split by doc-id parity, each
    half sketched over its distinct words, merged by per-bucket max;
    the gate pins harmonic sum, register count, AND estimate equal to
    the whole-corpus sketch's.

    Scale shape: three 256-bucket aggregates + one 512-row max-merge
    — register state is O(m) regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")

    def regs_of(df):
        words = (
            df.select(
                F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias(
                    "g"
                )
            )
            .where(F.length("g") > 0)
            .distinct()
        )
        h = words.select(_phash(F.col("g"), "hll").alias("hv"))
        rb = h.select(
            (F.col("hv") % HLL_M).alias("bucket"),
            F.expr(
                f"least(CASE WHEN hv DIV {HLL_M} = 0 THEN 53 "
                f"ELSE 53 - length(bin(hv DIV {HLL_M})) END, {HLL_RHO_CAP})"
            ).alias("rho"),
        )
        return rb.groupBy("bucket").agg(F.max("rho").alias("r"))

    whole = regs_of(d)
    r0 = regs_of(d.where(F.expr("doc_id % 2 = 0")))
    r1 = regs_of(d.where(F.expr("doc_id % 2 = 1")))
    merged = (
        r0.unionByName(r1).groupBy("bucket").agg(F.max("r").alias("r"))
    )

    def stats(regs, p):
        s_total = F.col(f"{p}_sne") + (
            F.lit(HLL_M) - F.col(f"{p}_m")
        ) * F.lit(1 << HLL_RHO_CAP)
        return (
            regs.agg(
                F.sum(
                    F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - r)")
                ).alias(f"{p}_sne"),
                F.count(F.lit(1)).alias(f"{p}_m"),
            ),
            s_total,
        )

    ws, w_total = stats(whole, "w")
    ms, m_total = stats(merged, "g")
    return ws.crossJoin(ms).select(
        F.lit(HLL_M).alias("m"),
        w_total.alias("whole_s"),
        m_total.alias("merged_s"),
        F.floor(
            F.lit(_HLL_NUM) / w_total.cast("double") * F.lit(100.0)
        ).alias("whole_est_e2"),
        F.floor(
            F.lit(_HLL_NUM) / m_total.cast("double") * F.lit(100.0)
        ).alias("merged_est_e2"),
        (
            (w_total == m_total) & (F.col("w_m") == F.col("g_m"))
        ).alias("merge_invariant"),
    )


def _hll_merge_sql() -> str:
    def regs(src_filter: str, name: str) -> str:
        return f"""{name} AS (
  SELECT hv % {HLL_M} AS bucket,
         MAX(LEAST(CASE WHEN hv // {HLL_M} = 0 THEN 53
                   ELSE 53 - length(bin(hv // {HLL_M})) END,
                   {HLL_RHO_CAP})) AS r
  FROM (SELECT {_phash_sql('g', 'hll')} AS hv
        FROM (SELECT DISTINCT
                unnest(string_split_regex(lower(trim(text)), '\\s+')) AS g
              FROM documents{src_filter})
        WHERE length(g) > 0)
  GROUP BY 1)"""

    cap = 1 << HLL_RHO_CAP
    return f"""
WITH {regs('', 'whole')},
{regs(' WHERE doc_id % 2 = 0', 'h0')},
{regs(' WHERE doc_id % 2 = 1', 'h1')},
merged AS (
  SELECT bucket, MAX(r) AS r
  FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) GROUP BY bucket),
ws AS (SELECT CAST(SUM(1::BIGINT << ({HLL_RHO_CAP} - r)) AS BIGINT) AS sne,
              CAST(COUNT(*) AS BIGINT) AS mu FROM whole),
ms AS (SELECT CAST(SUM(1::BIGINT << ({HLL_RHO_CAP} - r)) AS BIGINT) AS sne,
              CAST(COUNT(*) AS BIGINT) AS mu FROM merged)
SELECT {HLL_M} AS m,
       ws.sne + ({HLL_M} - ws.mu) * {cap} AS whole_s,
       ms.sne + ({HLL_M} - ms.mu) * {cap} AS merged_s,
       CAST(FLOOR({_HLL_NUM!r}
                  / CAST(ws.sne + ({HLL_M} - ws.mu) * {cap} AS DOUBLE)
                  * 100.0) AS BIGINT) AS whole_est_e2,
       CAST(FLOOR({_HLL_NUM!r}
                  / CAST(ms.sne + ({HLL_M} - ms.mu) * {cap} AS DOUBLE)
                  * 100.0) AS BIGINT) AS merged_est_e2,
       ws.sne + ({HLL_M} - ws.mu) * {cap}
         = ms.sne + ({HLL_M} - ms.mu) * {cap}
         AND ws.mu = ms.mu AS merge_invariant
FROM ws CROSS JOIN ms
"""


HLL_M = 256        # registers (2^8 buckets from the low 8 hash bits)
HLL_RHO_CAP = 40   # clamp rho so 2^(cap-rho) sums stay comfortably in BIGINT

# alpha_m * m^2 * 2^cap as ONE shared float literal (Flajolet et al. 2007
# bias constant, m=256) — both engines parse the same decimal literal, so
# the only float op left in the estimate is a single IEEE division by S.
_HLL_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << HLL_RHO_CAP)


def sk_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-word count per language (Flajolet-Fuchs-
    Gandouet-Meunier 2007, public) — completes the sketch family
    beside sk_cms_heavy (frequency) and sk_kmv_distinct (theta): HLL
    is THE sketch a crawl uses for per-domain distinct-URL counting at
    scale (fixed 256-register state per key, mergeable by register
    max). Portable down to the bit: bucket = phash % 256, rho = leading
    -zero rank of the remaining 52 hash bits computed EXACTLY in
    integers as 53 - length(bin(w)) (no log()), registers are max(rho)
    per bucket, and the harmonic sum S = Σ 2^(40−r) is an exact BIGINT
    (empty registers contribute 2^40; rho clamped at 40 so S ≤ 256·2^40
    ≪ 2^63 — the clamp can only bite after a register sees 40 leading
    zeros, p ≈ 2^-40 per item, and both engines clamp identically so
    the gate is exact regardless). The estimate is the raw HLL
    estimator alpha·m²·2^40 / S — one IEEE division by an exact
    integer. The small-range linear-counting correction needs ln() and
    is deliberately NOT applied (ln is not cross-engine bit-stable);
    n_exact and rel_err quantify the raw estimator's error honestly,
    the KMV pattern. Scale shape: one distinct + one 256-bucket
    aggregate per key — register state is O(m) per group, mergeable,
    never a top-K window."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select("lang", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("g"))
        .where(F.length("g") > 0)
        .distinct()
    )
    h = words.select("lang", _phash(F.col("g"), "hll").alias("hv"))
    rb = h.select(
        "lang",
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(
            f"least(CASE WHEN hv DIV {HLL_M} = 0 THEN 53 "
            f"ELSE 53 - length(bin(hv DIV {HLL_M})) END, {HLL_RHO_CAP})"
        ).alias("rho"),
    )
    regs = rb.groupBy("lang", "bucket").agg(F.max("rho").alias("r"))
    sketch = regs.groupBy("lang").agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - r)")).alias("s_nonempty"),
        F.count(F.lit(1)).alias("m_used"),
    )
    s_total = F.col("s_nonempty") + (F.lit(HLL_M) - F.col("m_used")) * F.lit(
        1 << HLL_RHO_CAP
    )
    est = F.lit(_HLL_NUM) / s_total.cast("double")
    exact = words.groupBy("lang").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(sketch, "lang")
        .select(
            "lang",
            "n_exact",
            F.col("m_used").alias("regs_used"),
            F.floor(est * F.lit(100.0)).alias("hll_estimate_e2"),
            F.floor(
                F.abs(est - F.col("n_exact"))
                / F.col("n_exact")
                * F.lit(1000000.0)
            ).alias("rel_err_ppm"),
        )
        .orderBy("lang")
    )


SK_HLL_SQL = f"""
WITH words AS (
  SELECT DISTINCT lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS g
  FROM documents),
h AS (SELECT lang, {_phash_sql('g', 'hll')} AS hv
      FROM words WHERE length(g) > 0),
rb AS (SELECT lang, hv % {HLL_M} AS bucket,
              LEAST(CASE WHEN hv // {HLL_M} = 0 THEN 53
                    ELSE 53 - length(bin(hv // {HLL_M})) END,
                    {HLL_RHO_CAP}) AS rho
       FROM h),
regs AS (SELECT lang, bucket, MAX(rho) AS r FROM rb GROUP BY lang, bucket),
sketch AS (
  SELECT lang,
         SUM((1::BIGINT << ({HLL_RHO_CAP} - r))) AS s_nonempty,
         COUNT(*) AS m_used
  FROM regs GROUP BY lang),
exact AS (
  SELECT lang, COUNT(*) AS n_exact
  FROM words WHERE length(g) > 0 GROUP BY lang)
SELECT e.lang, n_exact, m_used AS regs_used,
       CAST(FLOOR({_HLL_NUM!r} / CAST(s_nonempty
             + ({HLL_M} - m_used) * ({1 << HLL_RHO_CAP}::BIGINT) AS DOUBLE)
             * 100.0) AS BIGINT) AS hll_estimate_e2,
       CAST(FLOOR(ABS({_HLL_NUM!r} / CAST(s_nonempty
             + ({HLL_M} - m_used) * ({1 << HLL_RHO_CAP}::BIGINT) AS DOUBLE)
             - n_exact) / n_exact * 1000000.0) AS BIGINT) AS rel_err_ppm
FROM exact e JOIN sketch USING (lang)
ORDER BY e.lang
"""


# ---------------------------------------------------------------------------
# k-core decomposition by iterative peeling (r3e)
# ---------------------------------------------------------------------------

KCORE_SUPPORT = 2   # co-purchase support floor — sparsifies the graph
KCORE_K = 2         # the 2-core: iteratively strip pendants/trees
KCORE_MAX_PEELS = 12


def g_kcore_peel(spark, sf_dir):
    """k-core membership by iterative peeling (Seidman 1983, public) —
    the fifth graph algorithm beside PageRank, HITS, BFS and the
    triangle family: repeatedly remove nodes of degree < k until fixed
    point; what remains is the maximal subgraph of min-degree ≥ k. On
    a crawl's link graph the k-core is the spam/link-farm core and the
    densely-linked hub set (cf. crawler.js:543-575's emitted edges).
    The graph is the co-purchase graph SPARSIFIED by a support floor
    (pairs co-bought in ≥ KCORE_SUPPORT orders) — without it the raw
    graph's min degree exceeds k and the peel is vacuous; with it the
    peel genuinely cascades (4 rounds at sf0.01, 7 at sf0.1).

    Determinism: the alive set shrinks monotonically, so count
    equality between consecutive rounds ⇔ set fixpoint; the Spark
    loop early-exits there while the oracle runs all
    KCORE_MAX_PEELS bounded rounds — identical at fixpoint by
    construction, and the converged flag is count(a_R) == count(a_R-1)
    on both sides. Plan: per peel ONE degree aggregate over the
    induced subgraph (two alive-set equi-joins, the BFS shuffle
    shape); localCheckpoint truncates per-round lineage; counts are
    exact BIGINTs, no floats anywhere."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("sup"))
        .where(F.col("sup") >= KCORE_SUPPORT)
        .select("u", "v")
    )
    adj = (
        edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint()
    )
    alive = adj.select(F.col("u").alias("node")).distinct().localCheckpoint()
    n_prev = alive.count()
    converged = False
    for _ in range(KCORE_MAX_PEELS):
        deg = (
            adj.join(alive.withColumnRenamed("node", "u"), "u")
            .join(alive.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        new_alive = (
            deg.where(F.col("deg") >= KCORE_K)
            .select(F.col("u").alias("node"))
            .localCheckpoint()
        )
        n_new = new_alive.count()
        alive = new_alive
        if n_new == n_prev:
            converged = True
            break
        n_prev = n_new
    core_deg = (
        adj.join(alive.withColumnRenamed("node", "u"), "u")
        .join(alive.withColumnRenamed("node", "v"), "v")
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
    return core_deg.select(
        F.col("u").alias("part"),
        "core_deg",
        F.lit(converged).alias("converged"),
    ).orderBy(F.col("core_deg").desc(), "part")


def _kcore_sql() -> str:
    peels = []
    prev = "a0"
    for i in range(1, KCORE_MAX_PEELS + 1):
        # each peel CTE is referenced twice (both join sides) —
        # MATERIALIZED stops DuckDB's CTE inlining from going 2^R
        peels.append(
            f"a{i} AS MATERIALIZED (SELECT adj.u AS node FROM adj "
            f"JOIN {prev} x ON x.node = adj.u "
            f"JOIN {prev} y ON y.node = adj.v "
            f"GROUP BY adj.u HAVING COUNT(*) >= {KCORE_K})"
        )
        prev = f"a{i}"
    last, prev2 = f"a{KCORE_MAX_PEELS}", f"a{KCORE_MAX_PEELS - 1}"
    peel_block = ",\n".join(peels)
    return f"""
WITH e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {KCORE_SUPPORT}),
adj AS MATERIALIZED (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
a0 AS (SELECT DISTINCT u AS node FROM adj),
{peel_block}
SELECT adj.u AS part, COUNT(*) AS core_deg,
       ((SELECT COUNT(*) FROM {last}) = (SELECT COUNT(*) FROM {prev2}))
         AS converged
FROM adj
JOIN {last} x ON x.node = adj.u
JOIN {last} y ON y.node = adj.v
GROUP BY adj.u
ORDER BY core_deg DESC, part
"""


G_KCORE_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# PMI collocation mining (r3e)
# ---------------------------------------------------------------------------

PMI_MIN_PAIR = 5   # min bigram support — kills one-off noise pairs
PMI_TOP_K = 50


def t_collocations_pmi(spark, sf_dir):
    """Collocation / phrase mining by pointwise mutual information
    (Church & Hanks 1990, public) — the corpus-analysis operator that
    finds multiword units ("hong kong", "et al") for tokenizer vocab
    construction and n-gram quality audits over a web corpus. PMI =
    log[ p(xy) / (p(x)p(y)) ]; since log is monotone we rank by the
    RATIO itself and never call log(): score = ((((n_xy·N)·N)/B)/n_x)
    /n_y evaluated in ONE fixed left-to-right chain of IEEE ops —
    identical expression tree on both engines, all inputs exact
    BIGINTs, no accumulation (the float-determinism discipline: fixed
    scalar expressions are bit-stable; only order-free float SUMS are
    not). Support floor n_xy ≥ PMI_MIN_PAIR is the standard guard
    against the PMI low-frequency pathology. Scale shape: one token
    explode + two hash aggregates (bigram counts, unigram counts) +
    two 1:1 lookup joins on word (unigram side broadcasts while
    small, AQE shuffle+skew-split when not) + two 1-row broadcast
    scalars; top-K is TakeOrderedAndProject. No windows, no self-join
    blowup — pair candidates are ADJACENT tokens only, |bigrams| ≤
    |tokens|, never n²."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(F.split(F.lower(F.trim("text")), "\\s+").alias("w")).where(
        F.size("w") >= 2
    )
    bi = (
        w.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> struct(w[i] AS w1, w[i+1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= PMI_MIN_PAIR)
    )
    uni = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot_n = uni.agg(F.sum("cnt").alias("n_total"))
    tot_b = (
        w.select(F.sum(F.size("w") - F.lit(1)).alias("b_total"))
    )
    score = (
        F.col("n_xy").cast("double")
        * F.col("n_total").cast("double")
        * F.col("n_total").cast("double")
        / F.col("b_total").cast("double")
        / F.col("nx").cast("double")
        / F.col("ny").cast("double")
    )
    return (
        bi.join(uni.withColumnsRenamed({"t": "w1", "cnt": "nx"}), "w1")
        .join(uni.withColumnsRenamed({"t": "w2", "cnt": "ny"}), "w2")
        .crossJoin(F.broadcast(tot_n))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "w1", "w2", "n_xy", "nx", "ny",
            F.floor(score * F.lit(1000000.0)).alias("pmi_ratio_e6"),
        )
        .orderBy(F.col("pmi_ratio_e6").desc(), "w1", "w2")
        .limit(PMI_TOP_K)
    )


T_PMI_SQL = f"""
WITH w AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
w2 AS (SELECT w FROM w WHERE len(w) >= 2),
bi AS (
  SELECT b.w1, b.w2, COUNT(*) AS n_xy FROM (
    SELECT unnest(list_transform(range(1, len(w)),
                  i -> {{'w1': w[i], 'w2': w[i+1]}})) AS b
    FROM w2)
  GROUP BY b.w1, b.w2
  HAVING COUNT(*) >= {PMI_MIN_PAIR}),
uni AS (
  SELECT t, COUNT(*) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
    FROM documents)
  GROUP BY t),
tot AS (SELECT SUM(cnt) AS n_total FROM uni),
totb AS (SELECT SUM(len(w) - 1) AS b_total FROM w2)
SELECT w1, w2, n_xy, u1.cnt AS nx, u2.cnt AS ny,
       CAST(FLOOR(CAST(n_xy AS DOUBLE) * CAST(n_total AS DOUBLE)
             * CAST(n_total AS DOUBLE) / CAST(b_total AS DOUBLE)
             / CAST(u1.cnt AS DOUBLE) / CAST(u2.cnt AS DOUBLE)
             * 1000000.0) AS BIGINT) AS pmi_ratio_e6
FROM bi JOIN uni u1 ON u1.t = bi.w1
        JOIN uni u2 ON u2.t = bi.w2, tot, totb
ORDER BY pmi_ratio_e6 DESC, w1, w2 LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# Two-star connected components (r3f)
# ---------------------------------------------------------------------------

TWOSTAR_SUPPORT = 2      # keep supplier↔customer pairs co-occurring in ≥2 orders
TWOSTAR_MAX_ITERS = 20   # two-star converges in O(log n) alternations
TWOSTAR_ORACLE_ROUNDS = 16  # label-prop fixpoint: 5 rounds @sf0.01, 11 @sf0.1


def g_components_twostar(spark, sf_dir):
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public) — the O(log n)-round CC algorithm, beside
    dedup_clusters' min-label propagation which needs O(diameter)
    rounds. On a web host graph the diameter is unbounded (link
    chains, pagination ladders), so two-star is the 100 TB algorithm:
    each alternation halves the tree height regardless of diameter.
    Graph: supplier↔customer pairs co-occurring in ≥ TWOSTAR_SUPPORT
    orders (the same deterministic bipartite graph as g_bfs_depth,
    support-floored like g_kcore_peel so the edge list stays sparse).

    Per alternation: ONE groupBy-min keyed on node + ONE equi-join
    back on the same key (the shuffle partitioning is reused between
    them) + distinct — no windows, no n² anywhere; localCheckpoint
    truncates per-round lineage. Node ids are strings compared with
    binary collation, identical in both engines; the fixpoint is a
    star per component, so label(u) = its unique out-edge target =
    min node of the component. The DuckDB oracle computes the same
    labels INDEPENDENTLY via TWOSTAR_ORACLE_ROUNDS unrolled rounds of
    min-label propagation over the symmetric adjacency (O(R·E), never
    the O(n²) transitive closure), so the Spark loop's convergence is
    itself gate-checked — cf. crawler.js:543-575, whose emitted link
    events are the edge stream this runs over in the crawl engine."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    und = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("a"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= TWOSTAR_SUPPORT)
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )  # canonical big→small orientation
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = und
    converged = False
    for _ in range(TWOSTAR_MAX_ITERS):
        # large-star over the symmetric view: for each node u, every
        # strictly-larger neighbor v re-links to m = min(Γ(u) ∪ {u})
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        ls = (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star over big→small edges: group u's smaller neighbors
        # plus u itself all re-link to the group min
        sm = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(sm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(sm.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        same = (
            ss.count() == e.count()
            and ss.exceptAll(e).isEmpty()
        )
        e = ss
        if same:
            converged = True
            break
    labels = (
        nodes.join(e.select(F.col("u").alias("node"), F.col("v").alias("lbl")), "node", "left")
        .groupBy("node")
        .agg(F.min("lbl").alias("mn"))
        .select(
            "node",
            F.coalesce("mn", F.col("node")).alias("component"),
            F.lit(converged).alias("converged"),
        )
    )
    return labels.orderBy("node")


def _twostar_sql() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, TWOSTAR_ORACLE_ROUNDS + 1):
        rounds.append(
            f"l{i} AS MATERIALIZED ("
            f"SELECT p.node, LEAST(p.lbl, MIN(q.lbl)) AS lbl "
            f"FROM {prev} p JOIN adj ON adj.u = p.node "
            f"JOIN {prev} q ON q.node = adj.v "
            f"GROUP BY p.node, p.lbl)"
        )
        prev = f"l{i}"
    last, prev2 = f"l{TWOSTAR_ORACLE_ROUNDS}", f"l{TWOSTAR_ORACLE_ROUNDS - 1}"
    block = ",\n".join(rounds)
    return f"""
WITH e0 AS (
  SELECT GREATEST(a, b) AS u, LEAST(a, b) AS v
  FROM (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS a,
               'c' || CAST(o_custkey AS VARCHAR) AS b
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {TWOSTAR_SUPPORT})
  GROUP BY 1, 2),
adj AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj),
{block}
SELECT f.node, f.lbl AS component,
       ((SELECT COUNT(*) FROM {last} x JOIN {prev2} y ON y.node = x.node
         WHERE x.lbl <> y.lbl) = 0) AS converged
FROM {last} f
ORDER BY f.node
"""


G_TWOSTAR_SQL = _twostar_sql()


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (r3f)
# ---------------------------------------------------------------------------

HISTQ_WIDTH = 64    # bucket width in chars
HISTQ_BUCKETS = 256  # overflow bucket at the top


def sk_hist_quantiles(spark, sf_dir):
    """Per-language length quantiles from a MERGEABLE equi-width
    histogram sketch — the fourth sketch beside HLL, count-min and
    KMV, completing the classic mergeable-summaries suite (Agarwal et
    al., "Mergeable Summaries", PODS 2012 — public). The sketch is the
    (lang, bucket)→count table: map-side partial aggregation compresses
    10^10 rows to ≤ HISTQ_BUCKETS rows per language BEFORE the shuffle,
    and two shards' sketches merge by adding counts — the property that
    makes it a sketch and not just a groupBy. Quantile estimate = upper
    edge of the first bucket whose cumulative count covers ⌈p·n⌉,
    the standard histogram-quantile read-out with bounded error W.

    Everything is BIGINT end-to-end: bucket = min(n_chars // W, B-1),
    the coverage test is cum·100 ≥ p·n in integers (no IEEE division,
    no float accumulation — exact and order-independent in any
    engine). Plan: one hash aggregate (the sketch), one window over
    ≤ B rows per language partition (bounded, never a global sort),
    one final aggregate. Used on a crawl corpus to size truncation /
    padding budgets per language (documents = the extracted-text
    table the engine's S3 sink emits; crawler.js:599-608)."""
    B, W = HISTQ_BUCKETS, HISTQ_WIDTH
    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.least((F.col("n_chars") / W).cast("long"), F.lit(B - 1)).alias("b"),
    )
    h = d.groupBy("lang", "b").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("lang").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("lang")
    c = h.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )

    def est(p):
        return (
            F.min(F.when(F.col("cum") * 100 >= p * F.col("n"), F.col("b"))) + 1
        ) * W

    return (
        c.groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            est(50).alias("p50_est"),
            est(90).alias("p90_est"),
            est(99).alias("p99_est"),
        )
        .orderBy("lang")
    )


SK_HISTQ_SQL = f"""
WITH h AS (
  SELECT lang, LEAST(n_chars // {HISTQ_WIDTH}, {HISTQ_BUCKETS - 1}) AS b,
         COUNT(*) AS cnt
  FROM documents GROUP BY 1, 2),
c AS (
  SELECT lang, b, cnt,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY b
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n
  FROM h)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       (MIN(CASE WHEN cum * 100 >= 50 * n THEN b END) + 1) * {HISTQ_WIDTH} AS p50_est,
       (MIN(CASE WHEN cum * 100 >= 90 * n THEN b END) + 1) * {HISTQ_WIDTH} AS p90_est,
       (MIN(CASE WHEN cum * 100 >= 99 * n THEN b END) + 1) * {HISTQ_WIDTH} AS p99_est
FROM c GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Inverted-index construction (r3f)
# ---------------------------------------------------------------------------

POSTINGS_SAMPLE_K = 8   # posting-list sample cap (before any collect)
INVIDX_TOP_TERMS = 100  # report the highest-df terms


def t_inverted_index(spark, sf_dir):
    """Inverted-index construction — the retrieval-infra operator
    BEHIND t_bm25_search (a search stack materializes term → posting
    lists once, then serves queries from them; Zobel & Moffat,
    "Inverted files for text search engines", CSUR 2006 — public).
    Per term: document frequency, total term frequency, and a bounded
    deterministic posting sample (first POSTINGS_SAMPLE_K doc_ids).

    The load-bearing shape is a_anchor_rollup's: the posting CAP
    comes BEFORE the collect — a per-term window ranked by doc_id is
    cut at K so a stopword's aggregation buffer holds ≤ K rows, never
    its full posting list (Spark plans WindowGroupLimit partial+final,
    the cut pushed below the shuffle). Everything else is two hash
    aggregates sharing the (term, doc_id) key; top-terms is
    TakeOrderedAndProject. All counts BIGINT; the sample serializes
    as a '|'-joined numerically-sorted string, order-pinned on both
    engines."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("t"),
    ).where(F.length("t") > 0)
    tf = tok.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("t").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("tf_total")
    )
    rn = F.row_number().over(Window.partitionBy("t").orderBy("doc_id"))
    capped = tf.withColumn("_rn", rn).where(F.col("_rn") <= POSTINGS_SAMPLE_K)
    samp = capped.groupBy("t").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("postings_sample")
    )
    return (
        stats.join(samp, "t")
        .select(
            F.col("t").alias("term"), "df", "tf_total", "postings_sample"
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(INVIDX_TOP_TERMS)
    )


T_INVIDX_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents),
tf AS (
  SELECT t, doc_id, COUNT(*) AS tf FROM tok WHERE length(t) > 0
  GROUP BY t, doc_id),
stats AS (
  SELECT t, COUNT(*) AS df, SUM(tf) AS tf_total FROM tf GROUP BY t),
capped AS (
  SELECT t, doc_id,
         ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM tf),
samp AS (
  SELECT t, string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id)
           AS postings_sample
  FROM capped WHERE rn <= {POSTINGS_SAMPLE_K} GROUP BY t)
SELECT stats.t AS term, df, CAST(tf_total AS BIGINT) AS tf_total,
       postings_sample
FROM stats JOIN samp ON samp.t = stats.t
ORDER BY df DESC, term
LIMIT {INVIDX_TOP_TERMS}
"""


# ---------------------------------------------------------------------------
# Join-key skew profiler (r3f)
# ---------------------------------------------------------------------------

SKEW_TOP_N = 10


def o_key_skew(spark, sf_dir):
    """Join-key skew profiler — the diagnostic run BEFORE choosing a
    skew strategy (salting, AQE skew-join, broadcast): per candidate
    join key, cardinality, hottest-key and top-{SKEW_TOP_N} load
    shares, and the Herfindahl concentration index (Σ share² — the
    expected relative load of a hash-partitioned reducer, ≈1/n_keys
    when uniform, →1 when one key dominates). This is the engine's
    own medicine: politeness salting (politeness.py) and the
    seen-set's hot-domain spread (seenset.py) exist because of
    exactly the distributions this measures.

    Determinism: shares are integer parts-per-million via BIGINT
    floor division (max·10⁶ DIV total); HHI's Σcnt² is an exact
    BIGINT order-free sum, finished by ONE fixed division chain +
    ROUND. Scale shape: one hash aggregate per profiled key + one
    order-free scalar aggregate; only the top-{SKEW_TOP_N} extraction
    uses a per-profile window (rank over the per-key COUNTS table,
    |keys| rows not |rows|; at open-web cardinalities the two-phase
    O1 rank substitutes — documented, same result)."""
    profiles = [
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("events.user_id", "events", "user_id"),
    ]
    outs = []
    for label, tbl, key in profiles:
        cnts = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # TakeOrderedAndProject top-N (partition-local heads + one
        # N-row merge): a global-window row_number here would drag
        # EVERY distinct key into a single partition — the exact skew
        # trap this profiler exists to measure.
        top = cnts.orderBy(F.col("cnt").desc(), F.col("k")).limit(
            SKEW_TOP_N
        )
        stats = cnts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total"),
            F.max("cnt").alias("max_cnt"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
        )
        topsum = top.agg(F.sum("cnt").alias("top_cnt"))
        outs.append(
            stats.crossJoin(topsum).select(
                F.lit(label).alias("profile"),
                "n_keys",
                "total",
                "max_cnt",
                F.expr("max_cnt * 1000000L DIV total").alias("top1_ppm"),
                F.expr("top_cnt * 1000000L DIV total").alias(
                    f"top{SKEW_TOP_N}_ppm"
                ),
                F.floor(
                    (F.col("s2").cast("double") / F.col("total"))
                    / F.col("total")
                    * F.lit(1000000000.0)
                ).alias("hhi_ppb"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("profile")


def _skew_sql() -> str:
    parts = []
    for label, tbl, key in (
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("events.user_id", "events", "user_id"),
    ):
        parts.append(f"""
SELECT '{label}' AS profile, n_keys, CAST(total AS BIGINT) AS total, max_cnt,
       CAST(max_cnt * 1000000 // total AS BIGINT) AS top1_ppm,
       CAST(top_cnt * 1000000 // total AS BIGINT) AS top{SKEW_TOP_N}_ppm,
       CAST(FLOOR(CAST(s2 AS DOUBLE) / total / total * 1000000000.0)
            AS BIGINT) AS hhi_ppb
FROM (
  SELECT COUNT(*) AS n_keys, SUM(cnt) AS total, MAX(cnt) AS max_cnt,
         SUM(cnt * cnt) AS s2
  FROM (SELECT {key} AS k, COUNT(*) AS cnt FROM {tbl} GROUP BY {key})),
(
  SELECT SUM(cnt) AS top_cnt FROM (
    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS rn
    FROM (SELECT {key} AS k, COUNT(*) AS cnt FROM {tbl} GROUP BY {key}))
  WHERE rn <= {SKEW_TOP_N})""")
    return " UNION ALL ".join(parts) + " ORDER BY profile"


O_SKEW_SQL = _skew_sql()


# ---------------------------------------------------------------------------
# BPE merge steps (r3f)
# ---------------------------------------------------------------------------

BPE_STEPS = 3


def _bpe_apply(repr_col, a, b):
    """Apply merge (a,b) to a space-separated symbol string: replace
    ' a b ' with ' ab ', three passes. Plain replace consumes the
    trailing space of each match, so a directly following occurrence
    misses its leading space in the same pass; any pair left after a
    pass is flanked by already-merged symbols and merges in the next,
    and runs of k adjacent occurrences need ⌈log⌉-ish passes — 3
    covers every run this corpus (or any natural-language corpus)
    produces. The contract is NOT HuggingFace scan-order parity; it is
    that both engines share ONE deterministic greedy convention, which
    they do because replace() is the same leftmost-non-overlapping
    algorithm in both."""
    pat = F.concat(F.lit(" "), a, F.lit(" "), b, F.lit(" "))
    rep = F.concat(F.lit(" "), a, b, F.lit(" "))
    out = repr_col
    for _ in range(3):
        out = F.replace(out, pat, rep)
    return out


def t_bpe_merges(spark, sf_dir):
    """Byte-pair-encoding merge learning (Sennrich-Haddow-Birch, "Neural
    Machine Translation of Rare Words with Subword Units", ACL 2016 —
    public): the tokenizer-vocabulary construction step between corpus
    curation and tokenized shards. {BPE_STEPS} merge iterations over
    the word-frequency table: count adjacent symbol pairs weighted by
    word frequency, pick the most frequent (ties broken on the pair
    string — pinned in both engines), merge it corpus-wide, repeat.
    Output: the learned merge table (step, left, right, pair_count).

    Scale shape per step: ONE explode + hash aggregate over the
    word-VOCABULARY (not the corpus — frequencies were aggregated
    once up front, the standard BPE trick), one 1-row top-pair
    TakeOrdered, one map-side replace. The chosen pair is bounded
    driver data (1 row/step, the bucket-prune collect class). The
    DuckDB oracle unrolls the same steps as CTEs with the top pair as
    a scalar CTE — cross-engine agreement checks pair counting, tie
    order, AND the merge-application convention (_bpe_apply)."""
    d = _t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    reprs = wf.select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", " $1"), F.lit(" ")
        ).alias("repr"),
        "n",
    ).localCheckpoint()

    merges = []
    for step in range(1, BPE_STEPS + 1):
        s = F.split(F.trim(F.col("repr")), " ")
        pairs = (
            reprs.where(F.size(s) >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(split(trim(repr), ' ')) - 2), "
                        "i -> concat(split(trim(repr), ' ')[i], '\t', "
                        "split(trim(repr), ' ')[i+1]))"
                    )
                ).alias("pair"),
                "n",
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()[0]
        a, b = top.pair.split("\t")
        merges.append((step, a, b, top.cnt))
        reprs = reprs.select(
            _bpe_apply(F.col("repr"), F.lit(a), F.lit(b)).alias("repr"), "n"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    ).orderBy("step")


def _bpe_sql() -> str:
    def apply_sql(r, t):
        out = f"{r}.repr"
        for _ in range(3):
            out = (
                f"replace({out}, ' ' || {t}.a || ' ' || {t}.b || ' ', "
                f"' ' || {t}.a || {t}.b || ' ')"
            )
        return out

    pair_cte = (
        "SELECT unnest(list_transform(generate_series(1, len(s) - 1), "
        "i -> s[i] || chr(9) || s[i+1])) AS pair, n "
        "FROM (SELECT string_split(trim(repr), ' ') AS s, n FROM {src}) "
        "WHERE len(s) >= 2"
    )
    ctes = [
        "wf AS MATERIALIZED (SELECT w, COUNT(*) AS n FROM ("
        "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w "
        "FROM documents) WHERE length(w) > 0 GROUP BY w)",
        "r0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', ' \\1', 'g') "
        "|| ' ' AS repr, n FROM wf)",
    ]
    prev = "r0"
    for i in range(1, BPE_STEPS + 1):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT pair, SUM(n) AS cnt FROM "
            f"({pair_cte.format(src=prev)}) GROUP BY pair)"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT string_split(pair, chr(9))[1] AS a, "
            f"string_split(pair, chr(9))[2] AS b, cnt FROM p{i} "
            f"ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT {apply_sql(prev, f't{i}')} AS repr, n "
            f"FROM {prev}, t{i})"
        )
        prev = f"r{i}"
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, a AS left, b AS right, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{i}"
        for i in range(1, BPE_STEPS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{selects} ORDER BY step"


T_BPE_SQL = _bpe_sql()


LINE_W = 8        # words per "line" (deterministic segmentation proxy)
LINE_DF_MIN = 5   # line is boilerplate when ≥ this many docs share it


def t_line_dedup(spark, sf_dir):
    """CCNet-style LINE-level dedup (Wenzek et al. 2020 §3.1 — remove
    lines repeated verbatim across the corpus: cookie banners, nav
    menus, share buttons; the single highest-yield cleanup CCNet
    applies before its LM filter). Fourth repetition axis beside the
    within-doc t_repetition_filter, within-source shingle t_boilerplate
    and source-pair d_mirror_sources: corpus-WIDE, exact-line
    granularity, and the STRIPPED TEXT ITSELF is md5-checked, not just
    the counts. The synthetic corpus has no newlines, so "lines" are
    deterministic 8-word windows (``slice``/list-slice give the same
    segmentation on both engines); a crawl-wide cookie banner and a
    per-source promo line are injected at aligned line positions on
    BOTH engines — the df counter must find exactly what was planted
    (df=corpus for the banner, df=docs-per-source for the promo, so
    the LINE_DF_MIN=5 threshold splits them differently per SF).

    100 TB posture: segmentation is pure codegen (no explode until the
    line table, which is |corpus|/8 rows); the boilerplate set — lines
    with df ≥ 5 — is a tiny aggregate BROADCAST back over the line
    table (the corpus is never shuffled for the membership test); the
    per-doc rebuild groups on doc_id, one shuffle. Reference scope:
    crawler.js has no text curation — this extends its collected
    corpus the way CCNet extends Common Crawl."""
    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit("cookie notice accept all cookies to continue reading "),
        F.lit("special offer from "),
        F.col("source"),
        F.lit(" today only buy now "),
        F.col("text"),
    )
    toks = d.select("doc_id", F.split(injected, " ").alias("toks"))
    lines = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(toks)-1) div {LINE_W}),"
                f" i -> array_join(slice(toks, i*{LINE_W}+1, {LINE_W}), ' '))"
            )
        ).alias("line_no", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= LINE_DF_MIN)
        .select("line", F.lit(1).alias("_b"))
    )
    marked = lines.join(F.broadcast(boiler), "line", "left")
    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("_b").isNull(), F.struct("line_no", "line"))
            )
        ).alias("_kl"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.expr("n_kept * 1000000L div n_lines").alias("kept_ppm"),
        F.md5(
            F.array_join(F.transform("_kl", lambda s: s["line"]), " ")
        ).alias("kept_fp"),
    ).orderBy("doc_id")


T_LINE_DEDUP_SQL = f"""
WITH base AS (
  SELECT doc_id,
         string_split('cookie notice accept all cookies to continue reading '
           || 'special offer from ' || source || ' today only buy now '
           || text, ' ') AS toks
  FROM documents),
lines AS (
  SELECT doc_id, s.line_no AS line_no, s.line AS line
  FROM (SELECT doc_id,
               unnest(list_transform(
                 range((len(toks) + {LINE_W - 1}) // {LINE_W}),
                 i -> {{'line_no': i,
                        'line': array_to_string(
                          toks[i*{LINE_W}+1 : i*{LINE_W}+{LINE_W}], ' ')}}))
                 AS s
        FROM base)),
boiler AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= {LINE_DF_MIN}),
marked AS (
  SELECT l.doc_id, l.line_no, l.line, b.line IS NOT NULL AS is_boiler
  FROM lines l LEFT JOIN boiler b USING (line))
SELECT doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN is_boiler THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_boiler THEN 0 ELSE 1 END) * 1000000
           // COUNT(*) AS BIGINT) AS kept_ppm,
       md5(coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END,
                               ' ' ORDER BY line_no), '')) AS kept_fp
FROM marked GROUP BY doc_id ORDER BY doc_id
"""


TRAP_MIN_PATHS = 3  # template is suspect once ≥ this many distinct paths


def o_url_traps(spark, sf_dir):
    """Crawl-trap detection by URL-template explosion (the Heritrix
    "pathological path" / IRLbot spam-control heuristic — calendar
    pages, session-id paths and infinite facet spaces that a frontier
    must starve before they eat the politeness budget; the operational
    complement to o_key_skew's join-side view of the same hot-domain
    pathology). Each URL's path is collapsed to a TEMPLATE: hex runs
    ≥ 8 chars → 'H' (session ids), then digit runs → 'N'; per
    (host, template) the profile reports url count, distinct-path
    cardinality, and the host-traffic share in exact BIGINT ppm. A
    template is flagged when it has ≥ 3 distinct paths AND looks
    machine-generated: ≥ 2 numeric wildcards (date hierarchies —
    /cal/N/N/N) or any hex wildcard (session ids — /s/H); a plain
    paginated listing (/page/N, one wildcard) is NOT a trap. The
    synthetic corpus has no URLs, so each doc deterministically mints
    one on BOTH engines: host from its source, path from (doc_id div 20)%5 (decorrelated from the source id) —
    a 3-level calendar date, a 12-hex session id, or a page number.

    100 TB posture: template collapse is two regexp_replace in the
    scan's codegen Project; one hash aggregate keyed (host, template)
    — |output| is the number of TEMPLATES, not URLs; host totals are
    a second tiny aggregate broadcast back. The flagged templates
    feed F4's exclude patterns for the next crawl. Reference scope:
    crawler.js relies on manual `exclude` lists (crawler.js:56) —
    this learns them."""
    d = _t(spark, sf_dir, "documents")
    branch = F.expr("(doc_id div 20) % 5")
    path = (
        F.when(
            branch == 0,
            F.concat(
                F.lit("/cal/"),
                (F.col("doc_id") % 40 + 2000).cast("string"),
                F.lit("/"),
                (F.col("doc_id") % 12 + 1).cast("string"),
                F.lit("/"),
                (F.col("doc_id") % 28 + 1).cast("string"),
            ),
        )
        .when(
            branch == 1,
            F.concat(
                F.lit("/s/"),
                F.substring(
                    F.md5(F.concat(F.lit("sid:"), F.col("doc_id").cast("string"))),
                    1,
                    12,
                ),
            ),
        )
        .otherwise(
            F.concat(F.lit("/page/"), (F.col("doc_id") % 97).cast("string"))
        )
    )
    urls = d.select(
        F.concat(F.col("source"), F.lit(".example.test")).alias("host"),
        path.alias("path"),
    ).withColumn(
        "template",
        F.regexp_replace(
            F.regexp_replace("path", "[0-9a-f]{8,}", "H"), "[0-9]+", "N"
        ),
    )
    prof = urls.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
    )
    totals = urls.groupBy("host").agg(F.count("*").alias("host_total"))
    n_n = F.length("template") - F.length(F.regexp_replace("template", "N", ""))
    n_h = F.length("template") - F.length(F.regexp_replace("template", "H", ""))
    return (
        prof.join(F.broadcast(totals), "host")
        .select(
            "host",
            "template",
            "n_urls",
            "n_paths",
            F.expr("n_urls * 1000000L div host_total").alias("host_share_ppm"),
            n_n.cast("long").alias("n_num_wild"),
            n_h.cast("long").alias("n_hex_wild"),
            (
                (F.col("n_paths") >= TRAP_MIN_PATHS)
                & ((n_n >= 2) | (n_h >= 1))
            ).alias("is_trap"),
        )
        .orderBy("host", "template")
    )


O_TRAPS_SQL = f"""
WITH urls AS (
  SELECT source || '.example.test' AS host,
         CASE
           WHEN (doc_id // 20) % 5 = 0 THEN
             '/cal/' || CAST(doc_id % 40 + 2000 AS VARCHAR)
               || '/' || CAST(doc_id % 12 + 1 AS VARCHAR)
               || '/' || CAST(doc_id % 28 + 1 AS VARCHAR)
           WHEN (doc_id // 20) % 5 = 1 THEN
             '/s/' || substr(md5('sid:' || CAST(doc_id AS VARCHAR)), 1, 12)
           ELSE '/page/' || CAST(doc_id % 97 AS VARCHAR)
         END AS path
  FROM documents),
shaped AS (
  SELECT host, path,
         regexp_replace(regexp_replace(path, '[0-9a-f]{{8,}}', 'H', 'g'),
                        '[0-9]+', 'N', 'g') AS template
  FROM urls),
prof AS (
  SELECT host, template, COUNT(*) AS n_urls,
         COUNT(DISTINCT path) AS n_paths
  FROM shaped GROUP BY host, template),
totals AS (SELECT host, COUNT(*) AS host_total FROM shaped GROUP BY host)
SELECT p.host, p.template, p.n_urls, p.n_paths,
       p.n_urls * 1000000 // t.host_total AS host_share_ppm,
       CAST(length(p.template)
            - length(replace(p.template, 'N', '')) AS BIGINT) AS n_num_wild,
       CAST(length(p.template)
            - length(replace(p.template, 'H', '')) AS BIGINT) AS n_hex_wild,
       (p.n_paths >= {TRAP_MIN_PATHS}
        AND (length(p.template) - length(replace(p.template, 'N', '')) >= 2
             OR length(p.template) - length(replace(p.template, 'H', '')) >= 1))
         AS is_trap
FROM prof p JOIN totals t USING (host)
ORDER BY host, template
"""


def d_surt_dup(spark, sf_dir):
    """URL-level dedup by SURT key (Sort-friendly URI Reordering
    Transform — the canonical-URL convention of Common Crawl's CDX
    indexes and OpenWayback, and the natural key for sources/warc.py's
    CDX sidecar): scheme dropped (http==https), host lowercased,
    default ports 80/443 stripped, leading ``www.`` stripped, fragment
    stripped, host labels REVERSED and comma-joined so one registrable
    domain's urls sort adjacent (``com,example)/path``) — the dedup
    axis ABOVE the seen-set's exact-string identity (D1 treats
    ``http://X`` and ``https://www.X:443`` as different urls; a
    re-crawl shouldn't). The synthetic corpus has no urls, so each doc
    mints one of 4 variants (plain / UPPERCASE+:80 / https+www /
    fragment) of its resource group's url on BOTH engines — every
    4-doc group must collapse to ONE surt key with 4 distinct raws.

    100 TB posture: the whole transform is a chain of lower/regexp/
    split/reverse string ops in the scan's codegen Project — no UDF,
    no shuffle until the ONE hash aggregate on surt_key (the same
    shape as D1's exact dedup, just a computed key); output
    cardinality = logical resources, not raw urls. Reference scope:
    crawler.js:69-78 canonicalizes only by stripping fragments —
    SURT is what its seen-set would need at archive scale."""
    d = _t(spark, sf_dir, "documents")
    rid = F.expr("doc_id div 4")
    base = F.concat(
        F.lit("example-"), (rid % 7).cast("string"), F.lit(".test/res/"),
        rid.cast("string"),
    )
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), base))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTP://"),
                F.upper(F.concat(F.lit("example-"), (rid % 7).cast("string"), F.lit(".test"))),
                F.lit(":80/res/"),
                rid.cast("string"),
            ),
        )
        .when(v == 2, F.concat(F.lit("https://www."), base))
        .otherwise(F.concat(F.lit("http://"), base, F.lit("#frag")))
    )
    u = d.select("doc_id", url.alias("url"))
    nofrag = F.regexp_replace(F.lower("url"), "#.*$", "")
    rest = F.regexp_replace(nofrag, "^https?://", "")
    host0 = F.regexp_extract(rest, "^[^/]+", 0)
    path = F.regexp_replace(rest, "^[^/]+", "")
    host = F.regexp_replace(
        F.regexp_replace(host0, ":(80|443)$", ""), "^www\\.", ""
    )
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )
    return (
        u.select("doc_id", "url", surt.alias("surt_key"))
        .groupBy("surt_key")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_raw_variants"),
            F.min("url").alias("canonical_raw"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .orderBy("surt_key")
    )


D_SURT_SQL = """
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'http://example-' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.test/res/' || CAST(doc_id // 4 AS VARCHAR)
           WHEN 1 THEN 'HTTP://' || upper('example-'
                    || CAST((doc_id // 4) % 7 AS VARCHAR) || '.test')
                    || ':80/res/' || CAST(doc_id // 4 AS VARCHAR)
           WHEN 2 THEN 'https://www.example-'
                    || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.test/res/' || CAST(doc_id // 4 AS VARCHAR)
           ELSE 'http://example-' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.test/res/' || CAST(doc_id // 4 AS VARCHAR) || '#frag'
         END AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(lower(url), '#.*$', ''),
                        '^https?://', '') AS rest
  FROM u),
hp AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(
             regexp_extract(rest, '^[^/]+'), ':(80|443)$', ''),
             '^www\\.', '') AS host,
         regexp_replace(rest, '^[^/]+', '') AS path
  FROM parts)
SELECT array_to_string(list_reverse(string_split(host, '.')), ',') || ')'
         || CASE WHEN path = '' THEN '/' ELSE path END AS surt_key,
       COUNT(*) AS n_urls,
       COUNT(DISTINCT url) AS n_raw_variants,
       MIN(url) AS canonical_raw,
       MIN(doc_id) AS keeper_doc
FROM hp
GROUP BY 1 ORDER BY surt_key
"""


# Embedded public-suffix subset, longest-match-first (the real list is
# ~9k rules; the ALGORITHM — longest matching suffix wins, private
# suffixes like github.io make each user a registrable domain — is
# what's under test, and swapping in the full list is a data change).
PSL_SUFFIXES = ["github.io", "co.uk", "com", "org", "uk", "io"]


def p_pld_extract(spark, sf_dir):
    """Registrable-domain (pay-level-domain) extraction under
    public-suffix rules (publicsuffix.org — the key real crawlers
    group politeness budgets and seen-set salts by: 'a.shop.x.co.uk'
    and 'cdn.x.co.uk' are ONE crawl target 'x.co.uk', while
    'alice.github.io' and 'bob.github.io' are TWO, because github.io
    is a private suffix; hostname-keyed budgets (A4's key) overthrottle
    multi-subdomain sites and underthrottle user-content suffixes).
    Longest-match-wins over an embedded suffix subset; PLD = last
    label before the matched suffix + the suffix. The synthetic corpus
    has no hosts, so each doc mints one of 4 deterministic shapes on
    BOTH engines (nested co.uk subdomain / cdn .com subdomain /
    github.io user site / bare .org); the rollup reports docs and
    DISTINCT HOSTS per PLD — the contraction a PLD-keyed scheduler
    sees vs a host-keyed one.

    100 TB posture: suffix match is a literal CASE chain + one
    regexp_extract in the scan's codegen Project (no UDF, no lookup
    join — the PSL is a broadcast-sized literal by nature); ONE hash
    aggregate on pld. Reference scope: crawler.js keys everything by
    raw hostname (crawler.js:441) — this is the archive-scale key it
    would need."""
    d = _t(spark, sf_dir, "documents")
    b = F.expr("(doc_id div 20) % 4")
    host = (
        F.when(
            b == 0,
            F.concat(
                F.lit("a"), (F.col("doc_id") % 5).cast("string"),
                F.lit(".shop.example"), (F.col("doc_id") % 3).cast("string"),
                F.lit(".co.uk"),
            ),
        )
        .when(
            b == 1,
            F.concat(
                F.lit("cdn"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example"), (F.col("doc_id") % 3).cast("string"),
                F.lit(".com"),
            ),
        )
        .when(
            b == 2,
            F.concat(
                F.lit("user"), (F.col("doc_id") % 11).cast("string"),
                F.lit(".github.io"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("example"), (F.col("doc_id") % 3).cast("string"),
                F.lit(".org"),
            )
        )
    )
    sfx = None
    for s in PSL_SUFFIXES:
        cond = F.col("host").endswith("." + s)
        sfx = F.when(cond, F.lit(s)) if sfx is None else sfx.when(cond, F.lit(s))
    u = d.select("doc_id", host.alias("host")).withColumn("sfx", sfx)
    pld = F.concat(
        F.regexp_extract(
            F.expr("substr(host, 1, length(host) - length(sfx) - 1)"),
            "([^.]+)$",
            1,
        ),
        F.lit("."),
        F.col("sfx"),
    )
    return (
        u.select("doc_id", "host", "sfx", pld.alias("pld"))
        .groupBy("pld")
        .agg(
            F.first("sfx").alias("public_suffix"),
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .orderBy("pld")
    )


def _pld_sql() -> str:
    case = "CASE " + " ".join(
        f"WHEN host LIKE '%.{s}' THEN '{s}'" for s in PSL_SUFFIXES
    ) + " END"
    return f"""
WITH u AS (
  SELECT doc_id,
         CASE (doc_id // 20) % 4
           WHEN 0 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.shop.example'
                    || CAST(doc_id % 3 AS VARCHAR) || '.co.uk'
           WHEN 1 THEN 'cdn' || CAST(doc_id % 7 AS VARCHAR) || '.example'
                    || CAST(doc_id % 3 AS VARCHAR) || '.com'
           WHEN 2 THEN 'user' || CAST(doc_id % 11 AS VARCHAR) || '.github.io'
           ELSE 'example' || CAST(doc_id % 3 AS VARCHAR) || '.org'
         END AS host
  FROM documents),
m AS (SELECT doc_id, host, {case} AS sfx FROM u),
p AS (
  SELECT doc_id, host, sfx,
         regexp_extract(substr(host, 1, length(host) - length(sfx) - 1),
                        '([^.]+)$', 1) || '.' || sfx AS pld
  FROM m)
SELECT pld, MIN(sfx) AS public_suffix, COUNT(*) AS n_docs,
       COUNT(DISTINCT host) AS n_hosts
FROM p GROUP BY pld ORDER BY pld
"""


P_PLD_SQL = _pld_sql()


DSIR_BUCKETS = 1024       # hashed n-gram feature space (Xie et al. use 10^4)
DSIR_TARGET_LANG = "en"   # the "target distribution" sample


def t_dsir_importance(spark, sf_dir):
    """DSIR importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — the
    pretraining-data selection method behind DoReMi-era pipelines:
    score every raw document by how target-like its hashed n-gram
    profile is, then resample ∝ weight). Features are word bigrams
    hashed into 1024 buckets with the portable md5 family; the target
    distribution is the English slice, raw is the whole corpus; a
    feature's log-ratio log2(p_target/p_raw) is computed EXACTLY in
    integer bits as ilog2((cnt_t+1)·tot_r) − ilog2((cnt_r+1)·tot_t)
    (add-1 smoothed, ilog2 = length(bin(x))−1 — the t_zipf_surprisal
    discipline: no log(), no float accumulation); a doc's importance
    is the BIGINT sum of its features' bits (order-independent),
    selection = nonnegative total. Deterministic twin of DSIR's
    sampling step: rank, don't roll dice.

    100 TB posture: the feature table is ≤ 1024 rows however big the
    corpus — both the weight build (one hash aggregate + 1-row totals
    crossJoin) and the scoring join (weights BROADCAST back over the
    bigram stream) keep the corpus un-shuffled except the per-doc sum,
    one hash(doc_id) aggregate. At a real 100 TB run the counts are
    rescaled (divide both totals by 2^k) before the product to keep
    BIGINT headroom; at test SFs the products stay ≤ 2^40. Reference
    scope: crawler.js collects the corpus — DSIR decides what of it
    a training run keeps."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "lang", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    )
    bi = (
        w.where(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> concat(w[i], ' ', w[i+1]))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "lang",
            F.pmod(_phash(F.col("g"), "dsir"), F.lit(DSIR_BUCKETS)).alias("b"),
        )
    )
    feat = bi.groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("cnt_t"),
    )
    tot = feat.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    wtab = feat.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            (F.length(F.bin(F.expr("(cnt_t + 1) * tot_r"))) - F.lit(1))
            - (F.length(F.bin(F.expr("(cnt_r + 1) * tot_t"))) - F.lit(1))
        )
        .cast("long")
        .alias("w_bits"),
    )
    scored = (
        bi.join(F.broadcast(wtab), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_bits").alias("score_bits"),
        )
    )
    # score_bits may be negative: Spark `div` and DuckDB `//` both
    # truncate toward zero on integers, so the quotient is exact and
    # engine-identical either sign
    mean = F.expr("score_bits * 1000000L div n_feats")
    return scored.select(
        "doc_id",
        "n_feats",
        "score_bits",
        mean.alias("mean_bits_ppm"),
        (F.col("score_bits") >= 0).alias("keep"),
    ).orderBy("doc_id")


T_DSIR_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
bi AS (
  SELECT doc_id, lang, {_phash_sql("g", "dsir")} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang,
               unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i+1])) AS g
        FROM w)),
feat AS (
  SELECT b, COUNT(*) AS cnt_r,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS cnt_t
  FROM bi GROUP BY b),
tot AS (SELECT SUM(cnt_r) AS tot_r, SUM(cnt_t) AS tot_t FROM feat),
wtab AS (
  SELECT b, (length(bin((cnt_t + 1) * tot_r)) - 1)
          - (length(bin((cnt_r + 1) * tot_t)) - 1) AS w_bits
  FROM feat CROSS JOIN tot),
scored AS (
  SELECT doc_id, COUNT(*) AS n_feats, SUM(w_bits) AS score_bits
  FROM bi JOIN wtab USING (b) GROUP BY doc_id)
SELECT doc_id, n_feats, CAST(score_bits AS BIGINT) AS score_bits,
       CAST(score_bits * 1000000 // n_feats AS BIGINT) AS mean_bits_ppm,
       score_bits >= 0 AS keep
FROM scored ORDER BY doc_id
"""


RRF_K = 60      # the canonical RRF constant (Cormack et al. 2009)
RRF_TOP = 50    # per-ranker shortlist depth
RRF_QUERY = ("table", "spark", "join")


def t_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval by reciprocal rank fusion (Cormack, Clarke &
    Büttcher 2009 — the standard way to combine a lexical and a dense
    ranker without score calibration; what Elasticsearch/Vespa call
    "hybrid search"). Leg 1 (lexical): integer tf·idf-bits over the
    fixed query terms (idf in exact ilog2 bits — the t_zipf_surprisal
    discipline). Leg 2 (dense): brute-force cosine against the
    vec_id=0 query vector (the sim_cosine_topk baseline; doc_id and
    vec_id share the id space). Each leg contributes its top-50 with
    ranks broken deterministically by (score, id); fusion is INTEGER
    micro-RRF — 10^6 div (60+rank), summed — so the fused ordering is
    bit-identical cross-engine with no float addition anywhere.

    100 TB posture: each leg's shortlist is a TakeOrderedAndProject
    (never a global sort); the rank window then runs over ≤ 50 rows —
    bounded, single-task by construction; the fusion join is 50×50.
    The lexical leg shuffles only the query-term postings (IN-list
    filter before the explode's aggregates). Reference scope:
    retrieval over the crawled corpus is what the reference's users
    build downstream; fusion is the production read path when both
    an inverted index (t_inverted_index) and an ANN index
    (sim_ann_*) exist."""
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    n_docs = d.agg(F.count(F.lit(1)).alias("n"))
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("term"),
    ).where(F.col("term").isin(*RRF_QUERY))
    df_t = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    lex = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            (F.col("tf") * (F.length(F.bin(F.expr("n div df"))) - F.lit(1)))
            .cast("long")
            .alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score_lex"))
    )
    lex_top = lex.orderBy(F.col("score_lex").desc(), "doc_id").limit(RRF_TOP)
    lex_r = lex_top.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("score_lex").desc(), "doc_id"))
        .alias("r_lex"),
    )
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("q_emb")
    )
    v = e.where(F.col("vec_id") != 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    dot = F.aggregate(
        F.zip_with("emb", "q_emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # rank key is floor(cos * 1e4) BIGINT, not ROUND — the rank order
    # must agree with the oracle even where cross-engine decimal
    # rounding of the raw cosine would tie-break differently
    dense = v.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.floor(
            dot / (norm(F.col("emb")) * norm(F.col("q_emb")))
            * F.lit(10000.0)
        ).alias("cos"),
    )
    dense_top = dense.orderBy(F.col("cos").desc(), "vec_id").limit(RRF_TOP)
    dense_r = dense_top.select(
        F.col("vec_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), "vec_id"))
        .alias("r_dense"),
    )
    fused = lex_r.join(dense_r, "id", "full_outer").select(
        "id",
        "r_lex",
        "r_dense",
        (
            F.coalesce(F.expr(f"1000000 div ({RRF_K} + r_lex)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000 div ({RRF_K} + r_dense)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "id").limit(20)


T_RRF_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
words AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents),
qw AS (SELECT doc_id, term FROM words
       WHERE term IN ({", ".join(f"'{t}'" for t in RRF_QUERY)})),
dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qw GROUP BY term),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qw GROUP BY doc_id, term),
lex AS (
  SELECT doc_id,
         SUM(tf * (length(bin(n // df)) - 1)) AS score_lex
  FROM tf JOIN dft USING (term) CROSS JOIN n GROUP BY doc_id),
lex_r AS (
  SELECT doc_id AS id,
         ROW_NUMBER() OVER (ORDER BY score_lex DESC, doc_id) AS r_lex
  FROM lex ORDER BY score_lex DESC, doc_id LIMIT {RRF_TOP}),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
      WHERE vec_id = 0),
dense AS (
  SELECT vec_id,
         CAST(FLOOR(list_dot_product(CAST(embedding AS DOUBLE[]), q_emb)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q_emb, q_emb)))
               * 10000.0) AS BIGINT) AS cos
  FROM embeddings, q WHERE vec_id <> 0),
dense_r AS (
  SELECT vec_id AS id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r_dense
  FROM dense ORDER BY cos DESC, vec_id LIMIT {RRF_TOP}),
fused AS (
  SELECT COALESCE(l.id, d.id) AS id, l.r_lex, d.r_dense,
         COALESCE(1000000 // ({RRF_K} + l.r_lex), 0)
           + COALESCE(1000000 // ({RRF_K} + d.r_dense), 0) AS rrf_micro
  FROM lex_r l FULL OUTER JOIN dense_r d ON l.id = d.id)
SELECT id, r_lex, r_dense, rrf_micro
FROM fused ORDER BY rrf_micro DESC, id LIMIT 20
"""


QLF_BUCKETS = 512       # hashing-trick feature space
QLF_W_RANGE = 2001      # weights uniform in [-1000, 1000] micro-units


def t_quality_classifier(spark, sf_dir):
    """Linear quality-classifier INFERENCE via the hashing trick
    (the fasttext-shaped stage GPT-3/RefinedWeb run over Common Crawl:
    a pretrained Wikipedia-vs-CC classifier scores every document,
    map-side, at full corpus width; Weinberger et al. 2009 for the
    feature hashing). The model here is a fixed literal: bucket b's
    weight is derived from the portable md5 family —
    pmod(hash(b),2001)−1000 micro-units — standing in for shipped
    coefficients exactly as a broadcast model file would; the score is
    the exact BIGINT sum Σ count(b)·w(b) (a linear logit in
    micro-units — no sigmoid, which is monotone anyway and not
    bit-stable cross-engine), keep = nonnegative logit. Distinct from
    t_dsir_importance: DSIR LEARNS its weights from target/raw counts
    (two corpus aggregates), this DEPLOYS fixed weights — the
    inference-only read path, and the weight is computed INLINE from
    the bucket id, so there is no weight table at all, not even a
    broadcast.

    100 TB posture: explode → bucket → weight → per-doc sum is one
    map-side codegen pass plus ONE hash(doc_id) aggregate — the
    theoretical minimum for a per-doc score; nothing else shuffles.
    Reference scope: crawler.js gathers the corpus; this is the first
    model-inference pass a training pipeline runs over it."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("term"),
    )
    b = F.pmod(_phash(F.col("term"), "qlf"), F.lit(QLF_BUCKETS))
    w = F.pmod(
        _phash(b.cast("string"), "qlfw"), F.lit(QLF_W_RANGE)
    ) - F.lit(1000)
    scored = (
        words.select("doc_id", w.cast("long").alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("w").alias("logit_micro"),
        )
    )
    # logit_micro may be negative: both engines' integer division
    # truncates toward zero, so the ppm mean is exact and identical
    mean = F.expr("logit_micro * 1000000L div n_terms")
    return scored.select(
        "doc_id",
        "n_terms",
        "logit_micro",
        mean.alias("mean_w_ppm"),
        (F.col("logit_micro") >= 0).alias("keep"),
    ).orderBy("doc_id")


T_QCLF_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents),
scored AS (
  SELECT doc_id,
         {_phash_sql("term", "qlf")} % {QLF_BUCKETS} AS b
  FROM words),
weighted AS (
  SELECT doc_id,
         {_phash_sql("CAST(b AS VARCHAR)", "qlfw")} % {QLF_W_RANGE} - 1000
           AS w
  FROM scored),
agg AS (
  SELECT doc_id, COUNT(*) AS n_terms, SUM(w) AS logit_micro
  FROM weighted GROUP BY doc_id)
SELECT doc_id, n_terms, CAST(logit_micro AS BIGINT) AS logit_micro,
       CAST(logit_micro AS BIGINT) * 1000000 // n_terms AS mean_w_ppm,
       logit_micro >= 0 AS keep
FROM agg ORDER BY doc_id
"""


def t_bpe_encode(spark, sf_dir):
    """BPE ENCODING at corpus width (the deployment half of
    t_bpe_merges — Sennrich et al. 2016 §3: learn merges on the
    vocabulary, then tokenize every document with them; the actual
    "tokenized shards" step after t_pack_sequences planned the
    layout). The same {BPE_STEPS}-merge chain is learned (identical
    counts/ties/application convention, so the merge table is the
    oracle-verified one), then applied to the WORD VOCABULARY once;
    documents are encoded by joining their words to the encoded
    vocab — never by re-running merges over the corpus. Output per
    doc: word count, char-symbol count, BPE token count, the realized
    compression ratio, and the md5 of the full encoded symbol stream
    IN DOCUMENT ORDER — the tokenization itself is hash-checked
    cross-engine, not just the counts.

    100 TB posture: merge learning touches only the vocab table
    (corpus-independent size); encoding is a BROADCAST join of the
    encoded vocab onto the word stream plus ONE hash(doc_id)
    aggregate (the stream is never shuffled for the lookup); the
    per-doc stream rebuild sorts inside the agg buffer. The 1-row
    top-pair collects are the bucket-prune bounded-driver class."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), "\\s+")).alias(
            "pos", "w"
        ),
    ).where(F.length("w") > 0)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    cur = wf.select(
        "w",
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", " $1"), F.lit(" ")
        ).alias("repr"),
        "n",
    ).localCheckpoint()
    for _ in range(BPE_STEPS):
        s = F.split(F.trim(F.col("repr")), " ")
        pairs = (
            cur.where(F.size(s) >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(split(trim(repr), ' ')) - 2), "
                        "i -> concat(split(trim(repr), ' ')[i], '\t', "
                        "split(trim(repr), ' ')[i+1]))"
                    )
                ).alias("pair"),
                "n",
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()[0]
        a, b = top.pair.split("\t")
        cur = cur.select(
            "w",
            _bpe_apply(F.col("repr"), F.lit(a), F.lit(b)).alias("repr"),
            "n",
        ).localCheckpoint()
    enc = cur.select(
        "w",
        F.trim("repr").alias("toks"),
        F.size(F.split(F.trim("repr"), " ")).cast("long").alias("n_toks"),
        F.length("w").cast("long").alias("n_syms"),
    )
    agg = (
        words.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_char_syms"),
            F.sum("n_toks").alias("n_bpe_tokens"),
            F.array_sort(F.collect_list(F.struct("pos", "toks"))).alias("_tl"),
        )
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_char_syms",
        "n_bpe_tokens",
        F.expr("n_bpe_tokens * 1000000L div n_char_syms").alias(
            "compression_ppm"
        ),
        F.md5(
            F.array_join(F.transform("_tl", lambda s: s["toks"]), " ")
        ).alias("encoded_fp"),
    ).orderBy("doc_id")


def _bpe_encode_sql() -> str:
    def apply_sql(r, t):
        out = f"{r}.repr"
        for _ in range(3):
            out = (
                f"replace({out}, ' ' || {t}.a || ' ' || {t}.b || ' ', "
                f"' ' || {t}.a || {t}.b || ' ')"
            )
        return out

    pair_cte = (
        "SELECT unnest(list_transform(generate_series(1, len(s) - 1), "
        "i -> s[i] || chr(9) || s[i+1])) AS pair, n "
        "FROM (SELECT string_split(trim(repr), ' ') AS s, n FROM {src}) "
        "WHERE len(s) >= 2"
    )
    ctes = [
        "docw AS MATERIALIZED (SELECT doc_id, s.w AS w, s.pos AS pos FROM ("
        "SELECT doc_id, unnest(list_transform(range(len(ws)), "
        "i -> {'pos': i, 'w': ws[i+1]})) AS s FROM ("
        "SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws "
        "FROM documents)) WHERE length(s.w) > 0)",
        "wf AS MATERIALIZED (SELECT w, COUNT(*) AS n FROM docw GROUP BY w)",
        "e0 AS MATERIALIZED (SELECT w, regexp_replace(w, '(.)', ' \\1', 'g') "
        "|| ' ' AS repr, n FROM wf)",
    ]
    prev = "e0"
    for i in range(1, BPE_STEPS + 1):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT pair, SUM(n) AS cnt FROM "
            f"({pair_cte.format(src=prev)}) GROUP BY pair)"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT string_split(pair, chr(9))[1] AS a, "
            f"string_split(pair, chr(9))[2] AS b, cnt FROM p{i} "
            f"ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT w, {apply_sql(prev, f't{i}')} AS repr, "
            f"n FROM {prev}, t{i})"
        )
        prev = f"e{i}"
    ctes.append(
        f"enc AS MATERIALIZED (SELECT w, trim(repr) AS toks, "
        f"len(string_split(trim(repr), ' ')) AS n_toks, "
        f"length(w) AS n_syms FROM {prev})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(n_syms) AS BIGINT) AS n_char_syms,
       CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(n_toks) * 1000000 // SUM(n_syms)
            AS BIGINT) AS compression_ppm,
       md5(string_agg(toks, ' ' ORDER BY pos)) AS encoded_fp
FROM docw JOIN enc USING (w)
GROUP BY doc_id ORDER BY doc_id
"""
    )


T_BPE_ENCODE_SQL = _bpe_encode_sql()


def d_prefix_filter_pairs(spark, sf_dir):
    """All-pairs similarity join with PREFIX FILTERING (Chaudhuri,
    Ganti & Kaushik's SSJoin / Bayardo-Ma-Srikant "All-Pairs" / Xiao
    et al.'s PPJoin prefix principle, 2006-2008): for Jaccard ≥ t, two
    sets MUST share a token among each one's first
    L = n − ⌈t·n⌉ + 1 tokens in a global rarity order — so only those
    prefix tokens are indexed, and hot boilerplate shingles (which
    sort LAST by rarity) never enter the candidate join at all. This
    is the LOSSLESS scale technique the df-capped inverted-index joins
    (SHINGLE_DF_CAP) approximate: the cap drops hot shingles and may
    miss pairs; the prefix filter provably misses none at the
    threshold (t = 0.5, the MinHash rerank threshold, so all three
    near-dup candidate generators — bands, cap, prefix — are
    comparable). Same shingle sets and rerank as minhash_near_dup:
    its output is therefore a superset of what any candidate
    generator can admit, and tests/test_ppjoin.py pins it equal to
    the brute-force all-pairs truth.

    100 TB posture: the rarity order is one hash(shingle) df
    aggregate; prefix selection is a per-doc window (partitioned by
    doc — no global sort); the candidate join is over the PREFIX
    postings only (≈ half the tokens, and by construction the rare
    half — max posting length shrinks from df_max to the prefix df,
    which is what kills the df² blowup); the rerank inherits
    _exact_jaccard's candidate-bounded joins. The shingle set is
    localCheckpointed once — the plan reads it six times (df, sizes,
    ranking, both rerank sides), and each re-read would otherwise
    re-run the explode+distinct shuffle."""
    sh = _doc_shingles(spark, sf_dir).localCheckpoint()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    wnd = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .select("doc_id", "shingle", F.row_number().over(wnd).alias("r"))
        .join(sizes, "doc_id")
    )
    pref = ranked.where(
        F.col("r") <= F.col("n_sh") - F.expr("(n_sh + 1) div 2") + 1
    ).select("doc_id", "shingle")
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return (
        _exact_jaccard(sh, cand)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b", "jaccard_ppm")
        .orderBy("doc_a", "doc_b")
    )


D_PPJOIN_SQL = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
ranked AS (
  SELECT s.doc_id, s.shingle, z.n_sh,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY d.df, s.shingle) AS r
  FROM shingles s JOIN dfreq d USING (shingle) JOIN sizes z USING (doc_id)),
pref AS (
  SELECT doc_id, shingle FROM ranked
  WHERE r <= n_sh - ((n_sh + 1) // 2) + 1),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM pref a JOIN pref b
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


BT_R = 4          # bow-tie reachability radius (both directions)
BT_PIVOT = "s1"   # the SCC probe node


def g_bowtie_classes(spark, sf_dir):
    """Bow-tie decomposition of the web graph (Broder et al., WWW
    2000 "Graph structure in the Web" — the IN/SCC/OUT map every
    crawl-coverage analysis starts from: pages in IN can reach the
    core but aren't reachable FROM it, so seed lists must sample IN
    or the crawl never sees it). Radius-capped variant: CORE' =
    nodes both forward- and backward-reachable from the pivot within
    BT_R hops, OUT' = forward-only, IN' = backward-only, OTHER =
    neither (radius-capping is what a bounded crawl actually
    measures; exact bow-tie needs full closures). The supplier→
    customer digraph is a depth-1 DAG (every customer a sink — the
    bow-tie is vacuous), so edge DIRECTION is minted deterministically
    from key parity on both engines (the d_surt_dup convention),
    giving a cyclic digraph. Two bounded BFS loops (the g_bfs_depth
    shuffle shape: edge equi-join + distinct + anti-join per hop),
    one 4-row class count."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        ((F.col("l_suppkey") + F.col("o_custkey")) % 2).alias("par"),
    ).distinct()
    e = (
        pairs.select(
            F.when(F.col("par") == 0, F.col("s")).otherwise(F.col("c")).alias("src"),
            F.when(F.col("par") == 0, F.col("c")).otherwise(F.col("s")).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )

    def reach(edges):
        seen = spark.createDataFrame([(BT_PIVOT,)], "node string").localCheckpoint()
        frontier = seen
        for _ in range(BT_R):
            nxt = (
                edges.join(frontier, edges["src"] == frontier["node"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(seen, "node", "left_anti")
                .localCheckpoint()
            )
            if nxt.isEmpty():
                break
            seen = seen.unionByName(nxt).localCheckpoint()
            frontier = nxt
        return seen

    fwd = reach(e)
    bwd = reach(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    tagged = (
        nodes.join(fwd.withColumn("_f", F.lit(1)), "node", "left")
        .join(bwd.withColumn("_b", F.lit(1)), "node", "left")
        .select(
            F.expr(
                "CASE WHEN _f = 1 AND _b = 1 THEN 'core' "
                "WHEN _f = 1 THEN 'out' "
                "WHEN _b = 1 THEN 'in' ELSE 'other' END"
            ).alias("class")
        )
    )
    return (
        tagged.groupBy("class")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("class")
    )


G_BOWTIE_SQL = f"""
WITH RECURSIVE
pairs AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS s,
                  'c' || CAST(o_custkey AS VARCHAR) AS c,
                  (l_suppkey + o_custkey) % 2 AS par
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN par = 0 THEN s ELSE c END AS src,
                  CASE WHEN par = 0 THEN c ELSE s END AS dst
  FROM pairs),
fwd(node, d) AS (
  SELECT '{BT_PIVOT}', 0
  UNION
  SELECT e.dst, w.d + 1 FROM fwd w JOIN e ON e.src = w.node
  WHERE w.d < {BT_R}),
bwd(node, d) AS (
  SELECT '{BT_PIVOT}', 0
  UNION
  SELECT e.src, w.d + 1 FROM bwd w JOIN e ON e.dst = w.node
  WHERE w.d < {BT_R}),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
tagged AS (
  SELECT CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
              WHEN f.node IS NOT NULL THEN 'out'
              WHEN b.node IS NOT NULL THEN 'in' ELSE 'other' END AS class
  FROM nodes n
  LEFT JOIN (SELECT DISTINCT node FROM fwd) f ON f.node = n.node
  LEFT JOIN (SELECT DISTINCT node FROM bwd) b ON b.node = n.node)
SELECT class, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM tagged GROUP BY class
ORDER BY class
"""


CDC_K = 3    # gram width of the rolling window (words)
CDC_DIV = 8  # boundary divisor: ~1 boundary per 8 gram hashes


def d_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup (the Rabin-fingerprint / LBFS /
    FastCDC boundary principle: cut where hash(local window) ≡ 0 mod D,
    so chunk boundaries move WITH the content — an insertion early in
    a page shifts every fixed-window chunk but leaves all CDC chunks
    after the next boundary identical; the storage-dedup standard, and
    the long-document analog of line dedup's fixed windows). Word-3-
    gram hashes are the rolling window; boundaries where h % 8 == 0;
    each chunk's fingerprint is the md5 of its hash run; corpus-wide
    chunk table reports every chunk shared by ≥ 2 documents.

    Scale: chunking is nested array codegen inside the scan (zero
    pre-shuffle); the only Exchange is the hash(chunk) aggregate —
    exact-dedup shape on chunk granularity."""
    d = _t(spark, sf_dir, "documents")
    chunks = (
        d.select(
            "doc_id",
            F.expr("split(lower(trim(text)), '\\\\s+')").alias("w"),
        )
        .where(F.size("w") >= CDC_K)
        .withColumn(
            "hs",
            F.expr(
                f"transform(transform(sequence(0, size(w) - {CDC_K}), "
                "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])), "
                "g -> CAST(conv(substring(md5(concat('cdc:', g)), 1, 15), "
                "16, 10) AS BIGINT))"
            ),
        )
        .withColumn(
            "bounds",
            # array_sort: DuckDB's list_distinct does not preserve
            # order, so BOTH engines sort the boundary list explicitly
            F.expr(
                f"array_sort(array_distinct(concat(array(0), "
                f"filter(sequence(1, size(hs)), i -> hs[i-1] % {CDC_DIV} = 0), "
                "array(size(hs)))))"
            ),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(bounds) - 1), j -> "
                    "md5(array_join(transform("
                    "slice(hs, bounds[j-1] + 1, bounds[j] - bounds[j-1]), "
                    "x -> CAST(x AS STRING)), ',')))"
                )
            ).alias("chunk"),
        )
    )
    return (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("chunk")
    )


D_CDC_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
hashed AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, len(w) - {CDC_K - 2}),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
           g -> CAST('0x' || substr(md5('cdc:' || g), 1, 15) AS BIGINT))
           AS hs
  FROM base WHERE len(w) >= {CDC_K}),
bounded AS (
  SELECT doc_id, hs,
         list_sort(list_distinct(flatten([[0],
           list_filter(range(1, len(hs) + 1), i -> hs[i] % {CDC_DIV} = 0),
           [len(hs)]]))) AS bounds
  FROM hashed),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(bounds)), j ->
           md5(array_to_string(
             list_transform(hs[bounds[j] + 1:bounds[j+1]],
                            x -> CAST(x AS VARCHAR)), ',')))) AS chunk
  FROM bounded)
SELECT chunk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM chunks GROUP BY chunk
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY chunk
"""


def u_snapshot_diff(spark, sf_dir):
    """Snapshot diff between crawl batches — the INTERSECT/EXCEPT half
    of the set-ops family (u_union_frontier covers UNION): what a
    content-addressed store asks after every ingestion round — how
    much of the standing corpus RECURRED in the new batch, what
    ARRIVED, what VANISHED. Keys are the exact-dedup content
    fingerprint (md5 of whitespace-normalized text, the d_exact_dedup
    key) so the diff is by content, not doc identity; old/new = the
    source-batch convention. Spark's intersect/exceptAll compile to
    the same aggregate-based set operators any engine uses — counts
    reduce to scalars, so the output is one row regardless of corpus
    size."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "is_old",
        F.expr(
            "CASE WHEN CAST(substring(source, 4, 10) AS INT) < 10 "
            "THEN 1 ELSE 0 END"
        ),
    )
    key = F.md5(F.lower(F.regexp_replace("text", "\\s+", " "))).alias("fp")
    old = d.where(F.col("is_old") == 1).select(key).distinct()
    new = d.where(F.col("is_old") == 0).select(key).distinct()
    counts = [
        old.agg(F.count(F.lit(1)).alias("n_old")),
        new.agg(F.count(F.lit(1)).alias("n_new")),
        old.intersect(new).agg(F.count(F.lit(1)).alias("n_retained")),
        new.exceptAll(old).agg(F.count(F.lit(1)).alias("n_arrived")),
        old.exceptAll(new).agg(F.count(F.lit(1)).alias("n_vanished")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))
    return out


U_SNAPSHOT_SQL = """
WITH d AS (
  SELECT MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS fp,
         CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 0 END
           AS is_old
  FROM documents),
old AS (SELECT DISTINCT fp FROM d WHERE is_old = 1),
new AS (SELECT DISTINCT fp FROM d WHERE is_old = 0)
SELECT (SELECT COUNT(*) FROM old) AS n_old,
       (SELECT COUNT(*) FROM new) AS n_new,
       (SELECT COUNT(*) FROM (SELECT fp FROM old INTERSECT
                              SELECT fp FROM new)) AS n_retained,
       (SELECT COUNT(*) FROM (SELECT fp FROM new EXCEPT
                              SELECT fp FROM old)) AS n_arrived,
       (SELECT COUNT(*) FROM (SELECT fp FROM old EXCEPT
                              SELECT fp FROM new)) AS n_vanished
"""


def t_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve (V(n) ∝ n^β — the corpus
    statistic that says whether a crawl is still DISCOVERING language
    or re-reading the same pages: a flattening curve at constant crawl
    rate means marginal novelty is collapsing, the signal to widen
    seeds or raise recrawl priority). Checkpointed at log2 prefixes of
    the corpus in doc_id order: each word's FIRST document (one min
    aggregate), banded by length(bin(first_doc+1)), new-word counts
    per band, and the cumulative vocabulary via a running sum over the
    ≤ 20-row band table. All exact integers; the only window is over
    bands, never rows.

    Scale: one distinct + one min aggregate on the word key — at
    10^10 docs this is the same one-shuffle shape as exact dedup."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("g"),
        )
        .where(F.length("g") > 0)
        .distinct()
    )
    first = words.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    bands = (
        first.select(
            F.expr("length(bin(first_doc + 1))").alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bands.withColumn("cum_vocab", F.sum("new_words").over(w))
        .select(
            "band",
            F.expr("shiftleft(1L, band) - 1").alias("prefix_docs"),
            "new_words",
            "cum_vocab",
        )
        .orderBy("band")
    )


T_VOCAB_SQL = """
WITH words AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS g
    FROM documents) WHERE length(g) > 0),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM words GROUP BY g),
bands AS (
  SELECT length(bin(first_doc + 1)) AS band,
         CAST(COUNT(*) AS BIGINT) AS new_words
  FROM first GROUP BY 1)
SELECT band, (1::BIGINT << band) - 1 AS prefix_docs, new_words,
       CAST(SUM(new_words) OVER (ORDER BY band
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM bands
ORDER BY band
"""


BF_M = 1 << 16  # bloom bits
BF_K = 3        # hash functions


def j_bloom_join(spark, sf_dir):
    """Bloom-pruned join — the relational twin of the seen-set
    sidecar's PROBE PRUNING (operators/seenset.py: the bloom answers
    "definitely new" cheaply so only maybe-seen urls reach the
    authoritative shuffled anti-join; Spark's own runtime row-level
    filters apply the same idea inside joins, and this query makes the
    mechanism portable and falsifiable). Build side: the "already
    crawled" key set (o_orderkey % 3 = 0); fact side: the arriving
    link batch (lineitem). Every fact row is probed against the
    m=2^16, k=3 bloom (sk_bloom_fp_audit's exact hash family) and the
    report quantifies what the prefilter is worth: rows pruned before
    the exact join in BIGINT ppm, surviving false positives, and the
    FP rate over true negatives — prune_ppm is the shuffle the
    sidecar saves, fp_over_neg_ppm is the wasted residual work.

    Scale shape: the arriving batch dedupes to DISTINCT probe keys
    first (the sidecar probes each distinct url once — seenset.py's
    contract); the bit set is ≤ m rows and BROADCASTS onto the
    exploded probe (k rows per key, map-side); the pass verdict is
    one hash aggregate on the key; truth is a left join against the
    build keys; nothing shuffles the batch twice.

    Invariant the gate pins: n_pass = n_true + n_fp — a Bloom filter
    admits every true member (no false negatives), so the exact join
    downstream loses nothing. Measured at sf0.01: 66.1% of probe keys
    pruned before the shuffle, FP 8,244 ppm over true negatives."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    build = (
        o.where(F.expr("o_orderkey % 3 = 0"))
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    fact = (
        _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    )
    def bit_exprs(col):
        return [
            (_phash(col.cast("string"), f"bf{h}") % BF_M).alias("bit")
            for h in range(BF_K)
        ]
    bits = build.select(
        F.explode(F.array(*bit_exprs(F.col("k")))).alias("bit")
    ).distinct()
    passed = (
        fact.select(
            "l_orderkey",
            F.explode(F.array(*bit_exprs(F.col("l_orderkey")))).alias("bit"),
        )
        .join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "bit", "left")
        .groupBy("l_orderkey")
        .agg(
            (F.sum(F.coalesce("_hit", F.lit(0))) == BF_K)
            .cast("int")
            .alias("pass")
        )
    )
    truth = fact.join(
        build.select(F.col("k").alias("l_orderkey"), F.lit(1).alias("seen")),
        "l_orderkey",
        "left",
    ).select(
        "l_orderkey",
        F.coalesce("seen", F.lit(0)).alias("seen"),
    )
    per = passed.join(truth, ["l_orderkey"])
    return per.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum("pass").alias("n_pass"),
        F.sum("seen").alias("n_true"),
        F.sum(
            F.when((F.col("pass") == 1) & (F.col("seen") == 0), 1).otherwise(0)
        ).alias("n_fp"),
    ).select(
        "n_fact",
        "n_pass",
        "n_true",
        "n_fp",
        F.expr("(n_fact - n_pass) * 1000000L div n_fact").alias("prune_ppm"),
        F.expr(
            "if(n_fact = n_true, 0L, n_fp * 1000000L div (n_fact - n_true))"
        ).alias("fp_over_neg_ppm"),
    )


def _bloom_join_sql() -> str:
    def bit_sql(expr, h):
        return f"({_phash_sql(f'CAST({expr} AS VARCHAR)', f'bf{h}')}) % {BF_M}"
    build_bits = " UNION ".join(
        f"SELECT {bit_sql('k', h)} AS bit FROM build" for h in range(BF_K)
    )
    probe_bits = "\n  UNION ALL ".join(
        f"SELECT l_orderkey, {bit_sql('l_orderkey', h)} AS bit FROM fact"
        for h in range(BF_K)
    )
    return f"""
WITH build AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey % 3 = 0),
fact AS (SELECT DISTINCT l_orderkey FROM lineitem),
bits AS ({build_bits}),
probe AS ({probe_bits}),
passed AS (
  SELECT p.l_orderkey,
         CASE WHEN SUM(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) = {BF_K}
              THEN 1 ELSE 0 END AS pass
  FROM probe p LEFT JOIN bits b ON p.bit = b.bit
  GROUP BY p.l_orderkey),
truth AS (
  SELECT f.l_orderkey,
         CASE WHEN bu.k IS NULL THEN 0 ELSE 1 END AS seen
  FROM fact f LEFT JOIN build bu ON f.l_orderkey = bu.k),
per AS (SELECT passed.pass, truth.seen
        FROM passed JOIN truth USING (l_orderkey)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
         CAST(SUM(pass) AS BIGINT) AS n_pass,
         CAST(SUM(seen) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN pass = 1 AND seen = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fp
  FROM per)
SELECT n_fact, n_pass, n_true, n_fp,
       (n_fact - n_pass) * 1000000 // n_fact AS prune_ppm,
       CASE WHEN n_fact = n_true THEN 0
            ELSE n_fp * 1000000 // (n_fact - n_true) END AS fp_over_neg_ppm
FROM agg
"""


J_BLOOM_JOIN_SQL = _bloom_join_sql()


def sk_bloom_fp_audit(spark, sf_dir):
    """Bloom-filter false-positive audit — the falsifiable relational
    twin of the engine's D1 bloom sidecar (operators/seenset.py): the
    whole point of a Bloom prefilter is a QUANTIFIED false-positive
    rate, so this builds one (m=2^16 bits, k=3 portable hashes) over
    the standing corpus' vocabulary (sources src0-9), probes every
    distinct word of the arriving batch (src10-19), and reports
    claimed-present vs actually-present vs false positives, with the
    FP rate over TRUE NEGATIVES in exact BIGINT ppm — the number that
    sizes the filter (seenset.py doubles capacity when it drifts).

    The key domain is word-3-gram shingles, not words — the synthetic
    corpus' ~30-word vocabulary would make every probe a true positive;
    shingles have real cardinality (the same reason D1 keys on whole
    urls, not tokens).

    Scale shape: the bit set is ≤ m rows (broadcast); probes explode
    each key into k bit rows, join the bit set, and reduce — one
    aggregate keyed by shingle, one scalar fold; nothing n²."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "is_old",
        F.expr(
            "CASE WHEN CAST(substring(source, 4, 10) AS INT) < 10 "
            "THEN 1 ELSE 0 END"
        ),
    )
    old_w = (
        _shingles_from(d.where(F.col("is_old") == 1))
        .select(F.col("shingle").alias("g"))
        .distinct()
    )
    new_w = (
        _shingles_from(d.where(F.col("is_old") == 0))
        .select(F.col("shingle").alias("g"))
        .distinct()
    )
    bit_exprs = [
        (_phash(F.col("g"), f"bf{h}") % BF_M).alias("bit")
        for h in range(BF_K)
    ]
    bits = old_w.select(
        F.explode(F.array(*[e for e in bit_exprs])).alias("bit")
    ).distinct()
    probe = (
        new_w.select("g", F.explode(F.array(*bit_exprs)).alias("bit"))
        .join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "bit", "left")
        .groupBy("g")
        .agg(
            (F.sum(F.coalesce("_hit", F.lit(0))) == BF_K).cast("int").alias(
                "claimed"
            )
        )
    )
    actual = new_w.join(
        old_w.select(F.col("g"), F.lit(1).alias("present")), "g", "left"
    ).select("g", F.coalesce("present", F.lit(0)).alias("present"))
    per = probe.join(actual, "g")
    agg = per.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("claimed").alias("n_claimed"),
        F.sum("present").alias("n_present"),
        F.sum(
            F.when((F.col("claimed") == 1) & (F.col("present") == 0), 1)
            .otherwise(0)
        ).alias("n_fp"),
    )
    nbits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    return agg.join(F.broadcast(nbits)).select(
        "n_probes",
        "n_claimed",
        "n_present",
        "n_fp",
        F.expr("n_fp * 1000000L div (n_probes - n_present)").alias("fp_ppm"),
        "n_bits_set",
    )


def _bf_bits_sql(col: str) -> str:
    return ", ".join(
        f"({_phash_sql(col, f'bf{h}')}) % {BF_M}" for h in range(BF_K)
    )


SK_BLOOM_SQL = f"""
WITH src AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS w,
         CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 0 END
           AS is_old
  FROM documents),
sh AS (
  SELECT DISTINCT is_old,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM src WHERE len(w) >= 3),
old_w AS (SELECT DISTINCT g FROM sh WHERE is_old = 1),
new_w AS (SELECT DISTINCT g FROM sh WHERE is_old = 0),
bits AS (SELECT DISTINCT bit FROM (
  SELECT unnest([{_bf_bits_sql('g')}]) AS bit FROM old_w)),
probe AS (
  SELECT p.g,
         CASE WHEN SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                   = {BF_K} THEN 1 ELSE 0 END AS claimed
  FROM (SELECT g, unnest([{_bf_bits_sql('g')}]) AS bit FROM new_w) p
  LEFT JOIN bits b USING (bit)
  GROUP BY p.g),
actual AS (
  SELECT n.g, CASE WHEN o.g IS NOT NULL THEN 1 ELSE 0 END AS present
  FROM new_w n LEFT JOIN old_w o USING (g)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(claimed) AS BIGINT) AS n_claimed,
         CAST(SUM(present) AS BIGINT) AS n_present,
         CAST(SUM(CASE WHEN claimed = 1 AND present = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fp
  FROM probe JOIN actual USING (g)),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits)
SELECT n_probes, n_claimed, n_present, n_fp,
       n_fp * 1000000 // (n_probes - n_present) AS fp_ppm, n_bits_set
FROM agg, nb
"""


WN_K = 3  # winnowing k-gram width (words)
WN_W = 4  # winnowing window (k-gram hashes per window)


def t_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm: hash every
    k-gram, slide a w-window over the hash sequence, keep each
    window's minimum; guarantees any shared run ≥ w+k−1 tokens yields
    a shared fingerprint, with ~2/(w+1) density — position-robust
    partial-overlap detection, where shingle-set Jaccard only sees
    whole-document similarity). Per doc: window count, distinct
    fingerprint count, density in BIGINT ppm, and the md5 of the FULL
    selected-min sequence in positional order — the fingerprint stream
    itself is hash-checked, not just counted.

    Scale: everything (k-gram hashing, sliding min, density, digest)
    is array codegen inside the scan's Project — ZERO shuffles before
    the final ORDER BY; the portable per-gram hash is _phash's
    md5-conv form inlined into the lambda."""
    d = _t(spark, sf_dir, "documents")
    expr = f"""
      transform(
        transform(sequence(1, size(hs) - {WN_W - 1}),
                  i -> array_min(slice(hs, i, {WN_W}))),
        x -> CAST(x AS STRING))
    """
    out = (
        d.select(
            "doc_id",
            F.expr("split(lower(trim(text)), '\\\\s+')").alias("w"),
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
        .withColumn("sel", F.expr(expr))
    )
    return out.select(
        "doc_id",
        F.size("sel").alias("n_windows"),
        F.size(F.array_distinct("sel")).alias("n_fp"),
        F.expr(
            "CAST(size(array_distinct(sel)) AS BIGINT) * 1000000L "
            "div size(sel)"
        ).alias("density_ppm"),
        F.md5(F.concat_ws(",", "sel")).alias("fp_md5"),
    ).orderBy("doc_id")


T_WINNOW_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
hashed AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, len(w) - {WN_K - 2}),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
           g -> CAST('0x' || substr(md5('wn:' || g), 1, 15) AS BIGINT))
           AS hs
  FROM base WHERE len(w) >= {WN_K + WN_W - 1}),
sel AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, len(hs) - {WN_W - 2}),
                          i -> list_min(hs[i:i+{WN_W - 1}])),
           x -> CAST(x AS VARCHAR)) AS sel
  FROM hashed)
SELECT doc_id,
       len(sel) AS n_windows,
       len(list_distinct(sel)) AS n_fp,
       CAST(len(list_distinct(sel)) AS BIGINT) * 1000000 // len(sel)
         AS density_ppm,
       md5(array_to_string(sel, ',')) AS fp_md5
FROM sel
ORDER BY doc_id
"""


def o_crawl_makespan(spark, sf_dir):
    """Crawl completion forecasting under per-host politeness budgets —
    the capacity-planning twin of J6's scheduler: given each host's
    pending-url count and budget, rounds_to_drain = ⌈n/budget⌉, and the
    crawl's makespan is the slowest host (the politeness tail every
    large crawl is bounded by — adding executors can't speed up a
    budget-capped host, only adding HOSTS in flight can). Hosts ≙
    suppliers, pending urls ≙ lineitems, budget synthesized
    deterministically from the host key (1 + key % 4, both engines).
    All BIGINT: ceil division as (n + b − 1) div b; is_critical marks
    the makespan host(s) via a 1-row max crossJoin."""
    l = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    per = (
        l.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .withColumn("budget", F.expr("CAST(1 + l_suppkey % 4 AS BIGINT)"))
        .withColumn(
            "rounds_to_drain",
            F.expr("(n_urls + budget - 1) div budget"),
        )
    )
    mk = per.agg(F.max("rounds_to_drain").alias("makespan"))
    return (
        per.join(F.broadcast(mk))
        .select(
            "l_suppkey",
            "n_urls",
            "budget",
            "rounds_to_drain",
            F.expr(
                "CAST(CASE WHEN rounds_to_drain = makespan THEN 1 "
                "ELSE 0 END AS INT)"
            ).alias("is_critical"),
        )
        .orderBy("l_suppkey")
    )


O_MAKESPAN_SQL = """
WITH per AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(1 + l_suppkey % 4 AS BIGINT) AS budget
  FROM lineitem GROUP BY l_suppkey),
r AS (SELECT l_suppkey, n_urls, budget,
             (n_urls + budget - 1) // budget AS rounds_to_drain
      FROM per),
mk AS (SELECT MAX(rounds_to_drain) AS makespan FROM r)
SELECT l_suppkey, n_urls, budget, rounds_to_drain,
       CAST(CASE WHEN rounds_to_drain = makespan THEN 1 ELSE 0 END AS INT)
         AS is_critical
FROM r, mk
ORDER BY l_suppkey
"""


def o_corpus_drift(spark, sf_dir):
    """Corpus drift detection between crawl batches — the monitoring
    op a continuous-ingestion pipeline runs on every snapshot (a CC
    dump whose length/quality distribution shifts against the standing
    corpus signals an extraction regression or a web-level change
    before any model sees the data). Old = sources src0-9, new =
    src10-19 (source as batch id, the d_incremental_minhash
    convention); feature = log2 doc-length bucket (length(bin(x)) —
    integer, no log()); per-bucket Pearson χ² contribution of the new
    batch against Laplace-smoothed old expectations. All counts exact
    BIGINT; each expectation and contribution is an independent
    fixed-shape float expression per bucket row (one cast-divide, one
    square — no cross-row float accumulation anywhere, which is why
    no χ² TOTAL column: a float sum over buckets would expose
    reduction order; readers sum the 6-decimal contributions).

    Scale: one hash(bucket) aggregate + a 1-row totals crossJoin —
    the o_key_skew shape."""
    d = _t(spark, sf_dir, "documents").select(
        F.expr("length(bin(CAST(n_chars AS BIGINT)))").alias("bucket"),
        F.expr(
            "CASE WHEN CAST(substring(source, 4, 10) AS INT) < 10 "
            "THEN 1 ELSE 0 END"
        ).alias("is_old"),
    )
    per = d.groupBy("bucket").agg(
        F.sum("is_old").alias("n_old"),
        F.sum(F.expr("1 - is_old")).alias("n_new"),
    )
    tot = per.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "bucket",
            "n_old",
            "n_new",
            F.floor(
                F.expr(
                    "CAST(t_new * (n_old + 1) AS DOUBLE) "
                    "/ (t_old + n_buckets)"
                )
                * F.lit(10000.0)
            ).alias("exp_new_e4"),
            F.floor(
                F.expr(
                    "(n_new - CAST(t_new * (n_old + 1) AS DOUBLE) "
                    "/ (t_old + n_buckets)) "
                    "* (n_new - CAST(t_new * (n_old + 1) AS DOUBLE) "
                    "/ (t_old + n_buckets)) "
                    "/ (CAST(t_new * (n_old + 1) AS DOUBLE) "
                    "/ (t_old + n_buckets))"
                )
                * F.lit(1000000.0)
            ).alias("chi2_contrib_e6"),
        )
        .orderBy("bucket")
    )


O_DRIFT_SQL = """
WITH d AS (
  SELECT length(bin(CAST(n_chars AS BIGINT))) AS bucket,
         CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1 ELSE 0 END
           AS is_old
  FROM documents),
per AS (
  SELECT bucket, CAST(SUM(is_old) AS BIGINT) AS n_old,
         CAST(SUM(1 - is_old) AS BIGINT) AS n_new
  FROM d GROUP BY bucket),
tot AS (
  SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
         CAST(SUM(n_new) AS BIGINT) AS t_new,
         COUNT(*) AS n_buckets
  FROM per)
SELECT bucket, n_old, n_new,
       CAST(FLOOR(CAST(t_new * (n_old + 1) AS DOUBLE) / (t_old + n_buckets)
                  * 10000.0) AS BIGINT) AS exp_new_e4,
       CAST(FLOOR((n_new - CAST(t_new * (n_old + 1) AS DOUBLE)
                / (t_old + n_buckets))
             * (n_new - CAST(t_new * (n_old + 1) AS DOUBLE)
                / (t_old + n_buckets))
             / (CAST(t_new * (n_old + 1) AS DOUBLE) / (t_old + n_buckets))
             * 1000000.0) AS BIGINT) AS chi2_contrib_e6
FROM per, tot
ORDER BY bucket
"""


MRL_DIMS = 16  # truncation width for the Matryoshka retrieval audit


def sim_matryoshka_overlap(spark, sf_dir):
    """Matryoshka-style truncation audit (Kusupati et al. 2022 — MRL
    embeddings let a deployment serve the FIRST d' dims as a cheap
    index tier; before adopting that, you measure what truncation does
    to retrieval). Top-10 cosine retrieval for the vec_id=0 query is
    run twice — full 64 dims and the first MRL_DIMS dims — and the
    audit reports the top-k overlap and both top-1 ids. Same quantized-
    cosine (floor·1e4 BIGINT) + vec_id tiebreak top-k shape as
    sim_cosine_topk (both
    TakeOrdered top-k selections, never a global sort); dot products
    are the shared left-fold == list_dot_product association."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("q_emb")
    )
    v = e.where(F.col("vec_id") != 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def topk(a_expr: str, b_expr: str):
        # rank key is floor(cos * 1e4) BIGINT (not ROUND) so the
        # top-k membership can't drift on cross-engine rounding
        cos = F.expr(
            f"floor(aggregate(zip_with({a_expr}, {b_expr}, (a, b) -> a * b), "
            f"0.0D, (acc, x) -> acc + x) "
            f"/ (sqrt(aggregate({a_expr}, 0.0D, (acc, x) -> acc + x * x)) "
            f"* sqrt(aggregate({b_expr}, 0.0D, (acc, x) -> acc + x * x))) "
            f"* 10000.0)"
        )
        return (
            v.crossJoin(F.broadcast(q))
            .select("vec_id", cos.alias("c"))
            .orderBy(F.col("c").desc(), "vec_id")
        )

    full = topk("emb", "q_emb").limit(10).localCheckpoint()
    trunc = topk(
        f"slice(emb, 1, {MRL_DIMS})", f"slice(q_emb, 1, {MRL_DIMS})"
    ).limit(10).localCheckpoint()
    overlap = full.join(trunc, "vec_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    t1f = full.orderBy(F.col("c").desc(), "vec_id").limit(1).select(
        F.col("vec_id").alias("top1_full")
    )
    t1t = trunc.orderBy(F.col("c").desc(), "vec_id").limit(1).select(
        F.col("vec_id").alias("top1_trunc")
    )
    return (
        overlap.crossJoin(t1f)
        .crossJoin(t1t)
        .select(F.lit(10).alias("k"), "n_overlap", "top1_full", "top1_trunc")
    )


SIM_MRL_SQL = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
           WHERE vec_id = 0),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      WHERE vec_id <> 0),
fullk AS (
  SELECT vec_id,
         FLOOR(list_dot_product(emb, q_emb)
               / (sqrt(list_dot_product(emb, emb))
                  * sqrt(list_dot_product(q_emb, q_emb))) * 10000.0) AS c
  FROM v, q ORDER BY c DESC, vec_id LIMIT 10),
trunck AS (
  SELECT vec_id,
         FLOOR(list_dot_product(emb[1:{MRL_DIMS}], q_emb[1:{MRL_DIMS}])
               / (sqrt(list_dot_product(emb[1:{MRL_DIMS}], emb[1:{MRL_DIMS}]))
                  * sqrt(list_dot_product(q_emb[1:{MRL_DIMS}],
                                          q_emb[1:{MRL_DIMS}]))) * 10000.0)
           AS c
  FROM v, q ORDER BY c DESC, vec_id LIMIT 10)
SELECT 10 AS k,
       (SELECT COUNT(*) FROM fullk JOIN trunck USING (vec_id)) AS n_overlap,
       (SELECT vec_id FROM fullk ORDER BY c DESC, vec_id LIMIT 1)
         AS top1_full,
       (SELECT vec_id FROM trunck ORDER BY c DESC, vec_id LIMIT 1)
         AS top1_trunc
"""


WM_BUCKET = 1000  # arrival-order bucket width for the two-phase running max


def w_watermark_lag(spark, sf_dir):
    """Event-time out-of-orderness profile — the measurement that
    tunes every withWatermark() horizon in streaming/: for each event
    in ARRIVAL order (event_id), lateness = how far the event-time
    watermark (max event time seen so far) had already passed its own
    timestamp. Reported per event_type: late share in exact BIGINT ppm
    and the worst lateness — exactly the numbers that pick a watermark
    that drops <x ppm of events.

    The synthetic stream arrives in timestamp order (zero lateness
    everywhere), so the profile perturbs arrival DETERMINISTICALLY on
    both engines — every 17th event is delayed 5 arrival slots (the
    d_surt_dup convention: mint the interesting case identically on
    both sides, then measure it).

    Scale shape: the running max is TWO-PHASE, not a global window —
    per-bucket maxes (one hash aggregate), an exclusive prefix max
    over the tiny bucket table, and a within-bucket exclusive running
    max partitioned by bucket (bounded WM_BUCKET rows per partition) —
    the O1-rank trick applied to max; no single-partition pass over
    the events themselves at any size."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)").alias("us"),
        F.expr(
            "event_id + CASE WHEN event_id % 17 = 0 THEN 5 ELSE 0 END"
        ).alias("arr"),
    ).withColumn("b", F.expr(f"arr div {WM_BUCKET}"))
    bmax = e.groupBy("b").agg(F.max("us").alias("bmax"))
    wprefix = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bmax.withColumn("carry", F.max("bmax").over(wprefix)).select(
        "b", "carry"
    )
    win = (
        Window.partitionBy("b")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lagged = (
        e.join(F.broadcast(carry), "b")
        .withColumn("inb", F.max("us").over(win))
        .withColumn(
            "wm",
            F.greatest(
                F.coalesce("carry", F.lit(-1).cast("long")),
                F.coalesce("inb", F.lit(-1).cast("long")),
            ),
        )
        .withColumn(
            "late_us", F.greatest(F.lit(0).cast("long"), F.col("wm") - F.col("us"))
        )
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).alias(
                "n_late"
            ),
            F.max("late_us").alias("max_late_us"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            F.expr("n_late * 1000000L div n_events").alias("late_ppm"),
            "max_late_us",
        )
        .orderBy("event_type")
    )


W_WATERMARK_SQL = f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS us, arr,
         arr // {WM_BUCKET} AS b
  FROM (SELECT *, event_id + CASE WHEN event_id % 17 = 0 THEN 5 ELSE 0 END
          AS arr FROM events)),
bmax AS (SELECT b, MAX(us) AS bmax FROM e GROUP BY b),
carry AS (
  SELECT b, MAX(bmax) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry
  FROM bmax),
lagged AS (
  SELECT e.event_type,
         GREATEST(0, GREATEST(COALESCE(c.carry, -1),
                              COALESCE(MAX(e.us) OVER (PARTITION BY e.b
                                ORDER BY e.arr, e.event_id ROWS BETWEEN
                                UNBOUNDED PRECEDING AND 1 PRECEDING), -1))
                     - e.us)
           AS late_us
  FROM e JOIN carry c USING (b)),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
         MAX(late_us) AS max_late_us
  FROM lagged GROUP BY event_type)
SELECT event_type, n_events, n_late,
       n_late * 1000000 // n_events AS late_ppm, max_late_us
FROM agg
ORDER BY event_type
"""


JL_K = 16    # target dimension of the random projection
JL_DIM = 64  # source embedding dimension


def _jl_signs() -> list[list[int]]:
    """Deterministic Achlioptas ±1 projection matrix: sign(j,i) from
    md5 of the literal coordinate string — computed in PYTHON at plan
    build time and embedded as ±1.0 literals, so both engines evaluate
    the identical expression tree (no engine hash involved at all)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:15], 16)
            % 2
            == 0
            else -1
            for i in range(JL_DIM)
        ]
        for j in range(JL_K)
    ]


def sim_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection (Achlioptas 2001's
    database-friendly ±1 matrix — the dimensionality-reduction stage
    an embedding pipeline runs before indexing: 64-d → 16-d here, with
    distances preserved within 1±ε whp). The projection y = Rx/√k is
    16 fixed-order ±embedding[i] folds per vector — pure codegen, one
    map pass, NO shuffle until the final top-k — and the query audits
    the JL guarantee itself: per-vector norm ratio ‖y‖/‖x‖, reporting
    the 20 WORST-distorted vectors (the empirical ε). Every fold is
    written in the same left-assoc order on both engines, so even the
    doubles agree bit-exactly (the _dot_sql discipline); ±1 products
    are exact in IEEE, so the only roundings are the shared fold adds,
    sqrt (correctly rounded), and one division."""
    signs = _jl_signs()
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def proj_expr(j: int, idx) -> str:
        return " + ".join(
            f"({s}.0 * e[{idx(i)}])" for i, s in enumerate(signs[j])
        )

    spark_projs = [
        F.expr(proj_expr(j, lambda i: i)).alias(f"p{j}") for j in range(JL_K)
    ]
    orig_sq = " + ".join(f"(e[{i}] * e[{i}])" for i in range(JL_DIM))
    p = e.select("vec_id", F.expr(orig_sq).alias("s_orig"), *spark_projs)
    proj_sq = " + ".join(f"(p{j} * p{j})" for j in range(JL_K))
    return (
        p.select(
            "vec_id",
            F.floor(F.sqrt("s_orig") * F.lit(10000.0)).alias("orig_norm_e4"),
            F.floor(
                F.expr(f"sqrt(({proj_sq}) / {JL_K}.0) / sqrt(s_orig)")
                * F.lit(1000000.0)
            ).alias("norm_ratio_e6"),
            F.floor(
                F.expr(
                    f"abs(sqrt(({proj_sq}) / {JL_K}.0) / sqrt(s_orig) - 1.0)"
                )
                * F.lit(1000000.0)
            ).alias("distortion_e6"),
        )
        .orderBy(F.col("distortion_e6").desc(), "vec_id")
        .limit(20)
    )


def _jl_sql() -> str:
    signs = _jl_signs()
    projs = ",\n         ".join(
        "("
        + " + ".join(f"({s}.0 * e[{i + 1}])" for i, s in enumerate(signs[j]))
        + f") AS p{j}"
        for j in range(JL_K)
    )
    orig_sq = " + ".join(f"(e[{i + 1}] * e[{i + 1}])" for i in range(JL_DIM))
    proj_sq = " + ".join(f"(p{j} * p{j})" for j in range(JL_K))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
p AS (
  SELECT vec_id, ({orig_sq}) AS s_orig,
         {projs}
  FROM v)
SELECT vec_id,
       CAST(FLOOR(sqrt(s_orig) * 10000.0) AS BIGINT) AS orig_norm_e4,
       CAST(FLOOR(sqrt(({proj_sq}) / {JL_K}.0) / sqrt(s_orig) * 1000000.0)
            AS BIGINT) AS norm_ratio_e6,
       CAST(FLOOR(abs(sqrt(({proj_sq}) / {JL_K}.0) / sqrt(s_orig) - 1.0)
                  * 1000000.0) AS BIGINT) AS distortion_e6
FROM p
ORDER BY CAST(FLOOR(abs(sqrt(({proj_sq}) / {JL_K}.0) / sqrt(s_orig) - 1.0)
                    * 1000000.0) AS BIGINT) DESC, vec_id
LIMIT 20"""


SIM_JL_SQL = _jl_sql()


ED_PREFIX = 512      # char cap per side — bounds the O(n·m) DP per pair
ED_MAX_PPM = 200_000  # keep pairs with normalized edit distance ≤ 0.2


def d_edit_distance_pairs(spark, sf_dir):
    """Character-level near-dup rerank by edit distance — the THIRD
    similarity axis beside token-set Jaccard (minhash_near_dup) and
    bit-sketch Hamming (simhash_near_dup): Levenshtein catches small
    in-place edits (typo fixes, template slot changes, date bumps)
    that reorder nothing, the short-text dedup standard. Candidates
    come from the SAME MinHash band join (never n²); the rerank runs
    each engine's built-in Levenshtein DP over ED_PREFIX-char
    prefixes — the cap bounds the per-pair O(n·m) cost at corpus
    width and is applied identically on both sides. Normalized
    distance is exact BIGINT ppm (lev·10⁶ div max(len)); keep ≤ 0.2.
    Spark's levenshtein() and DuckDB's are the same unit-cost DP, so
    the oracle checks the distances themselves."""
    sh = _doc_shingles(spark, sf_dir)
    # Checkpointed: the self-join's broadcast build side would
    # otherwise RE-COMPUTE the whole shingle→minhash pipeline (a
    # BroadcastExchange reuses nothing — measured as a second full
    # hashing pass in the r3 plan audit of this query).
    bands = _minhash_bands(sh).localCheckpoint()
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    txt = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, ED_PREFIX).alias("t")
    )
    par = max(2, int(spark.sparkContext.defaultParallelism))
    # The DP is the hot loop (O(ED_PREFIX²) per pair). Two traps made
    # it run single-core (measured 26.6 s at sf0.1, ~2 s fixed):
    # AQE coalesces the tiny pair table to ~1 partition, so the
    # explicit repartition spreads it (REPARTITION_BY_NUM is exempt
    # from coalescing); and predicate pushdown sinks the ned_ppm
    # filter BELOW that exchange into the broadcast join as a join
    # condition — putting the levenshtein right back on one core —
    # so the scored table is checkpoint-materialized before the
    # filter, which pins the DP in the 32-task post-exchange stage.
    scored = (
        pairs.join(txt.select(F.col("doc_id").alias("doc_a"),
                              F.col("t").alias("ta")), "doc_a")
        .join(txt.select(F.col("doc_id").alias("doc_b"),
                         F.col("t").alias("tb")), "doc_b")
        .repartition(par, "doc_a", "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("lev"),
            "ta",
            "tb",
        )
        .select(
            "doc_a",
            "doc_b",
            "lev",
            F.expr(
                "lev * 1000000L div greatest(length(ta), length(tb))"
            ).alias("ned_ppm"),
        )
        .localCheckpoint()
    )
    return (
        scored.where(F.col("ned_ppm") <= ED_MAX_PPM)
        .orderBy("doc_a", "doc_b")
    )


D_EDIT_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_bands_sql()},
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id),
txt AS (SELECT doc_id, substr(text, 1, {ED_PREFIX}) AS t FROM documents),
scored AS (
  SELECT p.doc_a, p.doc_b,
         CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS lev,
         CAST(levenshtein(ta.t, tb.t) AS BIGINT) * 1000000
           // GREATEST(length(ta.t), length(tb.t)) AS ned_ppm
  FROM pairs p
  JOIN txt ta ON ta.doc_id = p.doc_a
  JOIN txt tb ON tb.doc_id = p.doc_b)
SELECT doc_a, doc_b, lev, ned_ppm
FROM scored WHERE ned_ppm <= {ED_MAX_PPM}
ORDER BY doc_a, doc_b
"""


def t_ccnet_perplexity(spark, sf_dir):
    """CCNet's LM-perplexity filtering stage (Wenzek et al. 2020 §3.3:
    score every paragraph with a language-model perplexity and split
    the corpus into head/middle/tail terciles — the quality gate that
    made CCNet the template for CC-derived training sets). KenLM isn't
    reproducible cross-engine, so the falsifiable twin trains a
    corpus-wide BIGRAM model with add-1 smoothing and scores docs in
    EXACT INTEGER BITS (the t_dsir_importance discipline):
    −log2 p(w_i|w_{i−1}) ≈ ilog2(ctx_count + V) − ilog2(bigram_count
    + 1) with ilog2(x) = length(bin(x)) − 1 — no log(), no float
    accumulation; per-doc score is milli-bits per bigram by BIGINT
    floor division. Terciles are computed as the O1 two-phase rank
    over the total order (score, doc_id) — range-bucketed parallel
    row_number + P-row offset collect, then the NTILE bucket as pure
    arithmetic on the global rank — so no single-partition window
    exists at any cardinality (the plan ntile(3) would produce).

    Scale shape: the bigram-count and context-count tables are
    corpus-wide aggregates joined back onto the per-doc bigram
    multiset (one shuffle each on the natural key); V is a 1-row
    scalar crossJoin."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    ).where(F.size("w") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("bigram"),
    )
    bgm = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("m"))
    corpus = bgm.groupBy("bigram").agg(F.sum("m").alias("cb"))
    ctx = (
        corpus.select(
            F.expr("split(bigram, ' ')[0]").alias("w1"), "cb"
        )
        .groupBy("w1")
        .agg(F.sum("cb").alias("cc"))
    )
    vocab = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("g"))
        .where(F.length("g") > 0)
        .agg(F.countDistinct("g").alias("v"))
    )
    scored = (
        bgm.join(corpus, "bigram")
        .withColumn("w1", F.expr("split(bigram, ' ')[0]"))
        .join(ctx, "w1")
        .join(F.broadcast(vocab))
        .withColumn(
            "bits",
            F.expr(
                "(length(bin(cc + v)) - 1) - (length(bin(cb + 1)) - 1)"
            ).cast("long"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("bits")).alias("total_bits"),
    )
    mbits = F.expr("total_bits * 1000L div n_bigrams")
    # checkpoint the per-doc frame: it feeds the scalar agg, the
    # bucket counts, and the final projection — without this the
    # bigram explosion upstream would run three times
    pd2 = per_doc.withColumn("mbits_per_bg", mbits).localCheckpoint()
    # Exact NTILE(3) over (mbits, doc_id) WITHOUT the single-partition
    # global window ntile() plans: two-phase rank (assign_global_seq
    # discipline, operators/expand.py:330). The composite integer key
    # mbits*(maxdoc+1)+doc_id orders identically to (mbits, doc_id)
    # and is unique, so range buckets rank in parallel, per-bucket
    # offsets are a P-row collect, and the tercile is pure arithmetic
    # on the global rank (sizes base+1 ×r then base, r = n mod 3 —
    # the NTILE contract).
    sc_row = pd2.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("maxdoc"),
        F.min(F.col("mbits_per_bg")).alias("mlo"),
        F.max(F.col("mbits_per_bg")).alias("mhi"),
    ).first()
    n = int(sc_row.n or 0)
    out_cols = [
        "doc_id",
        "n_bigrams",
        "total_bits",
        "mbits_per_bg",
    ]
    if n == 0:
        return pd2.select(
            *out_cols, F.lit("tail").alias("bucket")
        ).orderBy("doc_id")
    wmul = int(sc_row.maxdoc) + 1
    lo = int(sc_row.mlo) * wmul
    hi = int(sc_row.mhi) * wmul + int(sc_row.maxdoc)
    span = max(hi - lo + 1, 1)
    P = spark.sparkContext.defaultParallelism * 4
    # divide-first bucket (the g_effective_diameter lesson, PLANS.md:
    # multiply-first (_ck-lo)*P overflows BIGINT at open-web _ck);
    # ceil(span/P) keeps bucket ids strictly inside 0..P-1
    csize = (span + P - 1) // P
    b = pd2.withColumn(
        "_ck", F.col("mbits_per_bg") * F.lit(wmul) + F.col("doc_id")
    ).withColumn(
        "_bkt", F.expr(f"cast((_ck - {lo}L) div {csize}L as int)")
    )
    counts = {
        r._bkt: r["count"] for r in b.groupBy("_bkt").count().collect()
    }
    offsets, acc = {}, 0
    for k in range(P):
        offsets[k] = acc
        acc += counts.get(k, 0)
    omap = F.create_map(
        *[x for k in sorted(offsets) for x in (F.lit(k), F.lit(offsets[k]))]
    )
    wloc = Window.partitionBy("_bkt").orderBy("_ck")
    base, rem = n // 3, n % 3
    ranked = b.withColumn(
        "_rn", omap[F.col("_bkt")] + F.row_number().over(wloc)
    )
    nt = F.expr(
        f"CASE WHEN _rn <= {rem * (base + 1)}L "
        f"THEN (_rn - 1) div {base + 1}L + 1 "
        f"ELSE {rem} + (_rn - 1 - {rem * (base + 1)}L) div "
        f"{max(base, 1)}L + 1 END"
    )
    return (
        ranked.withColumn("nt", nt)
        .select(
            *out_cols,
            F.expr(
                "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
                "ELSE 'tail' END"
            ).alias("bucket"),
        )
        .orderBy("doc_id")
    )


T_CCNET_PPL_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM toks WHERE len(w) >= 2),
bgm AS (SELECT doc_id, bigram, COUNT(*) AS m FROM bg GROUP BY 1, 2),
corpus AS (SELECT bigram, CAST(SUM(m) AS BIGINT) AS cb
           FROM bgm GROUP BY 1),
ctx AS (SELECT string_split(bigram, ' ')[1] AS w1,
               CAST(SUM(cb) AS BIGINT) AS cc
        FROM corpus GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT g) AS v FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS g
    FROM documents) WHERE length(g) > 0),
scored AS (
  SELECT bgm.doc_id, bgm.m,
         (length(bin(ctx.cc + vocab.v)) - 1)
           - (length(bin(corpus.cb + 1)) - 1) AS bits
  FROM bgm
  JOIN corpus USING (bigram)
  JOIN ctx ON ctx.w1 = string_split(bgm.bigram, ' ')[1]
  CROSS JOIN vocab),
per_doc AS (
  SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams,
         CAST(SUM(m * bits) AS BIGINT) AS total_bits
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams, total_bits,
       total_bits * 1000 // n_bigrams AS mbits_per_bg,
       CASE NTILE(3) OVER (ORDER BY total_bits * 1000 // n_bigrams, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM per_doc
ORDER BY doc_id
"""


def d_param_wash(spark, sf_dir):
    """Query-parameter canonicalization — the OTHER url-dedup axis
    beside d_surt_dup: strip tracking/session parameters (utm_*,
    gclid, fbclid, sessionid & co. — Heritrix ships this as its
    canonicalization-rule chain, e.g. StripSessionIDs; every archive
    crawler needs it because analytics params mint unbounded distinct
    urls for one resource) and SORT the surviving params so order
    doesn't split the key. The synthetic corpus has no urls, so each
    3-doc group mints 3 variants of its resource's url on BOTH
    engines: clean / reordered+utm / per-doc gclid+fbclid noise —
    every group must collapse to ONE canonical key with 3 distinct
    raws.

    100 TB posture: split/filter/sort/rejoin are all higher-order
    array functions in the scan's codegen Project — no UDF, no
    explode; the one shuffle is the hash aggregate on the canonical
    key (the D1 exact-dedup shape on a computed key)."""
    d = _t(spark, sf_dir, "documents")
    g = F.expr("doc_id div 3")
    base = F.concat(
        F.lit("http://site-"), (g % 5).cast("string"), F.lit(".test/p/"),
        g.cast("string"),
    )
    v = F.col("doc_id") % 3
    url = (
        F.when(v == 0, F.concat(base, F.lit("?id="), g.cast("string"),
                                F.lit("&ref=home")))
        .when(
            v == 1,
            F.concat(base, F.lit("?ref=home&utm_source=feed&id="),
                     g.cast("string"), F.lit("&utm_campaign=x")),
        )
        .otherwise(
            F.concat(base, F.lit("?gclid=g"), F.col("doc_id").cast("string"),
                     F.lit("&id="), g.cast("string"),
                     F.lit("&ref=home&fbclid=f"),
                     F.col("doc_id").cast("string")),
        )
    )
    u = d.select("doc_id", url.alias("url"))
    path = F.regexp_replace("url", "\\?.*$", "")
    kept = F.expr(
        "array_join(array_sort(filter(split("
        "regexp_extract(url, '\\\\?(.*)$', 1), '&'), "
        "p -> NOT (p LIKE 'utm\\\\_%' OR split(p, '=')[0] IN "
        "('gclid', 'fbclid', 'sessionid', 'sid', 'phpsessid')))), '&')"
    )
    canon = F.when(kept == "", path).otherwise(
        F.concat(path, F.lit("?"), kept)
    )
    return (
        u.select("doc_id", "url", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("url").alias("n_distinct_raw"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .orderBy("canon_url")
    )


D_PARAM_WASH_SQL = """
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN 'http://site-' || CAST((doc_id // 3) % 5 AS VARCHAR)
                || '.test/p/' || CAST(doc_id // 3 AS VARCHAR)
                || '?id=' || CAST(doc_id // 3 AS VARCHAR) || '&ref=home'
           WHEN 1 THEN 'http://site-' || CAST((doc_id // 3) % 5 AS VARCHAR)
                || '.test/p/' || CAST(doc_id // 3 AS VARCHAR)
                || '?ref=home&utm_source=feed&id='
                || CAST(doc_id // 3 AS VARCHAR) || '&utm_campaign=x'
           ELSE 'http://site-' || CAST((doc_id // 3) % 5 AS VARCHAR)
                || '.test/p/' || CAST(doc_id // 3 AS VARCHAR)
                || '?gclid=g' || CAST(doc_id AS VARCHAR)
                || '&id=' || CAST(doc_id // 3 AS VARCHAR)
                || '&ref=home&fbclid=f' || CAST(doc_id AS VARCHAR)
         END AS url
  FROM documents),
c AS (
  SELECT doc_id, url,
         CASE WHEN kept = '' THEN path ELSE path || '?' || kept END
           AS canon_url
  FROM (
    SELECT doc_id, url,
           regexp_replace(url, '\\?.*$', '') AS path,
           array_to_string(list_sort(list_filter(
             string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
             p -> NOT (p LIKE 'utm\\_%' ESCAPE '\\'
                       OR string_split(p, '=')[1] IN
                          ('gclid', 'fbclid', 'sessionid', 'sid',
                           'phpsessid')))), '&') AS kept
    FROM u))
SELECT canon_url, COUNT(*) AS n_raw,
       COUNT(DISTINCT url) AS n_distinct_raw,
       MIN(doc_id) AS keeper_doc
FROM c GROUP BY canon_url
ORDER BY canon_url
"""


HB_M = 16          # HyperBall registers per node (state = 16 BIGINT cols)
HB_CAP = 40        # rho clamp, same convention as sk_hll_distinct
HB_ITERS = 3       # ball radii 1..3 (harmonic centrality truncated at 3)
HB_NUM = 0.673 * (HB_M**2) * float(1 << HB_CAP)  # alpha_16 · m² · 2^cap


def g_harmonic_hyperball(spark, sf_dir):
    """HyperBall harmonic centrality (Boldi & Vigna, WWW 2013 "In-core
    computation of geometric centralities with HyperBall" — the
    algorithm behind Common Crawl's published host-level harmonic
    centrality ranking). Exact per-node neighborhood functions need
    O(n) state per node; HyperBall keeps ONE mergeable HLL counter per
    node (here m=16 registers = 16 BIGINT columns) and grows balls by
    radius: regs_r(v) = elementwise-max(regs_{r-1}(v), regs_{r-1}(u)
    ∀ u ~ v) — per radius one equi-join + one 16-way MAX aggregate,
    the linkgraph shuffle shape, state O(m) per node at any graph
    size. Ball sizes |B(v,r)| come from the raw HLL estimator (exact
    BIGINT harmonic sum S = Σ 2^(40−reg), ONE IEEE division — the
    sk_hll_distinct discipline), and harmonic centrality is the
    truncated sum Σ_{r=1..3} (N_r − N_{r−1})/r folded in a fixed
    written order, so even the doubles agree bit-exactly across
    engines. Undirected supplier↔customer edges (balls grow both
    ways); register max is order-independent, so no part of the
    pipeline exposes reduction order."""
    est = _hb_est(spark, sf_dir)
    harmonic = (
        (F.col("n1") - F.col("n0")) / F.lit(1.0)
        + (F.col("n2") - F.col("n1")) / F.lit(2.0)
        + (F.col("n3") - F.col("n2")) / F.lit(3.0)
    )
    return (
        est.select(
            "node",
            F.floor(F.col("n1") * F.lit(100.0)).alias("ball_r1_e2"),
            F.floor(F.col("n2") * F.lit(100.0)).alias("ball_r2_e2"),
            F.floor(F.col("n3") * F.lit(100.0)).alias("ball_r3_e2"),
            F.floor(harmonic * F.lit(10000.0)).alias("harmonic_e4"),
        )
        .orderBy(F.col("harmonic_e4").desc(), "node")
        .limit(20)
    )


def _hb_est(spark, sf_dir) -> DataFrame:
    """Shared HyperBall chain: per node the HLL ball-size estimates
    n0..n{HB_ITERS} at radii 0..HB_ITERS — the machinery behind both
    g_harmonic_hyperball and g_effective_diameter."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ue = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    cols = [f"b{i}" for i in range(HB_M)]
    hv = (
        ue.select(F.col("src").alias("node"))
        .distinct()
        .select("node", _phash(F.col("node"), "hb").alias("hv"))
        .select(
            "node",
            (F.col("hv") % HB_M).alias("bucket"),
            F.expr(
                f"least(CASE WHEN hv DIV {HB_M} = 0 THEN 57 "
                f"ELSE 57 - length(bin(hv DIV {HB_M})) END, {HB_CAP})"
            ).alias("rho"),
        )
    )
    r = hv.select(
        "node",
        *[
            F.when(F.col("bucket") == i, F.col("rho"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(c)
            for i, c in enumerate(cols)
        ],
    ).localCheckpoint()
    s_expr = "+".join(f"shiftleft(1L, {HB_CAP} - {c})" for c in cols)
    snaps = [r.select("node", (F.lit(HB_NUM) / F.expr(s_expr).cast("double")).alias("n0"))]
    for it in range(1, HB_ITERS + 1):
        nb = (
            ue.join(r, ue["src"] == r["node"])
            .groupBy(ue["dst"].alias("node"))
            .agg(*[F.max(c).alias(f"m_{c}") for c in cols])
        )
        r = (
            r.join(nb, "node", "left")
            .select(
                "node",
                *[
                    F.greatest(
                        F.col(c), F.coalesce(F.col(f"m_{c}"), F.lit(0))
                    ).alias(c)
                    for c in cols
                ],
            )
            .localCheckpoint()
        )
        snaps.append(
            r.select(
                "node",
                (F.lit(HB_NUM) / F.expr(s_expr).cast("double")).alias(f"n{it}"),
            )
        )
    ue.unpersist()
    est = snaps[0]
    for s in snaps[1:]:
        est = est.join(s, "node")
    return est


def g_effective_diameter(spark, sf_dir):
    """Effective diameter via the ANF curve (Palmer, Gibbons &
    Faloutsos KDD 2002 "ANF"; the statistic behind Leskovec et al.'s
    shrinking-diameters result and the "four degrees of separation"
    measurements — HyperBall §5 computes exactly this on the whole
    web graph): N(r) = Σ_v |B(v,r)| counts reachable pairs within r
    hops, and the effective diameter is the smallest r where N(r) ≥
    90% of its final value. For a crawler this is THE hop-budget
    number: a frontier seeded anywhere reaches 90% of whatever it can
    ever reach within d_eff hops, so max_depth beyond it buys almost
    nothing. Reuses the shared HyperBall chain (_hb_est — one
    equi-join + one 16-way register-MAX per radius, O(m) state per
    node); each node's ball estimate is floored to integer
    MICRO-units before the corpus sum, so the per-radius totals are
    exact BIGINTs (a raw double sum across nodes would expose
    reduction order). Output per radius: ANF in micro-units, share of
    the final radius in exact ppm, and the ≥ 90% flag — the first
    true row IS the effective diameter."""
    est = _hb_est(spark, sf_dir)
    sums = est.agg(
        *[
            F.sum(
                F.expr(f"CAST(floor(n{k} * 1000000) AS BIGINT)")
            ).alias(f"a{k}")
            for k in range(HB_ITERS + 1)
        ]
    )
    return (
        sums.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("radius"),
                            F.col(f"a{k}").alias("anf_micro"),
                        )
                        for k in range(HB_ITERS + 1)
                    ]
                )
            ).alias("s"),
            F.col(f"a{HB_ITERS}").alias("_final"),
        )
        .select(
            F.col("s.radius").alias("radius"),
            F.col("s.anf_micro").alias("anf_micro"),
            # divide-first: anf_micro * 1e6 overflows BIGINT at scale
            # (Σ balls is already in micro-units); floor semantics are
            # mirrored in the oracle, so the gate stays exact
            F.expr("s.anf_micro div (_final div 1000000L)").alias(
                "share_ppm"
            ),
            F.expr(
                "s.anf_micro div (_final div 1000000L) >= 900000"
            ).alias("reaches_90pct"),
        )
        .orderBy("radius")
    )


def _hb_est_sql() -> str:
    m, cap = HB_M, HB_CAP
    init_cols = ",\n         ".join(
        f"CASE WHEN bucket = {i} THEN rho ELSE 0 END AS b{i}" for i in range(m)
    )
    max_cols = ",\n         ".join(
        f"MAX(r.b{i}) AS m_b{i}" for i in range(m)
    )
    merge_cols = ",\n         ".join(
        f"GREATEST(r.b{i}, COALESCE(n.m_b{i}, 0)) AS b{i}" for i in range(m)
    )

    def s_of(alias: str) -> str:
        return " + ".join(
            f"(1::BIGINT << ({cap} - {alias}.b{i}))" for i in range(m)
        )

    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "ue AS MATERIALIZED (SELECT src, dst FROM e "
        "UNION ALL SELECT dst AS src, src AS dst FROM e)",
        f"""hv AS (
  SELECT node, hv % {m} AS bucket,
         LEAST(CASE WHEN hv // {m} = 0 THEN 57
               ELSE 57 - length(bin(hv // {m})) END, {cap}) AS rho
  FROM (SELECT node, {_phash_sql('node', 'hb')} AS hv
        FROM (SELECT DISTINCT src AS node FROM ue)))""",
        f"""r0 AS MATERIALIZED (
  SELECT node,
         {init_cols}
  FROM hv)""",
    ]
    prev = "r0"
    for it in range(1, HB_ITERS + 1):
        ctes.append(
            f"""nb{it} AS (
  SELECT ue.dst AS node,
         {max_cols}
  FROM ue JOIN {prev} r ON ue.src = r.node GROUP BY ue.dst)"""
        )
        ctes.append(
            f"""r{it} AS MATERIALIZED (
  SELECT r.node,
         {merge_cols}
  FROM {prev} r LEFT JOIN nb{it} n USING (node))"""
        )
        prev = f"r{it}"
    est_cols = ",\n       ".join(
        f"{HB_NUM!r} / CAST({s_of(f'r{k}')} AS DOUBLE) AS n{k}"
        for k in range(HB_ITERS + 1)
    )
    joins = " ".join(
        f"JOIN r{k} ON r0.node = r{k}.node" for k in range(1, HB_ITERS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
est AS (
  SELECT r0.node,
       {est_cols}
  FROM r0 {joins})"""
    )


def _hb_sql() -> str:
    return (
        _hb_est_sql()
        + """
SELECT node,
       CAST(FLOOR(n1 * 100.0) AS BIGINT) AS ball_r1_e2,
       CAST(FLOOR(n2 * 100.0) AS BIGINT) AS ball_r2_e2,
       CAST(FLOOR(n3 * 100.0) AS BIGINT) AS ball_r3_e2,
       CAST(FLOOR(((n1 - n0) / 1.0 + (n2 - n1) / 2.0 + (n3 - n2) / 3.0)
                  * 10000.0) AS BIGINT) AS harmonic_e4
FROM est
ORDER BY CAST(FLOOR(((n1 - n0) / 1.0 + (n2 - n1) / 2.0 + (n3 - n2) / 3.0)
                    * 10000.0) AS BIGINT) DESC,
         node
LIMIT 20"""
    )


def _effdiam_sql() -> str:
    sum_cols = ", ".join(
        f"CAST(SUM(CAST(FLOOR(n{k} * 1000000) AS BIGINT)) AS BIGINT) AS a{k}"
        for k in range(HB_ITERS + 1)
    )
    unpivot = "\nUNION ALL ".join(
        f"SELECT {k} AS radius, a{k} AS anf_micro, "
        f"a{k} // (a{HB_ITERS} // 1000000) AS share_ppm, "
        f"a{k} // (a{HB_ITERS} // 1000000) >= 900000 AS reaches_90pct "
        "FROM sums"
        for k in range(HB_ITERS + 1)
    )
    return (
        _hb_est_sql()
        + f""",
sums AS (SELECT {sum_cols} FROM est)
SELECT radius, anf_micro, share_ppm, reaches_90pct FROM ({unpivot})
ORDER BY radius"""
    )


G_HYPERBALL_SQL = _hb_sql()
G_EFFDIAM_SQL = _effdiam_sql()


TR_TRUST_MOD = 5  # suppliers with key % 5 == 0 are the trusted seed set


def g_trustrank(spark, sf_dir):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — the
    biased-PageRank crawl-prioritization / spam-demotion operator:
    teleport mass lands ONLY on a hand-vetted trusted seed set, so
    trust flows out from known-good hosts and pages reachable only
    through spam farms score ~0 (spam mass = PR − TrustRank). Same
    supplier→customer graph, same ORDER-INDEPENDENT fixed-point
    BIGINT micro-unit arithmetic as g_pagerank_fixedpoint (float
    contribution sums can't hash-match across engines); the two
    deltas vs uniform PageRank: rank is initialized and teleported to
    the trusted set only (PR_SCALE // n_trusted each), and dangling
    mass is redistributed to the trusted set (the paper's convention),
    not uniformly. Per iteration: one equi-join on src + one hash
    aggregate on dst — the linkgraph shuffle shape; the dangling total
    is a one-scalar collect. This is also the personalized-PageRank
    shape a focused crawler ranks its frontier with (teleport = topic
    seeds)."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn(
            "trusted",
            F.when(
                (F.substring("node", 1, 1) == "s")
                & (
                    F.expr("CAST(substring(node, 2, 20) AS BIGINT)")
                    % TR_TRUST_MOD
                    == 0
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .persist()
    )
    n_t = nodes.where(F.col("trusted") == 1).count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base_t = PR_SCALE // n_t
    tele = PR_D_DEN - PR_D_NUM

    r = nodes.withColumn(
        "rank",
        F.when(F.col("trusted") == 1, F.lit(base_t))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    for _ in range(PR_ITERS):
        rd = r.join(deg, r["node"] == deg["src"], "left").select(
            "node", "trusted", "rank", "deg"
        )
        dangling = int(
            rd.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(rd.where(F.col("deg").isNotNull()), e["src"] == rd["node"])
            .select("dst", F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_rank = (
            F.when(
                F.col("trusted") == 1, F.lit((tele * base_t) // PR_D_DEN)
            ).otherwise(F.lit(0))
            + F.expr(
                f"((coalesce(c, 0L) + (CASE WHEN trusted = 1 THEN "
                f"{dangling // n_t}L ELSE 0L END)) * {PR_D_NUM}L) "
                f"DIV {PR_D_DEN}L"
            )
        ).cast("long")
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select("node", "trusted", new_rank.alias("rank"))
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return r.select("node", "trusted", "rank").orderBy(
        F.col("rank").desc(), "node"
    ).limit(20)


def _tr_sql() -> str:
    tele = PR_D_DEN - PR_D_NUM
    base_t = f"({PR_SCALE} // n_t)"
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        f"""tn AS MATERIALIZED (
  SELECT node,
         CASE WHEN node LIKE 's%'
               AND CAST(substr(node, 2) AS BIGINT) % {TR_TRUST_MOD} = 0
              THEN 1 ELSE 0 END AS trusted
  FROM (SELECT DISTINCT src AS node FROM e
        UNION SELECT DISTINCT dst FROM e))""",
        "nt AS (SELECT COUNT(*) AS n_t FROM tn WHERE trusted = 1)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"""r0 AS MATERIALIZED (
  SELECT node, trusted,
         CASE WHEN trusted = 1 THEN {base_t} ELSE 0 END AS rank
  FROM tn, nt)""",
    ]
    prev = "r0"
    for it in range(1, PR_ITERS + 1):
        ctes.append(
            f"""dang{it} AS (SELECT COALESCE(SUM(rank), 0) AS dangling
  FROM {prev} r LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""c{it} AS MATERIALIZED (
  SELECT e.dst, SUM(r.rank // deg.deg) AS c
  FROM e JOIN {prev} r ON e.src = r.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{it} AS MATERIALIZED (
  SELECT t.node, t.trusted,
         (CASE WHEN t.trusted = 1 THEN ({tele} * {base_t}) // {PR_D_DEN}
               ELSE 0 END)
         + ((COALESCE(c{it}.c, 0)
             + CASE WHEN t.trusted = 1 THEN dangling // n_t ELSE 0 END)
            * {PR_D_NUM}) // {PR_D_DEN} AS rank
  FROM tn t CROSS JOIN nt CROSS JOIN dang{it}
  LEFT JOIN c{it} ON t.node = c{it}.dst)"""
        )
        prev = f"r{it}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, trusted, CAST(rank AS BIGINT) AS rank FROM {prev} "
        "ORDER BY rank DESC, node LIMIT 20"
    )


G_TRUSTRANK_SQL = _tr_sql()


INCR_NEW_SOURCE = "src0"  # the "arriving batch" slice of documents


def d_incremental_minhash(spark, sf_dir):
    """Incremental near-dup dedup of an ARRIVING BATCH against the
    standing corpus — the continuous-crawl ingestion shape: each new
    Common-Crawl-style snapshot is deduped against everything already
    ingested, never corpus×corpus from scratch. 'New' = documents with
    source = src0, 'old' = the rest (the role the source column plays
    here: batch id).

    Same portable MinHash family + 4×4 banding as minhash_near_dup,
    but the band-bucket join is ASYMMETRIC (new×old only) — candidate
    work is proportional to the BATCH's collisions, not the corpus's
    pair count, which is what keeps continuous ingestion O(batch) at
    100 TB: the old side's band table is the persisted index a real
    deployment appends to per snapshot (the localCheckpoint stands for
    that stored table). Exact-Jaccard rerank over full shingle sets;
    emits each new doc's standing duplicate — the drop list for the
    batch."""
    sh = _doc_shingles(spark, sf_dir).localCheckpoint()
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    bands = _minhash_bands(sh).join(src, "doc_id").localCheckpoint()
    new_b = bands.where(F.col("source") == INCR_NEW_SOURCE)
    old_b = bands.where(F.col("source") != INCR_NEW_SOURCE)
    pairs = (
        new_b.alias("a")
        .join(
            old_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return (
        _exact_jaccard(sh, pairs)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select(
            F.col("doc_a").alias("doc_new"),
            F.col("doc_b").alias("doc_old"),
            "jaccard_ppm",
        )
        .orderBy("doc_new", "doc_old")
    )


D_INCR_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_bands_sql()},
srcb AS (SELECT b.doc_id, b.band, b.bucket, d.source
         FROM bands b JOIN documents d ON d.doc_id = b.doc_id),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM srcb a JOIN srcb b
            ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.source = '{INCR_NEW_SOURCE}'
            AND b.source <> '{INCR_NEW_SOURCE}'),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
          FROM pairs p
          JOIN shingles sa ON sa.doc_id = p.doc_a
          JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
          GROUP BY p.doc_a, p.doc_b)
SELECT doc_a AS doc_new, doc_b AS doc_old,
       n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) AS jaccard_ppm
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common) >= {MH_JACCARD_PPM}
ORDER BY doc_new, doc_old
"""


CONTAIN_T_PPM = 800000


def d_containment_pairs(spark, sf_dir):
    """Asymmetric containment dedup (Broder 1997's second resemblance
    measure: C(A→B) = |A∩B| / |A| — "how much of A is inside B").
    Jaccard misses the quote/embedding case: a short page wholly
    reproduced inside a long aggregator page has tiny Jaccard (the
    union is dominated by the long side) but containment 1.0 — the
    pattern press-release mirrors, quote farms, and scraped-snippet
    SEO pages produce at corpus width. Emits DIRECTED pairs with
    containment ≥ 0.8 plus the symmetric Jaccard for contrast.

    Same scale posture as ngram_jaccard_pairs: candidates from the
    df-capped inverted-index self-join (SHINGLE_DF_CAP — one hot
    boilerplate shingle can't make df² pairs), intersection counted
    over FULL shingle sets so every reported value is exact."""
    # the plan reads the shingle set 5× (df cap, both candidate sides,
    # both intersection sides) — materialize it once, same as
    # d_prefix_filter_pairs
    sh = _doc_shingles(spark, sf_dir).localCheckpoint()
    # the directed union below projects the SAME scored pair table
    # twice — without a checkpoint each union branch re-executes the
    # whole candidate+rerank tree (measured 40 s → 19 s at sf0.1)
    j = _exact_jaccard(sh, None, df_cap=SHINGLE_DF_CAP).localCheckpoint()
    fwd = j.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        F.expr("n_common * 1000000L div sh_a").alias("containment_ppm"),
        "jaccard_ppm",
    )
    rev = j.select(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_dst"),
        F.expr("n_common * 1000000L div sh_b").alias("containment_ppm"),
        "jaccard_ppm",
    )
    return (
        fwd.union(rev)
        .where(F.col("containment_ppm") >= CONTAIN_T_PPM)
        .orderBy("doc_src", "doc_dst")
    )


D_CONTAIN_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
sh_low AS (SELECT * FROM shingles WHERE shingle IN
           (SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {SHINGLE_DF_CAP})),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM sh_low a JOIN sh_low b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
          FROM cand p
          JOIN shingles sa ON sa.doc_id = p.doc_a
          JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2),
scored AS (SELECT doc_a, doc_b, n_common, sa.n_sh AS sh_a, sb.n_sh AS sh_b,
                  n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common)
                      AS jaccard_ppm
           FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                      JOIN sizes sb ON sb.doc_id = doc_b),
dirs AS (
  SELECT doc_a AS doc_src, doc_b AS doc_dst,
         n_common * 1000000 // sh_a AS containment_ppm, jaccard_ppm
  FROM scored
  UNION ALL
  SELECT doc_b AS doc_src, doc_a AS doc_dst,
         n_common * 1000000 // sh_b AS containment_ppm, jaccard_ppm
  FROM scored)
SELECT doc_src, doc_dst, containment_ppm, jaccard_ppm
FROM dirs WHERE containment_ppm >= {CONTAIN_T_PPM}
ORDER BY doc_src, doc_dst
"""


def o_recrawl_priority(spark, sf_dir):
    """Change-rate-aware recrawl scheduling (Cho & Garcia-Molina 2003,
    "Effective page refresh policies for Web crawlers" — the operator
    that decides which ALREADY-SEEN page a continuous crawler fetches
    again; the reference crawls once and stops (crawler.js drain), so
    this is the freshness layer a production deployment adds on top).
    Each user_id's event stream stands for one page's snapshot history
    (ts = warc_ts, event_type = content fingerprint): per page, count
    the changes between consecutive snapshots (lag window), estimate
    the change rate as exact BIGINT changes-per-observation ppm, age
    it by time-since-last-snapshot vs the corpus horizon (max ts —
    NOT wall clock, so the result is replay-deterministic), and rank
    the recrawl queue by staleness = change_ppm * age_s. All integer
    arithmetic end-to-end: epoch microseconds via the portable
    timestampdiff/epoch_us pair (same idiom as j_range_bucketed),
    floor divisions, no float anywhere.

    Scale: one lag window + one groupBy, both partitioned by the page
    key — at 10^10 urls this is a single shuffle on the natural key;
    the 1-row horizon is a broadcast. No driver data path."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    us = F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)")
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", us.alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    obs = e.withColumn("prev_type", F.lag("event_type").over(w))
    per = (
        obs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(
                F.when(
                    F.col("prev_type").isNotNull()
                    & (F.col("prev_type") != F.col("event_type")),
                    1,
                ).otherwise(0)
            ).alias("n_changes"),
            F.max("us").alias("last_us"),
        )
        .where(F.col("n_obs") >= 2)
    )
    horizon = e.agg(F.max("us").alias("horizon_us"))
    return (
        per.join(F.broadcast(horizon))
        .select(
            F.col("user_id").alias("page_id"),
            "n_obs",
            "n_changes",
            F.expr("n_changes * 1000000L div (n_obs - 1)").alias(
                "change_ppm"
            ),
            F.expr("(horizon_us - last_us) div 1000000L").alias("age_s"),
            F.expr(
                "(n_changes * 1000000L div (n_obs - 1))"
                " * ((horizon_us - last_us) div 1000000L)"
            ).alias("staleness"),
        )
        .orderBy(F.desc("staleness"), "page_id")
    )


O_RECRAWL_SQL = """
WITH obs AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(CASE WHEN prev_type IS NOT NULL
                        AND prev_type <> event_type
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         MAX(us) AS last_us
  FROM obs GROUP BY user_id),
h AS (SELECT MAX(epoch_us(ts)) AS horizon_us FROM events)
SELECT user_id AS page_id, n_obs, n_changes,
       n_changes * 1000000 // (n_obs - 1) AS change_ppm,
       (horizon_us - last_us) // 1000000 AS age_s,
       (n_changes * 1000000 // (n_obs - 1))
         * ((horizon_us - last_us) // 1000000) AS staleness
FROM per, h
WHERE n_obs >= 2
ORDER BY staleness DESC, page_id
"""


def g_degree_powerlaw(spark, sf_dir):
    """In/out-degree power-law profile (Broder et al. WWW 2000 §3: web
    in-degree follows p(d) ∝ d^-2.1, out-degree d^-2.72 — the FIRST
    thing measured on any new crawl graph, because a frontier
    prioritizer and a politeness budget are both sized by the hub
    tail). Per-direction log2 degree bands (length(bin(deg)) — the
    t_vocab_growth idiom) with node counts and the band-to-band decay
    ratio in integer ppm: for a power law the decay is constant and
    α ≈ 1 − log2(decay_ppm/10^6), so a non-flat decay column IS the
    deviation-from-power-law evidence. All exact integers — no float
    slope fit to drift across engines.

    Scale: two hash aggregates (degree per endpoint — the linkgraph
    shuffle shape) + one aggregate on the ≤ 2×40-row band table; the
    lag window runs over bands, never nodes. Same cost profile at
    10^10 edges."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ends = e.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("out").alias("direction"), F.col("src").alias("node")
                ),
                F.struct(
                    F.lit("in").alias("direction"), F.col("dst").alias("node")
                ),
            )
        ).alias("x")
    ).select("x.direction", "x.node")
    deg = ends.groupBy("direction", "node").agg(F.count(F.lit(1)).alias("deg"))
    bands = (
        deg.select("direction", F.expr("length(bin(deg))").alias("band"))
        .groupBy("direction", "band")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    w = Window.partitionBy("direction").orderBy("band")
    return (
        bands.withColumn("prev", F.lag("n_nodes").over(w))
        .select(
            "direction",
            "band",
            F.expr("shiftleft(1L, band - 1)").alias("min_deg"),
            "n_nodes",
            F.expr("n_nodes * 1000000L div prev").alias("decay_ppm"),
        )
        .orderBy("direction", "band")
    )


G_DEGREE_SQL = """
WITH e AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (
  SELECT 'out' AS direction, COUNT(*) AS deg FROM e GROUP BY src
  UNION ALL
  SELECT 'in' AS direction, COUNT(*) AS deg FROM e GROUP BY dst),
bands AS (
  SELECT direction, length(bin(deg)) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg GROUP BY direction, band)
SELECT direction, band, (1::BIGINT << (band - 1)) AS min_deg, n_nodes,
       n_nodes * 1000000
         // LAG(n_nodes) OVER (PARTITION BY direction ORDER BY band)
         AS decay_ppm
FROM bands
ORDER BY direction, band
"""


SHARD_N = 8


def o_shard_balance(spark, sf_dir):
    """Seen-set shard-balance audit — the falsifiable relational twin
    of operators/seenset.py's hot-domain spreading design (shard =
    hash(domain,url), not hash(domain): seenset.py:22 documents that a
    99% single-domain frontier must still spread uniformly over all
    shards, tests/test_seenset.py::test_hot_domain_skew pins it; the
    reference keeps ONE in-process array, crawler.js:22, so sharding
    is the first genuinely new decision the distributed engine makes).
    The synthetic frontier is deliberately hot: 2/3 of urls land on
    one host (doc_id % 3 != 0), the rest spread over the 20 sources.
    Both candidate policies are scored side by side over SHARD_N=8
    shards: `domain_hash` (naive — the hot domain's urls collapse
    into ONE shard) vs `domain_url_hash` (deployed). Output per
    policy: shards hit, max/min shard occupancy, and max-shard skew
    vs the ideal total/N in exact BIGINT ppm — 1e6 = perfectly
    balanced, the naive policy reads ~5.3e6 (one shard owns 5.3× its
    fair share, which at 1000 executors means 999 idle probes).

    100 TB posture: one codegen Project mints (host, url), one
    map-side explode emits both policy rows, ONE hash(policy, shard)
    aggregate — output cardinality ≤ 2×SHARD_N at any frontier size;
    the summary aggregate runs on ≤ 16 rows. All integers (portable
    60-bit md5 hash both engines)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    host = F.when(
        F.expr("doc_id % 3 != 0"), F.lit("hot.example.test")
    ).otherwise(F.concat(F.col("source"), F.lit(".example.test")))
    urls = d.select(
        host.alias("host"),
        F.concat(
            host, F.lit("/page/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )
    both = urls.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("domain_hash").alias("policy"),
                    F.pmod(
                        _phash(F.col("host"), "shard"), F.lit(SHARD_N)
                    ).alias("shard"),
                ),
                F.struct(
                    F.lit("domain_url_hash").alias("policy"),
                    F.pmod(
                        _phash(
                            F.concat(F.col("host"), F.lit("|"), F.col("url")),
                            "shard",
                        ),
                        F.lit(SHARD_N),
                    ).alias("shard"),
                ),
            )
        ).alias("x")
    ).select("x.policy", "x.shard")
    per = both.groupBy("policy", "shard").agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("shards_hit"),
            F.sum("n").alias("total"),
            F.max("n").alias("max_shard"),
            F.min("n").alias("min_shard"),
        )
        .select(
            "policy",
            "shards_hit",
            "total",
            "max_shard",
            "min_shard",
            F.expr(
                f"max_shard * 1000000L div (total div {SHARD_N})"
            ).alias("skew_ppm"),
        )
        .orderBy("policy")
    )


O_SHARD_SQL = f"""
WITH u AS (
  SELECT CASE WHEN doc_id % 3 <> 0 THEN 'hot.example.test'
              ELSE source || '.example.test' END AS host,
         CASE WHEN doc_id % 3 <> 0 THEN 'hot.example.test'
              ELSE source || '.example.test' END
           || '/page/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
b AS (
  SELECT 'domain_hash' AS policy,
         {_phash_sql("host", "shard")} % {SHARD_N} AS shard FROM u
  UNION ALL
  SELECT 'domain_url_hash',
         {_phash_sql("host || '|' || url", "shard")} % {SHARD_N} FROM u),
per AS (
  SELECT policy, shard, CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY policy, shard)
SELECT policy, CAST(COUNT(*) AS BIGINT) AS shards_hit,
       CAST(SUM(n) AS BIGINT) AS total,
       MAX(n) AS max_shard, MIN(n) AS min_shard,
       MAX(n) * 1000000 // (CAST(SUM(n) AS BIGINT) // {SHARD_N}) AS skew_ppm
FROM per GROUP BY policy ORDER BY policy
"""


HOSTG_MOD = 7  # stand-in host extraction: key % HOSTG_MOD


def g_host_contraction(spark, sf_dir):
    """Page-graph → host-graph contraction (the scale move behind
    Common Crawl's published host- and domain-level webgraphs: 10^10
    page nodes collapse to 10^7 hosts, and everything host-scoped —
    politeness budgets, domain PageRank, spam neighborhoods — runs on
    the contracted graph instead; Boldi/Vigna's WebGraph stack does
    exactly this before any whole-web analysis). Each page endpoint
    maps to its host (here a deterministic key % HOSTG_MOD stand-in —
    the real extraction is p_pld_extract's registrable-domain CASE
    chain, one codegen Project either way), edges aggregate to
    (host_src, host_dst) with page-edge weights, and each contracted
    edge reports its share of all page edges in exact BIGINT ppm plus
    the is_intra flag — the intra-host share is the number that says
    how much of the link mass politeness serializes.

    100 TB posture: contraction is ONE codegen Project + ONE hash
    aggregate keyed (host_src, host_dst) — output cardinality is the
    contracted graph (≤ |hosts|², sparse in practice), never the page
    graph; the total is a 1-row scalar crossJoin."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(
                F.lit("h"), (F.col("l_suppkey") % HOSTG_MOD).cast("string")
            ).alias("host_src"),
            F.concat(
                F.lit("h"), (F.col("o_custkey") % HOSTG_MOD).cast("string")
            ).alias("host_dst"),
        )
    )
    agg = e.groupBy("host_src", "host_dst").agg(
        F.count(F.lit(1)).alias("n_edges")
    )
    total = agg.agg(F.sum("n_edges").alias("total_edges"))
    return (
        agg.crossJoin(total)
        .select(
            "host_src",
            "host_dst",
            "n_edges",
            F.expr("if(host_src = host_dst, 1, 0)").alias("is_intra"),
            F.expr("n_edges * 1000000L div total_edges").alias("share_ppm"),
        )
        .orderBy("host_src", "host_dst")
    )


G_HOSTG_SQL = f"""
WITH e AS (
  SELECT 'h' || CAST(l_suppkey % {HOSTG_MOD} AS VARCHAR) AS host_src,
         'h' || CAST(o_custkey % {HOSTG_MOD} AS VARCHAR) AS host_dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
agg AS (SELECT host_src, host_dst, CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM e GROUP BY host_src, host_dst),
total AS (SELECT CAST(SUM(n_edges) AS BIGINT) AS total_edges FROM agg)
SELECT host_src, host_dst, n_edges,
       CASE WHEN host_src = host_dst THEN 1 ELSE 0 END AS is_intra,
       n_edges * 1000000 // total_edges AS share_ppm
FROM agg CROSS JOIN total
ORDER BY host_src, host_dst
"""


def g_degree_assortativity(spark, sf_dir):
    """Degree assortativity over the link graph (Newman PRL 2002
    "Assortative mixing in networks" — the one-number answer to "do
    hubs link to hubs?": the web is famously DISassortative, r < 0,
    which is why hub-first frontier prioritization fans out instead
    of ping-ponging inside a rich club; the metric a crawl planner
    checks before assuming either). Pearson correlation over directed
    edges between x = out-degree(src) and y = in-degree(dst),
    computed the numerically-portable way: the five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINTs (degrees are integers,
    products bounded by |V|² — no float accumulation anywhere), and
    the only float operations are one IEEE sqrt of an exact integer
    and one division at the very end, both correctly rounded by every
    IEEE-754 engine, then floor(r·1e6) BIGINT. The integer moment
    columns ARE the output alongside r, so the gate pins the exact
    parts exactly.

    100 TB posture: two hash degree aggregates + one join of each
    degree table back onto the edge list (the linkgraph shuffle
    shape), then ONE scalar aggregate — no window, no pairs, no n²."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    xy = e.join(outd, "src").join(ind, "dst")
    mom = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return mom.select(
        "m",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.expr(
            "floor((m * sxy - sx * sy) / "
            "(sqrt(cast(m * sxx - sx * sx as double)) * "
            "sqrt(cast(m * syy - sy * sy as double))) * 1000000.0)"
        ).alias("assortativity_r_e6"),
    )


G_ASSORT_SQL = """
WITH e AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY src),
ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS y FROM e GROUP BY dst),
xy AS (SELECT x, y FROM e JOIN outd USING (src) JOIN ind USING (dst)),
mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM xy)
SELECT m, sx, sy, sxy, sxx, syy,
       CAST(FLOOR((m * sxy - sx * sy) /
             (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
              sqrt(CAST(m * syy - sy * sy AS DOUBLE))) * 1000000.0)
            AS BIGINT) AS assortativity_r_e6
FROM mom
"""


OPIC_SCALE = 1_000_000_000_000  # fixed-point cash units
OPIC_ITERS = 3
OPIC_TOP_K = 20


def g_opic(spark, sf_dir):
    """OPIC frontier prioritization (Abiteboul, Preda & Cobena WWW
    2003, "Adaptive On-Line Page Importance Computation" — THE crawl
    -ordering algorithm: unlike PageRank it needs no convergence
    before it is useful, because each node carries CASH (current
    flow) and HISTORY (accumulated flow) and `history + cash` is an
    unbiased importance estimate at ANY point of the crawl — the
    scheduler reads it mid-flight to decide what to fetch next, which
    is exactly the gap the reference's FIFO queue leaves open,
    crawler.js:607). Synchronous batch variant: per round every node
    banks its cash into history, distributes cash div out-degree
    along out-edges, and dangling cash is recycled uniformly (the
    virtual-root convention from the paper). All BIGINT micro-units —
    sums order-independent, division floor, both engines bit-exact
    (the g_pagerank_fixedpoint discipline). Output: top-K by
    history + cash after OPIC_ITERS rounds.

    100 TB posture: per round exactly one equi-join on src + one
    hash(dst) aggregate + a one-scalar dangling collect — the
    linkgraph shuffle shape; snapshots localCheckpointed per round so
    the lineage stays flat."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = OPIC_SCALE // n

    st = nodes.select(
        "node",
        F.lit(base).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )
    for _ in range(OPIC_ITERS):
        sd = st.join(deg, st["node"] == deg["src"], "left").select(
            "node", "cash", "hist", "deg"
        )
        dangling = int(
            sd.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("cash"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(sd.where(F.col("deg").isNotNull()), e["src"] == sd["node"])
            .select("dst", F.expr("cash DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        st = (
            st.join(contrib, st["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(f"coalesce(c, 0L) + {dangling // n}L").alias("cash"),
                F.expr("hist + cash").alias("hist"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return (
        st.select(
            "node", "cash", "hist", F.expr("hist + cash").alias("importance")
        )
        .orderBy(F.col("importance").desc(), "node")
        .limit(OPIC_TOP_K)
    )


def _opic_sql() -> str:
    base = f"({OPIC_SCALE} // n)"
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"s0 AS MATERIALIZED (SELECT node, {base} AS cash, 0 AS hist "
        "FROM nodes, nn)",
    ]
    prev = "s0"
    for it in range(1, OPIC_ITERS + 1):
        ctes.append(
            f"""dang{it} AS (SELECT COALESCE(SUM(cash), 0) AS dangling
  FROM {prev} s LEFT JOIN deg ON s.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""c{it} AS MATERIALIZED (
  SELECT e.dst, SUM(s.cash // deg.deg) AS c
  FROM e JOIN {prev} s ON e.src = s.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""s{it} AS MATERIALIZED (
  SELECT {prev}.node,
         COALESCE(c{it}.c, 0) + dangling // n AS cash,
         {prev}.hist + {prev}.cash AS hist
  FROM {prev} CROSS JOIN nn CROSS JOIN dang{it}
  LEFT JOIN c{it} ON {prev}.node = c{it}.dst)"""
        )
        prev = f"s{it}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT node, CAST(cash AS BIGINT) AS cash, CAST(hist AS BIGINT) AS hist,
       CAST(hist + cash AS BIGINT) AS importance
FROM {prev}
ORDER BY importance DESC, node LIMIT {OPIC_TOP_K}"""
    )


G_OPIC_SQL = _opic_sql()


FID_TOP_N = 50


def g_opic_fidelity(spark, sf_dir):
    """OPIC fidelity audit — Kendall rank agreement between OPIC's
    mid-crawl importance (hist + cash) and converged PageRank, over
    the top-N PageRank nodes (Abiteboul et al. WWW 2003 §5 validate
    OPIC by exactly this comparison; a crawl planner that schedules
    by OPIC needs the number saying how faithfully the online
    estimate tracks the authority it stands in for). Both fixpoints
    run in their verified integer forms (micro-unit sums,
    order-independent); concordant/discordant pair counts over the
    N-node panel are exact integers and tau-a is sign-split
    integer division (truncation toward zero written identically in
    both engines — floor vs truncate diverge on negatives).

    100 TB posture: the two loops are the g_pagerank/g_opic shuffle
    shapes (one equi-join + one hash aggregate per iteration); the
    pair table is N²/2 rows of the TOP-N ONLY (N = 50 — the panel is
    fixed, never the graph).

    Measured at sf0.01: tau-a = 1.0 — all 1,225 top-50 pairs
    concordant; on this graph the 3-round online estimate already
    orders the authorities exactly as converged PageRank does, which
    is the strongest possible green light for OPIC-driven
    scheduling."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = PR_SCALE // n
    teleport = PR_D_DEN - PR_D_NUM

    r = nodes.withColumn("rank", F.lit(base).cast("long"))
    for _ in range(PR_ITERS):
        rd = r.join(deg, r["node"] == deg["src"], "left").select(
            "node", "rank", "deg"
        )
        dangling = int(
            rd.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(rd.where(F.col("deg").isNotNull()), e["src"] == rd["node"])
            .select("dst", F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_rank = (
            F.lit((teleport * base) // PR_D_DEN)
            + F.expr(
                f"((coalesce(c, 0L) + {dangling // n}L) * {PR_D_NUM}L) "
                f"DIV {PR_D_DEN}L"
            )
        ).cast("long")
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select("node", new_rank.alias("rank"))
            .localCheckpoint()
        )

    obase = OPIC_SCALE // n
    st = nodes.select(
        "node",
        F.lit(obase).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )
    for _ in range(OPIC_ITERS):
        sd = st.join(deg, st["node"] == deg["src"], "left").select(
            "node", "cash", "hist", "deg"
        )
        dangling = int(
            sd.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("cash"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(sd.where(F.col("deg").isNotNull()), e["src"] == sd["node"])
            .select("dst", F.expr("cash DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        st = (
            st.join(contrib, st["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(f"coalesce(c, 0L) + {dangling // n}L").alias("cash"),
                F.expr("hist + cash").alias("hist"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()

    top = (
        r.orderBy(F.col("rank").desc(), "node")
        .limit(FID_TOP_N)
        .withColumn(
            "pr_pos",
            F.row_number().over(
                Window.orderBy(F.col("rank").desc(), "node")
            ),
        )
    )
    j = top.join(st, "node").select(
        "pr_pos", F.expr("hist + cash").alias("imp")
    ).localCheckpoint()
    a, b = j.alias("a"), j.alias("b")
    cnt = (
        a.join(b, F.col("a.pr_pos") < F.col("b.pr_pos"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("a.imp") > F.col("b.imp"), 1).otherwise(0)
            ).alias("concordant"),
            F.sum(
                F.when(F.col("a.imp") < F.col("b.imp"), 1).otherwise(0)
            ).alias("discordant"),
        )
    )
    return cnt.select(
        F.lit(FID_TOP_N).alias("n_top"),
        "n_pairs",
        "concordant",
        "discordant",
        F.expr(
            "CASE WHEN concordant >= discordant "
            "THEN (concordant - discordant) * 1000000L div n_pairs "
            "ELSE -((discordant - concordant) * 1000000L div n_pairs) "
            "END"
        ).alias("tau_a_ppm"),
    )


def _opic_fidelity_sql() -> str:
    """One WITH chain carrying BOTH verified fixpoints (shared
    e/nodes/nn/deg CTEs; iteration CTEs prefixed pr_/op_ to avoid
    collisions), then the top-N panel and the exact pair counts."""
    base = f"({PR_SCALE} // n)"
    obase = f"({OPIC_SCALE} // n)"
    tele = PR_D_DEN - PR_D_NUM
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"pr_r0 AS MATERIALIZED (SELECT node, {base} AS rank FROM nodes, nn)",
    ]
    prev = "pr_r0"
    for it in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr_dang{it} AS (SELECT COALESCE(SUM(rank), 0) AS dangling
  FROM {prev} r LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""pr_c{it} AS MATERIALIZED (
  SELECT e.dst, SUM(r.rank // deg.deg) AS c
  FROM e JOIN {prev} r ON e.src = r.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""pr_r{it} AS MATERIALIZED (
  SELECT nodes.node,
         ({tele} * {base}) // {PR_D_DEN}
         + ((COALESCE(pr_c{it}.c, 0) + dangling // n) * {PR_D_NUM})
           // {PR_D_DEN} AS rank
  FROM nodes CROSS JOIN nn CROSS JOIN pr_dang{it}
  LEFT JOIN pr_c{it} ON nodes.node = pr_c{it}.dst)"""
        )
        prev = f"pr_r{it}"
    pr_fin = prev
    ctes.append(
        f"op_s0 AS MATERIALIZED (SELECT node, {obase} AS cash, 0 AS hist "
        "FROM nodes, nn)"
    )
    prev = "op_s0"
    for it in range(1, OPIC_ITERS + 1):
        ctes.append(
            f"""op_dang{it} AS (SELECT COALESCE(SUM(cash), 0) AS dangling
  FROM {prev} s LEFT JOIN deg ON s.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""op_c{it} AS MATERIALIZED (
  SELECT e.dst, SUM(s.cash // deg.deg) AS c
  FROM e JOIN {prev} s ON e.src = s.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""op_s{it} AS MATERIALIZED (
  SELECT {prev}.node,
         COALESCE(op_c{it}.c, 0) + dangling // n AS cash,
         {prev}.hist + {prev}.cash AS hist
  FROM {prev} CROSS JOIN nn CROSS JOIN op_dang{it}
  LEFT JOIN op_c{it} ON {prev}.node = op_c{it}.dst)"""
        )
        prev = f"op_s{it}"
    op_fin = prev
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
top AS MATERIALIZED (
  SELECT node,
         ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS pr_pos
  FROM {pr_fin} ORDER BY rank DESC, node LIMIT {FID_TOP_N}),
j AS MATERIALIZED (
  SELECT t.pr_pos, s.hist + s.cash AS imp
  FROM top t JOIN {op_fin} s ON t.node = s.node),
cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN a.imp > b.imp THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN a.imp < b.imp THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant
  FROM j a JOIN j b ON a.pr_pos < b.pr_pos)
SELECT {FID_TOP_N} AS n_top, n_pairs, concordant, discordant,
       CASE WHEN concordant >= discordant
            THEN (concordant - discordant) * 1000000 // n_pairs
            ELSE -((discordant - concordant) * 1000000 // n_pairs)
       END AS tau_a_ppm
FROM cnt
"""
    )


G_OPIC_FID_SQL = _opic_fidelity_sql()


def p_robots_decision(spark, sf_dir):
    """RFC 9309 robots decision as a relational fold — the
    falsifiable twin of operators/robots.py's codegen gate
    (robots_gate: longest matching pattern wins, allow wins length
    ties, no match = allowed; the reference queues anything,
    crawler.js has no robots support — robots is the cluster-side
    extension the north star names). Urls are the o_url_traps minting
    (host from source, calendar/session/page paths); every host
    carries Disallow /cal/ + the longer Allow /cal/202 (the
    longest-match override: 2020s calendars re-allowed), and
    even-numbered hosts also Disallow /s/. Patterns here are pure
    prefixes (the RFC core case), so the match is startswith — no
    regex dialect in the cross-engine surface. The per-url verdict is
    an integer argmax: score = 2×len(pattern) + allow, max score's
    low bit IS the decision (allow beats disallow at equal length,
    longer always beats shorter) — no struct comparison semantics to
    align across engines. Output: per host, urls / blocked /
    blocked-share in exact BIGINT ppm.

    100 TB posture: the rule table is O(hosts × 3) and joins the url
    stream on the host key (broadcast in deployment — robots_gate
    ships it as one array cell per domain); candidate matches ≤ 3 per
    url; one hash(doc_id) argmax aggregate + one hash(host) rollup."""
    d = _t(spark, sf_dir, "documents")
    branch = F.expr("(doc_id div 20) % 5")
    path = (
        F.when(
            branch == 0,
            F.concat(
                F.lit("/cal/"),
                (F.col("doc_id") % 40 + 2000).cast("string"),
                F.lit("/"),
                (F.col("doc_id") % 12 + 1).cast("string"),
            ),
        )
        .when(
            branch == 1,
            F.concat(
                F.lit("/s/"),
                F.substring(
                    F.md5(F.concat(F.lit("sid:"), F.col("doc_id").cast("string"))),
                    1,
                    12,
                ),
            ),
        )
        .otherwise(
            F.concat(F.lit("/page/"), (F.col("doc_id") % 97).cast("string"))
        )
    )
    urls = d.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.test")).alias("host"),
        path.alias("path"),
    )
    hosts = urls.select("host").distinct()
    rules = (
        hosts.select(
            "host",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("/cal/").alias("pattern"),
                        F.lit(False).alias("allow"),
                    ),
                    F.struct(
                        F.lit("/cal/202").alias("pattern"),
                        F.lit(True).alias("allow"),
                    ),
                    F.struct(
                        F.lit("/s/").alias("pattern"),
                        F.lit(False).alias("allow"),
                    ),
                )
            ).alias("r"),
        )
        .select("host", "r.pattern", "r.allow")
        .where(
            (F.col("pattern") != "/s/")
            | (
                F.regexp_extract("host", "src([0-9]+)", 1).cast("int") % 2
                == 0
            )
        )
    )
    matches = urls.join(F.broadcast(rules), "host").where(
        F.expr("substr(path, 1, length(pattern)) = pattern")
    )
    best = matches.groupBy("doc_id").agg(
        F.max(
            F.expr("2 * length(pattern) + if(allow, 1, 0)")
        ).alias("score")
    )
    verdict = urls.join(best, "doc_id", "left").select(
        "host",
        F.expr("coalesce(score % 2 = 1, true)").alias("allowed"),
    )
    return (
        verdict.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0)).alias(
                "n_blocked"
            ),
        )
        .select(
            "host",
            "n_urls",
            "n_blocked",
            F.expr("n_blocked * 1000000L div n_urls").alias("blocked_ppm"),
        )
        .orderBy("host")
    )


P_ROBOTS_SQL = """
WITH urls AS (
  SELECT doc_id, source || '.example.test' AS host,
         CASE (doc_id // 20) % 5
           WHEN 0 THEN '/cal/' || CAST(doc_id % 40 + 2000 AS VARCHAR)
                    || '/' || CAST(doc_id % 12 + 1 AS VARCHAR)
           WHEN 1 THEN '/s/' || substr(md5('sid:' || CAST(doc_id AS VARCHAR)), 1, 12)
           ELSE '/page/' || CAST(doc_id % 97 AS VARCHAR)
         END AS path
  FROM documents),
hosts AS (SELECT DISTINCT host FROM urls),
rules AS (
  SELECT host, r.pattern, r.allow
  FROM hosts, (VALUES ('/cal/', FALSE), ('/cal/202', TRUE), ('/s/', FALSE))
       AS r(pattern, allow)
  WHERE r.pattern <> '/s/'
     OR CAST(regexp_extract(host, 'src([0-9]+)', 1) AS INTEGER) % 2 = 0),
matches AS (
  SELECT u.doc_id,
         2 * length(r.pattern) + CASE WHEN r.allow THEN 1 ELSE 0 END AS score
  FROM urls u JOIN rules r
    ON u.host = r.host AND substr(u.path, 1, length(r.pattern)) = r.pattern),
best AS (SELECT doc_id, MAX(score) AS score FROM matches GROUP BY doc_id),
verdict AS (
  SELECT u.host, COALESCE(b.score % 2 = 1, TRUE) AS allowed
  FROM urls u LEFT JOIN best b ON u.doc_id = b.doc_id)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(COUNT(*) AS BIGINT) AS blocked_ppm
FROM verdict GROUP BY host ORDER BY host
"""


ROI_BATCHES = 10


def o_crawl_roi(spark, sf_dir):
    """Crawl ROI / novelty-per-byte curve — the economics behind
    t_vocab_growth's Heaps curve, in the units an operator budgets
    with: per ingestion batch (doc-id deciles — the crawl's arrival
    order), how many NEW vocabulary words did a million characters of
    fetched text buy? A declining new_words_per_mchar across batches
    is quantified diminishing returns: the number that says when to
    stop recrawling a source and spend the fetch budget on fresh
    seeds instead (the widen-seeds signal, priced). The vocabulary
    domain is word-3-gram SHINGLES, not words — the synthetic ~30-word
    vocabulary exhausts in the first decile and the curve degenerates
    to one spike (the same reason sk_bloom_fp_audit keys on shingles);
    shingles keep discovering through the whole corpus, so the decline
    is measurable. First occurrence per shingle is one min aggregate
    (the exact-dedup shuffle shape); batch assignment is pure integer
    arithmetic off the corpus count (a 1-row crossJoin); all ratios
    exact BIGINT.

    100 TB posture: one distinct + one min(shingle) aggregate + two
    tiny batch rollups — the t_vocab_growth cost profile with a
    per-batch byte denominator.

    Measured at sf0.01: 165,898 → 67,825 new shingles per Mchar
    across the ten deciles — a clean 2.4× decline, the diminishing-
    returns curve in one table."""
    d = _t(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs_total"))
    db = d.crossJoin(n).select(
        "doc_id",
        "n_chars",
        F.expr(f"doc_id * {ROI_BATCHES}L div n_docs_total").alias("batch"),
    )
    grams = _shingles_from(d).select(
        "doc_id", F.col("shingle").alias("g")
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    nw = (
        first.crossJoin(n)
        .select(
            F.expr(f"first_doc * {ROI_BATCHES}L div n_docs_total").alias(
                "batch"
            )
        )
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    per = db.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    return (
        per.join(nw, "batch", "left")
        .select(
            "batch",
            "n_docs",
            "chars",
            F.expr("coalesce(new_words, 0L)").alias("new_words"),
            F.expr(
                "coalesce(new_words, 0L) * 1000000L div chars"
            ).alias("new_words_per_mchar"),
        )
        .orderBy("batch")
    )


O_ROI_SQL = f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_total FROM documents),
db AS (SELECT doc_id, n_chars,
              doc_id * {ROI_BATCHES} // n_docs_total AS batch
       FROM documents CROSS JOIN n),
{_SHINGLES_CTE},
first AS (SELECT shingle AS g, MIN(doc_id) AS first_doc FROM shingles
          GROUP BY shingle),
nw AS (SELECT first_doc * {ROI_BATCHES} // n_docs_total AS batch,
              CAST(COUNT(*) AS BIGINT) AS new_words
       FROM first CROSS JOIN n GROUP BY 1),
per AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM db GROUP BY batch)
SELECT per.batch, n_docs, chars,
       COALESCE(new_words, 0) AS new_words,
       COALESCE(new_words, 0) * 1000000 // chars AS new_words_per_mchar
FROM per LEFT JOIN nw ON per.batch = nw.batch
ORDER BY per.batch
"""


def o_schedule_fairness(spark, sf_dir):
    """Jain's fairness index over per-host scheduled load (Jain, Chiu
    & Hawe, DEC-TR-301 1984 — THE scheduling-fairness scalar:
    J = (Σx)²/(n·Σx²) ∈ (0,1], 1 = perfectly even, 1/n = one host
    owns everything; the politeness scheduler's report card, and the
    complement of o_key_skew's HHI — HHI prices the join-side
    hot-key risk, Jain prices the schedule's starvation risk). Exact
    BIGINT moments with DIVIDE-FIRST ppm ((Σx)² div ((n·Σx²) div
    10⁶)) so the identity survives corpus sizes where
    multiply-by-10⁶-first would overflow BIGINT (the
    g_effective_diameter lesson).

    100 TB posture: one hash(host) count aggregate + one scalar
    moment rollup — two shuffles at any frontier size."""
    l = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    per = l.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n").alias("total"),
        F.sum(F.expr("n * n")).alias("sum_sq"),
    ).select(
        "n_hosts",
        "total",
        "sum_sq",
        F.expr(
            "(total * total) div greatest((n_hosts * sum_sq) div 1000000L, 1L)"
        ).alias("fairness_ppm"),
    )


O_FAIRNESS_SQL = """
WITH per AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_suppkey),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(n * n) AS BIGINT) AS sum_sq
  FROM per)
SELECT n_hosts, total, sum_sq,
       (total * total) // GREATEST((n_hosts * sum_sq) // 1000000, 1)
         AS fairness_ppm
FROM agg
"""


BUDGET_SWEEP = (2, 4, 8, 16)


def o_budget_sweep(spark, sf_dir):
    """Politeness-budget capacity curve — the sweep o_crawl_makespan
    is one point of (the planning question is never "what is the
    makespan" but "what budget buys what makespan": doubling a
    uniform per-host budget halves drain time ONLY until the heaviest
    host stops being the binding constraint, and the flattening point
    of this curve is the budget past which more politeness allowance
    buys nothing). Per swept uniform budget: the makespan (max over
    hosts of ceil(pending/budget)), the host count still at the
    binding maximum, and the speedup vs the smallest budget in exact
    BIGINT ppm.

    100 TB posture: ONE hash(host) count aggregate feeds the whole
    sweep — each budget adds only integer ceil-division columns in
    the same scalar rollup; output is |sweep| rows at any frontier
    size."""
    l = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    per = l.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_urls"))
    crit = per.agg(
        *[
            F.max(F.expr(f"(n_urls + {b} - 1) div {b}")).alias(f"m{b}")
            for b in BUDGET_SWEEP
        ]
    )
    crit_counts = per.crossJoin(F.broadcast(crit)).agg(
        *[
            F.sum(
                F.expr(f"if((n_urls + {b} - 1) div {b} = m{b}, 1L, 0L)")
            ).alias(f"c{b}")
            for b in BUDGET_SWEEP
        ]
    )
    b0 = BUDGET_SWEEP[0]
    row = crit.crossJoin(crit_counts)
    return (
        row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("budget"),
                            F.col(f"m{b}").alias("makespan_rounds"),
                            F.col(f"c{b}").alias("n_critical_hosts"),
                        )
                        for b in BUDGET_SWEEP
                    ]
                )
            ).alias("s"),
            F.col(f"m{b0}").alias("_mk0"),
        )
        .select(
            F.col("s.budget").alias("budget"),
            F.col("s.makespan_rounds").alias("makespan_rounds"),
            F.col("s.n_critical_hosts").alias("n_critical_hosts"),
            F.expr(
                "_mk0 * 1000000L div s.makespan_rounds"
            ).alias("speedup_ppm"),
        )
        .orderBy("budget")
    )


def _budget_sweep_sql() -> str:
    mk_cols = ", ".join(
        f"MAX((n_urls + {b} - 1) // {b}) AS mk{b}" for b in BUDGET_SWEEP
    )
    c_cols = ", ".join(
        f"CAST(SUM(CASE WHEN (n_urls + {b} - 1) // {b} = mk{b} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS c{b}"
        for b in BUDGET_SWEEP
    )
    b0 = BUDGET_SWEEP[0]
    unpivot = "\nUNION ALL ".join(
        f"SELECT {b} AS budget, mk{b} AS makespan_rounds, "
        f"c{b} AS n_critical_hosts, "
        f"mk{b0} * 1000000 // mk{b} AS speedup_ppm FROM row"
        for b in BUDGET_SWEEP
    )
    return f"""
WITH per AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM lineitem GROUP BY l_suppkey),
mk AS (SELECT {mk_cols} FROM per),
cc AS (SELECT {c_cols} FROM per CROSS JOIN mk),
row AS (SELECT * FROM mk CROSS JOIN cc)
SELECT budget, makespan_rounds, n_critical_hosts, speedup_ppm
FROM ({unpivot})
ORDER BY budget
"""


O_BUDGET_SWEEP_SQL = _budget_sweep_sql()


def w_burstiness(spark, sf_dir):
    """Per-host traffic burstiness via the Fano factor (index of
    dispersion, variance/mean of per-hour event counts — Barabási
    Nature 2005 showed human-driven request streams are bursty, F ≫
    1, not Poisson, F = 1; a crawl scheduler sizes token buckets and
    politeness windows off exactly this number, because a host whose
    traffic arrives in bursts needs burst capacity, not a higher
    average rate). Hour bins over the GLOBAL observed span (zero
    hours count — dispersion over only the nonzero bins would
    understate burstiness); all moments exact BIGINT, and the factor
    itself is the integer identity F·10⁶ = (n·Σx² − (Σx)²)·10⁶ div
    (n·Σx) — Poisson reads 10⁶, bursty reads above it. No float
    anywhere.

    100 TB posture: one hash(host, hour) aggregate (output ≤ hosts ×
    horizon-hours), one hash(host) moment rollup, a 1-row global-span
    crossJoin; same two-shuffle profile at any event volume."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias(
            "host"
        ),
        F.expr(f"timestampdiff(HOUR, {epoch}, ts)").alias("hr"),
    )
    span = ev.agg(
        F.expr("max(hr) - min(hr) + 1").alias("n_hours")
    )
    bins = ev.groupBy("host", "hr").agg(F.count(F.lit(1)).alias("cnt"))
    mom = bins.groupBy("host").agg(
        F.sum("cnt").alias("sx"),
        F.sum(F.expr("cnt * cnt")).alias("sxx"),
        F.count(F.lit(1)).alias("nonzero_hours"),
    )
    return (
        mom.crossJoin(span)
        .select(
            "host",
            F.col("sx").alias("n_events"),
            "n_hours",
            "nonzero_hours",
            F.expr(
                "(n_hours * sxx - sx * sx) * 1000000L div (n_hours * sx)"
            ).alias("fano_ppm"),
        )
        .orderBy(F.col("fano_ppm").desc(), "host")
    )


W_BURST_SQL = """
WITH ev AS (
  SELECT 'h' || CAST(user_id % 25 AS VARCHAR) AS host,
         epoch_us(ts) // 3600000000 AS hr
  FROM events),
span AS (SELECT MAX(hr) - MIN(hr) + 1 AS n_hours FROM ev),
bins AS (SELECT host, hr, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM ev GROUP BY host, hr),
mom AS (SELECT host, CAST(SUM(cnt) AS BIGINT) AS sx,
               CAST(SUM(cnt * cnt) AS BIGINT) AS sxx,
               CAST(COUNT(*) AS BIGINT) AS nonzero_hours
        FROM bins GROUP BY host)
SELECT host, sx AS n_events, n_hours, nonzero_hours,
       (n_hours * sxx - sx * sx) * 1000000 // (n_hours * sx) AS fano_ppm
FROM mom CROSS JOIN span
ORDER BY fano_ppm DESC, host
"""


WARCGAP_DROP_MOD = 97  # synthetic loss: every 97th record missing
WARCGAP_TOP_K = 12


def o_warc_gaps(spark, sf_dir):
    """Archive-batch completeness audit — the check an ingestion
    pipeline runs against a WARC/CDX manifest before trusting a batch
    (sources/warc.py's export manifests carry per-file record counts;
    this is the record-level sequel: WHICH id ranges are missing, so
    the re-fetch is targeted instead of whole-batch). The record-id
    stream deliberately loses every ``WARCGAP_DROP_MOD``-th id (a
    deterministic stand-in for dropped fetch tasks); gap ranges fall
    out of one lead() pass over the surviving ids — a gap is any
    adjacent pair with a hole between them, reported as (gap_start,
    gap_end, width) plus the global completeness in exact BIGINT ppm
    on every row (expected = max_id − min_id + 1 over the observed
    span). Top-K widest gaps, then earliest-first.

    100 TB posture: successor pairs come from a lead() PARTITIONED by
    id-range bucket (parallel at any cardinality) plus a boundary
    stitch over the ≤P-row bucket-edge frame — the only global
    window in the plan runs on that tiny frame, never on the id
    stream; the scalar span/count reduce is order-free; top-K is
    TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events").select("event_id")
    kept = ev.where(F.expr(f"event_id % {WARCGAP_DROP_MOD} != 0"))
    # id-range buckets: successor pairs WITHIN a bucket come from a
    # partitioned lead() (parallel), pairs ACROSS bucket boundaries
    # from stitching each bucket's max to the next non-empty bucket's
    # min over the ≤P-row bucket-edge frame — the only global
    # window left runs on that tiny frame, never on the id stream.
    sc_row = kept.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).first()
    n_present = int(sc_row.n_present or 0)
    lo = int(sc_row.lo) if sc_row.lo is not None else 0
    hi = int(sc_row.hi) if sc_row.hi is not None else 0
    span_n = max(hi - lo + 1, 1)
    P = spark.sparkContext.defaultParallelism * 4
    # ceil(span/P): bucket ids strictly inside 0..P-1, so the edge
    # frame is <=P rows (floor-div could mint up to 2P-1 buckets)
    bsize = (span_n + P - 1) // P
    b = kept.withColumn(
        "_bkt", F.expr(f"(event_id - {lo}L) div {bsize}L")
    ).localCheckpoint()
    wloc = Window.partitionBy("_bkt").orderBy("event_id")
    inner = (
        b.withColumn("nxt", F.lead("event_id").over(wloc))
        .where(F.expr("nxt - event_id > 1"))
        .select("event_id", "nxt")
    )
    edges = b.groupBy("_bkt").agg(
        F.min("event_id").alias("bmin"), F.max("event_id").alias("bmax")
    )
    wedge = Window.orderBy("_bkt")
    cross = (
        edges.withColumn("nmin", F.lead("bmin").over(wedge))
        .where(F.expr("nmin - bmax > 1"))
        .select(F.col("bmax").alias("event_id"), F.col("nmin").alias("nxt"))
    )
    gaps = inner.unionByName(cross).select(
        F.expr("event_id + 1").alias("gap_start"),
        F.expr("nxt - 1").alias("gap_end"),
        F.expr("nxt - event_id - 1").alias("width"),
    )
    span = spark.range(1).select(
        F.lit(n_present).alias("n_present"),
        F.lit(hi - lo + 1).cast("long").alias("n_expected"),
        F.lit(n_present * 1000000 // span_n).cast("long").alias(
            "completeness_ppm"
        ),
    )
    return (
        gaps.crossJoin(span)
        .select(
            "gap_start",
            "gap_end",
            "width",
            "n_present",
            "n_expected",
            "completeness_ppm",
        )
        .orderBy(F.col("width").desc(), "gap_start")
        .limit(WARCGAP_TOP_K)
    )


O_WARCGAP_SQL = f"""
WITH kept AS (
  SELECT event_id FROM events WHERE event_id % {WARCGAP_DROP_MOD} <> 0),
gaps AS (
  SELECT event_id + 1 AS gap_start, nxt - 1 AS gap_end,
         nxt - event_id - 1 AS width
  FROM (SELECT event_id, LEAD(event_id) OVER (ORDER BY event_id) AS nxt
        FROM kept)
  WHERE nxt - event_id > 1),
span AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
         MAX(event_id) - MIN(event_id) + 1 AS n_expected,
         CAST(COUNT(*) AS BIGINT) * 1000000
           // (MAX(event_id) - MIN(event_id) + 1) AS completeness_ppm
  FROM kept)
SELECT gap_start, gap_end, width, n_present, n_expected, completeness_ppm
FROM gaps CROSS JOIN span
ORDER BY width DESC, gap_start
LIMIT {WARCGAP_TOP_K}
"""


def w_gap_percentiles(spark, sf_dir):
    """Per-host inter-fetch gap tail — the latency-style percentile
    read of the same gap stream o_politeness_audit thresholds (SRE
    doctrine: minima and means hide the tail; a host whose p95 gap
    is huge is STARVING under the schedule even when its min gap
    violates nothing, and starving hosts are where crawl freshness
    quietly dies). Exact percentiles by counting, no approximation:
    per host the gaps sort once (row_number over (gap, tie-break))
    and p50/p95 are the values at ceil(q·n) — deterministic to the
    row because the tie-break is total. Output per host: gap count,
    p50/p95/max gap in integer seconds.

    100 TB posture: ONE hash(host) Exchange carries the lag window,
    the rank window, and the final aggregate (all host-prefixed
    keys — partitioning reuse); per-host state is bounded by that
    host's events, never global."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias(
            "host"
        ),
        F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("host").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            "host",
            F.expr("(us - prev_us) div 1000000").alias("gap_s"),
            "event_id",
        )
    )
    wr = Window.partitionBy("host").orderBy("gap_s", "event_id")
    wc = Window.partitionBy("host")
    ranked = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    return (
        ranked.groupBy("host")
        .agg(
            F.max("n").alias("n_gaps"),
            F.min(
                F.when(F.expr("rn * 100 >= n * 50"), F.col("gap_s"))
            ).alias("p50_gap_s"),
            F.min(
                F.when(F.expr("rn * 100 >= n * 95"), F.col("gap_s"))
            ).alias("p95_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("host")
    )


W_GAP_PCT_SQL = """
WITH ev AS (
  SELECT 'h' || CAST(user_id % 25 AS VARCHAR) AS host,
         epoch_us(ts) AS us, event_id
  FROM events),
gaps AS (
  SELECT host, (us - prev_us) // 1000000 AS gap_s, event_id
  FROM (SELECT host, us, event_id,
               LAG(us) OVER (PARTITION BY host ORDER BY us, event_id)
                 AS prev_us
        FROM ev)
  WHERE prev_us IS NOT NULL),
ranked AS (
  SELECT host, gap_s,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY gap_s, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY host) AS n
  FROM gaps)
SELECT host, CAST(MAX(n) AS BIGINT) AS n_gaps,
       MIN(CASE WHEN rn * 100 >= n * 50 THEN gap_s END) AS p50_gap_s,
       MIN(CASE WHEN rn * 100 >= n * 95 THEN gap_s END) AS p95_gap_s,
       MAX(gap_s) AS max_gap_s
FROM ranked GROUP BY host ORDER BY host
"""


ERRSTREAK_TOP_K = 10


def w_error_streaks(spark, sf_dir):
    """Consecutive-error streak detection per host — the classic
    gaps-and-islands fold (the one relational shape the query set
    didn't have yet): a host that errors in long RUNS needs a circuit
    breaker, not rate-halving — the adaptive backoff
    (operators/politeness.py's error-halving, exercised by
    tests/test_backoff.py) reacts to per-round error RATE, and this
    is the complementary sequential signal (the reference's retry
    ladder, crawler.js:499-516, sees only per-url attempt counts —
    a host-level streak is invisible to it). Islands via the
    two-row_number difference: rn over (host) minus rn over
    (host, is_error), both ordered (ts, event_id), is constant
    exactly within a run of equal is_error — error runs group by
    that difference. Output: top-K hosts by longest streak, with
    total errors, fetch count, and streak count.

    100 TB posture: the event stream is shuffled ONCE on host — both
    row_number windows and the downstream aggregates reuse the
    hash(host) partitioning (the windows' (host, is_error) keys are
    prefixed by host, so no second Exchange); islands and summaries
    are hash aggregates; top-K is TakeOrderedAndProject."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias(
            "host"
        ),
        F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)").alias("us"),
        "event_id",
        (F.col("event_type") == "error").alias("is_err"),
    )
    w_all = Window.partitionBy("host").orderBy("us", "event_id")
    w_err = Window.partitionBy("host", "is_err").orderBy("us", "event_id")
    marked = ev.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_err)
    )
    streaks = (
        marked.where("is_err")
        .groupBy("host", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    per_host = ev.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.when(F.col("is_err"), 1).otherwise(0)).alias("n_errors"),
    )
    summary = streaks.groupBy("host").agg(
        F.max("len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return (
        per_host.join(summary, "host", "left")
        .select(
            "host",
            "n_fetches",
            "n_errors",
            F.expr("coalesce(n_streaks, 0L)").alias("n_streaks"),
            F.expr("coalesce(max_streak, 0L)").alias("max_streak"),
        )
        .orderBy(F.col("max_streak").desc(), "host")
        .limit(ERRSTREAK_TOP_K)
    )


W_ERRSTREAK_SQL = f"""
WITH ev AS (
  SELECT 'h' || CAST(user_id % 25 AS VARCHAR) AS host,
         epoch_us(ts) AS us, event_id,
         event_type = 'error' AS is_err
  FROM events),
marked AS (
  SELECT host, is_err,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY us, event_id)
         - ROW_NUMBER() OVER (PARTITION BY host, is_err
                              ORDER BY us, event_id) AS grp
  FROM ev),
streaks AS (
  SELECT host, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM marked WHERE is_err GROUP BY host, grp),
per_host AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(SUM(CASE WHEN is_err THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM ev GROUP BY host),
summary AS (
  SELECT host, MAX(len) AS max_streak, CAST(COUNT(*) AS BIGINT) AS n_streaks
  FROM streaks GROUP BY host)
SELECT p.host, p.n_fetches, p.n_errors,
       COALESCE(s.n_streaks, 0) AS n_streaks,
       COALESCE(s.max_streak, 0) AS max_streak
FROM per_host p LEFT JOIN summary s ON p.host = s.host
ORDER BY max_streak DESC, p.host
LIMIT {ERRSTREAK_TOP_K}
"""


POLITE_DELAY_S = 600  # audited min inter-fetch gap per host
POLITE_TOP_K = 15


def o_politeness_audit(spark, sf_dir):
    """Politeness-compliance audit over a fetch log — the offline
    verifier for what politeness.py:84-109's crawl_delay scheduler
    promises at plan time (the reference throttles only by worker
    count, crawler.js:23 `workers`; a per-host minimum gap is the
    distributed engine's addition, so it needs an after-the-fact
    audit a crawl operator can run on the emitted schedule). Events
    stand in as the fetch log (host = user_id % 25, ts = fetch time):
    per host, consecutive inter-fetch gaps via one lag window ordered
    (ts, event_id), a violation is any gap < POLITE_DELAY_S, and the
    report ranks the top-K worst hosts by violation count with the
    observed minimum gap and the violation rate in exact BIGINT ppm.

    100 TB posture: ONE hash(host) Exchange serves both the lag
    window and the per-host aggregate (partitioning reuse — the
    o_recrawl_priority shape); gap math is integer epoch-microseconds
    (portable timestampdiff/epoch_us pair), top-K is
    TakeOrderedAndProject. No float, no wall clock."""
    epoch = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias(
            "host"
        ),
        F.expr(f"timestampdiff(MICROSECOND, {epoch}, ts)").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("host").orderBy("us", "event_id")
    gaps = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "gap_us", F.expr("us - prev_us")
    )
    return (
        gaps.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.count("gap_us").alias("n_gaps"),
            F.sum(
                F.when(
                    F.col("gap_us") < POLITE_DELAY_S * 1_000_000, 1
                ).otherwise(0)
            ).alias("n_violations"),
            F.min(F.expr("gap_us div 1000000")).alias("min_gap_s"),
        )
        .select(
            "host",
            "n_fetches",
            "n_violations",
            "min_gap_s",
            F.expr("n_violations * 1000000L div n_gaps").alias(
                "violation_ppm"
            ),
        )
        .orderBy(F.col("n_violations").desc(), "host")
        .limit(POLITE_TOP_K)
    )


O_POLITE_SQL = f"""
WITH ev AS (
  SELECT 'h' || CAST(user_id % 25 AS VARCHAR) AS host,
         epoch_us(ts) AS us, event_id
  FROM events),
gaps AS (
  SELECT host,
         us - LAG(us) OVER (PARTITION BY host ORDER BY us, event_id)
           AS gap_us
  FROM ev)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(CASE WHEN gap_us < {POLITE_DELAY_S * 1_000_000}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       MIN(gap_us // 1000000) AS min_gap_s,
       CAST(SUM(CASE WHEN gap_us < {POLITE_DELAY_S * 1_000_000}
                     THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         // CAST(COUNT(gap_us) AS BIGINT) AS violation_ppm
FROM gaps GROUP BY host
ORDER BY n_violations DESC, host
LIMIT {POLITE_TOP_K}
"""


COCITE_DF_CAP = 15  # drop hub targets with in-degree above this
COCITE_TOP_K = 20


def g_cocitation(spark, sf_dir):
    """Co-citation related-page discovery (Small 1973; Dean &
    Henzinger WWW 1999's Cocitation algorithm — "find pages that
    share many in-link sources with the seed": the classic link-based
    seed-expansion step a crawl planner runs between rounds, and the
    graph-side complement of the content-side d_mirror_sources).
    Two sources are related when they cite the same targets; the
    candidate generator is the inverted-index self-join on the shared
    TARGET key — exactly the shape whose blowup SHINGLE_DF_CAP tames
    for shingles, so the same document-frequency discipline applies
    to the link graph: hub targets with in-degree > COCITE_DF_CAP are
    dropped before the join (a target cited by everyone carries no
    relatedness signal — the stop-shingle of the link world — and is
    the df² key that makes 10^10 pairs at crawl scale). Degrees for
    normalization are counted on the KEPT edge set so the score is
    exact over the capped universe: sq_cosine_ppm =
    n_shared² × 10⁶ div (deg_a × deg_b) — the integer square of the
    cosine similarity between in-link indicator vectors, 10⁶ = the
    pair cites identical target sets.

    100 TB posture: one distinct + one hash(dst) in-degree aggregate,
    a broadcast of nothing (the cap is a semi-join filter), candidate
    pairs bounded by cap²/2 per kept target, one hash(pair) count
    aggregate, TakeOrderedAndProject top-K. Reference scope: the
    crawl loop itself never ranks relatedness (crawler.js keeps a
    flat _urlsCrawled list, crawler.js:22); this is the analytics
    layer a seed curator runs on the crawl's output."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    kept = (
        e.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("in_deg"))
        .where(F.col("in_deg") <= COCITE_DF_CAP)
        .select("dst")
    )
    ek = e.join(F.broadcast(kept), "dst").localCheckpoint()
    deg = ek.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    a = ek.select(F.col("src").alias("src_a"), "dst")
    b = ek.select(F.col("src").alias("src_b"), "dst")
    pairs = (
        a.join(b, "dst")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    da = deg.select(F.col("src").alias("src_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("src_b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(F.broadcast(da), "src_a")
        .join(F.broadcast(db), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "deg_a",
            "deg_b",
            F.expr(
                "n_shared * n_shared * 1000000L div (deg_a * deg_b)"
            ).alias("sq_cosine_ppm"),
        )
        .orderBy(F.col("n_shared").desc(), "src_a", "src_b")
        .limit(COCITE_TOP_K)
    )


G_COCITE_SQL = f"""
WITH e AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
kept AS (
  SELECT dst FROM e GROUP BY dst HAVING COUNT(*) <= {COCITE_DF_CAP}),
ek AS (SELECT e.src, e.dst FROM e JOIN kept ON e.dst = kept.dst),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM ek GROUP BY src),
pairs AS (
  SELECT a.src AS src_a, b.src AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM ek a JOIN ek b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src)
SELECT src_a, src_b, n_shared, da.deg AS deg_a, db.deg AS deg_b,
       n_shared * n_shared * 1000000 // (da.deg * db.deg) AS sq_cosine_ppm
FROM pairs
JOIN deg da ON pairs.src_a = da.src
JOIN deg db ON pairs.src_b = db.src
ORDER BY n_shared DESC, src_a, src_b
LIMIT {COCITE_TOP_K}
"""


def d_detector_venn(spark, sf_dir):
    """Near-dup detector agreement (the ensemble question a dedup
    deployment answers before picking its production detector —
    Henzinger SIGIR 2006 compared exactly these two families on the
    web and found they err on DIFFERENT pairs, which is why serious
    pipelines run both): the Venn split of minhash_near_dup's
    verified pairs (token-set Jaccard ≥ 0.5) against
    simhash_near_dup's (60-bit Hamming ≤ 4). Pairs caught by both are
    safe under either; `minhash_only` pairs are similar SETS with
    diverging term weights (SimHash's sign-sum misses them);
    `simhash_only` pairs share weighted profile but not enough
    distinct shingles. Output per class: pair count and share of the
    union in exact BIGINT ppm.

    100 TB posture: both detectors are their verified banded selves
    (collision-bounded, never n²); the Venn is one full-outer join on
    the pair key + one tiny class rollup.

    Measured at sf0.01: both 20, minhash_only 4, simhash_only 20 —
    only 45% of the union is caught by both, Henzinger's result in
    one table: the two families genuinely see different pairs."""
    m = (
        minhash_near_dup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("in_m", F.lit(1))
    )
    s = (
        simhash_near_dup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("in_s", F.lit(1))
    )
    u = m.join(s, ["doc_a", "doc_b"], "full").select(
        F.when(
            F.col("in_m").isNotNull() & F.col("in_s").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("in_m").isNotNull(), F.lit("minhash_only"))
        .otherwise(F.lit("simhash_only"))
        .alias("detector")
    )
    per = u.groupBy("detector").agg(F.count(F.lit(1)).alias("n_pairs"))
    total = per.agg(F.sum("n_pairs").alias("total_pairs"))
    return (
        per.crossJoin(total)
        .select(
            "detector",
            "n_pairs",
            F.expr("n_pairs * 1000000L div total_pairs").alias(
                "union_share_ppm"
            ),
        )
        .orderBy("detector")
    )


def _detector_venn_sql() -> str:
    return f"""
WITH m AS MATERIALIZED (
  SELECT doc_a, doc_b, 1 AS in_m FROM ({MINHASH_SQL})),
s AS MATERIALIZED (
  SELECT doc_a, doc_b, 1 AS in_s FROM ({SIMHASH_ND_SQL})),
u AS (
  SELECT CASE WHEN in_m IS NOT NULL AND in_s IS NOT NULL THEN 'both'
              WHEN in_m IS NOT NULL THEN 'minhash_only'
              ELSE 'simhash_only' END AS detector
  FROM m FULL JOIN s USING (doc_a, doc_b)),
per AS (SELECT detector, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM u GROUP BY detector),
total AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS total_pairs FROM per)
SELECT detector, n_pairs,
       n_pairs * 1000000 // total_pairs AS union_share_ppm
FROM per CROSS JOIN total
ORDER BY detector
"""


D_DETECTOR_VENN_SQL = _detector_venn_sql()


NORM_TOL_PPM = 1000  # |‖v‖²−1| tolerance for the unit-norm verdict


def sim_norm_audit(spark, sf_dir):
    """Embedding unit-norm audit — the one-row check every vector
    pipeline runs before choosing its similarity kernel: if ‖v‖ = 1
    for every vector then cosine ≡ dot product, and the entire ANN
    family (sim_cosine_topk, the LSH/IVF/PQ rerankers) may drop two
    sqrts and a division per scored pair — at 10^10 pair scorings
    that is the cheapest 3× a similarity pipeline will ever buy
    (FAISS's METRIC_INNER_PRODUCT-on-normalized-vectors doctrine).
    Per vector: ‖v‖² via the shared left-fold, deviation from 1 in
    floored integer ppm; output: corpus size, max deviation, count
    over NORM_TOL_PPM, and the verdict flag.

    100 TB posture: one map-only pass (the fold lives in the scan's
    codegen Project) + one scalar aggregate — no shuffle of vectors
    at all."""
    v = _ivf_v(spark, sf_dir)
    norm2 = _arr_dot(F.col("emb"), F.col("emb"))
    dev = v.select(
        F.floor(F.abs(norm2 - F.lit(1.0)) * 1_000_000)
        .cast("long")
        .alias("dev_ppm")
    )
    return dev.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.max("dev_ppm").alias("max_dev_ppm"),
        F.sum(
            F.when(F.col("dev_ppm") > NORM_TOL_PPM, 1).otherwise(0)
        ).alias("n_over_tol"),
    ).select(
        "n_vecs",
        "max_dev_ppm",
        "n_over_tol",
        F.expr("n_over_tol = 0").alias("dot_fast_path_ok"),
    )


SIM_NORM_SQL = f"""
WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
dev AS (
  SELECT CAST(FLOOR(ABS(({_dot_sql('emb', 'emb')}) - 1.0) * 1000000)
              AS BIGINT) AS dev_ppm
  FROM v),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
         MAX(dev_ppm) AS max_dev_ppm,
         CAST(SUM(CASE WHEN dev_ppm > {NORM_TOL_PPM} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_over_tol
  FROM dev)
SELECT n_vecs, max_dev_ppm, n_over_tol, n_over_tol = 0 AS dot_fast_path_ok
FROM agg
"""


def sim_centroid_drift(spark, sf_dir):
    """Embedding-centroid drift between crawl batches (the dense-space
    twin of o_corpus_drift's length-histogram chi-square: split the
    corpus into two deterministic halves — vec_id parity stands in for
    old/new crawl batch — and measure, per label cluster, how far each
    batch centroid MOVED; a drifting centroid says the newer crawl is
    pulling that topic's embedding mass somewhere else — the
    re-embed / retrain signal a 100 TB pipeline watches between
    snapshots). Per-(label, batch) centroids via decimal(24,10)
    per-dimension sums (exact, reduction-order-independent →
    bit-identical doubles in any engine), then per-label L2 drift and
    centroid cosine with the shared left-fold association.

    Scale: ONE pass, ONE hash(label) aggregate carrying 2×64
    conditional decimal sums (map-side partial combine — the shuffle
    moves K centroid rows, never vectors) and NO join: both batch
    centroids pivot out of the same aggregate row. Same shape at
    10^10 rows."""
    v = _ivf_v(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("vec_id"), F.lit(2)).cast("int")
    )
    dim = LSH_DIM
    is_old, is_new = F.col("batch") == 0, F.col("batch") == 1
    sums = v.groupBy("label").agg(
        F.count(F.when(is_old, F.lit(1))).alias("n_old"),
        F.count(F.when(is_new, F.lit(1))).alias("n_new"),
        *[
            F.sum(
                F.when(is_old, F.col("emb").getItem(i)).cast("decimal(24,10)")
            ).alias(f"a{i}")
            for i in range(dim)
        ],
        *[
            F.sum(
                F.when(is_new, F.col("emb").getItem(i)).cast("decimal(24,10)")
            ).alias(f"b{i}")
            for i in range(dim)
        ],
    )
    j = sums.where((F.col("n_old") > 0) & (F.col("n_new") > 0)).select(
        "label",
        "n_old",
        "n_new",
        F.array(
            *[(F.col(f"a{i}").cast("double") / F.col("n_old")) for i in range(dim)]
        ).alias("c0"),
        F.array(
            *[(F.col(f"b{i}").cast("double") / F.col("n_new")) for i in range(dim)]
        ).alias("c1"),
    )
    d2 = F.aggregate(
        F.zip_with("c0", "c1", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = _arr_dot(F.col("c0"), F.col("c1")) / (
        _arr_norm(F.col("c0")) * _arr_norm(F.col("c1"))
    )
    return (
        j.select(
            "label",
            "n_old",
            "n_new",
            F.floor(F.sqrt(d2) * F.lit(1000000.0)).alias("drift_l2_e6"),
            F.floor(cosine * F.lit(1000000.0)).alias("cent_cosine_e6"),
        )
        .orderBy("label")
    )


def _drift_sql() -> str:
    def csum(cond: str, i: int) -> str:
        return (
            f"CAST(SUM(CASE WHEN {cond} THEN "
            f"CAST(emb[{i + 1}] AS DECIMAL(24,10)) END) AS DOUBLE)"
            f" / COUNT(CASE WHEN {cond} THEN 1 END)"
        )

    a = ", ".join(csum("batch = 0", i) for i in range(LSH_DIM))
    b = ", ".join(csum("batch = 1", i) for i in range(LSH_DIM))
    d2 = " + ".join(
        f"(c0[{i + 1}]-c1[{i + 1}])*(c0[{i + 1}]-c1[{i + 1}])"
        for i in range(LSH_DIM)
    )
    return f"""
WITH v AS (
  SELECT vec_id, label, vec_id % 2 AS batch,
         CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
cents AS (
  SELECT label,
         COUNT(CASE WHEN batch = 0 THEN 1 END) AS n_old,
         COUNT(CASE WHEN batch = 1 THEN 1 END) AS n_new,
         [{a}] AS c0, [{b}] AS c1
  FROM v GROUP BY label)
SELECT label, n_old, n_new,
       CAST(FLOOR(sqrt({d2}) * 1000000.0) AS BIGINT) AS drift_l2_e6,
       CAST(FLOOR(({_dot_sql('c0', 'c1')})
             / (sqrt({_dot_sql('c0', 'c0')})
                * sqrt({_dot_sql('c1', 'c1')}))
             * 1000000.0) AS BIGINT) AS cent_cosine_e6
FROM cents
WHERE n_old > 0 AND n_new > 0
ORDER BY label
"""


SIM_DRIFT_SQL = _drift_sql()


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

T_FILTER_AGREE_SQL = _filter_agreement_sql()
SK_HLL_MERGE_SQL = _hll_merge_sql()
SK_CMS_MERGE_SQL = _cms_merge_sql()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ------------------------------------------------------------------
    # Registry order is DELIBERATE: the correctness driver gates the
    # FIRST 50 entries each round.  Round-5 window: the 4 continuity
    # sentinels (q1/q3 + the p_props_json/t_sample_stratified canary
    # pair for the driver hasher), the 11 remaining r4 hash-red rows
    # (all 15 carried HUGEINT-typed oracle outputs — judge-adjudicated
    # root cause, CAST AS BIGINT applied this round), and 35 first-time
    # entries from the never-driver-tested pool (all 10 not-yet-rotated
    # HUGEINT-pool oracles, the ANN PQ/IVF-PQ family, the crawl-ops
    # audits, then family-diverse fill).  Entries past slot 50 stay
    # covered by the strict local gate replica (scripts/gatecheck.py,
    # 3 SFs), which now also asserts no oracle emits HUGEINT.
    # ------------------------------------------------------------------
    # -- round-5 driver window: sentinels (4) --
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "p_props_json": p_props_json,
    "t_sample_stratified": t_sample_stratified,
    # -- round-5 driver window: the r4 hash-red set, re-gated (11) --
    "g_pagerank_fixedpoint": g_pagerank_fixedpoint,
    "g_hits_fixedpoint": g_hits_fixedpoint,
    "g_trustrank": g_trustrank,
    "g_opic": g_opic,
    "sk_hist_quantiles": sk_hist_quantiles,
    "t_line_dedup": t_line_dedup,
    "t_bpe_merges": t_bpe_merges,
    "t_bpe_encode": t_bpe_encode,
    "t_pack_sequences": t_pack_sequences,
    "o_key_skew": o_key_skew,
    "t_inverted_index": t_inverted_index,
    # -- round-5 driver window: first-time driver coverage (35) --
    "t_corpus_mix": t_corpus_mix,
    "a_pivot_source_lang": a_pivot_source_lang,
    "w_running_totals": w_running_totals,
    "t_domain_prior": t_domain_prior,
    "t_sampling_temperature": t_sampling_temperature,
    "t_zipf_surprisal": t_zipf_surprisal,
    "t_boilerplate": t_boilerplate,
    "sim_ann_pq_topk": sim_ann_pq_topk,
    "sim_ann_ivfpq_topk": sim_ann_ivfpq_topk,
    "t_dsir_importance": t_dsir_importance,
    "sim_ann_pq_recall": sim_ann_pq_recall,
    "sim_ann_ivfpq_recall": sim_ann_ivfpq_recall,
    "sim_ann_ivfpq_nprobe": sim_ann_ivfpq_nprobe,
    "o_corpus_drift": o_corpus_drift,
    "o_shard_balance": o_shard_balance,
    "o_crawl_roi": o_crawl_roi,
    "o_budget_sweep": o_budget_sweep,
    "o_schedule_fairness": o_schedule_fairness,
    "t_sample_weighted": t_sample_weighted,
    "j_range_bucketed": j_range_bucketed,
    "a_anchor_rollup": a_anchor_rollup,
    "t_pii_scrub": t_pii_scrub,
    "t_collocations_pmi": t_collocations_pmi,
    "t_quality_classifier": t_quality_classifier,
    "t_ccnet_perplexity": t_ccnet_perplexity,
    "d_edit_distance_pairs": d_edit_distance_pairs,
    "sim_jl_projection": sim_jl_projection,
    "w_watermark_lag": w_watermark_lag,
    "sim_matryoshka_overlap": sim_matryoshka_overlap,
    "u_snapshot_diff": u_snapshot_diff,
    "g_degree_powerlaw": g_degree_powerlaw,
    "g_cocitation": g_cocitation,
    "minhash_banding_sweep": minhash_banding_sweep,
    "t_gopher_rules": t_gopher_rules,
    "dedup_semantic_sweep": dedup_semantic_sweep,
    # -- past the window: never driver-tested (r6 rotation pool) --
    "sim_centroid_drift": sim_centroid_drift,
    "g_degree_assortativity": g_degree_assortativity,
    "g_host_contraction": g_host_contraction,
    "w_error_streaks": w_error_streaks,
    "d_cluster_size_histogram": d_cluster_size_histogram,
    "sim_ivf_cell_stats": sim_ivf_cell_stats,
    "j_bloom_join": j_bloom_join,
    "w_burstiness": w_burstiness,
    "d_dup_locality": d_dup_locality,
    "t_lang_id_confusion": t_lang_id_confusion,
    "g_attack_tolerance": g_attack_tolerance,
    "g_opic_fidelity": g_opic_fidelity,
    "d_detector_venn": d_detector_venn,
    "t_filter_agreement": t_filter_agreement,
    "sim_norm_audit": sim_norm_audit,
    "d_dedup_quality_shift": d_dedup_quality_shift,
    "t_filter_length_bias": t_filter_length_bias,
    "w_gap_percentiles": w_gap_percentiles,
    "t_vocab_overlap_langs": t_vocab_overlap_langs,
    "g_clustering_by_degree": g_clustering_by_degree,
    "d_shingle_df_spectrum": d_shingle_df_spectrum,
    "g_frontier_growth": g_frontier_growth,
    # -- past the window: driver-green in r1-r4 --
    "g_bfs_depth": g_bfs_depth,
    "g_triangle_counts": g_triangle_counts,
    "g_kcore_peel": g_kcore_peel,
    "g_components_twostar": g_components_twostar,
    "g_harmonic_hyperball": g_harmonic_hyperball,
    "g_bowtie_classes": g_bowtie_classes,
    "g_clustering_coeff": g_clustering_coeff,
    "g_effective_diameter": g_effective_diameter,
    "sk_kmv_distinct": sk_kmv_distinct,
    "sk_hll_distinct": sk_hll_distinct,
    "sk_cms_heavy": sk_cms_heavy,
    "sk_kmv_merge": sk_kmv_merge,
    "sk_hll_merge": sk_hll_merge,
    "sk_cms_merge": sk_cms_merge,
    "sk_bloom_fp_audit": sk_bloom_fp_audit,
    "d_prefix_filter_pairs": d_prefix_filter_pairs,
    "d_containment_pairs": d_containment_pairs,
    "d_incremental_minhash": d_incremental_minhash,
    "d_surt_dup": d_surt_dup,
    "d_param_wash": d_param_wash,
    "d_mirror_sources": d_mirror_sources,
    "d_cdc_chunks": d_cdc_chunks,
    "t_winnowing": t_winnowing,
    "dedup_keeper_policy": dedup_keeper_policy,
    "t_vocab_growth": t_vocab_growth,
    "o_warc_gaps": o_warc_gaps,
    "o_url_traps": o_url_traps,
    "o_recrawl_priority": o_recrawl_priority,
    "p_pld_extract": p_pld_extract,
    "p_robots_decision": p_robots_decision,
    "o_politeness_audit": o_politeness_audit,
    "o_crawl_makespan": o_crawl_makespan,
    "t_bm25_search": t_bm25_search,
    "t_rrf_fusion": t_rrf_fusion,
    "j_asof_join": j_asof_join,
    "q5_region_supplier_rollup": q5_region_supplier_rollup,
    "p_part_type_stats": p_part_type_stats,
    "f_filter_gates": f_filter_gates,
    "f_exclude_rlike": f_exclude_rlike,
    "p_mime_normalize": p_mime_normalize,
    "p_fragment_strip": p_fragment_strip,
    "s_status_prefix": s_status_prefix,
    "j_anti_join_seen": j_anti_join_seen,
    "j_left_outer_fetch": j_left_outer_fetch,
    "d_first_wins": d_first_wins,
    "u_union_frontier": u_union_frontier,
    "o_domain_budget": o_domain_budget,
    "o_global_seq": o_global_seq,
    "a_latest_snapshot": a_latest_snapshot,
    "t_token_stats": t_token_stats,
    "t_quality_score": t_quality_score,
    "t_lang_id": t_lang_id,
    "t_fingerprint": t_fingerprint,
    "t_repetition_filter": t_repetition_filter,
    "d_exact_dedup": d_exact_dedup,
    "sim_cosine_topk": sim_cosine_topk,
    "sim_label_centroid_norm": sim_label_centroid_norm,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "sim_ann_lsh_pairs": sim_ann_lsh_pairs,
    "sim_ann_lsh_recall": sim_ann_lsh_recall,
    "sim_ann_ivf_topk": sim_ann_ivf_topk,
    "sim_ann_ivf_recall": sim_ann_ivf_recall,
    "minhash_near_dup": minhash_near_dup,
    "dedup_clusters": dedup_clusters,
    "pipeline_curate": pipeline_curate,
    "minhash_recall": minhash_recall,
    "simhash_fingerprint": simhash_fingerprint,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "w_event_hourly": w_event_hourly,
    "w_user_sessions": w_user_sessions,
    "t_decontaminate": t_decontaminate,
    "a_rollup_counts": a_rollup_counts,
    "w_value_delta": w_value_delta,
    "t_length_quantiles": t_length_quantiles,
    "d_substring_dup": d_substring_dup,
    "t_blocklist_wash": t_blocklist_wash,
    "t_tfidf_topterms": t_tfidf_topterms,
    "w_funnel": w_funnel,
    "dedup_semantic": dedup_semantic,
    "w_retention_cohorts": w_retention_cohorts,
    "simhash_near_dup": simhash_near_dup,
}

ORACLES: dict[str, str] = {
    # ------------------------------------------------------------------
    # Registry order is DELIBERATE: the correctness driver gates the
    # FIRST 50 entries each round.  Round-5 window: the 4 continuity
    # sentinels (q1/q3 + the p_props_json/t_sample_stratified canary
    # pair for the driver hasher), the 11 remaining r4 hash-red rows
    # (all 15 carried HUGEINT-typed oracle outputs — judge-adjudicated
    # root cause, CAST AS BIGINT applied this round), and 35 first-time
    # entries from the never-driver-tested pool (all 10 not-yet-rotated
    # HUGEINT-pool oracles, the ANN PQ/IVF-PQ family, the crawl-ops
    # audits, then family-diverse fill).  Entries past slot 50 stay
    # covered by the strict local gate replica (scripts/gatecheck.py,
    # 3 SFs), which now also asserts no oracle emits HUGEINT.
    # ------------------------------------------------------------------
    # -- round-5 driver window: sentinels (4) --
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "p_props_json": P_PROPS_JSON_SQL,
    "t_sample_stratified": T_SAMPLE_SQL,
    # -- round-5 driver window: the r4 hash-red set, re-gated (11) --
    "g_pagerank_fixedpoint": G_PAGERANK_SQL,
    "g_hits_fixedpoint": G_HITS_SQL,
    "g_trustrank": G_TRUSTRANK_SQL,
    "g_opic": G_OPIC_SQL,
    "sk_hist_quantiles": SK_HISTQ_SQL,
    "t_line_dedup": T_LINE_DEDUP_SQL,
    "t_bpe_merges": T_BPE_SQL,
    "t_bpe_encode": T_BPE_ENCODE_SQL,
    "t_pack_sequences": T_PACK_SQL,
    "o_key_skew": O_SKEW_SQL,
    "t_inverted_index": T_INVIDX_SQL,
    # -- round-5 driver window: first-time driver coverage (35) --
    "t_corpus_mix": T_CORPUS_MIX_SQL,
    "a_pivot_source_lang": A_PIVOT_SQL,
    "w_running_totals": W_RUNNING_SQL,
    "t_domain_prior": T_DOMAIN_PRIOR_SQL,
    "t_sampling_temperature": T_TEMPERATURE_SQL,
    "t_zipf_surprisal": T_SURPRISAL_SQL,
    "t_boilerplate": T_BOILER_SQL,
    "sim_ann_pq_topk": SIM_PQ_SQL,
    "sim_ann_ivfpq_topk": SIM_IVFPQ_SQL,
    "t_dsir_importance": T_DSIR_SQL,
    "sim_ann_pq_recall": SIM_PQ_RECALL_SQL,
    "sim_ann_ivfpq_recall": SIM_IVFPQ_RECALL_SQL,
    "sim_ann_ivfpq_nprobe": SIM_IVFPQ_NPROBE_SQL,
    "o_corpus_drift": O_DRIFT_SQL,
    "o_shard_balance": O_SHARD_SQL,
    "o_crawl_roi": O_ROI_SQL,
    "o_budget_sweep": O_BUDGET_SWEEP_SQL,
    "o_schedule_fairness": O_FAIRNESS_SQL,
    "t_sample_weighted": T_SAMPLE_WEIGHTED_SQL,
    "j_range_bucketed": J_RANGE_SQL,
    "a_anchor_rollup": A_ANCHOR_SQL,
    "t_pii_scrub": T_PII_SQL,
    "t_collocations_pmi": T_PMI_SQL,
    "t_quality_classifier": T_QCLF_SQL,
    "t_ccnet_perplexity": T_CCNET_PPL_SQL,
    "d_edit_distance_pairs": D_EDIT_SQL,
    "sim_jl_projection": SIM_JL_SQL,
    "w_watermark_lag": W_WATERMARK_SQL,
    "sim_matryoshka_overlap": SIM_MRL_SQL,
    "u_snapshot_diff": U_SNAPSHOT_SQL,
    "g_degree_powerlaw": G_DEGREE_SQL,
    "g_cocitation": G_COCITE_SQL,
    "minhash_banding_sweep": MH_SWEEP_SQL,
    "t_gopher_rules": T_GOPHER_SQL,
    "dedup_semantic_sweep": DEDUP_SEMANTIC_SWEEP_SQL,
    # -- past the window: never driver-tested (r6 rotation pool) --
    "sim_centroid_drift": SIM_DRIFT_SQL,
    "g_degree_assortativity": G_ASSORT_SQL,
    "g_host_contraction": G_HOSTG_SQL,
    "w_error_streaks": W_ERRSTREAK_SQL,
    "d_cluster_size_histogram": D_CLUSTER_HIST_SQL,
    "sim_ivf_cell_stats": SIM_IVF_CELL_STATS_SQL,
    "j_bloom_join": J_BLOOM_JOIN_SQL,
    "w_burstiness": W_BURST_SQL,
    "d_dup_locality": D_DUP_LOCALITY_SQL,
    "t_lang_id_confusion": T_LANG_CONF_SQL,
    "g_attack_tolerance": G_ATTACK_SQL,
    "g_opic_fidelity": G_OPIC_FID_SQL,
    "d_detector_venn": D_DETECTOR_VENN_SQL,
    "t_filter_agreement": T_FILTER_AGREE_SQL,
    "sim_norm_audit": SIM_NORM_SQL,
    "d_dedup_quality_shift": D_DEDUP_QUALITY_SQL,
    "t_filter_length_bias": T_FILTER_LEN_SQL,
    "w_gap_percentiles": W_GAP_PCT_SQL,
    "t_vocab_overlap_langs": T_VOCAB_OVERLAP_SQL,
    "g_clustering_by_degree": G_CLUST_BY_DEG_SQL,
    "d_shingle_df_spectrum": D_DF_SPECTRUM_SQL,
    "g_frontier_growth": G_FRONTIER_GROWTH_SQL,
    # -- past the window: driver-green in r1-r4 --
    "g_bfs_depth": G_BFS_SQL,
    "g_triangle_counts": G_TRI_SQL,
    "g_kcore_peel": G_KCORE_SQL,
    "g_components_twostar": G_TWOSTAR_SQL,
    "g_harmonic_hyperball": G_HYPERBALL_SQL,
    "g_bowtie_classes": G_BOWTIE_SQL,
    "g_clustering_coeff": G_CLUST_SQL,
    "g_effective_diameter": G_EFFDIAM_SQL,
    "sk_kmv_distinct": SK_KMV_SQL,
    "sk_hll_distinct": SK_HLL_SQL,
    "sk_cms_heavy": SK_CMS_SQL,
    "sk_kmv_merge": SK_KMV_MERGE_SQL,
    "sk_hll_merge": SK_HLL_MERGE_SQL,
    "sk_cms_merge": SK_CMS_MERGE_SQL,
    "sk_bloom_fp_audit": SK_BLOOM_SQL,
    "d_prefix_filter_pairs": D_PPJOIN_SQL,
    "d_containment_pairs": D_CONTAIN_SQL,
    "d_incremental_minhash": D_INCR_MINHASH_SQL,
    "d_surt_dup": D_SURT_SQL,
    "d_param_wash": D_PARAM_WASH_SQL,
    "d_mirror_sources": D_MIRROR_SQL,
    "d_cdc_chunks": D_CDC_SQL,
    "t_winnowing": T_WINNOW_SQL,
    "dedup_keeper_policy": DEDUP_KEEPER_SQL,
    "t_vocab_growth": T_VOCAB_SQL,
    "o_warc_gaps": O_WARCGAP_SQL,
    "o_url_traps": O_TRAPS_SQL,
    "o_recrawl_priority": O_RECRAWL_SQL,
    "p_pld_extract": P_PLD_SQL,
    "p_robots_decision": P_ROBOTS_SQL,
    "o_politeness_audit": O_POLITE_SQL,
    "o_crawl_makespan": O_MAKESPAN_SQL,
    "t_bm25_search": T_BM25_SQL,
    "t_rrf_fusion": T_RRF_SQL,
    "j_asof_join": J_ASOF_SQL,
    "q5_region_supplier_rollup": Q5_SQL,
    "p_part_type_stats": P_PART_SQL,
    "f_filter_gates": F_FILTER_SQL,
    "f_exclude_rlike": F_EXCLUDE_SQL,
    "p_mime_normalize": P_MIME_SQL,
    "p_fragment_strip": P_FRAG_SQL,
    "s_status_prefix": S_STATUS_SQL,
    "j_anti_join_seen": J_ANTI_SQL,
    "j_left_outer_fetch": J_LEFT_SQL,
    "d_first_wins": D_FIRST_SQL,
    "u_union_frontier": U_UNION_SQL,
    "o_domain_budget": O_BUDGET_SQL,
    "o_global_seq": O_SEQ_SQL,
    "a_latest_snapshot": A_LATEST_SQL,
    "t_token_stats": T_TOKENS_SQL,
    "t_quality_score": T_QUALITY_SQL,
    "t_lang_id": T_LANG_SQL,
    "t_fingerprint": T_FP_SQL,
    "t_repetition_filter": T_REPETITION_SQL,
    "d_exact_dedup": D_EXACT_SQL,
    "sim_cosine_topk": SIM_TOPK_SQL,
    "sim_label_centroid_norm": SIM_CENTROID_SQL,
    "dedup_embedding_cosine": DEDUP_EMB_SQL,
    "sim_ann_lsh_pairs": SIM_LSH_SQL,
    "sim_ann_lsh_recall": SIM_LSH_RECALL_SQL,
    "sim_ann_ivf_topk": SIM_IVF_SQL,
    "sim_ann_ivf_recall": SIM_IVF_RECALL_SQL,
    "minhash_near_dup": MINHASH_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "pipeline_curate": PIPELINE_CURATE_SQL,
    "minhash_recall": MINHASH_RECALL_SQL,
    "simhash_fingerprint": SIMHASH_SQL,
    "ngram_jaccard_pairs": NGRAM_SQL,
    "w_event_hourly": W_EVENT_HOURLY_SQL,
    "w_user_sessions": W_USER_SESSIONS_SQL,
    "t_decontaminate": T_DECONTAM_SQL,
    "a_rollup_counts": A_ROLLUP_SQL,
    "w_value_delta": W_VALUE_DELTA_SQL,
    "t_length_quantiles": T_LEN_QUANTILES_SQL,
    "d_substring_dup": D_SUBSTR_SQL,
    "t_blocklist_wash": T_BLOCKLIST_SQL,
    "t_tfidf_topterms": T_TFIDF_SQL,
    "w_funnel": W_FUNNEL_SQL,
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "w_retention_cohorts": W_RETENTION_SQL,
    "simhash_near_dup": SIMHASH_ND_SQL,
}
