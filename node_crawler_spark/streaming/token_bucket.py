"""Stateful streaming politeness — the SURVEY §2.9 ``token_bucket``
operator as a real ``applyInPandasWithState`` group-map (the batch
engine enforces budgets relationally in operators/politeness.py; this
is the continuous-ingest variant for a url *stream*, e.g. the seed
inbox of streaming/seeds.py feeding a live fetch tier).

Semantics (deterministic per micro-batch): each domain owns a bucket
of ``capacity`` tokens refilled by ``refill`` per micro-batch. A
batch's urls are admitted in arrival order while tokens last; the
rest are emitted with ``admitted = false`` (the caller re-queues them
— mirroring the batch scheduler's deferred split). State per domain is
two ints — bounded, watermark-free (NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "domain string, url string, admitted boolean, tokens_left int"
STATE_SCHEMA = "tokens int, batches long"


def _domain(col):
    from node_crawler_spark.functions.urlkit import hostport_col

    return hostport_col(col)


def token_bucket_admit(
    urls: DataFrame, capacity: int = 4, refill: int = 4
) -> DataFrame:
    """Apply the stateful bucket to a STREAMING DataFrame with a
    ``url`` column (and optionally ``arrival`` for within-batch
    ordering). Returns the admitted/deferred stream."""

    def bucket(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (domain,) = key
        if state.exists:
            tokens, batches = state.get
            tokens = min(capacity, tokens + refill)
        else:
            tokens, batches = capacity, 0
        for pdf in pdfs:
            if "arrival" in pdf.columns:
                pdf = pdf.sort_values("arrival", kind="stable")
            n = len(pdf)
            admit_n = min(n, max(tokens, 0))
            admitted = [True] * admit_n + [False] * (n - admit_n)
            tokens -= admit_n
            yield pd.DataFrame(
                {
                    "domain": [domain] * n,
                    "url": list(pdf["url"]),
                    "admitted": admitted,
                    "tokens_left": [tokens] * n,
                }
            )
        state.update((tokens, batches + 1))

    with_domain = urls.withColumn("domain", _domain(F.col("url")))
    return with_domain.groupBy("domain").applyInPandasWithState(
        bucket,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_token_bucket(
    spark,
    urls_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    capacity: int = 4,
    refill: int = 4,
    available_now: bool = True,
):
    """File-stream driver: one url per line per file; one file per
    micro-batch (so refill semantics are deterministic in tests)."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(urls_dir)
        .select(F.trim("value").alias("url"))
        .where(F.col("url") != "")
    )
    out = token_bucket_admit(raw, capacity=capacity, refill=refill)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
