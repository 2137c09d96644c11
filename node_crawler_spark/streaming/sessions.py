"""Streaming sessionization — the streaming face of the batch
``w_user_sessions`` oracle query (gap-based sessions via
``F.session_window``), run over an unbounded event stream with a real
watermark.

Semantics (identical to the batch face, pinned by its DuckDB oracle):
a session is a maximal run of one user's events with < ``gap``
inactivity between neighbours; the session window is
``[first_event, last_event + gap)``. In streaming, session windows
MERGE as events arrive (two open stubs joined by a bridging event
collapse into one state row), and a session is emitted EXACTLY ONCE —
in append mode, when the watermark passes its end. Late events whose
would-be window end is behind the watermark are dropped, never allowed
to reopen an already-emitted session (the correctness property that
makes exactly-once emission possible).

100 TB posture: state is one row per OPEN session per user — bounded
by the watermark horizon, not by history (the same argument as
streaming/dedup.py's dropDuplicatesWithinWatermark); closed sessions
leave the store the moment they are emitted. The groupBy keys on
user_id, so session merging never shuffles more than the user's own
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions_stream(
    events: DataFrame,
    gap: str = "5 minutes",
    allowed_lateness: str = "30 minutes",
) -> DataFrame:
    """events(user_id, ts, …) stream → one row per FINALIZED session:
    (user_id, sess_start, sess_end, n_events). Run in append mode."""
    return (
        events.withWatermark("ts", allowed_lateness)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )
