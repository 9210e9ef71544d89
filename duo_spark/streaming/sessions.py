"""Streaming gap-sessionization: the session_window analog of the
batch operator (operators/sessions.py), with watermark-driven late-data
handling.

Structured Streaming's `session_window` maintains per-key open
sessions in the state store and emits a session only once the
watermark passes its close (event-time gap semantics identical to the
batch `with_session_index` boundary rule: a new session starts when
the silence REACHES the gap — delta >= gap). State is hash-partitioned by the
grouping key — the same skew bound as the batch window — and the
watermark bounds state size: sessions older than the allowed lateness
are finalized and evicted, so an unbounded stream holds only the open
tail in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-session aggregate over a streaming DataFrame.

    ``time_col`` must be a timestamp column; output rows appear once
    the watermark closes a session (append mode). Mirrors the batch
    session_stats columns so downstream sinks can union hot streaming
    sessions with cold batch recomputes: Spark's raw
    ``session_window.end`` is last-event-time + gap, so the gap is
    subtracted here to yield ``end`` = max event time, exactly the
    batch operator's definition — the two outputs union without any
    per-sink offset arithmetic.
    """
    with_wm = events.withWatermark(time_col, watermark)
    return (
        with_wm.groupBy(
            F.col(key_col),
            F.session_window(F.col(time_col), f"{gap_seconds} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("start"),
            (
                F.col("session_window.end") - F.expr(f"INTERVAL {gap_seconds} SECONDS")
            ).alias("end"),
            "n_events",
        )
    )
