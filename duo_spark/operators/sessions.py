"""Gap-based sessionization of event streams.

Batch analog of Structured Streaming's session_window (the streaming
pipeline's windowed aggregation lives in streaming/pipeline.py): rows
sharing a key belong to one session while consecutive timestamps are
within ``gap``; a larger silence starts a new session.

Scale shape: ONE hash shuffle on the key with a per-key time sort;
boundaries come from `lag` and session indices from a running sum —
no joins, no repeated passes. Skew equals true key skew (one user's
events land in one partition — the same bound any per-key ordering
semantics requires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_index(
    df: DataFrame, key_col: str, time_col: str, gap: int
) -> DataFrame:
    """Add ``session_idx`` (0-based per key, in time order): a new
    session starts when the silence since the previous event reaches
    ``gap`` (same time unit as ``time_col``). The boundary is
    half-open — delta == gap starts a NEW session — matching
    Structured Streaming's session_window (streaming/sessions.py) and
    Flink session windows, so batch recomputes agree with the
    streaming operator on any record set."""
    w = Window.partitionBy(key_col).orderBy(time_col)
    boundary = (
        F.col(time_col) - F.lag(time_col).over(w) >= F.lit(gap)
    ).cast("long")
    return df.withColumn(
        "session_idx",
        F.sum(F.coalesce(boundary, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame, key_col: str, time_col: str, gap: int
) -> DataFrame:
    """One row per session: (key, session_idx, n_events, start, end,
    duration). The windowed index pass and this aggregate share the
    same key partitioning, so the groupBy reuses the exchange."""
    s = with_session_index(df, key_col, time_col, gap)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("start"),
        F.max(time_col).alias("end"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )
