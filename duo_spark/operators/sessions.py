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


def transition_matrix(
    df: DataFrame,
    key_col: str,
    event_col: str,
    time_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every ordered pair of consecutive events within a
    key, (from_event, to_event, n, p) where ``p`` is the row-stochastic
    probability n / Σ n over the same from_event — the navigation /
    user-journey summary a funnel analysis generalizes to, and the
    input to PageRank-style journey models (operators/graph.py).

    ``tiebreak_col`` MUST make the per-key ordering total (e.g. a
    unique event id) — equal timestamps otherwise make `lead`
    nondeterministic and the pair counts engine-dependent.

    Scale: ONE hash shuffle on the key with a per-key time sort feeds
    `lead`; pair counting is a map-side-combined hash aggregate, so
    the shuffle after the window carries at most |event types|² rows;
    the normalizing row sums are a window over that tiny aggregate,
    not over the events. ``p`` is one IEEE divide of exact counts —
    bit-reproducible. Skew equals true key skew, the floor for any
    per-key ordering.
    """
    order = [time_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order])
    pairs = (
        df.select(
            F.col(event_col).alias("from_event"),
            F.lead(event_col).over(w).alias("to_event"),
        )
        .filter(F.col("to_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_event")
    return pairs.select(
        "from_event",
        "to_event",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"), 6
        ).alias("p"),
    )
