"""Streaming rolling aggregates: the continuous counterpart of
operators/features.py's batch trailing-window features.

A live feature store can't recompute trailing windows per event after
the fact; the standard streaming shape is the hopping (sliding) window
— every event lands in window/slide overlapping buckets, aggregated
incrementally with watermark-bounded state. Spark maintains one state
row per (key, open window); the watermark evicts windows once event
time passes window.end + delay, so state is bounded by
(keys x window/slide x lateness horizon), independent of stream
lifetime — the same contract as streaming/sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_hopping_features(
    stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    window: str = "72 hours",
    slide: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key hopping-window count/sum over an event stream.

    Output: (key, window.start, window.end, n_win, sum_win) — epoch-
    aligned window starts (multiples of ``slide``), each event counted
    in window/slide overlapping windows, exactly Spark's built-in
    `window()` semantics, so a batch engine replays it with pure
    integer bucket arithmetic (see SQL_STREAMING_FEATURES).
    """
    v = F.col(value_col).cast("double")
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col), F.window(time_col, window, slide).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_win"), F.sum(v).alias("sum_win"))
        .select(
            key_col,
            F.col("_w.start").alias("w_start"),
            F.col("_w.end").alias("w_end"),
            "n_win",
            "sum_win",
        )
    )
