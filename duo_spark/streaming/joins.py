"""Watermarked stream-stream join: live span↔log correlation.

The batch engine correlates spans with their logs after the fact
(operators/traces.py `correlate_span_logs`, reference semantics at
`duo/src/web/services.rs` trace-log fetch); a live pipeline has both
sides arriving continuously, and neither can wait for the other to
"finish". Structured Streaming's stream-stream equi-join with an
event-time range condition is the engine-native answer: each side
buffers only until the OTHER side's watermark passes the end of the
range, so state is bounded by lateness + range width, not stream
length.

Scale shape: state is hash-partitioned on the join key (trace_id —
uniform by construction); the range condition is what lets the state
store evict, so the tighter the correlation window, the smaller the
state. Without it, an inner stream-stream join would buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_span_log_join(
    spans: DataFrame,
    logs: DataFrame,
    key: str = "trace_id",
    span_time: str = "start_ts",
    log_time: str = "time_ts",
    window: str = "120 days",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join a span stream with a log stream on ``key``, keeping
    logs whose event time falls in [span start, span start +
    ``window``] — the streaming counterpart of the batch span↔log
    correlation.

    Both inputs must be streaming DataFrames with TIMESTAMP event-time
    columns (``span_time`` / ``log_time``). ``watermark`` bounds
    event-time disorder on both sides; together with the range
    condition it lets the state store drop a buffered span once the
    log-side watermark passes ``span start + window`` (and vice
    versa). Log columns that collide with span columns are suffixed
    ``_log``.
    """
    s = spans.withWatermark(span_time, watermark)
    taken = set(spans.columns)
    renames = {
        c: (f"{c}_log" if c in taken and c != key else c)
        for c in logs.columns
    }
    l_time = renames[log_time]
    left = s.alias("s")
    right = (
        logs.select([F.col(c).alias(renames[c]) for c in logs.columns])
        .withWatermark(l_time, watermark)
        .alias("l")
    )
    cond = (
        (F.col(f"s.{key}") == F.col(f"l.{key}"))
        & (F.col(f"l.{l_time}") >= F.col(f"s.{span_time}"))
        & (F.col(f"l.{l_time}") <= F.col(f"s.{span_time}") + F.expr(f"INTERVAL {window}"))
    )
    return left.join(right, cond, "inner").drop(F.col(f"l.{key}"))


def streaming_enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a streaming DataFrame with a batch
    dimension table — the streaming counterpart of the batch process
    enrichment (operators/traces.py enrich_process; reference joins
    spans to their Process at render time, `duo/src/web/services.rs`).

    Spark broadcasts the static side into every micro-batch, so the
    stream never shuffles and the dimension is re-read per trigger
    (a dimension UPDATE is picked up on the next batch — unlike a
    broadcast variable, which would freeze it). Keep the dimension
    small or pre-filtered: it is scanned per micro-batch.
    """
    return stream.join(F.broadcast(dim), on, how)
