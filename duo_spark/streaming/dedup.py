"""Streaming exact deduplication: the continuous-ingest counterpart of
operators/dedup.py's batch dedup_exact.

A corpus built from a live feed can't batch-dedup after the fact — the
duplicate has to be dropped on arrival. Structured Streaming's
`dropDuplicatesWithinWatermark` keeps the FIRST arrival of each
content hash and holds the hash in the state store only until the
watermark passes its event time + the delay, so state is bounded by
the duplicate-arrival horizon, not the stream's lifetime — the same
state-vs-lateness contract as the span-completion stage
(streaming/state.py) and the session windows (streaming/sessions.py).

State is hash-partitioned on the content hash: uniform by
construction (md5), so no key skew regardless of how hot any one
document is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duo_spark.operators.dedup import normalize_text


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str,
    time_col: str,
    watermark: str = "10 minutes",
    normalize: bool = True,
) -> DataFrame:
    """Drop rows whose (normalized) content was already seen within
    the watermark horizon; first arrival wins. ``time_col`` must be a
    timestamp column.

    Standard watermark contract applies: a row whose event time has
    already fallen behind the stream's watermark is dropped as late
    data (not emitted at all), so ``watermark`` must cover the
    worst-case event-time disorder of the feed, not just the desired
    duplicate-detection horizon."""
    content = normalize_text(text_col) if normalize else F.col(text_col)
    return (
        stream.withColumn("_h", F.md5(content))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )
