"""Structured-Streaming ingest pipeline (SURVEY §2.9 T1-T5).

The reference is a hand-rolled micro-batch loop
(duo/src/grpc/server.rs:27-121): a 1 s tick drains buffers into memory
batches, a 10 s timer writes an Arrow-IPC WAL, a 60 s timer flushes
minute-partitioned parquet; span records are upsert-merged by a
stateful aggregator (duo/src/aggregator.rs:17-39) that withholds spans
until their close record arrives.

Spark mapping — all of T1-T3's machinery is the Structured Streaming
runtime itself:

  T1 (1 s tick)      -> trigger(processingTime=...) micro-batches
  T2 (10 s WAL)      -> checkpointLocation write-ahead state (built in)
  T3 (60 s parquet)  -> writeStream.partitionBy(date,hour,minute)
  T4 (span merge)    -> DEFAULT (round 8): JVM foreachBatch
                        partial-merge (streaming/merge.py) — one hash
                        aggregate + versioned open-state merge per
                        batch, ~36× the per-event path's throughput
                        (SCALING.md probe 13), deterministic
                        event-time GC. Opt-in engine="stateful":
                        applyInPandasWithState keyed by span id with
                        per-record wall-clock TTL (a deliberate
                        improvement; the reference buffers open spans
                        forever).
  T5 (memory mode)   -> memory-sink query / refreshed temp view,
                        parquet sink skipped
"""

from duo_spark.streaming.pipeline import (
    replay_span_records,
    start_log_pipeline,
    start_span_pipeline,
)
from duo_spark.streaming.rollup import (
    read_rollup,
    streaming_cms_rollup,
    streaming_hll_rollup,
    streaming_moments_rollup,
    streaming_rollup,
)
from duo_spark.streaming.state import complete_spans

__all__ = [
    "complete_spans",
    "read_rollup",
    "replay_span_records",
    "start_log_pipeline",
    "start_span_pipeline",
    "streaming_cms_rollup",
    "streaming_hll_rollup",
    "streaming_moments_rollup",
    "streaming_rollup",
]
