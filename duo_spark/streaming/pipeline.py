"""Streaming ingest wiring (SURVEY §2.9 T1-T3/T5, §3.4).

Reference pipeline (duo/src/grpc/server.rs:27-121): gRPC record_span /
record_event -> in-memory buffers -> 1 s aggregation tick -> 10 s
Arrow-IPC WAL -> 60 s minute-partitioned parquet flush; --memory-mode
skips both persistence timers (duo/src/main.rs:60-63).

Spark-first restatement: a file-drop directory stands in for the gRPC
socket (S6 — any streaming source slots in here; the contract is just
"rows in SPAN/LOG schema"), the micro-batch trigger is T1, the
checkpoint's write-ahead state replaces the hand-rolled WAL (T2 —
recovery semantics come from the runtime, not custom code), the
partitioned-parquet streaming sink is T3, and memory mode swaps the
sink for an in-memory table. Span completion (T4) runs as a stateful
stage between source and sink.

At scale: the source directory listing shards across executors, state
is hash-partitioned by span id, and the sink writes one file per
partition dir per micro-batch — the same layout the batch store
(sources/store.py) reads, so hot streaming output and cold compacted
history union transparently.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from duo_spark.schemas import LOG_CORE_SCHEMA, SPAN_SCHEMA
from duo_spark.sources.store import BLOOM_EXPECTED_NDV, with_partition_cols
from duo_spark.streaming.state import DEFAULT_TTL_MS, complete_spans

#: scratch root for checkpoints / replay staging (kept inside the repo
#: tree; gitignored)
SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp")


def _scratch(*parts: str) -> str:
    path = os.path.join(SCRATCH_ROOT, *parts)
    os.makedirs(path, exist_ok=True)
    return path


def prune_scratch(max_age_s: float = 6 * 3600) -> int:
    """Delete scratch subtrees older than ``max_age_s`` (round 8):
    every staged-stream gate query and store test leaves its run dir
    under SCRATCH_ROOT, and across rounds that accumulated 76 GB and
    filled the disk. Age-gated so concurrent runs are never touched;
    returns the number of subtrees removed. Called by bench.py and
    the test session setup — any long-lived entry point."""
    import shutil
    import time

    if not os.path.isdir(SCRATCH_ROOT):
        return 0
    cutoff = time.time() - max_age_s
    removed = 0
    for family in os.listdir(SCRATCH_ROOT):
        fam_dir = os.path.join(SCRATCH_ROOT, family)
        if not os.path.isdir(fam_dir):
            continue
        for run in os.listdir(fam_dir):
            run_dir = os.path.join(fam_dir, run)
            try:
                if os.path.getmtime(run_dir) < cutoff:
                    shutil.rmtree(run_dir, ignore_errors=True)
                    removed += 1
            except OSError:
                continue
    return removed


def span_record_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S6 stand-in: parquet-file-drop source of raw span records.
    ``max_files_per_trigger`` caps each micro-batch's file intake —
    the ingest-tick batch size knob (and what splits an availableNow
    drain into multiple measurable micro-batches)."""
    reader = spark.readStream.schema(SPAN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def staged_log_schema(spark: SparkSession, source_dir: str):
    """The merged schema of the staged log files: LOG_CORE_SCHEMA plus
    every user-field column the ingest bridge has flattened so far
    (ingest_server._normalize_log), types widened across files by
    logschema.merge_schemas.

    This is the reference's startup schema load (duo/src/schema.rs:
    48-76: read the persisted evolved log schema, else the default)
    re-expressed for Structured Streaming, whose source schema is
    fixed at query start: footers are cheap driver-side metadata reads
    (one per staged file, no Spark job), and a field first observed
    AFTER the query starts becomes visible on the next pipeline
    (re)start — the same boundary the reference has across server
    restarts."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from duo_spark.sources.logschema import merge_schemas

    schema = LOG_CORE_SCHEMA
    if os.path.isdir(source_dir):
        for name in sorted(os.listdir(source_dir)):
            if name.endswith(".parquet"):
                pa_schema = pq.read_schema(os.path.join(source_dir, name))
                schema = merge_schemas(schema, from_arrow_schema(pa_schema))
    return schema


def log_record_stream(
    spark: SparkSession, source_dir: str, schema=None
) -> DataFrame:
    return spark.readStream.schema(schema or LOG_CORE_SCHEMA).parquet(source_dir)


def start_span_pipeline(
    spark: SparkSession,
    source_dir: str,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_seconds: int = 60,
    ttl_ms: int | None = DEFAULT_TTL_MS,
    memory_mode: bool = False,
    memory_table: str = "hot_spans",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    engine: str = "fast",
    open_max_age_us: int | None = None,
):
    """T1+T3+T4(+T5) — the full span ingest job; returns the
    StreamingQuery.

    ``engine`` picks the completion formulation (round 8 — VERDICT r7
    #4 flipped the default):

    - ``"fast"`` (default): the JVM-side foreachBatch partial-merge
      (streaming/merge.py) — measured ~36× the stateful path's
      throughput at sf0.1 (SCALING.md probe 13). Completed spans land
      as an exactly-once versioned delta log under ``out_dir``
      (``completed/v=N`` — each version internally in the K1
      date=/hour=/minute= + bloom layout, so partition pruning and
      bloom skipping still apply); read with ``merge.read_completed``,
      fold small files with ``merge.compact_completed``. State GC is
      ``open_max_age_us`` (deterministic EVENT-time age-out);
      ``ttl_ms`` does not apply — per-record processing-time TTL is a
      stateful-path semantic.
    - ``"stateful"``: the per-event applyInPandasWithState operator
      (streaming/state.py) with per-record wall-clock ``ttl_ms`` and
      the ``intact`` flag, writing directly into the flat K1 store
      layout. Opt into this when those per-record semantics matter
      more than throughput.

    Shared knobs:

    - ``trigger_seconds=60`` mirrors the reference's partition-flush
      cadence (duo/src/grpc/server.rs:92); the 1 s aggregation tick is
      subsumed — completion state updates every micro-batch.
    - ``memory_mode=True`` (T5) serves completed spans from an
      in-memory table named ``memory_table`` and never touches the
      data dir (duo/src/main.rs:60-63: "Never persist data in memory
      mode"; the fast engine keeps its working state in the gitignored
      scratch dir — the moral equivalent of the reference's in-memory
      buffers, wiped with the session).
    - ``available_now=True`` drains everything currently in the source
      and stops — the deterministic batch-replay mode used by tests
      and the correctness gate. Stateful TTL is forced off in this
      mode: a ProcessingTimeTimeout keeps the micro-batch loop alive
      to fire future timeouts, so a drain-and-stop run would never
      terminate.
    """
    if engine == "fast":
        return _start_fast_span_pipeline(
            spark,
            source_dir,
            out_dir=out_dir,
            checkpoint_dir=checkpoint_dir,
            trigger_seconds=trigger_seconds,
            memory_mode=memory_mode,
            memory_table=memory_table,
            available_now=available_now,
            max_files_per_trigger=max_files_per_trigger,
            open_max_age_us=open_max_age_us,
        )
    if engine != "stateful":
        raise ValueError(f"engine must be 'fast' or 'stateful', got {engine!r}")
    if available_now:
        ttl_ms = None
    completed = complete_spans(
        span_record_stream(spark, source_dir, max_files_per_trigger),
        ttl_ms=ttl_ms,
    )
    if not memory_mode:
        assert out_dir is not None, "out_dir required unless memory_mode"
        # K1 layout: date=/hour=/minute= + trace_id bloom filter —
        # identical to the batch PartitionedStore writer, so
        # HotColdTable reads it
        completed = with_partition_cols(completed, "start", "minute")
    writer = completed.writeStream.option(
        "checkpointLocation", checkpoint_dir or _scratch("ckpt", uuid.uuid4().hex)
    ).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    if memory_mode:
        return writer.format("memory").queryName(memory_table).start()
    return (
        writer.format("parquet")
        .option("path", out_dir)
        .option("parquet.bloom.filter.enabled#trace_id", "true")
        .option(
            "parquet.bloom.filter.expected.ndv#trace_id",
            str(BLOOM_EXPECTED_NDV),
        )
        .partitionBy("date", "hour", "minute")
        .start()
    )


def completed_span_schema():
    """Schema of fast-engine completed spans: the partial-merge fields
    (SPAN_SCHEMA scalars) + resolved ``tags`` json string."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("trace_id", T.LongType(), True),
            T.StructField("parent_id", T.LongType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("process_id", T.StringType(), True),
            T.StructField("start", T.LongType(), True),
            T.StructField("end", T.LongType(), True),
            T.StructField("tags", T.StringType(), True),
        ]
    )


def _start_fast_span_pipeline(
    spark: SparkSession,
    source_dir: str,
    out_dir: str | None,
    checkpoint_dir: str | None,
    trigger_seconds: int,
    memory_mode: bool,
    memory_table: str,
    available_now: bool,
    max_files_per_trigger: int | None,
    open_max_age_us: int | None,
):
    from duo_spark.streaming.merge import fast_merge_processor, read_completed

    if memory_mode:
        merge_root = _scratch("mem-merge", uuid.uuid4().hex)
        partitioned = False

        def _refresh(_s, _batch_id):
            # register on the OUTER session: foreachBatch hands its
            # processor a cloned session whose temp views the caller
            # never sees
            read_completed(spark, merge_root).createOrReplaceTempView(
                memory_table
            )

        # zero-batch runs (empty source) must still resolve the table
        spark.createDataFrame(
            [], completed_span_schema()
        ).createOrReplaceTempView(memory_table)
        on_batch = _refresh
    else:
        assert out_dir is not None, "out_dir required unless memory_mode"
        merge_root = out_dir
        partitioned = True
        on_batch = None
    processor = fast_merge_processor(
        merge_root,
        open_max_age_us=open_max_age_us,
        partition_completed=partitioned,
        on_batch=on_batch,
    )
    writer = (
        span_record_stream(spark, source_dir, max_files_per_trigger)
        .writeStream.foreachBatch(processor)
        .option(
            "checkpointLocation",
            checkpoint_dir or _scratch("ckpt", uuid.uuid4().hex),
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_log_pipeline(
    spark: SparkSession,
    source_dir: str,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_seconds: int = 60,
    memory_mode: bool = False,
    memory_table: str = "hot_logs",
    available_now: bool = False,
):
    """Log ingest: stateless passthrough (logs need no completion
    merge) into the partitioned sink — T1/T3/T5 for the log table.
    The source schema is the drift-merged one (staged_log_schema), so
    flattened user-field columns flow through to the sink."""
    logs = log_record_stream(spark, source_dir, staged_log_schema(spark, source_dir))
    if not memory_mode:
        assert out_dir is not None, "out_dir required unless memory_mode"
        logs = with_partition_cols(logs, "time", "minute")
    writer = logs.writeStream.option(
        "checkpointLocation", checkpoint_dir or _scratch("ckpt", uuid.uuid4().hex)
    ).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    if memory_mode:
        return writer.format("memory").queryName(memory_table).start()
    return (
        writer.format("parquet")
        .option("path", out_dir)
        .option("parquet.bloom.filter.enabled#trace_id", "true")
        .option(
            "parquet.bloom.filter.expected.ndv#trace_id",
            str(BLOOM_EXPECTED_NDV),
        )
        .partitionBy("date", "hour", "minute")
        .start()
    )


def replay_span_records(
    spark: SparkSession,
    records: DataFrame,
    ttl_ms: int | None = None,
    engine: str = "fast",
) -> DataFrame:
    """Deterministic batch replay THROUGH the real streaming path.

    Stages ``records`` as parquet files, runs the span pipeline in
    memory mode with availableNow, waits for drain, and returns the
    completed spans as a DataFrame. Because the completion merge is
    commutative/associative (min/max/key-wise tag merge), the result
    is independent of how the runtime splits files into micro-batches.
    ``engine`` follows :func:`start_span_pipeline` (default fast;
    ``ttl_ms`` only applies to "stateful", where it defaults to None —
    NoTimeout — because a processing-time timeout would keep the
    availableNow micro-batch loop alive forever waiting to fire, and
    a bounded replay needs no state GC).
    """
    run_id = uuid.uuid4().hex
    src = _scratch("replay", run_id, "in")
    records.write.mode("overwrite").parquet(src)
    table = f"replay_spans_{run_id[:8]}"
    q = start_span_pipeline(
        spark,
        src,
        memory_mode=True,
        memory_table=table,
        available_now=True,
        checkpoint_dir=_scratch("replay", run_id, "ckpt"),
        ttl_ms=ttl_ms,
        engine=engine,
    )
    q.awaitTermination()
    return spark.table(table)
