"""Top-level engine composition — the duo server's main()
(duo/src/main.rs:40-125), Spark-first.

Boots and owns the full stack:

    IngestServer (TCP, S6)            duo/src/grpc/mod.rs:14-27
      -> staged parquet records
    span/log streaming pipelines      duo/src/grpc/server.rs:27-121
      -> stateful span completion (T4)
      -> partitioned parquet sink (T3) or memory tables (T5)
    PartitionedStore + registries     duo/src/memory.rs, schema.rs
    QueryService                      duo/src/web/mod.rs:72-82

Design note (deviation, documented): the reference triple-buffers —
in-memory Arrow batches + 10 s IPC WAL + 60 s parquet flush — and
serves queries from memory ∪ parquet. Here every micro-batch commits
straight to the checkpointed parquet sink: the checkpoint IS the WAL
(exactly-once replay), freshness is the trigger cadence (seconds, not
60 s), and `PartitionedStore.compact()` absorbs the small-file cost
that cadence implies. One durability mechanism instead of three, and
the query path reads one consistent source. ``memory_mode=True``
reproduces T5 exactly: sinks are in-memory tables, nothing persists
(duo/src/main.rs:60-63).

Batch-replay determinism: ``drain()`` runs the pipelines with
availableNow over everything staged so far and waits — the mode the
tests and the correctness gate use; ``start_pipelines()`` runs them
continuously on a processing-time trigger like the real server.
"""

from __future__ import annotations

import os
import posixpath
import uuid

from pyspark.sql import DataFrame, SparkSession

from duo_spark.ingest import ProcessRegistry
from duo_spark.sources.logschema import LogSchemaRegistry
from duo_spark.sources.store import HotColdTable, PartitionedStore
from duo_spark.streaming.ingest_server import IngestServer
from duo_spark.streaming.pipeline import (
    _scratch,
    start_log_pipeline,
    start_span_pipeline,
)
from duo_spark.web.api import QueryService


class DuoEngine:
    """One data_dir, one engine — ingest, storage, query."""

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        memory_mode: bool = False,
        granularity: str = "minute",
        trigger_seconds: int = 5,
        span_engine: str = "fast",
    ):
        self.spark = spark
        self.data_dir = data_dir
        self.memory_mode = memory_mode
        self.trigger_seconds = trigger_seconds
        #: span completion formulation (round 8 default flip — VERDICT
        #: r7 #4): "fast" = JVM foreachBatch partial-merge writing the
        #: exactly-once versioned delta log (36x throughput, SCALING.md
        #: probe 13); "stateful" = per-event applyInPandasWithState
        #: with wall-clock TTL + intact flag into the flat K1 layout.
        self.span_engine = span_engine
        self.store = PartitionedStore(spark, data_dir, granularity=granularity)
        self.process_registry = ProcessRegistry(self.store)
        self.log_schema_registry = LogSchemaRegistry(self.store)
        run = uuid.uuid4().hex[:8]
        self._mem_spans = f"duo_hot_spans_{run}"
        self._mem_logs = f"duo_hot_logs_{run}"
        self.span_source = posixpath.join(data_dir, "ingest", "span")
        self.log_source = posixpath.join(data_dir, "ingest", "log")
        self._server: IngestServer | None = None
        self._http = None
        self._queries: list = []

    # ------------------------------------------------------- ingest --

    def start_ingest(self, host: str = "127.0.0.1", port: int = 0, tick_seconds: float = 1.0):
        """Start the network ingest bridge (S6). Returns (host, port)."""
        if self._server is not None:
            self._server.stop()
        self._server = IngestServer(
            self.span_source,
            self.log_source,
            registry=self.process_registry,
            host=host,
            port=port,
            tick_seconds=tick_seconds,
        ).start()
        return self._server.address

    def _pipeline_kwargs(self, table: str, mem_table: str, available_now: bool) -> dict:
        if self.memory_mode:
            # Spark's memory sink cannot recover a checkpoint, and T5
            # persists nothing anyway: every run replays the full
            # staging dir into a fresh checkpoint, rebuilding the
            # in-memory table from scratch (duo/src/main.rs:60-63).
            ckpt = _scratch("engine-mem-ckpt", uuid.uuid4().hex)
        else:
            ckpt = posixpath.join(self.data_dir, "checkpoints", table)
        kwargs = dict(
            checkpoint_dir=ckpt,
            available_now=available_now,
            trigger_seconds=self.trigger_seconds,
        )
        if self.memory_mode:
            kwargs.update(memory_mode=True, memory_table=mem_table)
        else:
            kwargs.update(out_dir=self.store.table_path(table))
        if table == "span":
            kwargs.update(engine=self.span_engine)
        return kwargs

    def start_pipelines(self) -> None:
        """Continuous micro-batch ingest (the real server's mode)."""
        self._queries = [
            start_span_pipeline(
                self.spark, self.span_source, **self._pipeline_kwargs("span", self._mem_spans, False)
            ),
            start_log_pipeline(
                self.spark, self.log_source, **self._pipeline_kwargs("log", self._mem_logs, False)
            ),
        ]

    def drain(self) -> None:
        """Process everything staged so far and stop (availableNow) —
        deterministic batch replay for tests/gates. Waits out in-flight
        connections, then flushes the ingest buffers so nothing sits
        below the tick."""
        if self._server is not None:
            self._server.quiesce()
            self._server.flush()
        for source, table, mem in (
            (self.span_source, "span", self._mem_spans),
            (self.log_source, "log", self._mem_logs),
        ):
            if not os.path.isdir(source) or not any(
                f.endswith(".parquet") for f in os.listdir(source)
            ):
                continue
            starter = start_span_pipeline if table == "span" else start_log_pipeline
            q = starter(self.spark, source, **self._pipeline_kwargs(table, mem, True))
            q.awaitTermination()

    # -------------------------------------------------------- query --

    def _table_df(self, table: str, mem_table: str) -> DataFrame:
        if self.memory_mode:
            return self.spark.table(mem_table)
        if table == "span" and self.span_engine == "fast":
            from duo_spark.streaming.merge import read_completed
            from duo_spark.streaming.pipeline import completed_span_schema

            try:
                return read_completed(
                    self.spark, self.store.table_path("span")
                )
            except FileNotFoundError:
                # nothing completed yet — an empty engine is queryable
                return self.spark.createDataFrame(
                    [], completed_span_schema()
                )
        return HotColdTable(self.store, table).df()

    def spans(self) -> DataFrame:
        df = self._table_df("span", self._mem_spans)
        return df.drop("intact") if "intact" in df.columns else df

    def logs(self) -> DataFrame:
        return self._table_df("log", self._mem_logs)

    def query_service(self) -> QueryService:
        """The HTTP-facing facade over the engine's current tables."""
        return QueryService(
            self.spark,
            logs=self.logs(),
            spans=self.spans(),
            processes=self.process_registry.processes(),
        )

    def serve_http(self, host: str = "127.0.0.1", port: int = 0, request_hook=None):
        """Bind the 8 API routes (duo/src/web/mod.rs:72-82) to a real
        HTTP listener over this engine's live tables. Returns
        (host, port); port 0 picks a free one. ``request_hook(path)``
        wraps each request's dispatch (--collect-self tracing)."""
        from duo_spark.web.server import DuoHTTPServer

        if self._http is not None:
            self._http.stop()
        self._http = DuoHTTPServer(
            lambda: self.query_service(), host=host, port=port,
            request_hook=request_hook,
        ).start()
        return self._http.address

    # ---------------------------------------------------- maintenance --

    def compact(self, retain_latest: int = 2) -> None:
        """Fold small files across both tables' layouts (round 8):
        the fast span engine's completed delta log compacts via
        ``merge.compact_completed`` (a 60 s tick writes ~1,440 tiny
        delta dirs/day; the versioned snapshot fold is crash-safe),
        and the log table's minute partitions fold to hour files via
        ``PartitionedStore.compact``. Memory mode has nothing on disk
        to compact. Safe to run while pipelines are live: both folds
        only touch versions/partitions no in-flight batch can rewrite."""
        if self.memory_mode:
            return
        def _exists(table: str) -> bool:
            fs, p = self.store._fs(self.store.table_path(table))
            return fs.exists(p)

        if self.span_engine == "fast":
            from duo_spark.streaming.merge import compact_completed

            # no-ops gracefully when nothing has been ingested yet
            compact_completed(
                self.spark,
                self.store.table_path("span"),
                retain_latest=retain_latest,
            )
        elif _exists("span"):
            self.store.compact("span", to_granularity="hour")
        if _exists("log"):
            self.store.compact("log", to_granularity="hour")

    # --------------------------------------------------------- stop --

    def stop(self) -> None:
        if self._http is not None:
            self._http.stop()
            self._http = None
        if self._server is not None:
            self._server.stop()
            self._server = None
        for q in self._queries:
            q.stop()
        self._queries = []
