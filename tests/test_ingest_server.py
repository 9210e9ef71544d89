"""S6 network ingest bridge: TCP JSON-lines -> staged parquet ->
streaming pipeline, with process registration over the wire."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from duo_spark.ingest import ProcessRegistry
from duo_spark.streaming import replay_span_records, start_span_pipeline
from duo_spark.streaming.ingest_server import IngestClient, IngestServer
from duo_spark.streaming.pipeline import _scratch

BASE = 1_700_000_000_000_000


@pytest.fixture()
def scratch():
    return _scratch("test", uuid.uuid4().hex)


def test_ingest_server_end_to_end(spark, scratch):
    """Client records over a real socket; the staged files feed the
    real streaming pipeline; busy/idle tags arrive humanized and the
    span merge withholds the open-only span."""
    span_dir = os.path.join(scratch, "span_in")
    log_dir = os.path.join(scratch, "log_in")
    registry = ProcessRegistry()
    with IngestServer(span_dir, log_dir, registry=registry, tick_seconds=30) as server:
        host, port = server.address
        client = IngestClient(host, port)
        pid = client.register_process("web", {"host": "h1"})
        assert pid == "web-0"
        assert client.register_process("web") == "web-1"
        client.record_span(
            id=1, parent_id=None, trace_id=9, name="GET /", process_id=pid,
            start=BASE, end=None, tags={"busy": 2500, "note": "x"},
        )
        client.record_span(
            id=1, parent_id=None, trace_id=9, name="GET /", process_id=pid,
            start=BASE, end=BASE + 100, tags=None,
        )
        client.record_span(  # open only -> withheld by completion
            id=2, parent_id=1, trace_id=9, name="child", process_id=pid,
            start=BASE + 5, end=None, tags=None,
        )
        client.record_log(
            process_id=pid, time=BASE + 7, trace_id=9, span_id=1, level=1,
            target="app", file=None, line=None, message=None,
            fields={"message": "boom", "k": "v"},
        )
        client.close()
    # server.stop() flushed; run the REAL pipeline over the staged files
    table = f"net_{uuid.uuid4().hex[:8]}"
    q = start_span_pipeline(
        spark, span_dir, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), available_now=True,
    )
    q.awaitTermination()
    rows = {r.id: r for r in spark.table(table).collect()}
    assert set(rows) == {1}, "open-only span must be withheld"
    assert rows[1].end == BASE + 100
    assert json.loads(rows[1].tags) == {"busy": "2.50ms", "note": "x"}
    # log side: C6 extraction + proto level decode happened at the edge
    logs = spark.read.parquet(log_dir).collect()
    assert len(logs) == 1
    assert logs[0].message == "boom" and logs[0].level == "ERROR"
    assert registry.service_names() == ["web"]


def test_ingest_server_tick_flush_without_stop(spark, scratch):
    """The periodic tick stages files while the server keeps running
    (the reference's 1 s aggregation tick, grpc/server.rs:31-46)."""
    import time

    span_dir = os.path.join(scratch, "span_in")
    log_dir = os.path.join(scratch, "log_in")
    server = IngestServer(span_dir, log_dir, tick_seconds=0.2).start()
    try:
        host, port = server.address
        client = IngestClient(host, port)
        client.record_span(
            id=5, parent_id=None, trace_id=1, name="n", process_id="p-0",
            start=BASE, end=BASE + 1, tags=None,
        )
        client.close()
        deadline = time.time() + 10
        while time.time() < deadline and not any(
            f.endswith(".parquet") for f in os.listdir(span_dir)
        ):
            time.sleep(0.1)
        assert any(f.endswith(".parquet") for f in os.listdir(span_dir))
        merged = replay_span_records(spark, spark.read.parquet(span_dir))
        assert [r.id for r in merged.collect()] == [5]
    finally:
        server.stop()


def test_ingest_server_drops_garbage_lines(scratch):
    """Undecodable frames are dropped, the connection survives, and
    later valid records still land (lenient wire edge)."""
    import socket as pysocket

    span_dir = os.path.join(scratch, "span_in")
    log_dir = os.path.join(scratch, "log_in")
    with IngestServer(span_dir, log_dir, tick_seconds=30) as server:
        host, port = server.address
        s = pysocket.create_connection((host, port))
        s.sendall(b"this is not json\n")
        s.sendall(
            (json.dumps({"kind": "span", "id": 7, "trace_id": 1, "name": "n",
                         "process_id": "p-0", "start": BASE, "end": BASE + 1}) + "\n").encode()
        )
        s.close()
    import pyarrow.parquet as pq

    files = [os.path.join(span_dir, f) for f in os.listdir(span_dir)]
    assert len(files) == 1
    assert pq.read_table(files[0]).to_pydict()["id"] == [7]


def test_log_field_flatten_inference_and_staged_schema(spark, scratch):
    """Structured log fields flatten to typed top-level columns
    (duo/src/arrow.rs:57-92): per-batch inference (bool/int64/float64/
    string, in-batch mixed kinds widen), core-name shadowing guarded,
    non-scalars stored as JSON text — and staged_log_schema merges the
    per-file schemas into the streaming read schema."""
    import pyarrow.parquet as pq

    from duo_spark.streaming.ingest_server import (
        _infer_extra_fields, _normalize_log, _LOG_CORE_KEYS,
    )
    from duo_spark.streaming.pipeline import staged_log_schema

    # normalization: message extraction, flatten, core-shadow guard
    rec = _normalize_log({
        "process_id": "p-0", "time": BASE, "level": "INFO",
        "fields": {"message": "hi", "flag": 1, "ok": True,
                   "level": "shadowed", "obj": {"b": 2, "a": 1}},
    })
    assert rec["message"] == "hi" and rec["flag"] == 1 and rec["ok"] is True
    assert rec["level"] == "INFO"              # core value wins
    assert rec["obj"] == '{"a": 1, "b": 2}'    # non-scalar -> JSON text

    # inference: kinds map + in-batch widening
    import pyarrow as pa
    fields = {f.name: f.type for f in _infer_extra_fields(
        [{"a": 1}, {"a": 2.5}, {"b": True}, {"c": "s"}, {"d": 3}, {"d": "x"}],
        _LOG_CORE_KEYS,
    )}
    assert fields == {"a": pa.float64(), "b": pa.bool_(),
                      "c": pa.string(), "d": pa.string()}

    # two flushes with different field sets -> merged streaming schema
    log_dir = os.path.join(scratch, "log_drift")
    with IngestServer(os.path.join(scratch, "span_drift"), log_dir,
                      tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "a", "user": 7})
        c.close()
        server.quiesce()
        server.flush()
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE + 1, level="WARN",
                     fields={"message": "b", "score": 0.5, "user": 8})
        c.close()
        server.quiesce()
        server.flush()
    files = sorted(os.listdir(log_dir))
    assert len(files) == 2
    assert "user" in pq.read_schema(os.path.join(log_dir, files[0])).names
    merged = staged_log_schema(spark, log_dir)
    by_name = {f.name: f.dataType.simpleString() for f in merged.fields}
    assert by_name["user"] == "bigint" and by_name["score"] == "double"
    # the streaming read under the merged schema sees both files' fields
    from duo_spark.streaming.pipeline import log_record_stream
    name = f"drift_{uuid.uuid4().hex[:8]}"
    q = (log_record_stream(spark, log_dir, merged).writeStream
         .format("memory").queryName(name)
         .option("checkpointLocation", _scratch("ckpt", uuid.uuid4().hex))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r.message: r for r in spark.table(name).collect()}
    assert rows["a"].user == 7 and rows["a"].score is None
    assert rows["b"].user == 8 and rows["b"].score == 0.5


def test_log_field_type_conflict_across_ticks(spark, scratch):
    """A field that drifts int -> string ACROSS ticks must not leave
    conflicting parquet types on disk: the ingest-side evolving schema
    widens to string, conforms the new batch, and rewrites the older
    staged file in place — so the one fixed streaming schema can read
    every file ('Parquet column cannot be converted' regression)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duo_spark.streaming.pipeline import log_record_stream, staged_log_schema

    log_dir = os.path.join(scratch, "log_conflict")
    with IngestServer(os.path.join(scratch, "span_conflict"), log_dir,
                      tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "a", "user": 7})
        c.close()
        server.quiesce()
        server.flush()
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE + 1, level="WARN",
                     fields={"message": "b", "user": "alice"})
        c.close()
        server.quiesce()
        server.flush()
    files = sorted(os.listdir(log_dir))
    assert len(files) == 2
    # BOTH staged files now carry user as string (older file rewritten)
    for f in files:
        sch = pq.read_schema(os.path.join(log_dir, f))
        assert sch.field("user").type == pa.string()
    merged = staged_log_schema(spark, log_dir)
    name = f"conflict_{uuid.uuid4().hex[:8]}"
    q = (log_record_stream(spark, log_dir, merged).writeStream
         .format("memory").queryName(name)
         .option("checkpointLocation", _scratch("ckpt", uuid.uuid4().hex))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r.message: r.user for r in spark.table(name).collect()}
    assert rows == {"a": "7", "b": "alice"}


def test_log_field_type_conflict_survives_restart(scratch):
    """A RESTARTED bridge over a warm staging dir seeds its evolving
    schema from the staged footers, so post-restart drift still widens
    and rewrites (the schema.rs:48-76 startup schema load analog)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(scratch, "log_restart")
    span_dir = os.path.join(scratch, "span_restart")
    with IngestServer(span_dir, log_dir, tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "a", "n": 1})
        c.close()
        server.quiesce()
    # new server instance (restart), field now floats
    with IngestServer(span_dir, log_dir, tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE + 1, level="INFO",
                     fields={"message": "b", "n": 2.5})
        c.close()
        server.quiesce()
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".parquet"):
            assert pq.read_schema(os.path.join(log_dir, f)).field("n").type \
                == pa.float64()


def test_core_collision_mistyped_field_skipped(scratch):
    """A user field named like a typed core column with an incompatible
    value (fields:{"line":"forty"}) must be SKIPPED, not adopted into
    the int32 slot — adoption poisoned from_pydict and killed the tick
    thread; a compatible value still lands."""
    log_dir = os.path.join(scratch, "log_core")
    with IngestServer(os.path.join(scratch, "span_core"), log_dir,
                      tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "bad-line", "line": "forty"})
        c.record_log(process_id="p-0", time=BASE + 1, level="INFO",
                     fields={"message": "good-line", "line": 40})
        c.close()
        server.quiesce()
    import pyarrow.parquet as pq

    files = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
             if f.endswith(".parquet")]
    assert len(files) == 1
    d = pq.read_table(files[0]).to_pydict()
    by_msg = dict(zip(d["message"], d["line"]))
    assert by_msg == {"bad-line": None, "good-line": 40}


def test_tick_thread_survives_flush_failure(scratch, monkeypatch):
    """One failing flush must not kill the tick loop: later ticks keep
    staging (the silent-stall regression from the r6 advice)."""
    import time

    span_dir = os.path.join(scratch, "span_tick")
    server = IngestServer(span_dir, os.path.join(scratch, "log_tick"),
                          tick_seconds=0.1).start()
    try:
        calls = {"n": 0}
        real_flush = IngestServer.flush

        def flaky(self):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("boom")
            real_flush(self)

        monkeypatch.setattr(IngestServer, "flush", flaky)
        host, port = server.address
        c = IngestClient(host, port)
        c.record_span(id=9, parent_id=None, trace_id=1, name="n",
                      process_id="p-0", start=BASE, end=BASE + 1, tags=None)
        c.close()
        server.quiesce()
        deadline = time.time() + 10
        while time.time() < deadline and not any(
            f.endswith(".parquet") for f in os.listdir(span_dir)
        ):
            time.sleep(0.05)
        assert calls["n"] >= 2, "tick thread died after the failing flush"
        assert any(f.endswith(".parquet") for f in os.listdir(span_dir))
    finally:
        monkeypatch.undo()
        server.stop()


def test_core_collision_out_of_range_int_skipped(scratch):
    """Code-review r7: an int of the right Python type but outside the
    core slot's arrow range (fields:{"line": 2**40}) passed the
    isinstance guard and still poisoned from_pydict at flush — range
    must be part of the adoption check."""
    log_dir = os.path.join(scratch, "log_range")
    with IngestServer(os.path.join(scratch, "span_range"), log_dir,
                      tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "huge-line", "line": 1 << 40})
        c.record_log(process_id="p-0", time=BASE + 1, level="INFO",
                     fields={"message": "ok-line", "line": 40})
        c.close()
        server.quiesce()
    import pyarrow.parquet as pq

    files = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
             if f.endswith(".parquet")]
    assert len(files) == 1
    d = pq.read_table(files[0]).to_pydict()
    by_msg = dict(zip(d["message"], d["line"]))
    assert by_msg == {"huge-line": None, "ok-line": 40}


def test_noncore_int_beyond_int64_stored_as_text(scratch):
    """Code-review r7 (second pass): a NON-core int field beyond int64
    (fields:{'retries': 2**70}) made from_pydict raise OverflowError
    and lose the whole buffered batch — unrepresentable ints now land
    as the Utf8 digits fallback, like other non-scalar values."""
    log_dir = os.path.join(scratch, "log_bigint")
    with IngestServer(os.path.join(scratch, "span_bigint"), log_dir,
                      tick_seconds=30) as server:
        host, port = server.address
        c = IngestClient(host, port)
        c.record_log(process_id="p-0", time=BASE, level="INFO",
                     fields={"message": "big", "retries": 1 << 70})
        c.record_log(process_id="p-0", time=BASE + 1, level="INFO",
                     fields={"message": "small", "retries": 3})
        c.close()
        server.quiesce()
    import pyarrow.parquet as pq

    files = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
             if f.endswith(".parquet")]
    assert len(files) == 1  # the batch survived
    d = pq.read_table(files[0]).to_pydict()
    by_msg = dict(zip(d["message"], d["retries"]))
    # int+str values widen the inferred column to Utf8
    assert by_msg == {"big": str(1 << 70), "small": "3"}
