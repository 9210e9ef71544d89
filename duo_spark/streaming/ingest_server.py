"""Network ingest bridge (SURVEY §2.1 S6) — the gRPC server's role,
Spark-first.

Reference: a tonic gRPC service with three RPCs — register_process /
record_span / record_event — buffering records and draining them into
the store on a 1 s tick (duo/src/grpc/server.rs:27-46,124-169).

Spark has no "push RPC" source, and a custom receiver would reinvent
what Structured Streaming's file source already guarantees (exactly
-once, replayable, checkpointable). So the bridge is:

    TCP clients --JSON lines--> IngestServer buffers --tick--> staged
    parquet files --> readStream (pipeline.span_record_stream) --> ...

The server is plain driver-side Python (sockets + pyarrow): the hot
path never touches the SparkSession, so ingest keeps accepting while
queries run. Each flush writes ONE parquet file per table — exactly
the reference's aggregation-tick batching (server.rs:31-46) — and the
streaming source picks it up on its next micro-batch. At scale you run
many bridge instances (they share nothing) or swap in Kafka; the
pipeline only ever sees "files of SPAN/LOG-schema rows appearing in a
directory", so the swap is config, not code.

Wire protocol (the duo-subscriber analog, newline-delimited JSON):
    {"kind": "process", "service": "web", "tags": {...}}
        -> responds {"process_id": "web-0"} on the same connection
           (the register_process RPC's return value,
           duo/src/grpc/server.rs:124-142)
    {"kind": "span",  ...SPAN_SCHEMA fields...}      (no response)
    {"kind": "log",   ...LOG_CORE_SCHEMA fields...}  (no response)

Span records run through ingest.normalize_timing_tags semantics
driver-side (busy/idle humanization happens at ingest in the
reference, duo/src/models.rs:106-112); log records get C6 message
extraction from a "fields" map if present.
"""

from __future__ import annotations

import json
import os
import select
import socket
import socketserver
import threading
import time
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from duo_spark.functions import format_timing_py
from duo_spark.ingest import ProcessRegistry

_SPAN_ARROW = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("parent_id", pa.int64()),
        pa.field("trace_id", pa.int64(), nullable=False),
        pa.field("name", pa.string(), nullable=False),
        pa.field("process_id", pa.string(), nullable=False),
        pa.field("start", pa.int64(), nullable=False),
        pa.field("end", pa.int64()),
        pa.field("tags", pa.string()),
    ]
)

_LOG_ARROW = pa.schema(
    [
        pa.field("process_id", pa.string(), nullable=False),
        pa.field("time", pa.int64(), nullable=False),
        pa.field("trace_id", pa.int64()),
        pa.field("span_id", pa.int64()),
        pa.field("level", pa.string(), nullable=False),
        pa.field("target", pa.string()),
        pa.field("file", pa.string()),
        pa.field("line", pa.int32()),
        pa.field("message", pa.string()),
    ]
)

_LEVEL_BY_INT = {1: "ERROR", 2: "WARN", 3: "INFO", 4: "DEBUG", 5: "TRACE"}


def _normalize_span(rec: dict[str, Any]) -> dict[str, Any]:
    """busy/idle µs tags -> human strings at ingest
    (duo/src/models.rs:106-112)."""
    tags = rec.get("tags")
    if isinstance(tags, dict):
        fixed = {}
        for k, v in tags.items():
            if k in ("busy", "idle") and isinstance(v, int) and not isinstance(v, bool):
                fixed[k] = format_timing_py(v)
            else:
                fixed[k] = v
        rec["tags"] = json.dumps(fixed, sort_keys=True)
    return rec


#: core log column names — structured user fields may not shadow these
_LOG_CORE_KEYS = frozenset(f.name for f in _LOG_ARROW)

#: python types a user field must have to be adopted INTO a core slot
#: (a string "line" landing in the int32 column would make
#: Table.from_pydict raise at flush time and kill the tick thread)
_LOG_CORE_PY: dict[str, type | tuple[type, ...]] = {
    f.name: (int if pa.types.is_integer(f.type) else str) for f in _LOG_ARROW
}

#: value range per integer core slot — an int of the right Python type
#: but outside the arrow type's range (fields:{"line": 2**40}) would
#: still poison Table.from_pydict at flush time
_LOG_CORE_RANGE: dict[str, tuple[int, int]] = {
    f.name: (
        (-(1 << 31), (1 << 31) - 1)
        if pa.types.is_int32(f.type)
        else (-(1 << 63), (1 << 63) - 1)
    )
    for f in _LOG_ARROW
    if pa.types.is_integer(f.type)
}


def _normalize_log(rec: dict[str, Any]) -> dict[str, Any]:
    """C6 message extraction + proto int level decode
    (duo/src/models.rs:148-158), then FLATTEN the remaining structured
    fields to top level — the reference stores user fields as real log
    columns with per-batch inferred types merged into the evolving log
    schema (duo/src/arrow.rs:57-92 map.extend + schema merge), which
    is what makes them expr-queryable and lets /api/logs and the
    Jaeger span-log serializer emit them typed.

    Deviation from arrow.rs's blind ``map.extend``: a user field named
    like a core column (``level``, ``time``, …) only lands when the
    core slot is empty — the reference lets it clobber the typed core
    value, which poisons the schema merge (a string "level" field vs
    the Utf8 level column is survivable, but a string "time" vs Int64
    breaks every later read). Non-scalar field values are stored as
    their JSON text (the reference's Utf8 fallback)."""
    fields = rec.pop("fields", None)
    if isinstance(fields, dict) and "message" in fields and rec.get("message") is None:
        rec["message"] = str(fields.pop("message"))
    if isinstance(fields, dict):
        for k, v in fields.items():
            if k in _LOG_CORE_KEYS:
                # adopt into a typed core slot only when the slot is
                # empty AND the value matches the core arrow type —
                # a mistyped value (fields:{"line":"forty"}) would
                # otherwise poison the whole batch at from_pydict
                rng = _LOG_CORE_RANGE.get(k)
                if (
                    rec.get(k) is not None
                    or isinstance(v, bool)
                    or not isinstance(v, _LOG_CORE_PY[k])
                    or (rng is not None and not rng[0] <= v <= rng[1])
                ):
                    continue
            if v is not None and not isinstance(v, (bool, int, float, str)):
                v = json.dumps(v, sort_keys=True)
            if (
                isinstance(v, int)
                and not isinstance(v, bool)
                and not -(1 << 63) <= v < (1 << 63)
            ):
                # beyond int64: pa.Table.from_pydict raises
                # OverflowError and the whole buffered batch would be
                # lost — store the digits as the Utf8 fallback instead
                v = str(v)
            rec[k] = v
    lvl = rec.get("level")
    if isinstance(lvl, int) and not isinstance(lvl, bool):
        rec["level"] = _LEVEL_BY_INT.get(lvl, "DEBUG")
    return rec


def _widen_arrow(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Smallest common arrow type for a cross-TICK field conflict —
    the pyarrow analog of sources/logschema.widen (int64+float64 →
    float64, anything else irreconcilable → string)."""
    if a == b:
        return a
    numeric = {pa.int64(), pa.float64()}
    if a in numeric and b in numeric:
        return pa.float64()
    return pa.string()


def _infer_extra_fields(
    records: list[dict[str, Any]], core: frozenset
) -> list[pa.field]:
    """Arrow fields for the batch's non-core keys — the per-batch
    schema inference of duo/src/arrow.rs:82-88. JSON kinds map
    bool->bool, int->int64, float->float64, str->string; a key that
    mixes kinds within the batch widens (int+float -> float64,
    anything else -> string, values stringified at write). Sorted by
    name so the staged file layout is deterministic."""
    kinds: dict[str, set] = {}
    for r in records:
        for k, v in r.items():
            if k in core or v is None:
                continue
            kinds.setdefault(k, set()).add(
                bool if isinstance(v, bool) else type(v)
            )
    out = []
    for k in sorted(kinds):
        ks = kinds[k]
        if ks == {bool}:
            t = pa.bool_()
        elif ks == {int}:
            t = pa.int64()
        elif ks <= {int, float}:
            t = pa.float64()
        else:
            t = pa.string()
        out.append(pa.field(k, t))
    return out


class IngestServer:
    """Threaded TCP JSON-lines ingest with tick-based parquet staging."""

    def __init__(
        self,
        span_dir: str,
        log_dir: str,
        registry: ProcessRegistry | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        tick_seconds: float = 1.0,
        max_buffer: int = 50_000,
    ):
        self.span_dir, self.log_dir = span_dir, log_dir
        os.makedirs(span_dir, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)
        self.registry = registry if registry is not None else ProcessRegistry()
        self.tick_seconds = tick_seconds
        self.max_buffer = max_buffer
        self._spans: list[dict[str, Any]] = []
        self._logs: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        # the evolving ingest-side merged schema for user log fields
        # (driver-side analog of LogSchemaRegistry, duo/src/schema.rs
        # 44-101): every staged file is conformed to these types, so
        # the cross-file merge in pipeline.staged_log_schema can never
        # see two files carrying CONFLICTING types for one column —
        # parquet's reader widens column SETS, not column TYPES.
        # Seeded from already-staged files so a restarted bridge over a
        # warm staging dir keeps their contract.
        self._log_extra: dict[str, pa.DataType] = {}
        self._schema_lock = threading.Lock()
        for fname in sorted(os.listdir(log_dir)):
            if not fname.endswith(".parquet"):
                continue
            try:
                existing = pq.read_schema(os.path.join(log_dir, fname))
            except Exception:
                continue
            for f in existing:
                if f.name in _LOG_CORE_KEYS:
                    continue
                prev = self._log_extra.get(f.name)
                self._log_extra[f.name] = (
                    f.type if prev is None else _widen_arrow(prev, f.type)
                )
        self._stop = threading.Event()
        self._active = 0
        self._idle = threading.Condition()
        server = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:  # one connection, many lines
                for raw in self.rfile:
                    line = raw.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue  # reference drops undecodable frames
                    reply = server._ingest(rec)
                    if reply is not None:
                        self.wfile.write((json.dumps(reply) + "\n").encode())
                        self.wfile.flush()

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            # non-daemon + block_on_close: server_close() joins the
            # handler threads, so stop()'s final flush can't race a
            # connection that is still draining its lines
            daemon_threads = False

            # connection accounting for quiesce(): a connection counts
            # from the moment it is accepted (not when its handler
            # thread gets scheduled) until its handler finishes, so
            # "no active connections" really means "every byte a
            # closed client sent has been ingested"
            def get_request(self):
                with server._idle:
                    server._active += 1
                try:
                    return super().get_request()
                except BaseException:
                    with server._idle:
                        server._active -= 1
                        server._idle.notify_all()
                    raise

            def process_request_thread(self, request, client_address):
                try:
                    super().process_request_thread(request, client_address)
                finally:
                    with server._idle:
                        server._active -= 1
                        server._idle.notify_all()

        self._tcp = _Server((host, port), Handler)
        self.address: tuple[str, int] = self._tcp.server_address[:2]
        self._threads = [
            threading.Thread(target=self._tcp.serve_forever, daemon=True),
            threading.Thread(target=self._tick_loop, daemon=True),
        ]

    # ------------------------------------------------------------------

    def start(self) -> "IngestServer":
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        """Drain in-flight connections, stop accepting, then flush
        everything buffered (the reference's shutdown drains the same
        way)."""
        self.quiesce()
        self._stop.set()
        self._tcp.shutdown()
        self._tcp.server_close()
        self.flush()

    def quiesce(self, timeout: float = 10.0) -> bool:
        """Wait until every connected client's bytes are ingested: no
        connection pending accept on the listen socket and no handler
        mid-read. Returns False if connections are still open at
        ``timeout`` — callers flushing for a deterministic drain should
        close their clients first."""
        deadline = time.monotonic() + timeout
        while True:
            # after stop() the listen socket is closed — nothing can be
            # pending accept any more
            pending = not self._stop.is_set() and bool(
                select.select([self._tcp], [], [], 0)[0]
            )
            with self._idle:
                if not pending and self._active == 0:
                    return True
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                # a pending accept doesn't notify the condition — poll
                self._idle.wait(min(remaining, 0.05))

    def __enter__(self) -> "IngestServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------------

    def _ingest(self, rec: dict[str, Any]) -> dict[str, Any] | None:
        kind = rec.pop("kind", None)
        if kind == "process":
            pid = self.registry.register_process(rec.get("service", ""), rec.get("tags"))
            return {"process_id": pid}
        if kind == "span":
            with self._lock:
                self._spans.append(_normalize_span(rec))
                full = len(self._spans) >= self.max_buffer
        elif kind == "log":
            with self._lock:
                self._logs.append(_normalize_log(rec))
                full = len(self._logs) >= self.max_buffer
        else:
            return None
        if full:
            self.flush()
        return None

    def _tick_loop(self) -> None:
        while not self._stop.wait(self.tick_seconds):
            # one bad batch must not kill the tick thread — ingest
            # would silently stop staging forever while buffers grow
            try:
                self.flush()
            except Exception as e:  # noqa: BLE001
                import sys

                print(f"ingest tick flush failed: {e}", file=sys.stderr)

    def flush(self) -> None:
        """Stage buffered records as one parquet file per table — the
        1 s aggregation tick (duo/src/grpc/server.rs:31-46). Unlike the
        reference's `logs.is_empty() || spans.is_empty()` skip (the §3.4
        wart), each table flushes independently."""
        with self._lock:
            spans, self._spans = self._spans, []
            logs, self._logs = self._logs, []
        if spans:
            self._write(spans, _SPAN_ARROW, self.span_dir)
        if logs:
            # per-batch inferred user-field columns merged into the
            # EVOLVING ingest schema (arrow.rs:82-92 + schema.rs:78-89
            # analog), then the batch is conformed to the merged types
            # before writing — and when a merge WIDENS a field that
            # older staged files carry at the narrower type, those
            # files are rewritten in place (the logschema.merge_batch
            # rewrite, staged-file edition). Without this, an int
            # field in tick 1 and a string field in tick 2 leaves an
            # INT64 file + a UTF8 file on disk, and the log stream's
            # fixed merged schema throws 'Parquet column cannot be
            # converted' on the older file.
            with self._schema_lock:
                widened: dict[str, pa.DataType] = {}
                for f in _infer_extra_fields(logs, _LOG_CORE_KEYS):
                    prev = self._log_extra.get(f.name)
                    merged = f.type if prev is None else _widen_arrow(prev, f.type)
                    if prev is not None and merged != prev:
                        widened[f.name] = merged
                    self._log_extra[f.name] = merged
                schema = _LOG_ARROW
                for name in sorted(self._log_extra):
                    schema = schema.append(pa.field(name, self._log_extra[name]))
                if widened:
                    self._rewrite_staged(widened)
            for f in schema:
                if f.name in _LOG_CORE_KEYS:
                    continue
                if f.type == pa.string():
                    for r in logs:
                        v = r.get(f.name)
                        if v is not None and not isinstance(v, str):
                            r[f.name] = json.dumps(v)
            self._write(logs, schema, self.log_dir)

    def _rewrite_staged(self, widened: dict[str, pa.DataType]) -> None:
        """Cast already-staged log files whose columns predate a type
        widening. Rewrite keeps the FILENAME (write tmp + atomic
        replace): the streaming file source tracks files by path, so a
        file it already processed is never re-read and a file it has
        not yet listed is picked up with the widened types. Widening
        fires at most once per (field, narrower-type) ever — a rare
        maintenance event, not a hot-path cost."""
        for fname in sorted(os.listdir(self.log_dir)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(self.log_dir, fname)
            try:
                table = pq.read_table(path)
            except Exception:
                continue
            changed = False
            for name, dtype in widened.items():
                idx = table.schema.get_field_index(name)
                if idx < 0 or table.schema.field(idx).type == dtype:
                    continue
                table = table.set_column(
                    idx,
                    pa.field(name, dtype),
                    table.column(idx).cast(dtype),
                )
                changed = True
            if changed:
                tmp = path + ".inprogress"
                pq.write_table(table, tmp)
                os.replace(tmp, path)

    @staticmethod
    def _write(records: list[dict[str, Any]], schema: pa.Schema, out_dir: str) -> None:
        cols = {
            f.name: [r.get(f.name) for r in records] for f in schema
        }
        table = pa.Table.from_pydict(cols, schema=schema)
        # write-then-rename so the streaming file source never lists a
        # half-written file
        final = os.path.join(out_dir, f"{int(time.time()*1e6)}-{uuid.uuid4().hex[:8]}.parquet")
        tmp = final + ".inprogress"
        pq.write_table(table, tmp)
        os.replace(tmp, final)


# ------------------------------------------------------------- client --


class IngestClient:
    """Minimal duo-subscriber analog for tests/examples: send records
    over one TCP connection."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._rfile = self._sock.makefile("rb")

    def register_process(self, service: str, tags: dict[str, Any] | None = None) -> str:
        self._send({"kind": "process", "service": service, "tags": tags or {}})
        return json.loads(self._rfile.readline())["process_id"]

    def record_span(self, **span: Any) -> None:
        self._send({"kind": "span", **span})

    def record_log(self, **log: Any) -> None:
        self._send({"kind": "log", **log})

    def _send(self, obj: dict[str, Any]) -> None:
        self._sock.sendall((json.dumps(obj) + "\n").encode())

    def close(self) -> None:
        self._rfile.close()
        self._sock.close()
