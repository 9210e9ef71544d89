"""Golden-JSON tests for the Jaeger/logs serialization rules
(reference duo/src/web/serialize.rs:27-195, duo/src/models.rs:60-94).
Each golden dict is written from the reference's serializer logic, not
from our implementation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from duo_spark.operators.traces import assemble_traces, correlate_span_logs
from duo_spark.web import jaeger_data, serialize_log, serialize_span, serialize_trace


def test_intact_root_span_golden():
    span = {
        "id": 2, "parent_id": None, "trace_id": 99, "name": "GET /users",
        "process_id": "web-0", "start": 1_000_000, "end": 1_250_000,
        "tags": json.dumps({"busy": "1.20ms", "code": 200, "cached": True}),
    }
    assert serialize_span(span) == {
        "traceID": "99",
        "references": [],
        "spanID": "2",
        "operationName": "GET /users",
        "startTime": 1_000_000,
        "duration": 250_000,
        "tags": [
            {"key": "busy", "type": "string", "value": "1.20ms"},
            {"key": "code", "type": "int64", "value": 200},
            {"key": "cached", "type": "bool", "value": True},
        ],
        "logs": [],
        "processID": "web-0",
        "warnings": None,
        "flags": 1,
    }


def test_non_intact_child_span_star_suffix_and_child_of():
    """serialize.rs:80-96 — CHILD_OF reference with string ids; missing
    end => operationName gets '*' and duration 0."""
    span = {
        "id": 3, "parent_id": 2, "trace_id": 99, "name": "db.query",
        "process_id": "web-0", "start": 1_100_000, "end": None, "tags": None,
    }
    got = serialize_span(span)
    assert got["operationName"] == "db.query*"
    assert got["duration"] == 0
    assert got["references"] == [
        {"refType": "CHILD_OF", "traceID": "99", "spanID": "2"}
    ]


def test_error_tag_injection(   ):
    """models.rs:89-94 — a span whose correlated logs include ERROR
    level gets error=true appended to its tags."""
    span = {
        "id": 4, "parent_id": 2, "trace_id": 99, "name": "op",
        "process_id": "web-0", "start": 1, "end": 2,
        "tags": json.dumps({"k": "v"}), "error": True,
    }
    tags = serialize_span(span)["tags"]
    assert {"key": "error", "type": "bool", "value": True} in tags
    # no duplicate injection when error tag already present
    span["tags"] = json.dumps({"error": True})
    tags2 = serialize_span(span)["tags"]
    assert sum(1 for t in tags2 if t["key"] == "error") == 1


def test_u64_id_reinterpretation():
    """SURVEY §7.4: a foreign u64 >= 2^63 arrives as a negative long
    and must render as its unsigned decimal string."""
    span = {
        "id": -1, "parent_id": None, "trace_id": -2, "name": "x",
        "process_id": "p", "start": 0, "end": 1, "tags": None,
    }
    got = serialize_span(span)
    assert got["spanID"] == str(2**64 - 1)
    assert got["traceID"] == str(2**64 - 2)


def test_log_fields_golden():
    """serialize.rs:156-180 — message/level/target promoted to fields,
    file rendered as file:line, user fields appended."""
    log = {
        "time": 1_234_567, "message": "query took 3ms", "level": "WARN",
        "target": "app::db", "file": "src/db.rs", "line": 42,
        "fields": {"rows": 7},
    }
    assert serialize_log(log) == {
        "timestamp": 1_234_567,
        "fields": [
            {"key": "message", "type": "string", "value": "query took 3ms"},
            {"key": "level", "type": "string", "value": "WARN"},
            {"key": "target", "type": "string", "value": "app::db"},
            {"key": "file", "type": "string", "value": "src/db.rs:42"},
            {"key": "rows", "type": "int64", "value": 7},
        ],
    }


def test_envelope_golden():
    assert jaeger_data([{"x": 1}]) == {
        "data": [{"x": 1}], "total": 0, "limit": 0, "offset": 0, "errors": None,
    }


def test_trace_with_processes_golden():
    spans = [
        {
            "id": 1, "parent_id": None, "trace_id": 7, "name": "root",
            "process_id": "web-0", "start": 10, "end": 20, "tags": None,
        }
    ]
    processes = {
        "web-0": {"id": "web-0", "service_name": "web", "tags": {"host": "h1"}}
    }
    got = serialize_trace(7, spans, processes)
    assert got["traceID"] == "7"
    assert got["processes"]["web-0"] == {
        "id": "web-0",
        "serviceName": "web",
        "tags": [{"key": "host", "type": "string", "value": "h1"}],
    }
    assert got["warnings"] is None


def test_end_to_end_from_engine_rows(spark, spans_df, logs_df):
    """The full §3.2 path: correlate -> assemble -> serialize. The
    JSON must be internally consistent with the engine rows."""
    enriched = correlate_span_logs(spans_df, logs_df)
    traces = assemble_traces(enriched).orderBy(F.desc("trace_start")).limit(3)
    rows = traces.collect()
    from duo_spark.web import traces_to_jaeger

    payload = traces_to_jaeger(rows)
    assert set(payload) == {"data", "total", "limit", "offset", "errors"}
    assert len(payload["data"]) == 3
    for trace_json, row in zip(payload["data"], rows):
        assert trace_json["traceID"] == str(row.trace_id)
        assert len(trace_json["spans"]) == row.span_count
        for sj in trace_json["spans"]:
            # engine rows are all intact spans here
            assert not sj["operationName"].endswith("*")
            assert sj["startTime"] >= 0 and sj["duration"] >= 0
        # roots have no references; children reference their parent
        by_id = {s["spanID"]: s for s in trace_json["spans"]}
        for sj in trace_json["spans"]:
            for ref in sj["references"]:
                assert ref["refType"] == "CHILD_OF"
                assert ref["spanID"] in by_id
    # serialization round-trips through json.dumps (no Row leakage)
    json.dumps(payload)
