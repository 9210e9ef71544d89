"""Jaeger/logs JSON serialization (SURVEY §3.2; reference
duo/src/web/serialize.rs:27-195).

These are driver-side shaping functions: the distributed job ends at
`assemble_traces` / `correlate_span_logs` rows; turning the final
(limit-bounded) result into the Jaeger HTTP contract is O(response
size), so plain Python is the right tool — no reason to burn a shuffle
on formatting.

Contract reproduced rule-for-rule:
- ids rendered as DECIMAL strings (`u64::to_string`,
  serialize.rs:34-35,79,90)
- a non-root span carries one reference
  {refType: CHILD_OF, traceID, spanID} (serialize.rs:80-88)
- a non-intact span (no `end`) gets a `*` suffix on operationName
  (serialize.rs:91-96) and duration 0 (models.rs:69-71)
- startTime/duration are integer MICROSECONDS (serialize.rs:97-98)
- tags/fields are [{key, type, value}] with type in
  bool/int64/string by JSON value kind (serialize.rs:40-68)
- span logs become {timestamp, fields:[...]} with message/level/target
  promoted into fields and `file` rendered as "file:line"
  (serialize.rs:156-180)
- an ERROR-level correlated log injects tag error=true
  (models.rs:89-94) — done here at the edge if the engine row carries
  `error` (correlate_span_logs sets it)
- the envelope is {data, total: 0, limit: 0, offset: 0, errors: null}
  (serialize.rs:141-154)
"""

from __future__ import annotations

import json
from typing import Any

#: warnings/flags constants (serialize.rs:103-104)
_FLAGS = 1


def _unsigned_str(v: int) -> str:
    """Ids are u64 in the reference; Spark carries them as signed
    longs. Format the two's-complement reinterpretation so foreign
    u64 >= 2^63 round-trips (SURVEY §7.4)."""
    return str(v & 0xFFFFFFFFFFFFFFFF)


def _field(key: str, value: Any) -> dict[str, Any]:
    """{key, type, value} triple — serialize.rs:40-68. JSON kinds map
    bool->bool, number->int64, string->string; anything else is
    dropped by the reference (the `_ => {}` arm) so we stringify to
    stay lossless rather than emit an untyped entry."""
    if isinstance(value, bool):
        return {"key": key, "type": "bool", "value": value}
    if isinstance(value, (int, float)):
        return {"key": key, "type": "int64", "value": value}
    if isinstance(value, str):
        return {"key": key, "type": "string", "value": value}
    return {"key": key, "type": "string", "value": json.dumps(value)}


def _tags_fields(tags: dict[str, Any] | str | None) -> list[dict[str, Any]]:
    if tags is None:
        return []
    if isinstance(tags, str):
        tags = json.loads(tags) if tags else {}
    return [_field(k, v) for k, v in tags.items()]


def serialize_log(log: dict[str, Any]) -> dict[str, Any]:
    """One span-correlated log -> {timestamp, fields} (serialize.rs:156-180)."""
    fields: dict[str, Any] = {
        "message": log.get("message") or "",
        "level": log.get("level") or "",
        "target": log.get("target") or "",
    }
    if log.get("file") is not None:
        fields["file"] = f"{log['file']}:{log.get('line') or 0}"
    for k, v in (log.get("fields") or {}).items():
        fields[k] = v
    return {
        "timestamp": int(log["time"]),
        "fields": [_field(k, v) for k, v in fields.items()],
    }


def serialize_span(span: dict[str, Any]) -> dict[str, Any]:
    """One span row -> Jaeger span JSON (serialize.rs:70-108).

    Expects the engine row shape: id, parent_id, trace_id, name,
    process_id, start, end (nullable), tags (JSON string or dict),
    optional error flag (A3) and span_logs list (J1).
    """
    trace_id = _unsigned_str(span["trace_id"])
    intact = span.get("end") is not None
    references = []
    if span.get("parent_id") is not None:
        references.append(
            {
                "refType": "CHILD_OF",
                "traceID": trace_id,
                "spanID": _unsigned_str(span["parent_id"]),
            }
        )
    tags = _tags_fields(span.get("tags"))
    # error=true injection when correlated logs contained ERROR level
    # (models.rs:89-94); skip if the stored tags already carry one
    if span.get("error") and not any(t["key"] == "error" for t in tags):
        tags.append(_field("error", True))
    start = int(span["start"])
    duration = int(span["end"]) - start if intact else 0
    return {
        "traceID": trace_id,
        "references": references,
        "spanID": _unsigned_str(span["id"]),
        "operationName": span["name"] if intact else f"{span['name']}*",
        "startTime": start,
        "duration": duration,
        "tags": tags,
        "logs": [serialize_log(lg) for lg in (span.get("span_logs") or [])],
        "processID": span["process_id"],
        "warnings": None,
        "flags": _FLAGS,
    }


def serialize_process(process: dict[str, Any]) -> dict[str, Any]:
    """Process registry entry (serialize.rs:182-195)."""
    return {
        "id": process["id"],
        "serviceName": process["service_name"],
        "tags": _tags_fields(process.get("tags")),
    }


def serialize_trace(
    trace_id: int, spans: list[dict[str, Any]], processes: dict[str, dict[str, Any]]
) -> dict[str, Any]:
    """TraceExt JSON (serialize.rs:110-139): the trace's spans plus the
    processes referenced by them."""
    return {
        "traceID": _unsigned_str(trace_id),
        "spans": [serialize_span(s) for s in spans],
        "processes": {pid: serialize_process(p) for pid, p in processes.items()},
        "warnings": None,
    }


def jaeger_data(payload: Any) -> dict[str, Any]:
    """Response envelope (serialize.rs:141-154)."""
    return {"data": payload, "total": 0, "limit": 0, "offset": 0, "errors": None}


def traces_to_jaeger(
    trace_rows: list[Any], processes: dict[str, dict[str, Any]] | None = None
) -> dict[str, Any]:
    """assemble_traces output rows -> full /api/traces response.

    ``trace_rows`` are Row objects (or dicts) with trace_id and a
    `spans` array of span structs (operators/traces.py
    assemble_traces); each span struct is serialized under the trace.
    Only processes actually referenced are included, per trace
    (services.rs:84-91).
    """
    processes = processes or {}
    out = []
    for row in trace_rows:
        d = row if isinstance(row, dict) else row.asDict(recursive=True)
        # assemble_traces span structs carry no trace_id (it's the
        # grouping key) — inject it for the per-span serializer
        spans = [{"trace_id": d["trace_id"], **s} for s in (d.get("spans") or [])]
        used = {s["process_id"] for s in spans if s.get("process_id")}
        out.append(
            serialize_trace(
                d["trace_id"],
                spans,
                {pid: processes[pid] for pid in sorted(used) if pid in processes},
            )
        )
    return jaeger_data(out)
