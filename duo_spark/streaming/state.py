"""Stateful span completion (SURVEY §2.9 T4).

Reference semantics (duo/src/aggregator.rs:17-39): ``record_span``
fires at span open AND close; records merge by id (later record sets
``end``, extends ``tags``, may set ``parent_id``) and a span is
released only once its ``end`` arrived; open spans stay buffered —
forever, in the reference. Here the state lives in Spark's streaming
state store, sharded by span id (scales horizontally; survives
restarts via the checkpoint), and carries a TTL so abandoned opens
can't grow state without bound — a deliberate, documented improvement
(DEVIATIONS: reference has no timeout).

Merge rules match the batch operator `merge_span_records` exactly, so
streaming and batch replays of the same records agree:
  start     = min over records
  end       = max non-null
  parent_id/trace_id/name/process_id = min non-null (stable under
              conflicts, equals "the" value for well-formed streams)
  tags      = key-wise merge, later records (by start, then raw JSON)
              win

Split-invariance: the scalar folds are commutative (min/max), and the
tag merge is made micro-batch-split-invariant by storing the RAW
(start, tags-json) pairs in state and resolving winners only at emit
time with the same global (start, tags) sort the batch operator uses —
never by arrival order. (Serialized key order of the emitted JSON is
sorted; the batch form serializes in fold order — key SETS and winning
VALUES agree, asserted in tests/test_streaming.py.)
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from duo_spark.schemas import SPAN_SCHEMA

#: state carried per open span id — the partial span minus its key.
#: `tag_recs` is a JSON array of [start, tags-json] pairs (deduped),
#: NOT a merged map: winners are resolved at emit so the result is
#: independent of how records split across micro-batches.
SPAN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("parent_id", T.LongType(), True),
        T.StructField("trace_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("process_id", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("tag_recs", T.StringType(), True),
    ]
)

#: completed-span output; `intact` False only for TTL-expelled spans
SPAN_OUTPUT_SCHEMA = T.StructType(SPAN_SCHEMA.fields + [T.StructField("intact", T.BooleanType(), False)])

DEFAULT_TTL_MS = 15 * 60 * 1000  # 15 min, mirroring the default query lookback


def _decode_pairs(s: str | None) -> list[tuple[int | None, str]]:
    if not s:
        return []
    return [(p[0], p[1]) for p in json.loads(s)]


def _pair_sort_key(p: tuple[int | None, str]):
    # mirror the batch fold's sort_array(struct(start, tags)) ordering:
    # start ASC nulls-first, then raw tag JSON ASC
    return (p[0] is not None, p[0] if p[0] is not None else 0, p[1])


def _resolve_tags(pairs: list[tuple[int | None, str]]) -> str | None:
    """Fold tag maps in global (start, tags) order — later keys win,
    exactly the batch `merge_span_records` rule."""
    if not pairs:
        return None
    merged: dict[str, Any] = {}
    for _start, t in sorted(pairs, key=_pair_sort_key):
        merged.update(json.loads(t))
    return json.dumps(merged, sort_keys=True)


def _min_nonnull(a, b):
    if a is None or (isinstance(a, float) and pd.isna(a)):
        return b
    if b is None or (isinstance(b, float) and pd.isna(b)):
        return a
    return min(a, b)


def _opt_int(v) -> int | None:
    return None if v is None or pd.isna(v) else int(v)


def _merge_records(
    state_row: tuple | None, pdf: pd.DataFrame
) -> tuple[dict[str, Any], int | None]:
    """Fold a batch's records into the partial. Scalar folds are
    commutative (min/max) so no ordering is needed; tags accumulate as
    raw (start, json) pairs and are resolved at emit."""
    if state_row is not None:
        partial: dict[str, Any] = {
            "parent_id": _opt_int(state_row[0]),
            "trace_id": _opt_int(state_row[1]),
            "name": state_row[2],
            "process_id": state_row[3],
            "start": _opt_int(state_row[4]),
            "tag_pairs": _decode_pairs(state_row[5]),
        }
    else:
        partial = {
            "parent_id": None, "trace_id": None, "name": None,
            "process_id": None, "start": None, "tag_pairs": [],
        }
    seen = set(partial["tag_pairs"])
    end: int | None = None
    for rec in pdf.itertuples(index=False):
        partial["parent_id"] = _min_nonnull(partial["parent_id"], _opt_int(rec.parent_id))
        partial["trace_id"] = _min_nonnull(partial["trace_id"], _opt_int(rec.trace_id))
        partial["name"] = _min_nonnull(partial["name"], rec.name)
        partial["process_id"] = _min_nonnull(partial["process_id"], rec.process_id)
        partial["start"] = _min_nonnull(partial["start"], _opt_int(rec.start))
        tags = rec.tags
        if isinstance(tags, str) and tags:
            pair = (_opt_int(rec.start), tags)
            if pair not in seen:
                seen.add(pair)
                partial["tag_pairs"].append(pair)
        rec_end = _opt_int(rec.end)
        if rec_end is not None:
            end = rec_end if end is None else max(end, rec_end)
    return partial, end


def _span_row(span_id: int, partial: dict[str, Any], end: int | None, intact: bool) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "id": span_id,
                "parent_id": partial["parent_id"],
                "trace_id": partial["trace_id"],
                "name": partial["name"],
                "process_id": partial["process_id"],
                "start": partial["start"],
                "end": end,
                "tags": _resolve_tags(partial["tag_pairs"]),
                "intact": intact,
            }
        ]
    )


def make_span_completion_func(ttl_ms: int = DEFAULT_TTL_MS, emit_expired: bool = False):
    """Build the applyInPandasWithState function.

    ``emit_expired=True`` releases TTL-expired opens as non-intact
    spans (end=None, intact=False — the Jaeger serializer renders them
    with a ``*`` suffix, duo/src/web/serialize.rs:91-96); the default
    drops them like a GC.
    """

    def func(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        span_id = key[0]
        if state.hasTimedOut:
            partial_row = state.get if state.exists else None
            state.remove()
            if emit_expired and partial_row is not None:
                partial, _ = _merge_records(partial_row, pd.DataFrame(
                    columns=["parent_id", "trace_id", "name", "process_id", "start", "end", "tags"]
                ))
                yield _span_row(span_id, partial, None, intact=False)
            return

        state_row = state.get if state.exists else None
        chunks = [c for c in pdf_iter if len(c)]
        if not chunks:
            return
        partial, end = _merge_records(state_row, pd.concat(chunks))
        if end is not None:
            # completed: release and clear state (aggregator.rs:32-39)
            if state.exists:
                state.remove()
            yield _span_row(span_id, partial, end, intact=True)
        else:
            state.update(
                (
                    partial["parent_id"], partial["trace_id"], partial["name"],
                    partial["process_id"], partial["start"],
                    json.dumps(sorted(partial["tag_pairs"], key=_pair_sort_key)),
                )
            )
            if ttl_ms > 0:  # 0 => NoTimeout mode, setTimeoutDuration would throw
                state.setTimeoutDuration(ttl_ms)

    return func


def complete_spans(
    records: DataFrame, ttl_ms: int | None = DEFAULT_TTL_MS, emit_expired: bool = False
) -> DataFrame:
    """T4 — streaming upsert-merge: span records -> completed spans.

    ``records`` must be a STREAMING DataFrame in SPAN_SCHEMA shape.
    State is partitioned by span id (the groupBy key), so the shuffle
    is one hash exchange and state-store size is O(open spans), which
    the TTL bounds.

    ``ttl_ms=None`` (or ``<= 0``, normalized) disables the timeout
    entirely (the reference's unbounded-buffer semantics). Required for
    availableNow replays: a ProcessingTimeTimeout keeps the micro-batch
    loop alive to fire future timeouts, so a drain-and-stop run would
    never terminate.
    """
    if ttl_ms is not None and ttl_ms <= 0:
        ttl_ms = None
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return records.groupBy("id").applyInPandasWithState(
        make_span_completion_func(ttl_ms or 0, emit_expired),
        outputStructType=SPAN_OUTPUT_SCHEMA,
        stateStructType=SPAN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
