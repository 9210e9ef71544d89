"""Span ingest merge (A4 — duo/src/aggregator.rs semantics)."""

from __future__ import annotations

import json

from duo_spark.operators.spans import merge_span_records
from duo_spark.schemas import SPAN_SCHEMA


def test_merge_span_records(spark):
    rows = [
        # span 1: open (no end) then close (end + more tags)
        (1, None, 10, "op", "svc-0", 100, None, json.dumps({"a": "1"})),
        (1, None, 10, "op", "svc-0", 100, 500, json.dumps({"b": "2", "a": "9"})),
        # span 2: open only => stays incomplete, not emitted
        (2, 1, 10, "child", "svc-0", 120, None, None),
        # span 3: single complete record
        (3, 1, 10, "child", "svc-0", 130, 140, None),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {r["id"]: r for r in merge_span_records(df).collect()}
    assert set(got) == {1, 3}
    assert got[1]["start"] == 100 and got[1]["end"] == 500
    tags = json.loads(got[1]["tags"])
    assert tags == {"a": "9", "b": "2"}  # later record's keys win
    assert got[3]["end"] == 140


def test_merge_parent_id_coalesce(spark):
    rows = [
        (5, None, 11, "op", "svc-0", 100, None, None),
        (5, 4, 11, "op", "svc-0", 100, 200, None),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    row = merge_span_records(df).first()
    assert row["parent_id"] == 4
