"""Ingest normalization: timing-tag reformat, C6 message extraction,
level int decode, process registration + process.json round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duo_spark.ingest import ProcessRegistry, normalize_logs, normalize_spans
from duo_spark.schemas import SPAN_SCHEMA
from duo_spark.sources.store import PartitionedStore

BASE = 1_700_000_000_000_000


def test_normalize_spans_timing_tags_and_end_default(spark):
    """busy/idle numeric tags get the reference's display form
    (models.rs:106-112 + the 197-214 unit table); other tags and
    non-numeric values pass through; missing end defaults to now_us."""
    rows = [
        (1, None, 1, "op", "web-0", BASE, BASE + 5,
         json.dumps({"busy": "3", "idle": "2500", "other": "7"})),
        (2, None, 1, "op", "web-0", BASE, None,
         json.dumps({"busy": "3000000", "idle": "already-human"})),
        (3, None, 1, "op", "web-0", BASE, BASE + 9, None),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {r.id: r for r in normalize_spans(df, now_us=BASE + 777).collect()}
    assert json.loads(out[1].tags) == {"busy": "3us", "idle": "2.50ms", "other": "7"}
    assert json.loads(out[2].tags) == {"busy": "3.00s", "idle": "already-human"}
    assert out[3].tags is None
    assert out[2].end == BASE + 777, "missing end defaults to now"
    assert out[1].end == BASE + 5, "present end untouched"


def test_normalize_logs_message_extraction_and_level(spark):
    """C6: message pops out of the fields map (models.rs:154-158);
    remaining fields survive; proto int level decodes with DEBUG
    fallback (models.rs:150-152)."""
    schema = T.StructType([
        T.StructField("level", T.IntegerType()),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
    ])
    df = spark.createDataFrame(
        [
            (1, {"message": "boom", "k": "v"}),
            (4, {"k2": "v2"}),
            (99, None),
        ],
        schema,
    )
    out = normalize_logs(df, level_is_int=True).collect()
    got = [(r.level, r.message, r.fields) for r in out]
    assert (
        "ERROR", "boom", {"k": "v"}) in got
    assert ("DEBUG", None, {"k2": "v2"}) in got
    assert ("DEBUG", None, None) in got


def test_normalize_logs_existing_message_wins(spark):
    schema = "message: string, fields: map<string,string>"
    df = spark.createDataFrame([("kept", {"message": "shadow"})], schema)
    r = normalize_logs(df).first()
    assert r.message == "kept" and r.fields == {}


def test_process_registry_ids_and_roundtrip(spark, tmp_path):
    """"{service}-{n}" ids (memory.rs:112) and process.json
    persistence + reload (memory.rs:60-79,141-148)."""
    store = PartitionedStore(spark, str(tmp_path))
    reg = ProcessRegistry(store)
    assert reg.register_process("web", {"host": "h1"}) == "web-0"
    assert reg.register_process("web") == "web-1"
    assert reg.register_process("api") == "api-0"
    assert reg.service_names() == ["api", "web"]
    # a fresh registry reloads the persisted state and keeps counting
    reg2 = ProcessRegistry(store)
    assert reg2.register_process("web") == "web-2"
    assert reg2.processes()["web-0"]["tags"] == {"host": "h1"}


def test_registry_feeds_query_service(spark):
    """The registry's processes() shape is what the facade serializes."""
    from duo_spark.web.api import QueryService

    reg = ProcessRegistry()
    reg.register_process("web")
    svc = QueryService(
        spark,
        logs=spark.createDataFrame([], "process_id string, time long, trace_id long, "
                                   "span_id long, level string, target string, "
                                   "file string, line int, message string"),
        spans=spark.createDataFrame([], SPAN_SCHEMA),
        processes=reg.processes(),
    )
    assert svc.services()["data"] == ["web"]
