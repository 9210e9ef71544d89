"""Trace pipeline operators (SURVEY §2.3 J1-J4, §3.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duo_spark.operators.traces import (
    assemble_traces,
    correlate_span_logs,
    distinct_operations,
    enrich_process,
    filter_traces,
    get_trace_by_id,
    logs_for_traces,
    select_root_spans,
)
from duo_spark.schemas import PROCESS_SCHEMA


def test_filter_traces_roots_and_children(spans_df):
    got = filter_traces(spans_df, service="web", limit=5)
    tids = [r["trace_id"] for r in got.select("trace_id").distinct().collect()]
    assert 0 < len(tids) <= 5
    # every admitted trace's full span set is present
    expected = spans_df.filter(F.col("trace_id").isin(tids)).count()
    assert got.count() == expected
    # all admitted traces have a root matching the service
    roots = got.filter(F.col("parent_id").isNull()).collect()
    assert len(roots) == len(tids)
    assert all(r["process_id"].startswith("web") for r in roots)


def test_filter_traces_duration_predicate(spans_df):
    got = filter_traces(spans_df, min_duration_us=1_000_000, limit=100)
    roots = got.filter(F.col("parent_id").isNull()).collect()
    assert roots and all(r["end"] - r["start"] >= 1_000_000 for r in roots)


def test_filter_traces_operation(spans_df):
    got = filter_traces(spans_df, operation="db.query", limit=100)
    roots = got.filter(F.col("parent_id").isNull()).collect()
    assert all(r["name"] == "db.query" for r in roots)


def test_filter_traces_deterministic_topk(spans_df):
    a = filter_traces(spans_df, limit=3).select("trace_id").distinct().collect()
    b = filter_traces(spans_df, limit=3).select("trace_id").distinct().collect()
    assert sorted(r["trace_id"] for r in a) == sorted(r["trace_id"] for r in b)
    # newest roots win
    roots = select_root_spans(spans_df).orderBy(F.col("start").desc()).limit(3).collect()
    assert sorted(r["trace_id"] for r in a) == sorted(r["trace_id"] for r in roots)


def test_correlate_span_logs_error_flag(spans_df, logs_df):
    enriched = correlate_span_logs(spans_df, logs_df)
    err_span_ids = {
        r["span_id"]
        for r in logs_df.filter(F.col("level") == "ERROR").select("span_id").distinct().collect()
    }
    rows = enriched.collect()
    assert {r["id"] for r in rows if r["error"]} == err_span_ids
    # log counts match
    per_span = {
        r["span_id"]: r["cnt"]
        for r in logs_df.groupBy("span_id").agg(F.count("*").alias("cnt")).collect()
    }
    for r in rows:
        assert r["log_count"] == per_span.get(r["id"], 0)


def test_correlate_span_logs_bounded_pathological_span(spans_df, logs_df):
    """One span with a huge log fanout must yield a BOUNDED span_logs
    array (earliest N by time) while log_count/error_count stay exact."""
    flood_id = spans_df.first()["id"]
    flood = logs_df.limit(1).select(
        F.col("process_id"),
        F.explode(F.sequence(F.lit(0), F.lit(4999))).alias("i"),
        "trace_id",
        "level",
        "target",
        "file",
        "line",
        "message",
    ).select(
        "process_id",
        F.col("i").cast("long").alias("time"),
        "trace_id",
        F.lit(flood_id).cast("long").alias("span_id"),
        "level",
        "target",
        "file",
        "line",
        "message",
    )
    enriched = correlate_span_logs(spans_df, flood, max_logs_per_span=100)
    row = enriched.filter(F.col("id") == flood_id).first()
    assert row["log_count"] == 5000  # exact despite the cap
    assert len(row["span_logs"]) == 100
    assert [lg["time"] for lg in row["span_logs"]] == list(range(100))  # earliest kept


def test_logs_for_traces(spans_df, logs_df):
    sel = filter_traces(spans_df, limit=4)
    got = logs_for_traces(logs_df, sel)
    tids = {r["trace_id"] for r in sel.select("trace_id").distinct().collect()}
    assert {r["trace_id"] for r in got.collect()} <= tids


def test_assemble_traces(spans_df, logs_df):
    traces = assemble_traces(correlate_span_logs(spans_df, logs_df))
    row = traces.filter(F.col("span_count") > 1).first()
    spans = row["spans"]
    starts = [s["start"] for s in spans]
    assert starts == sorted(starts)  # waterfall order
    assert row["trace_start"] == min(starts)


def test_get_trace_by_id(spans_df, logs_df):
    tid = spans_df.select("trace_id").first()["trace_id"]
    rows = get_trace_by_id(spans_df, logs_df, tid).collect()
    assert rows and all(r["trace_id"] == tid for r in rows)


def test_distinct_operations(spans_df):
    ops = {r["name"] for r in distinct_operations(spans_df, service="web").collect()}
    expected = {
        r["name"]
        for r in spans_df.filter(F.col("process_id").startswith("web"))
        .select("name").distinct().collect()
    }
    assert ops == expected


def test_enrich_process(spark, spans_df):
    procs = spark.createDataFrame(
        [("web-0", "web", {"v": "1"}), ("web-1", "web", {"v": "1"}),
         ("worker-0", "worker", None), ("worker-1", "worker", None)],
        PROCESS_SCHEMA,
    )
    got = enrich_process(spans_df, procs)
    assert got.filter(F.col("service_name").isNull()).count() == 0
