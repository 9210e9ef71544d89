"""Log search + field stats operators (SURVEY §3.1, §3.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duo_spark.operators.logs import field_stats, search_logs
from tests.conftest import BASE_US


def test_search_service_prefix(logs_df):
    rows = search_logs(logs_df, service="worker", limit=1000).collect()
    assert rows and all(r["process_id"].startswith("worker") for r in rows)


def test_search_time_desc_and_limit(logs_df):
    rows = search_logs(logs_df, limit=10, tiebreaker="span_id").collect()
    assert len(rows) == 10
    times = [r["time"] for r in rows]
    assert times == sorted(times, reverse=True)


def test_search_pagination_deterministic(logs_df):
    a = search_logs(logs_df, limit=5, skip=0, tiebreaker="span_id").collect()
    b = search_logs(logs_df, limit=5, skip=5, tiebreaker="span_id").collect()
    both = search_logs(logs_df, limit=10, skip=0, tiebreaker="span_id").collect()
    assert [r["span_id"] for r in a + b] == [r["span_id"] for r in both]


def test_search_sql_expr(logs_df):
    rows = search_logs(logs_df, expr="level = 'ERROR'", limit=1000).collect()
    assert rows and all(r["level"] == "ERROR" for r in rows)


def test_search_keyword_fallback(logs_df):
    # not valid SQL => ILIKE on message (reference logs.rs:54)
    rows = search_logs(logs_df, expr="handling request", limit=1000).collect()
    assert rows and all("handling request" in r["message"] for r in rows)


def test_search_time_range(logs_df):
    start = BASE_US + 10 * 1_000_000
    end = BASE_US + 20 * 1_000_000
    rows = search_logs(logs_df, start_us=start, end_us=end, limit=1000).collect()
    assert rows and all(start <= r["time"] <= end for r in rows)


def test_default_lookback(spark, logs_df):
    # end given without start => 15-minute window (duo/src/query.rs:106-109)
    end = BASE_US + 40 * 1_000_000
    rows = search_logs(logs_df, end_us=end, limit=10_000).collect()
    assert all(end - 15 * 60 * 1_000_000 <= r["time"] <= end for r in rows)


def test_field_stats_top_buckets(logs_df):
    rows = field_stats(logs_df, "level").collect()
    counts = {r["value"]: r["count"] for r in rows}
    expected = {
        r["level"]: r["cnt"]
        for r in logs_df.groupBy("level").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == expected
    assert [r["count"] for r in rows] == sorted([r["count"] for r in rows], reverse=True)


def test_field_stats_unknown_field(logs_df):
    try:
        field_stats(logs_df, "nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_field_stats_drops_nulls(logs_df):
    rows = field_stats(logs_df, "target", limit=100).collect()
    assert all(r["value"] is not None for r in rows)
