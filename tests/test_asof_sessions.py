"""As-of join and sessionization semantics against driver-side
references."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from duo_spark.operators.asof import asof_join
from duo_spark.operators.sessions import session_stats, with_session_index


def _ref_asof(left, right, strict=False):
    out = {}
    for k, lt, lid in left:
        best = None
        for rk, rt, rv in right:
            if rk != k:
                continue
            if (rt < lt) if strict else (rt <= lt):
                if best is None or rt > best[0] or (rt == best[0] and rv > best[1]):
                    best = (rt, rv)
        out[lid] = best
    return out


def test_asof_backward_inclusive_and_strict(spark):
    rng = random.Random(7)
    left = [(rng.randrange(4), rng.randrange(50), i) for i in range(80)]
    right = [(rng.randrange(4), rng.randrange(50), 100 + i) for i in range(60)]
    ldf = spark.createDataFrame(left, "k long, t long, lid long")
    rdf = spark.createDataFrame(right, "k long, t long, rv long")
    for strict in (False, True):
        want = _ref_asof(left, right, strict)
        got = {
            r.lid: (r._asof_time, r.rv)
            for r in asof_join(ldf, rdf, "k", "t", "t", strict=strict).collect()
        }
        assert len(got) == len(left)
        for lid, best in want.items():
            assert got[lid] == (best if best else (None, None)), (lid, strict)


def test_asof_no_match_yields_nulls(spark):
    ldf = spark.createDataFrame([(1, 10, 1)], "k long, t long, lid long")
    rdf = spark.createDataFrame([(1, 11, 5), (2, 1, 6)], "k long, t long, rv long")
    row = asof_join(ldf, rdf, "k", "t", "t").first()
    assert row.lid == 1 and row._asof_time is None and row.rv is None


def test_asof_tie_prefers_largest_payload(spark):
    # two right rows at the same time: the (time, payload) order makes
    # the largest payload win deterministically
    ldf = spark.createDataFrame([(1, 10, 1)], "k long, t long, lid long")
    rdf = spark.createDataFrame([(1, 10, 5), (1, 10, 9)], "k long, t long, rv long")
    assert asof_join(ldf, rdf, "k", "t", "t").first().rv == 9


def test_asof_left_column_collision_raises(spark):
    import pytest

    ldf = spark.createDataFrame([(1, 10, 7)], "k long, t long, rv long")
    rdf = spark.createDataFrame([(1, 5, 5)], "k long, t long, rv long")
    with pytest.raises(ValueError, match="rv"):
        asof_join(ldf, rdf, "k", "t", "t")
    ldf2 = spark.createDataFrame([(1, 10, 7)], "k long, t long, _asof_time long")
    with pytest.raises(ValueError, match="_asof_time"):
        asof_join(ldf2, rdf, "k", "t", "t")


def test_asof_timestamp_times_compare_at_microseconds(spark):
    # 10.000001 s vs 10.000002 s: a cast('long') would truncate both
    # to 10 and pick the later right row; µs comparison must not
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    ldf = spark.createDataFrame([(1, base + us, 1)], "k long, t timestamp, lid long")
    rdf = spark.createDataFrame(
        [(1, base, 5), (1, base + 2 * us, 9)], "k long, t timestamp, rv long"
    )
    row = asof_join(ldf, rdf, "k", "t", "t").first()
    assert row.rv == 5
    assert row._asof_time == int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_asof_map_payload_supported(spark):
    # map columns can't be sort keys; the JSON tie-break keeps the
    # join working (and deterministic) for map payloads
    ldf = spark.createDataFrame([(1, 10, 1)], "k long, t long, lid long")
    rdf = spark.createDataFrame(
        [(1, 5, {"a": "x"}), (1, 7, {"b": "y"})], "k long, t long, tags map<string,string>"
    )
    row = asof_join(ldf, rdf, "k", "t", "t").first()
    assert row._asof_time == 7 and row.tags == {"b": "y"}


def _ref_sessions(rows, gap):
    bykey = {}
    for k, t in rows:
        bykey.setdefault(k, []).append(t)
    out = {}
    for k, ts in bykey.items():
        ts.sort()
        idx = 0
        prev = None
        for t in ts:
            if prev is not None and t - prev >= gap:
                idx += 1
            out.setdefault((k, idx), []).append(t)
            prev = t
    return {
        k: (len(v), min(v), max(v), max(v) - min(v)) for k, v in out.items()
    }


def test_sessionize_matches_reference(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(5), rng.randrange(1000)) for _ in range(300)]
    df = spark.createDataFrame(rows, "k long, t long")
    want = _ref_sessions(rows, gap=37)
    got = {
        (r.k, r.session_idx): (r.n_events, r.start, r.end, r.duration)
        for r in session_stats(df, "k", "t", 37).collect()
    }
    assert got == want


def test_session_index_zero_based_and_half_open_boundary(spark):
    # half-open boundary (session_window/Flink convention):
    # delta == gap starts a NEW session
    df = spark.createDataFrame(
        [(1, 0), (1, 9), (1, 19), (1, 100)], "k long, t long"
    )
    got = {
        r.t: r.session_idx
        for r in with_session_index(df, "k", "t", 10).collect()
    }
    assert got == {0: 0, 9: 0, 19: 1, 100: 2}


def test_asof_single_shuffle_plan(spark):
    # the tagged-union form must cost ONE hash shuffle + ONE sort —
    # not a range join or a join + re-aggregate (two+ shuffles)
    ldf = spark.createDataFrame([(1, 10, 1)], "k long, t long, lid long")
    rdf = spark.createDataFrame([(1, 2, 100)], "k long, t long, rv long")
    plan = (
        asof_join(ldf, rdf, "k", "t", "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_session_stats_single_shuffle_plan(spark):
    # hashpartitioning(k) satisfies the (k, session_idx) aggregate's
    # clustering, so the stats groupBy must NOT add a second exchange
    df = spark.createDataFrame([(1, 5)], "k long, t long")
    plan = (
        session_stats(df, "k", "t", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
