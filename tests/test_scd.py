"""SCD type-2 state history: collapse, intervals, incremental merge."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from duo_spark.operators.scd import scd2_history, scd2_merge


def _hist(spark, rows):
    df = spark.createDataFrame(rows, "k int, s string, t long, i long")
    return scd2_history(df, "k", "s", "t", "i")


def test_scd2_collapses_duplicates_and_builds_intervals(spark):
    rows = [
        Row(k=1, s="A", t=10, i=1),
        Row(k=1, s="A", t=20, i=2),  # duplicate state: no version
        Row(k=1, s="B", t=30, i=3),
        Row(k=1, s="A", t=40, i=4),  # reversion IS a new version
        Row(k=2, s="X", t=15, i=5),
    ]
    got = {
        (r["k"], r["version"]): (r["state"], r["valid_from"], r["valid_to"])
        for r in _hist(spark, rows).collect()
    }
    assert got == {
        (1, 1): ("A", 10, 30),
        (1, 2): ("B", 30, 40),
        (1, 3): ("A", 40, None),
        (2, 1): ("X", 15, None),
    }


def test_scd2_equal_ts_resolved_by_tiebreak(spark):
    rows = [Row(k=1, s="B", t=10, i=2), Row(k=1, s="A", t=10, i=1)]
    got = [(r["state"], r["version"]) for r in
           _hist(spark, rows).orderBy("version").collect()]
    assert got == [("A", 1), ("B", 2)]


def test_scd2_invariants_on_real_events(spark, sf_dir):
    """Intervals are contiguous per key (valid_to of v == valid_from
    of v+1), exactly one open row per key, and no two consecutive
    versions share a state."""
    from duo_spark.queries import QUERIES

    hist = QUERIES["scd2_history"][0](spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    bad = hist.select(
        "user_id", "state", "valid_from", "valid_to",
        F.lead("valid_from").over(w).alias("_nf"),
        F.lead("state").over(w).alias("_ns"),
    ).filter(
        (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("_nf")))
        | (F.col("valid_to").isNull() & F.col("_nf").isNotNull())
        | (F.col("_ns").isNotNull() & (F.col("state") == F.col("_ns")))
    )
    assert bad.count() == 0
    opens = hist.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert opens.filter("count != 1").count() == 0
    assert opens.count() == hist.select("user_id").distinct().count()


@pytest.mark.parametrize("cut", [0.25, 0.5, 0.9])
def test_scd2_incremental_merge_equals_batch(spark, sf_dir, cut):
    """The watermark-contract property: splitting the change stream at
    any time cut and merging the tail into the head's history equals
    the one-shot rebuild — the version table is a lossless compaction
    once the past is sealed."""
    from duo_spark.queries import _t

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    us = F.expr("unix_micros(cast(ts as timestamp))")
    lo, hi = ev.agg(F.min(us), F.max(us)).first()
    pivot = lo + int((hi - lo) * cut)
    head = ev.filter(us <= pivot)
    tail = ev.filter(us > pivot)
    h1 = scd2_history(head, "user_id", "event_type", "ts", "event_id")
    merged = scd2_merge(h1, tail, "user_id", "event_type", "ts", "event_id")
    batch = scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    cols = ["user_id", "state", "valid_from", "valid_to", "version"]
    assert {tuple(r) for r in merged.select(cols).collect()} == {
        tuple(r) for r in batch.select(cols).collect()
    }


def test_scd2_merge_contract_bound_is_last_seen_not_last_point(spark):
    """Code-review r7 (third pass): head (A@10, A@20-dup) compacts to
    one point at 10 but _last_seen=20; a batch change at t=15 violates
    the strong contract (15 < 20) and CANNOT reproduce the full
    rebuild (the collapsed A@20 can't retroactively reappear) — while
    a batch at t=25 (> _last_seen) merges exactly."""
    head = spark.createDataFrame(
        [Row(k=1, s="A", t=10, i=1), Row(k=1, s="A", t=20, i=2)],
        "k int, s string, t long, i long",
    )
    h = scd2_history(head, "k", "s", "t", "i")
    assert h.select("_last_seen").first()[0] == 20  # dup advances it
    # in-contract batch: exact
    tail_ok = spark.createDataFrame(
        [Row(k=1, s="B", t=25, i=3)], "k int, s string, t long, i long"
    )
    merged = scd2_merge(h, tail_ok, "k", "s", "t", "i")
    full = scd2_history(
        head.unionByName(tail_ok), "k", "s", "t", "i"
    )
    cols = ["k", "state", "valid_from", "valid_to", "version"]
    assert {tuple(r) for r in merged.select(cols).collect()} == {
        tuple(r) for r in full.select(cols).collect()
    }
    # merged history keeps the true high-water mark
    assert merged.agg(F.max("_last_seen")).first()[0] == 25
    # contract violation: the documented divergence (A@20 is gone, so
    # the full rebuild's A-reversion at 20 cannot be reproduced)
    tail_bad = spark.createDataFrame(
        [Row(k=1, s="B", t=15, i=4)], "k int, s string, t long, i long"
    )
    merged_bad = scd2_merge(h, tail_bad, "k", "s", "t", "i")
    full_bad = scd2_history(
        head.unionByName(tail_bad), "k", "s", "t", "i"
    )
    got = {tuple(r) for r in merged_bad.select(cols).collect()}
    want = {tuple(r) for r in full_bad.select(cols).collect()}
    assert got == {(1, "A", 10, 15, 1), (1, "B", 15, None, 2)}
    assert want == {
        (1, "A", 10, 15, 1), (1, "B", 15, 20, 2), (1, "A", 20, None, 3)
    }
    assert got != want
