"""Funnel analysis (operators/funnel.py) vs an in-process oracle."""

from __future__ import annotations

import random

import pytest

from duo_spark.operators.funnel import funnel_counts, funnel_steps

STEPS = ["a", "b", "c"]


def _oracle(rows, steps, window=None):
    """Naive per-user sequential scan."""
    by_user = {}
    for u, ty, t in rows:
        by_user.setdefault(u, []).append((t, ty))
    out = {i: 0 for i in range(1, len(steps) + 1)}
    for u, evs in by_user.items():
        evs.sort()
        first = [t for t, ty in evs if ty == steps[0]]
        if not first:
            continue
        t1 = min(first)
        out[1] += 1
        prev = t1
        for i, s in enumerate(steps[1:], start=2):
            cand = [
                t for t, ty in evs
                if ty == s and t > prev and (window is None or t <= t1 + window)
            ]
            if not cand:
                break
            prev = min(cand)
            out[i] += 1
    return out


@pytest.mark.parametrize("window", [None, 50, 500])
def test_funnel_matches_oracle(spark, window):
    rng = random.Random(17)
    rows = [
        (rng.randint(0, 30), rng.choice(["a", "b", "c", "x"]), rng.randint(0, 1000))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    got = {r.step: r.users for r in
           funnel_counts(df, STEPS, window=window).collect()}
    assert got == _oracle(rows, STEPS, window)


def test_funnel_strict_order_and_window_edges(spark):
    rows = [
        (1, "a", 100), (1, "b", 100), (1, "c", 300),   # b NOT after a (tie) -> stops at 1
        (2, "a", 100), (2, "b", 150), (2, "c", 150),   # c not after b -> step 2
        (3, "a", 100), (3, "b", 150), (3, "c", 200),   # full funnel
        (4, "b", 50), (4, "c", 60),                    # never step 1
        (5, "a", 0), (5, "b", 100), (5, "c", 101),     # c at window edge (inclusive)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    got = {r.step: r.users for r in
           funnel_counts(df, STEPS, window=101).collect()}
    assert got == {1: 4, 2: 3, 3: 2}
    times = {r.user_id: (r.t1, r.t2, r.t3)
             for r in funnel_steps(df, STEPS, window=101).collect()}
    assert times[1] == (100, None, None)
    assert times[3] == (100, 150, 200)
    assert times[5] == (0, 100, 101)
    assert 4 not in times


def test_funnel_rejects_empty_steps(spark):
    df = spark.createDataFrame([(1, "a", 1)], "user_id long, event_type string, ts_us long")
    with pytest.raises(ValueError):
        funnel_counts(df, [])


# ---------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------

def test_cohort_retention_matches_oracle(spark):
    rng = random.Random(23)
    period = 100
    rows = [(rng.randint(0, 40), rng.randint(0, 1200)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")

    first = {}
    for u, t in rows:
        first[u] = min(first.get(u, t), t)
    want = {}
    for u, t in rows:
        cohort = first[u] // period
        p = t // period - cohort
        if p < 5:
            want.setdefault((cohort, p), set()).add(u)
    want = {k: len(v) for k, v in want.items()}

    from duo_spark.operators.funnel import cohort_retention
    got = {(r.cohort, r.period): r.users
           for r in cohort_retention(df, period_us=period, max_periods=5).collect()}
    assert got == want
    # period 0 of each cohort counts the whole cohort
    sizes = {}
    for u, t in first.items():
        sizes[t // period] = sizes.get(t // period, 0) + 1
    for cohort, n in sizes.items():
        assert got[(cohort, 0)] == n


# ---------------------------------------------------------------------
# streaming funnel == batch funnel on any batch schedule
# ---------------------------------------------------------------------

@pytest.mark.parametrize("split", ["half", "type", "reversed_time"])
def test_streaming_funnel_matches_batch(spark, tmp_path, split):
    """Chains straddling micro-batches — including a schedule that
    delivers LATER events first, forcing retroactive chain rewrites —
    converge to the batch funnel_steps answer."""
    import uuid
    from pyspark.sql import Window, functions as F
    from duo_spark.operators.funnel import funnel_steps
    from duo_spark.streaming.funnel import streaming_funnel_states

    rng = random.Random(31)
    rows = [(i, rng.randint(0, 20), rng.choice(["a", "b", "c", "x"]),
             rng.randint(0, 800)) for i in range(600)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long")
    src = f"{tmp_path}/in_{split}"
    if split == "half":
        first = df.filter(F.col("event_id") % 2 == 1)
        second = df.filter(F.col("event_id") % 2 == 0)
    elif split == "type":  # all later steps arrive before any first step
        first = df.filter(F.col("event_type") != "a")
        second = df.filter(F.col("event_type") == "a")
    else:  # newest half first
        first = df.filter(F.col("ts_us") >= 400)
        second = df.filter(F.col("ts_us") < 400)
    first.coalesce(1).write.parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream
              .schema("event_id long, user_id long, event_type string, ts_us long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    states = streaming_funnel_states(stream, ["a", "b", "c"])
    name = f"sf_{uuid.uuid4().hex[:8]}"
    q = (states.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/ckpt_{split}")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    final = (spark.sql(f"SELECT * FROM {name}")
             .withColumn("_rn", F.row_number().over(w)).filter("_rn = 1"))
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in final.collect()}
    want = {r.user_id: (r.t1, r.t2, r.t3)
            for r in funnel_steps(df, ["a", "b", "c"]).collect()}
    assert got == want


def test_cohort_retention_negative_timestamps(spark):
    """Regression: period indexing must FLOOR (matching the oracle's
    //), not truncate toward zero — pre-epoch events were landing in a
    double-width period around t=0."""
    from duo_spark.operators.funnel import cohort_retention

    rows = [(1, -50), (1, 30), (2, -150), (2, -50)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {(r.cohort, r.period): r.users
           for r in cohort_retention(df, period_us=100, max_periods=5).collect()}
    # user 1: first at -50 -> cohort -1; activity at -50 (p0) and 30 (p1)
    # user 2: first at -150 -> cohort -2; activity at -150 (p0), -50 (p1)
    assert got == {(-1, 0): 1, (-1, 1): 1, (-2, 0): 1, (-2, 1): 1}


def test_streaming_funnel_custom_user_col(spark, tmp_path):
    """Regression: the output key column must keep the caller's name
    and type (it was hardcoded to 'user_id bigint')."""
    import uuid
    from duo_spark.streaming.funnel import streaming_funnel_states

    df = spark.createDataFrame(
        [("u1", "a", 1), ("u1", "b", 2)], "uid string, event_type string, ts_us long")
    src = str(tmp_path / "in_custom")
    df.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema("uid string, event_type string, ts_us long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    states = streaming_funnel_states(stream, ["a", "b"], user_col="uid")
    name = f"sfc_{uuid.uuid4().hex[:8]}"
    q = (states.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckc"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert rows and rows[0].uid == "u1" and rows[0].t2 == 2


# ---------------------------------------------------------------------
# round 6: windowed streaming funnel — watermark prune + idle TTL
# ---------------------------------------------------------------------

from conftest import FakeGroupState as _FakeState  # noqa: E402 — shared fake


def _drive(update, state, rows):
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["event_type", "ts_us"])
    return list(update((1,), iter([pdf]), state))


def test_prune_lists_exact_bounds():
    from duo_spark.streaming.funnel import _prune_lists

    # t1 known: keep only (min(t1, wm), t1 + window]
    lists = [[100], [50, 100, 101, 200, 300, 301], [99, 250]]
    got = _prune_lists(lists, wm_us=150, window=200)
    assert got == [[100], [101, 200, 300], [250]]
    # no t1 yet: lower bound is the watermark alone, no upper bound
    got = _prune_lists([[], [50, 150, 900]], wm_us=100, window=200)
    assert got == [[], [150, 900]]
    # boundary: t == lower bound is dead (chain needs t STRICTLY after)
    got = _prune_lists([[100], [100, 101]], wm_us=500, window=50)
    assert got == [[100], [101]]


def test_streaming_funnel_state_bounded_under_replay():
    """VERDICT r5 #4: one hot user replaying 10k step-2 events must not
    grow state past the window span — and duplicate redeliveries
    (at-least-once sources) must not grow it at all."""
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b", "c"], "user_id", "event_type", "ts_us",
        window=100, idle_ttl_ms=None,
    )
    st = _FakeState()
    _drive(upd, st, [("a", 0)])
    for lo in range(0, 10_000, 100):
        st.wm_ms = 0  # µs-scale times: watermark stays at epoch
        _drive(upd, st, [("b", t) for t in range(lo + 1, lo + 101)])
    lists = st.get
    assert len(lists[1]) <= 100          # only times in (0, t1+100] kept
    assert len(lists[2]) == 0
    # duplicate replays: same 50 times delivered 200 times -> 50 entries
    st2 = _FakeState()
    _drive(upd, st2, [("a", 0)])
    for _ in range(200):
        _drive(upd, st2, [("b", t) for t in range(1, 51)])
    assert len(st2.get[1]) == 50


def test_streaming_funnel_lower_prune_without_t1():
    """Before any step-1 event, the watermark alone bounds the lists:
    a step-2 time at or below the watermark can never chain (any
    future t1 is >= the watermark)."""
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b"], "user_id", "event_type", "ts_us",
        window=1_000_000, idle_ttl_ms=None,
    )
    st = _FakeState()
    for lo in range(0, 10_000_000, 1_000_000):
        st.wm_ms = lo // 1000  # watermark tracks delivered time (ms)
        _drive(upd, st, [("b", t) for t in range(lo, lo + 1_000_000, 10_000)])
    assert len(st.get[1]) <= 200  # only times above the final watermark


def test_streaming_funnel_ttl_gc():
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b"], "user_id", "event_type", "ts_us",
        window=None, idle_ttl_ms=60_000,
    )
    st = _FakeState()
    _drive(upd, st, [("a", 5)])
    assert st.exists and st.ttl == 60_000
    st.hasTimedOut = True
    out = _drive(upd, st, [])
    assert st.removed and out == []


@pytest.mark.parametrize("split", ["half", "reversed_time"])
def test_streaming_funnel_windowed_matches_batch(spark, tmp_path, split):
    """The in-operator window (with watermark prune) emits exactly the
    batch funnel_steps(window=W) chains, including under a schedule
    that delivers later events first."""
    import uuid
    from pyspark.sql import Window, functions as F
    from duo_spark.operators.funnel import funnel_steps
    from duo_spark.streaming.funnel import streaming_funnel_states

    rng = random.Random(47)
    rows = [(i, rng.randint(0, 20), rng.choice(["a", "b", "c", "x"]),
             rng.randint(0, 800)) for i in range(600)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long")
    src = f"{tmp_path}/in_w_{split}"
    if split == "half":
        first = df.filter(F.col("event_id") % 2 == 1)
        second = df.filter(F.col("event_id") % 2 == 0)
    else:
        first = df.filter(F.col("ts_us") >= 400)
        second = df.filter(F.col("ts_us") < 400)
    first.coalesce(1).write.parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream
        .schema("event_id long, user_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "1 second")  # covers the full µs-scale disorder
    )
    states = streaming_funnel_states(stream, ["a", "b", "c"], window=150)
    name = f"sfw_{uuid.uuid4().hex[:8]}"
    q = (states.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/ckw_{split}")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    final = (spark.sql(f"SELECT * FROM {name}")
             .withColumn("_rn", F.row_number().over(w)).filter("_rn = 1"))
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in final.collect()}
    want = {r.user_id: (r.t1, r.t2, r.t3)
            for r in funnel_steps(df, ["a", "b", "c"], window=150).collect()}
    assert got == want


def test_streaming_funnel_windowed_without_watermark(spark, tmp_path):
    """ADVICE r6: with window set but NO upstream withWatermark,
    getCurrentWatermarkMs raises PySparkRuntimeError in pyspark 4.1.2
    — the documented fallback (prune lower bound stays 0, t1-relative
    bounds only) must actually run instead of crashing the query."""
    import uuid
    from pyspark.sql import Window, functions as F
    from duo_spark.operators.funnel import funnel_steps
    from duo_spark.streaming.funnel import streaming_funnel_states

    rng = random.Random(53)
    rows = [(i, rng.randint(0, 10), rng.choice(["a", "b", "c", "x"]),
             rng.randint(0, 800)) for i in range(300)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long")
    src = f"{tmp_path}/in_nowm"
    df.filter("event_id % 2 = 1").coalesce(1).write.parquet(src)
    df.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream
              .schema("event_id long, user_id long, event_type string, ts_us long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    states = streaming_funnel_states(stream, ["a", "b", "c"], window=150)
    name = f"sfnw_{uuid.uuid4().hex[:8]}"
    q = (states.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/cknw")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    final = (spark.sql(f"SELECT * FROM {name}")
             .withColumn("_rn", F.row_number().over(w)).filter("_rn = 1"))
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in final.collect()}
    want = {r.user_id: (r.t1, r.t2, r.t3)
            for r in funnel_steps(df, ["a", "b", "c"], window=150).collect()}
    assert got == want


class _RaisingWmState(_FakeState):
    """Emulates pyspark 4.1.2's GroupState when no watermark is set:
    getCurrentWatermarkMs raises instead of returning 0."""

    def __init__(self):
        super().__init__()
        self.timeout_ts = None

    def getCurrentWatermarkMs(self):
        raise RuntimeError(
            "getCurrentWatermarkMs can be called only when watermark is set")

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms


def test_funnel_update_survives_wm_raise():
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b"], "user_id", "event_type", "ts_us",
        window=100, idle_ttl_ms=None,
    )
    st = _RaisingWmState()
    out = _drive(upd, st, [("a", 0), ("b", 50)])
    assert st.exists and out[0].t2.iloc[0] == 50


class _EventTimeState(_FakeState):
    pass  # the shared fake already records setTimeoutTimestamp


def test_streaming_funnel_event_age_ttl():
    """VERDICT r6 #7: event-time TTL arms a timeout at (newest stored
    event + age) — watermark-driven, so it fires under availableNow
    replays where the processing-time TTL never does — and a timed-out
    user's state is dropped."""
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b"], "user_id", "event_type", "ts_us",
        window=None, idle_ttl_ms=None, event_age_ms=60_000,
    )
    st = _EventTimeState()
    _drive(upd, st, [("a", 5_000_000), ("b", 9_000_000)])
    assert st.timeout_ts == 9_000 + 60_000  # newest event (ms) + age
    # watermark already past the deadline -> arm just beyond the wm
    st.wm_ms = 1_000_000
    _drive(upd, st, [("b", 10_000_000)])
    assert st.timeout_ts == 1_000_001
    st.hasTimedOut = True
    out = _drive(upd, st, [])
    assert st.removed and out == []


def test_streaming_funnel_event_age_requires_exclusive_ttl(spark):
    import pytest as _pytest
    from duo_spark.streaming.funnel import streaming_funnel_states

    df = (spark.readStream
          .format("rate").load()
          .selectExpr("value as user_id", "'a' as event_type",
                      "value as ts_us"))
    with _pytest.raises(ValueError, match="mutually exclusive"):
        streaming_funnel_states(df, ["a", "b"], idle_ttl_ms=1000,
                                event_age_ms=1000)


def test_streaming_funnel_event_age_e2e(spark, tmp_path):
    """EventTimeTimeout end-to-end: the query runs, chains for on-time
    users are correct, and a stale user's state is dropped once the
    watermark passes their newest event by event_age_ms (observable via
    a later event restarting their funnel from scratch)."""
    import uuid
    from pyspark.sql import Window, functions as F
    from duo_spark.streaming.funnel import streaming_funnel_states

    base = 1_700_000_000_000_000  # µs epoch
    hour = 3_600_000_000
    # user 1: 'a', then nothing while the watermark sails 8h past it —
    # the 1h event-age timeout fires (in a batch where user 1 has no
    # data and the start-of-batch watermark exceeds the deadline), so
    # their late 'b' finds no state and cannot chain.
    # user 2: a,b close together -> full chain.
    batches = [
        [(1, "a", base)],
        [(2, "a", base + 8 * hour), (2, "b", base + 8 * hour + 1000)],
        [(3, "a", base + 8 * hour + 2000)],   # fires user 1's timeout
        [(1, "b", base + 8 * hour + 3000)],   # restart: no t1 -> no chain
    ]
    src = f"{tmp_path}/in_age"
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "user_id long, event_type string, ts_us long") \
            .coalesce(1).write.mode("append" if i else "overwrite").parquet(src)
    stream = (spark.readStream
              .schema("user_id long, event_type string, ts_us long")
              .option("maxFilesPerTrigger", "1").parquet(src)
              .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
              .withWatermark("ts", "1 second"))
    states = streaming_funnel_states(stream, ["a", "b"],
                                     event_age_ms=3_600_000)
    name = f"sfage_{uuid.uuid4().hex[:8]}"
    q = (states.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/ckage")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    final = (spark.sql(f"SELECT * FROM {name}")
             .withColumn("_rn", F.row_number().over(w)).filter("_rn = 1"))
    got = {r.user_id: (r.t1, r.t2) for r in final.collect()}
    assert got[2] == (base + 8 * hour, base + 8 * hour + 1000)
    # user 1's 'a' state was GC'd before their late 'b' arrived: the b
    # alone cannot start a chain, so no emission ever carries t2.
    # (seq restarts after GC, so the max-seq tie between the pre-GC
    # (base, None) emission and the restart's (None, None) is
    # arbitrary — t2 is None either way; a completed chain would have
    # won the tie with seq=2.)
    assert got[1][1] is None


def test_streaming_funnel_event_age_drops_empty_state():
    """Code-review r7: a user whose only events are late step-2+ ones
    (all pruned below the watermark, step 1 never seen) must not leave
    an UNARMED all-empty state entry behind — under EventTimeTimeout an
    unarmed key never times out, so the entry would leak forever."""
    from duo_spark.streaming.funnel import make_funnel_update

    upd = make_funnel_update(
        ["a", "b"], "user_id", "event_type", "ts_us",
        window=100, idle_ttl_ms=None, event_age_ms=60_000,
    )
    st = _EventTimeState()
    st.wm_ms = 10_000  # watermark at 10^7 us: the late event is dead
    _drive(upd, st, [("b", 5_000_000)])
    assert st.removed and not st.exists
    # and a user with surviving state still arms normally
    st2 = _EventTimeState()
    _drive(upd, st2, [("a", 20_000_000)])
    assert st2.exists and st2.timeout_ts is not None
