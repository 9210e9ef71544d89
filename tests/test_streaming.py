"""Streaming ingest pipeline (SURVEY §2.9 T1-T5): span completion
withholding, late-close emission, TTL expiry, batch/streaming parity,
and the partitioned streaming sink."""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from duo_spark.operators.spans import merge_span_records
from duo_spark.schemas import SPAN_SCHEMA
from duo_spark.streaming import replay_span_records, start_span_pipeline
from duo_spark.streaming.pipeline import SCRATCH_ROOT, _scratch

BASE = 1_700_000_000_000_000


def _rec(id, parent=None, trace=1, name="op", proc="web-0", start=BASE, end=None, tags=None):
    return (id, parent, trace, name, proc, start, end, tags)


@pytest.fixture()
def scratch():
    return _scratch("test", uuid.uuid4().hex)


def test_replay_withholds_open_spans_and_merges_closed(spark):
    records = [
        # span 1: open then close, tags from both records merge
        _rec(1, start=BASE, tags=json.dumps({"a": "1"})),
        _rec(1, parent=None, start=BASE, end=BASE + 500, tags=json.dumps({"b": "2"})),
        # span 2: open only -> withheld
        _rec(2, parent=1, start=BASE + 10),
        # span 3: single complete record
        _rec(3, parent=1, start=BASE + 20, end=BASE + 90),
    ]
    df = spark.createDataFrame(records, SPAN_SCHEMA)
    out = replay_span_records(spark, df, engine="stateful")
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 3}, "open-without-close must be withheld"
    assert rows[1].end == BASE + 500
    assert json.loads(rows[1].tags) == {"a": "1", "b": "2"}
    assert rows[1].intact and rows[3].intact
    # the fast default agrees on membership, scalars, and resolved tags
    fast = {r.id: r for r in replay_span_records(spark, df).collect()}
    assert set(fast) == {1, 3}
    assert fast[1].end == BASE + 500
    assert json.loads(fast[1].tags) == {"a": "1", "b": "2"}


@pytest.mark.parametrize("engine", ["fast", "stateful"])
def test_streaming_matches_batch_merge(spark, sf_dir, engine):
    """BOTH streaming formulations and the batch A4 operator must
    agree on the same record set (same merge rules)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(400)
    base = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("trace_id"),
        F.col("l_returnflag").alias("name"),
        F.concat(F.lit("svc-"), F.col("l_linestatus")).alias("process_id"),
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("start"),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    opens = base.select(
        "id", (F.col("id") - F.col("l_linenumber")).alias("parent_id"), "trace_id",
        "name", "process_id", "start", F.lit(None).cast("long").alias("end"),
        F.lit(None).cast("string").alias("tags"),
    )
    closes = base.filter(F.col("l_linenumber") <= 4).select(
        "id", F.lit(None).cast("long").alias("parent_id"), "trace_id", "name",
        "process_id", "start",
        (F.col("start") + F.round(F.col("l_quantity") * 1_000_000).cast("long")).alias("end"),
        F.lit(None).cast("string").alias("tags"),
    )
    records = opens.unionByName(closes)
    batch = {
        r.id: (r.parent_id, r.trace_id, r.name, r.process_id, r.start, r.end)
        for r in merge_span_records(records).collect()
    }
    stream = {
        r.id: (r.parent_id, r.trace_id, r.name, r.process_id, r.start, r.end)
        for r in replay_span_records(spark, records, engine=engine).collect()
    }
    assert batch == stream
    assert batch, "fixture must produce completed spans"


def test_late_close_emitted_on_later_microbatch(spark, scratch):
    """Cross-batch state: an open in batch 1 completes when its close
    arrives in batch 2 (duo/src/aggregator.rs withholding)."""
    src = os.path.join(scratch, "in")
    table = f"late_{uuid.uuid4().hex[:8]}"
    opens = spark.createDataFrame([_rec(7, start=BASE)], SPAN_SCHEMA)
    opens.write.mode("append").parquet(src)
    # NoTimeout: blocking drains (processAllAvailable / availableNow)
    # don't mix with ProcessingTimeTimeout — the timeout keeps the
    # micro-batch loop permanently busy (see complete_spans docstring)
    q = start_span_pipeline(
        spark, src, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), trigger_seconds=1, ttl_ms=None, engine="stateful",
    )
    try:
        q.processAllAvailable()
        assert spark.table(table).count() == 0
        closes = spark.createDataFrame([_rec(7, start=BASE, end=BASE + 777)], SPAN_SCHEMA)
        closes.write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table(table).collect()
        assert [(r.id, r.end, r.intact) for r in rows] == [(7, BASE + 777, True)]
    finally:
        q.stop()


def test_tag_merge_split_invariant_across_microbatches(spark, scratch):
    """Cross-batch tag conflicts must resolve by the global
    (start, tags) order, not arrival order: the record with the LARGER
    sort key arrives in batch 1, the smaller in batch 2 — the larger
    one must still win the key, exactly as the batch merge decides."""
    src = os.path.join(scratch, "in")
    table = f"tags_{uuid.uuid4().hex[:8]}"
    late_rec = _rec(5, start=BASE + 100, tags=json.dumps({"k": "winner", "only_late": "x"}))
    early_rec = _rec(5, start=BASE, end=BASE + 200, tags=json.dumps({"k": "loser", "only_early": "y"}))
    spark.createDataFrame([late_rec], SPAN_SCHEMA).write.mode("append").parquet(src)
    q = start_span_pipeline(
        spark, src, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), trigger_seconds=1, ttl_ms=None, engine="stateful",
    )
    try:
        q.processAllAvailable()
        assert spark.table(table).count() == 0
        spark.createDataFrame([early_rec], SPAN_SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table(table).collect()
        assert len(rows) == 1
        got = json.loads(rows[0].tags)
        batch = merge_span_records(
            spark.createDataFrame([late_rec, early_rec], SPAN_SCHEMA)
        ).collect()
        want = json.loads(batch[0].tags)
        assert got == want == {"k": "winner", "only_late": "x", "only_early": "y"}
    finally:
        q.stop()


def test_ttl_expires_abandoned_opens(spark, scratch):
    """T4 TTL (our improvement over the reference's unbounded buffer):
    an abandoned open is expelled; a close arriving after expiry starts
    a fresh merge instead of resurrecting the lost open."""
    src = os.path.join(scratch, "in")
    table = f"ttl_{uuid.uuid4().hex[:8]}"

    def _poll(predicate, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if predicate():
                return True
            time.sleep(1.0)
        return False

    spark.createDataFrame([_rec(9, start=BASE)], SPAN_SCHEMA).write.mode("append").parquet(src)
    # ProcessingTimeTimeout mode: NEVER block on processAllAvailable
    # (the pending timeout keeps the loop busy) — poll the sink instead
    q = start_span_pipeline(
        spark, src, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), trigger_seconds=1, ttl_ms=300, engine="stateful",
    )
    try:
        # feed a completed span; once it lands, batch 1 (with span 9's
        # open) has necessarily been processed
        spark.createDataFrame([_rec(10, start=BASE, end=BASE + 5)], SPAN_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        assert _poll(lambda: {r.id for r in spark.table(table).collect()} == {10})
        time.sleep(1.5)  # let the 300 ms TTL lapse; timeouts fire on later batches
        # close for the expired span: fresh partial, completes with
        # close-record data only (name/start from the close record)
        spark.createDataFrame(
            [_rec(9, start=BASE + 50, end=BASE + 99, name="late")], SPAN_SCHEMA
        ).write.mode("append").parquet(src)
        assert _poll(lambda: 9 in {r.id for r in spark.table(table).collect()})
        rows = {r.id: r for r in spark.table(table).collect()}
        assert rows[9].name == "late" and rows[9].start == BASE + 50
    finally:
        q.stop()


def test_log_pipeline_passthrough(spark, scratch):
    """Log ingest is stateless: rows flow source->sink unchanged."""
    from duo_spark.schemas import LOG_CORE_SCHEMA
    from duo_spark.streaming import start_log_pipeline

    src = os.path.join(scratch, "in")
    out = os.path.join(scratch, "log")
    rows = [("web-0", BASE, 1, 10, "INFO", "app", "main.rs", 1, "hello"),
            ("web-1", BASE + 1, 1, 11, "ERROR", "app", "db.rs", 9, "boom")]
    spark.createDataFrame(rows, LOG_CORE_SCHEMA).write.mode("append").parquet(src)
    q = start_log_pipeline(
        spark, src, out_dir=out, checkpoint_dir=os.path.join(scratch, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert {(r.process_id, r.level, r.message) for r in back.collect()} == {
        ("web-0", "INFO", "hello"), ("web-1", "ERROR", "boom"),
    }


def test_parquet_sink_layout_readable_by_store(spark, scratch):
    """T3: the streaming parquet sink writes the same
    date=/hour=/minute= layout the batch store reads (hot/cold union
    contract)."""
    from duo_spark.sources.store import PartitionedStore

    src = os.path.join(scratch, "in")
    out = os.path.join(scratch, "span")
    recs = [
        _rec(21, start=BASE, end=BASE + 10),
        _rec(22, trace=2, start=BASE + 61_000_000, end=BASE + 61_000_500),
    ]
    spark.createDataFrame(recs, SPAN_SCHEMA).write.mode("append").parquet(src)
    q = start_span_pipeline(
        spark, src, out_dir=out, checkpoint_dir=os.path.join(scratch, "ckpt"),
        available_now=True, engine="stateful",
    )
    q.awaitTermination()
    datedirs = [d for d in os.listdir(out) if d.startswith("date=")]
    assert datedirs, f"expected hive layout in {out}"
    hours = os.listdir(os.path.join(out, datedirs[0]))
    assert any(h.startswith("hour=") for h in hours)
    store = PartitionedStore(spark, scratch, granularity="minute")
    back = store.read("span")
    assert {r.id for r in back.collect()} == {21, 22}
    # two spans a minute apart -> two minute partitions
    assert back.select("minute").distinct().count() == 2


def test_streaming_sessions_match_batch(spark, scratch):
    """Streaming session_window sessions must equal the batch
    sessionization (operators/sessions.py) on the same records, even
    when one session's events arrive across different micro-batches
    (state-store session merge)."""
    import datetime as dt

    from duo_spark.operators.sessions import session_stats
    from duo_spark.streaming.sessions import streaming_session_stats

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # key 1: one session split across the two source files; a 10 s gap
    # then a second session. key 2: a lone event.
    file1 = [(1, t(0)), (1, t(4)), (2, t(30))]
    file2 = [(1, t(8)), (1, t(30)), (1, t(35))]
    schema = "k long, ts timestamp"
    src = os.path.join(scratch, "in")
    spark.createDataFrame(file1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    sess = streaming_session_stats(stream, "k", "ts", gap_seconds=10)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, r.start): (r.end, r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    batch = spark.createDataFrame(file1 + file2, schema).select(
        "k", F.unix_timestamp("ts").alias("t")
    )
    want = {}
    for r in session_stats(batch, "k", "t", 10).collect():
        start = dt.datetime.utcfromtimestamp(r.start)
        end = dt.datetime.utcfromtimestamp(r.end)  # both sides: max event time
        want[(r.k, start)] = (end, r.n_events)
    assert got == want


def test_streaming_dedup_drops_cross_batch_duplicates(spark, scratch):
    """Streaming exact dedup: a duplicate arriving in a LATER
    micro-batch (within the watermark horizon) is dropped; first
    arrival wins; distinct contents all survive."""
    import datetime as dt

    from duo_spark.streaming.dedup import streaming_dedup_exact

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    schema = "doc_id long, ts timestamp, text string"
    file1 = [(1, t(0), "the quick brown fox"), (2, t(1), "unique one")]
    file2 = [(3, t(2), "The  quick brown FOX"),  # normalized duplicate of 1
             (4, t(3), "unique two")]
    src = os.path.join(scratch, "in")
    spark.createDataFrame(file1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    deduped = streaming_dedup_exact(stream, "text", "ts", watermark="1 hour")
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == {1, 2, 4}


def test_streaming_hopping_features_cover_trailing_batch(spark, tmp_path):
    """Each event's batch trailing-72h aggregate must be bounded by its
    best hopping window (hopping is the streaming approximation; the
    window containing the event that starts latest covers at most the
    trailing window), and exact totals agree: sum over events == sum
    over slide-disjoint contributions (each event in exactly 3
    hopping windows)."""
    from duo_spark.streaming.features import streaming_hopping_features

    rows = [
        (i, 1, f"2024-01-0{1 + i % 5} 0{i % 9}:00:00", 100 + i) for i in range(20)
    ]
    src = str(tmp_path / "in")
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, cents long"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "cents")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp, cents long")
        .parquet(src)
    )
    feats = streaming_hopping_features(stream, "user_id", "ts", "cents")
    name = "sfeat_unit"
    q = (
        feats.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM {name}").collect()
    # every event in exactly window/slide=3 windows -> triple counting
    assert sum(r.n_win for r in out) == 3 * 20
    assert sum(r.sum_win for r in out) == 3 * sum(100 + i for i in range(20))
    # epoch-aligned starts at 24h multiples
    for r in out:
        assert int(r.w_start.timestamp()) % 86400 == 0


# ---------------------------------------------------------------------
# stream-stream join (streaming/joins.py)
# ---------------------------------------------------------------------

def test_streaming_join_pairs_across_batches(spark, tmp_path):
    """A span arriving in micro-batch 1 must pair with its log arriving
    in micro-batch 2 (state buffering), range bound enforced, out-of-
    range logs dropped, colliding log columns suffixed _log."""
    from duo_spark.streaming.joins import streaming_span_log_join

    base = "2024-01-01 00:00:00"
    spans_rows = [(1, 100, base), (2, 200, "2024-01-01 02:00:00")]
    logs_rows = [
        (1, "in-range", "2024-01-01 00:30:00"),   # batch 2, joins span batch 1
        (1, "too-late", "2024-01-05 00:00:00"),   # outside 1-hour window
        (3, "no-span", "2024-01-01 00:10:00"),    # no matching span
        (2, "same-batch", "2024-01-01 02:30:00"),
    ]
    sdir, ldir = str(tmp_path / "spans"), str(tmp_path / "logs")
    spark.createDataFrame(spans_rows, "trace_id long, id long, start_ts string") \
        .withColumn("start_ts", F.col("start_ts").cast("timestamp")) \
        .coalesce(1).write.parquet(sdir)
    ldf = spark.createDataFrame(logs_rows, "trace_id long, msg string, time_ts string") \
        .withColumn("time_ts", F.col("time_ts").cast("timestamp"))
    # two file drops: first only the trace-2 log, then the rest
    ldf.filter(F.col("trace_id") == 2).coalesce(1).write.parquet(ldir)
    ldf.filter(F.col("trace_id") != 2).coalesce(1).write.mode("append").parquet(ldir)

    spans = (spark.readStream.schema("trace_id long, id long, start_ts timestamp")
             .option("maxFilesPerTrigger", "1").parquet(sdir))
    logs = (spark.readStream.schema("trace_id long, msg string, time_ts timestamp")
            .option("maxFilesPerTrigger", "1").parquet(ldir))
    out = streaming_span_log_join(spans, logs, window="1 hour", watermark="10 minutes")

    name = "sjoin_unit"
    q = (out.writeStream.format("memory").queryName(name).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = sorted((r.trace_id, r.id, r.msg) for r in rows)
    assert got == [(1, 100, "in-range"), (2, 200, "same-batch")]


def test_streaming_incremental_dedup_equals_batch(spark, tmp_path, docs_small=None):
    """3-batch replay of a corpus through the foreachBatch incremental
    LSH pipeline must yield EXACTLY the one-shot batch pair set —
    each pair found once, in the batch of its later member."""
    from duo_spark.operators import dedup as ddp
    from duo_spark.streaming.dedup import streaming_incremental_near_dup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text")
    src = str(tmp_path / "in")
    for k in (0, 1, 2):  # three uneven file drops
        docs.filter(F.col("doc_id") % 3 == k).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = streaming_incremental_near_dup(
        stream, "doc_id", "text",
        index_dir=str(tmp_path / "idx"), pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.5)
    q.awaitTermination()
    got = {(r.id_a, r.id_b): round(r.jaccard, 6)
           for r in spark.read.parquet(str(tmp_path / "pairs")).collect()}
    want = {(r.id_a, r.id_b): round(r.jaccard, 6)
            for r in ddp.minhash_near_duplicates(
                docs, "doc_id", "text", threshold=0.5).collect()}
    assert got == want and len(got) > 0


def test_streaming_enrich_static_rebroadcast(spark, tmp_path):
    """Stream-static left join: every batch sees the dimension;
    unmatched stream rows keep NULLs; plan never shuffles the stream."""
    from duo_spark.streaming.joins import streaming_enrich_static

    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "k long, tier string")
    rows = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9)], "event long, k long")
    src = str(tmp_path / "in")
    rows.filter(F.col("event") != 12).coalesce(1).write.parquet(src)
    rows.filter(F.col("event") == 12).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("event long, k long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = streaming_enrich_static(stream, dim, on="k", how="left")
    q = (out.writeStream.format("memory").queryName("senr_unit")
         .outputMode("append").option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.event, r.tier) for r in spark.sql("SELECT * FROM senr_unit").collect()}
    assert got == {(10, "gold"), (11, "silver"), (12, None)}


def test_streaming_incremental_dedup_replay_idempotent(spark, tmp_path):
    """Crash-replay safety: re-processing the SAME batches against an
    index that already contains their rows (checkpoint lost after the
    index append — the replay scenario) must reproduce the identical
    pair set. Before round 5's batch<batch_id index filter, the replay
    re-probed its own band rows and double-emitted every batch-internal
    pair."""
    from duo_spark.streaming.dedup import streaming_incremental_near_dup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text")
    src = str(tmp_path / "in")
    for k in (0, 1):
        docs.filter(F.col("doc_id") % 2 == k).coalesce(1) \
            .write.mode("append").parquet(src)

    def run(ckpt):
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = streaming_incremental_near_dup(
            stream, "doc_id", "text",
            index_dir=str(tmp_path / "idx"), pairs_dir=str(tmp_path / "pairs"),
            checkpoint_dir=str(tmp_path / ckpt), threshold=0.5)
        q.awaitTermination()
        return sorted(
            (r.id_a, r.id_b)
            for r in spark.read.parquet(str(tmp_path / "pairs")).collect())

    first = run("ckpt1")
    # fresh checkpoint, same index/pairs dirs: batch ids restart at 0,
    # replaying both batches against the already-appended index
    second = run("ckpt2")
    assert len(first) == len(set(first))          # no duplicate pairs
    assert second == first                        # replay reproduces exactly


def test_streaming_rollup_equals_batch_and_replays(spark, tmp_path):
    """The versioned rollup equals the one-shot batch GROUP BY after a
    multi-batch drain, and a full replay with a fresh checkpoint (the
    crash-recovery scenario: versions already on disk) converges to
    the same table instead of double-counting."""
    from duo_spark.streaming.rollup import read_rollup, streaming_rollup

    rows = [(i, f"t{i % 3}", 10 + i, i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id long, k string, ts long, v long")
    src = str(tmp_path / "in")
    for m in (0, 1, 2):
        df.filter(F.col("event_id") % 3 == m).coalesce(1) \
            .write.mode("append").parquet(src)

    def run(ckpt):
        stream = (spark.readStream.schema("event_id long, k string, ts long, v long")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = streaming_rollup(
            stream, ["k"],
            {"n": ("count", "event_id"), "sv": ("sum", "v"),
             "lo": ("min", "ts"), "hi": ("max", "ts")},
            out_dir=str(tmp_path / "roll"), checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination()
        return {r.k: (r.n, r.sv, r.lo, r.hi)
                for r in read_rollup(spark, str(tmp_path / "roll")).collect()}

    want = {r.k: (r.n, r.sv, r.lo, r.hi) for r in
            df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
                F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()}
    assert run("ck1") == want
    assert run("ck2") == want      # full replay over existing versions

    import pytest
    with pytest.raises(ValueError, match="unsupported"):
        streaming_rollup(df, ["k"], {"bad": ("avg", "v")}, "x", "y")


def test_streaming_rollup_null_sum_schedule_independent(spark, tmp_path):
    """Regression: an all-NULL sum column must stay NULL after any
    number of merge rounds (the coalesce-to-0 merge made the result
    depend on the batch schedule)."""
    from duo_spark.streaming.rollup import read_rollup, streaming_rollup

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 7)],
        "event_id long, k string, v long")
    src = str(tmp_path / "in")
    df.filter("event_id = 1").coalesce(1).write.mode("append").parquet(src)
    df.filter("event_id >= 2").coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("event_id long, k string, v long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = streaming_rollup(
        stream, ["k"], {"sv": ("sum", "v")},
        out_dir=str(tmp_path / "roll"), checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination()
    got = {r.k: r.sv for r in read_rollup(spark, str(tmp_path / "roll")).collect()}
    assert got == {"a": None, "b": 7}


# ---------------------------------------------------------------------
# round 7: T4-fast — JVM-side foreachBatch span completion
# ---------------------------------------------------------------------

def _fast_records(spark, sf_dir, n=400):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(n)
    base = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("trace_id"),
        F.col("l_returnflag").alias("name"),
        F.concat(F.lit("svc-"), F.col("l_linestatus")).alias("process_id"),
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("start"),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    opens = base.select(
        "id", (F.col("id") - F.col("l_linenumber")).alias("parent_id"), "trace_id",
        "name", "process_id", "start", F.lit(None).cast("long").alias("end"),
        F.to_json(F.struct(F.col("l_linenumber").cast("string").alias("line"))).alias("tags"),
    )
    closes = base.filter(F.col("l_linenumber") <= 4).select(
        "id", F.lit(None).cast("long").alias("parent_id"), "trace_id", "name",
        "process_id", "start",
        (F.col("start") + F.round(F.col("l_quantity") * 1_000_000).cast("long")).alias("end"),
        F.to_json(F.struct(F.lit("yes").alias("closed"))).alias("tags"),
    )
    return opens.unionByName(closes)


@pytest.mark.parametrize("split", ["half", "open_close", "reversed"])
def test_fast_merge_matches_batch(spark, sf_dir, scratch, split):
    """streaming_span_merge_fast ≡ merge_span_records on any batch
    schedule that delivers opens no later than closes per id —
    including cross-batch tag-key conflicts (tags resolve by the
    global (start, json) order, not arrival order)."""
    from duo_spark.streaming.merge import read_completed, read_open, streaming_span_merge_fast

    records = _fast_records(spark, sf_dir)
    src = os.path.join(scratch, f"in_{split}")
    if split == "half":
        parts = [records.filter("id % 2 = 0"), records.filter("id % 2 = 1")]
    elif split == "open_close":  # all opens, then all closes
        parts = [records.filter("end IS NULL"), records.filter("end IS NOT NULL")]
    else:  # id-descending halves
        parts = [records.filter("trace_id >= 50"), records.filter("trace_id < 50")]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, f"out_{split}")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, f"ck_{split}"))
    q.awaitTermination()
    got = {r.id: (r.parent_id, r.trace_id, r.name, r.process_id,
                  r.start, r.end, json.loads(r.tags))
           for r in read_completed(spark, out).collect()}
    want = {r.id: (r.parent_id, r.trace_id, r.name, r.process_id,
                   r.start, r.end, json.loads(r.tags))
            for r in merge_span_records(records).collect()}
    assert got == want and want
    # the open table holds exactly the never-closed ids
    open_ids = {r.id for r in read_open(spark, out).collect()}
    all_ids = {r.id for r in records.select("id").distinct().collect()}
    assert open_ids == all_ids - set(want)


def test_fast_merge_replay_idempotent(spark, sf_dir, scratch):
    """A replayed micro-batch (fresh checkpoint over the same source —
    every batch re-runs with the state dirs already populated) must not
    double-emit or corrupt the open table: versioned deltas overwrite
    their own batch id and re-merge into the true predecessor."""
    from duo_spark.streaming.merge import read_completed, streaming_span_merge_fast

    records = _fast_records(spark, sf_dir, n=200)
    src = os.path.join(scratch, "in_replay")
    records.filter("id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    records.filter("id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, "out_replay")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, "ck1"))
    q.awaitTermination()
    first = {(r.id, r.end) for r in read_completed(spark, out).collect()}
    # full replay: new checkpoint, same source, same state dirs
    stream2 = (spark.readStream.schema(SPAN_SCHEMA)
               .option("maxFilesPerTrigger", "1").parquet(src))
    q2 = streaming_span_merge_fast(stream2, out, os.path.join(scratch, "ck2"))
    q2.awaitTermination()
    second = {(r.id, r.end) for r in read_completed(spark, out).collect()}
    assert second == first
    rows = read_completed(spark, out).groupBy("id").count().filter("count > 1").count()
    assert rows == 0, "replay must not duplicate completed spans"


def test_fast_merge_compaction_preserves_results(spark, sf_dir, scratch):
    """compact_completed folds old delta versions into one snapshot
    without changing read_completed's result, keeps the newest
    retain_latest deltas as-is (replay safety), and a second compact
    with nothing new is a no-op."""
    from duo_spark.streaming.merge import (
        compact_completed, read_completed, streaming_span_merge_fast,
    )
    from duo_spark.streaming.rollup import _version_ids

    records = _fast_records(spark, sf_dir, n=300)
    src = os.path.join(scratch, "in_compact")
    for m in range(4):
        records.filter(f"id % 4 = {m}").coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, "out_compact")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, "ckc"))
    q.awaitTermination()
    before = {(r.id, r.end, r.tags) for r in read_completed(spark, out).collect()}
    n_deltas = len(_version_ids(spark, f"{out}/completed"))
    assert n_deltas >= 4
    upto = compact_completed(spark, out, retain_latest=2)
    assert upto is not None
    after = {(r.id, r.end, r.tags) for r in read_completed(spark, out).collect()}
    assert after == before
    # reader grace (round 13): the FIRST compaction defers deletion a
    # full cycle — folded deltas stay on disk (read_completed ignores
    # them by version id), and only the NEXT compaction drops state
    # the previous snapshot already superseded
    kept = _version_ids(spark, f"{out}/completed")
    assert all(v <= upto for v in kept[:-2]) and len(kept) == n_deltas
    assert _version_ids(spark, f"{out}/compacted") == [upto]
    # nothing new below the retain window: the fold is a no-op, but
    # the second call executes the DEFERRED deletion — the folded
    # deltas drop now that their reader grace has elapsed
    assert compact_completed(spark, out, retain_latest=2) is None
    kept2 = _version_ids(spark, f"{out}/completed")
    assert len(kept2) == 2 and all(v > upto for v in kept2)
    assert {(r.id, r.end, r.tags)
            for r in read_completed(spark, out).collect()} == before


def test_fast_merge_open_max_age_gc(spark, scratch):
    """open_max_age_us drops abandoned opens once the event-time
    high-water mark passes them by the age — deterministic GC (the T4
    TTL analog for the foreachBatch formulation): batch 2's fresh
    events advance the watermark, expiring batch 1's orphan open; the
    close that still arrives within age completes normally."""
    from duo_spark.streaming.merge import (
        read_completed, read_open, streaming_span_merge_fast,
    )

    hour = 3_600_000_000
    b1 = [_rec(1, start=BASE),                      # will be abandoned
          _rec(2, start=BASE + hour - 1000)]        # closes in b2, inside age
    b2 = [_rec(2, start=BASE + hour - 1000, end=BASE + hour + 500),
          _rec(3, start=BASE + 3 * hour),           # fresh open, advances wm
          _rec(3, start=BASE + 3 * hour, end=BASE + 3 * hour + 10)]
    src = os.path.join(scratch, "in_gc")
    spark.createDataFrame(b1, SPAN_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, SPAN_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, "out_gc")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, "ckgc"),
                                  open_max_age_us=hour)
    q.awaitTermination()
    done = {r.id: r.end for r in read_completed(spark, out).collect()}
    assert done == {2: BASE + hour + 500, 3: BASE + 3 * hour + 10}
    # span 1's open (age > 1h behind the 3h watermark) was GC'd
    assert {r.id for r in read_open(spark, out).collect()} == set()


def test_fast_merge_late_duplicate_close_first_completion_wins(spark, scratch):
    """Code-review r7: a close arriving AFTER its span completed used
    to re-emit a partial row into a later delta (the id is gone from
    the open table, so there is nothing to merge into) — read_completed
    now dedups by id keeping the LOWEST version, the row merged while
    the open state was present."""
    from duo_spark.streaming.merge import (
        compact_completed, read_completed, streaming_span_merge_fast,
    )

    src = os.path.join(scratch, "in_late")
    open_rec = [_rec(1, parent=10, end=None, tags='{"k":"open"}')]
    close_rec = [_rec(1, end=BASE + 5, tags='{"k":"close"}')]
    late_dup = [_rec(1, name="stray", end=BASE + 99, tags='{"k":"late"}')]
    for batch in (open_rec, close_rec, late_dup):
        spark.createDataFrame(batch, SPAN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, "out_late")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, "ck_late"))
    q.awaitTermination()
    rows = read_completed(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    # the first completion's merge (open+close fields), not the stray's
    assert (r.parent_id, r.name, r.end) == (10, "op", BASE + 5)
    # compaction folds the duplicate away too (snapshot stays deduped)
    compact_completed(spark, out, retain_latest=0)
    rows = read_completed(spark, out).collect()
    assert len(rows) == 1 and rows[0].end == BASE + 5


def test_fast_merge_compaction_rename_failure_deletes_nothing(
    spark, scratch, monkeypatch
):
    """Code-review r7: Hadoop fs.rename signals failure by RETURNING
    FALSE — compact_completed used to ignore it and delete the old
    snapshot plus all folded deltas anyway, losing completed spans. A
    failed rename must now raise and leave every version intact."""
    import duo_spark.streaming.rollup as rollup
    from duo_spark.streaming.merge import (
        compact_completed, read_completed, streaming_span_merge_fast,
    )
    from duo_spark.streaming.rollup import _version_ids

    records = _fast_records(spark, sf_dir="/root/testdata/sf0.001", n=60)
    src = os.path.join(scratch, "in_race")
    for p in (records.filter("id % 2 = 0"), records.filter("id % 2 = 1")):
        p.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SPAN_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = os.path.join(scratch, "out_race")
    q = streaming_span_merge_fast(stream, out, os.path.join(scratch, "ck_race"))
    q.awaitTermination()
    before = {(r.id, r.end) for r in read_completed(spark, out).collect()}
    deltas = sorted(_version_ids(spark, f"{out}/completed"))
    assert deltas

    class _RenameFailsFs:
        """Proxy over the real Hadoop FileSystem: rename reports
        failure (false), everything else passes through."""

        def __init__(self, fs):
            self._fs = fs

        def rename(self, a, b):  # noqa: ARG002
            return False

        def __getattr__(self, name):
            return getattr(self._fs, name)

    real_fs = rollup._fs
    monkeypatch.setattr(
        rollup, "_fs",
        lambda sp, path: (
            (_RenameFailsFs(real_fs(sp, path)[0]), real_fs(sp, path)[1])
        ),
    )
    with pytest.raises(RuntimeError, match="rename"):
        compact_completed(spark, out, retain_latest=0)
    monkeypatch.setattr(rollup, "_fs", real_fs)
    # nothing was deleted by the failed attempt
    assert sorted(_version_ids(spark, f"{out}/completed")) == deltas
    assert compact_completed(spark, out, retain_latest=0) == deltas[-1]
    assert {(r.id, r.end) for r in read_completed(spark, out).collect()} == before


# round 8: the fast merge is the pipeline DEFAULT (VERDICT r7 #4)
# ---------------------------------------------------------------------


def test_fast_pipeline_is_default_and_emits_late_close(spark, scratch):
    """Default-engine memory-mode pipeline: an open in batch 1
    completes when its close arrives in batch 2 (cross-batch open
    state), readable via spark.table throughout."""
    src = os.path.join(scratch, "in")
    table = f"fastlate_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([_rec(7, start=BASE)], SPAN_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    q = start_span_pipeline(
        spark, src, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), trigger_seconds=1,
    )
    try:
        q.processAllAvailable()
        assert spark.table(table).count() == 0
        spark.createDataFrame(
            [_rec(7, start=BASE, end=BASE + 777)], SPAN_SCHEMA
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table(table).collect()
        assert [(r.id, r.end) for r in rows] == [(7, BASE + 777)]
    finally:
        q.stop()


def test_fast_pipeline_memory_table_resolves_with_empty_source(spark, scratch):
    """Zero staged files: the memory table must still resolve (the
    engine pre-registers an empty view before the first batch)."""
    src = os.path.join(scratch, "in")
    os.makedirs(src, exist_ok=True)
    # the file source needs at least the dir; write nothing into it
    spark.createDataFrame([], SPAN_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(scratch, "seed")
    )  # unrelated dir just to exercise scratch
    table = f"fastempty_{uuid.uuid4().hex[:8]}"
    q = start_span_pipeline(
        spark, src, memory_mode=True, memory_table=table,
        checkpoint_dir=os.path.join(scratch, "ckpt"), available_now=True,
    )
    q.awaitTermination()
    assert spark.table(table).count() == 0


def test_fast_pipeline_persistent_layout_and_compacted_snapshot(spark, scratch):
    """Default-engine persistent pipeline (round-8 probe-19 shape):
    completed deltas are FLAT per-batch writes carrying the K1
    partition columns as data (a per-batch partitionBy fans every
    batch across every calendar dir — 13× slower on a date-spread
    workload); compaction pays the fan-out once, producing a real
    date=/hour=/minute= snapshot; read_completed is identical before
    and after; withheld opens stay out."""
    from duo_spark.streaming.merge import compact_completed, read_completed

    src = os.path.join(scratch, "in")
    out = os.path.join(scratch, "span")
    recs = [
        _rec(21, start=BASE, end=BASE + 10),
        _rec(22, trace=2, start=BASE + 61_000_000, end=BASE + 61_000_500),
        _rec(23, trace=3, start=BASE + 5),  # open only -> withheld
    ]
    spark.createDataFrame(recs, SPAN_SCHEMA).write.mode("append").parquet(src)
    q = start_span_pipeline(
        spark, src, out_dir=out, checkpoint_dir=os.path.join(scratch, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    vdirs = [d for d in os.listdir(os.path.join(out, "completed")) if d.startswith("v=")]
    assert vdirs, f"expected versioned deltas in {out}/completed"
    inner = os.listdir(os.path.join(out, "completed", vdirs[0]))
    # deltas are FLAT: parquet files, no per-batch calendar dirs
    assert not any(d.startswith("date=") for d in inner), inner
    back = read_completed(spark, out)
    assert {r.id for r in back.collect()} == {21, 22}
    minutes = {r.minute for r in back.select("minute").distinct().collect()}
    assert all(isinstance(m, str) for m in minutes) and len(minutes) == 2
    before = {(r.id, r.end, r.date, r.minute) for r in back.collect()}
    # compaction produces the REAL partitioned snapshot
    assert compact_completed(spark, out, retain_latest=0) is not None
    snap = os.listdir(os.path.join(out, "compacted"))
    vsnap = [d for d in snap if d.startswith("v=")]
    assert vsnap and any(
        d.startswith("date=")
        for d in os.listdir(os.path.join(out, "compacted", vsnap[0]))
    )
    after = {(r.id, r.end, r.date, r.minute)
             for r in read_completed(spark, out).collect()}
    assert after == before


def test_fast_pipeline_empty_completed_batch_readable(spark, scratch):
    """A persistent-mode batch that completes nothing writes an EMPTY
    (flat, schema-carrying) completed version — readable, zero rows;
    the open state advances, and the late close in the next drain
    completes the span."""
    from duo_spark.streaming.merge import read_completed

    src = os.path.join(scratch, "in")
    out = os.path.join(scratch, "span")
    ckpt = os.path.join(scratch, "ckpt")
    spark.createDataFrame([_rec(31, start=BASE)], SPAN_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    q = start_span_pipeline(
        spark, src, out_dir=out, checkpoint_dir=ckpt, available_now=True
    )
    q.awaitTermination()
    assert read_completed(spark, out).count() == 0
    assert [d for d in os.listdir(os.path.join(out, "open")) if d.startswith("v=")]
    spark.createDataFrame(
        [_rec(31, start=BASE, end=BASE + 99)], SPAN_SCHEMA
    ).write.mode("append").parquet(src)
    q = start_span_pipeline(
        spark, src, out_dir=out, checkpoint_dir=ckpt, available_now=True
    )
    q.awaitTermination()
    got = {(r.id, r.end) for r in read_completed(spark, out).collect()}
    assert got == {(31, BASE + 99)}


def test_engine_serves_spans_from_fast_store(spark, scratch):
    """DuoEngine default (span_engine='fast') end-to-end: drain staged
    records persistently, query spans() back."""
    from duo_spark.engine import DuoEngine

    data_dir = os.path.join(scratch, "data")
    eng = DuoEngine(spark, data_dir, trigger_seconds=1)
    # empty engine is queryable
    assert eng.spans().count() == 0
    src = eng.span_source
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [_rec(41, start=BASE, end=BASE + 10, tags=json.dumps({"k": "v"})),
         _rec(42, start=BASE + 20)],
        SPAN_SCHEMA,
    ).write.mode("append").parquet(src)
    eng.drain()
    rows = {r.id: r for r in eng.spans().collect()}
    assert set(rows) == {41}
    assert json.loads(rows[41].tags) == {"k": "v"}


def test_streaming_hll_rollup_bit_identical_to_batch_sketch(spark, scratch, sf_dir):
    """Round 8 (VERDICT r7 #6): the streamed register merge must be
    BIT-identical to sketching the whole table at once, on any batch
    split — max is associative+commutative."""
    from duo_spark.operators.sketch import hll_sketch
    from duo_spark.streaming.rollup import read_rollup, streaming_hll_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    for split, mod in (("a", 2), ("b", 3)):
        src = os.path.join(scratch, f"in_{split}")
        for i in range(mod):
            ev.filter(F.col("event_id") % mod == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema("event_id long, event_type string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = os.path.join(scratch, f"roll_{split}")
        q = streaming_hll_rollup(
            stream, ["event_type"], "user_id",
            out_dir=out, checkpoint_dir=os.path.join(scratch, f"ck_{split}"),
        )
        q.awaitTermination()
        got = {
            (r.event_type, r.bucket, r.register)
            for r in read_rollup(spark, out).collect()
        }
        want = {
            (r.event_type, r.bucket, r.register)
            for r in hll_sketch(ev, ["event_type"], "user_id").collect()
        }
        assert got == want and got, split


def test_streaming_cms_rollup_additive_merge_equals_batch(spark, scratch, sf_dir):
    """The streamed CMS register table (sum merge) equals the one-shot
    sketch: register counts are exact integer sums."""
    from duo_spark.operators.sketch import cms_sketch
    from duo_spark.streaming.rollup import read_rollup, streaming_cms_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    src = os.path.join(scratch, "cms_in")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = os.path.join(scratch, "cms_roll")
    q = streaming_cms_rollup(
        stream, "user_id", out_dir=out,
        checkpoint_dir=os.path.join(scratch, "cms_ck"), w=256, d=4,
    )
    q.awaitTermination()
    got = {(r.row, r.bucket, r["count"]) for r in read_rollup(spark, out).collect()}
    want = {
        (r.row, r.bucket, r["count"])
        for r in cms_sketch(ev, "user_id", w=256, d=4).collect()
    }
    assert got == want and got


def test_streaming_moments_rollup_equals_batch_sketch(spark, scratch, sf_dir):
    """Round 8: the streamed moments merge (sum/min/max per column) is
    EXACTLY the one-shot sketch — decimal sums are order-free."""
    from duo_spark.operators.sketch import moments_sketch
    from duo_spark.streaming.rollup import read_rollup, streaming_moments_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    src = os.path.join(scratch, "mom_in")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = os.path.join(scratch, "mom_roll")
    q = streaming_moments_rollup(
        stream, ["event_type"], "value",
        out_dir=out, checkpoint_dir=os.path.join(scratch, "mom_ck"),
    )
    q.awaitTermination()
    got = {
        r.event_type: (r.n, r.vmin, r.vmax, r.m1, r.m2, r.m3, r.m4)
        for r in read_rollup(spark, out).collect()
    }
    want = {
        r.event_type: (r.n, r.vmin, r.vmax, r.m1, r.m2, r.m3, r.m4)
        for r in moments_sketch(ev, ["event_type"], "value").collect()
    }
    assert got == want and got


def test_engine_compact_folds_fast_span_deltas(spark, scratch):
    """DuoEngine.compact() (round 8): repeated drains leave multiple
    completed delta versions; compaction folds the old ones into a
    snapshot, and spans() reads the identical row set after."""
    from duo_spark.engine import DuoEngine

    data_dir = os.path.join(scratch, "data")
    eng = DuoEngine(spark, data_dir, trigger_seconds=1)
    src = eng.span_source
    os.makedirs(src, exist_ok=True)
    for i in range(4):
        spark.createDataFrame(
            [_rec(100 + i, start=BASE + i, end=BASE + i + 10)], SPAN_SCHEMA
        ).write.mode("append").parquet(src)
        eng.drain()
    span_root = eng.store.table_path("span")
    n_before = len([d for d in os.listdir(os.path.join(span_root, "completed"))
                    if d.startswith("v=")])
    assert n_before >= 3
    before = {(r.id, r.end) for r in eng.spans().collect()}
    eng.compact(retain_latest=1)
    assert os.path.isdir(os.path.join(span_root, "compacted"))
    # round-13 reader grace: the first compact folds but DEFERS the
    # delta deletion one cycle; the second executes it
    eng.compact(retain_latest=1)
    n_after = len([d for d in os.listdir(os.path.join(span_root, "completed"))
                   if d.startswith("v=")])
    assert n_after < n_before
    after = {(r.id, r.end) for r in eng.spans().collect()}
    assert after == before == {(100 + i, BASE + i + 10) for i in range(4)}


def test_fast_merge_processor_replay_is_idempotent(spark, scratch):
    """Crash-replay semantics, tested DIRECTLY: re-running a batch id
    against the same state dirs (what Structured Streaming does after
    a crash between the sink write and the checkpoint commit) must
    leave completed/open state identical — versions overwrite, the
    predecessor open version is still present to merge into."""
    from duo_spark.streaming.merge import fast_merge_processor, read_completed, read_open

    out = os.path.join(scratch, "state")
    proc = fast_merge_processor(out, partition_completed=True)
    b0 = spark.createDataFrame(
        [_rec(1, start=BASE), _rec(2, start=BASE + 1, end=BASE + 50)], SPAN_SCHEMA
    )
    b1 = spark.createDataFrame(
        [_rec(1, start=BASE, end=BASE + 99)], SPAN_SCHEMA
    )
    proc(b0, 0)
    proc(b0, 0)  # replay of batch 0 BEFORE batch 1 ran
    proc(b1, 1)
    proc(b1, 1)  # replay of batch 1
    got = {(r.id, r.end) for r in read_completed(spark, out).collect()}
    assert got == {(2, BASE + 50), (1, BASE + 99)}
    assert read_open(spark, out).count() == 0
