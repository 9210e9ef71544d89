"""Interval join / concurrency (operators/intervals.py).

Reference parity: duo has no interval operators (spans are assembled
per-trace in `duo/src/web/services.rs` but never joined on time);
these tests pin the *distributed* formulations — bucketed equi-join
and sweep line — against naive oracles computed in-process.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duo_spark.operators.intervals import interval_join, max_concurrency, overlap_pairs


@pytest.fixture(scope="module")
def ivals(spark):
    """~300 random closed intervals over 3 keys with wildly mixed
    durations (1 µs dots to multi-bucket monsters)."""
    rng = random.Random(11)
    rows = []
    for i in range(300):
        k = f"k{rng.randint(0, 2)}"
        s = rng.randint(0, 10_000)
        d = rng.choice([0, 1, 5, 50, 500, 5_000])
        rows.append((k, i, s, s + d))
    return spark.createDataFrame(rows, "key string, id long, start long, end long")


def _naive_pairs(rows):
    out = set()
    for a in rows:
        for b in rows:
            if a.key == b.key and a.id < b.id and a.start <= b.end and b.start <= a.end:
                out.add((a.key, a.id, b.id))
    return out


@pytest.mark.parametrize("width", [7, 100, 1_000, 100_000])
def test_overlap_pairs_exactly_once_any_width(spark, ivals, width):
    """The bucketed join emits every overlapping pair EXACTLY once,
    for bucket widths smaller than, near, and far larger than the
    interval lengths."""
    rows = ivals.collect()
    want = _naive_pairs(rows)
    got = overlap_pairs(ivals, key="key", id_col="id", bucket_width=width).collect()
    got_keys = [(r.key, r.id, r.id_r) for r in got]
    assert len(got_keys) == len(set(got_keys)), "duplicate pair emitted"
    assert set(got_keys) == want


def test_overlap_us_is_exact(spark, ivals):
    got = overlap_pairs(ivals, key="key", id_col="id", bucket_width=100).collect()
    by_id = {r.id: r for r in ivals.collect()}
    for r in got:
        a, b = by_id[r.id], by_id[r.id_r]
        assert r.overlap_us == min(a.end, b.end) - max(a.start, b.start)
        assert r.overlap_us >= 0


def test_interval_join_left_right_roles(spark):
    """Asymmetric left/right inputs: right payload is suffixed, key
    kept once, non-overlapping pairs absent."""
    left = spark.createDataFrame(
        [("a", 1, 0, 10), ("a", 2, 50, 60)], "key string, id long, start long, end long"
    )
    right = spark.createDataFrame(
        [("a", 7, 10, 20), ("a", 8, 100, 110)],
        "key string, rid long, start long, end long",
    )
    out = interval_join(left, right, on="key", bucket_width=8).collect()
    assert [(r.id, r.rid_r) for r in out] == [(1, 7)]
    assert set(out[0].asDict()) == {"key", "id", "start", "end", "rid_r", "start_r", "end_r"}


def test_interval_join_rejects_bad_width(spark, ivals):
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(ivals, ivals, on="key", bucket_width=0)


def test_max_concurrency_matches_sweep(spark, ivals):
    rows = ivals.collect()
    want = {}
    for k in {r.key for r in rows}:
        events = []
        for r in rows:
            if r.key == k:
                events.append((r.start, 1))
                events.append((r.end + 1, -1))
        run = peak = 0
        for _, d in sorted(events, key=lambda e: (e[0], -e[1])):
            run += d
            peak = max(peak, run)
        want[k] = peak
    got = {r.key: r.peak for r in max_concurrency(ivals, key="key").collect()}
    assert got == want


def test_max_concurrency_closed_interval_touch(spark):
    """A span ending at t overlaps one starting at t (closed
    intervals): peak 2, not 1."""
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 10, 20)], "key string, start long, end long"
    )
    assert max_concurrency(df, key="key").collect()[0].peak == 2


def test_max_concurrency_methods_agree(spark, ivals):
    """Chunked two-level sweep == per-key window sweep, across chunk
    counts that force keys to straddle partition boundaries."""
    want = {r.key: r.peak for r in
            max_concurrency(ivals, key="key", method="window").collect()}
    for n in (2, 5, 17):
        got = {r.key: r.peak for r in
               max_concurrency(ivals, key="key", method="chunked",
                               num_partitions=n).collect()}
        assert got == want, n
    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        max_concurrency(ivals, key="key", method="nope")


def test_max_concurrency_chunked_tie_at_boundary(spark):
    """Massive same-timestamp event group spanning chunk boundaries:
    the (key, t, d desc) range split keeps opens before closes, so the
    peak is exact."""
    rows = [("k", 100, 100 + i % 3) for i in range(500)]  # all open at t=100
    df = spark.createDataFrame(rows, "key string, start long, end long")
    got = max_concurrency(df, key="key", method="chunked", num_partitions=8).collect()
    assert got[0].peak == 500


def test_max_concurrency_digit_prefixed_keys(spark):
    """Composite (pid, key) offset keys must be unambiguous: with the
    old separator-less encoding, pid=1/key="2api" and pid=12/key="api"
    collided ("12api"), swapping offsets or raising duplicate-map-key.
    Many digit-prefixed keys across many chunks force such collisions
    if the encoding is ambiguous."""
    rng = random.Random(7)
    keys = [f"{d}api" for d in ["", "1", "2", "12", "21", "112"]]
    rows = []
    for i, k in enumerate(keys):
        for j in range(80):
            s = rng.randint(0, 1_000)
            rows.append((k, s, s + rng.randint(0, 200)))
    df = spark.createDataFrame(rows, "key string, start long, end long")
    want = {r.key: r.peak for r in
            max_concurrency(df, key="key", method="window").collect()}
    for n in (2, 13, 32):
        got = {r.key: r.peak for r in
               max_concurrency(df, key="key", method="chunked",
                               num_partitions=n).collect()}
        assert got == want, n


def test_interval_join_negative_timestamps(spark):
    """Floor (not truncate-toward-zero) bucketing: intervals straddling
    t=0 and fully-negative intervals still pair exactly once at every
    width."""
    rows = [("a", i, s, s + d) for i, (s, d) in enumerate(
        [(-250, 30), (-240, 5), (-100, 150), (-10, 20), (0, 7), (5, 100), (-3, 3)])]
    df = spark.createDataFrame(rows, "key string, id long, start long, end long")
    want = _naive_pairs(df.collect())
    for width in (7, 64, 1_000):
        got = overlap_pairs(df, key="key", id_col="id", bucket_width=width).collect()
        got_keys = [(r.key, r.id, r.id_r) for r in got]
        assert len(got_keys) == len(set(got_keys)), (width, "duplicate pair")
        assert set(got_keys) == want, width


def test_max_concurrency_high_key_cardinality_broadcast_path(spark):
    """VERDICT r9 #5 guard: above _OFFSETS_INLINE_MAX (pid, key)
    entries the chunked path must broadcast-join its offsets instead
    of inlining a create_map literal — results identical to the
    window formulation, and the final plan carries no map literal."""
    import random

    from duo_spark.operators.intervals import (
        _OFFSETS_INLINE_MAX,
        max_concurrency,
    )

    rng = random.Random(11)
    # 12k keys x 2 intervals > 10k offset entries whatever the
    # partitioner does (every key contributes >= 1 chunk entry)
    rows = []
    for k in range(12_000):
        for _ in range(2):
            s = rng.randint(0, 500)
            rows.append((f"k{k}", s, s + rng.randint(0, 100)))
    df = spark.createDataFrame(rows, "key string, start long, end long")
    got_df = max_concurrency(df, key="key", method="chunked", num_partitions=8)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    # no create_map literal of offsets in the plan (the inline path
    # embeds "<pid>|k0", "<pid>|k1", ... entries); the disjunction
    # form used before round 11 was vacuously true when "keys:" was
    # absent, guarding nothing
    assert "|k0" not in plan and "|k1" not in plan
    assert len(plan) < 200_000  # a 24k-entry map literal would dwarf this
    got = {r.key: r.peak for r in got_df.collect()}
    want = {r.key: r.peak for r in
            max_concurrency(df, key="key", method="window").collect()}
    assert got == want
    assert len(got) == 12_000


def test_max_concurrency_chunked_nonstring_and_null_keys(spark):
    """ADVICE r10 #1 guard: boolean/float/NULL key columns must agree
    between the chunked and window methods. Before round 11 the
    chunked offsets were keyed by Python str(k) but probed with
    Spark's CAST(key AS STRING) (True vs true, 1e+20 vs 1.0E20), and
    NULL keys never matched either path — offsets silently coalesced
    to 0 and peaks under-reported."""
    import random

    rng = random.Random(7)

    def check(rows, schema):
        df = spark.createDataFrame(rows, schema)
        got = {
            r[0]: r.peak
            for r in max_concurrency(
                df, key="key", method="chunked", num_partitions=6
            ).collect()
        }
        want = {
            r[0]: r.peak
            for r in max_concurrency(df, key="key", method="window").collect()
        }
        assert got == want

    # boolean keys: str(True) = "True", Spark cast = "true"
    rows = []
    for i in range(200):
        s = rng.randint(0, 50)
        rows.append((bool(i % 2), s, s + rng.randint(0, 30)))
    check(rows, "key boolean, start long, end long")

    # float keys incl. values whose repr differs between engines
    for k in (1e20, 1e-7, 0.1, float("inf")):
        base = []
        for _ in range(60):
            s = rng.randint(0, 50)
            base.append((k, s, s + rng.randint(0, 30)))
        check(base, "key double, start long, end long")

    # NULL keys interleaved with real ones
    rows = []
    for i in range(200):
        s = rng.randint(0, 50)
        rows.append((None if i % 3 == 0 else f"k{i % 5}", s, s + rng.randint(0, 30)))
    check(rows, "key string, start long, end long")


def test_max_concurrency_count_col_rides_the_aggregate(spark, ivals):
    """count_col (round 14) emits the per-key interval count through
    the sweep's own final aggregate — identical to a separate
    groupBy().count() of the input, in BOTH formulations."""
    want = {r.key: r.n for r in ivals.groupBy("key").count()
            .withColumnRenamed("count", "n").collect()}
    for method in ("chunked", "window"):
        out = max_concurrency(ivals, key="key", method=method,
                              count_col="n_ivals").collect()
        got = {r.key: r.n_ivals for r in out}
        assert got == want, method
        # peak column unaffected by the extra aggregate
        plain = {r.key: r.peak for r in
                 max_concurrency(ivals, key="key", method=method).collect()}
        assert {r.key: r.peak for r in out} == plain, method
