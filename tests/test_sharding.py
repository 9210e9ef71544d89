"""Token-budget sharding: running total correctness vs a driver-side
prefix sum, shard packing semantics, and the no-global-sort plan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from duo_spark.operators.sharding import pack_token_shards, with_running_total


def _fixture(spark, n=500, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 400)) for i in range(1, n + 1)]
    # shuffled input: the operator must order by id itself
    rng.shuffle(rows)
    return rows, spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_running_total_matches_prefix_sum(spark):
    rows, df = _fixture(spark)
    got = {
        r.doc_id: r.running_total
        for r in with_running_total(df, "doc_id", "n_tokens").collect()
    }
    acc = 0
    for i, t in sorted(rows):
        acc += t
        assert got[i] == acc
    assert len(got) == len(rows)


def test_running_total_no_single_partition_window(spark):
    _, df = _fixture(spark, n=50)
    plan = with_running_total(df, "doc_id", "n_tokens")._jdf.queryExecution().executedPlan().toString()
    # the window must be partitioned (by _pid), never a global orderBy-only window
    assert "Window" in plan
    assert "partitionBy" not in plan or "_pid" in plan
    assert "SinglePartition" not in plan


def test_pack_token_shards_budget(spark):
    rows, df = _fixture(spark)
    budget = 1000
    got = pack_token_shards(df, budget).collect()
    assert len(got) == len(rows)
    # reference next-fit-by-offset
    acc = 0
    want = {}
    for i, t in sorted(rows):
        want[i] = acc // budget
        acc += t
    assert {r.doc_id: r.shard_id for r in got} == want
    # shards are contiguous in id order and token-bounded within one doc
    by_shard: dict[int, int] = {}
    for r in got:
        by_shard[r.shard_id] = by_shard.get(r.shard_id, 0) + r.n_tokens
    max_doc = max(t for _, t in rows)
    for s, tot in by_shard.items():
        if s != max(by_shard):  # last shard may be short
            assert tot <= budget + max_doc


def test_pack_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_token_shards(df, 100).count() == 0


def test_salted_join_matches_plain_join_and_balances(spark):
    """salted_join must be row-identical to the plain join on a
    pathologically skewed key (one key = 90% of rows), while the
    salted shuffle key spreads the hot key across all salt buckets."""
    from duo_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(0 if i < 1800 else i % 10, i) for i in range(2000)], "k int, payload long"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], "k int, name string")
    plain = sorted((r.k, r.payload, r.name) for r in big.join(small, "k").collect())
    salted = sorted((r.k, r.payload, r.name) for r in salted_join(big, small, "k", salt=8).collect())
    assert salted == plain
    # the hot key's rows occupy every salt bucket (fanning really happens)
    from pyspark.sql import functions as F
    buckets = (
        big.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .filter(F.col("k") == 0)
        .groupBy("_salt").count().collect()
    )
    assert len(buckets) == 8
    assert max(r["count"] for r in buckets) < 1800 * 0.35  # no bucket re-concentrates

    # left join keeps unmatched big rows exactly once
    small_missing = small.filter(F.col("k") < 5)
    left_plain = sorted(
        (r.k, r.payload, r.name) for r in big.join(small_missing, "k", "left").collect()
    )
    left_salted = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join(big, small_missing, "k", salt=4, how="left").collect()
    )
    assert left_salted == left_plain
