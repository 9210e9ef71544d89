"""Fuzzy edit-distance join (operators/fuzzy.py) vs a brute-force
Levenshtein oracle."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from duo_spark.operators.fuzzy import deletion_neighborhood, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_deletion_neighborhood_shape(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, t string")
    got = df.select(deletion_neighborhood(F.col("t"), 1).alias("v")).collect()[0].v
    assert got == ["abc", "bc", "ac", "ab"]
    got2 = set(df.select(deletion_neighborhood(F.col("t"), 2).alias("v")).collect()[0].v)
    assert got2 == {"abc", "bc", "ac", "ab", "a", "b", "c"}


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_pairs_match_bruteforce(spark, k):
    """Small alphabet + short strings = dense near-collisions; every
    Levenshtein-≤k pair must surface exactly once with its exact
    distance (SymSpell neighborhood completeness), including
    distance-0 exact-duplicate groups."""
    rng = random.Random(11)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(2, 5))))
            for i in range(80)]
    df = spark.createDataFrame(rows, "id long, t string")
    want = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        d = _lev(a, b)
        if d <= k:
            want.add((min(i, j), max(i, j), d))
    got = {(r.id_a, r.id_b, r.dist)
           for r in fuzzy_pairs(df, "id", "t", max_distance=k).collect()}
    assert got == want and want


def test_fuzzy_pairs_null_and_substitution(spark):
    """Substitution pairs (equal length) are found via the shared
    deletion variant; null texts are dropped, not matched."""
    df = spark.createDataFrame(
        [(1, "color"), (2, "colour"), (3, "colof"), (4, None), (5, "color")],
        "id long, t string",
    )
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, "id", "t", max_distance=1).collect()}
    assert got == {
        (1, 2): 1,   # insertion
        (1, 3): 1,   # substitution r->f
        (1, 5): 0,   # exact dup
        (2, 5): 1,
        (3, 5): 1,
        # (2, 3) is distance 2 — correctly absent
    }


def test_fuzzy_pairs_candidate_plan_reuses_exchange(spark):
    """The variant self-join must reuse one exchange of the exploded
    frame (the containment_pairs discipline)."""
    rows = [(i, f"name{i:04d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, t string")
    out = fuzzy_pairs(df, "id", "t", max_distance=1)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "BroadcastHashJoin" in plan
