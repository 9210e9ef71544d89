"""Exact heavy hitters (operators/frequent.py): the Misra-Gries
candidate pass must never lose a true heavy hitter (superset
guarantee) and the verify pass must make the final answer exact."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from duo_spark.operators.frequent import _mg_merge, heavy_hitters


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish stream: a few dominant values + a long uniform tail,
    spread over 8 partitions so the per-partition summaries matter."""
    rng = random.Random(3)
    vals = (
        ["hot-a"] * 4000 + ["hot-b"] * 2500 + ["warm-c"] * 700
        + [f"tail-{rng.randint(0, 5000)}" for _ in range(8000)]
    )
    rng.shuffle(vals)
    return spark.createDataFrame([(v,) for v in vals], "v string").repartition(8)


def _exact(rows, k):
    c = Counter(r.v for r in rows)
    n = sum(c.values())
    return {v: m for v, m in c.items() if m * k > n}


@pytest.mark.parametrize("k", [3, 10, 50])
def test_heavy_hitters_exact_small_capacity(spark, skewed, k):
    """With capacity == k (the minimum honoring the guarantee) the
    output equals the exact groupBy answer — the MG approximation only
    widens candidates, never the result."""
    want = _exact(skewed.collect(), k)
    got = {r.v: r.cnt for r in heavy_hitters(skewed, "v", k=k).collect()}
    assert got == want


def test_heavy_hitters_validates_params(spark, skewed):
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(skewed, "v", k=1)
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters(skewed, "v", k=10, capacity=5)


def test_mg_merge_survival_guarantee():
    """Pure-python MG kernel: any value with weight > total/(cap+1)
    survives, at any interleaving."""
    rng = random.Random(9)
    stream = ["x"] * 350 + [f"t{i}" for i in range(600)]  # 350·3 > 950
    rng.shuffle(stream)
    c = Counter(stream)
    total = len(stream)
    cap = 2
    cnt: dict = {}
    # feed in chunks with pre-aggregated weights, like the Arrow path
    for i in range(0, len(stream), 100):
        chunk = Counter(stream[i : i + 100])
        _mg_merge(cnt, list(chunk.keys()), list(chunk.values()), cap)
    assert len(cnt) <= cap
    for v, m in c.items():
        if m * (cap + 1) > total:
            assert v in cnt, f"{v} ({m}/{total}) evicted"


def test_mg_merge_weighted_feed():
    """Weighted folding of pre-aggregated counts respects the capacity
    bound, and dominant values ride out a long unit-weight tail (this
    exact feed decrements a/b by 1 per absorbed tail pair: both stay)."""
    cap = 3
    w: dict = {}
    _mg_merge(w, ["a", "b"] + [f"z{i}" for i in range(40)], [50, 30] + [1] * 40, cap)
    assert len(w) <= cap
    assert "a" in w and "b" in w


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.integers(min_value=1, max_value=50)),
        min_size=1, max_size=60,
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=10),
)
def test_mg_merge_properties(chunks, cap, chunk_size):
    """For ANY weighted stream, chunking, and capacity: the summary
    never exceeds capacity, and every value with total weight >
    total/(cap+1) survives."""
    cnt: dict = {}
    for i in range(0, len(chunks), chunk_size):
        part = chunks[i : i + chunk_size]
        _mg_merge(cnt, [v for v, _ in part], [w for _, w in part], cap)
        assert len(cnt) <= cap
    totals = Counter()
    for v, w in chunks:
        totals[v] += w
    grand = sum(totals.values())
    for v, w in totals.items():
        if w * (cap + 1) > grand:
            assert v in cnt, (v, w, grand, cap, cnt)
