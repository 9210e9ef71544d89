"""Property-based invariants for the streaming funnel (hypothesis):
the stateful update, driven over ANY chunking of an event stream,
must emit the same final greedy chain as a one-shot batch pass —
including with the watermark prune active. Pure Python/pandas via the
module-level update factory (the test_funnel.py _FakeState pattern),
so hypothesis can afford real example counts without Spark jobs."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from duo_spark.streaming.funnel import (
    _greedy_chain,
    _prune_lists,
    make_funnel_update,
)

STEPS = ["a", "b", "c"]
K = len(STEPS)


from conftest import FakeGroupState as _State  # noqa: E402 — shared fake


def _drive(update, state, chunk):
    pdf = pd.DataFrame(chunk, columns=["event_type", "ts_us"])
    return list(update((1,), iter([pdf]), state))


def _batch_chain(events, window):
    lists = [sorted({t for e, t in events if e == s}) for s in STEPS]
    return _greedy_chain(lists, K, window)


def _final_chain(outs, default):
    if not outs:
        return default
    row = outs[-1]
    return [
        None if pd.isna(row[f"t{i + 1}"].iloc[0]) else int(row[f"t{i + 1}"].iloc[0])
        for i in range(K)
    ]


# event times are MILLISECOND-ALIGNED microseconds: the fake state's
# watermark is in ms (Spark's unit), so unaligned times would truncate
# to wm 0 and never exercise the prune
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "x"]),  # x = non-step noise
        st.integers(min_value=0, max_value=1_000).map(lambda x: x * 1_000),
    ),
    max_size=40,
)


@settings(max_examples=120, deadline=None)
@given(
    events=events_strategy,
    seed=st.randoms(use_true_random=False),
    n_chunks=st.integers(min_value=1, max_value=5),
    window=st.one_of(
        st.none(), st.integers(min_value=10_000, max_value=500_000)
    ),
)
def test_any_chunking_and_order_matches_batch_without_watermark(
    events, seed, n_chunks, window
):
    """With the watermark at 0 (nothing prunable), ANY partition of the
    stream into chunks, in ANY order, with duplicates allowed, must end
    at the batch chain — the at-least-once/merge-order invariance."""
    upd = make_funnel_update(
        STEPS, "user_id", "event_type", "ts_us",
        window=window, idle_ttl_ms=None,
    )
    shuffled = list(events)
    seed.shuffle(shuffled)
    bounds = sorted(seed.randrange(len(shuffled) + 1) for _ in range(n_chunks - 1))
    chunks, prev = [], 0
    for b in [*bounds, len(shuffled)]:
        chunks.append(shuffled[prev:b])
        prev = b
    if shuffled:
        chunks.append([seed.choice(shuffled)])  # a redelivered duplicate
    st_ = _State()
    outs = []
    for c in chunks:
        if c:
            outs.extend(_drive(upd, st_, c))
    assert _final_chain(outs, [None] * K) == _batch_chain(events, window)


@settings(max_examples=120, deadline=None)
@given(
    events=events_strategy,
    n_chunks=st.integers(min_value=1, max_value=5),
    window=st.integers(min_value=10_000, max_value=500_000),
)
def test_in_order_chunks_with_watermark_prune_match_batch(
    events, n_chunks, window
):
    """With the window set and the watermark advancing to the max event
    time delivered so far (the tightest legal watermark), the pruned
    state must still end at the batch chain — the exactness claim of
    _prune_lists' docstring, hypothesis-sized."""
    upd = make_funnel_update(
        STEPS, "user_id", "event_type", "ts_us",
        window=window, idle_ttl_ms=None,
    )
    ordered = sorted(events, key=lambda et: et[1])
    size = max(1, (len(ordered) + n_chunks - 1) // n_chunks)
    st_ = _State()
    outs = []
    wm_at_change = 0
    for i in range(0, len(ordered), size):
        chunk = ordered[i : i + size]
        wm_before = st_.wm_ms
        emitted = _drive(upd, st_, chunk)
        if emitted:  # the update emits iff it changed (and re-pruned)
            wm_at_change = wm_before
        outs.extend(emitted)
        # watermark advances AFTER the batch (Spark semantics)
        st_.wm_ms = max(t for _, t in chunk) // 1000
    assert _final_chain(outs, [None] * K) == _batch_chain(events, window)
    # stored lists are pruned w.r.t. the watermark at the last
    # state-CHANGING update — an unchanged batch legitimately skips
    # the re-prune (stale sub-watermark times are unselectable: any
    # future chain start must be a non-late event, hence > wm)
    if st_.exists:
        stored = st_.get
        lists = [list(stored[i] or []) for i in range(K)]
        assert lists == _prune_lists(lists, wm_at_change * 1000, window)


@settings(max_examples=150, deadline=None)
@given(
    lists=st.lists(
        st.lists(st.integers(min_value=0, max_value=2_000), max_size=15).map(
            lambda xs: sorted(set(xs))
        ),
        min_size=K,
        max_size=K,
    ),
    wm=st.integers(min_value=0, max_value=2_500),
    window=st.integers(min_value=1, max_value=1_000),
)
def test_prune_preserves_current_chain(lists, wm, window):
    """_prune_lists never changes the chain computable from the state
    it prunes (dropped times are provably dead for every future chain,
    hence also for the current one)."""
    if lists[0]:
        lists[0] = [lists[0][0]]  # the update stores only the earliest t1
    pruned = _prune_lists([list(l) for l in lists], wm, window)
    assert _greedy_chain(pruned, K, window) == _greedy_chain(lists, K, window)
    for p, orig in zip(pruned, lists):
        assert set(p) <= set(orig)
