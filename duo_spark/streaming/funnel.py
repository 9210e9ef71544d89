"""Streaming funnel analysis: the continuous counterpart of
operators/funnel.py.

Funnel matching needs per-user GLOBAL time order, but a stream
delivers events in arrival order — an early 'view' can arrive three
micro-batches after the 'purchase' it unlocks, retroactively changing
every step time. The stateful formulation therefore keeps, per user,
the sorted times of that user's funnel-relevant events (one list per
step) and re-derives the greedy chain each time the user's state
changes — exact under ANY batch schedule, pinned against the batch
operator in tests and the oracle gate.

State is bounded by the user's funnel-relevant event count (never the
stream length): step-1 keeps only its minimum (only the earliest
first-step event can ever matter), later steps keep their time lists
because the chain's lower bound can retroactively DECREASE as earlier
events arrive, making previously-ineligible times eligible.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F


def streaming_funnel_states(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts_us",
) -> DataFrame:
    """Per-user funnel step times over a stream (update mode): emits
    (user, t1..tk, seq) whenever a user's chain may have changed;
    ``seq`` increments per emission, so the CURRENT chain is the
    max-seq row per user. Step semantics match
    ``operators.funnel.funnel_steps`` with ``window=None``: strictly
    increasing times, no window bound (a window needs t1 to be final,
    which a stream cannot know — apply it downstream when reading the
    final states).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    reserved = {"seq", *(f"t{i + 1}" for i in range(k))}
    if user_col in reserved:
        raise ValueError(
            f"user_col {user_col!r} collides with a generated output column "
            f"({sorted(reserved)}); rename the key column first"
        )
    state_schema = (
        ", ".join(f"s{i} array<bigint>" for i in range(k)) + ", seq bigint"
    )
    # key column keeps the caller's name and type — hardcoding
    # "user_id bigint" would silently rename/retype the key for any
    # non-default user_col
    user_dt = stream.schema[user_col].dataType.simpleString()
    out_schema = (
        f"`{user_col}` {user_dt}, "
        + ", ".join(f"t{i + 1} bigint" for i in range(k))
        + ", seq bigint"
    )
    step_idx = {s: i for i, s in enumerate(steps)}

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            lists = [list(stored[i] or []) for i in range(k)]
            seq = int(stored[k])
        else:
            lists, seq = [[] for _ in range(k)], 0
        changed = False
        for pdf in pdfs:
            for ty, t in zip(pdf[type_col], pdf[time_col]):
                i = step_idx.get(ty)
                if i is None:
                    continue
                t = int(t)
                if i == 0:
                    # only the earliest step-1 event can matter
                    if not lists[0] or t < lists[0][0]:
                        lists[0] = [t]
                        changed = True
                else:
                    lists[i].append(t)
                    changed = True
        if not changed:
            return
        for i in range(1, k):
            lists[i].sort()
        seq += 1
        state.update(tuple(lists) + (seq,))
        # greedy chain over the stored times
        times: list[int | None] = [None] * k
        if lists[0]:
            times[0] = lists[0][0]
            prev = times[0]
            for i in range(1, k):
                nxt = next((t for t in lists[i] if t > prev), None)
                if nxt is None:
                    break
                times[i] = nxt
                prev = nxt
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                **{f"t{i + 1}": [times[i]] for i in range(k)},
                "seq": [seq],
            }
        )

    return (
        stream.groupBy(F.col(user_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
