"""Ordered event-sequence (funnel) analysis.

The reference's analytics surface stops at per-field histograms
(`duo/src/web/logs.rs:64-98`); the natural next product-analytics
question over the same event stream — "how many users did A, then B,
then C within a window?" — needs ordered-sequence matching, which is
awkward in plain SQL (per-user self-joins explode) and a classic
scale trap when written as a per-user UDF over collected event lists.

Formulation here: one filtered min-aggregate + equi-join PER STEP.
Step 1 is each user's earliest step-1 event; step k is the earliest
step-k event strictly after the user's step-(k-1) time and within
``window`` of their step-1 time. Each round shuffles only (user,
timestamp) pairs — never event payloads, never per-user arrays — so
k steps cost k hash aggregates of the matching event subset, with
skew bounded by per-user event counts, not funnel depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts_us",
    window: int | None = None,
) -> DataFrame:
    """Per-user step-completion times for an ordered funnel.

    Output: one row per user who completed step 1, with columns
    ``t1..t<k>`` (µs epoch; NULL from the first uncompleted step on).
    Step ordering is strict (``t_k > t_{k-1}``: a same-microsecond
    event does not advance the funnel) and ``window`` (µs), when set,
    bounds every step relative to ``t1``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t = F.col(user_col), F.col(time_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias(user_col))
        .agg(F.min(t).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias(user_col), t.alias("_t")
        )
        cond = F.col("_t") > F.col(f"t{i - 1}")
        if window is not None:
            cond = cond & (F.col("_t") <= F.col("t1") + F.lit(int(window)))
        cur = (
            cur.join(nxt, user_col, "left")
            .withColumn("_t", F.when(cond, F.col("_t")))
            .groupBy(*[F.col(c) for c in cur.columns])
            .agg(F.min("_t").alias(f"t{i}"))
        )
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts_us",
    window: int | None = None,
) -> DataFrame:
    """Funnel conversion table: (step, event_type, users) — users
    reaching each step under :func:`funnel_steps` semantics. ``users``
    is non-increasing in ``step`` by construction."""
    times = funnel_steps(events, steps, user_col, type_col, time_col, window)
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"t{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # k is tiny (funnel depth): unpivot via a literal stack expression
    pairs = ", ".join(
        f"{i}, '{s}', t{i}" for i, s in enumerate(steps, start=1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {pairs}) as (step, event_type, users)"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts_us",
    period_us: int = 7 * 24 * 3_600_000_000,
    max_periods: int = 8,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event (the cohort), counted in every later period they were
    active in.

    Output: (cohort, period, users) — ``cohort`` is the first-event
    period index (floor(first_ts / period_us)), ``period`` the offset
    from it (0 = the cohort period itself, so ``users`` at period 0 is
    the cohort size), bounded by ``max_periods``.

    Scale: one min-aggregate for first-event times, one equi-join back
    to the stream, and one distinct-aggregate keyed (cohort, period,
    user) — the same two-shuffle shape however long the stream is;
    period arithmetic is exact integer µs division (no float rounding
    across period edges, no calendar functions to disagree with the
    oracle over)."""
    from duo_spark.operators.util import floor_div_expr

    u, t = F.col(user_col), F.col(time_col)
    p = int(period_us)

    # exact integer FLOOR division (the oracle's `//` floors; `div`
    # would truncate toward zero) — shared helper
    def fdiv(expr: str) -> F.Column:
        return F.expr(floor_div_expr(expr, p))

    first = (
        events.groupBy(u.alias(user_col))
        .agg(F.min(t).alias("_t0"))
        .select(user_col, fdiv("_t0").alias("_cohort"))
    )
    activity = events.select(u.alias(user_col), t.alias("_t")).join(first, user_col)
    return (
        activity.select(
            "_cohort",
            (fdiv("_t") - F.col("_cohort")).alias("_period"),
            user_col,
        )
        .filter(F.col("_period") < max_periods)
        .groupBy(
            F.col("_cohort").alias("cohort"), F.col("_period").alias("period")
        )
        .agg(F.count_distinct(F.col(user_col)).alias("users"))
    )
