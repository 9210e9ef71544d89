"""Rolling-statistics anomaly detection over event streams.

The monitoring question every ingest pipeline asks: "is today's
volume for this key abnormal given its recent history?" Computed as
a trailing z-score: for each (group, day) bucket, compare the bucket
count against the mean/stddev of the trailing ``window`` days
(excluding the current day — the candidate must not contaminate its
own baseline).

Scale shape: ONE hash aggregate reduces the raw stream to
groups x days rows (map-side partial count), then ONE window pass
over that tiny frame computes every trailing statistic — the window
operates on the aggregated day table, never on raw events, so its
sort is bounded by days-per-group, not event volume. The final top-k
is TakeOrderedAndProject.

Determinism: the trailing mean/variance are derived from integer
sums (sum, sum of squares, n) with one fixed expression —
``var = (n*sumsq - sum^2) / (n*(n-1))``, ``z = (x - sum/n) /
sqrt(var)`` — and IEEE sqrt/divide are correctly rounded in every
engine, so the oracle reproduces z to the bit (no libm functions
involved; contrast ln in drift_psi which needs round()).

RANGE frames on the integer day index (not ROWS) make gap days count
as absent rather than silently shifting the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def rolling_zscore(
    df: DataFrame,
    group_cols: list[str],
    ts_us_col: str,
    window_days: int = 7,
    min_history: int = 5,
) -> DataFrame:
    """Per (group, day) bucket: count, trailing mean, and z-score
    against the trailing ``window_days`` days (current day excluded).

    Buckets with fewer than ``min_history`` trailing days present are
    emitted with null z (not enough baseline to judge).
    """
    daily = (
        df.select(
            *group_cols,
            # float divide + floor is exact here: integer µs < 2^53 and
            # a correctly-rounded quotient is > 3 ulp away from the
            # nearest integer unless it IS one — and DuckDB's
            # double->int cast rounds while Spark's truncates, so
            # floor() (identical in both) is the safe spelling
            F.floor(F.col(ts_us_col) / US_PER_DAY).cast("long").alias("day"),
        )
        .groupBy(*group_cols, "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return zscore_over_daily(daily, group_cols, window_days, min_history)


def zscore_over_daily(
    daily: DataFrame,
    group_cols: list[str],
    window_days: int = 7,
    min_history: int = 5,
) -> DataFrame:
    """The window half of :func:`rolling_zscore`, split out (round 8)
    so a CONTINUOUSLY MAINTAINED daily table (streaming/rollup.py) can
    be scored directly — the monitoring composition: the rollup absorbs
    the stream incrementally, this scores the tiny (groups × days)
    frame on demand. ``daily`` must carry ``day`` (integer) and ``n``."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("day")
        .rangeBetween(-window_days, -1)
    )
    s = F.sum("n").over(w)
    ss = F.sum(F.col("n") * F.col("n")).over(w)
    k = F.count(F.lit(1)).over(w)
    mean = s / k
    var = (k * ss - s * s) / (k * (k - 1))
    z = F.when(
        (k >= min_history) & (var > 0),
        (F.col("n") - mean) / F.sqrt(var),
    )
    return daily.select(
        *group_cols,
        "day",
        "n",
        k.alias("hist_days"),
        mean.alias("hist_mean"),
        z.alias("z"),
    )


def top_anomalies(
    df: DataFrame,
    group_cols: list[str],
    ts_us_col: str,
    window_days: int = 7,
    min_history: int = 5,
    k: int = 20,
) -> DataFrame:
    """The ``k`` most anomalous (group, day) buckets by |z|, ties
    broken on (group, day) for a deterministic cut."""
    scored = rolling_zscore(
        df, group_cols, ts_us_col, window_days, min_history
    ).filter(F.col("z").isNotNull())
    return (
        scored.orderBy(
            F.abs(F.col("z")).desc(), *[F.col(c) for c in group_cols], "day"
        )
        .limit(k)
    )
