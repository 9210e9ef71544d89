"""Point-in-time feature engineering over event streams.

Companions to the as-of join (operators/asof.py): where asof_join
fetches the latest observation at a time, rolling_window_features
aggregates a trailing event-time window per key — the leakage-free
rolling counts/sums a feature pipeline derives from raw events.

The reference has no feature surface (north-star extension); window
frames are absent from duo entirely (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_features(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "t_us",
    value_col: str = "value",
    window_us: int = 7 * 24 * 3_600_000_000,
) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the
    count / value-sum / value-mean of the SAME KEY's events in
    [t - window_us, t] (inclusive both ends — Spark's rangeBetween and
    SQL's RANGE BETWEEN agree on peer inclusion, so the output is
    engine-exact).

    Output: input row identity (key, time) + n_win, sum_win, avg_win.

    Scale: one hash-partition-by-key sort shuffle; the range frame is
    evaluated with a sliding two-pointer pass per partition, so cost
    is O(rows + window overlaps), never O(rows x window). Key skew =
    event-count skew per user; AQE skew-split handles the hot keys.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).cast("long"))
        .rangeBetween(-int(window_us), 0)
    )
    v = F.col(value_col).cast("double")
    return events.select(
        key_col,
        time_col,
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(v).over(w).alias("sum_win"),
        F.avg(v).over(w).alias("avg_win"),
    )
