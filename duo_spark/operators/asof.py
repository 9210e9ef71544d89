"""As-of (time-nearest) join: for each left row, the latest right row
at or before its timestamp within the same key.

The observability surface correlates spans and logs by exact trace id
(operators/traces.py, after duo/src/web/trace.rs); the as-of form is
its time-proximity generalization — "the last deploy/config/heartbeat
before this span" — and the workhorse temporal join of feature
pipelines (point-in-time-correct feature lookup).

Scale shape: the naive formulations are a range join (quadratic
blow-up per key) or join + groupBy-max (two shuffles and a re-join).
This implementation uses the tagged-union trick instead: union both
sides, ONE hash shuffle on the key, one per-key time sort, and a
running `last(right payload, ignorenulls)` window — cost is a single
sort-shuffle of |L|+|R| rows regardless of how many right rows
precede each left row. Per-key data never concentrates beyond the
key's own rows, so skew equals actual key skew, not match-count skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of-backward join.

    Every ``left`` row is returned once, extended with the ``right``
    row having the greatest ``right_time`` <= the left row's
    ``left_time`` and the same ``on`` key (NULLs when no such row).
    ``strict=True`` uses < instead of <= (exclude simultaneous rows).

    Right-side payload columns (``right_cols``, default: all but the
    key and time) are carried through the union as one struct so the
    window needs a single `last(..., ignorenulls=True)`; ties on
    ``right_time`` resolve to the LAST right row in (time, struct)
    order — deterministic for any input, and unique-keyed right sides
    (the recommended shape: pre-aggregate to one row per (key, time))
    are tie-free by construction. The matched time is exposed as
    ``_asof_time``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]
    payload = F.struct(
        F.col(right_time).cast("long").alias("_asof_time"), *[F.col(c) for c in right_cols]
    )
    # tag order decides tie semantics: right rows at time t sort BEFORE
    # left rows at t (inclusive <=) or after them (strict <)
    r_tag, l_tag = (0, 1) if not strict else (2, 1)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("long").alias("_t"),
        F.lit(r_tag).alias("_side"),
        payload.alias("_rp"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("long").alias("_t"),
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    u = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_rp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select("_lp.*", "_m")
    for c in ["_asof_time", *right_cols]:
        out = out.withColumn(c, F.col("_m")[c])
    return out.drop("_m")
