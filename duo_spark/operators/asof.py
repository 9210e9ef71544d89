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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    """True if the type contains a MapType anywhere — the one Spark
    type that cannot appear in a sort key."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _time_as_long(df: DataFrame, col: str) -> Column:
    """Numeric time key: µs for timestamp columns (cast('long') on a
    timestamp would truncate to whole seconds), plain long otherwise."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


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
    ``right_time`` resolve to the LAST right row in (time, payload)
    order — deterministic for any input, and unique-keyed right sides
    (the recommended shape: pre-aggregate to one row per (key, time))
    are tie-free by construction. A payload containing map columns
    can't be a sort key, so its JSON rendering tie-breaks instead
    (still value-deterministic). The matched time is exposed as
    ``_asof_time``.

    Time columns may be numeric (compared as long, any epoch unit) or
    timestamps (compared as unix MICROseconds — a plain long cast
    would truncate timestamps to whole seconds); ``_asof_time`` is in
    the comparison unit. Raises ValueError if a left column collides
    with ``_asof_time`` or a right payload name (the join would
    silently overwrite it otherwise).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]
    clashes = set(left.columns) & {"_asof_time", *right_cols}
    if clashes:
        raise ValueError(
            f"asof_join output would overwrite left column(s) {sorted(clashes)}; "
            "rename them or pass right_cols with non-colliding names"
        )
    payload = F.struct(
        _time_as_long(right, right_time).alias("_asof_time"),
        *[F.col(c) for c in right_cols],
    )
    # tag order decides tie semantics: right rows at time t sort BEFORE
    # left rows at t (inclusive <=) or after them (strict <)
    r_tag, l_tag = (0, 1) if not strict else (2, 1)
    r = right.select(
        F.col(on).alias("_k"),
        _time_as_long(right, right_time).alias("_t"),
        F.lit(r_tag).alias("_side"),
        payload.alias("_rp"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        _time_as_long(left, left_time).alias("_t"),
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    u = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType)).unionByName(l)
    tiebreak = (
        F.to_json("_rp") if _contains_map(r.schema["_rp"].dataType) else F.col("_rp")
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select("_lp.*", "_m")
    for c in ["_asof_time", *right_cols]:
        out = out.withColumn(c, F.col("_m")[c])
    return out.drop("_m")
