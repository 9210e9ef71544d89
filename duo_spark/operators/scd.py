"""Slowly-changing-dimension (type 2) state history.

The dimension-maintenance operator every warehouse pipeline needs:
turn a change stream (key, state, ts) into versioned validity
intervals [valid_from, valid_to) with one open row per key, and merge
new changes into an existing history WITHOUT re-reading the raw
change stream (Kimball's SCD type 2; the MERGE shape Delta/Iceberg
expose as `MERGE INTO`, expressed here as pure DataFrame ops).

Scale shape: ONE hash shuffle on the key with a per-key time sort —
consecutive duplicate states collapse via `lag`, intervals come from
`lead`, versions from `row_number`, all riding the same window spec
(one exchange, one sort). The incremental `scd2_merge` recomputes
over the COMPACT version table (one row per state change, not per
event) unioned with the new batch — history size, not stream size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Full type-2 history from a change stream: one row per state
    CHANGE with ``(key, state, valid_from, valid_to, version)``;
    ``valid_to`` is null on each key's current (open) version.

    ``tiebreak_col`` must make (ts, tiebreak) unique per key — equal
    timestamps otherwise make `lag`/`lead` nondeterministic. A change
    carrying the same state as its predecessor is a no-op and emits no
    version (the SCD-2 "only track real changes" rule).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.asc(ts_col), F.asc(tiebreak_col)
    )
    w_all = Window.partitionBy(key_col)
    seq = changes.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lag(state_col).over(w).alias("_prev"),
        # newest INGESTED time, not newest retained change: collapsed
        # duplicates advance the stream without adding a version, and
        # scd2_merge's exactness contract is stated against this
        F.max(F.col(ts_col)).over(w_all).alias("_last_seen"),
    )
    chg = seq.filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("state"))
    )
    w2 = Window.partitionBy(key_col).orderBy(F.asc("_ts"), F.asc("_tb"))
    return chg.select(
        key_col,
        "state",
        F.col("_ts").alias("valid_from"),
        F.lead("_ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.col("_tb").alias("_tiebreak"),
        "_last_seen",
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge a new change batch into an existing history: closes each
    key's open version when its state actually changes, appends the
    new versions, renumbers. For IN-ORDER batches — every change
    strictly newer than its key's ``_last_seen`` (the newest INGESTED
    event time, which collapsed duplicates advance even though they
    add no version; a retained-point bound would be too weak) — this
    exactly equals rebuilding from the full change stream (asserted
    property-style in tests), because a type-2 history is a lossless
    compaction of its change points once the past is sealed. The
    recompute therefore unions the version table (one row per change,
    small) with the batch, never the raw stream. A change that
    violates the contract splices against the retained points only:
    correct intervals for what was kept, but an event collapsed as a
    consecutive duplicate cannot retroactively reappear — the
    precision any compacting SCD pipeline gives up (pinned by a
    counterexample test).
    """
    points = history.select(
        key_col,
        F.col("state").alias(state_col),
        F.col("valid_from").alias(ts_col),
        F.col("_tiebreak").alias(tiebreak_col),
    )
    batch = changes.select(key_col, state_col, ts_col, tiebreak_col)
    merged = scd2_history(
        points.unionByName(batch), key_col, state_col, ts_col, tiebreak_col
    )
    # the recompute only saw retained points, so its _last_seen can
    # regress below the true one — carry the old high-water mark
    old_ls = history.groupBy(key_col).agg(
        F.max("_last_seen").alias("_ls_old")
    )
    return (
        merged.join(old_ls, key_col, "left")
        .withColumn(
            "_last_seen",
            F.greatest(F.col("_last_seen"), F.coalesce("_ls_old", "_last_seen")),
        )
        .drop("_ls_old")
    )
