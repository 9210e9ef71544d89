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
    seq = changes.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lag(state_col).over(w).alias("_prev"),
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
    new versions, renumbers. For IN-ORDER batches (no change older
    than its key's newest history point — the watermark contract)
    this exactly equals rebuilding from the full change stream
    (asserted property-style in tests), because a type-2 history is a
    lossless compaction of its change points once the past is sealed —
    so the recompute unions the version table (one row per change,
    small) with the batch, never the raw stream. A LATE change that
    splices between existing versions is applied against the retained
    points: correct intervals, but an event that was collapsed as a
    consecutive duplicate cannot retroactively reappear — the
    precision any compacting SCD pipeline gives up.
    """
    points = history.select(
        key_col,
        F.col("state").alias(state_col),
        F.col("valid_from").alias(ts_col),
        F.col("_tiebreak").alias(tiebreak_col),
    )
    batch = changes.select(key_col, state_col, ts_col, tiebreak_col)
    return scd2_history(
        points.unionByName(batch), key_col, state_col, ts_col, tiebreak_col
    )
