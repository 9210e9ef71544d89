"""Z-order (Morton) layout clustering: multi-dimensional data
clustering for scan pruning.

The reference prunes on ONE dimension — time — via its partition-path
prefixes (`duo/src/utils.rs:36-181`); queries that also filter on a
second key (trace_id point lookups) fall back to parquet blooms. At
100 TB a layout clustered on the *interleaved bits* of two (or more)
keys gives row-group min/max pruning on BOTH dimensions at once: rows
close in z-order are close in every interleaved dimension, so each
file/row-group covers a small rectangle of (time × key) space instead
of a full-width time stripe. This is the standard Delta/Iceberg
`ZORDER BY` technique, implemented here engine-side with plain Column
arithmetic (no UDFs — the bit-spread is 5 shift/mask steps of
whole-stage codegen).

Usage: ``zorder_repartition(df, "ts_minute", "user_bucket")`` before a
partitioned write; readers need no change — parquet min/max stats on
the ordinary columns do the pruning because each file now spans a
narrow range of both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic masks spreading 16 bits into the even positions of 32
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` into the even bit positions
    of a 32-bit value (classic Morton magic-number sequence); long
    arithmetic throughout, identical in any engine with integer
    shifts."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zvalue2(x: Column, y: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of two columns:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def with_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str = "z",
    file_col: str = "file_id",
    num_files: int = 64,
) -> DataFrame:
    """Add the Morton code and a deterministic file assignment
    (``z``'s top bits): file ``z >> (32 - log2(num_files))``.

    The fixed bit-prefix file split (rather than an equi-depth range
    split) keeps the assignment a pure per-row expression — no
    sampling job, no skew sensitivity in the *assignment* itself, and
    byte-identical across engines, which is what the oracle gate
    replays. For physical writes prefer :func:`zorder_repartition`,
    which range-partitions on z for even file sizes.
    """
    if num_files < 1 or num_files & (num_files - 1):
        raise ValueError(f"num_files must be a power of two, got {num_files}")
    bits = num_files.bit_length() - 1
    z = zvalue2(F.col(x_col), F.col(y_col))
    return df.withColumn(z_col, z).withColumn(
        file_col, F.shiftright(F.col(z_col), 32 - bits)
    )


def zorder_repartition(
    df: DataFrame, x_col: str, y_col: str, num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort by the Morton code — the write-side
    clustering step. Range partitioning samples z so output files are
    evenly sized even when the key space is skewed; within-partition
    sort maximizes row-group locality for min/max pruning."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    with_z = df.withColumn("_z", zvalue2(F.col(x_col), F.col(y_col)))
    return (
        with_z.repartitionByRange(n, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
