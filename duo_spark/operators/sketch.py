"""Mergeable distinct-count sketches (HyperLogLog).

At 100 TB, ``COUNT(DISTINCT x)`` per group is a full shuffle of every
distinct value; a HyperLogLog sketch replaces it with m integer
registers per group that merge with ``max`` — partial aggregates
combine map-side, registers persist as a tiny table, and yesterday's
sketch unions with today's without touching yesterday's data
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm").

Spark ships HLL++ as ``approx_count_distinct`` (JVM-side, the right
default when only the number is needed). This module exists for the
two things the built-in cannot do:

  1. expose the REGISTER TABLE as data — persistable, mergeable
     across runs/partitions/days (``hll_merge``), the building block
     of incremental distinct-count rollups;
  2. be bit-deterministic and oracle-replayable: the hash is a pure
     integer Lehmer double-round (no engine-private seed), the rho
     extraction is ``length(bin(w))`` (exact in any engine), and the
     estimate is integer register arithmetic plus ONE float divide —
     DuckDB replays it to the bit.

Everything is whole-stage-codegen Column math: hash → (bucket, rho)
in the scan projection, then two hash aggregates (max per register,
sum per group). No UDFs, no shuffle wider than group×m rows.

Small-range bias correction (linear counting) is intentionally NOT
applied: it needs ``ln``, whose last-ulp behavior differs across
libms, and the gate compares bits. Production use would wrap the
estimate in the standard correction; the register table is identical
either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Multiplicative-xorshift hash modulus (2^31 - 1). Both
#: multiplications stay below 2^47 — exact in any engine's 64-bit
#: integer arithmetic, no overflow semantics to agree on. The
#: xor-shift between rounds is load-bearing: two modular multiplies
#: COMPOSE into one linear map, and a linear hash's high bits are too
#: structured for max-rho statistics (measured: ~37% HLL error on
#: dense int ranges; with the mixing, within the 6.5% standard
#: error).
_MOD = 2147483647
_MUL1 = 48271
_MUL2 = 69621

#: Fixed-point scale for the register sum: an empty register
#: contributes 2^24, a register with value M contributes 2^(24-M).
#: With 31-bit hashes rho <= 24, so every term is an exact integer
#: and the per-group sum stays below 2^32 * m — exact in int64.
_FP = 24


def _hash31(col: Column) -> Column:
    """31-bit deterministic integer hash of an integral column."""
    u = col.cast("long") % _MOD
    a = (u * _MUL1) % _MOD
    b = a.bitwiseXOR(F.shiftright(a, 15))
    c = (b * _MUL2) % _MOD
    return c.bitwiseXOR(F.shiftright(c, 13))


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """Per-group HLL register table: one row per (group, bucket) with
    the max rho observed. Missing buckets mean register value 0.

    Columns: ``*group_cols, bucket, register``. ONE hash aggregate —
    partials combine map-side with ``max``, so the shuffle carries at
    most ``groups x m`` rows however big the input is.
    """
    h = _hash31(F.col(value_col))
    w = F.floor(h / m).cast("long")
    rho = F.when(w == 0, F.lit(_FP)).otherwise(
        F.lit(_FP) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(*sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union of the underlying sets: registers merge with ``max``.
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly (asserted in
    tests) — the property that makes incremental rollups possible."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    m: int = 256,
) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    ``register_sum`` is the exact fixed-point integer
    sum(2^(24 - register)) over all m registers (absent rows count as
    register 0); ``estimate = floor(alpha_m * m^2 * 2^24 /
    register_sum)`` — one float divide, replayed bit-exactly by the
    oracle. Standard error ~1.04/sqrt(m) (~6.5% at m=256).
    """
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        # SQL shiftleft: the DataFrame-API binding only takes a Python
        # int for the shift amount
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({_FP} - register as int))")
        ).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    reg_sum = (
        F.col("present_sum")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << _FP)
    ).alias("register_sum")
    return agg.select(
        *group_cols,
        reg_sum,
        F.floor(
            F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << _FP))
            / F.col("register_sum")
        ).cast("long").alias("estimate"),
    )


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """sketch → estimate in one lazy plan: per-group approximate
    distinct count with exact register arithmetic."""
    return hll_estimate(
        hll_sketch(df, group_cols, value_col, m), group_cols, m
    )
