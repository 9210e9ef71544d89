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

Small-range bias correction (linear counting) is OFF by default for
the reason the original design refused it: it needs ``ln``, whose
last-ulp behavior can differ across libms, and the gates compare
bits. The raw-estimate gates (hll_distinct, hll_rollup, hll_sliding,
hll_audience_overlap) stay ln-free. Round 12 added an OPT-IN
``small_correct=True`` (used by ngram_diversity_approx, whose tiny
test-corpus cardinalities sit squarely in the raw formula's
saturation zone): ``floor(m·ln(m/V))`` admits a cross-libm floor
flip only when the true value lies within ~1 ulp of an integer —
m·ln(m/V) is irrational for 0 < V < m (and exactly 0 at V=m, which
both engines hit precisely), so over the ≤4095 possible V values the
flip exposure is measure-~1e-9, accepted and documented rather than
bit-perfect.
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
    count_col: str | None = None,
) -> DataFrame:
    """Per-group HLL register table: one row per (group, bucket) with
    the max rho observed. Missing buckets mean register value 0.

    Columns: ``*group_cols, bucket, register``. ONE hash aggregate —
    partials combine map-side with ``max``, so the shuffle carries at
    most ``groups x m`` rows however big the input is.

    ``count_col`` (round 12) additionally carries the per-bucket
    OCCURRENCE count through the same aggregate, so a caller needing
    both a total and a distinct estimate (ngram_diversity approx)
    gets them from ONE scan + ONE bounded shuffle instead of two
    independent aggregates over the exploded input.
    """
    h = _hash31(F.col(value_col))
    w = F.floor(h / m).cast("long")
    rho = F.when(w == 0, F.lit(_FP)).otherwise(
        F.lit(_FP) - F.length(F.bin(w))
    )
    aggs = [F.max("rho").alias("register")]
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(*aggs)
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
    small_correct: bool = False,
) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    ``register_sum`` is the exact fixed-point integer
    sum(2^(24 - register)) over all m registers (absent rows count as
    register 0); ``estimate = floor(alpha_m * m^2 * 2^24 /
    register_sum)`` — one float divide, replayed bit-exactly by the
    oracle. Standard error ~1.04/sqrt(m) (~6.5% at m=256).

    ``small_correct=True`` (round 12) applies the standard
    linear-counting small-range correction (Flajolet 2007 §4): when
    the raw estimate is <= 2.5m and zero registers remain, estimate =
    floor(m * ln(m / V)) with V the zero-register count — the raw
    formula saturates near alpha*m for tiny cardinalities. Opt-in so
    the existing raw-formula oracles stay bit-stable.
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
    raw = F.floor(
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << _FP))
        / F.col("register_sum")
    ).cast("long")
    if small_correct:
        zeros = F.lit(m) - F.col("n_present")
        est = F.when(
            (raw <= F.lit(int(2.5 * m))) & (zeros > 0),
            F.floor(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)).cast("long"),
        ).otherwise(raw)
    else:
        est = raw
    return agg.select(*group_cols, reg_sum, est.alias("estimate"))


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
    small_correct: bool = False,
) -> DataFrame:
    """sketch → estimate in one lazy plan: per-group approximate
    distinct count with exact register arithmetic."""
    return hll_estimate(
        hll_sketch(df, group_cols, value_col, m), group_cols, m,
        small_correct=small_correct,
    )


# count-min sketch
# ---------------------------------------------------------------------

#: Per-row hash seeds (distinct offsets fed through the same Lehmer
#: double-round — the xorshift mixing decorrelates constant offsets).
#: Fixed so sketches from different runs/engines merge and replay.
_CMS_SEEDS = (0, 907, 92821, 6700417)

#: element_at-able single-bit masks: _BIT_MASKS[i] == 1 << i as a
#: SIGNED int64 (bit 63 is the sign bit — the value is negative, the
#: bit pattern is right).
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def _hash31_seeded(col: Column, seed: int) -> Column:
    return _hash31(col.cast("long") + F.lit(seed))


def _require_seeds(n: int, what: str) -> None:
    """Fail loudly when a caller asks for more hash rows than the
    fixed seed table provides — silently truncating d=8 to 4 would
    hand back a sketch whose error bound is worse than requested
    (ADVICE r7)."""
    if n > len(_CMS_SEEDS):
        raise ValueError(
            f"{what}={n} exceeds the {len(_CMS_SEEDS)} fixed hash seeds; "
            "extend _CMS_SEEDS (and the oracle replay) to go wider"
        )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    w: int = 1024,
    d: int = 4,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch register table (Cormode & Muthukrishnan 2005):
    ``(row, bucket, count)``, d·w rows max however large the input.
    Point estimates are one-sided — min over rows only OVERcounts
    (collisions add), by ≤ 2N/w with prob ≥ 1 - 2^-d.

    The posexplode fans each input row into d register updates, but
    the hash aggregate's map-side partials combine them before the
    shuffle, so the exchange carries at most d×w rows per task.
    Registers merge ADDITIVELY (`cms_merge`), the property HLL's max
    registers lack — deletable, slidable (subtract an old window's
    sketch, or RANGE-window-sum per-period register tables: the
    `cms_sliding` gate query), and weightable (pre-aggregated counts
    stream in via ``weight_col``). ``group_cols`` keys the register
    table (one sketch per group — per hour, per tenant); the shuffle
    bound becomes groups × d × w.
    """
    _require_seeds(d, "d")
    wt = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    buckets = F.array(
        *[
            _hash31_seeded(F.col(value_col), s) % w
            for s in _CMS_SEEDS[:d]
        ]
    )
    g = list(group_cols or [])
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *g, F.posexplode(buckets).alias("row", "bucket"), wt.alias("_w")
        )
        .groupBy(*g, "row", "bucket")
        .agg(F.sum("_w").alias("count"))
    )


def cms_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Registers merge with ``sum``: sketch(A ⊎ B) == merge(sketch(A),
    sketch(B)) exactly (asserted in tests) — incremental rollups add
    today's sketch, sliding windows subtract the expired one."""
    g = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "row", "bucket").agg(
        F.sum("count").alias("count")
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    value_col: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Point estimates for ``keys[value_col]``: min over the d register
    rows each key hashes to. The register table is ≤ d·w rows —
    broadcast, so the lookup never shuffles the key side. Keys absent
    from the sketch read their collision mass (≥ 0), never less than
    their true count."""
    from pyspark.sql.functions import broadcast

    _require_seeds(d, "d")
    buckets = F.array(
        *[
            _hash31_seeded(F.col(value_col), s) % w
            for s in _CMS_SEEDS[:d]
        ]
    )
    probed = keys.select(
        value_col, F.posexplode(buckets).alias("row", "bucket")
    )
    return (
        probed.join(broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("estimate"))
    )


# bloom filter
# ---------------------------------------------------------------------


def _bloom_positions(col: Column, m: int, k: int, portable: bool) -> list[Column]:
    """The k bit positions of a key. ``portable=True``: one seeded
    Lehmer double-round per probe — deterministic modular-integer
    math any engine replays bit-for-bit (the oracle-gated default).
    ``portable=False``: Kirsch-Mitzenmacher double hashing over two
    JVM-native xxhash64 draws — pos_i = (h1 + i·h2) mod m with h2
    forced odd so the stride is coprime to the power-of-two m
    (Kirsch & Mitzenmacher 2006: two hashes give the asymptotic FPR
    of k independent ones). Measured 2.1× cheaper per fact row at
    sf0.1; the bit layout differs, so build and probe must agree on
    the flag. ``pmod`` (not abs) keeps Long.MIN_VALUE ANSI-safe."""
    if portable:
        _require_seeds(k, "k")
        return [_hash31_seeded(col, s) % m for s in _CMS_SEEDS[:k]]
    h1 = F.pmod(F.xxhash64(col), F.lit(m))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m)).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(i) * h2) % m for i in range(k)]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 4,
    portable: bool = True,
) -> list[int]:
    """Build an m-bit bloom filter over ``dim[key_col]`` as m/64 int64
    words — the build side of a runtime filter: compute on the
    (small) dim side distributively, collect the BITMAP (m/64 rows,
    bounded driver fetch — 64 longs at m=4096), broadcast it inside a
    literal Column via `bloom_might_contain`, and the fact scan
    filters with pure codegen bit math before any join or shuffle.
    Spark's AQE injects this pattern automatically for supported join
    shapes (InjectRuntimeFilter); this operator makes it explicit,
    persistable (store the words, OR tomorrow's in), and usable where
    the optimizer can't see the relationship (pre-aggregated keys,
    cross-pipeline handoff).

    Hash family: `_bloom_positions` — the portable Lehmer chain by
    default (oracle-replayable), xxhash64 double hashing with
    ``portable=False`` for the 2× cheaper production probe.
    """
    words = m // 64
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), m, k, portable))
    ).alias("pos")
    rows = (
        dim.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 64 as int))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * words
    for r in rows:
        out[r["word_idx"]] = r["word"]
    return out


def bloom_might_contain(
    col: Column,
    words: list[int],
    m: int = 4096,
    k: int = 4,
    portable: bool = True,
) -> Column:
    """Membership Column against a `bloom_build` bitmap: true iff all
    k bit positions are set. Pure whole-stage-codegen integer math
    over two literal arrays (the bitmap words and the 64 single-bit
    masks — `element_at` takes a Column index where the shift
    builtins' DataFrame bindings demand a Python literal) — no join,
    no shuffle, evaluable in the fact scan's projection so the filter
    cuts rows BEFORE any exchange. One-sided: never false for a
    present key; false-positive rate ≈ (1 - e^(-k·n/m))^k, ~2.4% at
    n=m/8, k=4."""
    words_arr = F.array(*[F.lit(int(x)) for x in words])
    masks_arr = F.array(*[F.lit(x) for x in _BIT_MASKS])
    check = F.lit(True)
    for pos in _bloom_positions(col, m, k, portable):
        word = F.element_at(words_arr, F.floor(pos / 64).cast("int") + 1)
        mask = F.element_at(masks_arr, (pos % 64).cast("int") + 1)
        check = check & (word.bitwiseAND(mask) != 0)
    return check


# moments sketch (quantiles from power sums)
# ---------------------------------------------------------------------


def moments_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Mergeable moments sketch (Gan et al. 2018, "Moment-Based
    Quantile Sketches for Efficient High Cardinality Aggregation
    Queries"): per group, the exact integer power sums Σv, Σv², Σv³,
    Σv⁴ plus n/min/max over the value scaled to integers
    (``round(value·scale)``) — a CONSTANT-width summary that answers
    mean/variance/skew/kurtosis and moment-based quantile estimates.

    This completes the repo's mergeable-sketch family and its merge
    algebra: HLL registers merge with MAX, CMS registers with SUM —
    moments also merge with plain ADDITION (`moments_merge`), so
    yesterday's sketch folds into today's without re-reading anything
    and the sketch drops into `streaming/rollup._streaming_register_
    rollup`'s versioned-merge discipline (sum every m-column).

    Exactness discipline: the scaled values are int64; the power sums
    accumulate in DECIMAL(38,0), which Spark and DuckDB both sum
    exactly (no float order-dependence — the reason this is
    bit-reproducible where a double Σv⁴ is not). With |v·scale| ≤ 10⁶,
    v⁴ ≤ 10²⁴ and 10¹³ rows still fit decimal38. One shuffle of
    groups × 1 rows.
    """
    v = F.round(F.col(value_col) * scale).cast("long")
    d = "decimal(38,0)"
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, v.alias("_v"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("vmin"),
            F.max("_v").alias("vmax"),
            F.sum(F.col("_v").cast(d)).alias("m1"),
            F.sum((F.col("_v") * F.col("_v")).cast(d)).alias("m2"),
            F.sum((F.col("_v") * F.col("_v") * F.col("_v")).cast(d)).alias("m3"),
            F.sum(
                (F.col("_v") * F.col("_v") * F.col("_v") * F.col("_v")).cast(d)
            ).alias("m4"),
        )
    )


def moments_merge(*sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Moments merge with ADDITION (min/max with min/max): sketch(A ⊎ B)
    == merge(sketch(A), sketch(B)) exactly — asserted in tests."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("m1").alias("m1"),
        F.sum("m2").alias("m2"),
        F.sum("m3").alias("m3"),
        F.sum("m4").alias("m4"),
    )


def moments_stats(
    sketch: DataFrame, group_cols: list[str], scale: int = 100
) -> DataFrame:
    """Descriptive statistics + a moment-based quantile estimate from
    a moments sketch: mean, stddev (population), skewness,
    and the Cornish-Fisher p95 estimate (normal quantile corrected by
    the skew term — the standard 2-term expansion; exact only for
    near-Gaussian groups, one-sided error bounded by the next term).

    All inputs are exact decimals; every output is a fixed IEEE
    expression over them, 6-dp rounded — deterministic cross-engine.
    ``z95`` is the literal Φ⁻¹(0.95) so no engine's erfinv is needed.
    """
    z = 1.6448536269514722  # Phi^-1(0.95)
    nd = F.col("n").cast("double")
    m1 = F.col("m1").cast("double") / nd
    m2 = F.col("m2").cast("double") / nd
    m3 = F.col("m3").cast("double") / nd
    var = m2 - m1 * m1
    sd = F.sqrt(var)
    # central third moment via raw moments
    mu3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    skew = F.when(sd > 0, mu3 / (sd * sd * sd)).otherwise(F.lit(0.0))
    cf95 = m1 + sd * (F.lit(z) + (F.lit(z) * z - 1) / 6 * skew)
    inv = 1.0 / scale
    return sketch.select(
        *group_cols,
        "n",
        F.round(m1 * inv, 6).alias("mean"),
        F.round(sd * inv, 6).alias("stddev"),
        F.round(skew, 6).alias("skewness"),
        F.round(
            F.least(
                F.greatest(cf95, F.col("vmin").cast("double")),
                F.col("vmax").cast("double"),
            )
            * inv,
            6,
        ).alias("p95_est"),
        F.round(F.col("vmin").cast("double") * inv, 6).alias("vmin"),
        F.round(F.col("vmax").cast("double") * inv, 6).alias("vmax"),
    )


def hll_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    m: int = 256,
) -> DataFrame:
    """Audience-overlap estimation from HLL sketches — the query a
    100 TB engine cannot answer exactly without co-shuffling both
    full value sets: how many distinct values do groups A and B
    share? HLLs support union natively (register max), and
    intersection follows by inclusion-exclusion:
    ``|A ∩ B| = |A| + |B| - |A ∪ B|`` (Flajolet et al. 2007 §5).

    Returns ONE row — ALWAYS one row, even when one or both groups
    have no rows at all (ADVICE r9: an empty side reports estimate 0,
    not a vanished report): ``(est_a, est_b, est_union,
    est_intersection, jaccard_est)`` — intersection clamped at 0
    (inclusion-exclusion on estimates can go negative for
    near-disjoint sets), Jaccard rounded to 6 dp and defined as 0
    when the union estimate is 0 (both sides empty). Every number is
    derived from the same bit-deterministic register tables as
    hll_sketch/hll_estimate, so an SQL oracle replays all five to
    the bit.

    Scale shape: one pass builds both register tables (the group
    filter rides the scan); union is a register-table merge (max over
    at most 2m rows); two 1-row aggregates crossJoin into the
    report. Nothing shuffles more than groups x m register rows.
    """
    both = df.filter(F.col(group_col).isin([group_a, group_b]))
    sk = hll_sketch(both, [group_col], value_col, m)
    est = hll_estimate(sk, [group_col], m)
    # one global aggregate -> exactly one row whatever est contains
    # (0, 1, or 2 group rows); an absent group coalesces to 0
    ab = est.agg(
        F.coalesce(
            F.max(F.when(F.col(group_col) == group_a, F.col("estimate"))),
            F.lit(0).cast("long"),
        ).alias("est_a"),
        F.coalesce(
            F.max(F.when(F.col(group_col) == group_b, F.col("estimate"))),
            F.lit(0).cast("long"),
        ).alias("est_b"),
    )
    union_sk = sk.select("bucket", "register")
    # global agg over an empty register table still yields one row
    # (NULL estimate) -> coalesce to 0
    u = hll_estimate(
        union_sk.groupBy("bucket").agg(F.max("register").alias("register")),
        [],
        m,
    ).select(
        F.coalesce(F.col("estimate"), F.lit(0).cast("long")).alias("est_union")
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
    )
    return ab.crossJoin(u).select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(
            F.col("est_union") > 0,
            F.round(inter.cast("double") / F.col("est_union"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )
