"""Hot-key skew handling for equi-joins.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) rebalances
sort-merge joins at runtime, but it cannot help when ONE key carries
most of a shuffle-hash join's rows or when the runtime is Connect /
AQE-off. salted_join is the explicit fix: fan the big side's rows
across ``salt`` sub-keys and replicate the small side once per
sub-key, so a key with f rows lands in f/salt-sized buckets instead
of one. Cost: the small side shuffles salt× — only worth it when the
big side's skew dominates, which is exactly the hot-key regime.

The reference has no join surface beyond broadcast enrichment
(SURVEY §2.3); this is 100 TB tooling for the north-star operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key
    fanning. Result is row-identical to ``big.join(small, on, how)``
    (asserted in tests); only the physical distribution changes.

    The salt is ``rand(seed)`` — seeded per partition, so it is stable
    under task retries (Spark re-seeds deterministically from the
    partition index) and needs no row identity. ``how`` supports the
    left-preserving joins ("inner", "left"); right/outer would need
    the salt on the other side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    n = int(salt)
    big2 = big.withColumn("_salt", (F.rand(seed) * n).cast("int"))
    small2 = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big2.join(small2, [*keys, "_salt"], how).drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnostic for a join/aggregation key — the
    numbers that DECIDE between a plain shuffle, AQE skew-split, and
    `salted_join`, and size the salt when chosen.

    Output: ``(n_rows, n_keys, max_count, avg_count, p50_count,
    p99_count, top1_share, gini)``. ``top1_share`` (hottest key's row
    fraction) and ``gini`` (0 = uniform, →1 = one key owns the table)
    are exact integer sums plus one IEEE divide each, 6-dp rounded —
    cross-engine reproducible. Salt sizing: a key with ``max_count``
    rows needs ~``ceil(max_count / (n_rows / shuffle_partitions))``
    sub-keys to flatten into average-sized buckets.

    Scale: per-key counts are ONE map-side-combined hash aggregate
    (shuffle carries n_keys rows); the Gini rank is a single global
    sort of those counts — fine to ~10^8 keys on one pass. The exact
    `percentile` pins cross-engine parity at gate scale; production
    swaps `percentile_approx` (same plan shape, bounded memory). The
    2·Σ(i·cᵢ) term stays exact in int64 up to n_keys·n_rows ≈ 9·10^18
    — switch the rank product to double past ~10^9 keys×rows².
    """
    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    # Gini needs ascending-count ranks; (count, key) makes ties total
    w = Window.orderBy(F.asc("_c"), F.asc(key_col))
    ranked = counts.select(
        "_c", F.row_number().over(w).alias("_i")
    )
    return ranked.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_count"),
        F.round(F.avg("_c"), 6).alias("avg_count"),
        F.expr("percentile(_c, 0.5)").alias("p50_count"),
        F.expr("percentile(_c, 0.99)").alias("p99_count"),
        F.round(
            F.max("_c").cast("double") / F.sum("_c").cast("double"), 6
        ).alias("top1_share"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("_i") * F.col("_c"))
                - (F.count(F.lit(1)) + F.lit(1)) * F.sum("_c")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("_c")).cast("double"),
            6,
        ).alias("gini"),
    )
