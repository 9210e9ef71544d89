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

from pyspark.sql import DataFrame
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

    Scale (round 8 — this used to be the repo's one global
    no-partition window): per-key counts are ONE map-side-combined
    hash aggregate (shuffle carries n_keys rows); those counts then
    collapse to a ``(count_value, n_keys_with_it)`` frequency table
    whose size D is PROVABLY ≤ √(2·n_rows) — D distinct positive
    counts sum to ≥ D(D+1)/2, which must be ≤ n_rows — so even at
    10^12 rows, D ≤ ~1.4M. The Gini rank term needs the exclusive
    prefix R_c = Σ_{c'<c} t_{c'}; that is the two-level running-total
    decomposition from :mod:`duo_spark.operators.sharding`
    (range-partition by count value, O(partitions) offset collect,
    per-partition window) — no single-partition sort anywhere. A tie
    block of t keys at count c occupies ranks R+1..R+t, contributing
    c·(t·R + t(t+1)/2) to Σ i·cᵢ — identical to ranking each key
    (ties among equal counts cannot change the sum). Percentiles use
    Spark's exact frequency-weighted ``percentile(c, p, t)``, so the
    aggregate state is D entries, not n_keys. Everything stays exact
    in int64 to n_keys·n_rows ≈ 9·10^18.
    """
    from duo_spark.operators.sharding import with_running_total

    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    by_count = counts.groupBy("_c").agg(F.count(F.lit(1)).alias("_t"))
    rt = with_running_total(by_count, "_c", "_t", "_rt")
    # exclusive prefix of key-counts below this count value
    r_exc = (F.col("_rt") - F.col("_t")).cast("long")
    tie_block = F.col("_c").cast("long") * (
        F.col("_t").cast("long") * r_exc
        + F.expr("CAST(_t AS BIGINT) * (CAST(_t AS BIGINT) + 1) div 2")
    )
    ranked = rt.select("_c", "_t", tie_block.alias("_ic"))
    n_rows = F.sum(F.col("_c") * F.col("_t"))
    n_keys = F.sum("_t")
    return ranked.agg(
        n_rows.alias("n_rows"),
        n_keys.alias("n_keys"),
        F.max("_c").alias("max_count"),
        F.round(n_rows.cast("double") / n_keys.cast("double"), 6).alias(
            "avg_count"
        ),
        F.expr("percentile(_c, 0.5, _t)").alias("p50_count"),
        F.expr("percentile(_c, 0.99, _t)").alias("p99_count"),
        F.round(
            F.max("_c").cast("double") / n_rows.cast("double"), 6
        ).alias("top1_share"),
        F.round(
            (
                F.lit(2) * F.sum("_ic") - (n_keys + F.lit(1)) * n_rows
            ).cast("double")
            / (n_keys * n_rows).cast("double"),
            6,
        ).alias("gini"),
    )
