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
