"""Declarative data validation — expectation rules over a table in
ONE pass.

The data-quality gate every production pipeline runs before training
or serving (Great-Expectations-style): a rule set like "o_totalprice
> 0", "o_orderkey is unique", "o_orderstatus in ('O','F','P')"
evaluated together, reporting per-rule violation counts. At 100 TB
the design constraint is ONE SCAN: each row-level rule becomes a
``sum(case when not pred then 1)`` in a single map-side-combined
aggregate — R rules cost one pass + an R-cell row, never R scans.

Uniqueness is the one rule class that cannot ride the row-local
aggregate (it needs a per-key count): it runs as its own groupBy
whose shuffle carries distinct keys, then contributes one row to the
same report shape. Everything is exact integer counts — oracle-
replayable trivially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate(
    df: DataFrame,
    rules: dict[str, str],
    unique: list[str] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` (name -> SQL boolean predicate that a GOOD
    row satisfies), optional ``unique`` column-sets, and optional
    ``foreign_keys`` (child_col, parent_df, parent_col) referential
    expectations over ``df``.

    Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_ppm)`` — violations are rows where the predicate is
    false OR null (an unevaluable expectation is a failed one), ppm =
    floor(violations·10⁶ / rows) keeps the rate integer-exact.

    Row-level rules share ONE aggregate (one scan however many rules);
    each uniqueness rule adds one distinct-key aggregate (shuffle =
    distinct keys; its violation count is rows carrying a duplicated
    key value, NULLs exempt like SQL UNIQUE). Each foreign-key rule is
    a LEFT ANTI join against the parent's DISTINCT keys — when the
    parent key set is small it broadcasts, so the child never
    shuffles; NULL child keys are exempt like SQL FK semantics.
    """
    if not rules and not unique and not foreign_keys:
        raise ValueError("validate: no rules given")
    total = F.count(F.lit(1)).alias("n_rows")
    aggs = [total] + [
        F.sum(
            F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
        ).alias(f"_viol_{i}")
        for i, pred in enumerate(rules.values())
    ]
    row = df.agg(*aggs)
    names = list(rules.keys())
    parts = []
    if names:
        stacked = row.select(
            F.col("n_rows"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("rule"),
                            F.col(f"_viol_{i}").cast("long").alias("n_violations"),
                        )
                        for i, name in enumerate(names)
                    ]
                )
            ).alias("_r"),
        ).select(
            F.col("_r.rule").alias("rule"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("_r.n_violations").alias("n_violations"),
        )
        parts.append(stacked)
    for cols in unique or []:
        key = [cols] if isinstance(cols, str) else list(cols)
        dup_rows = (
            df.na.drop(subset=key)
            .groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n_violations"))
        )
        n_all = df.agg(F.count(F.lit(1)).alias("n_rows"))
        parts.append(
            n_all.crossJoin(dup_rows).select(
                F.lit("unique(" + ", ".join(key) + ")").alias("rule"),
                F.col("n_rows").cast("long"),
                F.col("n_violations").cast("long"),
            )
        )
    for child_col, parent, parent_col in foreign_keys or []:
        orphans = (
            df.filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        n_all = df.agg(F.count(F.lit(1)).alias("n_rows"))
        parts.append(
            n_all.crossJoin(orphans).select(
                F.lit(f"fk({child_col} -> {parent_col})").alias("rule"),
                F.col("n_rows").cast("long"),
                F.col("n_violations").cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    ppm = F.when(F.col("n_rows") == 0, F.lit(0)).otherwise(
        F.floor(F.col("n_violations") * F.lit(1_000_000) / F.col("n_rows"))
    )
    return out.select(
        "rule",
        "n_rows",
        "n_violations",
        ppm.cast("long").alias("violation_ppm"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) — the governance check a
    training-data release runs before shipping anything derived from
    user activity: every combination of quasi-identifier values must
    be shared by at least ``k`` rows, or those rows are re-identifiable
    by joining the quasi-identifiers against an external dataset.

    Returns ONE row: ``(n_rows, n_classes, min_class_size,
    k_anonymous, n_violating_rows, n_violating_classes)`` where a
    violating class is an equivalence class (distinct quasi-identifier
    combination) with fewer than ``k`` members and the dataset is
    k-anonymous iff there are none.

    Scale shape: one map-side-combined hash aggregate to class counts
    (shuffle = distinct quasi combinations) + one 1-row reduction of
    that class table. NULL quasi values form their own class (they
    group together, like SQL GROUP BY) — a NULL is still a joinable
    value to an attacker.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_c"))
    return classes.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_c").alias("min_class_size"),
        (F.min("_c") >= k).alias("k_anonymous"),
        F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(0)).alias(
            "n_violating_rows"
        ),
        F.sum(F.when(F.col("_c") < k, 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    companion governance gate to :func:`k_anonymity`: a class of rows
    sharing quasi-identifier values can be k-anonymous yet still leak
    the sensitive attribute if (almost) every row in the class shares
    ONE sensitive value. Distinct l-diversity requires every
    equivalence class to contain at least ``l`` distinct sensitive
    values.

    Returns ONE row: ``(n_rows, n_classes, min_distinct_sensitive,
    l_diverse, n_violating_classes, n_violating_rows)``.

    Scale shape: two map-side-combined hash aggregates — per
    (class, sensitive value) counts (shuffle = distinct combinations,
    never rows), then per-class distinct totals — and a 1-row
    reduction. NULL sensitive values count as one distinct value
    (an attacker learns "the value is missing", which is itself a
    disclosure), implemented by grouping on the sensitive column like
    any other value.
    """
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    classes = per_value.groupBy(*quasi_cols).agg(
        F.sum("_c").alias("_rows"),
        F.count(F.lit(1)).alias("_nsv"),
    )
    return classes.agg(
        F.sum("_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_nsv").alias("min_distinct_sensitive"),
        (F.min("_nsv") >= l).alias("l_diverse"),
        F.sum(F.when(F.col("_nsv") < l, 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
        F.sum(F.when(F.col("_nsv") < l, F.col("_rows")).otherwise(0)).alias(
            "n_violating_rows"
        ),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the release-governance ladder after
    :func:`k_anonymity` and :func:`l_diversity`: a class can hold l
    distinct sensitive values and still leak if its DISTRIBUTION over
    them diverges from the table's (e.g. 98% of one value where the
    global split is even). For a categorical sensitive attribute the
    paper's ground distance degenerates to total variation distance:
    ``TVD(class) = 0.5 * sum_v |p_class(v) - p_global(v)|``.

    Returns ONE row: ``(n_classes, max_tvd, t_close,
    n_violating_classes)`` with TVD rounded to 6 dp.

    Scale shape: values a class does NOT contain contribute
    ``p_global(v)`` to its TVD, so the naive classes x values
    cross-join is avoided algebraically: for values present in the
    class the term is ``|p_c - p_g|``, and the absent mass folds to
    ``1 - sum(present p_g)`` — everything reduces to the per-(class,
    value) count table joined once against the global value table
    (both map-side-combined hash aggregates; the global table is
    |sensitive domain| rows and broadcasts).

    NULL sensitive values count as one domain value, exactly like
    :func:`l_diversity` (an attacker learns "the value is missing"):
    the class↔global join is null-safe (``<=>`` is still a hash-join
    key for Spark), so NULL-holding classes keep their full TVD mass
    and all-NULL classes stay in ``n_classes`` (ADVICE r9).
    """
    cv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = cv.groupBy(*quasi_cols).agg(F.sum("_c").alias("_ct"))
    gv = (
        df.groupBy(sensitive_col)
        .agg(F.count(F.lit(1)).alias("_g"))
        .withColumnRenamed(sensitive_col, "_sv")
    )
    gtot = gv.agg(F.sum("_g").alias("_tot"))
    j = (
        cv.join(totals, quasi_cols)
        .join(
            F.broadcast(gv),
            F.col(sensitive_col).eqNullSafe(F.col("_sv")),
        )
        .drop("_sv")
        .crossJoin(F.broadcast(gtot))
    )
    pc = F.col("_c").cast("double") / F.col("_ct")
    pg = F.col("_g").cast("double") / F.col("_tot")
    per_class = j.groupBy(*quasi_cols).agg(
        (0.5 * (F.sum(F.abs(pc - pg)) + (1 - F.sum(pg)))).alias("_tvd")
    )
    return per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(F.max("_tvd"), 6).alias("max_tvd"),
        (F.max("_tvd") <= t).alias("t_close"),
        F.sum(F.when(F.col("_tvd") > t, 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: int = 42,
    clamp_nonneg: bool = True,
) -> DataFrame:
    """Geometric-mechanism noisy count release (Ghosh, Roughgarden &
    Sundararajan 2009) — the fourth rung of the release-governance
    ladder after k-anonymity / l-diversity / t-closeness: publish
    per-group counts with two-sided-geometric noise calibrated to
    ``epsilon`` (sensitivity 1 for disjoint-group counting).

    Noise: ``X = G1 - G2`` with ``Gi = floor(ln(ui) / ln(alpha))``,
    ``alpha = exp(-epsilon)`` — the difference of two iid geometrics
    IS the two-sided geometric distribution the mechanism requires.
    The uniforms are md5-derived from (group key, seed, salt): 52
    hash bits → ``u = (bits + 0.5) / 2^52`` ∈ (0, 1), replayable
    bit-exactly by an SQL oracle (md5 + base-16 conv exist in both
    engines, unlike xxhash64).

    SEEDED NOISE IS REPLAY/TEST MODE, NOT A PRIVACY GUARANTEE: with a
    public seed an adversary can subtract the noise. A production
    release must treat ``seed`` as a secret drawn fresh per release —
    then the mechanism is epsilon-DP per the paper; the engine-side
    plumbing (grouping, calibration, clamping) is identical.

    Returns ``(*group_cols, n_true, noise, n_noisy)`` (``n_true`` is
    for auditing pipelines; drop it before an actual release).
    ``clamp_nonneg`` floors the published count at 0.

    Scale: one map-side-combined count aggregate; the noise is a pure
    Column over the group-key row — nothing shuffles but the counts.
    """
    import math

    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_true"))
    ln_alpha = -float(epsilon)
    from duo_spark.operators.util import md5_uniform

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    g1 = F.floor(F.log(md5_uniform(key, seed, "g1")) / F.lit(ln_alpha))
    g2 = F.floor(F.log(md5_uniform(key, seed, "g2")) / F.lit(ln_alpha))
    noise = (g1 - g2).cast("long")
    noisy = F.col("n_true") + noise
    if clamp_nonneg:
        noisy = F.greatest(noisy, F.lit(0).cast("long"))
    return counts.select(
        *group_cols,
        "n_true",
        noise.alias("noise"),
        noisy.alias("n_noisy"),
    )
