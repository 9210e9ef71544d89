"""Table profiling (operators/profile.py)."""

from __future__ import annotations

import pytest

from duo_spark.operators.profile import profile_table


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5), (3, "a", None)],
        "k long, s string, v double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["k"].n_nulls, got["k"].n_distinct) == (0, 3)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (2, 2)
    assert (got["k"].min_value, got["k"].max_value) == ("1", "3")
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")
    # numeric ordering happens BEFORE the string cast
    assert (got["v"].min_value, got["v"].max_value) == ("5.0", "7.5")


def test_profile_column_subset_and_errors(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    assert [r.column for r in profile_table(df, ["b"]).collect()] == ["b"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_profile_single_pass_plan(spark):
    """One scan: the wide aggregate must not re-read the source per
    column (Expand is fine — it is one pass)."""
    df = spark.range(100).selectExpr("id", "id % 7 AS m", "CAST(id AS STRING) AS s")
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("range (0, 100") == 1


# ---------------------------------------------------------------------
# round 7: value_histogram
# ---------------------------------------------------------------------

def test_value_histogram_bins_and_clamp(spark):
    from duo_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("a", 95.0),
         ("a", 100.0), ("a", 250.0), ("b", 55.0), ("b", None)],
        "g string, v double",
    )
    got = {(r.g, r.bin): (r.bin_lo, r.bin_hi, r.n)
           for r in value_histogram(df, "v", 0.0, 100.0, 10,
                                    group_cols=["g"]).collect()}
    assert got == {
        ("a", 0): (0.0, 10.0, 3),    # -5 clamps up, 0.0 and 9.99 in range
        ("a", 1): (10.0, 20.0, 1),
        ("a", 9): (90.0, 100.0, 3),  # 95 in range; 100 and 250 clamp down
        ("b", 5): (50.0, 60.0, 1),   # null dropped
    }
    # totals preserved per group (clamping never loses rows)
    assert sum(n for (g, _), (_, _, n) in got.items() if g == "a") == 7


def test_value_histogram_validation(spark):
    import pytest as _pytest

    from duo_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError):
        value_histogram(df, "v", 0.0, 0.0, 10)
    with _pytest.raises(ValueError):
        value_histogram(df, "v", 0.0, 1.0, 0)


def test_population_stability_detects_planted_drift(spark):
    """A shifted distribution scores high PSI; an identical one scores
    ~0; groups present in only one snapshot stay finite (smoothing)."""
    import random

    from duo_spark.operators.profile import population_stability

    rng = random.Random(7)
    ref_rows = [("stable", rng.uniform(0, 50)) for _ in range(2000)] \
        + [("shifted", rng.uniform(0, 50)) for _ in range(2000)] \
        + [("ref_only", rng.uniform(0, 50)) for _ in range(100)]
    cur_rows = [("stable", rng.uniform(0, 50)) for _ in range(2000)] \
        + [("shifted", rng.uniform(50, 100)) for _ in range(2000)]
    ref = spark.createDataFrame(ref_rows, "g string, v double")
    cur = spark.createDataFrame(cur_rows, "g string, v double")
    got = {r.g: r.psi for r in population_stability(
        ref, cur, "v", 0.0, 100.0, 10, group_cols=["g"]).collect()}
    assert got["stable"] < 0.05
    assert got["shifted"] > 1.0          # total mass displacement
    assert got["ref_only"] == got["ref_only"]  # finite, not NaN
    assert abs(got["ref_only"]) < 100
