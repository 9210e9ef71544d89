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
